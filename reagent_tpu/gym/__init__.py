"""Gym layer: pure-JAX envs, Policy = scorer . sampler, agents, runners.

Reference: reagent/gym/ — EnvWrapper registry (envs/env_wrapper.py:34),
Policy (policies/policy.py:13), Agent (agents/agent.py:20), episode runner
(runners/gymrunner.py:25), replay-buffer training datasets
(datasets/replay_buffer_dataset.py:22).

TPU-native design: the hot path is a **pure-JAX vectorized env engine** — env
dynamics as jittable step functions composed with the policy, replay buffer,
and learner inside a single ``lax.scan`` (see online_loop.py).  Host gymnasium
envs remain available through an adapter for parity testing.
"""
