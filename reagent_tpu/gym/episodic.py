"""Episodic data collection for policy-gradient trainers.

Reference: reagent/gym/datasets/episodic_dataset.py — a host generator yielding
one exact-length PolicyGradientInput per episode.  TPU-native: one jitted scan
collects a fixed ``max_steps`` rollout with an alive mask; the trainer consumes
the padded episode via ``valid_mask`` (keeps shapes static, no recompiles).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.gym.envs.functional import FunctionalEnv

Array = jax.Array


def collect_episode(
    env: FunctionalEnv,
    logits_fn: Callable[[Any, Array], Array],  # (params, obs[1,D]) -> [1, A]
    sampler,
    params: Any,
    rng: Array,
    max_steps: int,
) -> Tuple[rlt.PolicyGradientInput, Array]:
    """Roll out one episode (padded to max_steps). Returns (episode, ep_return)."""

    r0, rng = jax.random.split(rng)
    env_state, obs = env.reset(r0)

    def body(carry, _):
        env_state, obs, rng, alive = carry
        rng, r_act, r_step = jax.random.split(rng, 3)
        scores = logits_fn(params, obs[None])
        out = sampler.sample_action(scores, r_act)
        action_onehot = out.action[0]
        action_idx = jnp.argmax(action_onehot).astype(jnp.int32)
        env_state, next_obs, reward, done = env.step(env_state, action_idx, r_step)
        step_data = (
            obs,
            action_onehot,
            reward * alive,
            out.log_prob[0],
            alive,
        )
        new_alive = alive * (1.0 - done.astype(jnp.float32))
        # freeze env once dead (obs repeats; mask kills the contribution)
        return (env_state, next_obs, rng, new_alive), step_data

    (_, _, _, _), (obs_seq, act_seq, rew_seq, lp_seq, mask_seq) = jax.lax.scan(
        body, (env_state, obs, rng, jnp.asarray(1.0)), None, length=max_steps
    )
    episode = rlt.PolicyGradientInput(
        state=rlt.FeatureData(float_features=obs_seq),
        action=act_seq,
        reward=rew_seq,
        log_prob=lp_seq,
        valid_mask=mask_seq,
    )
    return episode, jnp.sum(rew_seq)


def make_episodic_trainer_step(env, logits_fn, sampler, trainer, max_steps: int):
    """One jitted unit: collect an episode with the current policy, train on it.

    Returns fn(state, rng) -> (state, ep_return, metrics).
    """
    train_fn = getattr(type(trainer).train_step, "__wrapped__", type(trainer).train_step)

    @jax.jit
    def step(trainer_state, rng):
        episode, ep_return = collect_episode(
            env, logits_fn, sampler, trainer_state.policy_params, rng, max_steps
        )
        trainer_state, metrics = train_fn(trainer, trainer_state, episode)
        return trainer_state, ep_return, metrics

    return step
