"""Iterator-style gym datasets: host-loop adapters over the fused primitives.

Reference: reagent/gym/datasets/replay_buffer_dataset.py:22-206 and
episodic_dataset.py — IterableDatasets that step the env, insert into replay,
and yield train batches.  The TPU-first path fuses all of this into one
lax.scan (online_loop.py); these adapters keep the reference's host-loop
contract for users who want Python-visible batches (debugging, custom
augmentation) at the cost of per-step dispatch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class ReplayBufferDataset:
    """Step env + insert + sample, yielding one typed batch per env step."""

    def __init__(
        self,
        env,
        policy_act: Callable[[Any, Array, Array], Array],
        policy_params: Any,
        rb,
        rb_state,
        batch_maker: Callable[[Dict[str, Array]], Any],
        training_frequency: int = 1,
        num_episodes: Optional[int] = None,
        max_steps: Optional[int] = None,
        batch_size: int = 256,
        rng: Optional[Array] = None,
    ):
        self.env = env
        self.policy_act = policy_act
        self.policy_params = policy_params
        self.rb = rb
        self.rb_state = rb_state
        self.batch_maker = batch_maker
        self.training_frequency = training_frequency
        self.num_episodes = num_episodes
        self.max_steps = max_steps or getattr(env, "max_steps", 1000)
        self.batch_size = batch_size
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

    def _params(self):
        # trainers DONATE their state: a params pytree captured at dataset
        # construction is deleted by the first train_step.  Pass a callable
        # (e.g. ``lambda: ts.policy_params``) to always read the live params.
        return self.policy_params() if callable(self.policy_params) else self.policy_params

    def __iter__(self) -> Iterator[Any]:
        episodes = 0
        steps = 0
        self.rng, r = jax.random.split(self.rng)
        env_state, obs = self.env.reset(r)
        ep_steps = 0
        while self.num_episodes is None or episodes < self.num_episodes:
            self.rng, r_act, r_step, r_samp = jax.random.split(self.rng, 4)
            action = self.policy_act(self._params(), obs, r_act)
            env_state, next_obs, reward, done = self.env.step(env_state, action, r_step)
            ep_steps += 1
            truncated = ep_steps >= self.max_steps
            self.rb_state = self.rb.add(
                self.rb_state,
                observation=obs,
                action=action,
                reward=jnp.asarray(reward, jnp.float32),
                terminal=jnp.asarray(done, bool),
            )
            obs = next_obs
            steps += 1
            if steps % self.training_frequency == 0:
                batch = self.rb.sample(self.rb_state, r_samp, self.batch_size)
                yield self.batch_maker(batch)
            if bool(done) or truncated:
                episodes += 1
                ep_steps = 0
                self.rng, r = jax.random.split(self.rng)
                env_state, obs = self.env.reset(r)


class EpisodicDataset:
    """Yield one full padded episode per iteration (ref episodic_dataset.py)."""

    def __init__(
        self,
        env,
        logits_fn: Callable[[Any, Array], Array],
        policy_params: Any,
        sampler,
        num_episodes: int,
        max_steps: int,
        rng: Optional[Array] = None,
    ):
        from reagent_tpu.gym.episodic import collect_episode

        self._collect = collect_episode
        self.env = env
        self.logits_fn = logits_fn
        self.policy_params = policy_params
        self.sampler = sampler
        self.num_episodes = num_episodes
        self.max_steps = max_steps
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

    def _params(self):
        # see ReplayBufferDataset._params: donated trainer states require a
        # callable provider to avoid reading deleted buffers
        return self.policy_params() if callable(self.policy_params) else self.policy_params

    def __iter__(self):
        for _ in range(self.num_episodes):
            self.rng, r = jax.random.split(self.rng)
            yield self._collect(
                self.env, self.logits_fn, self.sampler, self._params(),
                r, self.max_steps,
            )

    def __len__(self) -> int:
        return self.num_episodes


class OfflineReplayBufferDataset:
    """Sample a fixed number of batches from a prefilled replay buffer without
    stepping the env (reference replay_buffer_dataset.py:153-206)."""

    def __init__(
        self,
        rb,
        rb_state,
        batch_maker: Callable[[Dict[str, Array]], Any],
        batch_size: int,
        num_batches: int,
        rng: Optional[Array] = None,
    ):
        self.rb = rb
        self.rb_state = rb_state
        self.batch_maker = batch_maker
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Any]:
        for _ in range(self.num_batches):
            self.rng, r = jax.random.split(self.rng)
            batch = self.rb.sample(self.rb_state, r, self.batch_size)
            yield self.batch_maker(batch)
