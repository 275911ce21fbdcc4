"""Prioritized experience replay (Schaul et al. 2015), on-device.

Reference: reagent/replay_memory/prioritized_replay_buffer.py:30.

TPU-native design: priorities live in the buffer state next to the storage; new
transitions receive the max priority seen so far (ref :71-75); sampling is
stratified inverse-CDF over ``priority * is_valid`` (one cumsum + searchsorted
— the XLA-efficient equivalent of the reference's sum-tree descent plus its
rejection loop for invalid indices, which dynamic shapes forbid on TPU; masking
invalid entries out of the CDF gives the same distribution in one shot).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from reagent_tpu.replay.circular import ReplayBuffer, ReplayBufferState

Array = jax.Array


@struct.dataclass
class PrioritizedReplayBufferState:
    buffer: ReplayBufferState
    priorities: Array  # float32 [capacity]
    max_priority: Array  # float32 scalar


class PrioritizedReplayBuffer(ReplayBuffer):
    """Prioritized variant; same functional API over a wrapped state."""

    def __init__(
        self,
        stack_size: int = 1,
        replay_capacity: int = 10000,
        batch_size: int = 32,
        update_horizon: int = 1,
        gamma: float = 0.99,
    ) -> None:
        super().__init__(
            stack_size=stack_size,
            replay_capacity=replay_capacity,
            batch_size=batch_size,
            update_horizon=update_horizon,
            gamma=gamma,
        )

    def init(self, **example_transition) -> PrioritizedReplayBufferState:  # type: ignore[override]
        base = super().init(**example_transition)
        return PrioritizedReplayBufferState(
            buffer=base,
            priorities=jnp.zeros((self.capacity,), jnp.float32),
            max_priority=jnp.ones((), jnp.float32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def add(  # type: ignore[override]
        self,
        state: PrioritizedReplayBufferState,
        priority: Optional[Array] = None,
        **transition: Array,
    ) -> PrioritizedReplayBufferState:
        if priority is None:
            priority = state.max_priority
        priority = jnp.asarray(priority, jnp.float32)
        base_before = state.buffer
        # Replicate the episode-padding cursor math: the real write lands at
        # the post-padding cursor, so compute it the same way the base does.
        base_after = ReplayBuffer.add.__wrapped__(self, base_before, **transition)
        cur = (base_after.add_count - 1) % self.capacity
        priorities = state.priorities.at[cur].set(priority)
        return PrioritizedReplayBufferState(
            buffer=base_after,
            priorities=priorities,
            max_priority=jnp.maximum(state.max_priority, priority),
        )

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def sample_index_batch_prioritized(
        self, state: PrioritizedReplayBufferState, rng: Array, batch_size: int
    ) -> Array:
        w = state.priorities * state.buffer.is_valid.astype(jnp.float32)
        csum = jnp.cumsum(w)
        total = csum[-1]
        # stratified: one draw per equal-mass segment
        bounds = jnp.arange(batch_size, dtype=jnp.float32) / batch_size
        u = jax.random.uniform(rng, (batch_size,)) / batch_size
        q = (bounds + u) * total
        return jnp.searchsorted(csum, q, side="right").astype(jnp.int32) % self.capacity

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def sample(  # type: ignore[override]
        self,
        state: PrioritizedReplayBufferState,
        rng: Array,
        batch_size: Optional[int] = None,
        indices: Optional[Array] = None,
    ) -> Dict[str, Array]:
        bs = batch_size or self.batch_size
        if indices is None:
            indices = self.sample_index_batch_prioritized(state, rng, bs)
        batch = ReplayBuffer.sample.__wrapped__(
            self, state.buffer, rng, bs, indices=indices
        )
        batch["sampling_probabilities"] = (
            state.priorities[indices] / jnp.maximum(jnp.sum(
                state.priorities * state.buffer.is_valid.astype(jnp.float32)
            ), 1e-12)
        )[:, None]
        return batch

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def set_priority(
        self, state: PrioritizedReplayBufferState, indices: Array, priorities: Array
    ) -> PrioritizedReplayBufferState:
        indices = jnp.asarray(indices, jnp.int32).reshape(-1)
        priorities = jnp.asarray(priorities, jnp.float32).reshape(-1)
        return state.replace(
            priorities=state.priorities.at[indices].set(priorities),
            max_priority=jnp.maximum(state.max_priority, jnp.max(priorities)),
        )

    def get_priority(self, state: PrioritizedReplayBufferState, indices: Array) -> Array:
        return state.priorities[jnp.asarray(indices, jnp.int32)]
