"""Packed-row replay buffer: the HBM-bandwidth-optimal hot path.

Reference: reagent/replay_memory/circular_replay_buffer.py stores each element
type in its own array, so one transition add is one write per element and one
sample is one gather per element (state, action, reward, terminal, next_*…).
On TPU every one of those is a separate HBM round-trip, and in the fused
online loop (gym/online_loop.py) they dominate the per-step latency budget.

TPU-native re-design for the 1-step / stack-1 dense case: all transition
fields are packed into ONE row of a single ``[capacity, row_width]`` float32
array (row_width padded to a multiple of 8 sublanes).  ``add`` is a single
``dynamic_update_slice``; ``sample`` is two row gathers (indices and
indices+1 for next-state/next-action) plus cheap column slicing.  Validity
uses the same closed-form circular-range argument as
``ReplayBuffer.sample_index_batch`` (stack_size==1 branch), so sampling is
exactly uniform over valid transitions.

Semantics match ``ReplayBuffer(stack_size=1, update_horizon=1)``: the sample
dict carries the same keys/shapes (state, action, reward, next_state,
next_action, terminal, indices, step), so ``make_discrete_dqn_batch`` and the
other batch makers work unchanged.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class PackedReplayBufferState:
    """Device-resident packed storage (a pytree)."""

    rows: Array  # [capacity, row_width] float32
    add_count: Array  # int32 scalar
    episode_len: Array  # int32 scalar

    @property
    def size(self) -> Array:
        return jnp.minimum(self.add_count, self.rows.shape[0])


class PackedReplayBuffer:
    """Single-array replay for dense 1-step transitions.

    Drop-in duck-type for ``ReplayBuffer`` in the fused online loop: exposes
    ``init(**example) -> state``, ``add(state, **transition)`` and
    ``sample(state, rng, batch_size)``.  Only ``stack_size=1`` /
    ``update_horizon=1`` semantics are supported — use ``ReplayBuffer`` for
    frame stacks, n-step windows, prioritized sampling, or jagged extras.
    """

    REQUIRED_KEYS = ("observation", "action", "reward", "terminal")

    def __init__(
        self,
        replay_capacity: int = 10000,
        batch_size: int = 32,
        gamma: float = 0.99,
    ) -> None:
        self._capacity = int(replay_capacity)
        self._batch_size = int(batch_size)
        self._gamma = float(gamma)
        # field name -> (col_start, flat_size, shape, dtype); built by init()
        self._layout: Optional[Dict[str, Tuple[int, int, Tuple[int, ...], Any]]] = None
        self._row_width: int = 0

    # ------------------------------------------------------------------ init

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def update_horizon(self) -> int:
        return 1

    @property
    def stack_size(self) -> int:
        return 1

    @property
    def batch_size(self) -> int:
        return self._batch_size

    def init(self, **example_transition: Any) -> PackedReplayBufferState:
        for k in self.REQUIRED_KEYS:
            if k not in example_transition:
                raise ValueError(f"example transition missing required key {k!r}")
        layout: Dict[str, Tuple[int, int, Tuple[int, ...], Any]] = {}
        col = 0
        for name in sorted(example_transition):
            arr = jnp.asarray(example_transition[name])
            n = int(np.prod(arr.shape)) if arr.shape else 1
            layout[name] = (col, n, tuple(arr.shape), arr.dtype)
            col += n
        self._layout = layout
        self._row_width = _round_up(max(col, 1), 8)
        rows = jnp.zeros((self._capacity, self._row_width), jnp.float32)
        return PackedReplayBufferState(
            rows=rows,
            add_count=jnp.zeros((), jnp.int32),
            episode_len=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- add

    def _pack(self, transition: Dict[str, Array]) -> Array:
        assert self._layout is not None, "init() first"
        parts = []
        for name in sorted(self._layout):
            start, n, shape, _ = self._layout[name]
            v = jnp.asarray(transition[name]).astype(jnp.float32).reshape(n)
            parts.append(v)
        row = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        pad = self._row_width - row.shape[0]
        if pad:
            row = jnp.concatenate([row, jnp.zeros((pad,), jnp.float32)])
        return row

    def _unpack(self, rows: Array, name: str) -> Array:
        start, n, shape, dtype = self._layout[name]
        v = jax.lax.slice_in_dim(rows, start, start + n, axis=1)
        v = v.reshape(rows.shape[0], *shape) if shape else v[:, 0]
        if dtype == jnp.bool_:
            return v > 0.5
        return v.astype(dtype) if jnp.issubdtype(dtype, jnp.integer) else v

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def add(
        self, state: PackedReplayBufferState, **transition: Array
    ) -> PackedReplayBufferState:
        """One packed row write (single dynamic_update_slice)."""
        cap = self._capacity
        term_col = self._layout["terminal"][0]
        prev = (state.add_count - 1) % cap
        prev_terminal = state.rows[prev, term_col] > 0.5
        new_episode = jnp.logical_or(state.add_count == 0, prev_terminal)
        episode_len = jnp.where(new_episode, 0, state.episode_len) + 1

        cur = state.add_count % cap
        row = self._pack(transition)
        rows = jax.lax.dynamic_update_slice(state.rows, row[None, :], (cur, 0))
        return PackedReplayBufferState(
            rows=rows, add_count=state.add_count + 1, episode_len=episode_len
        )

    def add_batch(
        self, state: PackedReplayBufferState, **transitions: Array
    ) -> PackedReplayBufferState:
        def body(s, tr):
            return self.add(s, **tr), None

        state, _ = jax.lax.scan(body, state, dict(transitions))
        return state

    # ----------------------------------------------------------------- sample

    def sample_index_batch(
        self, state: PackedReplayBufferState, rng: Array, batch_size: int
    ) -> Array:
        """Closed-form uniform over valid indices (no validity array).

        Same argument as ReplayBuffer.sample_index_batch's stack_size==1
        branch: the only unsampleable written indices are the trailing
        t = min(episode_len, 1) entries of the current unterminated episode.
        """
        cap = self._capacity
        term_col = self._layout["terminal"][0]
        cur = state.add_count % cap
        written = jnp.minimum(state.add_count, cap)
        last_terminal = jnp.logical_or(
            state.add_count == 0,
            state.rows[(state.add_count - 1) % cap, term_col] > 0.5,
        )
        t = jnp.where(last_terminal, 0, jnp.minimum(state.episode_len, 1))
        valid_count = jnp.maximum(written - t, 1)
        u = jax.random.randint(rng, (batch_size,), 0, valid_count)
        return ((cur - t - 1 - u) % cap).astype(jnp.int32)

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def sample(
        self,
        state: PackedReplayBufferState,
        rng: Array,
        batch_size: Optional[int] = None,
        indices: Optional[Array] = None,
    ) -> Dict[str, Array]:
        """Two row gathers + column slicing; same output dict as ReplayBuffer."""
        bs = batch_size or self._batch_size
        if indices is None:
            indices = self.sample_index_batch(state, rng, bs)
        indices = indices.astype(jnp.int32)
        cap = self._capacity

        rows = state.rows[indices]  # [B, W] — one gather
        next_rows = state.rows[(indices + 1) % cap]  # [B, W] — one gather

        batch: Dict[str, Array] = {
            "state": self._unpack(rows, "observation"),
            "action": self._unpack(rows, "action"),
            "reward": self._unpack(rows, "reward"),
            "next_state": self._unpack(next_rows, "observation"),
            "next_action": self._unpack(next_rows, "action"),
            "terminal": self._unpack(rows, "terminal"),
            "indices": indices,
            "step": jnp.ones((bs,), jnp.int32),
        }
        for key in self._layout:
            if key in ("observation", "action", "reward", "terminal"):
                continue
            batch[key] = self._unpack(rows, key)
            batch["next_" + key] = self._unpack(next_rows, key)
        for k, v in batch.items():
            if v.ndim == 1:
                batch[k] = v[:, None]
        return batch
