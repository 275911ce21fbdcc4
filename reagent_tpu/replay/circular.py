"""On-device circular replay buffer.

Reference: reagent/replay_memory/circular_replay_buffer.py:310 (the
Dopamine-derived host-side buffer: numpy/torch storage, python cursor,
stack-at-sample-time, n-step returns via a precomputed gamma-decay dot product,
validity bookkeeping for episode starts and the cursor neighborhood).

TPU-native re-design: the buffer lives **entirely on device** as a pytree of
preallocated arrays (``ReplayBufferState``), and ``add`` / ``sample`` are pure
jitted functions — so the whole actor-learner loop (env step -> add -> sample
-> SGD update) can run inside one ``jit`` / ``lax.scan`` without host
round-trips.  Donated state makes ``add`` an in-place dynamic-update-slice.

Semantics preserved from the reference:
  * episode starts insert ``stack_size - 1`` zero frames (ref :464,:476-480)
  * an index is invalid while it is within ``update_horizon`` of the cursor,
    until enough of the episode has been seen (ref :545-560 validity dance)
  * on terminal, the trailing ``min(episode_len, update_horizon)`` indices
    become immediately valid (ref :541-558 "NOTE: not accounted for by the
    original Dopamine buffer")
  * n-step reward = dot(<gamma^0..gamma^{n-1}>, rewards, mask) (ref :373,:746)
  * ``steps`` = distance to first terminal within the horizon (ref :760-777)
  * states are stacked at sample time: output [B, *obs, stack] (ref :133-141)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


@struct.dataclass
class ReplayBufferState:
    """Device-resident buffer contents (a pytree)."""

    store: Dict[str, Array]  # each [capacity, ...]
    add_count: Array  # int32 scalar: total adds incl. zero-padding frames
    is_valid: Array  # bool [capacity]
    episode_len: Array  # int32 scalar: transitions in current episode

    @property
    def size(self) -> Array:
        return jnp.sum(self.is_valid.astype(jnp.int32))


class ReplayBuffer:
    """Static configuration + pure functional ops over ``ReplayBufferState``.

    Usage::

        rb = ReplayBuffer(capacity=10000, update_horizon=3, gamma=0.99)
        state = rb.init(observation=jnp.zeros(4), action=jnp.int32(0),
                        reward=jnp.float32(0), terminal=jnp.bool_(False))
        state = rb.add(state, observation=obs, action=a, reward=r, terminal=d)
        batch = rb.sample(state, rng, batch_size=256)
    """

    REQUIRED_KEYS = ("observation", "action", "reward", "terminal")

    def __init__(
        self,
        stack_size: int = 1,
        replay_capacity: int = 10000,
        batch_size: int = 32,
        update_horizon: int = 1,
        gamma: float = 0.99,
        return_everything_as_stack: bool = False,
        return_as_timeline_format: bool = False,
    ) -> None:
        if replay_capacity < update_horizon + stack_size:
            raise ValueError(
                "There is not enough capacity to cover update_horizon and stack_size."
            )
        self._stack_size = int(stack_size)
        self._capacity = int(replay_capacity)
        self._batch_size = int(batch_size)
        self._update_horizon = int(update_horizon)
        self._gamma = float(gamma)
        self._return_everything_as_stack = bool(return_everything_as_stack)
        self._return_as_timeline_format = bool(return_as_timeline_format)
        # <gamma^0, ..., gamma^{H-1}> — n-step returns as one dot product.
        self._decays = jnp.asarray(
            self._gamma ** np.arange(self._update_horizon), jnp.float32
        )
        self._signature: Optional[Dict[str, Tuple[Tuple[int, ...], Any]]] = None

    # ------------------------------------------------------------------ init

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def update_horizon(self) -> int:
        return self._update_horizon

    @property
    def stack_size(self) -> int:
        return self._stack_size

    @property
    def batch_size(self) -> int:
        return self._batch_size

    def init(self, **example_transition: Any) -> ReplayBufferState:
        """Allocate zeroed storage from one example transition (shapes+dtypes)."""
        for k in self.REQUIRED_KEYS:
            if k not in example_transition:
                raise ValueError(f"example transition missing required key {k!r}")
        store: Dict[str, Array] = {}
        self._signature = {}
        for name, example in example_transition.items():
            arr = jnp.asarray(example)
            if arr.dtype == jnp.float64:
                arr = arr.astype(jnp.float32)
            if name == "terminal":
                arr = arr.astype(jnp.bool_)
            store[name] = jnp.zeros((self._capacity, *arr.shape), arr.dtype)
            self._signature[name] = (tuple(arr.shape), arr.dtype)
        return ReplayBufferState(
            store=store,
            add_count=jnp.zeros((), jnp.int32),
            is_valid=jnp.zeros((self._capacity,), jnp.bool_),
            episode_len=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- add

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def add(self, state: ReplayBufferState, **transition: Array) -> ReplayBufferState:
        """Append one transition (pure; donate ``state`` for in-place update)."""
        cap = self._capacity
        ss = self._stack_size
        h = self._update_horizon

        prev_idx = (state.add_count - 1) % cap
        new_episode = jnp.logical_or(
            state.add_count == 0, state.store["terminal"][prev_idx]
        )

        # Episode start: write stack_size-1 zero frames (stack padding).
        if ss > 1:
            def pad(s: ReplayBufferState) -> ReplayBufferState:
                def body(i, s):
                    cur = s.add_count % cap
                    new_store = {
                        k: jax.lax.dynamic_update_index_in_dim(
                            v, jnp.zeros_like(v[0]), cur, 0
                        )
                        for k, v in s.store.items()
                    }
                    return s.replace(
                        store=new_store,
                        add_count=s.add_count + 1,
                        is_valid=s.is_valid.at[cur].set(False),
                    )

                return jax.lax.fori_loop(0, ss - 1, body, s)

            state = jax.lax.cond(new_episode, pad, lambda s: s, state)
        episode_len = jnp.where(new_episode, 0, state.episode_len)

        cur = state.add_count % cap
        is_valid = state.is_valid.at[cur].set(False)
        # The index update_horizon behind becomes sampleable once the episode
        # has produced at least update_horizon transitions.
        behind = (cur - h) % cap
        is_valid = is_valid.at[behind].set(
            jnp.where(episode_len >= h, True, is_valid[behind])
        )

        store = {
            k: jax.lax.dynamic_update_index_in_dim(
                v, jnp.asarray(transition[k], v.dtype), cur, 0
            )
            for k, v in state.store.items()
        }
        episode_len = episode_len + 1

        # Invalidate the stack_size-1 indices after the (advanced) cursor.
        if ss > 1:
            nxt = (cur + 1 + jnp.arange(ss - 1)) % cap
            is_valid = is_valid.at[nxt].set(False)

        # Terminal: trailing min(episode_len, H) indices become valid now.
        terminal = jnp.asarray(transition["terminal"], jnp.bool_)
        num_back = jnp.minimum(episode_len, h)
        back_idx = (cur - jnp.arange(h)) % cap
        back_mask = jnp.logical_and(terminal, jnp.arange(h) < num_back)
        is_valid = is_valid.at[back_idx].set(
            jnp.where(back_mask, True, is_valid[back_idx])
        )

        return ReplayBufferState(
            store=store,
            add_count=state.add_count + 1,
            is_valid=is_valid,
            episode_len=episode_len,
        )

    def add_batch(self, state: ReplayBufferState, **transitions: Array) -> ReplayBufferState:
        """Sequentially add a [T, ...] batch of transitions under one scan."""
        def body(s, tr):
            return self.add(s, **tr), None

        state, _ = jax.lax.scan(body, state, dict(transitions))
        return state

    # ----------------------------------------------------------------- sample

    def sample_index_batch(
        self, state: ReplayBufferState, rng: Array, batch_size: int
    ) -> Array:
        """Uniform over valid indices, static-shape (ref :588-602).

        Two-level inverse CDF: a cumsum over per-block validity counts picks
        the block, then a [B, block] prefix-sum picks the offset — replacing
        the O(capacity) flat cumsum in the per-step hot path with
        O(capacity/block + B*block) work.  Exactly uniform.
        """
        cap = self._capacity
        if self._stack_size == 1:
            # O(B) closed form: with no stack padding, the invalid written
            # region is exactly the trailing t entries of the current
            # unterminated episode, t = min(episode_len, H) (0 right after a
            # terminal — `add` validates the whole tail then).  Valid indices
            # are the contiguous circular range ending t+1 before the cursor,
            # so uniform sampling needs no O(capacity) validity cumsum.
            cur = state.add_count % cap
            written = jnp.minimum(state.add_count, cap)
            last_terminal = jnp.logical_or(
                state.add_count == 0,
                state.store["terminal"][(state.add_count - 1) % cap],
            )
            t = jnp.where(
                last_terminal,
                0,
                jnp.minimum(state.episode_len, self._update_horizon),
            )
            valid_count = jnp.maximum(written - t, 1)
            u = jax.random.randint(rng, (batch_size,), 0, valid_count)
            return ((cur - t - 1 - u) % cap).astype(jnp.int32)
        # largest power-of-two block (<=512) dividing capacity; e.g. 100000 -> 32
        block = next((b for b in (512, 256, 128, 64, 32) if cap % b == 0), 0)
        if block == 0 or cap <= block:
            valid_f = state.is_valid.astype(jnp.int32)
            csum = jnp.cumsum(valid_f)
            total = csum[-1]
            picks = jax.random.randint(rng, (batch_size,), 0, jnp.maximum(total, 1))
            return jnp.searchsorted(csum, picks + 1).astype(jnp.int32) % cap

        v = state.is_valid.astype(jnp.int32).reshape(cap // block, block)
        block_counts = jnp.sum(v, axis=1)  # [nb]
        bc = jnp.cumsum(block_counts)
        total = bc[-1]
        picks = jax.random.randint(rng, (batch_size,), 0, jnp.maximum(total, 1))
        blk = jnp.searchsorted(bc, picks + 1).astype(jnp.int32)
        blk = jnp.minimum(blk, cap // block - 1)
        # rank of the pick within its block
        within = picks - (bc[blk] - block_counts[blk])  # [B], 0-based
        rows = v[blk]  # [B, block]
        rowc = jnp.cumsum(rows, axis=1)
        offs = jnp.argmax(rowc >= (within + 1)[:, None], axis=1).astype(jnp.int32)
        return blk * block + offs

    def _get_steps(self, terminals_window: Array) -> Array:
        """Distance to first terminal within the horizon window [B, H] (ref :760)."""
        t = terminals_window.at[:, -1].set(True)
        return jnp.argmax(t, axis=1).astype(jnp.int32) + 1

    def _stack_for(self, state: ReplayBufferState, key: str, indices: Array) -> Array:
        """Gather with frame stacking: out [B, *shape, stack] (ref :133-141,:750)."""
        if self._stack_size == 1:
            return state.store[key][indices]
        stack_idx = (
            indices[:, None] + jnp.arange(-self._stack_size + 1, 1)
        ) % self._capacity
        gathered = state.store[key][stack_idx]  # [B, S, *shape]
        return jnp.moveaxis(gathered, 1, -1)  # [B, *shape, S]

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def sample(
        self,
        state: ReplayBufferState,
        rng: Array,
        batch_size: Optional[int] = None,
        indices: Optional[Array] = None,
    ) -> Dict[str, Array]:
        """Sample a transition batch as a dict of device arrays.

        Keys: state, action, reward, next_state, next_action, terminal,
        indices, step, plus every extra storage key K and its ``next_K``.
        In timeline format next_* carry the full horizon [B, H, ...] plus a
        ``valid_step`` count (the reference's ragged-list equivalent, padded).
        """
        bs = batch_size or self._batch_size
        if indices is None:
            indices = self.sample_index_batch(state, rng, bs)
        indices = indices.astype(jnp.int32)

        cap = self._capacity
        h = self._update_horizon
        multistep = (indices[:, None] + jnp.arange(h)) % cap  # [B, H]
        terminals_w = state.store["terminal"][multistep]
        steps = self._get_steps(terminals_w)  # [B]

        timeline = self._return_as_timeline_format
        next_indices = (indices + steps) % cap

        mask = jnp.arange(h)[None, :] < steps[:, None]  # [B, H]
        rewards_w = state.store["reward"][multistep].astype(jnp.float32)
        if rewards_w.ndim > 2:
            dec = self._decays.reshape((1, h) + (1,) * (rewards_w.ndim - 2))
            msk = mask.reshape(mask.shape + (1,) * (rewards_w.ndim - 2))
        else:
            dec, msk = self._decays[None, :], mask
        nstep_reward = jnp.sum(rewards_w * dec * msk, axis=1)

        def window(key):
            """[B, H, ...] horizon window gather for timeline output."""
            w = (indices[:, None] + 1 + jnp.arange(h)) % cap
            return state.store[key][w]

        batch: Dict[str, Array] = {}
        batch["state"] = self._stack_for(state, "observation", indices)
        batch["action"] = self._stack_for(state, "action", indices)
        if timeline:
            batch["next_state"] = window("observation")
            batch["next_action"] = window("action")
            batch["reward"] = state.store["reward"][multistep]
            batch["valid_step"] = steps[:, None]
        else:
            batch["next_state"] = self._stack_for(state, "observation", next_indices)
            batch["next_action"] = self._stack_for(state, "action", next_indices)
            batch["reward"] = nstep_reward
        terminal_idx = (indices + steps - 1) % cap
        batch["terminal"] = state.store["terminal"][terminal_idx]
        batch["indices"] = indices
        batch["step"] = steps

        for key in state.store:
            if key in ("observation", "action", "reward", "terminal"):
                continue
            batch[key] = self._stack_for(state, key, indices)
            if timeline:
                batch["next_" + key] = window(key)
            else:
                batch["next_" + key] = self._stack_for(state, key, next_indices)

        # match reference shape convention: rank-1 -> [B, 1]
        for k, v in batch.items():
            if v.ndim == 1:
                batch[k] = v[:, None]
        return batch

    def sample_all_valid_transitions(self, state: ReplayBufferState) -> Dict[str, Array]:
        """Host-side helper: materialize every currently-valid transition."""
        valid = np.asarray(state.is_valid).nonzero()[0]
        idx = jnp.asarray(valid, jnp.int32)
        return self.sample(state, jax.random.PRNGKey(0), int(valid.shape[0]), indices=idx)
