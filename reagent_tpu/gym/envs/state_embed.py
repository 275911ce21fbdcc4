"""State-embedding POMDP wrapper: MDN-RNN hidden state as the observation.

Reference: reagent/gym/envs/pomdp/state_embed_env.py:30-126 — wraps an env so
each observation becomes [lstm_hidden(history), raw_obs], where history is the
last ``max_embed_seq_len`` (obs, action) pairs fed through a trained
MemoryNetwork.

TPU-native design: the reference keeps a host-side deque and runs the RNN
eagerly per step; here the history is a fixed-length left-aligned buffer
inside the (pytree) env state and the embedding is the RNN's hidden output at
index ``hist_len - 1`` — causal, so the zero-padded tail cannot leak in — and
the whole wrapper stays inside ``jit``/``lax.scan``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.gym.envs.functional import FunctionalEnv

Array = jax.Array


@struct.dataclass
class StateEmbedState:
    inner: Any  # wrapped env's state pytree
    obs_hist: Array  # [L, obs_dim] left-aligned (oldest first)
    act_hist: Array  # [L, act_dim]
    hist_len: Array  # int32 in [0, L]
    cur_raw_obs: Array  # [obs_dim]


class StateEmbedEnv(FunctionalEnv):
    """obs -> concat([mdnrnn hidden over history, raw obs])."""

    def __init__(
        self,
        env: FunctionalEnv,
        memory_network,
        memory_params,
        max_embed_seq_len: int,
    ):
        self.env = env
        self.mdnrnn = memory_network
        self.mdnrnn_params = memory_params
        self.seq_len = int(max_embed_seq_len)
        self.embed_dim = int(memory_network.num_hiddens)
        self.raw_obs_dim = int(env.observation_dim)
        self.observation_dim = self.embed_dim + self.raw_obs_dim
        self.action_dim = env.action_dim
        self.discrete = env.discrete
        self.max_steps = env.max_steps
        # action features fed to the world model: one-hot if discrete
        self._act_feat_dim = env.action_dim

    def _embed(self, obs_hist: Array, act_hist: Array, hist_len: Array) -> Array:
        """Hidden state after the last VALID history step (ref :75-104)."""
        # empty history -> one zero step, exactly like the reference's
        # np.zeros fallback (state_embed_env.py:82-84)
        n = jnp.maximum(hist_len, 1)
        out = self.mdnrnn.apply(
            self.mdnrnn_params,
            rlt.FeatureData(float_features=obs_hist[:, None, :]),
            rlt.FeatureData(float_features=act_hist[:, None, :]),
        )
        # all_steps_hidden: [T, B=1, H]; index n-1 is causal in T
        return out.all_steps_hidden[n - 1, 0]

    def _append(self, state: StateEmbedState, action_feat: Array) -> StateEmbedState:
        L = self.seq_len
        full = state.hist_len >= L
        # not-full: write at hist_len; full: shift left, write at L-1
        obs_ins = jax.lax.dynamic_update_slice(
            state.obs_hist, state.cur_raw_obs[None], (jnp.minimum(state.hist_len, L - 1), 0)
        )
        act_ins = jax.lax.dynamic_update_slice(
            state.act_hist, action_feat[None], (jnp.minimum(state.hist_len, L - 1), 0)
        )
        obs_shift = jnp.concatenate([state.obs_hist[1:], state.cur_raw_obs[None]])
        act_shift = jnp.concatenate([state.act_hist[1:], action_feat[None]])
        return state.replace(
            obs_hist=jnp.where(full, obs_shift, obs_ins),
            act_hist=jnp.where(full, act_shift, act_ins),
            hist_len=jnp.minimum(state.hist_len + 1, L),
        )

    def reset(self, rng: Array) -> Tuple[StateEmbedState, Array]:
        inner, raw_obs = self.env.reset(rng)
        state = StateEmbedState(
            inner=inner,
            obs_hist=jnp.zeros((self.seq_len, self.raw_obs_dim)),
            act_hist=jnp.zeros((self.seq_len, self._act_feat_dim)),
            hist_len=jnp.zeros((), jnp.int32),
            cur_raw_obs=raw_obs,
        )
        embed = self._embed(state.obs_hist, state.act_hist, state.hist_len)
        return state, jnp.concatenate([embed, raw_obs])

    def step(
        self, state: StateEmbedState, action: Array, rng: Array
    ) -> Tuple[StateEmbedState, Array, Array, Array]:
        if self.discrete:
            action_feat = jax.nn.one_hot(action.astype(jnp.int32), self.action_dim)
        else:
            action_feat = action
        state = self._append(state, action_feat)
        inner, raw_obs, reward, done = self.env.step(state.inner, action, rng)
        state = state.replace(inner=inner, cur_raw_obs=raw_obs)
        embed = self._embed(state.obs_hist, state.act_hist, state.hist_len)
        return state, jnp.concatenate([embed, raw_obs]), reward, done
