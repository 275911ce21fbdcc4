"""MDN-RNN world model (Ha & Schmidhuber "World Models").

Reference: reagent/models/mdn_rnn.py:21-110 (LSTM + gaussian-mixture head over
next state, plus reward and not-terminal heads) and :188 ``gmm_loss``.

TPU-native: the LSTM is a flax ``nn.RNN`` scan over time; all sequence dims
follow the reference convention [seq_len, batch, ...].
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from reagent_tpu.core import types as rlt

Array = jax.Array


class StackedLSTM(nn.Module):
    """Multi-layer LSTM over [T, B, D] sequences, returning all hidden states."""

    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, xs: Array, initial_carry: Optional[Tuple] = None):
        # flax RNN wants [B, T, D]
        h = jnp.swapaxes(xs, 0, 1)
        last_carries = []
        for i in range(self.num_layers):
            rnn = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size), return_carry=True
            )
            carry_i = None if initial_carry is None else initial_carry[i]
            if carry_i is not None:
                carry, h = rnn(h, initial_carry=carry_i)
            else:
                carry, h = rnn(h)
            last_carries.append(carry)
        return jnp.swapaxes(h, 0, 1), last_carries  # [T, B, H], carries


class MDNRNN(nn.Module):
    """Reference: mdn_rnn.py:21.

    ``predict_delta=True`` parameterizes the gaussian means as
    ``state + delta`` (the head regresses the state *change*). The output
    contract is unchanged — ``mus`` are absolute next-state means — but for
    near-identity dynamics (classic control at small dt) the residual target
    is orders of magnitude smaller than the state scale, which sharpens
    multi-step planner rollouts. The reference always regresses the absolute
    next state (mdn_rnn.py:95-107).
    """

    state_dim: int
    action_dim: int
    num_hiddens: int
    num_hidden_layers: int
    num_gaussians: int
    predict_delta: bool = False

    @nn.compact
    def __call__(self, actions: Array, states: Array, initial_carry=None):
        """actions/states: [T, B, dim] -> GMM params + reward + not_terminal."""
        T, B = actions.shape[0], actions.shape[1]
        ins = jnp.concatenate([actions, states], axis=-1)
        all_hidden, last_carries = StackedLSTM(
            self.num_hiddens, self.num_hidden_layers
        )(ins, initial_carry)
        G, S = self.num_gaussians, self.state_dim
        out = nn.Dense((2 * S + 1) * G + 2)(all_hidden)
        stride = G * S
        mus = out[..., :stride].reshape(T, B, G, S)
        if self.predict_delta:
            mus = mus + states[..., None, :]
        sigmas = jnp.exp(out[..., stride : 2 * stride]).reshape(T, B, G, S)
        logpi = jax.nn.log_softmax(
            out[..., 2 * stride : 2 * stride + G].reshape(T, B, G), axis=-1
        )
        reward = out[..., -2]
        not_terminal = out[..., -1]
        return mus, sigmas, logpi, reward, not_terminal, all_hidden, last_carries


def gmm_loss(batch: Array, mus: Array, sigmas: Array, logpi: Array, reduce: bool = True) -> Array:
    """Negative log-likelihood under a factored GMM (reference mdn_rnn.py:188)."""
    batch = batch[..., None, :]  # [..., 1, fs]
    log_norm = -0.5 * (
        ((batch - mus) / sigmas) ** 2 + 2 * jnp.log(sigmas) + jnp.log(2 * jnp.pi)
    )
    g_log_probs = logpi + jnp.sum(log_norm, axis=-1)
    log_prob = jax.nn.logsumexp(g_log_probs, axis=-1)
    if reduce:
        return -jnp.mean(log_prob)
    return -log_prob


class MemoryNetwork(nn.Module):
    """Wrapper returning typed output (reference models/world_model.py:12)."""

    state_dim: int
    action_dim: int
    num_hiddens: int
    num_hidden_layers: int
    num_gaussians: int
    predict_delta: bool = False

    @nn.compact
    def __call__(self, state: rlt.FeatureData, action: rlt.FeatureData) -> rlt.MemoryNetworkOutput:
        mus, sigmas, logpi, reward, not_terminal, all_hidden, carries = MDNRNN(
            self.state_dim,
            self.action_dim,
            self.num_hiddens,
            self.num_hidden_layers,
            self.num_gaussians,
            self.predict_delta,
        )(action.float_features, state.float_features)
        last_c, last_h = carries[-1]
        return rlt.MemoryNetworkOutput(
            mus=mus,
            sigmas=sigmas,
            logpi=logpi,
            reward=reward,
            not_terminal=not_terminal,
            last_step_hidden=last_h,
            last_step_cell=last_c,
            all_steps_hidden=all_hidden,
        )


class MDNRNNMemorySample(NamedTuple):
    """One world-model transition sequence (reference models/mdn_rnn.py:108-117)."""

    state: np.ndarray
    action: np.ndarray
    next_state: np.ndarray
    reward: np.ndarray
    not_terminal: np.ndarray


class MDNRNNMemoryPool:
    """Ring buffer of world-model sequences (reference models/mdn_rnn.py:121-170).

    Batches come out [seq_len, batch, ...] — time-major, the layout MDN-RNN
    scans over — assembled host-side in numpy and shipped to device once.
    """

    def __init__(self, max_replay_memory_size: int):
        from collections import deque

        self.replay_memory = deque(maxlen=max_replay_memory_size)
        self.max_replay_memory_size = max_replay_memory_size

    @property
    def memory_size(self) -> int:
        return len(self.replay_memory)

    def insert_into_memory(self, state, action, next_state, reward, not_terminal):
        self.replay_memory.append(
            MDNRNNMemorySample(
                state=np.asarray(state, np.float32),
                action=np.asarray(action, np.float32),
                next_state=np.asarray(next_state, np.float32),
                reward=np.asarray(reward, np.float32),
                not_terminal=np.asarray(not_terminal, np.float32),
            )
        )

    def sample_memories(self, batch_size: int, rng=None) -> "rlt.MemoryNetworkInput":
        rng = rng or np.random.default_rng()
        idx = rng.integers(0, self.memory_size, batch_size)
        samples = [self.replay_memory[i] for i in idx]
        # stack to [batch, seq_len, ...] then transpose to time-major
        state, action, next_state, reward, not_terminal = (
            np.stack([getattr(s, f) for s in samples])
            for f in ("state", "action", "next_state", "reward", "not_terminal")
        )
        tm = lambda x: jnp.asarray(np.moveaxis(x, 0, 1))  # noqa: E731
        reward_tm = tm(reward)
        return rlt.MemoryNetworkInput(
            state=rlt.FeatureData(float_features=tm(state)),
            action=rlt.FeatureData(float_features=tm(action)),
            next_state=rlt.FeatureData(float_features=tm(next_state)),
            reward=reward_tm,
            not_terminal=tm(not_terminal),
            time_diff=jnp.ones_like(reward_tm),
            step=None,
        )
