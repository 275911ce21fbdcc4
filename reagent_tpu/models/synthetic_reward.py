"""Synthetic-reward networks: decompose an aggregate (episode) reward into
per-step rewards.

Reference: reagent/models/synthetic_reward.py (SyntheticRewardNet base :229,
single-step FC :275, n-gram FC :373, LSTM :420, transformer :470 variants).
Trained by RewardNetTrainer on MemoryNetworkInput where ``reward`` holds the
aggregate at the last valid step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.core import types as rlt
from reagent_tpu.models.fully_connected_network import ACTIVATIONS, FullyConnectedNetwork

Array = jax.Array


class SyntheticRewardNetworkOutput(NamedTuple):
    predicted_reward: Array  # [B, 1]
    mask: Array  # [B, T]
    output: Array  # [B, T] per-step rewards


def _gen_mask(valid_step: Array, batch_size: int, seq_len: int) -> Array:
    """mask[b, t] = 1 for the LAST ``valid_step[b]`` positions (ref :200-226)."""
    col = jnp.arange(seq_len)[None, :]
    return (col >= seq_len - valid_step.reshape(-1, 1)).astype(jnp.float32)


class SingleStepSyntheticRewardNet(nn.Module):
    """Per-step reward from concat(state, action) via an MLP (ref :275)."""

    state_dim: int
    action_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]
    last_layer_activation: str = "linear"

    @nn.compact
    def __call__(self, state: Array, action: Array) -> Array:
        # state/action: [T, B, dim] -> per-step reward [B, T]
        x = jnp.concatenate([state, action], axis=-1)
        out = FullyConnectedNetwork(
            sizes=[self.state_dim + self.action_dim, *self.sizes, 1],
            activations=[*self.activations, self.last_layer_activation],
        )(x)
        return jnp.transpose(out[..., 0], (1, 0))


class NGramFullyConnectedNetwork(nn.Module):
    """Per-step reward from a context window of n steps (ref :373)."""

    state_dim: int
    action_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]
    context_size: int = 3
    last_layer_activation: str = "linear"

    @nn.compact
    def __call__(self, state: Array, action: Array) -> Array:
        T, B, _ = state.shape
        x = jnp.concatenate([state, action], axis=-1)  # [T, B, D]
        D = x.shape[-1]
        pad = self.context_size // 2
        padded = jnp.concatenate(
            [jnp.zeros((pad, B, D)), x, jnp.zeros((pad, B, D))], axis=0
        )
        # window per step: [T, B, context*D]
        windows = jnp.concatenate(
            [padded[i : i + T] for i in range(self.context_size)], axis=-1
        )
        out = FullyConnectedNetwork(
            sizes=[self.context_size * D, *self.sizes, 1],
            activations=[*self.activations, self.last_layer_activation],
        )(windows)
        return jnp.transpose(out[..., 0], (1, 0))


class NGramConvolutionalNetwork(nn.Module):
    """Per-step reward from a conv stack over each context window (ref :311-370).

    Each step's [context_size, state_dim+action_dim] window is treated as a
    1-channel image; conv height kernels slide over the context axis while the
    first layer's width kernel spans the full feature axis, then an MLP head
    scores the flattened features.  All windows across (T, B) are batched into
    one conv call so XLA tiles a single large convolution onto the MXU.
    """

    state_dim: int
    action_dim: int
    sizes: Sequence[int]
    activations: Sequence[str]
    context_size: int = 3
    conv_dims: Sequence[int] = (32,)
    conv_height_kernels: Sequence[int] = (2,)
    last_layer_activation: str = "linear"

    @nn.compact
    def __call__(self, state: Array, action: Array) -> Array:
        assert self.context_size % 2 == 1, "context_size must be odd"
        T, B, _ = state.shape
        x = jnp.concatenate([state, action], axis=-1)  # [T, B, D]
        D = x.shape[-1]
        pad = self.context_size // 2
        padded = jnp.concatenate(
            [jnp.zeros((pad, B, D)), x, jnp.zeros((pad, B, D))], axis=0
        )
        # [T, B, context, D] windows -> one conv batch [T*B, context, D, 1]
        windows = jnp.stack(
            [padded[i : i + T] for i in range(self.context_size)], axis=2
        )
        h = windows.reshape(T * B, self.context_size, D, 1)
        for i, dim in enumerate(self.conv_dims):
            kw = D if i == 0 else 1
            h = nn.relu(
                nn.Conv(
                    dim,
                    kernel_size=(self.conv_height_kernels[i], kw),
                    padding="VALID",
                )(h)
            )
        h = h.reshape(T * B, -1)
        out = FullyConnectedNetwork(
            sizes=[h.shape[-1], *self.sizes, 1],
            activations=[*self.activations, self.last_layer_activation],
        )(h)
        return out.reshape(T, B).T  # [B, T]


class SequenceSyntheticRewardNet(nn.Module):
    """Bidirectional-ish LSTM scorer over the sequence (ref :420)."""

    state_dim: int
    action_dim: int
    lstm_hidden_size: int = 64
    lstm_num_layers: int = 1
    last_layer_activation: str = "linear"

    @nn.compact
    def __call__(self, state: Array, action: Array) -> Array:
        x = jnp.concatenate([state, action], axis=-1)
        h = jnp.swapaxes(x, 0, 1)  # [B, T, D]
        for _ in range(self.lstm_num_layers):
            h = nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden_size))(h)
        out = nn.Dense(1)(h)[..., 0]  # [B, T]
        return ACTIVATIONS[self.last_layer_activation](out)


class TransformerSyntheticRewardNet(nn.Module):
    """Self-attention scorer over the sequence (ref :470)."""

    state_dim: int
    action_dim: int
    d_model: int = 64
    nhead: int = 2
    num_encoder_layers: int = 2
    dim_feedforward: int = 128
    last_layer_activation: str = "linear"

    @nn.compact
    def __call__(self, state: Array, action: Array) -> Array:
        x = jnp.concatenate([state, action], axis=-1)
        h = jnp.swapaxes(x, 0, 1)  # [B, T, D]
        h = nn.Dense(self.d_model)(h)
        for _ in range(self.num_encoder_layers):
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=self.d_model
            )(h, h)
            h = nn.LayerNorm()(h + attn)
            ff = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.dim_feedforward)(h)))
            h = nn.LayerNorm()(h + ff)
        out = nn.Dense(1)(h)[..., 0]
        return ACTIVATIONS[self.last_layer_activation](out)


class SyntheticRewardNet(nn.Module):
    """Wrapper: mask to last valid steps, sum to the aggregate (ref :229)."""

    net: nn.Module

    def __call__(self, batch: rlt.MemoryNetworkInput) -> SyntheticRewardNetworkOutput:
        state = batch.state.float_features
        action = batch.action.float_features
        T, B, _ = action.shape
        output = self.net(state, action)  # [B, T]
        mask = _gen_mask(batch.valid_step, B, T)
        pred = jnp.sum(output * mask, axis=1, keepdims=True)
        return SyntheticRewardNetworkOutput(predicted_reward=pred, mask=mask, output=output)
