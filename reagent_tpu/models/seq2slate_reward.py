"""Slate reward models: predict the reward of a (state, permuted slate).

Reference: reagent/models/seq2slate_reward.py — GRU-based (:75) and
transformer-based (:201) reward nets over PreprocessedRankingInput, plus an
ensemble wrapper (:401).  LSTM replaces GRU (flax has an optimized LSTM cell;
same sequential-encoder role).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.core import types as rlt
from reagent_tpu.models.seq2slate import Embedder, EncoderLayer, PositionalEncoding

Array = jax.Array


class Seq2SlateGRURewardNet(nn.Module):
    """Recurrent slate-reward net (reference :75-200)."""

    state_dim: int
    candidate_dim: int
    num_hiddens: int = 64
    num_layers: int = 1

    @nn.compact
    def __call__(self, input: rlt.PreprocessedRankingInput) -> Array:
        """tgt_out_seq [B, T, C] in ranked order -> predicted slate reward [B, 1]."""
        state = input.state.float_features
        slate = input.tgt_out_seq.float_features
        B, T, _ = slate.shape
        state_embed = nn.Dense(self.num_hiddens)(state)
        h = slate  # [B, T, C]
        for i in range(self.num_layers):
            carry = (jnp.zeros((B, self.num_hiddens)), state_embed)
            h = nn.RNN(nn.OptimizedLSTMCell(self.num_hiddens))(h, initial_carry=carry)
        return nn.Dense(1)(h[:, -1])


class Seq2SlateTransformerRewardNet(nn.Module):
    """Transformer slate-reward net (reference :201-364)."""

    state_dim: int
    candidate_dim: int
    num_stacked_layers: int = 2
    num_heads: int = 2
    dim_model: int = 64
    dim_feedforward: int = 32

    @nn.compact
    def __call__(self, input: rlt.PreprocessedRankingInput) -> Array:
        state = input.state.float_features
        slate = input.tgt_out_seq.float_features
        B, T, _ = slate.shape
        sed = self.dim_model // 2
        cand = Embedder(self.dim_model - sed)(slate)
        st = jnp.broadcast_to(Embedder(sed)(state)[:, None, :], (B, T, sed))
        x = PositionalEncoding()(jnp.concatenate([st, cand], axis=2))
        for _ in range(self.num_stacked_layers):
            x = EncoderLayer(self.dim_model, self.num_heads, self.dim_feedforward)(x)
        pooled = jnp.mean(x, axis=1)
        return nn.Dense(1)(pooled)


class Seq2SlateRewardNetEnsemble:
    """Mean over member predictions (reference :401-430)."""

    def __init__(self, net: nn.Module, params_list):
        self.net = net
        self.params_list = params_list

    def __call__(self, input: rlt.PreprocessedRankingInput) -> Array:
        preds = [self.net.apply(p, input) for p in self.params_list]
        return jnp.mean(jnp.stack(preds), axis=0)
