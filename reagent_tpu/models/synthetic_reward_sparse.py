"""Synthetic-reward net over dense + sparse (ID-list) features.

Reference: reagent/models/synthetic_reward_sparse_arch.py:43-299 — a
torchrec-style sparse arch (per-feature embedding bags) combined with the
dense tower through a DLRM dot-product interaction, producing per-step
rewards whose masked sum matches the observed aggregate reward.

TPU design: jagged ID-lists are padded `IdListFeature`s (ids [.., L] +
mask), so the embedding lookup is a gather + masked mean — static shapes,
MXU-friendly — instead of torchrec's KeyedJaggedTensor segment ops.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.core import types as rlt
from reagent_tpu.models.embedding_bag import EmbeddingBag
from reagent_tpu.models.fully_connected_network import ACTIVATIONS, FullyConnectedNetwork
from reagent_tpu.models.synthetic_reward import (
    SyntheticRewardNetworkOutput,
    _gen_mask,
)

Array = jax.Array


class SparseArchSyntheticRewardNet(nn.Module):
    """Per-step reward from dense state/action + sparse ID-list features.

    Dense tower: MLP(concat(state, action)) -> F.
    Sparse tower: one embedding bag per configured feature -> F each.
    Interaction: pairwise dot products among the (1 + num_sparse) F-dim
    vectors, concatenated with the dense tower output (the DLRM interaction
    the reference builds with torchrec's InteractionArch,
    synthetic_reward_sparse_arch.py:120-180), then an over-arch MLP to a
    per-step scalar.
    """

    state_dim: int
    action_dim: int
    dense_sizes: Sequence[int]
    dense_activations: Sequence[str]
    overall_sizes: Sequence[int]
    overall_activations: Sequence[str]
    embedding_configs: Tuple[Tuple[str, int, int], ...]  # (name, vocab, F)
    last_layer_activation: str = "sigmoid"

    @nn.compact
    def __call__(
        self,
        state: Array,  # [T, B, Ds]
        action: Array,  # [T, B, Da]
        id_list_features: Dict[str, rlt.IdListFeature],  # ids [T, B, L]
    ) -> Array:
        T, B, _ = action.shape
        f_dim = self.dense_sizes[-1]
        dense = FullyConnectedNetwork(
            sizes=[self.state_dim + self.action_dim, *self.dense_sizes],
            activations=list(self.dense_activations),
        )(jnp.concatenate([state, action], axis=-1))  # [T, B, F]

        towers = [dense]
        for name, vocab, dim in self.embedding_configs:
            assert dim == f_dim, (
                "sparse embedding dim must match dense tower output "
                f"({name}: {dim} != {f_dim})"
            )
            feat = id_list_features[name]
            flat = rlt.IdListFeature(
                ids=feat.ids.reshape(T * B, -1), mask=feat.mask.reshape(T * B, -1)
            )
            emb = EmbeddingBag(table_size=vocab, embedding_dim=dim, name=name)(
                flat
            )  # [T*B, F]
            towers.append(emb.reshape(T, B, f_dim))

        stack = jnp.stack(towers, axis=2)  # [T, B, K, F]
        # pairwise dot products, upper triangle (DLRM interaction)
        inter = jnp.einsum("tbkf,tblf->tbkl", stack, stack)
        k = stack.shape[2]
        iu, ju = jnp.triu_indices(k, 1)
        inter_flat = inter[:, :, iu, ju]  # [T, B, K*(K-1)/2]
        combined = jnp.concatenate([dense, inter_flat], axis=-1)

        in_dim = f_dim + (k * (k - 1)) // 2
        out = FullyConnectedNetwork(
            sizes=[in_dim, *self.overall_sizes, 1],
            activations=[*self.overall_activations, "linear"],
        )(combined)[..., 0]  # [T, B]
        out = ACTIVATIONS[self.last_layer_activation](out)
        return jnp.transpose(out, (1, 0))  # [B, T]


class SyntheticRewardSparseArchNet(nn.Module):
    """Masked-sum wrapper with sparse pass-through (ref :43-118 wrapper)."""

    net: SparseArchSyntheticRewardNet

    def __call__(self, batch: rlt.MemoryNetworkInput) -> SyntheticRewardNetworkOutput:
        state = batch.state.float_features
        action = batch.action.float_features
        T, B, _ = action.shape
        output = self.net(state, action, batch.state.id_list_features or {})
        mask = _gen_mask(batch.valid_step, B, T)
        pred = jnp.sum(output * mask, axis=1, keepdims=True)
        return SyntheticRewardNetworkOutput(
            predicted_reward=pred, mask=mask, output=output
        )
