"""Sparse (ID-list) embedding models.

Reference: reagent/models/sparse_dqn.py (torchrec EmbeddingBagCollection +
KeyedJaggedTensor), reagent/models/embedding_bag_concat.py,
reagent/preprocessing/sparse_preprocessor.py:16-60 (exact vs sigrid-hash id
mapping).

TPU-native design: jagged ID lists are fixed-width padded ``IdListFeature``
arrays; an embedding bag is a gather + masked mean/sum — static shapes that
XLA lays out as one embedding-table lookup per feature, fused with the dense
trunk.  Hashing is a cheap mix-hash mod table-size (the sigrid-hash
equivalent).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from reagent_tpu.core import types as rlt
from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork

Array = jax.Array


def hash_ids(raw_ids: Array, table_size: int, salt: int = 0) -> Array:
    """Deterministic mix-hash into [0, table_size) (sigrid_hash equivalent,
    reference sparse_preprocessor.py:51-60)."""
    x = raw_ids.astype(jnp.uint32) + jnp.uint32(salt)
    x = (x ^ (x >> 16)) * jnp.uint32(0x45D9F3B)
    x = (x ^ (x >> 16)) * jnp.uint32(0x45D9F3B)
    x = x ^ (x >> 16)
    return (x % jnp.uint32(table_size)).astype(jnp.int32)


class EmbeddingBag(nn.Module):
    """Pooled embedding of one padded ID-list feature."""

    table_size: int
    embedding_dim: int
    pooling: str = "mean"  # "mean" | "sum"
    hashing: bool = True

    @nn.compact
    def __call__(self, feature: rlt.IdListFeature) -> Array:
        ids = feature.ids
        if self.hashing:
            ids = hash_ids(ids, self.table_size)
        table = self.param(
            "embedding",
            nn.initializers.normal(0.01),
            (self.table_size, self.embedding_dim),
        )
        emb = table[ids]  # [B, L, D]
        mask = feature.mask.astype(jnp.float32)[..., None]
        pooled = jnp.sum(emb * mask, axis=1)
        if self.pooling == "mean":
            pooled = pooled / jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        return pooled  # [B, D]


class EmbeddingBagCollection(nn.Module):
    """One bag per named sparse feature (torchrec EBC equivalent)."""

    configs: Tuple[Tuple[str, int, int], ...]  # (name, table_size, dim)
    hashing: bool = True

    @nn.compact
    def __call__(self, id_list_features: Dict[str, rlt.IdListFeature]) -> Array:
        outs = []
        for name, table_size, dim in self.configs:
            outs.append(
                EmbeddingBag(
                    table_size=table_size, embedding_dim=dim, hashing=self.hashing,
                    name=f"bag_{name}",
                )(id_list_features[name])
            )
        return jnp.concatenate(outs, axis=1)


class EmbeddingBagConcat(nn.Module):
    """Dense features ++ pooled sparse embeddings (reference embedding_bag_concat.py)."""

    state_dense_dim: int
    configs: Tuple[Tuple[str, int, int], ...]

    @property
    def output_dim(self) -> int:
        return self.state_dense_dim + sum(c[2] for c in self.configs)

    @nn.compact
    def __call__(self, state: rlt.FeatureData) -> Array:
        sparse = EmbeddingBagCollection(configs=self.configs)(state.id_list_features)
        return jnp.concatenate([state.float_features, sparse], axis=1)


class SparseDQN(nn.Module):
    """Q-network over dense + sparse state features (reference sparse_dqn.py)."""

    state_dense_dim: int
    action_dim: int
    configs: Tuple[Tuple[str, int, int], ...]  # sparse feature configs
    overarch_dims: Sequence[int]
    activation: str = "relu"

    @nn.compact
    def __call__(self, state: rlt.FeatureData, training: bool = False) -> Array:
        concat = EmbeddingBagConcat(
            state_dense_dim=self.state_dense_dim, configs=self.configs
        )(state)
        in_dim = self.state_dense_dim + sum(c[2] for c in self.configs)
        return FullyConnectedNetwork(
            sizes=[in_dim, *self.overarch_dims, self.action_dim],
            activations=[self.activation] * len(self.overarch_dims) + ["linear"],
        )(concat, training=training)


# Canonical jagged-feature ETL lives in preprocessing/sparse_preprocessor.py
# (MapIDList/MapIDScoreList mapper hierarchy, exact vs hashed); re-exported
# here for back-compat with the original model-side location.
from reagent_tpu.preprocessing.sparse_preprocessor import (  # noqa: E402
    SparsePreprocessor,
    make_sparse_preprocessor,
)
