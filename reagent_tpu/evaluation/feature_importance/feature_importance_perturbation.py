"""Permutation-based feature importance.

Reference: reagent/evaluation/feature_importance/feature_importance_base.py:12-18
and feature_importance_perturbation.py:21-77 — per feature, shuffle that column
across the batch and measure the mean |Δprediction|.

TPU-native: the perturbation uses an explicit PRNG permutation and the pred_fn
is expected to be jitted by the caller; data stays as host dicts between
batches (this is an offline analysis tool, not a training hot path).
"""

from __future__ import annotations

import dataclasses
import logging
from collections import defaultdict
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

Array = jax.Array


@dataclasses.dataclass
class FeatureImportanceBase:
    model: Any
    sorted_feature_ids: List[int]

    def compute_feature_importance(self) -> pd.DataFrame:
        raise NotImplementedError


@dataclasses.dataclass
class FeatureImportancePerturbation(FeatureImportanceBase):
    data_loader: Any = None
    # (model, data) -> [batch, 1] predictions
    pred_fn: Callable[[Any, Any], Array] = None
    # (data, feature_idx, rng) -> perturbed data
    perturb_fn: Callable[[Any, int, Array], Any] = None
    repeat: int = 1
    rng: Optional[Array] = None

    def compute_feature_importance(self) -> pd.DataFrame:
        rng = self.rng if self.rng is not None else jax.random.PRNGKey(0)
        vals = defaultdict(list)
        for batch_idx, data in enumerate(self.data_loader):
            for r in range(self.repeat):
                pred = self.pred_fn(self.model, data)
                for feature_idx, feature_id in enumerate(self.sorted_feature_ids):
                    rng, sub = jax.random.split(rng)
                    perturbed = self.perturb_fn(_copy_data(data), feature_idx, sub)
                    perturbed_pred = self.pred_fn(self.model, perturbed)
                    vals[feature_id].append(
                        float(jnp.mean(jnp.abs(perturbed_pred - pred)))
                    )
                logger.info("Processed %d batches %d-th time", batch_idx, r)
        means = {k: float(np.mean(v)) for k, v in vals.items()}
        df = pd.DataFrame.from_dict(
            means, orient="index", columns=["feature_importance"]
        ).sort_values(by=["feature_importance"], ascending=False)
        df.insert(0, "feature_id", df.index)
        return df


def _copy_data(data):
    if isinstance(data, dict):
        return {k: _copy_data(v) for k, v in data.items()}
    if isinstance(data, tuple):
        return tuple(_copy_data(v) for v in data)
    return data  # jax arrays are immutable — no deep copy needed


def create_default_perturb_fn(key: str):
    """Shuffle one (value, presence) column across the batch (ref :65-77)."""

    def default_perturb_fn(data, feature_idx: int, rng: Array):
        values, presence = data[key]
        values = jnp.asarray(values)
        presence = jnp.asarray(presence)
        perm = jax.random.permutation(rng, values.shape[0])
        data[key] = (
            values.at[:, feature_idx].set(values[perm, feature_idx]),
            presence.at[:, feature_idx].set(presence[perm, feature_idx]),
        )
        return data

    return default_perturb_fn
