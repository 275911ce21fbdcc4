"""Shared net-builder helpers."""

from __future__ import annotations

from typing import Optional

from reagent_tpu.core.parameters import NormalizationData
from reagent_tpu.preprocessing.normalization import get_num_output_features


def state_dim_of(normalization_data: Optional[NormalizationData], fallback: Optional[int] = None) -> int:
    if normalization_data is not None and normalization_data.dense_normalization_parameters:
        return get_num_output_features(normalization_data.dense_normalization_parameters)
    assert fallback is not None, "need normalization data or an explicit dim"
    return fallback
