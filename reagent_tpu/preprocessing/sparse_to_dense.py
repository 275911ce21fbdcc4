"""Sparse (dict-keyed) feature rows -> dense (value, presence) matrices.

Reference: reagent/preprocessing/sparse_to_dense.py — SparseToDenseProcessor:13,
StringKeySparseToDenseProcessor:24, PythonSparseToDenseProcessor:50, and
PythonIdScoreListToTensorProcessor:86.  Host-side ETL that feeds the jitted
Preprocessor, so it is plain numpy (one vectorized gather per batch rather than
the reference's per-row Python loops).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from reagent_tpu.preprocessing.normalization import MISSING_VALUE


class SparseToDenseProcessor:
    """Base: maps rows of {feature_id: value} to ([N, F] values, presence)."""

    def __init__(
        self, sorted_features: Sequence[int], set_missing_value_to_zero: bool = False
    ) -> None:
        self.sorted_features = list(sorted_features)
        self.set_missing_value_to_zero = set_missing_value_to_zero

    def __call__(self, sparse_data):
        return self.process(sparse_data)

    def process(self, sparse_data):
        raise NotImplementedError


class PythonSparseToDenseProcessor(SparseToDenseProcessor):
    """Dict-of-int rows (reference :50-84)."""

    def __init__(
        self, sorted_features: Sequence[int], set_missing_value_to_zero: bool = False
    ) -> None:
        super().__init__(sorted_features, set_missing_value_to_zero)
        self.feature_to_index: Dict[int, int] = {
            f: i for i, f in enumerate(self.sorted_features)
        }

    def process(
        self, sparse_data: List[Dict[int, float]]
    ) -> Tuple[np.ndarray, np.ndarray]:
        missing = 0.0 if self.set_missing_value_to_zero else MISSING_VALUE
        values = np.full((len(sparse_data), len(self.sorted_features)), missing, np.float32)
        for r, row in enumerate(sparse_data):
            for k, v in row.items():
                idx = self.feature_to_index.get(k)
                if idx is not None:
                    values[r, idx] = missing if v is None or np.isnan(v) else v
        if self.set_missing_value_to_zero:
            presence = np.ones_like(values, dtype=bool)
        else:
            presence = values != missing
        return values, presence


class StringKeySparseToDenseProcessor(SparseToDenseProcessor):
    """Same, for rows keyed by stringified feature ids (reference :24-48)."""

    def __init__(
        self, sorted_features: Sequence[int], set_missing_value_to_zero: bool = False
    ) -> None:
        super().__init__(sorted_features, set_missing_value_to_zero)
        self._inner = PythonSparseToDenseProcessor(
            sorted_features, set_missing_value_to_zero
        )

    def process(
        self, sparse_data: List[Dict[str, float]]
    ) -> Tuple[np.ndarray, np.ndarray]:
        return self._inner.process(
            [{int(k): v for k, v in row.items()} for row in sparse_data]
        )


class PythonIdScoreListToTensorProcessor:
    """Weighted-multi-categorical rows -> per-feature (offsets, ids, scores).

    Reference :86-120; output matches the jagged (KeyedJaggedTensor-style)
    layout consumed by the sparse preprocessor.
    """

    def __init__(self, id_score_list_feature_ids: Sequence[int]) -> None:
        self.id_score_list_feature_ids = list(id_score_list_feature_ids)

    def __call__(
        self, list_id_score_list_features: List[Dict[int, Dict[int, float]]]
    ) -> Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        out: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for fid in self.id_score_list_feature_ids:
            offsets, ids, scores = [0], [], []
            for row in list_id_score_list_features:
                mapping = row.get(fid, {})
                ids.extend(mapping.keys())
                scores.extend(mapping.values())
                offsets.append(len(ids))
            out[fid] = (
                np.asarray(offsets[:-1], np.int32),
                np.asarray(ids, np.int64),
                np.asarray(scores, np.float32),
            )
        return out
