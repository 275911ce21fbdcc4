"""The jitted dense-feature Preprocessor.

Reference: reagent/preprocessing/preprocessor.py:23 (an nn.Module with one
parameter block per feature type, traced for TorchScript export).

TPU-native re-design: the normalization spec is compiled at construction into
static per-type parameter tables (device arrays) + static column layouts, and
application is a single pure function ``preprocessor(values, presence)`` of
vectorized elementwise ops — no Python loop over features at trace time, fully
fused by XLA onto the VPU.  The same callable is used for training-side batch
preprocessing and for serving export (it is just a jittable closure).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core.parameters import NormalizationParameters
from reagent_tpu.preprocessing import identify_types
from reagent_tpu.preprocessing.identify_types import (
    BINARY,
    BOXCOX,
    CLIP_LOG,
    CONTINUOUS,
    CONTINUOUS_ACTION,
    DISCRETE_ACTION,
    DO_NOT_PREPROCESS,
    ENUM,
    FEATURE_TYPES,
    PROBABILITY,
    QUANTILE,
)
from reagent_tpu.preprocessing.normalization import (
    EPS,
    MAX_FEATURE_VALUE,
    MIN_FEATURE_VALUE,
    MISSING_VALUE,
    sort_features_by_normalization,
)


class Preprocessor:
    """Compile a normalization spec into a pure jittable preprocessing fn.

    Input: ``values`` [B, F] raw features in sorted-by-(type, id) column order
    and ``presence`` [B, F] (bool/0-1).  Output: [B, D] normalized features
    where ENUM features expand into one-hot blocks.
    """

    def __init__(
        self,
        normalization_parameters: Dict[int, NormalizationParameters],
        clamp: bool = True,
        dtype=jnp.float32,
    ):
        self.normalization_parameters = normalization_parameters
        self.sorted_features, _ = sort_features_by_normalization(normalization_parameters)
        self.dtype = dtype
        self.clamp = clamp

        # Static layout: contiguous column range per feature type.
        self._type_ranges: List[Tuple[str, int, int]] = []
        start = 0
        for ftype in FEATURE_TYPES:
            feats = [
                f for f in self.sorted_features
                if normalization_parameters[f].feature_type == ftype
            ]
            if feats:
                self._type_ranges.append((ftype, start, start + len(feats)))
                start += len(feats)
        self.num_input_features = start

        # Pre-build device parameter tables per type.
        self._tables: Dict[str, Dict[str, jnp.ndarray]] = {}
        p_of = lambda ftype: [
            normalization_parameters[f]
            for f in self.sorted_features
            if normalization_parameters[f].feature_type == ftype
        ]

        cont = p_of(CONTINUOUS)
        if cont:
            self._tables[CONTINUOUS] = {
                "mean": jnp.array([p.mean for p in cont], dtype),
                "stddev": jnp.array([p.stddev for p in cont], dtype),
            }
        dnp = p_of(DO_NOT_PREPROCESS)
        bc = p_of(BOXCOX)
        if bc:
            for p in bc:
                assert p.boxcox_lambda is not None and abs(p.boxcox_lambda) > 1e-6, (
                    f"invalid boxcox lambda: {p.boxcox_lambda}"
                )
            self._tables[BOXCOX] = {
                "shift": jnp.array([p.boxcox_shift for p in bc], dtype),
                "lmbda": jnp.array([p.boxcox_lambda for p in bc], dtype),
                "mean": jnp.array([p.mean for p in bc], dtype),
                "stddev": jnp.array([p.stddev for p in bc], dtype),
            }
        ca = p_of(CONTINUOUS_ACTION)
        if ca:
            mins = np.array([p.min_value for p in ca])
            maxs = np.array([p.max_value for p in ca])
            self._tables[CONTINUOUS_ACTION] = {
                "min_serving": jnp.asarray(mins, dtype),
                # train range is (-1+eps, 1-eps) (reference preprocessor.py:248-273)
                "min_training": jnp.full((len(ca),), -1.0 + EPS, dtype),
                "scale": jnp.asarray((1.0 - EPS) * 2.0 / (maxs - mins), dtype),
            }
        qt = p_of(QUANTILE)
        if qt:
            B = max(len(p.quantiles) for p in qt)
            bounds = np.zeros((len(qt), B))
            for i, p in enumerate(qt):
                q = np.asarray(p.quantiles, dtype=np.float64)
                bounds[i, :] = q[-1]
                bounds[i, : len(q)] = q
            self._tables[QUANTILE] = {
                "bounds": jnp.asarray(bounds, dtype),  # [F, B]
                "num_quantiles": jnp.array([len(p.quantiles) - 1 for p in qt], dtype),
                "qmin": jnp.array([min(p.quantiles) for p in qt], dtype),
                "qmax": jnp.array([max(p.quantiles) for p in qt], dtype),
            }
        en = p_of(ENUM)
        if en:
            V = max(len(p.possible_values) for p in en)
            enum_vals = np.full((len(en), V), np.nan)
            keep_cols = []  # static flat indices of valid one-hot slots
            for i, p in enumerate(en):
                pv = np.asarray(p.possible_values, dtype=np.float64)
                enum_vals[i, : len(pv)] = pv
                keep_cols.extend(i * V + j for j in range(len(pv)))
            self._tables[ENUM] = {
                "values": jnp.asarray(enum_vals, dtype),  # [F, V], NaN-padded
                "keep_cols": tuple(keep_cols),  # static
            }

        # Output width per type block (ENUM expands).
        self.num_output_features = 0
        for ftype, s, e in self._type_ranges:
            if ftype == ENUM:
                self.num_output_features += sum(
                    len(p.possible_values) for p in p_of(ENUM)
                )
            else:
                self.num_output_features += e - s

    # -- per-type transforms (each: [B, f] -> [B, out]) ---------------------

    def _t_DO_NOT_PREPROCESS(self, x):
        return x

    def _t_BINARY(self, x):
        return (x != 0).astype(self.dtype)

    def _t_CLIP_LOG(self, x):
        return jnp.log(jnp.clip(x, EPS))

    def _t_PROBABILITY(self, x):
        c = jnp.clip(x, 1e-5, 1 - 1e-5)
        return -jnp.log(1.0 / c - 1.0)

    def _t_CONTINUOUS(self, x):
        t = self._tables[CONTINUOUS]
        return (x - t["mean"]) / t["stddev"]

    def _t_BOXCOX(self, x):
        t = self._tables[BOXCOX]
        bx = (jnp.power(jnp.clip(x + t["shift"], 1e-6), t["lmbda"]) - 1.0) / t["lmbda"]
        return (bx - t["mean"]) / t["stddev"]

    def _t_CONTINUOUS_ACTION(self, x):
        t = self._tables[CONTINUOUS_ACTION]
        out = (x - t["min_serving"]) * t["scale"] + t["min_training"]
        return jnp.clip(out, -1 + EPS, 1 - EPS)

    def _t_DISCRETE_ACTION(self, x):
        return x

    def _t_QUANTILE(self, x):
        """Percentile with linear interpolation between quantile boundaries.

        Same math as reference preprocessor.py:434-505, vectorized over a
        NaN-free padded [F, B] boundary matrix.
        """
        t = self._tables[QUANTILE]
        bounds = t["bounds"]  # [F, B]
        xe = x[:, :, None]  # [Bt, F, 1]
        ge = (xe >= bounds).astype(self.dtype)  # [Bt, F, B]
        lt = (xe < bounds).astype(self.dtype)
        set_to_max = (x >= t["qmax"]).astype(self.dtype)
        set_to_min = (x <= t["qmin"]).astype(self.dtype)
        interpolate = ((set_to_min + set_to_max) < 0.01).astype(self.dtype)
        big = jnp.asarray(1e20, self.dtype)
        left = jnp.max(ge * bounds + lt * (-big), axis=2)
        right = jnp.min(lt * bounds + ge * big, axis=2)
        left_start = jnp.sum(ge, axis=2) - 1.0
        interpolated = (
            left_start + (x - left) / ((right + 1e-6) - left)
        ) / t["num_quantiles"]
        return set_to_max + interpolate * interpolated

    def _t_ENUM(self, x, presence):
        t = self._tables[ENUM]
        onehot = (x[:, :, None] == t["values"]).astype(self.dtype)  # [B, F, V]
        onehot = onehot * presence[:, :, None].astype(self.dtype)
        flat = onehot.reshape(x.shape[0], -1)
        return flat[:, jnp.array(t["keep_cols"])]

    # -- forward ------------------------------------------------------------

    def __call__(self, values: jnp.ndarray, presence: jnp.ndarray) -> jnp.ndarray:
        assert values.shape == presence.shape, f"{values.shape} != {presence.shape}"
        values = values.astype(self.dtype)
        presence = presence.astype(self.dtype)
        outputs = []
        for ftype, s, e in self._type_ranges:
            x = values[:, s:e]
            pres = presence[:, s:e]
            if ftype == ENUM:
                out = self._t_ENUM(x, pres)  # presence baked in
            else:
                out = getattr(self, "_t_" + ftype)(x) * pres
                if self.clamp and ftype != DO_NOT_PREPROCESS:
                    out = jnp.clip(out, MIN_FEATURE_VALUE, MAX_FEATURE_VALUE)
            outputs.append(out)
        return jnp.concatenate(outputs, axis=1)

    def input_prototype(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        f = self.num_input_features
        return jnp.zeros((1, f), self.dtype), jnp.ones((1, f), self.dtype)


def make_preprocessor(
    normalization_parameters: Dict[int, NormalizationParameters],
    clamp: bool = True,
):
    """Return a jitted pure fn ``(values, presence) -> normalized`` ."""
    p = Preprocessor(normalization_parameters, clamp=clamp)
    return jax.jit(p.__call__), p


def presence_from_missing(values: jnp.ndarray) -> jnp.ndarray:
    """Presence mask from the MISSING_VALUE sentinel convention."""
    return (values != MISSING_VALUE).astype(jnp.float32)
