"""Preprocessing tests (mirrors reference test/preprocessing/test_preprocessing.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core.parameters import NormalizationParameters
from reagent_tpu.preprocessing import identify_types
from reagent_tpu.preprocessing.identify_types import identify_type
from reagent_tpu.preprocessing.normalization import (
    MISSING_VALUE,
    get_num_output_features,
    identify_parameter,
    serialize,
    deserialize,
    sort_features_by_normalization,
)
from reagent_tpu.preprocessing.preprocessor import Preprocessor, make_preprocessor


def test_identify_types():
    rng = np.random.default_rng(0)
    assert identify_type(np.array([0, 1, 1, 0, 1])) == "BINARY"
    assert identify_type(rng.uniform(size=100)) == "PROBABILITY"
    assert identify_type(np.array([1, 2, 3, 4, 5] * 10)) == "ENUM"
    assert identify_type(rng.normal(loc=10, scale=3, size=100)) == "CONTINUOUS"
    assert identify_type(np.arange(100).astype(float)) == "CONTINUOUS"  # >10 uniques


def test_identify_parameter_continuous():
    rng = np.random.default_rng(1)
    vals = rng.normal(loc=5.0, scale=2.0, size=5000)
    p = identify_parameter("f", vals)
    assert p.feature_type == "CONTINUOUS"
    assert p.mean == pytest.approx(5.0, abs=0.1)
    assert p.stddev == pytest.approx(2.0, abs=0.1)
    assert p.boxcox_lambda is None


def test_identify_parameter_boxcox():
    rng = np.random.default_rng(2)
    vals = np.exp(rng.normal(loc=0.0, scale=1.0, size=5000))
    p = identify_parameter("f", vals)
    assert p.feature_type == "BOXCOX"
    assert p.boxcox_lambda is not None and abs(p.boxcox_lambda) < 0.3


def test_identify_parameter_quantile():
    rng = np.random.default_rng(3)
    # bimodal far-apart lumps: boxcox can't normalize, K2 stays huge
    vals = np.concatenate([rng.normal(-100, 1, 3000), rng.normal(100, 1, 3000)])
    p = identify_parameter("f", vals, skip_box_cox=True)
    assert p.feature_type == "QUANTILE"
    assert p.quantiles is not None and len(p.quantiles) >= 3


def test_identify_parameter_enum():
    vals = np.array([1, 2, 5, 1, 2, 5, 5, 1] * 10, dtype=float)
    p = identify_parameter("f", vals)
    assert p.feature_type == "ENUM"
    assert p.possible_values == (1, 2, 5)


def test_serialize_roundtrip():
    p = {1: identify_parameter("f", np.random.default_rng(0).normal(size=100))}
    q = deserialize(serialize(p))
    assert q[1].feature_type == p[1].feature_type
    assert q[1].mean == pytest.approx(p[1].mean)


def _norm_params():
    return {
        # ids chosen so sorted order within type is stable
        1: NormalizationParameters(feature_type="BINARY"),
        2: NormalizationParameters(feature_type="PROBABILITY"),
        3: NormalizationParameters(feature_type="CONTINUOUS", mean=2.0, stddev=4.0),
        4: NormalizationParameters(
            feature_type="ENUM", possible_values=(0, 5, 7)
        ),
        5: NormalizationParameters(
            feature_type="QUANTILE", quantiles=(0.0, 10.0, 20.0)
        ),
        6: NormalizationParameters(
            feature_type="BOXCOX", boxcox_lambda=0.5, boxcox_shift=0.0, mean=0.0, stddev=1.0
        ),
        7: NormalizationParameters(
            feature_type="CONTINUOUS_ACTION", min_value=-10.0, max_value=10.0
        ),
    }


def test_sort_features_by_type():
    feats, starts = sort_features_by_normalization(_norm_params())
    # FEATURE_TYPES order: BINARY, PROBABILITY, CONTINUOUS, BOXCOX, ENUM, QUANTILE, CONTINUOUS_ACTION
    assert feats == [1, 2, 3, 6, 4, 5, 7]


def test_num_output_features():
    assert get_num_output_features(_norm_params()) == 6 + 3  # ENUM expands to 3


def test_preprocessor_each_type():
    params = _norm_params()
    pre = Preprocessor(params)
    # column order: [binary, probability, continuous, boxcox, enum, quantile, cont_action]
    values = jnp.array([[3.0, 0.5, 10.0, 4.0, 5.0, 5.0, 0.0]])
    presence = jnp.ones_like(values)
    out = np.asarray(pre(values, presence))
    assert out.shape == (1, 9)
    assert out[0, 0] == 1.0  # binary: 3 != 0
    assert out[0, 1] == pytest.approx(0.0, abs=1e-5)  # logit(0.5) = 0
    assert out[0, 2] == pytest.approx((10.0 - 2.0) / 4.0)
    # boxcox λ=.5: (sqrt(4)-1)/.5 = 2
    assert out[0, 3] == pytest.approx(2.0, abs=1e-4)
    # enum 5 -> one-hot slot 1 of (0,5,7)
    np.testing.assert_allclose(out[0, 4:7], [0.0, 1.0, 0.0])
    # quantile: 5 in [0,10,20] -> 0.25
    assert out[0, 7] == pytest.approx(0.25, abs=1e-4)
    # continuous action: 0 in [-10,10] -> ~0
    assert out[0, 8] == pytest.approx(0.0, abs=1e-4)


def test_preprocessor_missing_values_masked():
    params = {
        1: NormalizationParameters(feature_type="CONTINUOUS", mean=2.0, stddev=4.0),
        2: NormalizationParameters(feature_type="ENUM", possible_values=(1, 2)),
    }
    pre = Preprocessor(params)
    values = jnp.array([[MISSING_VALUE, MISSING_VALUE]])
    presence = jnp.array([[0.0, 0.0]])
    out = np.asarray(pre(values, presence))
    np.testing.assert_allclose(out, 0.0)


def test_preprocessor_quantile_extremes():
    params = {1: NormalizationParameters(feature_type="QUANTILE", quantiles=(0.0, 10.0, 20.0))}
    pre = Preprocessor(params)
    out = np.asarray(pre(jnp.array([[-5.0], [25.0], [10.0]]), jnp.ones((3, 1))))
    assert out[0, 0] == pytest.approx(0.0)
    assert out[1, 0] == pytest.approx(1.0)
    assert out[2, 0] == pytest.approx(0.5, abs=1e-4)


def test_preprocessor_jit_and_clamp():
    params = {1: NormalizationParameters(feature_type="CONTINUOUS", mean=0.0, stddev=0.001)}
    fn, pre = make_preprocessor(params)
    out = np.asarray(fn(jnp.array([[1e9]]), jnp.ones((1, 1))))
    assert out[0, 0] == pytest.approx(11.513)  # clamped to MAX_FEATURE_VALUE

    # jit with batch of 128 runs and matches eager
    vals = jnp.linspace(-1, 1, 128).reshape(128, 1)
    np.testing.assert_allclose(
        np.asarray(fn(vals, jnp.ones((128, 1)))),
        np.asarray(pre(vals, jnp.ones((128, 1)))),
        rtol=1e-6,
    )


def test_preprocessor_input_prototype():
    pre = Preprocessor(_norm_params())
    v, p = pre.input_prototype()
    out = pre(v, p)
    assert out.shape == (1, pre.num_output_features)
