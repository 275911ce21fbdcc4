"""Transform pipeline: raw column dicts -> model-ready arrays.

Reference: reagent/preprocessing/transforms.py and its unit tests
(reagent/test/preprocessing/test_transforms.py).
"""

import numpy as np
import pytest

from reagent_tpu.core.parameters import NormalizationData, NormalizationParameters
from reagent_tpu.preprocessing import transforms as T


def test_compose_value_presence_dense_normalization():
    norm = NormalizationData(
        dense_normalization_parameters={
            0: NormalizationParameters(feature_type="CONTINUOUS", mean=1.0, stddev=2.0),
            1: NormalizationParameters(feature_type="CONTINUOUS", mean=0.0, stddev=1.0),
        }
    )
    pipeline = T.Compose(
        T.ValuePresence(),
        T.DenseNormalization(keys=["state"], normalization_data=norm),
    )
    data = {
        "state": np.array([[3.0, 1.0], [np.nan, 2.0]], np.float32),
        "state_presence": np.array([[True, True], [True, True]]),
    }
    out = pipeline(data)
    assert "state_presence" not in out
    np.testing.assert_allclose(out["state"][0], [(3 - 1) / 2, 1.0], atol=1e-5)
    # NaN -> treated as missing -> imputed to 0 post-normalization
    np.testing.assert_allclose(out["state"][1, 0], 0.0, atol=1e-5)


def test_one_hot_actions_with_invalid_sentinel():
    t = T.OneHotActions(keys=["action"], num_actions=3)
    out = t({"action": np.array([0, 2, 3])})  # 3 == num_actions -> invalid
    np.testing.assert_array_equal(
        out["action"], [[1, 0, 0], [0, 0, 1], [0, 0, 0]]
    )


def test_column_vector_and_mask_by_presence():
    out = T.ColumnVector(keys=["reward"])({"reward": np.array([1.0, 2.0])})
    assert out["reward"].shape == (2, 1)
    out = T.MaskByPresence(keys=["x"])(
        {"x": (np.array([[1.0, 2.0]]), np.array([[1.0, 0.0]]))}
    )
    np.testing.assert_array_equal(out["x"], [[1.0, 0.0]])


def test_fixed_length_sequences_and_slate_view():
    # 2 examples, slate of 3, feature dim 2
    value = np.arange(12, dtype=np.float32).reshape(6, 2)
    presence = np.ones((6, 2), bool)
    data = {"seq": {5: (np.array([0, 3]), (value, presence))}}
    out = T.FixedLengthSequences(keys=["seq"], sequence_id=5)(data)
    v, p = out["seq"]
    out2 = T.SlateView(keys=["slate"], slate_size=3)({"slate": v})
    assert out2["slate"].shape == (2, 3, 2)


def test_fixed_length_sequences_bad_offsets_raise():
    data = {"seq": {5: (np.array([0, 4]), (np.zeros((6, 2)), np.ones((6, 2), bool)))}}
    with pytest.raises(ValueError):
        T.FixedLengthSequences(keys=["seq"], sequence_id=5, expected_length=3)(data)


def test_var_length_sequences_pads_and_tracks_presence():
    # two rows: lengths 2 and 1
    value = np.array([[1.0], [2.0], [3.0]], np.float32)
    presence = np.ones((3, 1), bool)
    data = {"seq": {7: (np.array([0, 2]), (value, presence))}}
    out = T.VarLengthSequences(keys=["seq"], sequence_id=7)(data)
    padded, _ = out["seq"]
    assert padded.shape == (4, 1)  # 2 rows * max_len 2
    np.testing.assert_array_equal(out["seq_item_presence"], [[1, 1], [1, 0]])


def test_outer_product_append_constant_cat():
    data = {"a": np.array([[1.0, 2.0]]), "b": np.array([[3.0, 4.0]])}
    out = T.OuterProduct("a", "b", "ab")(data)
    np.testing.assert_array_equal(out["ab"], [[3.0, 4.0, 6.0, 8.0]])
    out = T.AppendConstant(keys=["a"])(out)
    np.testing.assert_array_equal(out["a"], [[1.0, 1.0, 2.0]])
    out = T.Cat(["a", "b"], "cat", dim=-1)(out)
    assert out["cat"].shape == (1, 5)


def test_rename_filter_todtype_stackvarlength():
    data = {"x": np.array([1.0]), "y": np.array([2.0])}
    out = T.Rename(["x"], ["z"])(data)
    assert "z" in out and "x" not in out
    out = T.Filter(keep_keys=["z"])(out)
    assert list(out.keys()) == ["z"]
    out = T.ToDtype({"z": np.int32})(out)
    assert out["z"].dtype == np.int32
    out = T.StackVarLength(keys=["v"])(
        {"v": [np.array([1.0, 2.0]), np.array([3.0])]}
    )
    np.testing.assert_array_equal(out["v"], [[1.0, 2.0], [3.0, -1.0]])


def test_id_list_features_padded_layout():
    data = {"ids": {42: [[1, 2, 3], [4]]}}
    out = T.IDListFeatures(keys=["ids"], feature_ids=[42], max_len=4)(data)
    feat = out["ids"][42]
    np.testing.assert_array_equal(np.asarray(feat.ids), [[1, 2, 3, 0], [4, 0, 0, 0]])
    np.testing.assert_array_equal(
        np.asarray(feat.mask), [[1, 1, 1, 0], [1, 0, 0, 0]]
    )


def test_unsqueeze_repeat_and_get_eye():
    out = T.UnsqueezeRepeat(keys=["x"], dim=1, num_repeat=3)({"x": np.ones((2, 4))})
    assert out["x"].shape == (2, 3, 4)
    out = T.GetEye("eye", 5)({})
    np.testing.assert_array_equal(out["eye"], np.eye(5))


def test_var_length_sequence_dense_normalization():
    """VarLengthSequences + DenseNormalization + runtime-inferred SlateView
    (reference transforms.py:722)."""
    norm = NormalizationData(
        dense_normalization_parameters={
            0: NormalizationParameters(feature_type="CONTINUOUS", mean=1.0, stddev=2.0),
        }
    )
    value = np.array([[3.0], [5.0], [7.0]], np.float32)
    presence = np.ones((3, 1), bool)
    data = {"seq": {7: (np.array([0, 2]), (value, presence))}}
    out = T.VarLengthSequenceDenseNormalization(
        keys=["seq"], sequence_id=7, normalization_data=norm
    )(data)
    slate = out["seq:7"]
    assert slate.shape == (2, 2, 1)  # [B, max_len, D]
    np.testing.assert_allclose(slate[0, :, 0], [(3 - 1) / 2, (5 - 1) / 2], atol=1e-5)
    np.testing.assert_allclose(slate[1, 0, 0], (7 - 1) / 2, atol=1e-5)
    # padded tail: presence 0 -> imputed 0
    np.testing.assert_allclose(slate[1, 1, 0], 0.0, atol=1e-5)
    np.testing.assert_array_equal(out["seq:7_item_presence"], [[1, 1], [1, 0]])


def test_map_id_list_features():
    """MapIDListFeatures applies the SparsePreprocessor; missing keys -> None
    (reference transforms.py:347)."""
    from reagent_tpu.core import types as rlt

    fc = rlt.ModelFeatureConfig(
        id_mapping_config={
            "page": rlt.IdMappingConfig(
                embedding_table_size=100, embedding_dim=4, hashing=False, max_length=3
            )
        },
        id_list_feature_configs=[
            rlt.IdListFeatureConfig(name="page_ids", feature_id=42, id_mapping_name="page")
        ],
        id_score_list_feature_configs=[
            rlt.IdScoreListFeatureConfig(
                name="page_scores", feature_id=43, id_mapping_name="page"
            )
        ],
    )
    t = T.MapIDListFeatures(
        id_list_keys=["state_id_list"],
        id_score_list_keys=["state_id_score_list"],
        feature_config=fc,
    )
    data = {
        "state_id_list": {42: [[7, 8], [9]]},
        "state_id_score_list": {43: [[(7, 0.5)], [(9, 1.5)]]},
    }
    out = t(data)
    assert "page_ids" in out["state_id_list"]
    ids = np.asarray(out["state_id_list"]["page_ids"].ids)
    assert ids.shape == (2, 3)
    assert "page_scores" in out["state_id_score_list"]

    # missing key maps to None
    out2 = t({"state_id_list": {42: [[1]]}})
    assert out2["state_id_score_list"] is None
