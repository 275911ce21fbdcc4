"""Round-2 gap-fill tests: DR HP/splits, cb utils, ope utils, logged dataset,
sparse preprocessing (hashed + id-score-list transform)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.evaluation.doubly_robust_estimator import (
    DoublyRobustEstimator,
    DoublyRobustHP,
    split_data,
)
from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage
from reagent_tpu.ope.datasets import ArrayBanditsDataset
from reagent_tpu.ope.utils import Clamper, LRUCache, RunningAverage, convert_to_one_hots
from reagent_tpu.preprocessing.sparse_preprocessor import (
    HashingMapIDList,
    HashingMapIDScoreList,
    hash_ids,
)
from reagent_tpu.training.cb.utils import (
    add_chosen_arm_features,
    argmax_random_tie_breaks,
    get_model_actions,
)


def _make_edp(n=40, a=3, seed=0):
    rng = np.random.default_rng(seed)
    mp = rng.dirichlet(np.ones(a), n).astype(np.float32)
    am = np.eye(a, dtype=np.float32)[rng.integers(0, a, n)]
    return EvaluationDataPage(
        mdp_id=np.arange(n),
        sequence_number=np.zeros(n, np.int64),
        model_propensities=mp,
        action_mask=am,
        logged_rewards=rng.random((n, 1)).astype(np.float32),
        model_rewards=rng.random((n, a)).astype(np.float32),
        model_rewards_for_logged_action=rng.random((n, 1)).astype(np.float32),
        logged_propensities=np.full((n, 1), 1.0 / a, np.float32),
    )


class TestDoublyRobustHP:
    def test_estimate_with_hp(self):
        edp = _make_edp()
        hp = DoublyRobustHP(bootstrap_num_samples=25, bootstrap_sample_percent=0.5)
        dm, ips, dr = DoublyRobustEstimator().estimate(edp, hp=hp)
        for est in (dm, ips, dr):
            assert np.isfinite(est.raw) and np.isfinite(est.normalized)
        # DR = IPS correction + DM; with perfect model rewards DR == DM exactly
        edp2 = dataclasses.replace(
            edp,
            logged_rewards=edp.model_rewards_for_logged_action,
        )
        dm2, _, dr2 = DoublyRobustEstimator(bootstrap_num_samples=10).estimate(edp2)
        assert dr2.raw == pytest.approx(dm2.raw, rel=1e-5)

    def test_split_data_partitions(self):
        edp = _make_edp(n=50)
        tved = split_data(edp, frac_train=0.4, frac_valid=0.1, seed=3)
        assert tved.num_examples_dict == {"train": 20, "valid": 5, "eval": 25}
        # splits are disjoint and cover all rows
        all_r = np.concatenate(
            [tved.logged_rewards_dict[k] for k in ("train", "valid", "eval")]
        )
        assert sorted(all_r.reshape(-1).tolist()) == sorted(
            edp.logged_rewards.reshape(-1).tolist()
        )
        # actions_logged is argmax of the mask
        for k in ("train", "valid", "eval"):
            assert tved.actions_logged_dict[k].shape[1] == 1


class TestCBUtils:
    def test_add_chosen_arm_features_joint(self):
        feats = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
        batch = rlt.CBInput(
            context_arm_features=feats,
            action=jnp.array([[2], [0]]),
            arms=jnp.array([[10, 11, 12], [20, 21, 22]]),
        )
        out = add_chosen_arm_features(batch)
        np.testing.assert_allclose(out.features_of_chosen_arm[0], feats[0, 2])
        np.testing.assert_allclose(out.features_of_chosen_arm[1], feats[1, 0])
        np.testing.assert_array_equal(np.asarray(out.chosen_arm_id).reshape(-1), [12, 20])

    def test_add_chosen_arm_features_disjoint(self):
        b = rlt.CBInput(context_arm_features=jnp.ones((4, 5)))
        out = add_chosen_arm_features([b, b])
        assert len(out) == 2
        np.testing.assert_allclose(out[0].features_of_chosen_arm, np.ones((4, 5)))

    def test_get_model_actions_masked(self):
        scores = jnp.array([[1.0, 5.0, 3.0], [9.0, 0.0, 2.0]])
        mask = jnp.array([[1, 0, 1], [0, 1, 1]])
        acts = get_model_actions(scores, mask)
        np.testing.assert_array_equal(np.asarray(acts).reshape(-1), [2, 2])
        acts = get_model_actions(scores)
        np.testing.assert_array_equal(np.asarray(acts).reshape(-1), [1, 0])

    def test_argmax_tie_breaks_consistent_and_valid(self):
        scores = jnp.zeros((6, 4))  # all tied
        idx = argmax_random_tie_breaks(scores, rng=jax.random.PRNGKey(7))
        idx = np.asarray(idx)
        assert (idx == idx[0]).all()  # same tie resolution on every row
        assert ((idx >= 0) & (idx < 4)).all()
        # respects mask: column 0 masked out everywhere
        mask = jnp.array([[0, 1, 1, 1]] * 6)
        idx2 = np.asarray(argmax_random_tie_breaks(scores, mask, jax.random.PRNGKey(1)))
        assert (idx2 != 0).all()


class TestOpeUtils:
    def test_running_average(self):
        ra = RunningAverage()
        ra.add(1).add(float("nan")).add(3).add(float("inf")).add(5)
        assert ra.average == pytest.approx(3.0)
        assert ra.count == 3
        assert ra.total == pytest.approx(9.0)

    def test_clamper_and_onehots(self):
        c = Clamper(0.0, 1.0)
        assert c(2.5) == 1.0
        np.testing.assert_allclose(c(np.array([-1.0, 0.5, 2.0])), [0.0, 0.5, 1.0])
        assert c([-1.0, 0.5]) == [0.0, 0.5]
        with pytest.raises(ValueError):
            Clamper(1.0, 0.0)
        oh = convert_to_one_hots([1, 0, 2], 3)
        np.testing.assert_array_equal(oh, [[0, 1, 0], [1, 0, 0], [0, 0, 1]])

    def test_lru_cache(self):
        c = LRUCache(maxsize=2)
        c["a"], c["b"] = 1, 2
        _ = c["a"]  # refresh a
        c["c"] = 3  # evicts b
        assert "b" not in c and "a" in c and "c" in c


class TestBanditsDataset:
    def test_array_dataset(self):
        ds = ArrayBanditsDataset(
            np.random.rand(10, 4), np.random.randint(0, 3, 10), np.random.rand(10)
        )
        assert len(ds) == 10 and ds.num_features == 4
        s = ds[2]
        assert s.features.shape == (4,)
        tr, ev = ds.train_eval_split(0.7, seed=0)
        assert len(tr) == 7 and len(ev) == 3


class TestSparseHashing:
    def test_hash_ids_range_and_determinism(self):
        ids = np.array([1, 2, 3, 2**40, -5])
        h1 = hash_ids(ids, table_size=100)
        h2 = hash_ids(ids, table_size=100)
        np.testing.assert_array_equal(h1, h2)
        assert ((h1 >= 0) & (h1 < 100)).all()
        # different salt -> different mapping (with overwhelming probability)
        h3 = hash_ids(np.arange(1000), 1000, salt=1)
        h4 = hash_ids(np.arange(1000), 1000, salt=2)
        assert (h3 != h4).any()

    def test_hashing_mappers(self):
        m = HashingMapIDList(embedding_table_size=16)
        out = m(np.array([5, 6, 7]))
        assert out.dtype == np.int64 and ((out >= 0) & (out < 16)).all()
        ms = HashingMapIDScoreList(embedding_table_size=16)
        ids, scores = ms(np.array([5, 6]), np.array([0.5, 0.25]))
        assert ((ids >= 0) & (ids < 16)).all()
        np.testing.assert_allclose(scores, [0.5, 0.25])


class TestIDScoreListTransform:
    def test_transform_pads_and_masks(self):
        from reagent_tpu.preprocessing.transforms import IDScoreListFeatures

        t = IDScoreListFeatures(keys=["state"], feature_ids=[42], max_len=4)
        data = {"state": {42: [[(7, 0.5), (8, 1.5)], {9: 2.5}]}}
        out = t(data)
        feat = out["state"][42]
        np.testing.assert_array_equal(np.asarray(feat.ids)[0, :2], [7, 8])
        np.testing.assert_allclose(np.asarray(feat.scores)[0, :2], [0.5, 1.5])
        np.testing.assert_allclose(np.asarray(feat.mask)[0], [1, 1, 0, 0])
        np.testing.assert_array_equal(np.asarray(feat.ids)[1, 0], 9)
        np.testing.assert_allclose(np.asarray(feat.scores)[1, 0], 2.5)
