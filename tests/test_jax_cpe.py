"""Parity of the TPU-native (jitted, padded) sequential CPE estimators
against the numpy oracles in this package — which are themselves
golden-tested against the reference in tests/test_cpe_reference_parity.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage
from reagent_tpu.evaluation.jax_sequential_estimators import (
    JaxSequentialDoublyRobustEstimator,
    JaxWeightedSequentialDoublyRobustEstimator,
    pad_edp_trajectories,
)
from reagent_tpu.evaluation.sequential_doubly_robust_estimator import (
    SequentialDoublyRobustEstimator,
)
from reagent_tpu.evaluation.weighted_sequential_doubly_robust_estimator import (
    WeightedSequentialDoublyRobustEstimator,
)


def make_edp(seed: int = 5, n_traj: int = 30, num_actions: int = 4):
    rng = np.random.default_rng(seed)
    rows = []
    for mdp in range(n_traj):
        T = int(rng.integers(3, 15))
        rows.extend((mdp, t) for t in range(T))
    n = len(rows)
    mdp_id = np.array([r[0] for r in rows], np.int64).reshape(n, 1)
    seq = np.array([r[1] for r in rows], np.int64).reshape(n, 1)
    logits_b = rng.normal(size=(n, num_actions))
    logits_t = rng.normal(size=(n, num_actions))
    behavior = np.exp(logits_b) / np.exp(logits_b).sum(1, keepdims=True)
    target = (np.exp(logits_t) / np.exp(logits_t).sum(1, keepdims=True)).astype(
        np.float32
    )
    logged = np.array([rng.choice(num_actions, p=behavior[i]) for i in range(n)])
    mask = np.zeros((n, num_actions), np.float32)
    mask[np.arange(n), logged] = 1.0
    return EvaluationDataPage(
        mdp_id=mdp_id,
        sequence_number=seq,
        logged_propensities=behavior[np.arange(n), logged]
        .reshape(n, 1)
        .astype(np.float32),
        logged_rewards=rng.uniform(0.0, 1.0, (n, 1)).astype(np.float32),
        action_mask=mask,
        model_propensities=target,
        model_rewards=rng.uniform(0.0, 1.0, (n, num_actions)).astype(np.float32),
        model_rewards_for_logged_action=rng.uniform(0.0, 1.0, (n, 1)).astype(
            np.float32
        ),
        model_values=rng.uniform(0.0, 4.0, (n, num_actions)).astype(np.float32),
    )


def test_padding_matches_oracle_transform():
    edp = make_edp()
    padded = pad_edp_trajectories(edp)
    a, r, lp, tp, q = WeightedSequentialDoublyRobustEstimator.transform_to_equal_length_trajectories(
        edp.mdp_id,
        edp.action_mask,
        edp.logged_rewards.reshape(-1),
        edp.logged_propensities.reshape(-1),
        edp.model_propensities,
        edp.model_values,
    )
    np.testing.assert_allclose(np.asarray(padded.actions), a, atol=1e-7)
    np.testing.assert_allclose(np.asarray(padded.rewards), r, atol=1e-7)
    np.testing.assert_allclose(np.asarray(padded.logged_propensities), lp, atol=1e-7)
    np.testing.assert_allclose(np.asarray(padded.target_propensities), tp, atol=1e-7)
    np.testing.assert_allclose(np.asarray(padded.q_values), q, atol=1e-7)


def test_jax_seq_dr_matches_numpy_oracle():
    edp = make_edp()
    gamma = 0.95
    np.random.seed(2)
    ref = SequentialDoublyRobustEstimator(gamma).estimate(edp)
    np.random.seed(2)
    mine = JaxSequentialDoublyRobustEstimator(gamma).estimate(edp)
    assert mine.raw == pytest.approx(ref.raw, rel=2e-4, abs=2e-4)
    assert mine.normalized == pytest.approx(ref.normalized, rel=2e-4, abs=2e-4)
    assert mine.raw_std_error == pytest.approx(ref.raw_std_error, rel=2e-2, abs=2e-3)


@pytest.mark.parametrize("num_j_steps,self_norm", [(1, True), (25, True), (25, False)])
def test_jax_wdr_matches_numpy_oracle(num_j_steps, self_norm):
    edp = make_edp()
    gamma = 0.9
    np.random.seed(4)
    ref = WeightedSequentialDoublyRobustEstimator(gamma).estimate(
        edp, num_j_steps, self_norm
    )
    np.random.seed(4)
    mine = JaxWeightedSequentialDoublyRobustEstimator(gamma).estimate(
        edp, num_j_steps, self_norm
    )
    # device compute is float32; the numpy oracle runs float64
    assert mine.raw == pytest.approx(ref.raw, rel=5e-4, abs=5e-4)
    assert mine.normalized == pytest.approx(ref.normalized, rel=5e-4, abs=5e-4)
    assert mine.raw_std_error == pytest.approx(
        ref.raw_std_error, rel=5e-2, abs=5e-3
    )


@pytest.mark.slow
def test_jax_wdr_scales_to_large_edp():
    """MAGIC on 10k trajectories x 200 steps runs on-device (VERDICT item 5)."""
    import time

    rng = np.random.default_rng(0)
    n_traj, T, A = 10_000, 200, 2
    n = n_traj * T
    mdp_id = np.repeat(np.arange(n_traj), T).reshape(n, 1)
    seq = np.tile(np.arange(T), n_traj).reshape(n, 1)
    target = rng.dirichlet(np.ones(A), size=n).astype(np.float32)
    logged_action = rng.integers(0, A, n)
    mask = np.zeros((n, A), np.float32)
    mask[np.arange(n), logged_action] = 1.0
    edp = EvaluationDataPage(
        mdp_id=mdp_id,
        sequence_number=seq,
        logged_propensities=np.full((n, 1), 0.5, np.float32),
        logged_rewards=rng.uniform(0, 1, (n, 1)).astype(np.float32),
        action_mask=mask,
        model_propensities=target,
        model_rewards=rng.uniform(0, 1, (n, A)).astype(np.float32),
        model_rewards_for_logged_action=rng.uniform(0, 1, (n, 1)).astype(np.float32),
        model_values=rng.uniform(0, 5, (n, A)).astype(np.float32),
    )
    est = JaxWeightedSequentialDoublyRobustEstimator(0.99)
    t0 = time.time()
    np.random.seed(1)
    out = est.estimate(edp, num_j_steps=25, whether_self_normalize_importance_weights=True)
    elapsed = time.time() - t0
    assert np.isfinite(out.raw)
    # generous wall-clock bar: the per-trajectory numpy path is minutes here
    assert elapsed < 120, f"large-EDP MAGIC took {elapsed:.1f}s"


def test_jax_wdr_single_trajectory_edp():
    """Regression: a 1-trajectory EDP must not divide by zero building the
    confidence-bound subsets (reference skips subsets for single j-step)."""
    from reagent_tpu.evaluation.jax_sequential_estimators import (
        JaxWeightedSequentialDoublyRobustEstimator,
    )

    edp = make_edp(n_traj=1, seed=5)
    est = JaxWeightedSequentialDoublyRobustEstimator(gamma=0.9)
    for j in (1, 25):
        cpe = est.estimate(edp, num_j_steps=j,
                           whether_self_normalize_importance_weights=True)
        assert np.isfinite(cpe.raw)
