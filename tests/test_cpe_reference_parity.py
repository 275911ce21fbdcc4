"""Golden CPE parity against the reference implementation.

Runs the reference's own estimators (reagent/evaluation/
doubly_robust_estimator.py:101, sequential_doubly_robust_estimator.py:18,
weighted_sequential_doubly_robust_estimator.py:18) on a fixed synthetic
EvaluationDataPage and asserts our estimates match to ~1e-6 (BASELINE.md
north star: "CPE estimates exactly matched on fixed logged data").

The reference imports torch + (transitively) torchrec; torch is installed,
torchrec is not — a minimal stub satisfies reagent.core.types' imports.
Skips cleanly if the reference tree is unavailable.
"""

from __future__ import annotations

import numpy as np
import pytest

from reagent_tpu.evaluation.doubly_robust_estimator import (
    DoublyRobustEstimator,
    DoublyRobustHP,
)
from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage
from reagent_tpu.evaluation.sequential_doubly_robust_estimator import (
    SequentialDoublyRobustEstimator,
)
from reagent_tpu.evaluation.weighted_sequential_doubly_robust_estimator import (
    WeightedSequentialDoublyRobustEstimator,
)

def _import_reference():
    from reagent_tpu.utils.reference_compat import add_reference_to_path

    torch = pytest.importorskip("torch")
    if not add_reference_to_path():
        pytest.skip("reference tree not available")
    from reagent.evaluation.doubly_robust_estimator import (
        DoublyRobustEstimator as RefDR,
    )
    from reagent.evaluation.evaluation_data_page import (
        EvaluationDataPage as RefEDP,
    )
    from reagent.evaluation.sequential_doubly_robust_estimator import (
        SequentialDoublyRobustEstimator as RefSeqDR,
    )
    from reagent.evaluation.weighted_sequential_doubly_robust_estimator import (
        WeightedSequentialDoublyRobustEstimator as RefWDR,
    )

    return torch, RefEDP, RefDR, RefSeqDR, RefWDR


def _make_fixed_edp_arrays(seed: int = 123, n_traj: int = 24, num_actions: int = 3):
    """Deterministic synthetic logged dataset: variable-length episodes,
    softmax behavior/target policies, arbitrary model rewards/Q-values."""
    rng = np.random.default_rng(seed)
    rows = []
    for mdp in range(n_traj):
        T = int(rng.integers(4, 13))
        for t in range(T):
            rows.append((mdp, t))
    n = len(rows)
    mdp_id = np.array([r[0] for r in rows], dtype=np.int64).reshape(n, 1)
    seq_num = np.array([r[1] for r in rows], dtype=np.int64).reshape(n, 1)

    logits_b = rng.normal(size=(n, num_actions))
    logits_t = rng.normal(size=(n, num_actions))
    behavior = np.exp(logits_b) / np.exp(logits_b).sum(1, keepdims=True)
    model_propensities = (
        np.exp(logits_t) / np.exp(logits_t).sum(1, keepdims=True)
    ).astype(np.float32)

    logged_action = np.array(
        [rng.choice(num_actions, p=behavior[i]) for i in range(n)], dtype=np.int64
    )
    action_mask = np.zeros((n, num_actions), dtype=np.float32)
    action_mask[np.arange(n), logged_action] = 1.0
    logged_propensities = behavior[np.arange(n), logged_action].reshape(n, 1).astype(
        np.float32
    )
    logged_rewards = rng.uniform(0.1, 1.0, size=(n, 1)).astype(np.float32)
    model_rewards = rng.uniform(0.0, 1.0, size=(n, num_actions)).astype(np.float32)
    model_rewards_for_logged_action = model_rewards[
        np.arange(n), logged_action
    ].reshape(n, 1)
    model_values = rng.uniform(0.0, 5.0, size=(n, num_actions)).astype(np.float32)
    return dict(
        mdp_id=mdp_id,
        sequence_number=seq_num,
        logged_propensities=logged_propensities,
        logged_rewards=logged_rewards,
        action_mask=action_mask,
        model_propensities=model_propensities,
        model_rewards=model_rewards,
        model_rewards_for_logged_action=model_rewards_for_logged_action,
        model_values=model_values,
    )


def _build_edps(torch, RefEDP):
    arrays = _make_fixed_edp_arrays()
    ours = EvaluationDataPage(**{k: np.asarray(v) for k, v in arrays.items()})
    theirs = RefEDP(
        mdp_id=torch.tensor(arrays["mdp_id"]),
        sequence_number=torch.tensor(arrays["sequence_number"]),
        logged_propensities=torch.tensor(arrays["logged_propensities"]),
        logged_rewards=torch.tensor(arrays["logged_rewards"]),
        action_mask=torch.tensor(arrays["action_mask"]),
        model_propensities=torch.tensor(arrays["model_propensities"]),
        model_rewards=torch.tensor(arrays["model_rewards"]),
        model_rewards_for_logged_action=torch.tensor(
            arrays["model_rewards_for_logged_action"]
        ),
        model_values=torch.tensor(arrays["model_values"]),
    )
    return ours, theirs


def test_doubly_robust_estimator_matches_reference():
    torch, RefEDP, RefDR, _, _ = _import_reference()
    ours_edp, ref_edp = _build_edps(torch, RefEDP)

    # identical np.random streams -> identical bootstrap std errors too
    np.random.seed(7)
    ref_dm, ref_ips, ref_dr = RefDR().estimate(ref_edp)
    np.random.seed(7)
    our_dm, our_ips, our_dr = DoublyRobustEstimator().estimate(
        ours_edp, hp=DoublyRobustHP(bootstrap_sample_percent=0.25)
    )

    for ref, mine in ((ref_dm, our_dm), (ref_ips, our_ips), (ref_dr, our_dr)):
        assert mine.raw == pytest.approx(ref.raw, abs=1e-6)
        assert mine.normalized == pytest.approx(ref.normalized, abs=1e-6)
        assert mine.raw_std_error == pytest.approx(ref.raw_std_error, abs=1e-6)
        assert mine.normalized_std_error == pytest.approx(
            ref.normalized_std_error, abs=1e-6
        )


def test_sequential_doubly_robust_matches_reference():
    torch, RefEDP, _, RefSeqDR, _ = _import_reference()
    ours_edp, ref_edp = _build_edps(torch, RefEDP)
    gamma = 0.9

    np.random.seed(11)
    ref = RefSeqDR(gamma).estimate(ref_edp)
    np.random.seed(11)
    mine = SequentialDoublyRobustEstimator(gamma).estimate(ours_edp)

    assert mine.raw == pytest.approx(ref.raw, abs=1e-6)
    assert mine.normalized == pytest.approx(ref.normalized, abs=1e-6)
    assert mine.raw_std_error == pytest.approx(ref.raw_std_error, abs=1e-6)


@pytest.mark.parametrize("num_j_steps,self_norm", [(1, True), (25, True), (25, False)])
def test_weighted_sequential_dr_matches_reference(num_j_steps, self_norm):
    """j=1 is the plain weighted DR; j=25 is MAGIC
    (reference evaluator.py:126-135 uses both)."""
    torch, RefEDP, _, _, RefWDR = _import_reference()
    ours_edp, ref_edp = _build_edps(torch, RefEDP)
    gamma = 0.9

    np.random.seed(3)
    ref = RefWDR(gamma).estimate(ref_edp, num_j_steps, self_norm)
    np.random.seed(3)
    mine = WeightedSequentialDoublyRobustEstimator(gamma).estimate(
        ours_edp, num_j_steps, self_norm
    )

    assert mine.raw == pytest.approx(ref.raw, abs=1e-6)
    assert mine.normalized == pytest.approx(ref.normalized, abs=1e-6)
    assert mine.raw_std_error == pytest.approx(ref.raw_std_error, abs=1e-6)
