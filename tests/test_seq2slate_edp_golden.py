"""Golden parity for the seq2slate EvaluationDataPage + slate OPE.

Mirrors the reference's test_seq2slate_eval_data_page
(reagent/test/evaluation/test_evaluation_data_page.py:90 and
reagent/test/evaluation/test_ope_integration.py:203-352): builds the same
3-sample slate log, runs BOTH our JAX `create_from_tensors_seq2slate` and the
reference's torch one (with its own fake nets), and asserts

  * field-level EDP parity (greedy and non-greedy), and
  * estimate parity for DM / IPS / DR / Switch / SwitchDR through the OPE
    adapters, against each other AND the closed-form expected values.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage
from reagent_tpu.evaluation.ope_adapter import OPEstimatorAdapter
from reagent_tpu.models.seq2slate import Seq2SlateMode, Seq2SlateTransformerOutput
from reagent_tpu.ope.estimators.contextual_bandits_estimators import (
    DMEstimator,
    DoublyRobustEstimator,
    IPSEstimator,
    SwitchDREstimator,
    SwitchEstimator,
)

# the shared 3-sample log (reference test_evaluation_data_page.py:95-103):
# states one-hot e0,e1,e2; logged slates all [3,2]; greedy model slates
# [2,3],[3,2],[2,3]; logged rewards 4,5,7; logged propensities .2,.5,.4;
# reward model: slate [2,3] -> 1,3,5 per state; slate [3,2] -> 2,4,6;
# model propensity of logged slate: .4,.3,.7
RANKED_IDX = np.array([[2, 3], [3, 2], [2, 3]], np.int64)
LOGGED_IDX = np.array([[3, 2], [3, 2], [3, 2]], np.int64)
LOGGED_REWARD = np.array([4.0, 5.0, 7.0])
LOGGED_PROP = np.array([0.2, 0.5, 0.4])
MODEL_PROP = np.array([0.4, 0.3, 0.7])
REWARD_FIRST = np.array([1.0, 3.0, 5.0])  # predicted reward of slate [2, 3]
REWARD_SECOND = np.array([2.0, 4.0, 6.0])  # predicted reward of slate [3, 2]


class FakeRanker:
    """Duck-typed stand-in for Seq2SlateTransformerModel: only the two modes
    the EDP factory exercises, with fixed outputs matching the reference fake."""

    def apply(self, params, mode, state, src_seq, **kwargs):
        if mode == Seq2SlateMode.RANK_MODE.value:
            assert kwargs.get("greedy")
            return Seq2SlateTransformerOutput(
                ranked_tgt_out_idx=jnp.asarray(RANKED_IDX)
            )
        assert mode == Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value
        return Seq2SlateTransformerOutput(
            per_seq_log_probs=jnp.log(jnp.asarray(MODEL_PROP)).reshape(-1, 1)
        )


class FakeRewardNet:
    """Reward table keyed on (state one-hot, slate order) — the same mapping
    as the reference FakeSeq2SlateRewardNetwork."""

    def apply(self, params, inp: rlt.PreprocessedRankingInput):
        state = np.asarray(inp.state.float_features)
        idx = np.asarray(inp.tgt_out_idx)
        out = np.where(
            (idx == np.array([2, 3])).all(axis=1),
            REWARD_FIRST[np.argmax(state, axis=1)],
            REWARD_SECOND[np.argmax(state, axis=1)],
        )
        return jnp.asarray(out).reshape(-1, 1)


def _make_batch() -> rlt.PreprocessedRankingInput:
    B, S, C = 3, 2, 2
    src_seq = np.tile(np.eye(C, dtype=np.float32), (B, 1, 1))
    tgt_out_seq = np.take_along_axis(
        src_seq, (LOGGED_IDX - 2)[:, :, None], axis=1
    ).astype(np.float32)
    return rlt.PreprocessedRankingInput(
        state=rlt.FeatureData(float_features=jnp.eye(3, dtype=jnp.float32)),
        src_seq=rlt.FeatureData(float_features=jnp.asarray(src_seq)),
        tgt_out_seq=rlt.FeatureData(float_features=jnp.asarray(tgt_out_seq)),
        src_src_mask=jnp.ones((B, S, S)),
        tgt_out_idx=jnp.asarray(LOGGED_IDX),
        tgt_out_probs=jnp.asarray(LOGGED_PROP, dtype=jnp.float32),
        slate_reward=jnp.asarray(LOGGED_REWARD, dtype=jnp.float32),
    )


def _make_edp(eval_greedy: bool) -> EvaluationDataPage:
    return EvaluationDataPage.create_from_tensors_seq2slate(
        FakeRanker(), None, FakeRewardNet(), None, _make_batch(), eval_greedy
    )


# --------------------------------------------------------------------- ours


def test_greedy_edp_fields():
    edp = _make_edp(eval_greedy=True)
    np.testing.assert_allclose(edp.model_propensities, np.ones((3, 1)))
    # only sample 1's logged slate [3,2] matches the greedy slate
    np.testing.assert_allclose(edp.action_mask, [[0.0], [1.0], [0.0]])
    np.testing.assert_allclose(edp.logged_rewards.reshape(-1), LOGGED_REWARD)
    np.testing.assert_allclose(edp.logged_propensities.reshape(-1), LOGGED_PROP)
    # model_rewards scores the greedy slates: [2,3] -> 1, [3,2] -> 4, [2,3] -> 5
    np.testing.assert_allclose(edp.model_rewards.reshape(-1), [1.0, 4.0, 5.0])
    # ...and the logged slates [3,2]: 2, 4, 6
    np.testing.assert_allclose(
        edp.model_rewards_for_logged_action.reshape(-1), [2.0, 4.0, 6.0]
    )


def test_greedy_estimates_closed_form():
    """Reference test_ope_integration.py:282-325."""
    edp = _make_edp(eval_greedy=True)
    dm = OPEstimatorAdapter(DMEstimator()).estimate(edp)
    ips = OPEstimatorAdapter(IPSEstimator()).estimate(edp)
    dr = OPEstimatorAdapter(DoublyRobustEstimator()).estimate(edp)

    avg_logged = (4 + 5 + 7) / 3
    assert dm.raw == pytest.approx((1 + 4 + 5) / 3, abs=1e-6)
    assert dm.normalized == pytest.approx(dm.raw / avg_logged, abs=1e-6)
    assert ips.raw == pytest.approx(5 / 0.5 / 3, abs=1e-6)
    assert ips.normalized == pytest.approx(ips.raw / avg_logged, abs=1e-6)
    assert dr.raw == pytest.approx(dm.raw + 1 / 0.5 * (5 - 4) / 3, abs=1e-6)
    assert dr.normalized == pytest.approx(dr.raw / avg_logged, abs=1e-6)

    # Switch degenerations (reference :293-300)
    switch = OPEstimatorAdapter(SwitchEstimator())
    switch_dr = OPEstimatorAdapter(SwitchDREstimator())
    assert switch.estimate(edp, exp_base=1).raw == pytest.approx(ips.raw, abs=1e-6)
    assert switch.estimate(edp, candidates=0).raw == pytest.approx(dm.raw, abs=1e-6)
    assert switch_dr.estimate(edp, exp_base=1).raw == pytest.approx(dr.raw, abs=1e-6)
    assert switch_dr.estimate(edp, candidates=0).raw == pytest.approx(dm.raw, abs=1e-6)


def test_nongreedy_estimates_closed_form():
    """Reference test_ope_integration.py:327-352."""
    edp = _make_edp(eval_greedy=False)
    np.testing.assert_allclose(edp.model_propensities.reshape(-1), MODEL_PROP)
    np.testing.assert_allclose(edp.action_mask, np.ones((3, 1)))
    ips = OPEstimatorAdapter(IPSEstimator()).estimate(edp)
    expected = (0.4 / 0.2 * 4 + 0.3 / 0.5 * 5 + 0.7 / 0.4 * 7) / 3
    assert ips.raw == pytest.approx(expected, abs=1e-6)
    assert ips.normalized == pytest.approx(expected / ((4 + 5 + 7) / 3), abs=1e-6)


# ----------------------------------------------------------- vs reference


def _reference_modules():
    from reagent_tpu.utils.reference_compat import add_reference_to_path

    torch = pytest.importorskip("torch")
    if not add_reference_to_path():
        pytest.skip("reference tree not available")
    import reagent.core.types as ref_rlt
    from reagent.evaluation.evaluation_data_page import EvaluationDataPage as RefEDP
    from reagent.evaluation.ope_adapter import OPEstimatorAdapter as RefAdapter
    from reagent.ope.estimators.contextual_bandits_estimators import (
        DMEstimator as RefDM,
        DoublyRobustEstimator as RefDR,
        IPSEstimator as RefIPS,
        SwitchDREstimator as RefSwitchDR,
        SwitchEstimator as RefSwitch,
    )
    from reagent.test.evaluation.test_evaluation_data_page import (
        FakeSeq2SlateRewardNetwork,
        FakeSeq2SlateTransformerNet,
    )

    return (
        torch,
        ref_rlt,
        RefEDP,
        RefAdapter,
        {
            "dm": RefDM,
            "ips": RefIPS,
            "dr": RefDR,
            "switch": RefSwitch,
            "switch_dr": RefSwitchDR,
        },
        FakeSeq2SlateRewardNetwork,
        FakeSeq2SlateTransformerNet,
    )


def _make_ref_batch(torch, ref_rlt):
    B, S, C = 3, 2, 2
    src_seq = torch.eye(C).repeat(B, 1, 1)
    tgt_out_idx = torch.tensor(LOGGED_IDX)
    tgt_out_seq = src_seq[
        torch.arange(B).repeat_interleave(S), tgt_out_idx.flatten() - 2
    ].reshape(B, S, C)
    return ref_rlt.PreprocessedRankingInput(
        state=ref_rlt.FeatureData(float_features=torch.eye(3)),
        src_seq=ref_rlt.FeatureData(float_features=src_seq),
        tgt_out_seq=ref_rlt.FeatureData(float_features=tgt_out_seq),
        src_src_mask=torch.ones(B, S, S),
        tgt_out_idx=tgt_out_idx,
        tgt_out_probs=torch.tensor(LOGGED_PROP, dtype=torch.float),
        slate_reward=torch.tensor(LOGGED_REWARD, dtype=torch.float),
    )


@pytest.mark.parametrize("eval_greedy", [True, False])
def test_edp_fields_match_reference(eval_greedy):
    torch, ref_rlt, RefEDP, _, _, FakeReward, FakeNet = _reference_modules()
    ref_edp = RefEDP.create_from_tensors_seq2slate(
        FakeNet(), FakeReward(), _make_ref_batch(torch, ref_rlt), eval_greedy
    )
    ours = _make_edp(eval_greedy)
    for field in (
        "model_propensities",
        "model_rewards",
        "action_mask",
        "logged_rewards",
        "model_rewards_for_logged_action",
        "logged_propensities",
    ):
        np.testing.assert_allclose(
            getattr(ours, field),
            np.asarray(getattr(ref_edp, field)).reshape(
                np.asarray(getattr(ours, field)).shape
            ),
            atol=1e-6,
            err_msg=field,
        )


@pytest.mark.parametrize("eval_greedy", [True, False])
def test_estimates_match_reference(eval_greedy):
    torch, ref_rlt, RefEDP, RefAdapter, ref_ests, FakeReward, FakeNet = (
        _reference_modules()
    )
    ref_edp = RefEDP.create_from_tensors_seq2slate(
        FakeNet(), FakeReward(), _make_ref_batch(torch, ref_rlt), eval_greedy
    )
    ours = _make_edp(eval_greedy)

    mine_ests = {
        "dm": DMEstimator,
        "ips": IPSEstimator,
        "dr": DoublyRobustEstimator,
        "switch": SwitchEstimator,
        "switch_dr": SwitchDREstimator,
    }
    for name, ref_cls in ref_ests.items():
        theirs = RefAdapter(ref_cls()).estimate(ref_edp)
        mine = OPEstimatorAdapter(mine_ests[name]()).estimate(ours)
        assert mine.raw == pytest.approx(theirs.raw, abs=1e-6), name
        assert mine.normalized == pytest.approx(theirs.normalized, abs=1e-6), name
