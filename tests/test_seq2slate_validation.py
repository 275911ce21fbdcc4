"""Seq2slate validation/CPE path: trainer.validation_step -> EDP pair ->
slate OPE, mirroring the reference's Seq2SlateTrainer.validation_step /
validation_epoch_end (reagent/training/ranking/seq2slate_trainer.py:196-279)
and the tf variant (seq2slate_tf_trainer.py:100-137)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import Seq2SlateParameters
from reagent_tpu.evaluation.ope_adapter import OPEstimatorAdapter
from reagent_tpu.models.seq2slate import (
    Seq2SlateMode,
    Seq2SlateOutputArch,
    Seq2SlateTransformerModel,
)
from reagent_tpu.models.seq2slate_reward import Seq2SlateTransformerRewardNet
from reagent_tpu.models.value import ValueNetwork
from reagent_tpu.ope.estimators.contextual_bandits_estimators import (
    DMEstimator,
    DoublyRobustEstimator,
    IPSEstimator,
)
from reagent_tpu.reporting.reporters import Seq2SlateReporter
from reagent_tpu.training.ranking import Seq2SlateTrainer
from reagent_tpu.training.ranking.seq2slate_tf_trainer import (
    Seq2SlateTeacherForcingTrainer,
)
from reagent_tpu.training.ranking.seq2slate_trainer import accumulate_edp_pairs

B, S, T, CD, SD = 6, 4, 4, 3, 5


def _model():
    return Seq2SlateTransformerModel(
        state_dim=SD, candidate_dim=CD, num_stacked_layers=1, num_heads=2,
        dim_model=16, dim_feedforward=16, max_src_seq_len=S, max_tgt_seq_len=T,
        output_arch=Seq2SlateOutputArch.AUTOREGRESSIVE,
    )


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    state = jnp.asarray(rng.normal(size=(B, SD)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(B, S, CD)).astype(np.float32))
    perm = np.stack([rng.permutation(S)[:T] for _ in range(B)]) + 2
    tgt_out = jnp.asarray(perm.astype(np.int32))
    tgt_in = jnp.concatenate([jnp.ones((B, 1), jnp.int32), tgt_out[:, :-1]], axis=1)
    cand = jnp.concatenate([jnp.zeros((B, 2, CD)), src], axis=1)
    gather = lambda idx: jnp.take_along_axis(cand, idx[:, :, None], axis=1)
    return rlt.PreprocessedRankingInput(
        state=rlt.FeatureData(float_features=state),
        src_seq=rlt.FeatureData(float_features=src),
        tgt_in_seq=rlt.FeatureData(float_features=gather(tgt_in)),
        tgt_out_seq=rlt.FeatureData(float_features=gather(tgt_out)),
        tgt_in_idx=tgt_in,
        tgt_out_idx=tgt_out,
        tgt_out_probs=jnp.full((B, 1), 0.2, jnp.float32),
        slate_reward=jnp.asarray(rng.uniform(1, 4, (B, 1)).astype(np.float32)),
        extras=rlt.ExtraData(
            mdp_id=jnp.arange(B), sequence_number=jnp.zeros(B, jnp.int32)
        ),
    )


def _reward_net(batch):
    net = Seq2SlateTransformerRewardNet(state_dim=SD, candidate_dim=CD)
    return net, net.init(jax.random.PRNGKey(7), batch)


def test_validation_step_with_cpe():
    batch = _batch()
    rnet, rparams = _reward_net(batch)
    trainer = Seq2SlateTrainer(
        _model(),
        params=Seq2SlateParameters(on_policy=False),
        baseline_net=ValueNetwork(state_dim=SD, sizes=[8], activations=["relu"]),
        policy_optimizer={"Adam": {"lr": 1e-3}},
        baseline_optimizer={"Adam": {"lr": 1e-3}},
        calc_cpe=True,
        reward_network=rnet,
        reward_params=rparams,
    )
    ts = trainer.init(jax.random.PRNGKey(0), batch)
    ts, _ = trainer.train_step(ts, batch)

    pairs, reporter = [], Seq2SlateReporter()
    for seed in (1, 2):
        metrics, edp_g, edp_ng = trainer.validation_step(ts, _batch(seed))
        reporter.log(**metrics)
        pairs.append((edp_g, edp_ng))

    # the reference logs these four from validation_step (:231-236)
    assert metrics["eval_advantages"].shape == (B,)
    assert metrics["logged_slate_rank_probs"].shape == (B,)
    assert metrics["ranked_slate_rank_probs"].shape == (B,)
    assert float(metrics["eval_baseline_loss"]) >= 0.0
    assert len(reporter.values_of("eval_advantages")) == 2

    edp_g, edp_ng = accumulate_edp_pairs(pairs)
    assert edp_g.logged_rewards.shape == (2 * B, 1)
    edp_g.validate()
    edp_ng.validate()
    # greedy page: propensity 1 / indicator mask; non-greedy: true propensities
    np.testing.assert_allclose(edp_g.model_propensities, 1.0)
    assert set(np.unique(edp_g.action_mask)) <= {0.0, 1.0}
    np.testing.assert_allclose(edp_ng.action_mask, 1.0)
    assert (edp_ng.model_propensities > 0).all()
    assert (edp_ng.model_propensities < 1).all()

    # slate OPE over both pages (reference test_ope_integration.py:275-352)
    for edp in (edp_g, edp_ng):
        for est in (DMEstimator(), IPSEstimator(), DoublyRobustEstimator()):
            cpe = OPEstimatorAdapter(est).estimate(edp)
            assert np.isfinite(cpe.raw) and np.isfinite(cpe.normalized)


def test_validation_step_without_cpe():
    batch = _batch()
    trainer = Seq2SlateTrainer(_model(), policy_optimizer={"Adam": {"lr": 1e-3}})
    ts = trainer.init(jax.random.PRNGKey(0), batch)
    metrics, edp_g, edp_ng = trainer.validation_step(ts, batch)
    assert edp_g is None and edp_ng is None
    # no baseline net -> advantage is the raw slate reward
    np.testing.assert_allclose(
        metrics["eval_advantages"], np.asarray(batch.slate_reward).reshape(-1)
    )


def test_tf_trainer_validation_step():
    batch = _batch()
    rnet, rparams = _reward_net(batch)
    trainer = Seq2SlateTeacherForcingTrainer(
        _model(),
        policy_optimizer={"Adam": {"lr": 1e-3}},
        calc_cpe=True,
        reward_network=rnet,
        reward_params=rparams,
    )
    ts = trainer.init(jax.random.PRNGKey(0), batch)
    metrics, edp_g, edp_ng = trainer.validation_step(ts, batch)
    assert metrics["logged_slate_rank_probs"].shape == (B,)
    edp_g.validate()
    edp_ng.validate()
    ips = OPEstimatorAdapter(IPSEstimator()).estimate(edp_ng)
    assert np.isfinite(ips.raw)


def test_accumulate_edp_pairs_empty():
    assert accumulate_edp_pairs([(None, None)]) == (None, None)


def test_sim_trainer_validation_step():
    """The simulation trainer's reward model doubles as the CPE reward net
    (reference seq2slate_sim_trainer.py:62 inherits validation_step)."""
    from reagent_tpu.training.ranking.seq2slate_tf_trainer import (
        Seq2SlateSimulationTrainer,
    )

    batch = _batch()
    rnet, rparams = _reward_net(batch)
    trainer = Seq2SlateSimulationTrainer(
        _model(), reward_net=rnet, reward_params=rparams,
        policy_optimizer={"Adam": {"lr": 1e-3}},
    )
    ts = trainer.init(jax.random.PRNGKey(0), batch)
    ts, _ = trainer.train_step(ts, batch, jax.random.PRNGKey(1))
    metrics, edp_g, edp_ng = trainer.validation_step(ts, batch)
    assert metrics["logged_slate_rank_probs"].shape == (B,)
    edp_g.validate()
    edp_ng.validate()
    ips = OPEstimatorAdapter(IPSEstimator()).estimate(edp_ng)
    assert np.isfinite(ips.raw)
