"""Slate reward nets, TF/simulation trainers, sparse models, conv net."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import ConvNetParameters
from reagent_tpu.models.convolutional_network import ConvolutionalNetwork
from reagent_tpu.models.embedding_bag import (
    EmbeddingBag,
    SparseDQN,
    SparsePreprocessor,
    hash_ids,
)
from reagent_tpu.models.seq2slate import Seq2SlateOutputArch, Seq2SlateTransformerModel
from reagent_tpu.models.seq2slate_reward import (
    Seq2SlateGRURewardNet,
    Seq2SlateTransformerRewardNet,
)
from reagent_tpu.training.ranking.seq2slate_tf_trainer import (
    Seq2SlateSimulationTrainer,
    Seq2SlateTeacherForcingTrainer,
)

B, S, T, SD, CD = 4, 6, 4, 5, 7


def _ranking_batch(seed=0):
    rng = jax.random.PRNGKey(seed)
    state = jax.random.normal(rng, (B, SD))
    src = jax.random.normal(jax.random.fold_in(rng, 1), (B, S, CD))
    tgt_out = jnp.tile(jnp.arange(2, T + 2)[None], (B, 1))
    tgt_in = jnp.concatenate([jnp.ones((B, 1), jnp.int32), tgt_out[:, :-1]], axis=1)
    cand = jnp.concatenate([jnp.zeros((B, 2, CD)), src], axis=1)
    return rlt.PreprocessedRankingInput(
        state=rlt.FeatureData(float_features=state),
        src_seq=rlt.FeatureData(float_features=src),
        tgt_in_seq=rlt.FeatureData(
            float_features=jnp.take_along_axis(cand, tgt_in[:, :, None], axis=1)
        ),
        tgt_out_seq=rlt.FeatureData(
            float_features=jnp.take_along_axis(cand, tgt_out[:, :, None], axis=1)
        ),
        tgt_in_idx=tgt_in,
        tgt_out_idx=tgt_out,
        optim_tgt_in_idx=tgt_in,
        optim_tgt_out_idx=tgt_out,
        optim_tgt_in_seq=rlt.FeatureData(
            float_features=jnp.take_along_axis(cand, tgt_in[:, :, None], axis=1)
        ),
        tgt_out_probs=jnp.full((B, 1), 0.1),
        slate_reward=jnp.ones((B, 1)),
    )


def _model():
    return Seq2SlateTransformerModel(
        state_dim=SD, candidate_dim=CD, num_stacked_layers=2, num_heads=2,
        dim_model=16, dim_feedforward=32, max_src_seq_len=S, max_tgt_seq_len=T,
        output_arch=Seq2SlateOutputArch.AUTOREGRESSIVE,
    )


@pytest.mark.parametrize("net_cls", [Seq2SlateGRURewardNet, Seq2SlateTransformerRewardNet])
def test_slate_reward_nets(net_cls):
    net = net_cls(state_dim=SD, candidate_dim=CD)
    batch = _ranking_batch()
    params = net.init(jax.random.PRNGKey(0), batch)
    out = net.apply(params, batch)
    assert out.shape == (B, 1)


def test_teacher_forcing_trainer_learns_target_ordering():
    m = _model()
    batch = _ranking_batch()
    trainer = Seq2SlateTeacherForcingTrainer(m, policy_optimizer={"Adam": {"lr": 1e-3}})
    state = trainer.init(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(40):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["kl_loss"]))
    assert losses[-1] < losses[0]


def test_simulation_trainer_runs():
    m = _model()
    reward_net = Seq2SlateTransformerRewardNet(state_dim=SD, candidate_dim=CD)
    batch = _ranking_batch()
    reward_params = reward_net.init(jax.random.PRNGKey(1), batch)
    trainer = Seq2SlateSimulationTrainer(
        m, reward_net, reward_params, policy_optimizer={"Adam": {"lr": 1e-3}}
    )
    state = trainer.init(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["obj_loss"]))


def test_hash_ids_in_range_and_deterministic():
    ids = jnp.asarray([[1, 999999, 42], [7, 7, 0]])
    h1 = hash_ids(ids, 100)
    h2 = hash_ids(ids, 100)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    assert np.asarray(h1).max() < 100 and np.asarray(h1).min() >= 0
    # equal raw ids hash equally
    assert int(h1[1, 0]) == int(h1[1, 1])


def test_sparse_dqn_forward():
    cfgs = (("page", 100, 8), ("topic", 50, 4))
    net = SparseDQN(
        state_dense_dim=3, action_dim=2, configs=cfgs, overarch_dims=[16]
    )
    state = rlt.FeatureData(
        float_features=jnp.ones((2, 3)),
        id_list_features={
            "page": rlt.IdListFeature(
                ids=jnp.array([[1, 2, 0], [3, 0, 0]]),
                mask=jnp.array([[True, True, False], [True, False, False]]),
            ),
            "topic": rlt.IdListFeature(
                ids=jnp.array([[5, 0], [9, 9]]),
                mask=jnp.array([[True, False], [True, True]]),
            ),
        },
    )
    params = net.init(jax.random.PRNGKey(0), state)
    q = net.apply(params, state)
    assert q.shape == (2, 2)
    # empty bag (all-masked) contributes zeros, not NaN
    state2 = state.replace(
        id_list_features={
            **state.id_list_features,
            "page": rlt.IdListFeature(
                ids=jnp.zeros((2, 3), jnp.int32), mask=jnp.zeros((2, 3), bool)
            ),
        }
    )
    q2 = net.apply(params, state2)
    assert np.all(np.isfinite(np.asarray(q2)))


def test_sparse_preprocessor():
    fc = rlt.ModelFeatureConfig(
        id_list_feature_configs=[rlt.IdListFeatureConfig("page", 1, "m")],
        id_mapping_config={"m": rlt.IdMappingConfig(embedding_table_size=10, embedding_dim=4, max_length=3)},
    )
    pre = SparsePreprocessor(fc)
    out = pre.preprocess_id_list({"page": [[4, 5, 6, 7], [8]]})
    assert out["page"].ids.shape == (2, 3)  # truncated to max_length
    np.testing.assert_array_equal(np.asarray(out["page"].lengths), [3, 1])


def test_convolutional_network():
    p = ConvNetParameters(
        conv_dims=(8,), conv_height_kernels=(3,), pool_types=("max",),
        pool_kernel_sizes=(2,),
    )
    net = ConvolutionalNetwork(
        conv_params=p, input_height=8, input_width=8, input_channels=1,
        sizes=[16], activations=["relu"], output_dim=4,
    )
    x = jnp.ones((2, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(params, x).shape == (2, 4)


def test_seq2slate_pairwise_attn_trainer_learns_relevance():
    """Encoder-only KL training: scores concentrate on rewarded positions.

    Reference: training/ranking/seq2slate_attn_trainer.py:26-75.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reagent_tpu.core import types as rlt
    from reagent_tpu.models.seq2slate import (
        Seq2SlateMode,
        Seq2SlateOutputArch,
        Seq2SlateTransformerModel,
    )
    from reagent_tpu.training.ranking.seq2slate_attn_trainer import (
        Seq2SlatePairwiseAttnTrainer,
    )

    B, S, CD, SD = 16, 5, 4, 3
    m = Seq2SlateTransformerModel(
        state_dim=SD, candidate_dim=CD, num_stacked_layers=1, num_heads=2,
        dim_model=16, dim_feedforward=16, max_src_seq_len=S, max_tgt_seq_len=S,
        output_arch=Seq2SlateOutputArch.ENCODER_SCORE,
    )
    rng = jax.random.PRNGKey(0)
    state = jnp.zeros((B, SD))
    src = jax.random.normal(rng, (B, S, CD))
    # reward depends on candidate feature 0: positions whose candidate has
    # feature0 > 0 got a click
    tgt_out = jnp.tile(jnp.arange(2, S + 2)[None], (B, 1))
    position_reward = (src[..., 0] > 0).astype(jnp.float32)
    # KL target: normalized click distribution (rows with no clicks get uniform)
    denom = jnp.maximum(position_reward.sum(1, keepdims=True), 1.0)
    target = jnp.where(
        position_reward.sum(1, keepdims=True) > 0,
        position_reward / denom,
        jnp.full((B, S), 1.0 / S),
    )
    batch = rlt.PreprocessedRankingInput(
        state=rlt.FeatureData(float_features=state),
        src_seq=rlt.FeatureData(float_features=src),
        tgt_out_idx=tgt_out,
        position_reward=target,
    )
    trainer = Seq2SlatePairwiseAttnTrainer(
        m, slate_size=S, calc_cpe=True, policy_optimizer={"Adam": {"lr": 3e-3}}
    )
    ts = trainer.init(jax.random.PRNGKey(1), batch)
    first = last = None
    for _ in range(120):
        ts, metrics = trainer.train_step(ts, batch)
        if first is None:
            first = float(metrics["train_cross_entropy_loss"])
        last = float(metrics["train_cross_entropy_loss"])
    assert last < first - 0.05, (first, last)

    # trained encoder scores rank clicked candidates above unclicked
    out = m.apply(
        ts.params, Seq2SlateMode.ENCODER_SCORE_MODE.value, state, src,
        tgt_out_idx=tgt_out,
    )
    scores = np.asarray(out.encoder_scores)
    pr = np.asarray(position_reward)
    mask = (pr.sum(1) > 0) & (pr.sum(1) < S)
    clicked_mean = scores[mask][pr[mask] > 0].mean()
    unclicked_mean = scores[mask][pr[mask] == 0].mean()
    assert clicked_mean > unclicked_mean

    metrics = trainer.validation_metrics(ts, batch.replace(position_reward=position_reward), jax.random.PRNGKey(2))
    assert metrics["eval_ndcg"] > metrics["eval_base_ndcg"] * 0.9
    assert np.isfinite(metrics["eval_auc"])
    assert np.isfinite(metrics["eval_cross_entropy_loss"])


def test_seq2slate_transformer_net_wrapper_modes():
    """Net wrapper dispatches typed batches by mode (ref seq2slate.py:847,936)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reagent_tpu.core import types as rlt
    from reagent_tpu.models.seq2slate import (
        Seq2SlateMode,
        Seq2SlateOutputArch,
        Seq2SlateTransformerNet,
    )

    B, S, CD, SD = 4, 5, 4, 3
    net = Seq2SlateTransformerNet(
        state_dim=SD, candidate_dim=CD, num_stacked_layers=1, num_heads=2,
        dim_model=16, dim_feedforward=16, max_src_seq_len=S, max_tgt_seq_len=S,
        output_arch=Seq2SlateOutputArch.AUTOREGRESSIVE,
    )
    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (B, S, CD))
    tgt_out = jnp.tile(jnp.arange(2, S + 2)[None], (B, 1))
    tgt_in = jnp.concatenate([jnp.ones((B, 1), jnp.int32), tgt_out[:, :-1]], axis=1)
    cand = jnp.concatenate([jnp.zeros((B, 2, CD)), src], axis=1)
    batch = rlt.PreprocessedRankingInput(
        state=rlt.FeatureData(float_features=jnp.zeros((B, SD))),
        src_seq=rlt.FeatureData(float_features=src),
        tgt_in_seq=rlt.FeatureData(
            float_features=jnp.take_along_axis(cand, tgt_in[:, :, None], axis=1)
        ),
        tgt_in_idx=tgt_in,
        tgt_out_idx=tgt_out,
    )
    params = net.init(rng, batch)
    ranked = net(params, batch, Seq2SlateMode.RANK_MODE, greedy=True, rng=rng)
    assert ranked.ranked_tgt_out_idx.shape == (B, S)
    # ranked indices are a permutation of candidates 2..S+1
    assert np.array_equal(
        np.sort(np.asarray(ranked.ranked_tgt_out_idx), axis=1),
        np.tile(np.arange(2, S + 2), (B, 1)),
    )
    lp = net(params, batch, Seq2SlateMode.PER_SEQ_LOG_PROB_MODE)
    assert lp.per_seq_log_probs.shape == (B, 1) or lp.per_seq_log_probs.shape == (B,)
