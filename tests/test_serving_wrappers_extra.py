"""World-model / ranking serving-wrapper tests.

Reference parity targets: prediction/predictor_wrapper.py
Seq2RewardWithPreprocessor:643, Seq2RewardPlanShortSeqWithPreprocessor:687,
CompressModelWithPreprocessor:869, MDNRNNWithPreprocessor:828,
BinaryDifferenceScorer*:176/216, LearnVMSlateWithPreprocessor:452,
Seq2SlateWithPreprocessor:548, Seq2SlatePredictorWrapper:616,
Seq2SlateRewardWithPreprocessor:740, RankingActorWithPreprocessor:376.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core.parameters import NormalizationParameters
from reagent_tpu.models.dqn import FullyConnectedDQN
from reagent_tpu.models.mdn_rnn import MemoryNetwork
from reagent_tpu.models.mlp_scorer import MLPScorer
from reagent_tpu.models.seq2reward_model import Seq2RewardNetwork
from reagent_tpu.models.seq2slate import Seq2SlateOutputArch, Seq2SlateTransformerNet
from reagent_tpu.models.seq2slate_reward import Seq2SlateTransformerRewardNet
from reagent_tpu.prediction.ranking.predictor_wrapper import (
    Seq2SlatePredictorWrapper,
    Seq2SlateRewardWithPreprocessor,
    Seq2SlateWithPreprocessor,
    SlateRankingPreprocessor,
)
from reagent_tpu.prediction.world_model_wrappers import (
    BinaryDifferenceScorerPredictorWrapper,
    BinaryDifferenceScorerWithPreprocessor,
    CompressModelWithPreprocessor,
    LearnVMSlateWithPreprocessor,
    MDNRNNWithPreprocessor,
    Seq2RewardPlanShortSeqWithPreprocessor,
    Seq2RewardWithPreprocessor,
)
from reagent_tpu.preprocessing.preprocessor import Preprocessor

STATE_DIM, ACTION_DIM, SEQ_LEN = 4, 2, 3


def _preprocessor(n):
    return Preprocessor(
        {
            i: NormalizationParameters(feature_type="CONTINUOUS", mean=0.0, stddev=1.0)
            for i in range(n)
        }
    )


def _vp(B, n, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(B, n), jnp.float32),
        jnp.ones((B, n), jnp.float32),
    )


def test_seq2reward_with_preprocessor():
    net = Seq2RewardNetwork(
        state_dim=STATE_DIM, action_dim=ACTION_DIM, num_hiddens=8, num_hidden_layers=1
    )
    from reagent_tpu.core import types as rlt

    params = net.init(
        jax.random.PRNGKey(0),
        rlt.FeatureData(jnp.zeros((SEQ_LEN, 1, STATE_DIM))),
        rlt.FeatureData(jnp.zeros((SEQ_LEN, 1, ACTION_DIM))),
    )
    wrapper = Seq2RewardWithPreprocessor(
        net, params, _preprocessor(STATE_DIM), seq_len=SEQ_LEN, num_action=ACTION_DIM
    )
    out = wrapper(*_vp(5, STATE_DIM))
    assert out.shape == (5, ACTION_DIM)
    assert np.isfinite(np.asarray(out)).all()


def test_seq2reward_plan_short_seq():
    from reagent_tpu.core import types as rlt

    net = Seq2RewardNetwork(
        state_dim=STATE_DIM, action_dim=ACTION_DIM, num_hiddens=8, num_hidden_layers=1
    )
    params = net.init(
        jax.random.PRNGKey(0),
        rlt.FeatureData(jnp.zeros((SEQ_LEN, 1, STATE_DIM))),
        rlt.FeatureData(jnp.zeros((SEQ_LEN, 1, ACTION_DIM))),
    )
    step_model = FullyConnectedDQN(
        state_dim=STATE_DIM, action_dim=SEQ_LEN, sizes=[8], activations=["relu"]
    )
    step_params = step_model.init(jax.random.PRNGKey(1), jnp.zeros((1, STATE_DIM)))
    wrapper = Seq2RewardPlanShortSeqWithPreprocessor(
        net, params, step_model, step_params, _preprocessor(STATE_DIM),
        seq_len=SEQ_LEN, num_action=ACTION_DIM,
    )
    out = wrapper(*_vp(4, STATE_DIM))
    assert out.shape == (4, ACTION_DIM)


def test_compress_model_with_preprocessor():
    model = FullyConnectedDQN(
        state_dim=STATE_DIM, action_dim=3, sizes=[8], activations=["relu"]
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, STATE_DIM)))
    wrapper = CompressModelWithPreprocessor(model, params, _preprocessor(STATE_DIM))
    assert wrapper(*_vp(6, STATE_DIM)).shape == (6, 3)


def test_mdnrnn_with_preprocessor():
    from reagent_tpu.core import types as rlt

    net = MemoryNetwork(
        state_dim=STATE_DIM, action_dim=ACTION_DIM, num_hiddens=8,
        num_hidden_layers=1, num_gaussians=2,
    )
    params = net.init(
        jax.random.PRNGKey(0),
        rlt.FeatureData(jnp.zeros((SEQ_LEN, 1, STATE_DIM))),
        rlt.FeatureData(jnp.zeros((SEQ_LEN, 1, ACTION_DIM))),
    )
    wrapper = MDNRNNWithPreprocessor(
        net, params, _preprocessor(SEQ_LEN * STATE_DIM),
        seq_len=SEQ_LEN, num_action=ACTION_DIM,
    )
    B = 2
    action = jnp.zeros((SEQ_LEN, B, ACTION_DIM))
    out = wrapper(*_vp(B, SEQ_LEN * STATE_DIM), action)
    assert out.mus.shape[1] == B


def test_binary_difference_scorer():
    model = FullyConnectedDQN(
        state_dim=STATE_DIM, action_dim=2, sizes=[8], activations=["relu"]
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, STATE_DIM)))
    scorer = BinaryDifferenceScorerWithPreprocessor(
        model, params, _preprocessor(STATE_DIM)
    )
    wrapper = BinaryDifferenceScorerPredictorWrapper(scorer)
    out = np.asarray(wrapper(*_vp(5, STATE_DIM)))
    assert out.shape == (5,)
    assert ((out >= 0) & (out <= 1)).all()


def test_learn_vm_slate_with_preprocessor():
    C, CD = 4, 3
    mlp = MLPScorer(input_dim=CD, sizes=[8], activations=["relu"])
    from reagent_tpu.core import types as rlt

    proto = rlt.FeatureData(
        float_features=jnp.zeros((1, STATE_DIM)),
        candidate_docs=rlt.DocList(float_features=jnp.zeros((1, C, CD))),
    )
    params = mlp.init(jax.random.PRNGKey(0), proto)
    wrapper = LearnVMSlateWithPreprocessor(
        mlp, params, _preprocessor(STATE_DIM), _preprocessor(CD)
    )
    B = 2
    cand_vp = (jnp.ones((B, C, CD)), jnp.ones((B, C, CD)))
    out = wrapper(_vp(B, STATE_DIM), cand_vp)
    assert out.shape == (B, C)


def _seq2slate_net(C=4, CD=3):
    return Seq2SlateTransformerNet(
        state_dim=STATE_DIM, candidate_dim=CD, num_stacked_layers=1, num_heads=1,
        dim_model=8, dim_feedforward=8, max_src_seq_len=C, max_tgt_seq_len=C,
        output_arch=Seq2SlateOutputArch.AUTOREGRESSIVE,
    )


def test_seq2slate_serving_wrappers():
    from reagent_tpu.core import types as rlt

    C, CD = 4, 3
    net = _seq2slate_net(C, CD)
    batch = rlt.PreprocessedRankingInput(
        state=rlt.FeatureData(jnp.zeros((1, STATE_DIM))),
        src_seq=rlt.FeatureData(jnp.zeros((1, C, CD))),
    )
    params = net.init(jax.random.PRNGKey(0), batch)
    wrapped = Seq2SlateWithPreprocessor(
        net, params, _preprocessor(STATE_DIM), _preprocessor(CD), greedy=True
    )
    predictor = Seq2SlatePredictorWrapper(wrapped)
    B = 2
    cand_vp = (
        jnp.asarray(np.random.RandomState(0).randn(B, C, CD), jnp.float32),
        jnp.ones((B, C, CD)),
    )
    probs, ranked_idx = predictor(_vp(B, STATE_DIM), cand_vp)
    assert probs.shape == (B,) or probs.shape == (B, 1)
    ranked = np.asarray(ranked_idx)
    assert ranked.shape == (B, C)
    # a valid permutation of 0..C-1 per row
    for row in ranked:
        assert sorted(row.tolist()) == list(range(C))


def test_seq2slate_reward_with_preprocessor():
    from reagent_tpu.core import types as rlt

    C, CD = 4, 3
    net = Seq2SlateTransformerRewardNet(
        state_dim=STATE_DIM, candidate_dim=CD, num_stacked_layers=1, num_heads=1,
        dim_model=8, dim_feedforward=8,
    )
    inp = rlt.PreprocessedRankingInput(
        state=rlt.FeatureData(jnp.zeros((1, STATE_DIM))),
        src_seq=rlt.FeatureData(jnp.zeros((1, C, CD))),
        tgt_out_seq=rlt.FeatureData(jnp.zeros((1, C, CD))),
    )
    params = net.init(jax.random.PRNGKey(0), inp)
    wrapper = Seq2SlateRewardWithPreprocessor(
        net, params, max_src_seq_len=C, max_tgt_seq_len=C,
        state_preprocessor=_preprocessor(STATE_DIM),
        candidate_preprocessor=_preprocessor(CD),
    )
    B = 2
    cand_vp = (jnp.ones((B, C, CD)), jnp.ones((B, C, CD)))
    out = wrapper(_vp(B, STATE_DIM), cand_vp)
    assert np.asarray(out).shape == (B,)


def test_slate_ranking_preprocessor_shapes():
    C, CD = 5, 3
    pre = SlateRankingPreprocessor(_preprocessor(STATE_DIM), _preprocessor(CD), C)
    B = 2
    state, cand = pre(_vp(B, STATE_DIM), (jnp.ones((B, C, CD)), jnp.ones((B, C, CD))))
    assert state.shape[0] == B and cand.shape[:2] == (B, C)
