"""Net-builder coverage for slate-reward, seq2reward-value, n-gram-conv
synthetic-reward builders, and the sparse→dense host processors.

Reference parity targets: net_builder/slate_reward/*, net_builder/value/
seq2reward_rnn.py, net_builder/synthetic_reward/ngram_synthetic_reward.py
(NGramConvNetSyntheticReward), preprocessing/sparse_to_dense.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.registry import (
    SLATE_REWARD_NET_BUILDERS,
    SYNTHETIC_REWARD_NET_BUILDERS,
    VALUE_NET_BUILDERS,
)
from reagent_tpu.preprocessing.normalization import MISSING_VALUE
from reagent_tpu.preprocessing.sparse_to_dense import (
    PythonIdScoreListToTensorProcessor,
    PythonSparseToDenseProcessor,
    StringKeySparseToDenseProcessor,
)

import reagent_tpu.net_builder  # noqa: F401  (registers builders)


def _ranking_input(B=3, T=4, state_dim=5, cand_dim=6):
    rng = np.random.RandomState(0)
    return rlt.PreprocessedRankingInput(
        state=rlt.FeatureData(jnp.asarray(rng.randn(B, state_dim), jnp.float32)),
        src_seq=rlt.FeatureData(jnp.asarray(rng.randn(B, T, cand_dim), jnp.float32)),
        tgt_out_seq=rlt.FeatureData(
            jnp.asarray(rng.randn(B, T, cand_dim), jnp.float32)
        ),
    )


@pytest.mark.parametrize("name", ["SlateRewardGRU", "SlateRewardTransformer"])
def test_slate_reward_builders(name):
    builder = SLATE_REWARD_NET_BUILDERS.get(name)()
    net = builder.build_slate_reward_network(
        state_dim=5, candidate_dim=6, candidate_size=4, slate_size=4
    )
    inp = _ranking_input()
    params = net.init(jax.random.PRNGKey(0), inp)
    out = net.apply(params, inp)
    assert out.shape == (3, 1)
    assert builder.expect_slate_wise_reward


def test_seq2reward_value_builder():
    builder = VALUE_NET_BUILDERS.get("Seq2RewardNetBuilder")(
        action_dim=2, num_hiddens=8, num_hidden_layers=1
    )
    net = builder.build_value_network(None, state_dim=4)
    T, B = 5, 3
    state = rlt.FeatureData(jnp.zeros((T, B, 4)))
    action = rlt.FeatureData(jnp.zeros((T, B, 2)))
    params = net.init(jax.random.PRNGKey(0), state, action)
    out = net.apply(params, state, action)
    acc_reward = out.acc_reward if hasattr(out, "acc_reward") else out
    assert np.asarray(acc_reward).shape[0] == B


def test_ngram_conv_synthetic_reward_builder():
    builder = SYNTHETIC_REWARD_NET_BUILDERS.get("NGramConvNetSyntheticReward")(
        sizes=[16], activations=["relu"], context_size=3,
        conv_dims=[8], conv_height_kernels=[2],
    )
    net = builder.build_synthetic_reward_network(
        None, state_dim=4, action_dim=2
    )
    T, B = 6, 3
    batch = rlt.MemoryNetworkInput(
        state=rlt.FeatureData(jnp.ones((T, B, 4))),
        action=rlt.FeatureData(jnp.ones((T, B, 2))),
        next_state=rlt.FeatureData(jnp.ones((T, B, 4))),
        reward=jnp.ones((T, B)),
        not_terminal=jnp.ones((T, B)),
        step=None,
        time_diff=jnp.ones((T, B)),
        valid_step=jnp.full((B, 1), T),
    )
    params = net.init(jax.random.PRNGKey(0), batch)
    out = net.apply(params, batch)
    assert out.predicted_reward.shape == (B, 1)
    assert out.output.shape == (B, T)
    # with all steps valid, predicted == sum of per-step rewards
    np.testing.assert_allclose(
        np.asarray(out.predicted_reward[:, 0]),
        np.asarray(out.output.sum(axis=1)),
        rtol=1e-5,
    )


def test_python_sparse_to_dense():
    p = PythonSparseToDenseProcessor([1, 2, 5])
    values, presence = p([{1: 1.0, 5: 2.0}, {2: float("nan")}, {}])
    np.testing.assert_allclose(
        values,
        [[1.0, MISSING_VALUE, 2.0],
         [MISSING_VALUE] * 3,
         [MISSING_VALUE] * 3],
    )
    assert presence.tolist() == [[True, False, True], [False] * 3, [False] * 3]


def test_string_key_sparse_to_dense_zero_missing():
    p = StringKeySparseToDenseProcessor([1, 2], set_missing_value_to_zero=True)
    values, presence = p([{"1": 3.0}])
    np.testing.assert_allclose(values, [[3.0, 0.0]])
    assert presence.all()


def test_id_score_list_processor():
    p = PythonIdScoreListToTensorProcessor([7, 8])
    out = p([{7: {10: 0.5, 11: 0.25}}, {8: {3: 1.0}}])
    offsets, ids, scores = out[7]
    assert offsets.tolist() == [0, 2]
    assert ids.tolist() == [10, 11]
    np.testing.assert_allclose(scores, [0.5, 0.25])
    offsets8, ids8, _ = out[8]
    assert offsets8.tolist() == [0, 0]
    assert ids8.tolist() == [3]
