"""Net builders + predictor wrapper export/load round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reagent_tpu.core.parameters import NormalizationData, NormalizationParameters
from reagent_tpu.core.registry import (
    CATEGORICAL_DQN_NET_BUILDERS,
    CONTINUOUS_ACTOR_NET_BUILDERS,
    DISCRETE_DQN_NET_BUILDERS,
    PARAMETRIC_DQN_NET_BUILDERS,
    QR_DQN_NET_BUILDERS,
    SYNTHETIC_REWARD_NET_BUILDERS,
)
import reagent_tpu.net_builder  # noqa: F401 — registers builders
from reagent_tpu.prediction import DiscreteDqnPredictorWrapper
from reagent_tpu.prediction.predictor_wrapper import DiscreteDqnWithPreprocessor
from reagent_tpu.preprocessing.preprocessor import Preprocessor


def _norm_data(n=4):
    return NormalizationData(
        dense_normalization_parameters={
            i: NormalizationParameters(feature_type="CONTINUOUS", mean=0.0, stddev=1.0)
            for i in range(n)
        }
    )


def test_discrete_dqn_builders():
    for name in ("FullyConnected", "Dueling"):
        builder = DISCRETE_DQN_NET_BUILDERS.build({name: {"sizes": [32, 16], "activations": ["relu", "relu"]}})
        net = builder.build_q_network(_norm_data(), output_dim=2)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
        assert net.apply(params, jnp.ones((3, 4))).shape == (3, 2)


def test_quantile_categorical_builders():
    b = QR_DQN_NET_BUILDERS.build({"DuelingQuantile": {"sizes": [16], "activations": ["relu"], "num_atoms": 5}})
    net = b.build_q_network(_norm_data(), output_dim=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    assert net.apply(params, jnp.ones((3, 4))).shape == (3, 2, 5)

    b2 = CATEGORICAL_DQN_NET_BUILDERS.build(
        {"Categorical": {"sizes": [16], "activations": ["relu"], "num_atoms": 11, "qmin": -5, "qmax": 5}}
    )
    net2 = b2.build_q_network(_norm_data(), output_dim=3)
    p2 = net2.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)), method="log_dist")
    assert net2.apply(p2, jnp.ones((2, 4))).shape == (2, 3)


def test_actor_and_parametric_builders():
    b = CONTINUOUS_ACTOR_NET_BUILDERS.build(
        {"GaussianFullyConnected": {"sizes": [16], "activations": ["relu"]}}
    )
    actor = b.build_actor(_norm_data(3), _norm_data(1))
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    out = actor.apply(params, jnp.ones((2, 3)), jax.random.PRNGKey(1))
    assert out.action.shape == (2, 1)

    pb = PARAMETRIC_DQN_NET_BUILDERS.build({"FullyConnected": {"sizes": [16], "activations": ["relu"]}})
    critic = pb.build_q_network(_norm_data(3), _norm_data(1))
    cp = critic.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    assert critic.apply(cp, jnp.ones((2, 3)), jnp.ones((2, 1))).shape == (2, 1)


def test_synthetic_reward_builders():
    from reagent_tpu.core import types as rlt

    for name in ("SingleStepSyntheticReward", "NGramSyntheticReward"):
        b = SYNTHETIC_REWARD_NET_BUILDERS.build({name: {}})
        net = b.build_synthetic_reward_network(_norm_data(3), _norm_data(2))
        T, B = 4, 2
        batch = rlt.MemoryNetworkInput(
            state=rlt.FeatureData(float_features=jnp.ones((T, B, 3))),
            next_state=rlt.FeatureData(float_features=jnp.ones((T, B, 3))),
            action=rlt.FeatureData(float_features=jnp.ones((T, B, 2))),
            reward=jnp.ones((T, B)),
            time_diff=jnp.ones((T, B)),
            step=None,
            not_terminal=jnp.ones((T, B)),
            valid_step=jnp.full((B, 1), 3, jnp.int32),
        )
        params = net.init(jax.random.PRNGKey(0), batch)
        out = net.apply(params, batch)
        assert out.predicted_reward.shape == (B, 1)
        # mask covers exactly the LAST 3 of 4 steps
        np.testing.assert_array_equal(np.asarray(out.mask), [[0, 1, 1, 1]] * B)


def test_predictor_export_load_roundtrip(tmp_path):
    from reagent_tpu.models import FullyConnectedDQN

    norm = _norm_data(4).dense_normalization_parameters
    pre = Preprocessor(norm)
    q_net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    q_params = q_net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    wrapped = DiscreteDqnWithPreprocessor(q_net, q_params, pre)
    predictor = DiscreteDqnPredictorWrapper(
        wrapped, action_names=["left", "right"], activations=["relu", "linear"]
    )

    values = jnp.asarray(np.random.default_rng(0).normal(size=(5, 4)), jnp.float32)
    presence = jnp.ones_like(values)
    names, q = predictor(values, presence)
    assert names == ["left", "right"]

    path = str(tmp_path / "model")
    predictor.save(path)
    loaded = DiscreteDqnPredictorWrapper.load(path)
    names2, q2 = loaded(np.asarray(values), np.asarray(presence))
    assert names2 == ["left", "right"]
    np.testing.assert_allclose(np.asarray(q), q2, rtol=1e-5, atol=1e-5)
