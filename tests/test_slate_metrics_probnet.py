"""Slate OPE metrics, ranking distributions, probabilistic FC net,
PreprocessingOptions plumbing.

Reference parity: ope/estimators/slate_estimators.py:798-909 (SlateMetric/
DCG/NDCG/ERR), :129-210 (PassThru/Frechet distributions),
models/probabilistic_fully_connected_network.py, workflow/types.py:106-123.
"""

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.models.probabilistic_fully_connected_network import (
    FullyConnectedProbabilisticNetwork,
    LinearBBB,
)
from reagent_tpu.ope.estimators.slate_estimators import (
    DCGSlateMetric,
    ERRSlateMetric,
    FrechetDistribution,
    NDCGSlateMetric,
    PassThruDistribution,
    SlateMetric,
)
from reagent_tpu.workflow.identify_types_flow import normalization_helper
from reagent_tpu.workflow.types import ModelFeatureConfigProvider, PreprocessingOptions


def test_slate_metrics_values():
    rel = np.array([[3.0, 2.0, 0.0], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(SlateMetric()(rel), [5.0, 0.0])
    dcg = DCGSlateMetric()(rel)
    # (2^3-1)/log2(2) + (2^2-1)/log2(3)
    np.testing.assert_allclose(dcg[0], 7 + 3 / np.log2(3), rtol=1e-12)
    assert dcg[1] == 0.0
    ndcg = NDCGSlateMetric(np.array([3.0, 2.0, 1.0, 0.0]))(rel)
    assert 0 < ndcg[0] <= 1.0 and ndcg[1] == 0.0
    # ideal ordering scores NDCG == 1
    np.testing.assert_allclose(
        NDCGSlateMetric(np.array([3.0, 2.0, 0.0]))([[3.0, 2.0, 0.0]]), [1.0]
    )
    err = ERRSlateMetric(4.0)(rel)
    r = (2 ** np.clip([3.0, 2.0, 0.0], 0, 4) - 1) / 2**4
    manual = r[0] + (1 - r[0]) * r[1] / 2 + (1 - r[0]) * (1 - r[1]) * r[2] / 3
    np.testing.assert_allclose(err[0], manual, rtol=1e-12)


def test_ranking_distributions():
    v = np.array([0.1, 0.9, 0.5])
    assert PassThruDistribution(deterministic=True).sample_ranking(v).tolist() == [1, 2, 0]
    assert FrechetDistribution(2.0, deterministic=True).sample_ranking(v).tolist() == [1, 2, 0]
    rng = np.random.default_rng(0)
    r = FrechetDistribution(3.0).sample_ranking(v, rng)
    assert sorted(r.tolist()) == [0, 1, 2]


def test_linear_bbb_forward_and_kl():
    layer = LinearBBB(3, 2)
    x = jnp.ones((4, 3))
    rng = jax.random.PRNGKey(0)
    params = layer.init(rng, x, rng)
    out, kl = layer.apply(params, x, rng)
    assert out.shape == (4, 2)
    assert float(kl) > 0


def test_probabilistic_network_elbo_decreases():
    import optax

    net = FullyConnectedProbabilisticNetwork(
        sizes=[2, 16, 1], activations=["relu"], noise_tol=0.2
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (64, 2))
    y = x[:, :1] * 2 - x[:, 1:] * 0.5
    params = net.init(rng, x, rng)
    opt = optax.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(params, st, key):
        loss, g = jax.value_and_grad(lambda p: net.sample_elbo(p, x, y, 4, key))(params)
        up, st = opt.update(g, st, params)
        return optax.apply_updates(params, up), st, loss

    losses = []
    for _ in range(100):
        rng, k = jax.random.split(rng)
        params, st, loss = step(params, st, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


def test_preprocessing_options_plumbing():
    opts = PreprocessingOptions(quantile_size=10, skip_box_cox=True)
    fn = normalization_helper(**opts.normalization_kwargs())
    rng = np.random.default_rng(0)
    out = fn({1: list(rng.normal(size=300)), 2: [0.0, 1.0] * 150})
    assert out[1].feature_type == "CONTINUOUS"
    assert out[2].feature_type == "BINARY"
    # allowedlist filters features
    opts2 = PreprocessingOptions(allowedlist_features=[2])
    fn2 = normalization_helper(**opts2.normalization_kwargs())
    out2 = fn2({1: list(rng.normal(size=300)), 2: [0.0, 1.0] * 150})
    assert set(out2.keys()) == {2}


def test_model_feature_config_provider():
    cfg = ModelFeatureConfigProvider().get_model_feature_config()
    assert cfg.float_feature_infos == []
