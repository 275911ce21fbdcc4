"""DPP re-ranker + synthetic-reward predictor wrappers.

Reference: reagent/prediction/ranking/predictor_wrapper.py (CIKM'18 Alg 1)
and prediction/synthetic_reward/synthetic_reward_predictor_wrapper.py.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import NormalizationParameters
from reagent_tpu.models.synthetic_reward import (
    SingleStepSyntheticRewardNet,
    SyntheticRewardNet,
)
from reagent_tpu.prediction.ranking import (
    DeterminantalPointProcessPredictorWrapper,
    Kernel,
)
from reagent_tpu.prediction.synthetic_reward import (
    SyntheticRewardPredictorWrapper,
    split_features,
)
from reagent_tpu.preprocessing.preprocessor import Preprocessor


def test_dpp_greedy_matches_bruteforce_full_order():
    rng = np.random.default_rng(1)
    n, F = 5, 5  # full-rank kernel
    quality = np.abs(rng.normal(size=(n, 1))) + 0.5
    feats = rng.normal(size=(n, F))
    # alpha <= 1 keeps the reference's diag-substituted linear kernel PSD
    # (alpha > 1 makes L indefinite and greedy det-maximization ill-defined)
    dpp = DeterminantalPointProcessPredictorWrapper(alpha=0.5, kernel=Kernel.Linear)
    chosen, dets, L = dpp(jnp.asarray(quality), jnp.asarray(feats))
    chosen = np.asarray(chosen)
    Lnp = np.asarray(L)
    assert sorted(chosen.tolist()) == list(range(n))
    # replay the greedy brute-force: at each step the picked item maximizes
    # det of the chosen submatrix
    picked = []
    for step in range(n - 1):
        cands = [i for i in range(n) if i not in picked]
        best = max(
            cands,
            key=lambda i: np.linalg.det(Lnp[np.ix_(picked + [i], picked + [i])]),
        )
        assert chosen[step] == best, (step, chosen, best)
        picked.append(best)


def test_dpp_rank_deficient_kernel_still_permutation():
    rng = np.random.default_rng(0)
    n, F = 8, 2  # rank-deficient: only 2 feature dims
    quality = np.abs(rng.normal(size=(n, 1))) + 0.5
    feats = rng.normal(size=(n, F))
    for kernel in (Kernel.Linear, Kernel.RBF):
        dpp = DeterminantalPointProcessPredictorWrapper(alpha=1.0, kernel=kernel)
        chosen, _, _ = dpp(jnp.asarray(quality), jnp.asarray(feats))
        assert sorted(np.asarray(chosen).tolist()) == list(range(n)), kernel


def test_dpp_diversity_beats_pure_quality():
    """Two near-identical high-quality items: DPP must interleave the
    dissimilar lower-quality item."""
    quality = jnp.array([[1.0], [0.99], [0.8]])
    feats = jnp.array([[1.0, 0.0], [1.0, 1e-3], [0.0, 1.0]])
    dpp = DeterminantalPointProcessPredictorWrapper(alpha=1.0, kernel=Kernel.Linear)
    chosen, _, _ = dpp(quality, feats)
    assert np.asarray(chosen)[1] == 2  # diverse item ranked 2nd despite lower quality


def test_synthetic_reward_predictor_wrapper():
    sd, ad, T = 3, 2, 4
    sp = Preprocessor(
        {i: NormalizationParameters(feature_type="CONTINUOUS", mean=0.0, stddev=1.0)
         for i in range(sd)}
    )
    ap = Preprocessor(
        {i: NormalizationParameters(feature_type="DO_NOT_PREPROCESS", mean=0.0, stddev=1.0)
         for i in range(ad)}
    )
    net = SyntheticRewardNet(
        net=SingleStepSyntheticRewardNet(
            state_dim=sd, action_dim=ad, sizes=[8], activations=["relu"]
        )
    )
    proto = rlt.MemoryNetworkInput(
        state=rlt.FeatureData(float_features=jnp.zeros((T, 1, sd))),
        action=rlt.FeatureData(float_features=jnp.zeros((T, 1, ad))),
        next_state=rlt.FeatureData(float_features=jnp.zeros((T, 1, sd))),
        reward=jnp.zeros((T, 1)),
        not_terminal=jnp.ones((T, 1)),
        time_diff=None, step=None,
        valid_step=jnp.full((1, 1), T, jnp.int32),
    )
    params = net.init(jax.random.PRNGKey(0), proto)
    w = SyntheticRewardPredictorWrapper(T, sp, ap, net, params)
    vals = jnp.asarray(np.random.default_rng(0).normal(size=(T, sd + ad)), jnp.float32)
    pres = jnp.ones((T, sd + ad), bool)
    r = w((vals, pres))
    assert r.shape == (T,) and np.isfinite(np.asarray(r)).all()
    # split_features partitions columns exactly
    (sv, spres), (av, apres) = split_features((vals, pres), sd, ad)
    assert sv.shape == (T, sd) and av.shape == (T, ad)
