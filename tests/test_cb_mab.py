"""LinUCB / disjoint LinUCB / MAB tests (mirrors reference cb/test_linucb.py, mab/test_mab.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.mab import (
    UCB1,
    BernoulliBetaThompson,
    BernoulliMAB,
    MetricUCB,
    NormalGammaThompson,
    UCBTuned,
    single_evaluation_bandit_algo,
)
from reagent_tpu.models.linear_regression import (
    DisjointLinearRegressionUCB,
    LinearRegressionUCB,
    batch_quadratic_form,
)
from reagent_tpu.training.cb import DisjointLinUCBTrainer, LinUCBTrainer


def test_batch_quadratic_form():
    x = jnp.array([[1.0, 2.0]])
    A = jnp.array([[2.0, 0.0], [0.0, 3.0]])
    assert float(batch_quadratic_form(x, A)[0]) == pytest.approx(2 + 12)


def test_linucb_recovers_linear_model():
    """Exact-fit test like reference test_linucb.py: y = <w, x>."""
    rng = np.random.default_rng(0)
    D = 4
    w = np.array([1.0, -2.0, 0.5, 3.0])
    model = LinearRegressionUCB(input_dim=D, l2_reg_lambda=1e-6)
    state = model.init()
    x = rng.normal(size=(500, D)).astype(np.float32)
    y = x @ w
    state = model.update(state, jnp.asarray(x), jnp.asarray(y))
    state = model.calculate_coefs(state)
    np.testing.assert_allclose(np.asarray(state.coefs), w, atol=1e-3)
    out = model.forward(state, jnp.asarray(x[:5]), ucb_alpha=0.0)
    np.testing.assert_allclose(np.asarray(out["ucb"]), y[:5], atol=1e-3)
    # UCB with alpha > 0 upper-bounds the prediction
    out2 = model.forward(state, jnp.asarray(x[:5]), ucb_alpha=1.0)
    assert np.all(np.asarray(out2["ucb"]) >= np.asarray(out["ucb"]))


def test_linucb_incremental_matches_batch():
    rng = np.random.default_rng(1)
    D = 3
    x = rng.normal(size=(100, D)).astype(np.float32)
    y = rng.normal(size=100).astype(np.float32)
    m = LinearRegressionUCB(input_dim=D)
    s_all = m.update(m.init(), jnp.asarray(x), jnp.asarray(y))
    s_inc = m.init()
    for i in range(0, 100, 10):
        s_inc = m.update(s_inc, jnp.asarray(x[i : i + 10]), jnp.asarray(y[i : i + 10]))
    np.testing.assert_allclose(np.asarray(s_all.avg_A), np.asarray(s_inc.avg_A), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_all.avg_b), np.asarray(s_inc.avg_b), rtol=1e-4)


def test_linucb_trainer_on_cbinput():
    rng = np.random.default_rng(2)
    B, K, D = 64, 3, 4
    feats = rng.normal(size=(B, K, D)).astype(np.float32)
    actions = rng.integers(0, K, B)
    w = np.array([2.0, 0.0, -1.0, 0.5])
    rewards = np.einsum("bd,d->b", feats[np.arange(B), actions], w)
    batch = rlt.CBInput(
        context_arm_features=jnp.asarray(feats),
        action=jnp.asarray(actions).reshape(-1, 1),
        reward=jnp.asarray(rewards).reshape(-1, 1),
    )
    trainer = LinUCBTrainer(LinearRegressionUCB(input_dim=D, l2_reg_lambda=1e-6))
    state = trainer.init()
    state, _ = trainer.train_step(state, batch)
    state = trainer.on_epoch_end(state)
    np.testing.assert_allclose(np.asarray(state.coefs), w, atol=0.05)
    scores = trainer.score(state, batch, ucb_alpha=0.0)
    assert scores.shape == (B, K)


def test_disjoint_linucb():
    rng = np.random.default_rng(3)
    B, K, D = 300, 2, 3
    w = np.array([[1.0, 0.0, 2.0], [0.0, -1.0, 1.0]])
    feats = rng.normal(size=(B, K, D)).astype(np.float32)
    actions = rng.integers(0, K, B)
    x_chosen = feats[np.arange(B), actions]
    rewards = np.einsum("bd,bd->b", x_chosen, w[actions])
    batch = rlt.CBInput(
        context_arm_features=jnp.asarray(feats),
        action=jnp.asarray(actions).reshape(-1, 1),
        reward=jnp.asarray(rewards).reshape(-1, 1),
    )
    trainer = DisjointLinUCBTrainer(
        DisjointLinearRegressionUCB(num_arms=K, input_dim=D, l2_reg_lambda=1e-4)
    )
    state = trainer.init()
    state, _ = trainer.train_step(state, batch)
    state = trainer.on_epoch_end(state)
    np.testing.assert_allclose(np.asarray(state.coefs), w, atol=0.05)


def test_mab_ucb1_finds_best_arm():
    bandit = BernoulliMAB(max_steps=400, probs=jnp.array([0.2, 0.8, 0.5]))
    regret = single_evaluation_bandit_algo(bandit, UCB1(n_arms=3), seed=0)
    # sublinear regret: last-100-steps regret rate far below first-100
    assert regret[-1] - regret[-100] < (regret[99] - regret[0]) * 0.8
    assert regret[-1] < 0.6 * 0.5 * 400  # way better than uniform play


@pytest.mark.parametrize("algo_cls", [MetricUCB, UCBTuned, BernoulliBetaThompson])
def test_mab_algos_beat_random(algo_cls):
    bandit = BernoulliMAB(max_steps=300, probs=jnp.array([0.1, 0.9]))
    regret = single_evaluation_bandit_algo(bandit, algo_cls(n_arms=2), seed=1)
    assert regret[-1] < 0.4 * 0.8 * 300 / 2


def test_normal_gamma_thompson_updates():
    algo = NormalGammaThompson(n_arms=2)
    state = algo.init()
    n = jnp.array([10.0, 0.0])
    s = jnp.array([50.0, 0.0])
    s2 = jnp.array([260.0, 0.0])
    state = algo.add_batch_observations(state, n, s, s2)
    assert float(state.extra["mus"][0]) == pytest.approx(50.0 / 11, rel=1e-3)
    assert float(state.extra["mus"][1]) == 0.0
    samples = algo.get_scores(state, jax.random.PRNGKey(0))
    assert samples.shape == (2,)


def test_mab_trainer_cb_bridge():
    """CBInput batches -> MAB state; UCB1 converges to the best arm
    (reference training/cb/mab_trainer.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reagent_tpu.core.types import CBInput
    from reagent_tpu.mab.ucb import UCB1
    from reagent_tpu.training.cb import MABTrainer

    algo = UCB1(n_arms=3)
    trainer = MABTrainer(algo)
    state = trainer.init()
    rng = np.random.default_rng(0)
    means = np.array([0.2, 0.8, 0.5])
    for i in range(50):
        actions = rng.integers(0, 3, size=16)
        rewards = rng.binomial(1, means[actions]).astype(np.float32)
        batch = CBInput(
            context_arm_features=jnp.zeros((16, 3, 1)),
            action=jnp.asarray(actions)[:, None],
            reward=jnp.asarray(rewards)[:, None],
        )
        state, m = trainer.train_step(state, batch)
    assert float(m["num_obs"]) == 800.0
    scores = trainer.score(state)
    assert int(jnp.argmax(algo.get_avg_reward_values(state))) == 1
    assert int(jnp.argmax(scores)) == 1
