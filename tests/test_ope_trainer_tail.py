"""Tests for the OPE trainer tail: Lasso/DTClassifier/NN reward-model
trainers and the Monte-Carlo tabular trainers.

Reference behaviors: reagent/ope/trainers/linear_trainers.py:62-363 and
reagent/ope/trainers/rl_tabular_trainers.py:120-394.
"""

import numpy as np
import pytest

from reagent_tpu.ope.test.gridworld import GridWorld
from reagent_tpu.ope.trainers import (
    DecisionTreeClassifierTrainer,
    DecisionTreeTrainer,
    DPValueFunction,
    EstimatedStateValueFunction,
    LassoTrainer,
    MonteCarloTrainer,
    MonteCarloValueFunction,
    NNTrainer,
    TabularPolicy,
    TrainingData,
)
from reagent_tpu.ope.trainers.rl_tabular_trainers import DPTrainer


def _regression_data(seed=0, n=400, d=10, noise=0.05):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=d)
    w[d // 2 :] = 0.0  # sparse ground truth — lasso's home turf
    x = rng.normal(size=(n, d))
    y = x @ w + rng.normal(scale=noise, size=n)
    xv = rng.normal(size=(n // 2, d))
    yv = xv @ w
    return TrainingData(x, y, None, xv, yv), w


def test_lasso_trainer_selects_and_fits():
    data, w = _regression_data()
    tr = LassoTrainer()
    tr.train(data)
    pred = tr.predict(data.validation_x)
    mse = float(np.mean((pred - data.validation_y) ** 2))
    assert mse < 0.05
    # lasso should zero (or nearly) the inactive half of the weights
    coef = tr._model.coef_
    assert np.max(np.abs(coef[len(w) // 2 :])) < 0.1


def test_decision_tree_classifier_trainer():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(600, 5))
    y = (x[:, 0] + x[:, 1] > 0).astype(int)
    xv = rng.normal(size=(200, 5))
    yv = (xv[:, 0] + xv[:, 1] > 0).astype(int)
    tr = DecisionTreeClassifierTrainer()
    tr.train(TrainingData(x, y, None, xv, yv))
    acc = float(np.mean(tr._model.predict(xv) == yv))
    assert acc > 0.85
    proba = tr.predict_proba(xv)
    assert proba.shape == (200, 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-6)


def test_nn_trainer_regression():
    data, _ = _regression_data(seed=2, n=800)
    tr = NNTrainer(hidden_dim=64, hidden_layers=2, seed=0)
    tr.train(data, iterations=300)
    pred = tr.predict(data.validation_x)
    mse = float(np.mean((pred - data.validation_y) ** 2))
    # untrained-baseline MSE is ~||w||^2 ≈ 5; trained must be far below
    assert mse < 0.5


def test_nn_trainer_deterministic():
    data, _ = _regression_data(seed=3, n=200)
    p1 = NNTrainer(hidden_dim=32, seed=7)
    p2 = NNTrainer(hidden_dim=32, seed=7)
    p1.train(data, iterations=50)
    p2.train(data, iterations=50)
    np.testing.assert_allclose(
        p1.predict(data.validation_x), p2.predict(data.validation_x), atol=1e-5
    )


def test_monte_carlo_trainer_reaches_goal():
    world = GridWorld(size=3)
    policy = TabularPolicy(world.num_actions, epsilon=0.2, rng=np.random.default_rng(0))
    mc = MonteCarloTrainer(world, policy, seed=0)
    mc.train(iterations=60, gamma=0.9, update_interval=20, max_steps=30)
    # the learned policy should reach the goal from the start quickly
    rng = np.random.default_rng(1)
    s = (0, 0)
    for _ in range(2 * world.size):
        a = int(np.argmax(policy.action_dist(s)))
        (_, s, _, done), = world.transition(s, a)
        if done:
            break
    assert s == world.goal


def test_monte_carlo_value_function_matches_dp():
    world = GridWorld(size=3)
    policy = TabularPolicy(world.num_actions, epsilon=0.0)
    DPTrainer(world, policy).train(gamma=0.9)
    dp = DPValueFunction(policy, world, gamma=0.9)
    mc = MonteCarloValueFunction(
        policy, world, gamma=0.9, count_threshold=50, max_iteration=100, seed=0
    )
    for s in [(0, 0), (1, 1), (2, 0)]:
        assert abs(mc.state_value(s) - dp.state_value(s)) < 0.05


def test_estimated_state_value_function_matches_dp():
    world = GridWorld(size=3)
    policy = TabularPolicy(world.num_actions, epsilon=0.1)
    DPTrainer(world, policy).train(gamma=0.9)
    dp = DPValueFunction(policy, world, gamma=0.9)
    dp.evaluate()
    est = EstimatedStateValueFunction(
        policy, world, gamma=0.9, num_episodes=300, max_steps=50, seed=0
    )
    for s in [(0, 0), (2, 1)]:
        assert abs(est.state_value(s) - dp.state_value(s)) < 0.1


def test_slate_benchmark_with_trained_rankers():
    """Lasso-as-log-ranker / DecisionTree-as-target-ranker, the reference
    MSLR pairing (mslr_slate.py:619-623)."""
    from reagent_tpu.ope.test.slate_benchmark import (
        QueryCorpus,
        evaluate_slate_benchmark,
    )

    corpus = QueryCorpus.synthetic(num_queries=60, num_docs=10, seed=0)
    results = evaluate_slate_benchmark(
        corpus,
        slate_size=3,
        log_temperature=1.5,
        tgt_temperature=1.0,
        num_samples_per_query=20,
        log_trainer=LassoTrainer(),
        tgt_trainer=DecisionTreeTrainer(max_depth=6),
    )
    gt = results["ips"].ground_truth_reward
    assert gt is not None and gt > 0
    for name, res in results.items():
        rel_err = abs(res.estimated_reward - gt) / abs(gt)
        assert rel_err < 0.5, f"{name}: {res.estimated_reward} vs gt {gt}"
