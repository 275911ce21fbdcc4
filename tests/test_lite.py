"""Lite combinatorial-optimizer tests (mirrors reference lite doctests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.lite import (
    BayesianMLPEnsemblerOptimizer,
    BestResultsQueue,
    GumbelSoftmaxOptimizer,
    PolicyGradientOptimizer,
    QLearningOptimizer,
    RandomSearchOptimizer,
)

# parameter space: pick (x, y) indices; optimum at x=2, y=0
PARAM = {"x": [0.0, 1.0, 2.0, 3.0], "y": [0.0, 1.0]}
CHOICES_X = jnp.asarray(PARAM["x"])
CHOICES_Y = jnp.asarray(PARAM["y"])


def obj_func(sampled):
    # minimized at x-value 2.0, y-value 0.0
    x = CHOICES_X[sampled["x"]]
    y = CHOICES_Y[sampled["y"]]
    return ((x - 2.0) ** 2 + y**2).reshape(-1, 1)


def soft_obj_func(sampled):
    # for gumbel-softmax: inputs are soft one-hots
    x = sampled["x"] @ CHOICES_X
    y = sampled["y"] @ CHOICES_Y
    return ((x - 2.0) ** 2 + y**2).reshape(-1, 1)


def test_best_results_queue():
    q = BestResultsQueue(max_len=2)
    q.insert(5.0, {"a": 1})
    q.insert(1.0, {"a": 2})
    q.insert(3.0, {"a": 3})
    top = q.topk(2)
    assert top[0][0] == 1.0 and top[1][0] == 3.0


def test_random_search_finds_optimum():
    opt = RandomSearchOptimizer(PARAM, obj_func, batch_size=64)
    for _ in range(5):
        opt.optimize_step()
    cost, sol = opt.best_solutions(1)[0]
    assert cost == pytest.approx(0.0)
    assert sol["x"] == 2 and sol["y"] == 0


def test_policy_gradient_concentrates():
    opt = PolicyGradientOptimizer(PARAM, obj_func, batch_size=128, learning_rate=0.2)
    for _ in range(60):
        opt.optimize_step()
    sampled = opt.sample(200)
    frac_best = float(np.mean(np.asarray(sampled["x"]) == 2))
    assert frac_best > 0.8
    assert opt.best_solutions(1)[0][0] == pytest.approx(0.0)


def test_gumbel_softmax_concentrates():
    opt = GumbelSoftmaxOptimizer(
        PARAM, soft_obj_func, batch_size=128, learning_rate=0.1,
        temperature=1.0, anneal_rate=0.97, min_temperature=0.2,
    )
    for _ in range(80):
        opt.optimize_step()
    sampled = opt.sample(200, temperature=0.2)
    assert float(np.mean(np.asarray(sampled["x"]) == 2)) > 0.7


def test_qlearning_optimizer():
    opt = QLearningOptimizer(PARAM, obj_func, batch_size=64, epsilon=0.3)
    for _ in range(30):
        opt.optimize_step()
    sampled = opt.sample(10)
    assert int(sampled["x"][0]) == 2 and int(sampled["y"][0]) == 0


def test_bayesian_ensemble_optimizer():
    opt = BayesianMLPEnsemblerOptimizer(
        PARAM, obj_func, batch_size=32, candidate_pool=256, num_ensemble=3
    )
    for _ in range(10):
        opt.optimize_step()
    cost, sol = opt.best_solutions(1)[0]
    assert cost == pytest.approx(0.0)
    assert sol["x"] == 2


def test_indices_to_raw_choices():
    opt = RandomSearchOptimizer(PARAM, obj_func, batch_size=4)
    (sampled,) = opt.sample_internal(4)
    raw = opt.indices_to_raw_choices(sampled)
    assert len(raw) == 4
    assert raw[0]["x"] in PARAM["x"]
