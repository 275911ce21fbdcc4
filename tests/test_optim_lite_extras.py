"""Extended optimizer union, Bayes-by-backprop lite optimizer, MDNRNN pool.

Reference parity: optimizer/uninferrable_optimizers.py (Adamax/LBFGS/NAdam/
RAdam/Rprop/SparseAdam/ASGD/Adadelta), lite/optimizer.py:1418-1686
(LinearBayesianByBackprop, MLPBayesianByBackprop, BayesianByBackpropOptimizer),
models/mdn_rnn.py:121-170 (MDNRNNMemoryPool).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.lite.optimizer import (
    BayesianByBackpropOptimizer,
    LinearBayesianByBackprop,
    MLPBayesianByBackprop,
)
from reagent_tpu.models.mdn_rnn import MDNRNNMemoryPool
from reagent_tpu.optim.union import make_optimizer


@pytest.mark.parametrize(
    "name",
    ["Adadelta", "Adamax", "NAdam", "RAdam", "Rprop", "ASGD", "SparseAdam",
     "Lamb", "Adafactor"],
)
def test_optimizer_union_extras(name):
    opt = make_optimizer({name: {}})
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    updates, state = opt.update({"w": jnp.full(3, 0.1)}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_bbb_surrogates_forward_and_kl():
    for net in (LinearBayesianByBackprop(4), MLPBayesianByBackprop(4, hidden=8)):
        x = jnp.ones((5, 4))
        out = net.forward(net.params, x, jax.random.PRNGKey(0))
        assert out.shape == (5,)
        assert float(net.kl(net.params)) > 0.0


def test_bbb_optimizer_finds_optimum():
    param = {"a": [0, 1, 2, 3], "b": [0, 1, 2]}

    def obj(sol):
        return (jnp.abs(sol["a"] - 2) + jnp.abs(sol["b"] - 1)).astype(jnp.float32)

    opt = BayesianByBackpropOptimizer(
        param, obj, batch_size=16, num_mutations=8, train_steps=15, seed=0
    )
    for _ in range(8):
        opt.optimize_step()
    best_cost, best_sol = opt.best_solutions(1)[0]
    assert best_cost <= 1.0
    assert opt.last_predictor_loss_mean is not None


def test_mdnrnn_memory_pool_time_major():
    pool = MDNRNNMemoryPool(8)
    for i in range(5):
        pool.insert_into_memory(
            np.full((3, 4), i), np.ones((3, 2)), np.ones((3, 4)), np.ones(3), np.ones(3)
        )
    assert pool.memory_size == 5
    batch = pool.sample_memories(2, np.random.default_rng(0))
    assert batch.state.float_features.shape == (3, 2, 4)
    assert batch.reward.shape == (3, 2)
    assert batch.time_diff.shape == (3, 2)
    # ring eviction
    for i in range(10):
        pool.insert_into_memory(
            np.zeros((3, 4)), np.ones((3, 2)), np.ones((3, 4)), np.ones(3), np.ones(3)
        )
    assert pool.memory_size == 8
