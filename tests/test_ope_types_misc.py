"""OPE typed wrappers, path-filtered soft update, OneMax evolution demo.

Reference parity: ope/estimators/types.py:28-606,
models/no_soft_update_embedding.py, training/gradient_free/evolution_pool.py:121.
"""

import jax.numpy as jnp
import numpy as np

from reagent_tpu.core.parameters import EvolutionParameters
from reagent_tpu.ope.estimators.types import (
    Action,
    ActionSpace,
    Items,
    PredictResults,
    TrainingData,
    TypeWrapper,
    Values,
)
from reagent_tpu.optim.soft_update import soft_update_excluding
from reagent_tpu.training.gradient_free.evolution_pool import OneMaxEvolutionPool


def test_type_wrapper_hash_eq():
    assert Action(2) == Action(2)
    assert hash(Action(2)) == hash(Action(2))
    assert int(Action(3)) == 3
    a = Action(np.array([1, 2]))
    assert a == Action(np.array([1, 2]))
    assert hash(a) == hash(Action(np.array([1, 2])))
    assert Action(1) != Action(2)
    assert TypeWrapper(1) < TypeWrapper(5)


def test_action_space_distribution():
    sp = ActionSpace(3)
    assert len(sp) == 3 and sp[1] == Action(1)
    d = sp.distribution([0.2, 0.5, 0.3])
    assert d.greedy() == Action(1)
    np.testing.assert_allclose(d.as_distribution().sum(), 1.0)
    assert abs(d.probability(Action(2)) - 0.3) < 1e-12


def test_values_sort_and_replace():
    v = Values({Action(0): 1.0, Action(5): 3.0})
    keys, vals = v.sort()
    assert keys[0] == Action(5) and vals[0] == 3.0
    r = v.replace([5.0, 1.0])
    assert r[Action(0)] == 5.0


def test_items_fill():
    items = Items(4)
    vals = items.fill([1.0, 2.0, 3.0, 4.0])
    assert vals.greedy() == 3


def test_soft_update_excluding_embedding():
    src = {"embedding": {"table": jnp.ones(3)}, "dense": {"w": jnp.ones(3)}}
    tgt = {"embedding": {"table": jnp.zeros(3)}, "dense": {"w": jnp.zeros(3)}}
    out = soft_update_excluding(src, tgt, 0.1, lambda p: "embedding" in p)
    assert float(out["embedding"]["table"][0]) == 1.0  # hard copy
    np.testing.assert_allclose(np.asarray(out["dense"]["w"]), 0.1, rtol=1e-6)


def test_onemax_evolution_pool_improves():
    pool = OneMaxEvolutionPool(
        0,
        EvolutionParameters(population_size=32, mutation_power=0.1, learning_rate=0.05),
        {"data": [16]},
    )
    r0 = float(jnp.mean(pool.compute_rewards()))
    for i in range(1, 30):
        pool.apply_global_reward(pool.compute_rewards(), i)
    r1 = float(jnp.mean(pool.compute_rewards()))
    assert r1 > r0 + 0.05
