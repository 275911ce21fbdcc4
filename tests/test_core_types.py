"""Core typed-batch pytree tests (mirrors reference test coverage of core/types.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.registry import Registry, construct_from_config
from reagent_tpu.core.configuration import config_class_for, make_config_class
from reagent_tpu.core.parameters import NormalizationParameters, RLParameters


def test_feature_data_is_pytree():
    fd = rlt.FeatureData(float_features=jnp.ones((4, 3)))
    leaves = jax.tree_util.tree_leaves(fd)
    assert len(leaves) == 1
    doubled = jax.tree_util.tree_map(lambda x: x * 2, fd)
    assert np.allclose(doubled.float_features, 2.0)


def test_discrete_dqn_input_through_jit():
    batch = rlt.DiscreteDqnInput(
        state=rlt.FeatureData(float_features=jnp.ones((2, 4))),
        next_state=rlt.FeatureData(float_features=jnp.ones((2, 4))),
        reward=jnp.ones((2, 1)),
        time_diff=jnp.ones((2, 1)),
        step=None,
        not_terminal=jnp.ones((2, 1)),
        action=jnp.array([[1.0, 0.0], [0.0, 1.0]]),
        next_action=jnp.zeros((2, 2)),
        possible_actions_mask=jnp.ones((2, 2)),
        possible_next_actions_mask=jnp.ones((2, 2)),
    )

    @jax.jit
    def f(b: rlt.DiscreteDqnInput):
        return jnp.sum(b.reward) + jnp.sum(b.action)

    assert float(f(batch)) == pytest.approx(4.0)
    assert batch.batch_size() == 2


def test_get_tiled_batch():
    fd = rlt.FeatureData(float_features=jnp.array([[1.0, 2.0], [3.0, 4.0]]))
    tiled = fd.get_tiled_batch(3)
    assert tiled.float_features.shape == (6, 2)
    np.testing.assert_allclose(np.asarray(tiled.float_features[:3]), [[1, 2]] * 3)


def test_doclist_select_slate():
    docs = rlt.DocList(
        float_features=jnp.arange(24.0).reshape(2, 4, 3),
        mask=jnp.ones((2, 4), dtype=bool),
        value=jnp.arange(8.0).reshape(2, 4),
    )
    action = jnp.array([[2, 0], [1, 3]])
    sel = docs.select_slate(action)
    assert sel.float_features.shape == (2, 2, 3)
    np.testing.assert_allclose(np.asarray(sel.float_features[0, 0]), [6.0, 7.0, 8.0])
    np.testing.assert_allclose(np.asarray(sel.value), [[2.0, 0.0], [5.0, 7.0]])


def test_id_list_feature_lengths():
    f = rlt.IdListFeature(
        ids=jnp.array([[1, 2, 0], [3, 0, 0]]),
        mask=jnp.array([[True, True, False], [True, False, False]]),
    )
    np.testing.assert_array_equal(np.asarray(f.lengths), [2, 1])


def test_registry_build_from_tagged_union():
    reg = Registry("test_role")

    @reg.register()
    @dataclasses.dataclass
    class Foo:
        x: int = 1
        y: float = 2.0

    built = reg.build({"Foo": {"x": 5}})
    assert built.x == 5 and built.y == 2.0
    assert isinstance(reg.build("Foo"), Foo)
    with pytest.raises(KeyError):
        reg.build({"Bar": {}})


def test_construct_from_config_nested():
    @dataclasses.dataclass
    class Inner:
        a: int = 0

    @dataclasses.dataclass
    class Outer:
        inner: Inner = dataclasses.field(default_factory=Inner)
        name: str = "x"

    o = construct_from_config(Outer, {"inner": {"a": 7}, "name": "hi"})
    assert o.inner.a == 7 and o.name == "hi"


def test_make_config_class():
    def train(lr: float, steps: int = 100, name: str = "run"):
        return lr, steps, name

    Cfg = config_class_for(train)
    c = Cfg(lr=0.1)
    assert c.steps == 100
    c2 = Cfg(lr=0.2, steps=5, name="z")
    assert train(**dataclasses.asdict(c2)) == (0.2, 5, "z")


def test_rl_parameters_hashable_static_arg():
    p = RLParameters(gamma=0.99, reward_boost={"a": 1.0})
    assert isinstance(hash(p), int)

    calls = []

    @jax.jit
    def f(x, params: RLParameters):
        calls.append(1)
        return x * params.gamma

    from functools import partial

    g = jax.jit(lambda x: x * p.gamma)
    assert float(g(jnp.float32(2.0))) == pytest.approx(1.98)


def test_normalization_parameters_coerce_lists():
    p = NormalizationParameters(feature_type="ENUM", possible_values=[1, 2, 3])
    assert p.possible_values == (1, 2, 3)
    assert isinstance(hash(p), int)


def test_extra_data_from_dict():
    ed = rlt.ExtraData.from_dict({"mdp_id": jnp.zeros(3), "junk": 1})
    assert ed.mdp_id is not None and ed.sequence_number is None
