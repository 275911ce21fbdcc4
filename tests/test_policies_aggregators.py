"""Scorers, random policies, aggregators, imitator helpers.

Reference: reagent/gym/policies/scorers/, gym/policies/random_policies.py,
core/aggregators.py, training/imitator_training.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core import types as rlt
from reagent_tpu.core.aggregators import (
    ActionCountAggregator,
    FunctionsByActionAggregator,
    ListAggregator,
    RecentValuesAggregator,
)
from reagent_tpu.gym.envs import CartPole, Pendulum
from reagent_tpu.gym.policies import (
    ContinuousRandomPolicy,
    DiscreteRandomPolicy,
    MultiDiscreteRandomPolicy,
    discrete_dqn_scorer,
    make_random_policy_for_env,
    parametric_dqn_scorer,
    sac_scorer,
    slate_q_scorer,
)
from reagent_tpu.models import FullyConnectedCritic, FullyConnectedDQN
from reagent_tpu.models.actor import GaussianFullyConnectedActor
from reagent_tpu.training.imitator_training import get_valid_actions_from_imitator


def test_discrete_scorer_masks_and_qrdqn_mean():
    q = FullyConnectedDQN(state_dim=4, action_dim=3, sizes=[8], activations=["relu"])
    p = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    scorer = discrete_dqn_scorer(q)
    out = scorer(p, jnp.zeros((2, 4)), jnp.array([[1, 0, 1], [0, 1, 1]]))
    assert float(out[0, 1]) <= -1e8 and float(out[1, 0]) <= -1e8
    # 3-d head (quantiles) means over atoms
    fake = lambda: None
    fake.apply = lambda p, o: jnp.ones((o.shape[0], 3, 5))
    out = discrete_dqn_scorer(fake)(None, jnp.zeros((2, 4)))
    assert out.shape == (2, 3)


def test_parametric_sac_slate_scorers():
    rng = jax.random.PRNGKey(0)
    c = FullyConnectedCritic(state_dim=4, action_dim=3, sizes=[8], activations=["relu"])
    cp = c.init(rng, jnp.zeros((1, 4)), jnp.zeros((1, 3)))
    assert parametric_dqn_scorer(3, c)(cp, jnp.zeros((2, 4))).shape == (2, 3)

    actor = GaussianFullyConnectedActor(
        state_dim=4, action_dim=2, sizes=[8], activations=["relu"]
    )
    ap = actor.init(rng, jnp.zeros((1, 4)))
    s = sac_scorer(actor)(ap, jnp.zeros((3, 4)))
    assert s.loc.shape == (3, 2) and s.scale_log.shape == (3, 2)

    docs = rlt.DocList(float_features=jnp.ones((2, 3, 3)), value=jnp.ones((2, 3)))
    state = rlt.FeatureData(float_features=jnp.zeros((2, 4)), candidate_docs=docs)
    assert slate_q_scorer(3, c)(cp, state).shape == (2, 3)


def test_random_policies_dispatch_and_masking():
    rng = jax.random.PRNGKey(0)
    p = make_random_policy_for_env(CartPole())
    assert isinstance(p, DiscreteRandomPolicy)
    out = p.act(rng, jnp.zeros((8, 4)), possible_actions_mask=jnp.array([[1, 0]] * 8))
    assert (np.argmax(np.asarray(out.action), 1) == 0).all()
    p = make_random_policy_for_env(Pendulum())
    assert isinstance(p, ContinuousRandomPolicy)
    a = np.asarray(p.act(rng, jnp.zeros((100, 3))).action)
    assert a.min() >= -1.0 and a.max() <= 1.0
    out = MultiDiscreteRandomPolicy([2, 5]).act(rng, jnp.zeros((4, 1)))
    a = np.asarray(out.action)
    assert a.shape == (4, 2) and a[:, 0].max() < 2 and a[:, 1].max() < 5


def test_action_count_and_function_aggregators():
    agg = ActionCountAggregator("actions", ["A", "B"])
    agg("actions", [np.array([0, 0, 1]), np.array([1, 1, 1])])
    assert agg.values == {"A": [2], "B": [4]}
    assert agg.get_cumulative_distributions() == {"A": 2 / 6, "B": 4 / 6}

    fagg = FunctionsByActionAggregator(
        "q", ["A", "B"], {"mean": np.mean, "std": np.std}
    )
    fagg("q", [np.array([[1.0, 3.0], [3.0, 5.0]])])
    assert fagg.values["mean"]["A"] == [2.0]
    assert fagg.values["mean"]["B"] == [4.0]

    lagg = ListAggregator("loss")
    lagg("loss", [np.array([1.0, 2.0])])
    lagg.flush()
    assert lagg.epoch_values == [1.0, 2.0] and lagg.values == []

    ragg = RecentValuesAggregator("r", size=3)
    ragg("r", [np.arange(5.0)])
    assert list(ragg.values) == [2.0, 3.0, 4.0]


def test_imitator_valid_actions():
    # imitator strongly prefers action 0; with threshold 0.5 only near-argmax
    # actions survive
    logits = jnp.array([[4.0, 0.0, 3.9]])
    mask = get_valid_actions_from_imitator(lambda x: logits, jnp.zeros((1, 4)), 0.5)
    np.testing.assert_array_equal(np.asarray(mask), [[1.0, 0.0, 1.0]])
