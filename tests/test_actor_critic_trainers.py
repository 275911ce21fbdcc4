"""SAC / TD3 / C51 / QR-DQN trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.models import (
    CategoricalDQN,
    DuelingQNetwork,
    FullyConnectedActor,
    FullyConnectedCritic,
    GaussianFullyConnectedActor,
)
from reagent_tpu.training import C51Trainer, DQNTrainer, QRDQNTrainer, SACTrainer, TD3Trainer
from reagent_tpu.training.c51_trainer import categorical_projection


def _pn_batch(B=16, obs=3, act=1, seed=0, terminal=True):
    rng = np.random.default_rng(seed)
    mk = lambda shape: jnp.asarray(rng.normal(size=shape), jnp.float32)
    return rlt.PolicyNetworkInput(
        state=rlt.FeatureData(float_features=mk((B, obs))),
        next_state=rlt.FeatureData(float_features=mk((B, obs))),
        action=rlt.FeatureData(float_features=jnp.clip(mk((B, act)), -1, 1)),
        next_action=rlt.FeatureData(float_features=jnp.clip(mk((B, act)), -1, 1)),
        reward=mk((B, 1)),
        time_diff=jnp.ones((B, 1)),
        step=jnp.ones((B, 1), jnp.int32),
        not_terminal=jnp.zeros((B, 1)) if terminal else jnp.ones((B, 1)),
    )


def _dqn_batch(B=16, obs=4, A=2, seed=0):
    rng = np.random.default_rng(seed)
    return rlt.DiscreteDqnInput(
        state=rlt.FeatureData(float_features=jnp.asarray(rng.normal(size=(B, obs)), jnp.float32)),
        next_state=rlt.FeatureData(float_features=jnp.asarray(rng.normal(size=(B, obs)), jnp.float32)),
        action=jax.nn.one_hot(jnp.asarray(rng.integers(0, A, B)), A),
        next_action=jax.nn.one_hot(jnp.asarray(rng.integers(0, A, B)), A),
        reward=jnp.asarray(rng.normal(size=(B, 1)), jnp.float32),
        time_diff=jnp.ones((B, 1)),
        step=jnp.ones((B, 1), jnp.int32),
        not_terminal=jnp.zeros((B, 1)),
        possible_actions_mask=jnp.ones((B, A)),
        possible_next_actions_mask=jnp.ones((B, A)),
    )


def _sac_trainer(value_net=False):
    actor = GaussianFullyConnectedActor(state_dim=3, action_dim=1, sizes=[16], activations=["relu"])
    q1 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[16], activations=["relu"])
    q2 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[16], activations=["relu"])
    kwargs = {}
    if value_net:
        from reagent_tpu.models import ValueNetwork

        kwargs["value_network"] = ValueNetwork(state_dim=3, sizes=[16], activations=["relu"])
    return SACTrainer(
        actor_network=actor, q1_network=q1, q2_network=q2,
        rl=RLParameters(gamma=0.9, target_update_rate=0.1),
        q_network_optimizer={"Adam": {"lr": 3e-3}},
        actor_network_optimizer={"Adam": {"lr": 3e-3}},
        **kwargs,
    )


def test_sac_q_loss_decreases():
    trainer = _sac_trainer()
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    batch = _pn_batch(terminal=True)  # target = reward: regression
    losses = []
    for _ in range(100):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["q1_loss"]))
    assert losses[-1] < losses[0] * 0.5
    assert np.isfinite(float(m["actor_loss"]))
    assert float(m["entropy_temperature"]) > 0


def test_sac_with_value_network():
    trainer = _sac_trainer(value_net=True)
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    state, m = trainer.train_step(state, _pn_batch())
    assert np.isfinite(float(m["value_loss"]))


def test_sac_alpha_autotunes():
    trainer = _sac_trainer()
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    alpha0 = float(jnp.exp(state.log_alpha))
    for i in range(30):
        state, m = trainer.train_step(state, _pn_batch(seed=i))
    assert float(jnp.exp(state.log_alpha)) != pytest.approx(alpha0)


def test_td3_delayed_policy_update():
    actor = FullyConnectedActor(state_dim=3, action_dim=1, sizes=[16], activations=["relu"])
    q1 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[16], activations=["relu"])
    q2 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[16], activations=["relu"])
    trainer = TD3Trainer(
        actor_network=actor, q1_network=q1, q2_network=q2,
        rl=RLParameters(gamma=0.9, target_update_rate=0.1),
        q_network_optimizer={"Adam": {"lr": 3e-3}},
        actor_network_optimizer={"Adam": {"lr": 3e-3}},
        delayed_policy_update=2,
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    batch = _pn_batch()
    # step 0: actor updates (0 % 2 == 0); step 1: actor frozen
    state, m0 = trainer.train_step(state, batch)
    assert float(m0["actor_loss"]) != 0.0
    # copy before the next step: the trainer donates its state buffers
    actor_after_0 = np.asarray(jax.tree_util.tree_leaves(state.actor_params)[0]).copy()
    state, m1 = trainer.train_step(state, batch)
    assert float(m1["actor_loss"]) == 0.0
    actor_after_1 = np.asarray(jax.tree_util.tree_leaves(state.actor_params)[0])
    np.testing.assert_array_equal(actor_after_0, actor_after_1)
    # q loss decreases over time on terminal batch
    losses = []
    for _ in range(60):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["q1_loss"]))
    assert losses[-1] < losses[0]


def test_categorical_projection_identity():
    # identity case: target support == original support -> m == next_dist
    num_atoms = 5
    support = jnp.linspace(-2, 2, num_atoms)
    next_dist = jnp.array([[0.1, 0.2, 0.4, 0.2, 0.1]])
    target_q = jnp.broadcast_to(support, (1, num_atoms))
    m = categorical_projection(next_dist, target_q, -2.0, 2.0, num_atoms)
    np.testing.assert_allclose(np.asarray(m), np.asarray(next_dist), atol=1e-6)
    # mass conservation under shifted support
    m2 = categorical_projection(next_dist, target_q * 0.5 + 0.3, -2.0, 2.0, num_atoms)
    assert float(jnp.sum(m2)) == pytest.approx(1.0, abs=1e-5)


def test_c51_trainer_converges_on_terminal_batch():
    net = CategoricalDQN(
        state_dim=4, action_dim=2, num_atoms=21, qmin=-5, qmax=5,
        sizes=[32], activations=["relu"],
    )
    trainer = C51Trainer(
        q_network=net, rl=RLParameters(gamma=0.9, target_update_rate=0.5),
        optimizer={"Adam": {"lr": 3e-3}},
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = _dqn_batch()
    losses = []
    for _ in range(150):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["td_loss"]))
    assert losses[-1] < losses[0]
    # mean Q of taken actions approaches rewards on a terminal batch
    q = np.asarray(trainer.q_values(state, batch.state.float_features))
    q_taken = (q * np.asarray(batch.action)).sum(1)
    np.testing.assert_allclose(q_taken, np.asarray(batch.reward)[:, 0], atol=0.7)


def test_qrdqn_trainer_converges_on_terminal_batch():
    net = DuelingQNetwork(
        state_dim=4, action_dim=2, layers=[32], activations=["relu"], num_atoms=11
    )
    trainer = QRDQNTrainer(
        q_network=net, num_atoms=11,
        rl=RLParameters(gamma=0.9, target_update_rate=0.5),
        optimizer={"Adam": {"lr": 3e-3}},
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = _dqn_batch()
    losses = []
    for _ in range(150):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["td_loss"]))
    assert losses[-1] < losses[0]
    q = np.asarray(trainer.q_values(state, batch.state.float_features))
    q_taken = (q * np.asarray(batch.action)).sum(1)
    np.testing.assert_allclose(q_taken, np.asarray(batch.reward)[:, 0], atol=0.7)
