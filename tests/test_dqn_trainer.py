"""DQN trainer math tests (mirrors reference test/training/test_dqn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.training import DQNTrainer
from reagent_tpu.training.rl_trainer_base import (
    get_max_q_values_with_target,
)


def _batch(B=8, obs=4, A=2, seed=0, terminal=False):
    rng = np.random.default_rng(seed)
    action_idx = rng.integers(0, A, B)
    return rlt.DiscreteDqnInput(
        state=rlt.FeatureData(float_features=jnp.asarray(rng.normal(size=(B, obs)), jnp.float32)),
        next_state=rlt.FeatureData(float_features=jnp.asarray(rng.normal(size=(B, obs)), jnp.float32)),
        action=jax.nn.one_hot(jnp.asarray(action_idx), A),
        next_action=jax.nn.one_hot(jnp.asarray(rng.integers(0, A, B)), A),
        reward=jnp.asarray(rng.normal(size=(B, 1)), jnp.float32),
        time_diff=jnp.ones((B, 1)),
        step=jnp.ones((B, 1), jnp.int32),
        not_terminal=jnp.zeros((B, 1)) if terminal else jnp.ones((B, 1)),
        possible_actions_mask=jnp.ones((B, A)),
        possible_next_actions_mask=jnp.ones((B, A)),
    )


def test_max_q_masking_and_double_q():
    q = jnp.array([[1.0, 5.0, 3.0]])
    q_t = jnp.array([[10.0, 20.0, 30.0]])
    mask = jnp.array([[1.0, 0.0, 1.0]])
    # single-Q: max of target among allowed = 30 (action 2)
    v, idx = get_max_q_values_with_target(q, q_t, mask, double_q_learning=False)
    assert float(v[0, 0]) == 30.0 and int(idx[0, 0]) == 2
    # double-Q: argmax online among allowed = action 2 (5.0 masked out), eval target = 30
    v, idx = get_max_q_values_with_target(q, q_t, mask, double_q_learning=True)
    assert float(v[0, 0]) == 30.0 and int(idx[0, 0]) == 2


def _make_trainer(**kwargs):
    q_net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    rl = kwargs.pop("rl", RLParameters(gamma=0.9, target_update_rate=0.5))
    return DQNTrainer(q_network=q_net, rl=rl, optimizer={"Adam": {"lr": 1e-2}}, **kwargs)


def test_train_step_reduces_td_loss():
    # terminal batch: TD target is exactly the reward -> supervised regression
    trainer = _make_trainer()
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = _batch(terminal=True)
    losses = []
    for _ in range(100):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["td_loss"]))
    assert losses[-1] < losses[0] * 0.5
    assert int(state.step) == 100


def test_target_network_lags_online():
    trainer = _make_trainer(rl=RLParameters(gamma=0.9, target_update_rate=0.1))
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = _batch()
    state2, _ = trainer.train_step(state, batch)
    # target moved toward online but not equal
    q_leaf = jax.tree_util.tree_leaves(state2.q_params)[0]
    t_leaf = jax.tree_util.tree_leaves(state2.q_target_params)[0]
    assert not np.allclose(np.asarray(q_leaf), np.asarray(t_leaf))


def test_sarsa_mode():
    trainer = _make_trainer(rl=RLParameters(gamma=0.9, maxq_learning=False))
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    state, metrics = trainer.train_step(state, _batch())
    assert np.isfinite(float(metrics["td_loss"]))


def test_cpe_heads_train():
    q_net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    reward_net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    cpe_net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.9),
        optimizer={"Adam": {"lr": 1e-2}},
        reward_network=reward_net,
        q_network_cpe=cpe_net,
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    batch = _batch()
    r_losses = []
    for _ in range(50):
        state, metrics = trainer.train_step(state, batch)
        r_losses.append(float(metrics["reward_loss"]))
    assert r_losses[-1] < r_losses[0] * 0.6


def test_known_mdp_converges_to_true_q():
    """Deterministic 2-state MDP: verify Q converges to analytic value.

    State A(obs=[1,0]) -action0-> terminal reward 1; -action1-> state B (r=0),
    B -any-> terminal reward 2.  gamma=0.5: Q(A,0)=1, Q(A,1)=0+0.5*2=1, Q(B,*)=2.
    """
    obs_A = [1.0, 0.0]
    obs_B = [0.0, 1.0]
    states, actions, rewards, next_states, terminals = [], [], [], [], []
    for _ in range(32):
        states += [obs_A, obs_A, obs_B]
        actions += [0, 1, 0]
        rewards += [1.0, 0.0, 2.0]
        next_states += [obs_A, obs_B, obs_A]  # next of terminal unused
        terminals += [1.0, 0.0, 1.0]
    B = len(states)
    batch = rlt.DiscreteDqnInput(
        state=rlt.FeatureData(float_features=jnp.asarray(states)),
        next_state=rlt.FeatureData(float_features=jnp.asarray(next_states)),
        action=jax.nn.one_hot(jnp.asarray(actions), 2),
        next_action=jax.nn.one_hot(jnp.zeros(B, jnp.int32), 2),
        reward=jnp.asarray(rewards)[:, None],
        time_diff=jnp.ones((B, 1)),
        step=jnp.ones((B, 1), jnp.int32),
        not_terminal=1.0 - jnp.asarray(terminals)[:, None],
        possible_actions_mask=jnp.ones((B, 2)),
        possible_next_actions_mask=jnp.ones((B, 2)),
    )
    q_net = FullyConnectedDQN(state_dim=2, action_dim=2, sizes=[32], activations=["relu"])
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.5, target_update_rate=1.0),
        optimizer={"Adam": {"lr": 5e-3}},
    )
    state = trainer.init(jax.random.PRNGKey(2), jnp.zeros((1, 2)))
    for _ in range(800):
        state, _ = trainer.train_step(state, batch)
    q_A = np.asarray(trainer.q_values(state, jnp.asarray([obs_A])))[0]
    q_B = np.asarray(trainer.q_values(state, jnp.asarray([obs_B])))[0]
    assert q_A[0] == pytest.approx(1.0, abs=0.1)
    assert q_A[1] == pytest.approx(1.0, abs=0.1)
    assert q_B[0] == pytest.approx(2.0, abs=0.15)
