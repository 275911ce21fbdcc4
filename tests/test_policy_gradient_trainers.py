"""REINFORCE / PPO / parametric DQN / CRR trainer tests + e2e CartPole PG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.gym.envs import CartPole
from reagent_tpu.gym.episodic import make_episodic_trainer_step
from reagent_tpu.gym.online_loop import evaluate_policy
from reagent_tpu.gym.policies.samplers import SoftmaxActionSampler
from reagent_tpu.models import FullyConnectedCritic, FullyConnectedDQN
from reagent_tpu.training import (
    DiscreteCRRTrainer,
    ParametricDQNTrainer,
    PPOTrainer,
    ReinforceTrainer,
)
from reagent_tpu.training.utils import discounted_returns, masked_whiten


def test_discounted_returns():
    r = jnp.array([1.0, 2.0, 3.0])
    out = np.asarray(discounted_returns(r, 0.5))
    np.testing.assert_allclose(out, [1 + 1 + 0.75, 2 + 1.5, 3.0])
    np.testing.assert_allclose(np.asarray(discounted_returns(r, 0.0)), [1, 2, 3])


def test_masked_whiten_ignores_padding():
    x = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0])
    mask = jnp.array([1.0, 1.0, 1.0, 0.0, 0.0])
    w = np.asarray(masked_whiten(x, mask, subtract_mean=True))
    expected = (np.array([1.0, 2, 3]) - 2.0) / np.std([1, 2, 3], ddof=1)
    np.testing.assert_allclose(w[:3], expected, rtol=1e-5)


def _pg_episode(T=12, obs=4, A=2, seed=0):
    rng = np.random.default_rng(seed)
    actions = rng.integers(0, A, T)
    return rlt.PolicyGradientInput(
        state=rlt.FeatureData(float_features=jnp.asarray(rng.normal(size=(T, obs)), jnp.float32)),
        action=jax.nn.one_hot(jnp.asarray(actions), A),
        reward=jnp.asarray(rng.uniform(size=T), jnp.float32),
        log_prob=jnp.full((T,), -0.69, jnp.float32),
    )


def test_reinforce_step_runs():
    scorer = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = ReinforceTrainer(
        scorer=scorer, sampler=SoftmaxActionSampler(), gamma=0.99,
        optimizer={"Adam": {"lr": 1e-3}},
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    state, m = trainer.train_step(state, _pg_episode())
    assert np.isfinite(float(m["loss"]))


def test_reinforce_off_policy_is_weights():
    scorer = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = ReinforceTrainer(
        scorer=scorer, sampler=SoftmaxActionSampler(), gamma=0.99,
        off_policy=True, clip_param=2.0, optimizer={"Adam": {"lr": 1e-3}},
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    state, m = trainer.train_step(state, _pg_episode())
    # IS ratios are clamped at 2.0
    assert float(m["eligibility_mean"]) <= 2.0 + 1e-5


def test_ppo_ratio_clipping():
    scorer = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = PPOTrainer(
        scorer=scorer, sampler=SoftmaxActionSampler(),
        gamma=0.99, ppo_epsilon=0.2, optimizer={"Adam": {"lr": 1e-3}},
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    state, m = trainer.train_step(state, _pg_episode())
    assert np.isfinite(float(m["ppo_loss"]))


def _parametric_batch(B=16, obs=4, k=2, max_a=3, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.normal(size=s), jnp.float32)
    return rlt.ParametricDqnInput(
        state=rlt.FeatureData(float_features=mk((B, obs))),
        next_state=rlt.FeatureData(float_features=mk((B, obs))),
        action=rlt.FeatureData(float_features=mk((B, k))),
        next_action=rlt.FeatureData(float_features=mk((B, k))),
        possible_actions=rlt.FeatureData(float_features=mk((B * max_a, k))),
        possible_actions_mask=jnp.ones((B, max_a)),
        possible_next_actions=rlt.FeatureData(float_features=mk((B * max_a, k))),
        possible_next_actions_mask=jnp.ones((B, max_a)),
        reward=mk((B, 1)),
        time_diff=jnp.ones((B, 1)),
        step=jnp.ones((B, 1), jnp.int32),
        not_terminal=jnp.zeros((B, 1)),
    )


def test_parametric_dqn_converges_on_terminal_batch():
    q = FullyConnectedCritic(state_dim=4, action_dim=2, sizes=[32], activations=["relu"])
    trainer = ParametricDQNTrainer(
        q_network=q, rl=RLParameters(gamma=0.9, target_update_rate=0.5),
        optimizer={"Adam": {"lr": 3e-3}},
    )
    batch = _parametric_batch()
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)), jnp.zeros((1, 2)))
    losses = []
    for _ in range(150):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["td_loss"]))
    assert losses[-1] < losses[0] * 0.3


def test_crr_trainer():
    actor = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    q1 = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = DiscreteCRRTrainer(
        actor_network=actor, q1_network=q1,
        rl=RLParameters(gamma=0.9, target_update_rate=0.1),
        q_network_optimizer={"Adam": {"lr": 3e-3}},
        actor_network_optimizer={"Adam": {"lr": 3e-3}},
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    rng = np.random.default_rng(0)
    B = 16
    batch = rlt.DiscreteDqnInput(
        state=rlt.FeatureData(float_features=jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)),
        next_state=rlt.FeatureData(float_features=jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)),
        action=jax.nn.one_hot(jnp.asarray(rng.integers(0, 2, B)), 2),
        next_action=jax.nn.one_hot(jnp.asarray(rng.integers(0, 2, B)), 2),
        reward=jnp.asarray(rng.normal(size=(B, 1)), jnp.float32),
        time_diff=jnp.ones((B, 1)),
        step=jnp.ones((B, 1), jnp.int32),
        not_terminal=jnp.zeros((B, 1)),
        possible_actions_mask=jnp.ones((B, 2)),
        possible_next_actions_mask=jnp.ones((B, 2)),
    )
    losses = []
    for _ in range(100):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["q1_loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(float(m["actor_loss"]))


@pytest.mark.slow
def test_reinforce_cartpole_e2e():
    """Mirrors discrete_reinforce_cartpole_online.yaml (bar 180 on v0/200 steps)."""
    env = CartPole(max_steps=200)
    scorer = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[64, 64],
                               activations=["leaky_relu", "leaky_relu"])
    sampler = SoftmaxActionSampler(temperature=1.0)
    trainer = ReinforceTrainer(
        scorer=scorer, sampler=sampler, gamma=0.99,
        optimizer={"Adam": {"lr": 5e-3}}, normalize=True, subtract_mean=True,
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    step = make_episodic_trainer_step(env, scorer.apply, sampler, trainer, max_steps=200)
    rng = jax.random.PRNGKey(1)
    returns = []
    for i in range(300):
        rng, r = jax.random.split(rng)
        state, ep_ret, _ = step(state, r)
        returns.append(float(ep_ret))

    def greedy_act(ts, obs, rng):
        return jnp.argmax(scorer.apply(ts.policy_params, obs[None])[0]).astype(jnp.int32)

    evals = evaluate_policy(env, greedy_act, state, jax.random.PRNGKey(2), num_episodes=20)
    mean_eval = float(np.mean(np.asarray(evals)))
    print(f"REINFORCE cartpole eval: {mean_eval}, last-train {np.mean(returns[-20:]):.0f}")
    assert mean_eval >= 180.0


@pytest.mark.slow
def test_ppo_cartpole_e2e():
    """Mirrors discrete_ppo_cartpole_online.yaml (bar 180 on v0/200 steps)."""
    from reagent_tpu.training.ppo_trainer import PPOTrainer

    env = CartPole(max_steps=200)
    # reference hyperparams (discrete_ppo_cartpole_online.yaml): [32, 32]
    # leaky_relu net, Adam lr 1e-3 wd 1e-3, ppo_epsilon 0.2, 1 update epoch
    scorer = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[32, 32],
                               activations=["leaky_relu", "leaky_relu"])
    sampler = SoftmaxActionSampler(temperature=1.0)
    trainer = PPOTrainer(
        scorer=scorer, sampler=sampler, gamma=0.99,
        optimizer={"Adam": {"lr": 1e-3, "weight_decay": 1e-3}},
        ppo_epsilon=0.2, update_epochs=1, normalize=True, subtract_mean=True,
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    step = make_episodic_trainer_step(env, scorer.apply, sampler, trainer, max_steps=200)
    rng = jax.random.PRNGKey(1)
    returns = []
    for i in range(700):
        rng, r = jax.random.split(rng)
        state, ep_ret, _ = step(state, r)
        returns.append(float(ep_ret))

    def greedy_act(ts, obs, rng):
        return jnp.argmax(scorer.apply(ts.policy_params, obs[None])[0]).astype(jnp.int32)

    evals = evaluate_policy(env, greedy_act, state, jax.random.PRNGKey(2), num_episodes=20)
    mean_eval = float(np.mean(np.asarray(evals)))
    print(f"PPO cartpole eval: {mean_eval}, last-train {np.mean(returns[-20:]):.0f}")
    assert mean_eval >= 180.0
