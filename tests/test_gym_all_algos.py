"""Per-algorithm gym benchmark tests with the reference's passing-score bars.

Mirrors reagent/gym/tests/test_gym.py + configs/ (BASELINE.md):
  C51 CartPole >= 100, QR-DQN CartPole >= 100, parametric DQN CartPole >= 100,
  SAC Pendulum >= -500, TD3 Pendulum >= -750.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.gym.envs import CartPole, Pendulum
from reagent_tpu.gym.online_loop import (
    OnlineLoopConfig,
    evaluate_policy,
    prefill_replay_buffer,
    run_online_training,
)
from reagent_tpu.gym.policies.samplers import SoftmaxActionSampler
from reagent_tpu.gym.preprocessors import (
    make_discrete_dqn_batch,
    make_parametric_dqn_batch,
    make_policy_network_batch,
)
from reagent_tpu.models import (
    CategoricalDQN,
    DuelingQNetwork,
    FullyConnectedActor,
    FullyConnectedCritic,
    GaussianFullyConnectedActor,
)
from reagent_tpu.replay import ReplayBuffer
from reagent_tpu.training import (
    C51Trainer,
    ParametricDQNTrainer,
    QRDQNTrainer,
    SACTrainer,
    TD3Trainer,
)


def _run_discrete(env, trainer, q_value_fn, batch_maker, num_steps, prefill=3000,
                  minibatch=256, temperature=1.0, seed=0, init_protos=None):
    rb = ReplayBuffer(replay_capacity=50000, update_horizon=1, gamma=trainer.gamma)
    rng = jax.random.PRNGKey(seed)
    ri, rf, rt, re = jax.random.split(rng, 4)
    protos = init_protos or (jnp.zeros((1, env.observation_dim)),)
    ts = trainer.init(ri, *protos)
    rbs = rb.init(
        observation=jnp.zeros(env.observation_dim), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rbs = prefill_replay_buffer(env, rb, rbs, rf, num_steps=prefill)
    sampler = SoftmaxActionSampler(temperature=temperature)

    def policy_act(ts, obs, rng):
        scores = q_value_fn(ts, obs[None])
        out = sampler.sample_action(scores, rng)
        idx = jnp.argmax(out.action[0]).astype(jnp.int32)
        return idx, idx

    ts, rbs, aux = run_online_training(
        env, trainer, ts, rb, rbs, policy_act, batch_maker, rt,
        OnlineLoopConfig(num_steps=num_steps, minibatch_size=minibatch),
    )

    def greedy(ts, obs, rng):
        return jnp.argmax(q_value_fn(ts, obs[None])[0]).astype(jnp.int32)

    returns = evaluate_policy(env, greedy, ts, re, num_episodes=20)
    return float(np.mean(np.asarray(returns)))


@pytest.mark.slow
def test_c51_cartpole():
    """discrete_c51_cartpole_online.yaml: bar 100."""
    env = CartPole(max_steps=200)
    net = CategoricalDQN(
        state_dim=4, action_dim=2, num_atoms=51, qmin=0, qmax=200,
        sizes=[128, 64], activations=["leaky_relu", "leaky_relu"],
    )
    trainer = C51Trainer(
        q_network=net,
        rl=RLParameters(gamma=0.99, target_update_rate=0.2),
        optimizer={"Adam": {"lr": 0.003}},
    )
    mean_r = _run_discrete(
        env, trainer, trainer.q_values, lambda d: make_discrete_dqn_batch(d, 2),
        num_steps=15000,
    )
    print(f"C51 cartpole eval: {mean_r}")
    assert mean_r >= 100.0


@pytest.mark.slow
def test_qrdqn_cartpole():
    """discrete_qr_cartpole_online.yaml: bar 100."""
    env = CartPole(max_steps=200)
    net = DuelingQNetwork(
        state_dim=4, action_dim=2, layers=[64, 64],
        activations=["leaky_relu", "leaky_relu"], num_atoms=11,
    )
    trainer = QRDQNTrainer(
        q_network=net, num_atoms=11,
        rl=RLParameters(gamma=0.9, target_update_rate=0.05),
        optimizer={"Adam": {"lr": 0.001, "amsgrad": True}},
    )
    # reference config collects 20k random steps before training starts
    # (discrete_qr_cartpole_online.yaml: train_after_ts: 20000)
    mean_r = _run_discrete(
        env, trainer, trainer.q_values, lambda d: make_discrete_dqn_batch(d, 2),
        num_steps=30000, minibatch=512, prefill=20000,
    )
    print(f"QR-DQN cartpole eval: {mean_r}")
    assert mean_r >= 100.0


@pytest.mark.slow
def test_parametric_dqn_cartpole():
    """parametric_dqn_cartpole_online.yaml: bar 100."""
    env = CartPole(max_steps=200)
    q_net = FullyConnectedCritic(
        state_dim=4, action_dim=2, sizes=[128, 64],
        activations=["leaky_relu", "leaky_relu"],
    )
    trainer = ParametricDQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.99, target_update_rate=0.1),
        optimizer={"Adam": {"lr": 0.001, "amsgrad": True}},
    )

    def q_values(ts, obs):
        B = obs.shape[0]
        eye = jnp.eye(2)
        tiled_obs = jnp.repeat(obs, 2, axis=0)
        q = trainer.q_network.apply(ts.q_params, tiled_obs, jnp.tile(eye, (B, 1)))
        return q.reshape(B, 2)

    mean_r = _run_discrete(
        env, trainer, q_values, lambda d: make_parametric_dqn_batch(d, 2),
        num_steps=20000, minibatch=512, prefill=10000,
        init_protos=(jnp.zeros((1, 4)), jnp.zeros((1, 2))),
    )
    print(f"parametric DQN cartpole eval: {mean_r}")
    assert mean_r >= 100.0


def _run_continuous(env, trainer, actor_apply, num_steps, action_scale, seed=0,
                    minibatch=256, prefill=1000):
    rb = ReplayBuffer(replay_capacity=50000, update_horizon=1, gamma=trainer.gamma)
    rng = jax.random.PRNGKey(seed)
    ri, rf, rt, re = jax.random.split(rng, 4)
    ts = trainer.init(ri, jnp.zeros((1, env.observation_dim)), jnp.zeros((1, env.action_dim)))
    rbs = rb.init(
        observation=jnp.zeros(env.observation_dim),
        action=jnp.zeros(env.action_dim),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rbs = prefill_replay_buffer(env, rb, rbs, rf, num_steps=prefill)

    ts, rbs, aux = run_online_training(
        env, trainer, ts, rb, rbs, actor_apply, make_policy_network_batch, rt,
        OnlineLoopConfig(num_steps=num_steps, minibatch_size=minibatch),
    )

    def eval_act(ts, obs, rng):
        out = trainer.actor_network.apply(ts.actor_params, obs[None])
        return out.action[0] * action_scale

    returns = evaluate_policy(env, eval_act, ts, re, num_episodes=10)
    return float(np.mean(np.asarray(returns)))


@pytest.mark.slow
def test_sac_pendulum():
    """sac_pendulum_online.yaml: bar -500."""
    env = Pendulum()
    actor = GaussianFullyConnectedActor(
        state_dim=3, action_dim=1, sizes=[64, 64], activations=["relu", "relu"]
    )
    q1 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[64, 64], activations=["relu", "relu"])
    q2 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[64, 64], activations=["relu", "relu"])
    trainer = SACTrainer(
        actor, q1, q2,
        rl=RLParameters(gamma=0.99, target_update_rate=0.005),
        q_network_optimizer={"Adam": {"lr": 3e-3}},
        actor_network_optimizer={"Adam": {"lr": 3e-3}},
        entropy_temperature=0.2, target_entropy=-1.0,
    )

    def policy_act(ts, obs, rng):
        out = trainer.actor_network.apply(ts.actor_params, obs[None], rng)
        return out.action[0] * 2.0, out.action[0]

    mean_r = _run_continuous(env, trainer, policy_act, num_steps=12000, action_scale=2.0)
    print(f"SAC pendulum eval: {mean_r}")
    assert mean_r >= -500.0


@pytest.mark.slow
def test_td3_pendulum():
    """td3_pendulum_online.yaml: bar -750."""
    env = Pendulum()
    actor = FullyConnectedActor(
        state_dim=3, action_dim=1, sizes=[64, 64], activations=["relu", "relu"],
        exploration_variance=0.2,
    )
    q1 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[64, 64], activations=["relu", "relu"])
    q2 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[64, 64], activations=["relu", "relu"])
    trainer = TD3Trainer(
        actor, q1, q2,
        rl=RLParameters(gamma=0.99, target_update_rate=0.005),
        q_network_optimizer={"Adam": {"lr": 3e-3}},
        actor_network_optimizer={"Adam": {"lr": 3e-3}},
    )

    def policy_act(ts, obs, rng):
        out = trainer.actor_network.apply(ts.actor_params, obs[None], rng)
        return out.action[0] * 2.0, out.action[0]

    mean_r = _run_continuous(env, trainer, policy_act, num_steps=12000, action_scale=2.0)
    print(f"TD3 pendulum eval: {mean_r}")
    assert mean_r >= -750.0


@pytest.mark.slow
def test_continuous_crr_pendulum():
    """continuous_crr_pendulum_online.yaml: SAC trainer + CRR weight fn, bar -500."""
    from reagent_tpu.models import ValueNetwork
    from reagent_tpu.training.sac_trainer import CRRWeightFn

    env = Pendulum()
    actor = GaussianFullyConnectedActor(
        state_dim=3, action_dim=1, sizes=[64, 64], activations=["leaky_relu", "leaky_relu"]
    )
    q1 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[64, 64], activations=["leaky_relu", "leaky_relu"])
    value = ValueNetwork(state_dim=3, sizes=[64, 64], activations=["leaky_relu", "leaky_relu"])
    trainer = SACTrainer(
        actor, q1, value_network=value,
        rl=RLParameters(gamma=0.99, target_update_rate=0.005),
        q_network_optimizer={"Adam": {"lr": 3e-3}},
        actor_network_optimizer={"Adam": {"lr": 3e-3}},
        value_network_optimizer={"Adam": {"lr": 3e-3}},
        entropy_temperature=0.3,
        crr_config=CRRWeightFn(exponent_beta=1.0, exponent_clamp=20.0),
    )

    def policy_act(ts, obs, rng):
        out = trainer.actor_network.apply(ts.actor_params, obs[None], rng)
        return out.action[0] * 2.0, out.action[0]

    # reference: 10k random prefill (train_after_ts), then 40 eps x 200 steps
    mean_r = _run_continuous(env, trainer, policy_act, num_steps=8000,
                             action_scale=2.0, prefill=10000)
    print(f"continuous CRR pendulum eval: {mean_r}")
    assert mean_r >= -500.0


@pytest.mark.slow
def test_parametric_sarsa_cartpole():
    """parametric_sarsa_cartpole_online.yaml: on-policy targets, bar 100."""
    env = CartPole(max_steps=200)
    q_net = FullyConnectedCritic(
        state_dim=4, action_dim=2, sizes=[128, 64],
        activations=["leaky_relu", "leaky_relu"],
    )
    trainer = ParametricDQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.99, target_update_rate=0.1, maxq_learning=False),
        optimizer={"Adam": {"lr": 0.001, "amsgrad": True}},
    )

    def q_values(ts, obs):
        B = obs.shape[0]
        eye = jnp.eye(2)
        tiled_obs = jnp.repeat(obs, 2, axis=0)
        q = trainer.q_network.apply(ts.q_params, tiled_obs, jnp.tile(eye, (B, 1)))
        return q.reshape(B, 2)

    mean_r = _run_discrete(
        env, trainer, q_values, lambda d: make_parametric_dqn_batch(d, 2),
        num_steps=20000, minibatch=512, prefill=10000,
        init_protos=(jnp.zeros((1, 4)), jnp.zeros((1, 2))),
    )
    print(f"parametric SARSA cartpole eval: {mean_r}")
    assert mean_r >= 100.0


@pytest.mark.slow
def test_discrete_crr_cartpole():
    """discrete_crr_cartpole_online.yaml: bar 100 (online CRR, actor greedy eval)."""
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.training import DiscreteCRRTrainer

    env = CartPole(max_steps=200)
    actor = FullyConnectedDQN(
        state_dim=4, action_dim=2, sizes=[128, 64],
        activations=["leaky_relu", "leaky_relu"],
    )
    q1 = FullyConnectedDQN(
        state_dim=4, action_dim=2, sizes=[128, 64],
        activations=["leaky_relu", "leaky_relu"],
    )
    trainer = DiscreteCRRTrainer(
        actor_network=actor,
        q1_network=q1,
        rl=RLParameters(gamma=0.99, target_update_rate=0.2),
        q_network_optimizer={"Adam": {"lr": 0.003}},
        actor_network_optimizer={"Adam": {"lr": 0.003}},
        beta=1.0,
    )

    def actor_scores(ts, obs):
        return trainer.actor_network.apply(ts.actor_params, obs)

    mean_r = _run_discrete(
        env, trainer, actor_scores, lambda d: make_discrete_dqn_batch(d, 2),
        num_steps=15000,
    )
    print(f"discrete CRR cartpole eval: {mean_r}")
    assert mean_r >= 100.0
