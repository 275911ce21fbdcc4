"""Extra env sanity + learning tests (mirrors test_pomdp.py, test_linear_dynamics.py,
discrete_dqn_open_gridworld bar 0.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.gym.envs.extra import (
    ChangingArms,
    LinDyna,
    OpenGridworld,
    RecSimSlate,
    StringGame,
)
from reagent_tpu.gym.online_loop import (
    OnlineLoopConfig,
    evaluate_policy,
    prefill_replay_buffer,
    run_online_training,
)
from reagent_tpu.gym.policies.samplers import SoftmaxActionSampler
from reagent_tpu.gym.preprocessors import make_discrete_dqn_batch
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.replay import ReplayBuffer
from reagent_tpu.training import DQNTrainer


def _rollout(env, n=20, rng=jax.random.PRNGKey(0)):
    state, obs = env.reset(rng)
    total = 0.0
    for i in range(n):
        rng, r1, r2 = jax.random.split(rng, 3)
        if env.discrete:
            a = jax.random.randint(r1, (), 0, env.action_dim)
        else:
            a = jax.random.uniform(r1, (env.action_dim,), minval=-1.0, maxval=1.0)
        state, obs, rew, done = env.step(state, a, r2)
        total += float(rew)
        if bool(done):
            rng, r = jax.random.split(rng)
            state, obs = env.reset(r)
    return total


def test_lindyna_rollout():
    env = LinDyna()
    total = _rollout(env, 12)
    assert np.isfinite(total)
    assert total < 0  # quadratic cost is positive


def test_string_game_rewards():
    env = StringGame()
    state, obs = env.reset(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    # play A B B -> +5 on third step
    rewards = []
    for a in [0, 1, 1]:
        state, obs, r, done = env.step(state, jnp.asarray(a), rng)
        rewards.append(float(r))
    assert rewards == [0.0, 0.0, 5.0]
    # B B B -> -5
    state, _ = env.reset(jax.random.PRNGKey(0))
    for a in [1, 1, 1]:
        state, obs, r, done = env.step(state, jnp.asarray(a), rng)
    assert float(r) == -5.0
    # optimal sequence ABBABB nets +10
    state, _ = env.reset(jax.random.PRNGKey(0))
    total = 0.0
    for a in [0, 1, 1, 0, 1, 1]:
        state, obs, r, done = env.step(state, jnp.asarray(a), rng)
        total += float(r)
    assert total == 10.0
    assert bool(done)


def test_changing_arms():
    env = ChangingArms(num_arms=4)
    total = _rollout(env, 30)
    assert np.isfinite(total)


def test_recsim_slate_env():
    env = RecSimSlate(num_candidates=6, slate_size=2)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["doc_features"].shape == (6, 5)
    rng = jax.random.PRNGKey(1)
    total = 0.0
    for _ in range(10):
        rng, r = jax.random.split(rng)
        state, obs, reward, done = env.step(state, jnp.array([0, 1]), r)
        total += float(reward)
    assert np.isfinite(total)


@pytest.mark.slow
def test_dqn_open_gridworld_reaches_bar():
    """Mirrors discrete_dqn_open_gridworld.yaml (bar 0.9)."""
    env = OpenGridworld()
    q_net = FullyConnectedDQN(
        state_dim=env.observation_dim, action_dim=env.action_dim,
        sizes=[64], activations=["leaky_relu"],
    )
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.95, target_update_rate=0.2),
        optimizer={"Adam": {"lr": 0.005}},
    )
    rb = ReplayBuffer(replay_capacity=20000, update_horizon=1, gamma=0.95)
    rng = jax.random.PRNGKey(0)
    ri, rf, rt, re = jax.random.split(rng, 4)
    ts = trainer.init(ri, jnp.zeros((1, env.observation_dim)))
    rbs = rb.init(
        observation=jnp.zeros(env.observation_dim), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rbs = prefill_replay_buffer(env, rb, rbs, rf, num_steps=3000)
    sampler = SoftmaxActionSampler(temperature=0.5)

    def policy_act(ts, obs, rng):
        scores = trainer.q_network.apply(ts.q_params, obs[None])
        out = sampler.sample_action(scores, rng)
        idx = jnp.argmax(out.action[0]).astype(jnp.int32)
        return idx, idx

    ts, rbs, aux = run_online_training(
        env, trainer, ts, rb, rbs, policy_act,
        lambda d: make_discrete_dqn_batch(d, env.action_dim), rt,
        OnlineLoopConfig(num_steps=10000, minibatch_size=256),
    )

    def greedy(ts, obs, rng):
        return jnp.argmax(trainer.q_network.apply(ts.q_params, obs[None])[0]).astype(jnp.int32)

    returns = evaluate_policy(env, greedy, ts, re, num_episodes=20)
    mean_r = float(np.mean(np.asarray(returns)))
    print(f"gridworld mean eval: {mean_r}")
    assert mean_r >= 0.9


def test_string_game_v1_termination_values():
    """E[Q_B-first]=1.8 > E[Q_A-first]=1.25 (ref pomdp/string_game_v1.py:24-27)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reagent_tpu.gym.envs import build_env

    env = build_env({"StringGameV1": {}})

    def rollout(first_action, seed):
        rng = jax.random.PRNGKey(seed)
        st, obs = env.reset(rng)
        acts = [first_action, 0, 0]  # optimal continuation is A, A
        total, done, t = 0.0, False, 0
        while not done:
            rng, r = jax.random.split(rng)
            st, obs, rew, done = env.step(st, jnp.asarray(acts[t]), r)
            total += float(rew)
            done = bool(done)
            t += 1
        return total

    b_mean = np.mean([rollout(1, s) for s in range(400)])
    a_mean = np.mean([rollout(0, s + 1000) for s in range(400)])
    assert 1.4 < b_mean < 2.2, b_mean
    assert 0.9 < a_mean < 1.6, a_mean
    assert b_mean > a_mean


def test_env_union_build():
    from reagent_tpu.gym.envs import build_env

    env = build_env({"CartPole": {}})
    assert env.action_dim == 2


def test_offline_replay_buffer_dataset():
    import jax
    import jax.numpy as jnp

    from reagent_tpu.gym.datasets import OfflineReplayBufferDataset
    from reagent_tpu.replay.circular import ReplayBuffer

    rb = ReplayBuffer(replay_capacity=128, batch_size=16)
    state = rb.init(
        observation=jnp.zeros(4), action=jnp.int32(0), reward=jnp.float32(0),
        terminal=jnp.bool_(False),
    )
    for i in range(64):
        state = rb.add(
            state,
            observation=jnp.full((4,), i, jnp.float32),
            action=jnp.asarray(i % 2, jnp.int32),
            reward=jnp.asarray(1.0),
            terminal=jnp.asarray(i % 8 == 7),
        )
    ds = OfflineReplayBufferDataset(
        rb, state, batch_maker=lambda b: b, batch_size=16, num_batches=3
    )
    batches = list(ds)
    assert len(batches) == 3
    assert batches[0]["state"].shape[0] == 16
