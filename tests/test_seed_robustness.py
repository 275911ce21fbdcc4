"""Seed-robustness sweep for the flagship reward bars (nightly marker).

BASELINE.md's north star says "DQN (CartPole) and SAC (Pendulum) learning
curves matched within seed variance"; the regular bar tests pin one PRNGKey.
This sweep runs each flagship bar across 3 seeds and asserts >= 2/3 pass —
evidence of seed robustness without making CI flaky on a single unlucky
stream.  Reference protocol: gym/tests/test_gym.py (single run, multi-episode
eval); bars from discrete_dqn_cartpole_online.yaml (100) and
sac_pendulum_online.yaml (-500).

Run with: pytest -m nightly tests/test_seed_robustness.py
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
    make_policy_network_batch,
)
from reagent_tpu.models import (
    FullyConnectedCritic,
    FullyConnectedDQN,
    GaussianFullyConnectedActor,
)
from reagent_tpu.replay import ReplayBuffer
from reagent_tpu.training import DQNTrainer, SACTrainer

SEEDS = (0, 1, 2)
MIN_PASSES = 2


def _dqn_cartpole_return(seed: int) -> float:
    env = CartPole(max_steps=200)
    q_net = FullyConnectedDQN(
        state_dim=4, action_dim=2, sizes=[128, 64],
        activations=["leaky_relu", "leaky_relu"],
    )
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.99, target_update_rate=0.2, maxq_learning=True),
        double_q_learning=True,
        optimizer={"Adam": {"lr": 0.01}},
    )
    rb = ReplayBuffer(replay_capacity=50000, update_horizon=1, gamma=0.99)
    ri, rf, rt, re = jax.random.split(jax.random.PRNGKey(seed), 4)
    ts = trainer.init(ri, jnp.zeros((1, 4)))
    rbs = rb.init(
        observation=jnp.zeros(4), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rbs = prefill_replay_buffer(env, rb, rbs, rf, num_steps=5000)
    sampler = SoftmaxActionSampler(temperature=1.0)

    def policy_act(tstate, obs, rng):
        scores = trainer.q_network.apply(tstate.q_params, obs[None])
        out = sampler.sample_action(scores, rng)
        idx = jnp.argmax(out.action[0]).astype(jnp.int32)
        return idx, idx

    ts, rbs, _ = run_online_training(
        env, trainer, ts, rb, rbs, policy_act,
        lambda d: make_discrete_dqn_batch(d, 2), rt,
        OnlineLoopConfig(num_steps=20000, train_every=1, train_after=0,
                         minibatch_size=256),
    )

    def greedy_act(tstate, obs, rng):
        scores = trainer.q_network.apply(tstate.q_params, obs[None])
        return jnp.argmax(scores[0]).astype(jnp.int32)

    returns = evaluate_policy(env, greedy_act, ts, re, num_episodes=20)
    return float(np.mean(np.asarray(returns)))


def _sac_pendulum_return(seed: int) -> float:
    env = Pendulum()
    actor = GaussianFullyConnectedActor(
        state_dim=3, action_dim=1, sizes=[64, 64], activations=["relu", "relu"]
    )
    q1 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[64, 64],
                              activations=["relu", "relu"])
    q2 = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[64, 64],
                              activations=["relu", "relu"])
    trainer = SACTrainer(
        actor, q1, q2,
        rl=RLParameters(gamma=0.99, target_update_rate=0.005),
        q_network_optimizer={"Adam": {"lr": 3e-3}},
        actor_network_optimizer={"Adam": {"lr": 3e-3}},
        entropy_temperature=0.2, target_entropy=-1.0,
    )
    rb = ReplayBuffer(replay_capacity=50000, update_horizon=1, gamma=0.99)
    ri, rf, rt, re = jax.random.split(jax.random.PRNGKey(seed), 4)
    ts = trainer.init(ri, jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    rbs = rb.init(
        observation=jnp.zeros(3), action=jnp.zeros(1),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rbs = prefill_replay_buffer(env, rb, rbs, rf, num_steps=1000)

    def policy_act(ts_, obs, rng):
        out = trainer.actor_network.apply(ts_.actor_params, obs[None], rng)
        return out.action[0] * 2.0, out.action[0]

    ts, rbs, _ = run_online_training(
        env, trainer, ts, rb, rbs, policy_act, make_policy_network_batch, rt,
        OnlineLoopConfig(num_steps=12000, minibatch_size=256),
    )

    def eval_act(ts_, obs, rng):
        out = trainer.actor_network.apply(ts_.actor_params, obs[None])
        return out.action[0] * 2.0

    returns = evaluate_policy(env, eval_act, ts, re, num_episodes=10)
    return float(np.mean(np.asarray(returns)))


@pytest.mark.nightly
@pytest.mark.slow
def test_dqn_cartpole_seed_sweep():
    scores = [_dqn_cartpole_return(s) for s in SEEDS]
    passes = sum(sc >= 100.0 for sc in scores)
    print(f"DQN CartPole seed sweep: {scores} -> {passes}/{len(SEEDS)} pass bar 100")
    assert passes >= MIN_PASSES, scores


@pytest.mark.nightly
@pytest.mark.slow
def test_sac_pendulum_seed_sweep():
    scores = [_sac_pendulum_return(s) for s in SEEDS]
    passes = sum(sc >= -500.0 for sc in scores)
    print(f"SAC Pendulum seed sweep: {scores} -> {passes}/{len(SEEDS)} pass bar -500")
    assert passes >= MIN_PASSES, scores


@pytest.mark.nightly
@pytest.mark.slow
def test_slateq_recsim_seed_sweep():
    """The flakiest absolute bar (RecSim 154) across 3 seeds, base variant."""
    from test_slateq_recsim import PASSING_SCORE_BAR, _train_and_eval

    scores = [
        _train_and_eval(
            {"rl": RLParameters(gamma=0.9, target_update_rate=0.1)},
            single_selection=True,
            seed=s,
        )
        for s in SEEDS
    ]
    passes = sum(sc >= PASSING_SCORE_BAR for sc in scores)
    print(
        f"SlateQ RecSim seed sweep: {scores} -> {passes}/{len(SEEDS)} "
        f"pass bar {PASSING_SCORE_BAR}"
    )
    assert passes >= MIN_PASSES, scores


@pytest.mark.nightly
@pytest.mark.slow
def test_cem_cartpole_seed_sweep():
    """CEM CartPole offline bar 100 across 3 data/training seeds."""
    from test_world_models import cem_cartpole_return

    scores = [cem_cartpole_return(s) for s in SEEDS]
    passes = sum(sc >= 100.0 for sc in scores)
    print(f"CEM CartPole seed sweep: {scores} -> {passes}/{len(SEEDS)} pass bar 100")
    assert passes >= MIN_PASSES, scores
