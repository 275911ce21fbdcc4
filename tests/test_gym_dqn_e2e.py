"""End-to-end online DQN on pure-JAX CartPole.

Mirrors reference gym/tests/test_gym.py run_test_replay_buffer with the
discrete_dqn_cartpole_online.yaml recipe (passing_score_bar: 100).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.gym.envs import CartPole
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


@pytest.mark.slow
def test_dqn_cartpole_reaches_passing_score():
    env = CartPole(max_steps=200)  # v0 length, matches the reference config bar
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

    rng = jax.random.PRNGKey(0)
    r_init, r_fill, r_train, r_eval = jax.random.split(rng, 4)

    trainer_state = trainer.init(r_init, jnp.zeros((1, 4)))
    rb_state = rb.init(
        observation=jnp.zeros(4), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rb_state = prefill_replay_buffer(env, rb, rb_state, r_fill, num_steps=5000)

    sampler = SoftmaxActionSampler(temperature=1.0)

    def policy_act(tstate, obs, rng):
        scores = trainer.q_network.apply(tstate.q_params, obs[None])
        out = sampler.sample_action(scores, rng)
        idx = jnp.argmax(out.action[0]).astype(jnp.int32)
        return idx, idx

    trainer_state, rb_state, aux = run_online_training(
        env, trainer, trainer_state, rb, rb_state,
        policy_act, lambda d: make_discrete_dqn_batch(d, 2),
        r_train,
        OnlineLoopConfig(num_steps=20000, train_every=1, train_after=0, minibatch_size=256),
    )
    recent = np.asarray(aux["recent_episode_returns"])
    recent = recent[~np.isnan(recent)]
    assert int(aux["episodes_completed"]) > 10

    def greedy_act(tstate, obs, rng):
        scores = trainer.q_network.apply(tstate.q_params, obs[None])
        return jnp.argmax(scores[0]).astype(jnp.int32)

    returns = evaluate_policy(env, greedy_act, trainer_state, r_eval, num_episodes=20)
    mean_return = float(np.mean(np.asarray(returns)))
    print(f"mean eval return: {mean_return}; train-time recent: {recent.mean():.1f}")
    assert mean_return >= 100.0, f"mean eval return {mean_return} < passing bar 100"
