"""World-model DQN on the string game, the reference's embedded-state pipeline.

Reference: reagent/gym/tests/test_world_model.py (train_mdnrnn_and_train_on_
embedded_env) + configs/world_model/discrete_dqn_string.yaml — bar 10.0:
1. collect random-policy trajectories on the StringGame POMDP,
2. fit the MDN-RNN world model on (obs, action) sequences,
3. wrap the env so observations become [rnn hidden ++ raw obs],
4. train DQN on the embedded env; greedy eval must reach the optimal
   return of 10 (two ABB windows in 6 steps: ABBABB).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import MDNRNNTrainerParameters, RLParameters
from reagent_tpu.gym.envs.extra import StringGame
from reagent_tpu.gym.envs.state_embed import StateEmbedEnv
from reagent_tpu.gym.online_loop import (
    OnlineLoopConfig,
    evaluate_policy,
    prefill_replay_buffer,
    run_online_training,
)
from reagent_tpu.gym.policies.samplers import SoftmaxActionSampler
from reagent_tpu.gym.preprocessors import make_discrete_dqn_batch
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.models.mdn_rnn import MemoryNetwork
from reagent_tpu.replay import ReplayBuffer
from reagent_tpu.training import DQNTrainer
from reagent_tpu.training.world_model import MDNRNNTrainer

T = 6  # string game episode length
HID = 16


def _collect_random_episodes(env, rng, num_episodes):
    """[T, B, ...] sequence batch from a uniform-random policy, fully jitted."""

    def one_episode(ep_rng):
        r0, rloop = jax.random.split(ep_rng)
        env_state, obs = env.reset(r0)

        def body(carry, _):
            env_state, obs, rng = carry
            rng, r_act, r_step = jax.random.split(rng, 3)
            action = jax.random.randint(r_act, (), 0, env.action_dim)
            env_state, next_obs, reward, done = env.step(env_state, action, r_step)
            out = (obs, jax.nn.one_hot(action, env.action_dim), next_obs, reward, done)
            return (env_state, next_obs, rng), out

        _, seq = jax.lax.scan(body, (env_state, obs, rloop), None, length=T)
        return seq  # each leaf [T, ...]

    seqs = jax.jit(jax.vmap(one_episode))(jax.random.split(rng, num_episodes))
    obs, act, next_obs, reward, done = seqs  # [B, T, ...]
    swap = lambda x: jnp.swapaxes(x, 0, 1)  # -> [T, B, ...]
    return rlt.MemoryNetworkInput(
        state=rlt.FeatureData(float_features=swap(obs)),
        next_state=rlt.FeatureData(float_features=swap(next_obs)),
        action=rlt.FeatureData(float_features=swap(act)),
        reward=swap(reward),
        time_diff=jnp.ones((T, num_episodes)),
        step=None,
        not_terminal=1.0 - swap(done).astype(jnp.float32),
        valid_step=jnp.full((num_episodes, 1), T, jnp.int32),
    )


@pytest.mark.slow
def test_world_model_dqn_string_game_reaches_bar():
    env = StringGame()

    # 1-2: world model on random trajectories
    mn = MemoryNetwork(
        state_dim=2, action_dim=2, num_hiddens=HID, num_hidden_layers=1, num_gaussians=1
    )
    wm_trainer = MDNRNNTrainer(mn, MDNRNNTrainerParameters(learning_rate=3e-3))
    batch = _collect_random_episodes(env, jax.random.PRNGKey(0), num_episodes=512)
    wm_state = wm_trainer.init(jax.random.PRNGKey(1), batch)
    first = last = None
    for i in range(300):
        wm_state, m = wm_trainer.train_step(wm_state, batch)
        if i == 0:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < first, f"world model did not learn: {first} -> {last}"

    # 3: embedded env — hidden state restores the Markov property
    embed_env = StateEmbedEnv(env, mn, wm_state.params, max_embed_seq_len=T)

    # 4: DQN on embedded observations
    q_net = FullyConnectedDQN(
        state_dim=embed_env.observation_dim, action_dim=2, sizes=[64, 32],
        activations=["leaky_relu", "leaky_relu"],
    )
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.99, target_update_rate=0.2),
        optimizer={"Adam": {"lr": 0.003}},
    )
    rb = ReplayBuffer(replay_capacity=20000, update_horizon=1, gamma=0.99)
    rng = jax.random.PRNGKey(2)
    ri, rf, rt, re = jax.random.split(rng, 4)
    ts = trainer.init(ri, jnp.zeros((1, embed_env.observation_dim)))
    rbs = rb.init(
        observation=jnp.zeros(embed_env.observation_dim), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rbs = prefill_replay_buffer(embed_env, rb, rbs, rf, num_steps=2000)
    sampler = SoftmaxActionSampler(temperature=0.5)

    def policy_act(ts, obs, rng):
        scores = trainer.q_network.apply(ts.q_params, obs[None])
        out = sampler.sample_action(scores, rng)
        idx = jnp.argmax(out.action[0]).astype(jnp.int32)
        return idx, idx

    ts, rbs, aux = run_online_training(
        embed_env, trainer, ts, rb, rbs, policy_act,
        lambda d: make_discrete_dqn_batch(d, 2), rt,
        OnlineLoopConfig(num_steps=6000, minibatch_size=256),
    )

    def greedy(ts, obs, rng):
        return jnp.argmax(trainer.q_network.apply(ts.q_params, obs[None])[0]).astype(
            jnp.int32
        )

    def eval_mean(ts):
        returns = evaluate_policy(embed_env, greedy, ts, re, num_episodes=20)
        return float(np.mean(np.asarray(returns)))

    # the bar IS the optimum (ABBABB = 10.0), so slack can only come from
    # training robustness: extend training up to twice if the greedy policy
    # has not locked onto the optimal string yet (seed-drift insurance)
    mean_r = eval_mean(ts)
    for extension in range(2):
        if mean_r >= 10.0:
            break
        ts, rbs, aux = run_online_training(
            embed_env, trainer, ts, rb, rbs, policy_act,
            lambda d: make_discrete_dqn_batch(d, 2),
            jax.random.fold_in(rt, extension + 1),
            OnlineLoopConfig(num_steps=3000, minibatch_size=256),
        )
        mean_r = eval_mean(ts)
    print(f"world-model DQN string game eval: {mean_r}")
    assert mean_r >= 10.0  # optimal: ABBABB
