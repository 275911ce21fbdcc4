"""StateEmbedEnv: MDN-RNN hidden state as observation, fully inside jit.

Reference: reagent/gym/envs/pomdp/state_embed_env.py and its use in
reagent/gym/tests (world-model workflow: embed observations, then run DQN).
"""

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core import types as rlt
from reagent_tpu.gym.envs import CartPole
from reagent_tpu.gym.envs.state_embed import StateEmbedEnv
from reagent_tpu.models.mdn_rnn import MemoryNetwork


def _make_env(seq_len=4):
    inner = CartPole(max_steps=50)
    mn = MemoryNetwork(
        state_dim=4, action_dim=2, num_hiddens=8, num_hidden_layers=1, num_gaussians=2
    )
    params = mn.init(
        jax.random.PRNGKey(0),
        rlt.FeatureData(float_features=jnp.zeros((seq_len, 1, 4))),
        rlt.FeatureData(float_features=jnp.zeros((seq_len, 1, 2))),
    )
    return StateEmbedEnv(inner, mn, params, max_embed_seq_len=seq_len)


def test_obs_is_hidden_plus_raw():
    env = _make_env()
    assert env.observation_dim == 8 + 4
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert obs.shape == (12,)
    # raw obs rides in the tail
    np.testing.assert_allclose(obs[8:], state.cur_raw_obs)


def test_episode_runs_under_jit_and_history_matters():
    env = _make_env(seq_len=4)

    @jax.jit
    def rollout(rng):
        state, obs = env.reset(rng)

        def body(carry, rng_t):
            state, _ = carry
            a = jax.random.randint(rng_t, (), 0, 2)
            state, obs, r, d = env.step(state, a, rng_t)
            return (state, obs), (obs, r, d)

        (state, _), (all_obs, rewards, dones) = jax.lax.scan(
            body, (state, obs), jax.random.split(rng, 10)
        )
        return state, all_obs, rewards

    state, all_obs, rewards = rollout(jax.random.PRNGKey(2))
    assert all_obs.shape == (10, 12)
    assert np.isfinite(np.asarray(all_obs)).all()
    # history buffer saturates at seq_len and stays left-aligned
    assert int(state.hist_len) == 4
    # embeddings evolve with history (not a constant function of raw obs)
    embeds = np.asarray(all_obs[:, :8])
    assert np.std(embeds, axis=0).max() > 1e-6


def test_padding_is_causal():
    """Zero-padded tail must not change the embedding of a short history."""
    env = _make_env(seq_len=6)
    obs_h = jnp.zeros((6, 4)).at[0].set(jnp.ones(4))
    act_h = jnp.zeros((6, 2)).at[0].set(jnp.array([1.0, 0.0]))
    e1 = env._embed(obs_h, act_h, jnp.int32(1))
    # garbage in the padding region beyond hist_len
    obs_h2 = obs_h.at[3].set(99.0)
    act_h2 = act_h.at[3].set(-7.0)
    e2 = env._embed(obs_h2, act_h2, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-6)
