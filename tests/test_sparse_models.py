"""Sparse-feature models: SparseDQN builder + sparse-arch synthetic reward.

Reference: reagent/models/synthetic_reward_sparse_arch.py,
net_builder/discrete_dqn/fully_connected_with_embedding.py.
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

import reagent_tpu.net_builder.discrete_dqn  # noqa: F401 (registry population)
import reagent_tpu.net_builder.synthetic_reward  # noqa: F401
from reagent_tpu.core import types as rlt


def _id_list(rng, T, B, L, vocab):
    ids = jax.random.randint(rng, (T, B, L), 0, vocab)
    mask = jax.random.bernoulli(rng, 0.7, (T, B, L))
    # ensure at least one valid id per row
    mask = mask.at[..., 0].set(True)
    return rlt.IdListFeature(ids=ids.astype(jnp.int32), mask=mask)


def test_fully_connected_with_embedding_builder():
    from reagent_tpu.core.registry import DISCRETE_DQN_NET_BUILDERS

    builder = DISCRETE_DQN_NET_BUILDERS.build(
        {
            "FullyConnectedWithEmbedding": {
                "sizes": [32, 16],
                "activations": ["relu", "relu"],
                "embedding_configs": [["page", 100, 8], ["item", 50, 4]],
            }
        }
    )
    net = builder.build_q_network(None, output_dim=3, state_dim=5)
    B = 4
    state = rlt.FeatureData(
        float_features=jnp.ones((B, 5)),
        id_list_features={
            "page": rlt.IdListFeature(
                ids=jnp.zeros((B, 6), jnp.int32), mask=jnp.ones((B, 6), bool)
            ),
            "item": rlt.IdListFeature(
                ids=jnp.ones((B, 3), jnp.int32), mask=jnp.ones((B, 3), bool)
            ),
        },
    )
    params = net.init(jax.random.PRNGKey(0), state)
    q = net.apply(params, state)
    assert q.shape == (B, 3)
    assert np.isfinite(np.asarray(q)).all()


def test_sparse_arch_synthetic_reward_shapes_and_mask():
    from reagent_tpu.models import SparseArchSyntheticRewardNet, SyntheticRewardSparseArchNet

    T, B, Ds, Da, F = 5, 3, 4, 2, 16
    rng = jax.random.PRNGKey(1)
    net = SyntheticRewardSparseArchNet(
        net=SparseArchSyntheticRewardNet(
            state_dim=Ds, action_dim=Da,
            dense_sizes=[32, F], dense_activations=["relu", "relu"],
            overall_sizes=[24], overall_activations=["relu"],
            embedding_configs=(("page", 64, F),),
        )
    )
    batch = rlt.MemoryNetworkInput(
        state=rlt.FeatureData(
            float_features=jnp.ones((T, B, Ds)),
            id_list_features={"page": _id_list(rng, T, B, 4, 64)},
        ),
        action=rlt.FeatureData(float_features=jnp.ones((T, B, Da))),
        next_state=rlt.FeatureData(float_features=jnp.zeros((T, B, Ds))),
        reward=jnp.ones((T, B)),
        time_diff=jnp.ones((T, B)),
        not_terminal=jnp.ones((T, B)),
        step=None,
        valid_step=jnp.asarray([[5], [3], [1]], jnp.int32),
    )
    params = net.init(jax.random.PRNGKey(0), batch)
    out = net.apply(params, batch)
    assert out.predicted_reward.shape == (B, 1)
    assert out.output.shape == (B, T)
    # per-step rewards are sigmoid-bounded
    assert (np.asarray(out.output) >= 0).all() and (np.asarray(out.output) <= 1).all()
    # mask keeps only the LAST valid_step positions
    np.testing.assert_array_equal(
        np.asarray(out.mask),
        np.array([[1, 1, 1, 1, 1], [0, 0, 1, 1, 1], [0, 0, 0, 0, 1]], np.float32),
    )
    # predicted = masked sum
    np.testing.assert_allclose(
        np.asarray(out.predicted_reward[:, 0]),
        np.asarray(jnp.sum(out.output * out.mask, axis=1)), rtol=1e-5,
    )


def test_sparse_arch_trains_with_reward_net_trainer():
    """The sparse-arch net plugs into the synthetic-reward training path."""
    from reagent_tpu.core.registry import SYNTHETIC_REWARD_NET_BUILDERS

    builder = SYNTHETIC_REWARD_NET_BUILDERS.build(
        {
            "SparseArchSyntheticReward": {
                "dense_sizes": [16, 8],
                "dense_activations": ["relu", "relu"],
                "overall_sizes": [16],
                "overall_activations": ["relu"],
                "embedding_configs": [["page", 32, 8]],
            }
        }
    )
    net = builder.build_synthetic_reward_network(state_dim=4, action_dim=2)
    T, B = 4, 6
    rng = jax.random.PRNGKey(2)
    batch = rlt.MemoryNetworkInput(
        state=rlt.FeatureData(
            float_features=jax.random.normal(rng, (T, B, 4)),
            id_list_features={"page": _id_list(rng, T, B, 3, 32)},
        ),
        action=rlt.FeatureData(float_features=jax.random.normal(rng, (T, B, 2))),
        next_state=rlt.FeatureData(float_features=jnp.zeros((T, B, 4))),
        reward=jnp.ones((T, B)),
        time_diff=jnp.ones((T, B)),
        not_terminal=jnp.ones((T, B)),
        step=None,
        valid_step=jnp.full((B, 1), T, jnp.int32),
    )
    target = jnp.full((B, 1), 2.0)
    params = net.init(jax.random.PRNGKey(0), batch)

    import optax

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = net.apply(p, batch)
            return jnp.mean((out.predicted_reward - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses[::20]


@pytest.mark.slow
def test_dqn_changing_arms_sparse_reaches_bar():
    """Sparse changing-arms DQN bar (reference
    gym/tests/configs/sparse/discrete_dqn_changing_arms_online.yaml: 400).

    The obs is re-expressed as dense mus/changes + an ID-list of currently
    legal arms feeding a SparseDQN (embedding-bag + FC), mirroring the
    reference's FullyConnectedWithEmbedding setup on this env."""
    from flax import linen as nn

    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.gym.envs import ChangingArms
    from reagent_tpu.gym.online_loop import (
        OnlineLoopConfig,
        evaluate_policy,
        prefill_replay_buffer,
        run_online_training,
    )
    from reagent_tpu.gym.preprocessors import make_discrete_dqn_batch
    from reagent_tpu.models.embedding_bag import SparseDQN
    from reagent_tpu.replay import ReplayBuffer
    from reagent_tpu.training import DQNTrainer

    K = 5
    env = ChangingArms(num_arms=K, max_steps=200)
    A, S = env.action_dim, env.observation_dim

    class ArmsSparseQNet(nn.Module):
        """obs [B, 3K] -> FeatureData(dense mus+changes, id-list legal) -> Q."""

        @nn.compact
        def __call__(self, obs):
            mus, legal, changes = obs[:, :K], obs[:, K : 2 * K], obs[:, 2 * K :]
            ids = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :], (obs.shape[0], 1))
            state = rlt.FeatureData(
                float_features=jnp.concatenate([mus, changes], axis=1),
                id_list_features={
                    "legal": rlt.IdListFeature(ids=ids, mask=legal > 0.5)
                },
            )
            return SparseDQN(
                state_dense_dim=2 * K, action_dim=A,
                configs=(("legal", K + 1, 8),), overarch_dims=[64],
                activation="leaky_relu",
            )(state)

    q_net = ArmsSparseQNet()
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.5, target_update_rate=0.2, maxq_learning=True),
        double_q_learning=True,
        optimizer={"Adam": {"lr": 0.003}},
    )

    def mask_of(obs_batch):
        legal = obs_batch[..., K : 2 * K] > 0.5
        always_pass = jnp.ones(obs_batch.shape[:-1] + (1,), bool)
        return jnp.concatenate([legal, always_pass], axis=-1).astype(jnp.float32)

    def batch_maker(d):
        b = make_discrete_dqn_batch(d, A)
        return b.replace(
            possible_actions_mask=mask_of(b.state.float_features),
            possible_next_actions_mask=mask_of(b.next_state.float_features),
        )

    def policy_act(ts, obs, rng):
        q = q_net.apply(ts.q_params, obs[None])[0]
        mask = mask_of(obs[None])[0]
        logits = jnp.where(mask > 0, q / 2.0, -1e9)
        a = jax.random.categorical(rng, logits).astype(jnp.int32)
        return a, a

    rng = jax.random.PRNGKey(0)
    ri, rt, re = jax.random.split(rng, 3)
    ts = trainer.init(ri, jnp.zeros((1, S)))
    rb = ReplayBuffer(replay_capacity=50000, update_horizon=1, gamma=0.5)
    rbs = rb.init(observation=jnp.zeros(S), action=jnp.int32(0),
                  reward=jnp.float32(0), terminal=jnp.bool_(False))

    # masked-random prefill so illegal pulls never poison the buffer
    def random_masked_act(ts, obs, rng):
        mask = mask_of(obs[None])[0]
        a = jax.random.categorical(rng, jnp.where(mask > 0, 0.0, -1e9))
        return a.astype(jnp.int32), a.astype(jnp.int32)

    rbs = prefill_replay_buffer(env, rb, rbs, ri, num_steps=2000,
                                act_fn=random_masked_act)
    ts, rbs, aux = run_online_training(
        env, trainer, ts, rb, rbs, policy_act, batch_maker, rt,
        OnlineLoopConfig(num_steps=15000, minibatch_size=256),
    )

    def greedy(ts, obs, rng):
        q = q_net.apply(ts.q_params, obs[None])[0]
        mask = mask_of(obs[None])[0]
        return jnp.argmax(jnp.where(mask > 0, q, -1e9)).astype(jnp.int32)

    returns = evaluate_policy(env, greedy, ts, re, num_episodes=10)
    mean_r = float(np.mean(np.asarray(returns)))
    print(f"changing-arms sparse DQN eval: {mean_r}")
    assert mean_r >= 400.0
