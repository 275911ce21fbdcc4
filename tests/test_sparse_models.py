"""Sparse-feature models: SparseDQN builder + sparse-arch synthetic reward.

Reference: reagent/models/synthetic_reward_sparse_arch.py,
net_builder/discrete_dqn/fully_connected_with_embedding.py.
"""

import jax
import jax.numpy as jnp
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
