"""Model-parallel embedding sharding (2-D data x model mesh).

Verifies: (1) embedding tables are actually row-sharded across the ``model``
axis (per-device shard shape < full table), (2) a full SparseDQN train step
compiles and runs under the 2-D mesh, (3) the result matches the single-device
(unsharded) step bit-for-bit in f32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.models.embedding_bag import SparseDQN
from reagent_tpu.parallel import (
    embedding_specs,
    make_2d_mesh,
    make_model_parallel_train_step,
    shard_state,
)
from reagent_tpu.training import DQNTrainer

TABLE = 64
DIM = 8
B = 16


class _SparseQNet(nn.Module):
    """Flat obs [B, 4 dense + 5 ids] -> FeatureData(dense, id-list) -> SparseDQN.

    DQNTrainer feeds ``batch.state.float_features`` to the network, so the
    sparse ids ride in the trailing obs columns (same pattern as the
    changing-arms sparse test).
    """

    @nn.compact
    def __call__(self, obs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        dense, ids = obs[:, :4], obs[:, 4:].astype(jnp.int32)
        state = rlt.FeatureData(
            float_features=dense,
            id_list_features={
                "page": rlt.IdListFeature(ids=ids, mask=jnp.ones_like(ids, bool))
            },
        )
        return SparseDQN(
            state_dense_dim=4,
            action_dim=2,
            configs=(("page", TABLE, DIM),),
            overarch_dims=[32],
        )(state, training=training)


def _make_trainer():
    return DQNTrainer(
        q_network=_SparseQNet(),
        rl=RLParameters(gamma=0.99, target_update_rate=0.5),
        optimizer={"Adam": {"lr": 0.01}},
    )


def _proto_state(batch_size):
    rng = np.random.default_rng(0)
    dense = rng.normal(size=(batch_size, 4)).astype(np.float32)
    ids = rng.integers(0, TABLE, (batch_size, 5)).astype(np.float32)
    return rlt.FeatureData(
        float_features=jnp.asarray(np.concatenate([dense, ids], axis=1))
    )


def _make_batch(batch_size):
    rng = np.random.default_rng(1)
    act = jax.nn.one_hot(jnp.asarray(rng.integers(0, 2, batch_size)), 2)
    return rlt.DiscreteDqnInput(
        state=_proto_state(batch_size),
        next_state=_proto_state(batch_size),
        action=act,
        next_action=act,
        reward=jnp.asarray(rng.normal(size=(batch_size, 1)), jnp.float32),
        time_diff=jnp.ones((batch_size, 1)),
        step=jnp.ones((batch_size, 1), jnp.int32),
        not_terminal=jnp.ones((batch_size, 1)),
        possible_actions_mask=jnp.ones((batch_size, 2)),
        possible_next_actions_mask=jnp.ones((batch_size, 2)),
    )


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >=4 virtual devices")
def test_embedding_tables_row_sharded_and_step_matches_single_device():
    trainer = _make_trainer()
    init_state = trainer.init(jax.random.PRNGKey(0), _proto_state(1).float_features)
    batch = _make_batch(B)

    # single-device ground truth
    raw_step = getattr(type(trainer).train_step, "__wrapped__", type(trainer).train_step)
    ref_state, ref_metrics = jax.jit(lambda s, b: raw_step(trainer, s, b))(
        init_state, batch
    )

    mesh = make_2d_mesh(n_devices=4, data_parallel=2)
    state = shard_state(init_state, mesh)

    # the table must live row-sharded: each device holds TABLE/2 rows
    emb_leaves = [
        (path, leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(state)
        if any(getattr(k, "key", None) == "embedding" for k in path)
    ]
    assert emb_leaves, "no embedding leaves found in trainer state"
    for _, leaf in emb_leaves:
        if leaf.ndim >= 2:
            shard_shapes = {s.data.shape for s in leaf.addressable_shards}
            assert all(sh[0] == TABLE // 2 for sh in shard_shapes), shard_shapes

    from reagent_tpu.parallel import shard_batch

    step = make_model_parallel_train_step(trainer, mesh, donate_state=False)
    out_state, metrics = step(state, shard_batch(batch, mesh))
    jax.block_until_ready(metrics["td_loss"])

    assert np.isfinite(float(metrics["td_loss"]))
    np.testing.assert_allclose(
        float(metrics["td_loss"]), float(ref_metrics["td_loss"]), rtol=1e-5
    )
    # updated q params identical to the single-device update
    ref_leaves = jax.tree_util.tree_leaves(ref_state.q_params)
    out_leaves = jax.tree_util.tree_leaves(out_state.q_params)
    for a, b in zip(ref_leaves, out_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_embedding_specs_only_tables_sharded():
    trainer = _make_trainer()
    state = trainer.init(jax.random.PRNGKey(0), _proto_state(1).float_features)
    specs = embedding_specs(state)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded = [s for p, s in flat if s != jax.sharding.PartitionSpec()]
    assert sharded, "expected at least one sharded spec (q + target + adam mu/nu)"
    # every sharded spec is a row shard
    for s in sharded:
        assert s[0] == "model"
