"""Data-parallel learner on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.parallel import (
    make_data_parallel_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from reagent_tpu.training import DQNTrainer


def _batch(B):
    rng = np.random.default_rng(0)
    return rlt.DiscreteDqnInput(
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


def test_eight_device_mesh_available():
    assert jax.device_count() == 8


def test_dp_step_matches_single_device():
    q_net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = DQNTrainer(
        q_network=q_net, rl=RLParameters(gamma=0.9), optimizer={"SGD": {"lr": 0.1}}
    )
    batch = _batch(64)

    # single-device reference
    s1 = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    s1, m1 = trainer.train_step(s1, batch)

    # 8-way data parallel
    mesh = make_mesh(8)
    s8 = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    s8 = replicate(s8, mesh)
    sharded_batch = shard_batch(batch, mesh)
    dp_step = make_data_parallel_train_step(trainer, mesh)
    s8, m8 = dp_step(s8, sharded_batch)

    assert np.allclose(float(m1["td_loss"]), float(m8["td_loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.q_params), jax.tree_util.tree_leaves(s8.q_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_host_shard_batch_single_process():
    """Single-process host_shard_batch == shard_batch (device-array path)."""
    import numpy as np

    from reagent_tpu.parallel import host_shard_batch, make_mesh

    mesh = make_mesh(n_devices=8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    out = host_shard_batch(batch, mesh)
    assert out["x"].shape == (16, 2)
    assert len(out["x"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_measure_scaling_efficiency_runs():
    """Weak-scaling sweep over the virtual 8-device mesh: structure + sanity
    (true ICI efficiency is only meaningful on real chips)."""
    import jax
    import jax.numpy as jnp

    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.parallel import measure_scaling_efficiency
    from reagent_tpu.training import DQNTrainer

    q_net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[32], activations=["relu"])
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.99, target_update_rate=0.1),
        optimizer={"Adam": {"lr": 0.001}},
    )
    ts = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def batch_for(n):
        from reagent_tpu.core import types as rlt

        B = 32 * n
        return rlt.DiscreteDqnInput(
            state=rlt.FeatureData(float_features=jnp.ones((B, 4))),
            next_state=rlt.FeatureData(float_features=jnp.ones((B, 4))),
            action=jax.nn.one_hot(jnp.zeros(B, jnp.int32), 2),
            next_action=jax.nn.one_hot(jnp.zeros(B, jnp.int32), 2),
            reward=jnp.ones((B, 1)),
            not_terminal=jnp.ones((B, 1)),
            step=None,
            time_diff=jnp.ones((B, 1)),
            possible_actions_mask=jnp.ones((B, 2)),
            possible_next_actions_mask=jnp.ones((B, 2)),
            extras=rlt.ExtraData(),
        )

    res = measure_scaling_efficiency(
        trainer, ts, batch_for, device_counts=[1, 8], num_steps=5
    )
    assert set(res) == {1, 8}
    for n, row in res.items():
        assert row["steps_per_s"] > 0
        assert row["samples_per_s"] > 0
    assert res[8]["efficiency"] > 0
