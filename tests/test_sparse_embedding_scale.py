"""Touched-rows-only sparse embedding training (ops/sparse_embedding.py):
equivalence with dense autodiff, learning sanity, and sharded execution.

Reference seam: reagent/core/types.py:23-24, models/
synthetic_reward_sparse_arch.py:95 (torchrec EBC + fused sparse optimizers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.ops.sparse_embedding import (
    SparseEmbeddingState,
    dense_reference_step,
    init_sparse_embedding_state,
    logical_table,
    make_sparse_embedding_train_step,
)


def _setup(table_size=64, dim=8, seed=0):
    state, head_apply, opt = init_sparse_embedding_state(
        jax.random.PRNGKey(seed), table_size, dim, head_hidden=16
    )
    return state, head_apply, opt


def _unique_ids_batch(table_size, B, L, rng):
    """Globally distinct ids across the whole batch (duplicate occurrences
    change adagrad semantics between the sparse per-occurrence scatter and
    the dense summed-gradient formulation; see module docstring)."""
    assert table_size >= B * L
    return rng.choice(table_size, B * L, replace=False).reshape(B, L).astype(np.int32)


def test_sparse_matches_dense_autodiff():
    state, head_apply, opt = _setup()
    sparse = make_sparse_embedding_train_step(head_apply, opt, donate=False)
    dense = dense_reference_step(head_apply, opt)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(_unique_ids_batch(64, B=16, L=4, rng=rng))
    mask = jnp.ones((16, 4), bool)
    target = jnp.asarray(rng.normal(size=(16, 1)), jnp.float32)

    s_state, s_loss = sparse(state, ids, mask, target)
    d_state, d_loss = dense(state, ids, mask, target)
    np.testing.assert_allclose(float(s_loss), float(d_loss), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_state.table), np.asarray(d_state.table), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(s_state.accum), np.asarray(d_state.accum), rtol=1e-5, atol=1e-9
    )


def test_padded_slots_do_not_corrupt_rows():
    state, head_apply, opt = _setup()
    step = make_sparse_embedding_train_step(head_apply, opt, donate=False)
    rng = np.random.default_rng(1)
    B, L = 8, 6
    ids = jnp.asarray(_unique_ids_batch(64, B, L, rng))
    # mask out the last 3 slots of every row; those padded ids must stay put
    mask = jnp.asarray(np.concatenate([np.ones((B, 3)), np.zeros((B, 3))], 1), bool)
    target = jnp.asarray(rng.normal(size=(B, 1)), jnp.float32)
    new_state, _ = step(state, ids, mask, target)
    padded_ids = np.asarray(ids[:, 3:]).reshape(-1)
    active_ids = set(np.asarray(ids[:, :3]).reshape(-1).tolist())
    untouched = [i for i in padded_ids if i not in active_ids]
    assert untouched, "test needs some purely-padded rows"
    lt_new = logical_table(new_state, 64, 8)
    lt_old = logical_table(state, 64, 8)
    np.testing.assert_array_equal(
        np.asarray(lt_new[jnp.asarray(untouched)]),
        np.asarray(lt_old[jnp.asarray(untouched)]),
    )


def test_training_reduces_loss():
    state, head_apply, opt = _setup(table_size=256, dim=16)
    step = make_sparse_embedding_train_step(head_apply, opt, donate=False)
    rng = np.random.default_rng(2)
    B, L = 64, 8
    # a learnable function of the ids: target = sum of per-id fixed values
    id_values = rng.normal(size=256).astype(np.float32)
    losses = []
    for i in range(60):
        ids = rng.integers(0, 256, (B, L)).astype(np.int32)
        target = id_values[ids].mean(axis=1, keepdims=True)
        state, loss = step(
            state, jnp.asarray(ids), jnp.ones((B, L), bool), jnp.asarray(target)
        )
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.3 * np.mean(losses[:10]), losses[::10]


def test_sharded_table_matches_single_device():
    """The table sharded over the 'model' mesh axis produces bit-comparable
    updates to the unsharded step (the dryrun_multichip case's assertion)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from reagent_tpu.parallel import make_2d_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    state, head_apply, opt = _setup(table_size=128, dim=8)
    step = make_sparse_embedding_train_step(head_apply, opt, donate=False)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(_unique_ids_batch(128, B=16, L=4, rng=rng))
    mask = jnp.ones((16, 4), bool)
    target = jnp.asarray(rng.normal(size=(16, 1)), jnp.float32)

    ref_state, ref_loss = step(state, ids, mask, target)

    mesh = make_2d_mesh(n_devices=len(jax.devices()))
    sharded_state = SparseEmbeddingState(
        table=jax.device_put(state.table, NamedSharding(mesh, P("model", None))),
        accum=jax.device_put(state.accum, NamedSharding(mesh, P("model"))),
        head_params=state.head_params,
        head_opt_state=state.head_opt_state,
    )
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    mask_sh = jax.device_put(mask, NamedSharding(mesh, P("data", None)))
    tgt_sh = jax.device_put(target, NamedSharding(mesh, P("data", None)))
    sh_state, sh_loss = step(sharded_state, ids_sh, mask_sh, tgt_sh)

    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sh_state.table), np.asarray(ref_state.table), rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize("dim", [128, 96, 256])
def test_lane_packing_degenerate_dims(dim):
    """dim >= 128 or dims not dividing 128 use pack=1 (plain layout) and
    still train correctly."""
    table_size = 64
    state, head_apply, opt = init_sparse_embedding_state(
        jax.random.PRNGKey(0), table_size, dim, head_hidden=16
    )
    assert state.table.shape == (table_size, dim)  # pack == 1
    step = make_sparse_embedding_train_step(head_apply, opt, donate=False)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(_unique_ids_batch(table_size, B=8, L=4, rng=rng))
    mask = jnp.ones((8, 4), bool)
    target = jnp.asarray(rng.normal(size=(8, 1)), jnp.float32)
    new_state, loss = step(state, ids, mask, target)
    assert np.isfinite(float(loss))
    # touched rows changed, logical view round-trips
    lt = logical_table(new_state, table_size, dim)
    assert lt.shape == (table_size, dim)
    touched = np.asarray(ids).reshape(-1)
    diff = np.abs(np.asarray(lt[touched]) - np.asarray(
        logical_table(state, table_size, dim)[touched]))
    assert diff.max() > 0
