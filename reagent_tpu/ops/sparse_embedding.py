"""Sparse embedding training at scale: touched-rows-only table updates.

Reference seam: reagent/core/types.py:23-24 (torchrec KeyedJaggedTensor) and
reagent/models/synthetic_reward_sparse_arch.py:95 (EmbeddingBagCollection) —
the reference leans on torchrec's fused sparse optimizers, which update only
the rows an ID batch touched.

TPU-native redesign: naive autodiff through ``table[ids]`` materializes a
DENSE [table_size, dim] gradient (the scatter-add of row grads into a
zeros-like table) and a dense optimizer sweep — at 10M x 64 that is ~2.5 GB
of HBM traffic per step for rows that are ~99.8% zeros.  Instead the lookup
rows are made the differentiable leaf: grad flows to the [B, L, D] gathered
rows only, and the table + row-wise Adagrad accumulator are updated with
``.at[ids].add`` scatters that touch exactly the B*L sampled rows.
Duplicate IDs inside a batch are handled by scatter-add semantics (their
contributions sum, as in torchrec's fused rowwise-Adagrad).

The whole step — gather, pool, dense head, backward, sparse scatter update,
dense Adam — is one jitted XLA program with donated table/accumulator
buffers (no copy of the multi-GB table per step).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


class SparseEmbeddingState(NamedTuple):
    """Donated training state for one big table + a small dense head.

    ``table`` is stored LANE-PACKED when dim < 128: ``pack = 128 // dim``
    logical rows share one physical [pack * dim]-wide row, so every
    gather/scatter touches full 128-lane tiles.  Measured on v5e at
    10M x 64 / 204800 rows: the D=64 layout gathers at 13.8 ms and
    scatters at 41 ms (XLA's sub-tile path even makes gather time scale
    with TABLE size); packed to 128 lanes the same work is ~1 ms / ~15 ms.
    Use :func:`logical_table` to view it as [table_size, dim].
    """

    table: Array  # [ceil(table_size/pack), pack*dim]
    accum: Array  # [table_size] row-wise Adagrad accumulator
    head_params: Any
    head_opt_state: Any


def _pack_factor(dim: int) -> int:
    return 128 // dim if dim < 128 and 128 % dim == 0 else 1


def logical_table(state: SparseEmbeddingState, table_size: int, dim: int) -> Array:
    """[table_size, dim] view of the (possibly lane-packed) table."""
    pack = _pack_factor(dim)
    if pack == 1:
        return state.table
    return state.table.reshape(-1, dim)[:table_size]


def init_sparse_embedding_state(
    rng: Array,
    table_size: int,
    dim: int,
    head_hidden: int = 256,
    out_dim: int = 1,
    head_optimizer: optax.GradientTransformation | None = None,
    table_init_scale: float = 0.01,
) -> Tuple[SparseEmbeddingState, Any, optax.GradientTransformation]:
    """State + (head apply fn, head optimizer)."""
    k_table, k1, k2 = jax.random.split(rng, 3)
    pack = _pack_factor(dim)
    t_phys = -(-table_size // pack)
    table = table_init_scale * jax.random.normal(
        k_table, (t_phys, pack * dim), jnp.float32
    )
    accum = jnp.zeros((table_size,), jnp.float32)
    head_params = {
        "w1": jax.random.normal(k1, (dim, head_hidden)) * (2.0 / dim) ** 0.5,
        "b1": jnp.zeros(head_hidden),
        "w2": jax.random.normal(k2, (head_hidden, out_dim)) * (2.0 / head_hidden) ** 0.5,
        "b2": jnp.zeros(out_dim),
    }

    def head_apply(p, x):
        h = jax.nn.relu(x @ p["w1"] + p["b1"])
        return h @ p["w2"] + p["b2"]

    opt = head_optimizer or optax.adam(1e-3)
    return (
        SparseEmbeddingState(table, accum, head_params, opt.init(head_params)),
        head_apply,
        opt,
    )


def make_sparse_embedding_train_step(
    head_apply,
    head_opt: optax.GradientTransformation,
    table_lr: float = 0.05,
    adagrad_eps: float = 1e-8,
    donate: bool = True,
):
    """-> jitted ``step(state, ids, mask, target) -> (state, loss)``.

    ids: [B, L] int32 LOGICAL rows into the table; mask: [B, L] valid-ID
    mask (jagged lengths as fixed-width padding); target: [B, out_dim].
    Lane packing (see SparseEmbeddingState) is handled internally.
    """

    def step(
        state: SparseEmbeddingState, ids: Array, mask: Array, target: Array
    ) -> Tuple[SparseEmbeddingState, Array]:
        B, L = ids.shape
        width = state.table.shape[1]
        flat_ids = ids.reshape(-1)

        # --- lane-packed gather: fetch full 128-lane physical rows, then
        # select the logical slot ---
        # (pack == 1 degenerates to a plain row gather); the logical dim is
        # the head's input width, the physical row holds ``pack`` of them
        D = state.head_params["w1"].shape[0]
        pack = width // D
        phys = flat_ids // pack
        slot = flat_ids % pack
        rows128 = state.table[phys]  # [B*L, pack*D]
        rows = jnp.take_along_axis(
            rows128.reshape(-1, pack, D), slot[:, None, None], axis=1
        )[:, 0].reshape(B, L, D)

        def loss_fn(rows, head_params):
            m = mask.astype(jnp.float32)[..., None]
            pooled = jnp.sum(rows * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
            pred = head_apply(head_params, pooled)
            return jnp.mean((pred - target) ** 2)

        loss, (g_rows, g_head) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rows, state.head_params
        )

        # --- sparse table update: touch only the B*L sampled rows ---
        flat_g = g_rows.reshape(-1, D)
        # padded slots carry zero grad (mask already zeroed them in the
        # pooling), but zero them explicitly so a nonzero-grad bug can't
        # corrupt arbitrary rows
        valid = mask.reshape(-1).astype(jnp.float32)[:, None]
        flat_g = flat_g * valid
        # row-wise Adagrad (torchrec's default for big tables): one
        # accumulator scalar per row, updated with the mean-square of this
        # batch's row gradient ([N]-scalar scatters use the fast path)
        g_sq = jnp.mean(flat_g * flat_g, axis=-1)  # [B*L]
        # scatter in SORTED id order: v5e applies sorted scatters ~1.5x
        # faster (10.1 vs 15.4 ms at 204800 x 128 rows) and the argsort +
        # 128-lane permutation gather cost ~1 ms together
        order = jnp.argsort(flat_ids)
        sids = flat_ids[order]
        accum = state.accum.at[sids].add(g_sq[order], indices_are_sorted=True)
        scale = jax.lax.rsqrt(accum[flat_ids] + adagrad_eps)  # [B*L]
        upd = -table_lr * scale[:, None] * flat_g  # [B*L, D]
        # place the update in its slot of a zero 128-lane row, scatter-add
        slot_onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (flat_ids.shape[0], pack), 1)
            == slot[:, None]
        ).astype(jnp.float32)
        upd128 = (slot_onehot[:, :, None] * upd[:, None, :]).reshape(-1, width)
        table = state.table.at[sids // pack].add(
            upd128[order], indices_are_sorted=True
        )

        updates, head_opt_state = head_opt.update(g_head, state.head_opt_state)
        head_params = optax.apply_updates(state.head_params, updates)
        return (
            SparseEmbeddingState(table, accum, head_params, head_opt_state),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def dense_reference_step(
    head_apply,
    head_opt: optax.GradientTransformation,
    table_lr: float = 0.05,
    adagrad_eps: float = 1e-8,
):
    """The NAIVE dense-autodiff version (full-table gradient), for
    correctness cross-checks at small table sizes only."""

    def step(state: SparseEmbeddingState, ids, mask, target):
        # unpack the lane-packed storage to a logical [T, D] table
        D_ = state.head_params["w1"].shape[0]
        T_ = state.accum.shape[0]
        phys_shape = state.table.shape
        ltable = state.table.reshape(-1, D_)[:T_]

        def loss_fn(table, head_params):
            rows = table[ids]
            m = mask.astype(jnp.float32)[..., None]
            pooled = jnp.sum(rows * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
            pred = head_apply(head_params, pooled)
            return jnp.mean((pred - target) ** 2)

        loss, (g_table, g_head) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            ltable, state.head_params
        )
        # row-wise adagrad over the dense gradient, restricted to touched
        # rows (rows with zero grad must not decay the accumulator) — only
        # equivalent to the sparse path when no duplicate ids are present,
        # since scatter-add applies per-occurrence increments
        touched = jnp.zeros(T_).at[ids.reshape(-1)].add(
            mask.reshape(-1).astype(jnp.float32)
        )
        g_sq = jnp.mean(g_table * g_table, axis=-1)
        accum = state.accum + jnp.where(touched > 0, g_sq, 0.0)
        scale = jax.lax.rsqrt(accum + adagrad_eps)
        new_ltable = ltable - table_lr * jnp.where(
            (touched > 0)[:, None], scale[:, None] * g_table, 0.0
        )
        # repack to physical layout (phantom tail rows keep old values)
        flat = state.table.reshape(-1, D_).at[:T_].set(new_ltable)
        table = flat.reshape(phys_shape)
        updates, head_opt_state = head_opt.update(g_head, state.head_opt_state)
        head_params = optax.apply_updates(state.head_params, updates)
        return (
            SparseEmbeddingState(table, accum, head_params, head_opt_state),
            loss,
        )

    return jax.jit(step)
