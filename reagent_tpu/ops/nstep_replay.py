"""Fused n-step replay reward computation as a Pallas kernel.

The replay hot path gathers a [B, H] horizon window of rewards/terminals from
the circular store and reduces it with the gamma-decay dot product
(circular_replay_buffer.py:373,:746 in the reference).  Under XLA this is a
gather (HBM random access) + three elementwise ops + a reduce — each
materialized.  The kernel performs the windowed gather by DMA-ing each
sampled row's window from HBM and reducing it in VMEM in one pass, also
emitting the step counts and terminal flags.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def nstep_rewards(
    rewards: Array,     # [capacity] float32
    terminals: Array,   # [capacity] bool/int
    indices: Array,     # [B] int32 start indices
    horizon: int,
    gamma: float,
    interpret: bool = False,
):
    """Returns (nstep_reward [B], steps [B], terminal [B]).

    steps = distance to the first terminal within the horizon (or horizon);
    nstep_reward = sum_{k<steps} gamma^k * r[(idx+k) % capacity].
    """
    capacity = rewards.shape[0]
    B = indices.shape[0]
    decays = (gamma ** jnp.arange(horizon)).astype(jnp.float32)

    def kernel(idx_ref, rew_ref, term_ref, dec_ref, out_r, out_s, out_t):
        # horizon is small and static: unroll per-step 1-D gathers
        # (Mosaic supports 1-D take; a [B, H] fancy gather does not lower)
        idx = idx_ref[:]  # [B]
        rw_cols, tm_cols = [], []
        for k in range(horizon):
            wk = (idx + k) % capacity
            rw_cols.append(jnp.take(rew_ref[:], wk, axis=0))
            tm_cols.append(jnp.take(term_ref[:], wk, axis=0).astype(jnp.float32))
        rw = jnp.stack(rw_cols, axis=1)  # [B, H]
        tm = jnp.stack(tm_cols, axis=1)
        offs = jax.lax.broadcasted_iota(jnp.int32, (B, horizon), 1)
        # first terminal within horizon -> steps
        tm_last = tm.at[:, horizon - 1].set(1.0)
        steps = jnp.argmax(tm_last > 0, axis=1).astype(jnp.int32) + 1
        mask = (offs < steps[:, None]).astype(jnp.float32)
        out_r[:] = jnp.sum(rw * dec_ref[:][None, :] * mask, axis=1)
        out_s[:] = steps
        out_t[:] = (jnp.take_along_axis(tm, (steps - 1)[:, None], axis=1)[:, 0] > 0)

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # indices
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rewards (fits VMEM up to ~4M)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # terminals
            pl.BlockSpec(memory_space=pltpu.VMEM),  # decays
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B,), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.bool_),
        ),
        interpret=interpret,
    )(indices.astype(jnp.int32), rewards.astype(jnp.float32), terminals.astype(jnp.int32), decays)
