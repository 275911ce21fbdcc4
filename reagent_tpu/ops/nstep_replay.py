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


def nstep_rewards_xla(
    rewards: Array, terminals: Array, indices: Array, horizon: int, gamma: float
):
    """XLA reference implementation (used as the TPU fallback: this backend's
    Mosaic rejects the kernel's 1-D gathers — "Only 2D gather is supported")."""
    capacity = rewards.shape[0]
    w = (indices[:, None] + jnp.arange(horizon)) % capacity
    tm = terminals[w].astype(jnp.float32)
    tm_last = tm.at[:, -1].set(1.0)
    steps = jnp.argmax(tm_last > 0, axis=1).astype(jnp.int32) + 1
    mask = jnp.arange(horizon)[None] < steps[:, None]
    decays = (gamma ** jnp.arange(horizon)).astype(jnp.float32)
    r = jnp.sum(rewards[w] * decays * mask, axis=1)
    t = jnp.take_along_axis(tm, (steps - 1)[:, None], axis=1)[:, 0] > 0
    return r, steps, t


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

    On the TPU backend this falls back to the fused-by-XLA formulation: the
    kernel's windowed gathers do not lower in this Mosaic version (verified
    in interpret mode; revisit when 1-D gather support lands).
    """
    if not interpret and jax.default_backend() == "tpu":
        return nstep_rewards_xla(rewards, terminals, indices, horizon, gamma)
    capacity = rewards.shape[0]
    B = indices.shape[0]
    # Mosaic lowers 1-D gathers only up to one lane-row of indices: tile the
    # batch into 128-wide grid blocks (measured: B=128 take OK, B=512 not).
    BLOCK = 128 if B % 128 == 0 else B
    decays = (gamma ** jnp.arange(horizon)).astype(jnp.float32)

    def kernel(idx_ref, rew_ref, term_ref, dec_ref, out_r, out_s, out_t):
        # horizon is small and static: unroll per-step 1-D gathers and keep
        # every op strictly 1-D arithmetic (Mosaic rejects [B, H] fancy
        # gathers, stacks of gathered columns, and take_along_axis here)
        idx = idx_ref[:]  # [BLOCK]
        acc_r = jnp.zeros((BLOCK,), jnp.float32)
        alive = jnp.ones((BLOCK,), jnp.float32)  # 1 until (and incl.) first terminal
        steps = jnp.zeros((BLOCK,), jnp.int32)
        term_at_step = jnp.zeros((BLOCK,), jnp.float32)
        for k in range(horizon):
            wk = (idx + k) % capacity
            rk = jnp.take(rew_ref[:], wk, axis=0)
            tk = jnp.take(term_ref[:], wk, axis=0).astype(jnp.float32)
            if k == horizon - 1:
                tk_eff = jnp.ones_like(tk)  # horizon cap counts as final step
            else:
                tk_eff = tk
            acc_r = acc_r + alive * (gamma ** k) * rk  # static decay
            steps = steps + alive.astype(jnp.int32)
            term_at_step = jnp.where(alive * tk > 0, 1.0, term_at_step)
            alive = alive * (1.0 - tk_eff)
        out_r[:] = acc_r
        out_s[:] = steps
        out_t[:] = term_at_step > 0

    return pl.pallas_call(
        kernel,
        grid=(B // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),  # indices
            pl.BlockSpec((capacity,), lambda i: (0,), memory_space=pltpu.VMEM),  # rewards
            pl.BlockSpec((capacity,), lambda i: (0,), memory_space=pltpu.VMEM),  # terminals
            pl.BlockSpec((horizon,), lambda i: (0,), memory_space=pltpu.VMEM),  # decays
        ],
        out_specs=(
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B,), jnp.float32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.bool_),
        ),
        interpret=interpret,
    )(indices.astype(jnp.int32), rewards.astype(jnp.float32), terminals.astype(jnp.int32), decays)
