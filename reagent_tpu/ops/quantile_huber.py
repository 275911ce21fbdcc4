"""Pairwise quantile-huber loss as a Pallas kernel (QR-DQN hot op).

The QR-DQN loss forms a [B, N, N] pairwise TD tensor (target atoms x current
atoms; reference qrdqn_trainer.py:150-156).  For large atom counts the
materialized pairwise tensor is pure HBM traffic; the kernel tiles over the
batch and keeps each [N, N] block in VMEM, emitting only the per-sample loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def quantile_huber_loss(
    target_q: Array,   # [B, N] target quantile samples
    current_q: Array,  # [B, N] current quantile estimates
    kappa: float = 1.0,
    block_b: int = 128,
    interpret: bool = False,
) -> Array:
    """Returns the mean quantile-huber loss (scalar).

    On the TPU backend this currently falls back to the XLA pairwise
    formulation (the kernel crashes this remote Mosaic compiler; it is
    verified in interpret mode).
    """
    B, N = target_q.shape
    taus = ((jnp.arange(N) + 0.5) / N).astype(jnp.float32)
    if not interpret and jax.default_backend() == "tpu":
        td = target_q[:, :, None] - current_q[:, None, :]
        a = jnp.abs(td)
        huber = jnp.where(a < kappa, 0.5 * td * td, kappa * (a - 0.5 * kappa))
        weight = jnp.abs(taus[None, None, :] - (td < 0).astype(jnp.float32))
        return jnp.mean(huber * weight)

    def kernel(t_ref, c_ref, tau_ref, o_ref):
        # strictly 2-D: loop over target atoms (static N), accumulating the
        # [bb, N_current] pairwise slice — Mosaic rejects the 3-D pairwise
        # tensor formulation
        t = t_ref[:].astype(jnp.float32)  # [bb, N]
        c = c_ref[:].astype(jnp.float32)
        tau = tau_ref[:]  # [N]
        acc = jnp.zeros_like(c)
        for k in range(N):
            td = t[:, k][:, None] - c  # [bb, N]
            a = jnp.abs(td)
            huber = jnp.where(a < kappa, 0.5 * td * td, kappa * (a - 0.5 * kappa))
            weight = jnp.abs(tau[None, :] - (td < 0).astype(jnp.float32))
            acc = acc + huber * weight
        o_ref[:] = jnp.sum(acc, axis=1) / (N * N)

    bb = min(block_b, B)
    per_sample = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(B, bb),),
        in_specs=[
            pl.BlockSpec((bb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
        interpret=interpret,
    )(target_q, current_q, taus)
    return jnp.mean(per_sample)
