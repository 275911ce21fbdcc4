"""Gridded fused DQN update for LARGE batches (the offline training path).

Reference hot loop: reagent/workflow/training.py:214 — offline batch RL
trains on big sampled minibatches (batch 4096 here) from a preprocessed
table.  The single-block kernel in ops/fused_dqn.py keeps everything in VMEM
but only fits online-sized batches; this variant adds a sequential grid over
batch blocks so arbitrary batch sizes stream through VMEM:

  * per grid step: forward + analytic backward on one [BLK] slice of the
    minibatch, weight-gradient partial sums accumulated in VMEM scratch
    (TPU grids execute sequentially, so scratch carries across iterations);
  * last grid step: Adam moment update + parameter write + target polyak —
    once, on the complete gradient.

Inter-layer activations NEVER touch HBM (the XLA scan path round-trips
~[B, 512] f32 activations between every matmul kernel); per-step HBM
traffic drops to the minibatch rows + one read/write of the 8 parameter
pytrees.  ``matmul_dtype=bfloat16`` additionally runs every matmul on the
MXU's native bf16 path with f32 accumulation (what XLA's DEFAULT precision
does for f32 inputs anyway, so parity with the XLA trainer holds to bf16
rounding).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from reagent_tpu.ops.fused_dqn import (
    ACTION_NOT_POSSIBLE_VAL,
    _act,
    _first_argmax_onehot,
)

Array = jax.Array


def _act_grad_from_h(name: str, h: Array) -> Array:
    """Activation derivative from the OUTPUT h alone (saves storing z:
    relu/leaky_relu preserve sign, tanh's grad is 1-h^2).

    h is upcast to f32 before comparing — Mosaic (as of this jax) hits an
    invalid-relayout bug on bf16 comparisons inside gridded kernels.
    """
    h = h.astype(jnp.float32)
    if name == "relu":
        return (h > 0).astype(jnp.float32)
    if name == "leaky_relu":
        return jnp.where(h > 0, 1.0, 0.01)
    if name == "tanh":
        return 1.0 - h * h
    if name in ("linear", "identity", None):
        return jnp.ones_like(h)
    raise ValueError(f"unsupported activation {name!r}")


def make_fused_dqn_offline_kernel(
    dims: Sequence[Tuple[int, int]],
    activations: Sequence[str],
    batch_size: int,
    gamma: float,
    tau: float,
    double_q_learning: bool,
    block_size: int = 256,
    b1: float = 0.9,
    b2: float = 0.999,
    matmul_dtype=jnp.float32,
    save_dtype=None,
    interpret: bool = False,
):
    """Build ``run(lr_t, eps_t, obs, nobs, act, rew, nt, mask, params8)``.

    Same contract as make_fused_dqn_train_kernel's tensor interface
    (params8 = W[], b[], W_tgt[], b_tgt[], mW[], mb[], vW[], vb[], weights
    transposed [out, in]; returns updated params8 + [1, 4] metrics row
    [td_loss, q_mean, q_taken_mean, reward_mean]), but with a grid over
    ``batch_size // block_size`` batch blocks.
    """
    L = len(dims)
    assert len(activations) == L
    B = int(batch_size)
    BLK = int(block_size)
    assert B % BLK == 0, (B, BLK)
    n_blocks = B // BLK
    A = dims[-1][1]
    g = float(gamma)
    t_ = float(tau)
    _B1, _B2 = float(b1), float(b2)
    md = matmul_dtype
    sd = save_dtype if save_dtype is not None else matmul_dtype

    def mm(x, w, dnums):
        return jax.lax.dot_general(
            x.astype(md), w.astype(md), dimension_numbers=dnums,
            preferred_element_type=jnp.float32,
        )

    def kernel(*refs):
        (lr_ref, eps_ref, obs_ref, nobs_ref, act_ref, rew_ref, nt_ref,
         mask_ref) = refs[:8]
        base = 8
        W = [refs[base + i] for i in range(L)]
        b = [refs[base + L + i] for i in range(L)]
        Wt = [refs[base + 2 * L + i] for i in range(L)]
        bt = [refs[base + 3 * L + i] for i in range(L)]
        mW = [refs[base + 4 * L + i] for i in range(L)]
        mb = [refs[base + 5 * L + i] for i in range(L)]
        vW = [refs[base + 6 * L + i] for i in range(L)]
        vb = [refs[base + 7 * L + i] for i in range(L)]
        o = base + 8 * L
        outs = refs[o:o + 8 * L]
        metrics_ref = refs[o + 8 * L]
        # scratch: per-layer grad accumulators + [1, 8] stats accumulator
        aW = refs[o + 8 * L + 1:o + 8 * L + 1 + L]
        ab = refs[o + 8 * L + 1 + L:o + 8 * L + 1 + 2 * L]
        stats = refs[o + 8 * L + 1 + 2 * L]

        i = pl.program_id(0)
        last = i == n_blocks - 1

        @pl.when(i == 0)
        def _zero():
            for k in range(L):
                aW[k][:] = jnp.zeros_like(aW[k])
                ab[k][:] = jnp.zeros_like(ab[k])
            for j in range(4):  # SMEM allows scalar stores only
                stats[0, j] = 0.0

        def fwd(x, Ws, bs, save=False):
            # only layer OUTPUTS are saved (activation grads are recomputed
            # from h, see _act_grad_from_h), in ``save_dtype`` — at bf16 this
            # halves the dominant VMEM term and enables 2x bigger blocks
            h = x
            hs = [x.astype(sd)]
            for k in range(L):
                z = mm(h, Ws[k][:], (((1,), (1,)), ((), ()))) + bs[k][:]
                h = _act(activations[k], z)
                if save:
                    hs.append(h.astype(sd))
            return (h, hs) if save else h

        obs = obs_ref[:].astype(jnp.float32)
        nobs = nobs_ref[:].astype(jnp.float32)
        act = act_ref[:].astype(jnp.float32)
        rew = rew_ref[:].astype(jnp.float32)
        nt = nt_ref[:].astype(jnp.float32)
        mask = mask_ref[:].astype(jnp.float32)
        penalty = ACTION_NOT_POSSIBLE_VAL * (1.0 - mask)

        x2 = jnp.concatenate([obs, nobs], axis=0)  # [2*BLK, D]
        q2, hs = fwd(x2, W, b, save=True)
        q = q2[:BLK]
        next_q_t = fwd(nobs, Wt, bt) + penalty
        if double_q_learning:
            sel = _first_argmax_onehot(q2[BLK:] + penalty)
        else:
            sel = _first_argmax_onehot(next_q_t)
        next_q_sel = jnp.sum(next_q_t * sel, axis=1, keepdims=True)
        y = rew + g * next_q_sel * nt
        q_taken = jnp.sum(q * act, axis=1, keepdims=True)
        err = q_taken - y

        stats[0, 0] += jnp.sum(err * err)
        stats[0, 1] += jnp.sum(q)
        stats[0, 2] += jnp.sum(q_taken)
        stats[0, 3] += jnp.sum(rew)

        # backward through the shared [2*BLK] chain; next_obs half gets
        # zero dL/dq.  Loss is mean over the FULL batch, so 2/B.
        dz = jnp.concatenate(
            [(2.0 / B) * err * act, jnp.zeros((BLK, A), jnp.float32)], axis=0
        )
        for k in range(L - 1, -1, -1):
            h_prev = hs[k]
            aW[k][:] += mm(dz, h_prev, (((0,), (0,)), ((), ())))
            ab[k][:] += jnp.sum(dz, axis=0, keepdims=True)
            if k > 0:
                dh = mm(dz, W[k][:], (((1,), (0,)), ((), ())))
                dz = dh * _act_grad_from_h(activations[k - 1], hs[k])

        @pl.when(last)
        def _update():
            lr_t = lr_ref[0, 0]
            eps_t = eps_ref[0, 0]
            oW = outs[:L]
            ob = outs[L:2 * L]
            oWt = outs[2 * L:3 * L]
            obt = outs[3 * L:4 * L]
            omW = outs[4 * L:5 * L]
            omb = outs[5 * L:6 * L]
            ovW = outs[6 * L:7 * L]
            ovb = outs[7 * L:8 * L]
            for k in range(L):
                dWt, db = aW[k][:], ab[k][:]
                mW_n = _B1 * mW[k][:] + (1.0 - _B1) * dWt
                vW_n = _B2 * vW[k][:] + (1.0 - _B2) * dWt * dWt
                mb_n = _B1 * mb[k][:] + (1.0 - _B1) * db
                vb_n = _B2 * vb[k][:] + (1.0 - _B2) * db * db
                W_n = W[k][:] - lr_t * mW_n / (jnp.sqrt(vW_n) + eps_t)
                b_n = b[k][:] - lr_t * mb_n / (jnp.sqrt(vb_n) + eps_t)
                omW[k][:] = mW_n
                ovW[k][:] = vW_n
                omb[k][:] = mb_n
                ovb[k][:] = vb_n
                oW[k][:] = W_n
                ob[k][:] = b_n
                oWt[k][:] = t_ * W_n + (1.0 - t_) * Wt[k][:]
                obt[k][:] = t_ * b_n + (1.0 - t_) * bt[k][:]
            metrics_ref[0, 0] = stats[0, 0] / B
            metrics_ref[0, 1] = stats[0, 1] / (B * A)
            metrics_ref[0, 2] = stats[0, 2] / B
            metrics_ref[0, 3] = stats[0, 3] / B

    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    def batch_spec(ncols):
        return pl.BlockSpec((BLK, ncols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    D = dims[0][0]

    def run(lr_t, eps_t, obs, nobs, act, rew, nt, mask, params8):
        param_specs = [whole(tuple(p.shape)) for p in params8]
        out_shape = tuple(
            jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params8
        ) + (jax.ShapeDtypeStruct((1, 4), jnp.float32),)
        scratch = (
            [pltpu.VMEM((dims[k][1], dims[k][0]), jnp.float32) for k in range(L)]
            + [pltpu.VMEM((1, dims[k][1]), jnp.float32) for k in range(L)]
            + [pltpu.SMEM((1, 8), jnp.float32)]
        )
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[smem, smem, batch_spec(D), batch_spec(D), batch_spec(A),
                      batch_spec(1), batch_spec(1), batch_spec(A)]
                     + param_specs,
            out_specs=tuple(param_specs)
            + (pl.BlockSpec((1, 4), lambda i: (0, 0),
                            memory_space=pltpu.SMEM),),
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(lr_t.reshape(1, 1), eps_t.reshape(1, 1),
          obs, nobs, act, rew, nt, mask, *params8)

    return run
