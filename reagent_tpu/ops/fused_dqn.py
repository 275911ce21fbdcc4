"""Fully fused DQN update as ONE Pallas TPU kernel.

Reference hot loop: reagent/training/dqn_trainer.py:28-120 — one training step
is (target fwd, online fwd, TD loss, backward, Adam, soft update).  Under
plain XLA this lowers to dozens of small HBM-round-trip kernels because every
tensor involved is tiny (CartPole-sized MLPs).  This kernel keeps ALL of it —
three MLP forwards, the analytic backward, the Adam moment updates, and the
target-network polyak blend — resident in VMEM and executes the whole update
in a single Mosaic program.

Exact-parity contract (tested in tests/test_pallas_ops.py):
  * TD target matches rl_trainer_base.get_max_q_values_with_target (masked,
    double-Q or target-argmax) with scalar discount ``gamma``.
  * Loss/grads match ``mse`` q_network_loss.
  * Adam matches optax.adam(lr, b1, b2, eps) including bias correction — the
    correction is folded into per-step scalars lr_t / eps_t computed outside:
        upd = lr_t * m' / (sqrt(v') + eps_t),
        lr_t = lr*sqrt(1-b2^t)/(1-b1^t),  eps_t = eps*sqrt(1-b2^t).
  * Target update matches optim.soft_update (tau*online_new + (1-tau)*target).

Weights are carried TRANSPOSED ([out, in]) so each layer's rows map onto TPU
sublanes regardless of the (small, unaligned) fan-in.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ACTION_NOT_POSSIBLE_VAL = -1e9
_BIG_I32 = 2**30  # python int: avoids a captured traced constant in kernels


def _act(name: str, z: Array) -> Array:
    if name == "relu":
        return jnp.maximum(z, 0.0)
    if name == "leaky_relu":
        return jnp.where(z > 0, z, 0.01 * z)
    if name == "tanh":
        return jnp.tanh(z)
    if name in ("linear", "identity", None):
        return z
    raise ValueError(f"unsupported activation {name!r}")


def _act_grad(name: str, z: Array, h: Array) -> Array:
    if name == "relu":
        return (z > 0).astype(jnp.float32)
    if name == "leaky_relu":
        return jnp.where(z > 0, 1.0, 0.01)
    if name == "tanh":
        return 1.0 - h * h
    return jnp.ones_like(z)


def _first_argmax_onehot(q: Array) -> Array:
    """One-hot of the FIRST max index per row (ties -> lowest index).

    Matches jnp.argmax semantics; built from VPU reductions only.
    """
    mx = jnp.max(q, axis=1, keepdims=True)
    eq = q >= mx
    iota = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    idx = jnp.min(jnp.where(eq, iota, _BIG_I32), axis=1, keepdims=True)
    return (iota == idx).astype(jnp.float32)


def make_fused_dqn_train_kernel(
    dims: Sequence[Tuple[int, int]],
    activations: Sequence[str],
    batch_size: int,
    gamma: float,
    tau: float,
    double_q_learning: bool,
    b1: float = 0.9,
    b2: float = 0.999,
    packed: Tuple[int, int, int, int] = None,
    interpret: bool = False,
):
    """Build the fused update callable.

    dims: [(in_i, out_i)] per layer; activations: per layer, last 'linear'.

    Tensor interface (``packed=None``): ``run(lr_t, eps_t, obs, next_obs,
    act_onehot, reward, not_term, mask, params8)``.

    Packed interface (``packed=(obs_col, act_col, rew_col, term_col)``):
    ``run(lr_t, eps_t, rows, next_rows, params8)`` — raw replay rows from
    ``PackedReplayBuffer`` are unpacked (column slices + in-kernel one-hot)
    without any XLA-side batch assembly; all next-actions are possible.

    params8 is the flat list W[], b[], W_tgt[], b_tgt[], mW[], mb[], vW[],
    vb[] (weights transposed [out, in], biases [1, out]); outputs are the
    updated params8 followed by a [1, 4] metrics row
    [td_loss, q_values_mean, q_taken_mean, reward_mean].

    The online forwards over obs and next_obs share one [2B, ...] matmul
    chain; the backward reuses it by zero-padding dL/dq over the next_obs
    half (zero rows contribute nothing to the weight grads).
    """
    L = len(dims)
    assert len(activations) == L
    B = int(batch_size)
    A = dims[-1][1]
    D = dims[0][0]
    g = float(gamma)
    t_ = float(tau)
    _B1, _B2 = float(b1), float(b2)
    n_batch_inputs = 2 if packed else 6

    def kernel(*refs):
        lr_ref, eps_ref = refs[0], refs[1]
        if packed:
            rows_ref, next_rows_ref = refs[2:4]
        else:
            obs_ref, nobs_ref, act_ref, rew_ref, nt_ref, mask_ref = refs[2:8]
        base = 2 + n_batch_inputs
        W = [refs[base + i] for i in range(L)]
        b = [refs[base + L + i] for i in range(L)]
        Wt = [refs[base + 2 * L + i] for i in range(L)]
        bt = [refs[base + 3 * L + i] for i in range(L)]
        mW = [refs[base + 4 * L + i] for i in range(L)]
        mb = [refs[base + 5 * L + i] for i in range(L)]
        vW = [refs[base + 6 * L + i] for i in range(L)]
        vb = [refs[base + 7 * L + i] for i in range(L)]
        o = base + 8 * L
        oW = [refs[o + i] for i in range(L)]
        ob = [refs[o + L + i] for i in range(L)]
        oWt = [refs[o + 2 * L + i] for i in range(L)]
        obt = [refs[o + 3 * L + i] for i in range(L)]
        omW = [refs[o + 4 * L + i] for i in range(L)]
        omb = [refs[o + 5 * L + i] for i in range(L)]
        ovW = [refs[o + 6 * L + i] for i in range(L)]
        ovb = [refs[o + 7 * L + i] for i in range(L)]
        metrics_ref = refs[o + 8 * L]

        lr_t = lr_ref[0, 0]
        eps_t = eps_ref[0, 0]

        def fwd(x, Ws, bs, save=False):
            h = x
            zs, hs = [], [x]
            for i in range(L):
                # x [B, in] . W^T [out, in] -> [B, out]
                z = jax.lax.dot_general(
                    h, Ws[i][:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bs[i][:]
                h = _act(activations[i], z)
                if save:
                    zs.append(z)
                    hs.append(h)
            return (h, zs, hs) if save else h

        # --- unpack the batch -----------------------------------------------
        if packed:
            obs_col, act_col, rew_col, term_col = packed
            rows = rows_ref[:].astype(jnp.float32)
            obs = rows[:, obs_col:obs_col + D]
            nobs = next_rows_ref[:, obs_col:obs_col + D].astype(jnp.float32)
            a_col = rows[:, act_col:act_col + 1]
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, A), 1).astype(
                jnp.float32
            )
            act = (jnp.abs(iota - a_col) < 0.5).astype(jnp.float32)
            rew = rows[:, rew_col:rew_col + 1]
            nt = 1.0 - rows[:, term_col:term_col + 1]
            penalty = None  # all next actions possible in the packed loop
        else:
            obs = obs_ref[:].astype(jnp.float32)
            nobs = nobs_ref[:].astype(jnp.float32)
            act = act_ref[:].astype(jnp.float32)
            rew = rew_ref[:].astype(jnp.float32)
            nt = nt_ref[:].astype(jnp.float32)
            mask = mask_ref[:].astype(jnp.float32)
            penalty = ACTION_NOT_POSSIBLE_VAL * (1.0 - mask)

        # --- shared online forward over [obs; next_obs] ---------------------
        x2 = jnp.concatenate([obs, nobs], axis=0)  # [2B, D]
        q2, zs, hs = fwd(x2, W, b, save=True)
        q = q2[:B]  # [B, A]
        next_q_t = fwd(nobs, Wt, bt)
        if penalty is not None:
            next_q_t = next_q_t + penalty
        if double_q_learning:
            next_q = q2[B:]
            if penalty is not None:
                next_q = next_q + penalty
            sel = _first_argmax_onehot(next_q)
        else:
            sel = _first_argmax_onehot(next_q_t)
        next_q_sel = jnp.sum(next_q_t * sel, axis=1, keepdims=True)  # [B,1]
        y = rew + g * next_q_sel * nt  # [B,1] — stop_gradient implicit (manual bwd)

        q_taken = jnp.sum(q * act, axis=1, keepdims=True)  # [B,1]
        err = q_taken - y
        loss = jnp.mean(err * err)

        # --- backward through the shared [2B] chain --------------------------
        # dL/dq is zero on the next_obs half; zero rows add nothing to grads.
        dz = jnp.concatenate(
            [(2.0 / B) * err * act, jnp.zeros((B, A), jnp.float32)], axis=0
        )  # [2B, A]; last layer linear
        for i in range(L - 1, -1, -1):
            h_prev = hs[i]  # [B, in_i]
            # dW^T = dz^T . h_prev  ([out, in])
            dWt = jax.lax.dot_general(
                dz, h_prev,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db = jnp.sum(dz, axis=0, keepdims=True)  # [1, out]
            if i > 0:
                # dh_prev = dz . W^T^T = dz [B,out] . W [out,in] -> [B,in]
                dh = jax.lax.dot_general(
                    dz, W[i][:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dz = dh * _act_grad(activations[i - 1], zs[i - 1], hs[i])

            # --- Adam (bias correction folded into lr_t/eps_t) -------------
            mW_n = _B1 * mW[i][:] + (1.0 - _B1) * dWt
            vW_n = _B2 * vW[i][:] + (1.0 - _B2) * dWt * dWt
            mb_n = _B1 * mb[i][:] + (1.0 - _B1) * db
            vb_n = _B2 * vb[i][:] + (1.0 - _B2) * db * db
            W_n = W[i][:] - lr_t * mW_n / (jnp.sqrt(vW_n) + eps_t)
            b_n = b[i][:] - lr_t * mb_n / (jnp.sqrt(vb_n) + eps_t)
            omW[i][:] = mW_n
            ovW[i][:] = vW_n
            omb[i][:] = mb_n
            ovb[i][:] = vb_n
            oW[i][:] = W_n
            ob[i][:] = b_n
            # --- soft update target ----------------------------------------
            oWt[i][:] = t_ * W_n + (1.0 - t_) * Wt[i][:]
            obt[i][:] = t_ * b_n + (1.0 - t_) * bt[i][:]

        metrics_ref[0, 0] = loss
        metrics_ref[0, 1] = jnp.mean(q)
        metrics_ref[0, 2] = jnp.mean(q_taken)
        metrics_ref[0, 3] = jnp.mean(rew)

    smem = lambda: pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def _call(batch_arrays, params8):
        out_shape = tuple(
            jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params8
        ) + (jax.ShapeDtypeStruct((1, 4), jnp.float32),)
        return pl.pallas_call(
            kernel,
            in_specs=[smem(), smem()] + [vmem()] * (n_batch_inputs + 8 * L),
            out_specs=tuple([vmem()] * (8 * L))
            + (pl.BlockSpec(memory_space=pltpu.SMEM),),
            out_shape=out_shape,
            interpret=interpret,
        )(*batch_arrays, *params8)

    if packed:
        def run(lr_t, eps_t, rows, next_rows, params8):
            return _call(
                (lr_t.reshape(1, 1), eps_t.reshape(1, 1), rows, next_rows),
                params8,
            )
    else:
        def run(lr_t, eps_t, obs, nobs, act, rew, nt, mask, params8):
            """params8: flat list W[],b[],Wt[],bt[],mW[],mb[],vW[],vb[]."""
            return _call(
                (lr_t.reshape(1, 1), eps_t.reshape(1, 1),
                 obs, nobs, act, rew, nt, mask),
                params8,
            )

    return run


def extract_mlp_layout(params_example):
    """Locate (kernel, bias) leaf positions in a flax dense-MLP params tree.

    Returns (kernel_idx, bias_idx, dims) where idx lists index into
    ``jax.tree_util.tree_flatten(params)[0]`` in layer order and
    dims = [(in_i, out_i)].
    """
    leaves = jax.tree_util.tree_flatten_with_path(params_example)[0]
    kernels, biases = [], []
    for i, (path, leaf) in enumerate(leaves):
        name = getattr(path[-1], "key", str(path[-1]))
        layer = getattr(path[-2], "key", "") if len(path) > 1 else ""
        if name == "kernel":
            kernels.append((layer, i, tuple(leaf.shape)))
        elif name == "bias":
            biases.append((layer, i, tuple(leaf.shape)))
    kernels.sort(key=lambda t: _numeric_layer_key(t[0]))
    biases.sort(key=lambda t: _numeric_layer_key(t[0]))
    if not kernels or len(kernels) != len(biases):
        raise ValueError("params tree is not a plain dense MLP")
    return (
        [i for _, i, _ in kernels],
        [i for _, i, _ in biases],
        [s for _, _, s in kernels],
    )


def params_to_kernel_layout(params, kernel_idx, bias_idx):
    """Flax params tree -> (W^T list [out,in], bias list [1,out])."""
    leaves = jax.tree_util.tree_flatten(params)[0]
    Ws = [jnp.asarray(leaves[i]).T for i in kernel_idx]
    bs = [jnp.asarray(leaves[i])[None, :] for i in bias_idx]
    return Ws, bs


def kernel_layout_to_params(Ws, bs, params_example, kernel_idx, bias_idx):
    """Inverse of params_to_kernel_layout (shapes from params_example)."""
    leaves, treedef = jax.tree_util.tree_flatten(params_example)
    leaves = list(leaves)
    for k, i in enumerate(kernel_idx):
        leaves[i] = Ws[k].T
    for k, i in enumerate(bias_idx):
        leaves[i] = bs[k][0]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def mlp_forward_transposed(x: Array, Ws, bs, activations) -> Array:
    """Plain-XLA forward with [out, in] weights (for policy scoring)."""
    h = x
    for i, (w, b) in enumerate(zip(Ws, bs)):
        h = jax.lax.dot_general(
            h, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        h = _act(activations[i], h)
    return h


def _numeric_layer_key(name: str):
    import re

    m = re.search(r"_(\d+)$", name)
    return (re.sub(r"_\d+$", "", name), int(m.group(1)) if m else -1)
