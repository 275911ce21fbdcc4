"""Pre-KV-cache seq2slate checkpoints remap losslessly into the current
model (utils/checkpoint_compat.py).

The fixture tests/data/seq2slate_pre_kv_cache.py is the ACTUAL pre-rewrite
module (git 233def8~1): its params are initialized fresh, remapped, and the
current model must produce IDENTICAL per-seq log-probs with them.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.utils.checkpoint_compat import (
    remap_pre_kv_cache_seq2slate_params,
)

_FIXTURE = os.path.join(os.path.dirname(__file__), "data", "seq2slate_pre_kv_cache.py")


def _load_old_module():
    import sys

    spec = importlib.util.spec_from_file_location("old_seq2slate", _FIXTURE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["old_seq2slate"] = mod  # flax dataclasses resolve cls.__module__
    spec.loader.exec_module(mod)
    return mod


def test_remap_pre_kv_cache_params_bit_equal():
    old = _load_old_module()
    from reagent_tpu.models.seq2slate import (
        Seq2SlateMode,
        Seq2SlateOutputArch,
        Seq2SlateTransformerModel,
    )

    cfg = dict(
        state_dim=5, candidate_dim=7, num_stacked_layers=2, num_heads=2,
        dim_model=16, dim_feedforward=32, max_src_seq_len=6, max_tgt_seq_len=4,
    )
    g = np.random.default_rng(0)
    B, S, T = 3, cfg["max_src_seq_len"], cfg["max_tgt_seq_len"]
    state = jnp.asarray(g.normal(size=(B, cfg["state_dim"])), jnp.float32)
    src = jnp.asarray(g.normal(size=(B, S, cfg["candidate_dim"])), jnp.float32)
    tgt_out = jnp.asarray(
        np.stack([g.permutation(S)[:T] + 2 for _ in range(B)]), jnp.int32
    )
    tgt_in = jnp.concatenate([jnp.ones((B, 1), jnp.int32), tgt_out[:, :-1]], 1)
    cand = jnp.concatenate(
        [jnp.zeros((B, 2, cfg["candidate_dim"])), src], axis=1
    )
    tgt_in_seq = jnp.take_along_axis(cand, tgt_in[:, :, None], axis=1)

    old_model = old.Seq2SlateTransformerModel(
        **cfg, output_arch=old.Seq2SlateOutputArch.AUTOREGRESSIVE
    )
    kwargs = dict(
        state=state, src_seq=src, tgt_in_seq=tgt_in_seq,
        tgt_in_idx=tgt_in, tgt_out_idx=tgt_out,
    )
    old_params = old_model.init(
        jax.random.PRNGKey(0),
        old.Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value,
        **kwargs,
    )
    old_out = old_model.apply(
        old_params, old.Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value, **kwargs
    ).per_seq_log_probs

    new_model = Seq2SlateTransformerModel(
        **cfg, output_arch=Seq2SlateOutputArch.AUTOREGRESSIVE
    )
    new_params = remap_pre_kv_cache_seq2slate_params(
        jax.tree_util.tree_map(lambda x: x, old_params)
    )
    # the remapped tree must match the new model's structure exactly
    want = jax.tree_util.tree_structure(
        new_model.init(
            jax.random.PRNGKey(1),
            Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value, **kwargs,
        )
    )
    got = jax.tree_util.tree_structure(new_params)
    assert got == want, f"\nremapped: {got}\nexpected: {want}"

    new_out = new_model.apply(
        new_params, Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value, **kwargs
    ).per_seq_log_probs
    # not bit-exact: flax MHA scales q before the dot, CachedSelfAttention
    # scales the logits after — same math, one extra f32 rounding
    np.testing.assert_allclose(
        np.asarray(new_out), np.asarray(old_out), rtol=1e-5, atol=1e-6
    )
