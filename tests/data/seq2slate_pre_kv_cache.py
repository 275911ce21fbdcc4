"""Seq2Slate: pointer-network transformer for slate re-ranking.

Reference: reagent/models/seq2slate.py:35-980 (arXiv:1810.02019) and
reagent/model_utils/seq2slate_utils.py.  Vocabulary convention preserved:
index 0 = PADDING, 1 = DECODER_START, candidates at position i live at index
i + 2.  Three output architectures (seq2slate_utils.py:28-37):

* AUTOREGRESSIVE — decoder emits one candidate per step; the last decoder
  layer returns its (masked, head-averaged) attention weights over encoder
  memory as the pointer distribution (ref seq2slate.py:181-206).
* FRECHET_SORT — iterative softmax over static encoder scores.
* ENCODER_SCORE — rank purely by encoder scores.

TPU-native: pure flax module; autoregressive decoding is a ``lax.scan`` over
slate positions with a carried already-selected mask (static shapes), instead
of the reference's growing python loop.
"""

from __future__ import annotations

import enum
import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

PADDING_SYMBOL = 0
DECODER_START_SYMBOL = 1


class Seq2SlateMode(enum.Enum):
    RANK_MODE = "rank"
    PER_SEQ_LOG_PROB_MODE = "per_sequence_log_prob"
    PER_SYMBOL_LOG_PROB_DIST_MODE = "per_symbol_log_prob_dist"
    DECODE_ONE_STEP_MODE = "decode_one_step"
    ENCODER_SCORE_MODE = "encoder_score_mode"


class Seq2SlateOutputArch(enum.Enum):
    ENCODER_SCORE = "encoder_score"
    AUTOREGRESSIVE = "autoregressive"
    FRECHET_SORT = "frechet_sort"


class Seq2SlateTransformerOutput(NamedTuple):
    ranked_per_symbol_probs: Optional[Array] = None
    ranked_per_seq_probs: Optional[Array] = None
    ranked_tgt_out_idx: Optional[Array] = None
    per_symbol_log_probs: Optional[Array] = None
    per_seq_log_probs: Optional[Array] = None
    encoder_scores: Optional[Array] = None


def subsequent_mask(size: int) -> Array:
    """[1, T, T] causal mask: True = attend (ref seq2slate_utils.py:84)."""
    return ~jnp.triu(jnp.ones((1, size, size), bool), k=1)


def per_symbol_to_per_seq_probs(per_symbol_probs: Array, tgt_out_idx: Array) -> Array:
    """Product of chosen-symbol probs along the sequence (ref utils.py:150)."""
    probs = jnp.take_along_axis(per_symbol_probs, tgt_out_idx[:, :, None], axis=2)[..., 0]
    return jnp.clip(jnp.prod(probs, axis=1, keepdims=True), 1e-35)


def per_symbol_to_per_seq_log_probs(per_symbol_log_probs: Array, tgt_out_idx: Array) -> Array:
    lp = jnp.take_along_axis(per_symbol_log_probs, tgt_out_idx[:, :, None], axis=2)[..., 0]
    return jnp.sum(lp, axis=1, keepdims=True)


def mask_logits_by_idx(logits: Array, tgt_in_idx: Array) -> Array:
    """-inf at reserved symbols + already-selected items (ref utils.py:68-81)."""
    B, T, C = logits.shape
    logits = logits.at[:, :, :2].set(-jnp.inf)
    # selected[b, t, c] = 1 if c appears in tgt_in_idx[b, :t+1]
    onehot = jax.nn.one_hot(tgt_in_idx, C, dtype=jnp.float32)  # [B, T, C]
    selected = jnp.cumsum(onehot, axis=1) > 0
    return jnp.where(selected, -jnp.inf, logits)


class Embedder(nn.Module):
    """Linear embed scaled by sqrt(dim_out) (ref seq2slate.py:317-329)."""

    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(
            self.dim_out, kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(x) * math.sqrt(self.dim_out)


class PositionalEncoding(nn.Module):
    """Sinusoidal positions added to embeddings (ref seq2slate.py:331-356)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, T, D = x.shape
        pos = np.arange(T)[:, None]
        div = np.exp(np.arange(0, D, 2) * (-math.log(10000.0) / D))
        pe = np.zeros((T, D), np.float32)
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div[: (D + 1) // 2][: pe[:, 1::2].shape[1]])
        return x + jnp.asarray(pe)[None]


class FeedForward(nn.Module):
    dim_model: int
    dim_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(nn.Dense(
            self.dim_feedforward, kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(x))
        return nn.Dense(
            self.dim_model, kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(h)


class EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch default layout)."""

    dim_model: int
    num_heads: int
    dim_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.dim_model,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(x, x)
        x = nn.LayerNorm()(x + attn)
        ff = FeedForward(self.dim_model, self.dim_feedforward, dtype=self.dtype)(x)
        return nn.LayerNorm()(x + ff)


class DecoderLayer(nn.Module):
    """Standard decoder layer: causal self-attn + cross-attn + FF (post-LN)."""

    dim_model: int
    num_heads: int
    dim_feedforward: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, tgt_tgt_mask: Array, tgt_src_mask: Array) -> Array:
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim_model,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(tgt, tgt, mask=tgt_tgt_mask[:, None])
        tgt = nn.LayerNorm()(tgt + sa)
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim_model,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(tgt, memory, mask=tgt_src_mask[:, None])
        tgt = nn.LayerNorm()(tgt + ca)
        ff = FeedForward(self.dim_model, self.dim_feedforward, dtype=self.dtype)(tgt)
        return nn.LayerNorm()(tgt + ff)


class PointerLastLayer(nn.Module):
    """Final decoder layer -> head-averaged attention probs over memory.

    Reference: seq2slate.py:181-206 ``DecoderLastLayerPytorch``.
    """

    dim_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, tgt_tgt_mask: Array, tgt_src_mask: Array) -> Array:
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim_model,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
        )(tgt, tgt, mask=tgt_tgt_mask[:, None])
        tgt = nn.LayerNorm()(tgt + sa)
        # manual multi-head attention so we can return weights
        H, D = self.num_heads, self.dim_model
        dh = D // H
        q = nn.Dense(D, kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype)(tgt)
        k = nn.Dense(D, kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype)(memory)
        B, T, _ = q.shape
        S = memory.shape[1]
        q = q.reshape(B, T, H, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, dh).transpose(0, 2, 1, 3)
        # logits/softmax in f32: the pointer probs feed log-prob losses
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) / math.sqrt(dh)
        logits = jnp.where(tgt_src_mask[:, None], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.mean(probs, axis=1)  # [B, T, S]


class Seq2SlateTransformerModel(nn.Module):
    """Reference: seq2slate.py:382."""

    state_dim: int
    candidate_dim: int
    num_stacked_layers: int
    num_heads: int
    dim_model: int
    dim_feedforward: int
    max_src_seq_len: int
    max_tgt_seq_len: int
    output_arch: Seq2SlateOutputArch
    temperature: float = 1.0
    state_embed_dim: Optional[int] = None
    # bfloat16 activations keep the MXU fed at full rate; params stay f32 and
    # pointer-softmax/log-prob heads compute in f32 (TPU mixed precision)
    compute_dtype: Any = jnp.float32

    def setup(self):
        sed = self.state_embed_dim or self.dim_model // 2
        self.state_embedder = Embedder(sed, dtype=self.compute_dtype)
        self.candidate_embedder = Embedder(self.dim_model - sed, dtype=self.compute_dtype)
        self.encoder_layers = [
            EncoderLayer(self.dim_model, self.num_heads, self.dim_feedforward,
                         dtype=self.compute_dtype)
            for _ in range(self.num_stacked_layers)
        ]
        self.encoder_scorer = nn.Dense(1, kernel_init=nn.initializers.xavier_uniform())
        self.decoder_layers = [
            DecoderLayer(self.dim_model, self.num_heads, self.dim_feedforward,
                         dtype=self.compute_dtype)
            for _ in range(self.num_stacked_layers - 1)
        ] + [PointerLastLayer(self.dim_model, self.num_heads, dtype=self.compute_dtype)]
        self.positional_encoding_decoder = PositionalEncoding()

    # ------------------------------------------------------------- building

    def _embed(self, state: Array, seq: Array) -> Array:
        """Concat replicated state embed with per-item candidate embed (ref :771)."""
        B, T, _ = seq.shape
        cand = self.candidate_embedder(seq)  # [B, T, D - sed]
        sed = self.dim_model - cand.shape[-1]
        st = jnp.broadcast_to(self.state_embedder(state)[:, None, :], (B, T, sed))
        return jnp.concatenate([st, cand], axis=2)

    def encode(self, state: Array, src_seq: Array) -> Array:
        x = self._embed(state, src_seq)
        for layer in self.encoder_layers:
            x = layer(x)
        return x  # [B, S, D]

    def decode(self, memory: Array, state: Array, tgt_in_idx: Array, tgt_in_seq: Array) -> Array:
        """probs over candidate_size per tgt position (ref seq2slate.py:780-850)."""
        B, S, _ = memory.shape
        T = tgt_in_idx.shape[1]
        C = S + 2
        if self.output_arch == Seq2SlateOutputArch.FRECHET_SORT:
            enc_scores = self.encoder_scorer(memory)[..., 0]  # [B, S]
            logits = jnp.concatenate(
                [jnp.full((B, T, 2), -jnp.inf), jnp.broadcast_to(enc_scores[:, None], (B, T, S))],
                axis=2,
            )
            logits = mask_logits_by_idx(logits, tgt_in_idx)
            return jax.nn.softmax(logits, axis=2)
        if self.output_arch == Seq2SlateOutputArch.AUTOREGRESSIVE:
            tgt = self.positional_encoding_decoder(self._embed(state, tgt_in_seq))
            tgt_tgt_mask = jnp.broadcast_to(subsequent_mask(T), (B, T, T))
            # forbid candidates already selected up to each step (ref utils.py:163)
            onehot = jax.nn.one_hot(tgt_in_idx, C)  # [B, T, C]
            selected = jnp.cumsum(onehot, axis=1) > 0  # [B, T, C]
            tgt_src_mask = ~selected[:, :, 2:]  # True = attend
            x = tgt
            for layer in self.decoder_layers[:-1]:
                x = layer(x, memory, tgt_tgt_mask, tgt_src_mask)
            probs_src = self.decoder_layers[-1](x, memory, tgt_tgt_mask, tgt_src_mask)
            return jnp.concatenate([jnp.zeros((B, T, 2)), probs_src], axis=2)
        raise NotImplementedError(self.output_arch)

    # ---------------------------------------------------------------- modes

    def __call__(
        self,
        mode: str,
        state: Array,
        src_seq: Array,
        tgt_in_idx: Optional[Array] = None,
        tgt_out_idx: Optional[Array] = None,
        tgt_in_seq: Optional[Array] = None,
        tgt_seq_len: Optional[int] = None,
        greedy: Optional[bool] = None,
        rng: Optional[Array] = None,
    ) -> Seq2SlateTransformerOutput:
        if mode == Seq2SlateMode.RANK_MODE.value:
            return self.rank(state, src_seq, tgt_seq_len or self.max_tgt_seq_len, bool(greedy), rng)
        if mode in (
            Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value,
            Seq2SlateMode.PER_SYMBOL_LOG_PROB_DIST_MODE.value,
        ):
            return self.log_probs(state, src_seq, tgt_in_seq, tgt_in_idx, tgt_out_idx, mode)
        if mode == Seq2SlateMode.ENCODER_SCORE_MODE.value:
            return self.encoder_output_to_scores(state, src_seq, tgt_out_idx)
        raise NotImplementedError(mode)

    def rank(
        self, state: Array, src_seq: Array, tgt_seq_len: int, greedy: bool,
        rng: Optional[Array] = None,
    ) -> Seq2SlateTransformerOutput:
        """Reference seq2slate.py:554-605."""
        B, S, cdim = src_seq.shape
        C = S + 2
        candidate_features = jnp.concatenate(
            [jnp.zeros((B, 2, cdim)), src_seq], axis=1
        )
        memory = self.encode(state, src_seq)

        if self.output_arch == Seq2SlateOutputArch.ENCODER_SCORE:
            enc_scores = self.encoder_scorer(memory)[..., 0]
            tgt_out_idx = jnp.argsort(-enc_scores, axis=1)[:, :tgt_seq_len] + 2
            per_symbol = jax.nn.one_hot(tgt_out_idx, C)
        elif self.output_arch == Seq2SlateOutputArch.FRECHET_SORT and greedy:
            tgt_in_idx = jnp.full((B, 1), DECODER_START_SYMBOL, jnp.int32)
            tgt_in_seq = jnp.take_along_axis(
                candidate_features, tgt_in_idx[:, :, None], axis=1
            )
            probs = self.decode(memory, state, tgt_in_idx, tgt_in_seq)[:, -1]
            tgt_out_idx = jnp.argsort(-probs, axis=1)[:, :tgt_seq_len]
            per_symbol = jax.nn.one_hot(tgt_out_idx, C)
        else:
            tgt_out_idx, per_symbol = self._autoregressive_rank(
                state, memory, candidate_features, tgt_seq_len, greedy, rng
            )
        per_seq = per_symbol_to_per_seq_probs(per_symbol, tgt_out_idx)
        return Seq2SlateTransformerOutput(
            ranked_per_symbol_probs=per_symbol,
            ranked_per_seq_probs=per_seq,
            ranked_tgt_out_idx=tgt_out_idx,
        )

    def _autoregressive_rank(
        self, state: Array, memory: Array, candidate_features: Array,
        tgt_seq_len: int, greedy: bool, rng: Optional[Array],
    ):
        """lax.scan over slate positions with a fixed-size tgt buffer."""
        B, C, cdim = candidate_features.shape
        T = tgt_seq_len
        if rng is None:
            if not greedy:
                raise ValueError(
                    "sampled ranking (greedy=False) requires an explicit rng key;"
                    " without one every call would return the same slate"
                )
            rng = jax.random.PRNGKey(0)  # unused by the greedy argmax path

        # fixed-size tgt_in_idx buffer [B, T+1]; position 0 = start symbol
        init_idx = jnp.full((B, T + 1), PADDING_SYMBOL, jnp.int32)
        init_idx = init_idx.at[:, 0].set(DECODER_START_SYMBOL)

        def step(mdl, carry, t):
            tgt_in_idx_buf, rng = carry
            rng, r = jax.random.split(rng)
            prefix = tgt_in_idx_buf[:, :T]  # static length; padded after t
            tgt_in_seq = jnp.take_along_axis(
                candidate_features, prefix[:, :, None], axis=1
            )
            probs_all = mdl.decode(memory, state, prefix, tgt_in_seq)  # [B, T, C]
            probs = jnp.take_along_axis(
                probs_all, jnp.full((B, 1, 1), t), axis=1
            )[:, 0]  # [B, C] at position t
            if greedy:
                nxt = jnp.argmax(probs, axis=1)
            else:
                logits = jnp.log(jnp.clip(probs, 1e-35)) / self.temperature
                nxt = jax.random.categorical(r, logits, axis=1)
            tgt_in_idx_buf = jax.vmap(
                lambda buf, i, v: buf.at[i].set(v), in_axes=(0, None, 0)
            )(tgt_in_idx_buf, t + 1, nxt.astype(jnp.int32))
            return (tgt_in_idx_buf, rng), probs

        # lifted scan: params shared (broadcast) across slate positions
        scan_step = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
        )
        (tgt_buf, _), probs_seq = scan_step(self, (init_idx, rng), jnp.arange(T))
        tgt_out_idx = tgt_buf[:, 1:]
        per_symbol = jnp.transpose(probs_seq, (1, 0, 2))  # [B, T, C]
        return tgt_out_idx, per_symbol

    def log_probs(
        self, state, src_seq, tgt_in_seq, tgt_in_idx, tgt_out_idx, mode: str
    ) -> Seq2SlateTransformerOutput:
        memory = self.encode(state, src_seq)
        probs = self.decode(memory, state, tgt_in_idx, tgt_in_seq)
        if mode == Seq2SlateMode.PER_SYMBOL_LOG_PROB_DIST_MODE.value:
            return Seq2SlateTransformerOutput(
                per_symbol_log_probs=jnp.log(jnp.clip(probs, 1e-35))
            )
        per_seq_log_probs = jnp.log(per_symbol_to_per_seq_probs(probs, tgt_out_idx))
        return Seq2SlateTransformerOutput(per_seq_log_probs=per_seq_log_probs)

    def encoder_output_to_scores(self, state, src_seq, tgt_out_idx) -> Seq2SlateTransformerOutput:
        memory = self.encode(state, src_seq)
        slate_mem = jnp.take_along_axis(
            memory, (tgt_out_idx - 2)[:, :, None], axis=1
        )
        scores = self.encoder_scorer(slate_mem)[..., 0]
        return Seq2SlateTransformerOutput(encoder_scores=scores)


class Seq2SlateTransformerNet:
    """Batch-level convenience wrapper over Seq2SlateTransformerModel.

    Reference: models/seq2slate.py:847 (Seq2SlateNet) and :936
    (Seq2SlateTransformerNet) — a ModelBase that dispatches a
    PreprocessedRankingInput by mode.  Here params are explicit (functional),
    so the wrapper binds (module, params) and unpacks the typed batch; the
    reference's _DistributedSeq2SlateNet DDP wrapper dissolves into
    data-parallel sharding of the batch pytree.
    """

    def __init__(
        self,
        state_dim: int,
        candidate_dim: int,
        num_stacked_layers: int,
        num_heads: int,
        dim_model: int,
        dim_feedforward: int,
        max_src_seq_len: int,
        max_tgt_seq_len: int,
        output_arch: Seq2SlateOutputArch = Seq2SlateOutputArch.AUTOREGRESSIVE,
        temperature: float = 1.0,
        compute_dtype: Any = jnp.float32,
    ):
        self.seq2slate = Seq2SlateTransformerModel(
            state_dim=state_dim,
            candidate_dim=candidate_dim,
            num_stacked_layers=num_stacked_layers,
            num_heads=num_heads,
            dim_model=dim_model,
            dim_feedforward=dim_feedforward,
            max_src_seq_len=max_src_seq_len,
            max_tgt_seq_len=max_tgt_seq_len,
            output_arch=output_arch,
            temperature=temperature,
            compute_dtype=compute_dtype,
        )
        self.max_tgt_seq_len = max_tgt_seq_len

    def init(self, rng, batch) -> Any:
        return self.seq2slate.init(
            rng,
            Seq2SlateMode.RANK_MODE.value,
            batch.state.float_features,
            batch.src_seq.float_features,
            tgt_seq_len=self.max_tgt_seq_len,
            greedy=True,
            rng=rng,
        )

    def __call__(
        self,
        params,
        batch,
        mode: Seq2SlateMode,
        tgt_seq_len: Optional[int] = None,
        greedy: Optional[bool] = None,
        rng=None,
    ) -> Seq2SlateTransformerOutput:
        mode_value = mode.value if isinstance(mode, Seq2SlateMode) else mode
        kwargs = {}
        if mode_value == Seq2SlateMode.RANK_MODE.value:
            kwargs = dict(
                tgt_seq_len=tgt_seq_len or self.max_tgt_seq_len,
                greedy=bool(greedy),
                rng=rng,
            )
        elif mode_value in (
            Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value,
            Seq2SlateMode.PER_SYMBOL_LOG_PROB_DIST_MODE.value,
        ):
            kwargs = dict(
                tgt_in_idx=batch.tgt_in_idx,
                tgt_out_idx=batch.tgt_out_idx,
                tgt_in_seq=batch.tgt_in_seq.float_features,
            )
        elif mode_value == Seq2SlateMode.ENCODER_SCORE_MODE.value:
            kwargs = dict(tgt_out_idx=batch.tgt_out_idx)
        return self.seq2slate.apply(
            params,
            mode_value,
            batch.state.float_features,
            batch.src_seq.float_features,
            **kwargs,
        )
