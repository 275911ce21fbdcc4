"""DPP slate re-ranker: greedy determinant maximization for diversity.

Reference: reagent/prediction/ranking/predictor_wrapper.py:21-126
(http://jgillenw.com/cikm2018.pdf Algorithm 1) — build a quality/diversity
kernel L and greedily pick items maximizing the chosen-set determinant.

TPU-native: instead of the reference's per-step submatrix ``torch.det``
(O(n * k^4)), the greedy MAP uses the incremental-Cholesky identity (Chen et
al. 2018): each item's marginal log-det gain is ``log d_i^2``, updated in
O(n) per pick — one ``lax.scan`` over slate positions, all static shapes.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Kernel(enum.Enum):
    Linear = "linear"
    RBF = "rbf"


MIN_VALUE = -3.4e38


class DeterminantalPointProcessPredictorWrapper:
    def __init__(
        self,
        alpha: float,
        kernel: Kernel = Kernel.Linear,
        sigma: float = 1.0,
        rerank_topk: Optional[int] = None,
    ) -> None:
        self.alpha = alpha
        self.kernel = kernel
        self.sigma = sigma
        self.rerank_topk = rerank_topk
        if rerank_topk is not None:
            assert rerank_topk > 0
        self._fn = jax.jit(self._forward)

    # ------------------------------------------------------------ kernel

    def _build_kernel(self, quality_scores: Array, feature_vectors: Array) -> Array:
        q = quality_scores.astype(jnp.float32)
        f = feature_vectors.astype(jnp.float32)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        n = q.shape[0]
        if self.kernel == Kernel.Linear:
            B = (self.alpha**0.5) * q * f
            L = B @ B.T
            L = L.at[jnp.arange(n), jnp.arange(n)].set(q.reshape(-1) ** 2)
        elif self.kernel == Kernel.RBF:
            d2 = jnp.sum((f[:, None, :] - f[None, :, :]) ** 2, axis=-1)
            L = self.alpha * (q @ q.T) * jnp.exp(-d2 / (2 * self.sigma**2))
        else:
            raise NotImplementedError(self.kernel)
        return L

    # ----------------------------------------------------------- greedy MAP

    def _forward(self, quality_scores: Array, feature_vectors: Array):
        L = self._build_kernel(quality_scores, feature_vectors)
        n = L.shape[0]
        k = min(self.rerank_topk or n, n)

        # incremental Cholesky greedy MAP: d2[i] is item i's marginal det gain
        def step(carry, t):
            d2, C, chosen_mask = carry
            gains = jnp.where(chosen_mask, MIN_VALUE, d2)
            j = jnp.argmax(gains)
            # update c_i := (L_ij - <c_i, c_j>) / d_j for all i; when the
            # kernel is rank-deficient d_j ~ 0 — skip the update (all
            # remaining marginal gains are already ~0) to avoid inf/NaN
            degenerate = d2[j] < 1e-10
            e = jnp.where(
                degenerate,
                0.0,
                (L[:, j] - C @ C[j]) / jnp.sqrt(jnp.maximum(d2[j], 1e-12)),
            )
            C = C.at[:, t].set(e)
            d2 = jnp.maximum(d2 - e**2, 0.0)
            chosen_mask = chosen_mask.at[j].set(True)
            return (d2, C, chosen_mask), (j, gains)

        init = (jnp.diagonal(L), jnp.zeros((n, k)), jnp.zeros(n, bool))
        (_, _, chosen_mask), (chosen, dets) = jax.lax.scan(
            step, init, jnp.arange(k)
        )
        if k < n:
            # append unchosen items in original order (ref :75-78)
            idx = jnp.nonzero(~chosen_mask, size=n - k, fill_value=0)[0]
            chosen = jnp.concatenate([chosen, idx])
        return chosen, dets, L

    def __call__(
        self, quality_scores: Array, feature_vectors: Array
    ) -> Tuple[Array, Array, Array]:
        """(num_items, 1) scores + (num_items, F) features ->
        (chosen order, per-step marginal gains, kernel L)."""
        return self._fn(quality_scores, feature_vectors)


class SlateRankingPreprocessor:
    """Preprocess (state, candidate-slate) raw features into dense inputs.

    Reference: prediction/predictor_wrapper.py:495-545 — candidates are
    flattened to [B*C, F] so one vectorized Preprocessor call covers the whole
    slate, then reshaped back.
    """

    def __init__(self, state_preprocessor, candidate_preprocessor, candidate_size: int):
        self.state_preprocessor = state_preprocessor
        self.candidate_preprocessor = candidate_preprocessor
        self.candidate_size = candidate_size
        self._fn = jax.jit(self._forward)

    def _forward(self, state_vp, candidate_vp):
        B, C, F = candidate_vp[0].shape
        state = self.state_preprocessor(*state_vp)
        cand = self.candidate_preprocessor(
            candidate_vp[0].reshape(B * C, F), candidate_vp[1].reshape(B * C, F)
        ).reshape(B, C, -1)
        return state, cand

    def __call__(self, state_vp, candidate_vp):
        return self._fn(state_vp, candidate_vp)


class Seq2SlateWithPreprocessor:
    """Preprocess + greedy/sampled Seq2Slate ranking in one jitted forward.

    Reference: prediction/predictor_wrapper.py:548-614.  The reference's
    trace-vs-script split (iterative decoders can't be traced) dissolves:
    the autoregressive decode is a ``lax.scan`` so every output arch jits.
    """

    def __init__(
        self, model, params, state_preprocessor, candidate_preprocessor,
        greedy: bool,
    ):
        # model: Seq2SlateTransformerNet (batch wrapper); params: its weights
        self.model = model
        self.params = params
        self.greedy = greedy
        self.preprocessor = SlateRankingPreprocessor(
            state_preprocessor, candidate_preprocessor,
            model.seq2slate.max_src_seq_len,
        )
        self._fn = jax.jit(self._forward)

    def _forward(self, state_vp, candidate_vp, rng):
        state, candidates = self.preprocessor._forward(state_vp, candidate_vp)
        max_src_seq_len = candidates.shape[1]
        res = self.model.seq2slate.apply(
            self.params,
            "rank",
            state,
            candidates,
            tgt_seq_len=max_src_seq_len,
            greedy=self.greedy,
            rng=rng,
        )
        return (
            res.ranked_per_symbol_probs,
            res.ranked_per_seq_probs,
            res.ranked_tgt_out_idx,
        )

    def __call__(self, state_vp, candidate_vp, rng: Optional[Array] = None):
        if rng is None and not self.greedy:
            raise ValueError("sampled ranking requires an rng key")
        return self._fn(state_vp, candidate_vp, rng)


class Seq2SlatePredictorWrapper:
    """Serving facade: returns (per-seq propensity, 0-based ranked indices).

    Reference: prediction/predictor_wrapper.py:616-640 (the -2 offset removes
    the PAD and DECODER_START vocabulary symbols).
    """

    def __init__(self, seq2slate_with_preprocessor: Seq2SlateWithPreprocessor):
        self.model = seq2slate_with_preprocessor

    def __call__(self, state_vp, candidate_vp, rng: Optional[Array] = None):
        _, ranked_per_seq_probs, ranked_tgt_out_idx = self.model(
            state_vp, candidate_vp, rng
        )
        return ranked_per_seq_probs, ranked_tgt_out_idx - 2


class Seq2SlateRewardWithPreprocessor:
    """Score the first max_tgt_seq_len candidates with a slate-reward net.

    Reference: prediction/predictor_wrapper.py:740-826.
    """

    def __init__(
        self, model, params, max_src_seq_len: int, max_tgt_seq_len: int,
        state_preprocessor=None, candidate_preprocessor=None,
    ):
        self.model = model
        self.params = params
        self.max_src_seq_len = max_src_seq_len
        self.max_tgt_seq_len = max_tgt_seq_len
        self.state_preprocessor = state_preprocessor
        self.candidate_preprocessor = candidate_preprocessor
        self._fn = jax.jit(self._forward)

    def _forward(self, state_vp, candidate_vp):
        from reagent_tpu.core import types as rlt

        B = state_vp[0].shape[0]
        if self.state_preprocessor is not None:
            state = self.state_preprocessor(*state_vp)
        else:
            state = state_vp[0]
        if self.candidate_preprocessor is not None:
            C, F = candidate_vp[0].shape[1], candidate_vp[0].shape[2]
            candidates = self.candidate_preprocessor(
                candidate_vp[0].reshape(B * C, F), candidate_vp[1].reshape(B * C, F)
            ).reshape(B, C, -1)
        else:
            candidates = candidate_vp[0]
        # fake slate = first max_tgt_seq_len candidates (ref :786-812)
        tgt_out_idx = jnp.broadcast_to(
            jnp.arange(self.max_tgt_seq_len)[None, :], (B, self.max_tgt_seq_len)
        )
        tgt_out_seq = jnp.take_along_axis(
            candidates, tgt_out_idx[:, :, None], axis=1
        )
        ranking_input = rlt.PreprocessedRankingInput(
            state=rlt.FeatureData(float_features=state),
            src_seq=rlt.FeatureData(float_features=candidates),
            tgt_out_seq=rlt.FeatureData(float_features=tgt_out_seq),
            tgt_out_idx=tgt_out_idx + 2,
        )
        out = self.model.apply(self.params, ranking_input)
        return out[:, 0] if out.ndim == 2 else out

    def __call__(self, state_vp, candidate_vp):
        return self._fn(state_vp, candidate_vp)


class RankingActorWithPreprocessor:
    """Actor over (state, candidate docs) with per-side preprocessors.

    Reference: prediction/predictor_wrapper.py:376-424.
    """

    def __init__(
        self, model, params, state_preprocessor, candidate_preprocessor,
        num_candidates: int, action_postprocessor=None,
    ):
        self.model = model
        self.params = params
        self.state_preprocessor = state_preprocessor
        self.candidate_preprocessor = candidate_preprocessor
        self.num_candidates = num_candidates
        self.action_postprocessor = action_postprocessor
        self._fn = jax.jit(self._forward)

    def _forward(self, state_vp, candidate_vp):
        from reagent_tpu.core import types as rlt

        B, C, F = candidate_vp[0].shape
        state = self.state_preprocessor(*state_vp)
        candidates = self.candidate_preprocessor(
            candidate_vp[0].reshape(B * C, F), candidate_vp[1].reshape(B * C, F)
        ).reshape(B, C, -1)
        feat = rlt.FeatureData(
            float_features=state,
            candidate_docs=rlt.DocList(float_features=candidates),
        )
        out = self.model.apply(self.params, feat)
        action = out.action if hasattr(out, "action") else out
        if self.action_postprocessor is not None:
            action = self.action_postprocessor(action)
        return action

    def __call__(self, state_vp, candidate_vp):
        assert candidate_vp[0].shape[1] == self.num_candidates
        return self._fn(state_vp, candidate_vp)


class RankingActorPredictorWrapper:
    """Serving facade over RankingActorWithPreprocessor (reference :427-450)."""

    def __init__(
        self, actor_with_preprocessor: RankingActorWithPreprocessor,
        action_feature_ids: Optional[list] = None,
    ):
        self.model = actor_with_preprocessor
        self.action_feature_ids = action_feature_ids or []

    def __call__(self, state_vp, candidate_vp) -> Array:
        return self.model(state_vp, candidate_vp)
