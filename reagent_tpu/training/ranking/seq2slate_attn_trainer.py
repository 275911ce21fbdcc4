"""Seq2Slate pairwise-attention trainer: encoder-only supervised ranking.

Reference: reagent/training/ranking/seq2slate_attn_trainer.py:26-157 — no
decoder; the encoder scores each slate position and trains with a KL loss
against the observed position rewards (https://arxiv.org/pdf/1904.06813.pdf).
Eval computes DCG/NDCG/MAP/AUC of the ranked slate vs. the logged baseline.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.models.seq2slate import Seq2SlateMode, Seq2SlateTransformerModel
from reagent_tpu.optim import make_optimizer  # noqa: F401 (re-exported union)

Array = jax.Array


@struct.dataclass
class Seq2SlatePairwiseAttnTrainerState:
    params: Any
    opt_state: Any
    step: Array


class Seq2SlatePairwiseAttnTrainer:
    def __init__(
        self,
        seq2slate_net: Seq2SlateTransformerModel,
        slate_size: int,
        calc_cpe: bool = False,
        policy_optimizer: Any = None,
    ) -> None:
        self.seq2slate_net = seq2slate_net
        self.slate_size = slate_size
        self.calc_cpe = calc_cpe
        self.policy_opt = make_optimizer(policy_optimizer)

    def init(
        self, rng: Array, batch_proto: rlt.PreprocessedRankingInput
    ) -> Seq2SlatePairwiseAttnTrainerState:
        params = self.seq2slate_net.init(
            rng,
            Seq2SlateMode.ENCODER_SCORE_MODE.value,
            batch_proto.state.float_features,
            batch_proto.src_seq.float_features,
            tgt_out_idx=batch_proto.tgt_out_idx,
        )
        return Seq2SlatePairwiseAttnTrainerState(
            params=params,
            opt_state=self.policy_opt.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self,
        state: Seq2SlatePairwiseAttnTrainerState,
        batch: rlt.PreprocessedRankingInput,
    ) -> Tuple[Seq2SlatePairwiseAttnTrainerState, Dict[str, Array]]:
        def loss_fn(params):
            out = self.seq2slate_net.apply(
                params,
                Seq2SlateMode.ENCODER_SCORE_MODE.value,
                batch.state.float_features,
                batch.src_seq.float_features,
                tgt_out_idx=batch.tgt_out_idx,
            )
            log_pred = jax.nn.log_softmax(out.encoder_scores, axis=1)
            # KLDivLoss(batchmean): sum target * (log target - log pred) / B
            target = batch.position_reward
            safe_log_t = jnp.where(target > 0, jnp.log(jnp.maximum(target, 1e-20)), 0.0)
            kl = jnp.sum(target * (safe_log_t - log_pred)) / target.shape[0]
            return kl

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.policy_opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            Seq2SlatePairwiseAttnTrainerState(
                params=params, opt_state=opt_state, step=state.step + 1
            ),
            {"train_cross_entropy_loss": loss},
        )

    # ------------------------------------------------------------- evaluate

    def validation_metrics(
        self, state: Seq2SlatePairwiseAttnTrainerState, batch: rlt.PreprocessedRankingInput,
        rng: Array,
    ) -> Dict[str, float]:
        """NDCG/DCG/MAP/AUC of ranked vs logged slates (ref :78-157)."""
        from sklearn.metrics import (
            average_precision_score,
            dcg_score,
            ndcg_score,
            roc_auc_score,
        )

        # eval CE loss against the position rewards (reference :85-92)
        enc = self.seq2slate_net.apply(
            state.params,
            Seq2SlateMode.ENCODER_SCORE_MODE.value,
            batch.state.float_features,
            batch.src_seq.float_features,
            tgt_out_idx=batch.tgt_out_idx,
        )
        log_pred = jax.nn.log_softmax(enc.encoder_scores, axis=1)
        target = batch.position_reward
        safe_log_t = jnp.where(target > 0, jnp.log(jnp.maximum(target, 1e-20)), 0.0)
        ce_loss = float(jnp.sum(target * (safe_log_t - log_pred)) / target.shape[0])

        out = self.seq2slate_net.apply(
            state.params,
            Seq2SlateMode.RANK_MODE.value,
            batch.state.float_features,
            batch.src_seq.float_features,
            tgt_seq_len=self.slate_size,
            greedy=True,
            rng=rng,
        )
        ranked_idx = np.asarray(out.ranked_tgt_out_idx) - 2
        logged_idx = np.asarray(batch.tgt_out_idx) - 2
        position_reward = np.asarray(batch.position_reward)
        B = position_reward.shape[0]
        score_bar = np.arange(self.slate_size, 0, -1)

        dcgs, ndcgs, maps, aucs = [], [], [], []
        base_dcgs, base_ndcgs, base_maps, base_aucs = [], [], [], []
        for i in range(B):
            labels = position_reward[i].astype(bool)
            if not labels.any() or labels.all():
                continue
            ranked_scores = np.zeros(self.slate_size)
            ranked_scores[ranked_idx[i]] = score_bar
            truth_scores = np.zeros(self.slate_size)
            truth_scores[logged_idx[i]] = position_reward[i]
            base_scores = np.zeros(self.slate_size)
            base_scores[logged_idx[i]] = score_bar
            maps.append(average_precision_score(truth_scores, ranked_scores))
            base_maps.append(average_precision_score(truth_scores, base_scores))
            aucs.append(roc_auc_score(truth_scores, ranked_scores))
            base_aucs.append(roc_auc_score(truth_scores, base_scores))
            t2, r2, b2 = truth_scores[None], ranked_scores[None], base_scores[None]
            dcgs.append(dcg_score(t2, r2))
            ndcgs.append(ndcg_score(t2, r2))
            base_dcgs.append(dcg_score(t2, b2))
            base_ndcgs.append(ndcg_score(t2, b2))
        mean = lambda xs: float(np.mean(xs)) if xs else float("nan")
        return {
            "eval_cross_entropy_loss": ce_loss,
            "eval_dcg": mean(dcgs),
            "eval_ndcg": mean(ndcgs),
            "eval_mean_ap": mean(maps),
            "eval_auc": mean(aucs),
            "eval_base_dcg": mean(base_dcgs),
            "eval_base_ndcg": mean(base_ndcgs),
            "eval_base_map": mean(base_maps),
            "eval_base_auc": mean(base_aucs),
        }
