"""SlateQ trainer (slate decomposition of Q-learning for recsys).

Reference: reagent/training/slate_q_trainer.py:35-280 (SlateQ, Ie et al. 2019):
Q(s, slate) decomposes into per-item Q(s, d) weighted by the user-choice model
(softmax over doc values); next-slate selection is top-k on target item-Qs.
"""

from __future__ import annotations

import enum
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.optim import make_optimizer, soft_update

Array = jax.Array


class NextSlateValueNormMethod(enum.Enum):
    NORM_BY_CURRENT_SLATE_SIZE = "norm_by_current_slate_size"
    NORM_BY_NEXT_SLATE_SIZE = "norm_by_next_slate_size"


@struct.dataclass
class SlateQTrainerState:
    q_params: Any
    q_target_params: Any
    opt_state: Any
    step: Array


class SlateQTrainer:
    """``q_network`` is a parametric critic: (state [B,S], doc [B,D]) -> [B,1]."""

    def __init__(
        self,
        q_network: nn.Module,
        slate_size: int,
        rl: RLParameters = RLParameters(maxq_learning=False),
        optimizer: Any = None,
        single_selection: bool = True,
        next_slate_value_norm_method: NextSlateValueNormMethod = (
            NextSlateValueNormMethod.NORM_BY_CURRENT_SLATE_SIZE
        ),
        discount_time_scale: Optional[float] = None,
        emit_reporter_arrays: bool = False,
    ) -> None:
        self.emit_reporter_arrays = emit_reporter_arrays
        self.q_network = q_network
        self.slate_size = slate_size
        self.rl = rl
        self.gamma = rl.gamma
        self.tau = rl.target_update_rate
        self.maxq_learning = rl.maxq_learning
        self.optimizer = make_optimizer(optimizer)
        self.single_selection = single_selection
        self.next_slate_value_norm_method = next_slate_value_norm_method
        self.discount_time_scale = discount_time_scale

    def init(self, rng: Array, state_proto: Array, doc_proto: Array) -> SlateQTrainerState:
        q_params = self.q_network.init(rng, state_proto, doc_proto)
        return SlateQTrainerState(
            q_params=q_params,
            q_target_params=jax.tree_util.tree_map(jnp.copy, q_params),
            opt_state=self.optimizer.init(q_params),
            step=jnp.zeros((), jnp.int32),
        )

    # -- helpers (reference slate_q_trainer.py:107-185) ---------------------

    def _item_q_values(self, params, state: rlt.FeatureData, docs: rlt.DocList) -> Array:
        """Per-item Q(s, d): [B, K]."""
        B, K, D = docs.float_features.shape
        tiled_state = jnp.repeat(state.float_features, K, axis=0)
        q = self.q_network.apply(params, tiled_state, docs.float_features.reshape(B * K, D))
        return q.reshape(B, K)

    def _docs_value(self, docs: rlt.DocList) -> Array:
        value = docs.value * docs.mask
        if self.single_selection:
            value = jax.nn.softmax(value, axis=1)
        return value

    def _slate_size_of(self, state: rlt.FeatureData) -> Array:
        mask = state.candidate_docs.mask
        return jnp.minimum(
            jnp.sum(mask, axis=1, keepdims=True), float(self.slate_size)
        )

    def _maxq_topk_next_action(self, tstate, next_state: rlt.FeatureData) -> Array:
        docs = next_state.candidate_docs
        B, K, _ = docs.float_features.shape
        q = self._item_q_values(tstate.q_target_params, next_state, docs)
        q = q * self._docs_value(docs)
        _, top_idx = jax.lax.top_k(q, self.slate_size)
        return top_idx

    # -- train step ---------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: SlateQTrainerState, batch: rlt.SlateQInput
    ) -> Tuple[SlateQTrainerState, Dict[str, Array]]:
        reward = batch.reward  # [B, slate]
        reward_mask = batch.reward_mask.astype(jnp.float32)
        not_terminal = batch.not_terminal.astype(jnp.float32)

        discount = jnp.full_like(reward, self.gamma)
        if self.discount_time_scale is not None:
            discount = self.gamma ** (
                batch.time_diff.astype(jnp.float32) / self.discount_time_scale
            )

        if self.maxq_learning:
            next_action = self._maxq_topk_next_action(state, batch.next_state)
        else:
            next_action = batch.next_action
        # zero out indices on terminal rows so gathers stay in-bounds
        next_action = jnp.where(
            not_terminal.reshape(-1, 1) > 0, next_action, jnp.zeros_like(next_action)
        )
        next_docs = batch.next_state.candidate_docs.select_slate(next_action)
        next_q = jnp.sum(
            self._item_q_values(state.q_target_params, batch.next_state, next_docs)
            * self._docs_value(next_docs),
            axis=1,
            keepdims=True,
        )
        if not self.single_selection:
            if self.next_slate_value_norm_method == NextSlateValueNormMethod.NORM_BY_NEXT_SLATE_SIZE:
                next_q = next_q / self._slate_size_of(batch.next_state)
            else:
                next_q = next_q / self._slate_size_of(batch.state)

        filtered_next_q = next_q * not_terminal
        target_q = jax.lax.stop_gradient(reward + discount * filtered_next_q)

        action_docs = batch.state.candidate_docs.select_slate(batch.action)

        def loss_fn(params):
            q = self._item_q_values(params, batch.state, action_docs)  # [B, slate]
            if self.single_selection:
                # masked MSE over positions with observed reward
                err = (q - target_q) ** 2 * reward_mask
                loss = jnp.sum(err) / jnp.maximum(jnp.sum(reward_mask), 1.0)
            else:
                loss = jnp.mean((q - target_q) ** 2)
            return loss, q

        (value_loss, q_vals), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.q_params
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.q_params)
        q_params = optax.apply_updates(state.q_params, updates)

        return (
            SlateQTrainerState(
                q_params=q_params,
                q_target_params=soft_update(q_params, state.q_target_params, self.tau),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            {
                "td_loss": value_loss,
                "q_mean": jnp.mean(q_vals),
                # reporter recent-window/histogram array (reference
                # slate_q_reporter.py:35-52 "logged_rewards")
                **(
                    {"logged_rewards": reward.reshape(-1)}
                    if self.emit_reporter_arrays
                    else {}
                ),
            },
        )
