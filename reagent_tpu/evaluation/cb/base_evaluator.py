"""Base contextual-bandit offline evaluator.

Reference: reagent/evaluation/cb/base_evaluator.py:16-247 — torch buffers that
accumulate accepted/rejected weight and reward sums, periodically aggregated
across distributed trainers with torch.distributed all-reduce.

TPU-native design: the accumulator is an explicit ``OfflineEvalState`` pytree
(scalars), updated by pure jittable functions, so the whole eval rides inside
the training ``lax.scan``; cross-instance aggregation is ``jax.lax.psum`` over
a named mesh axis (instead of sync_ddp_if_available), or a no-op on one host.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from reagent_tpu.core.types import CBInput
from reagent_tpu.evaluation.cb.utils import add_importance_weights, effective_weight

logger = logging.getLogger(__name__)
Array = jax.Array

EPSILON = 1e-9


@struct.dataclass
class OfflineEvalState:
    """Global + windowed local accumulators (ref buffers :66-146)."""

    # global cumulative
    sum_weight_accepted: Array
    sum_importance_weight_accepted: Array
    sum_weight_all_data: Array
    sum_reward_weighted_accepted: Array
    sum_reward_importance_weighted_accepted: Array
    num_eval_model_updates: Array
    # local window (reset at each aggregation)
    sum_weight_accepted_local: Array
    sum_importance_weight_accepted_local: Array
    sum_weight_all_data_local: Array
    sum_weight_since_update_local: Array
    sum_reward_weighted_accepted_local: Array
    sum_reward_importance_weighted_accepted_local: Array
    sum_reward_weighted_all_data_local: Array
    sum_size_weighted_accepted_local: Array
    sum_size_weighted_all_data_local: Array
    # windowed metrics (filled by aggregate)
    frac_accepted: Array
    avg_reward_accepted: Array
    avg_reward_rejected: Array
    avg_reward_all_data: Array
    avg_size_accepted: Array
    avg_size_rejected: Array
    accepted_rejected_reward_ratio: Array

    @classmethod
    def create(cls) -> "OfflineEvalState":
        z = jnp.zeros(())
        return cls(**{f.name: z for f in cls.__dataclass_fields__.values()})  # type: ignore[attr-defined]


class BaseOfflineEval:
    """Non-stationary-policy offline eval (Li et al. 2011, Algorithm 3 family)."""

    metric_prefix: str = "[model]Offline_Eval_"

    def __init__(self, max_importance_weight: Optional[float] = None):
        self.max_importance_weight = max_importance_weight

    def init_state(self) -> OfflineEvalState:
        return OfflineEvalState.create()

    # -------------------------------------------------------------- ingest

    def ingest_batch(
        self, state: OfflineEvalState, batch: CBInput, model_actions: Array
    ) -> Tuple[OfflineEvalState, CBInput]:
        """Accumulate stats; zero out weights where actions mismatch (ref :148-170)."""
        state = self._process_all_data(state, batch)
        new_batch = add_importance_weights(
            batch, model_actions, self.max_importance_weight
        )
        state = self._process_used_data(state, new_batch)
        return state, new_batch

    def _process_all_data(self, state: OfflineEvalState, batch: CBInput) -> OfflineEvalState:
        raise NotImplementedError

    def _process_used_data(self, state: OfflineEvalState, batch: CBInput) -> OfflineEvalState:
        raise NotImplementedError

    # ----------------------------------------------------------- aggregate

    def aggregate_across_instances(
        self, state: OfflineEvalState, axis_name: Optional[str] = None
    ) -> OfflineEvalState:
        raise NotImplementedError

    def update_eval_model(self, state: OfflineEvalState) -> OfflineEvalState:
        """Count a model refresh; the caller swaps the eval params it scores with
        (params are explicit here, so there is nothing to deep-copy; ref :210-217)."""
        return state.replace(
            num_eval_model_updates=state.num_eval_model_updates + 1,
            sum_weight_since_update_local=jnp.zeros(()),
        )

    # -------------------------------------------------------------- report

    def get_avg_reward(self, state: OfflineEvalState) -> float:
        raise NotImplementedError

    def metrics_dict(self, state: OfflineEvalState) -> dict:
        p = self.metric_prefix
        return {
            f"{p}avg_reward": self.get_avg_reward(state),
            f"{p}sum_weight_accepted": float(state.sum_weight_accepted),
            f"{p}sum_weight_all_data": float(state.sum_weight_all_data),
            f"{p}num_eval_model_updates": float(state.num_eval_model_updates),
            f"{p}frac_accepted": float(state.frac_accepted),
            f"{p}avg_reward_accepted": float(state.avg_reward_accepted),
            f"{p}avg_reward_rejected": float(state.avg_reward_rejected),
            f"{p}avg_size_accepted": float(state.avg_size_accepted),
            f"{p}avg_size_rejected": float(state.avg_size_rejected),
            f"{p}accepted_rejected_reward_ratio": float(
                state.accepted_rejected_reward_ratio
            ),
            f"{p}avg_reward_all_data": float(state.avg_reward_all_data),
        }

    def get_formatted_result_string(self, state: OfflineEvalState) -> str:
        return (
            f"Avg reward {self.get_avg_reward(state):0.3f} based on"
            f" {int(state.sum_weight_accepted)} processed observations (out of"
            f" {int(state.sum_weight_all_data)} observations). The eval model has"
            f" been updated {int(state.num_eval_model_updates)} times"
        )
