"""Replay-method policy evaluator for contextual bandits.

Reference: reagent/evaluation/cb/policy_evaluator.py:16-167 — the rejection
-sampling estimator from Li et al., https://arxiv.org/pdf/1003.0146.pdf
(Algorithm 3): keep only rows where the evaluated policy's action matches the
logged action, importance-weight by 1/p_logged, and average the reward.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from reagent_tpu.core.types import CBInput
from reagent_tpu.evaluation.cb.base_evaluator import (
    EPSILON,
    BaseOfflineEval,
    OfflineEvalState,
)
from reagent_tpu.evaluation.cb.utils import effective_weight

Array = jax.Array


def _weights_of(batch: CBInput) -> Array:
    return (
        batch.weight if batch.weight is not None else jnp.ones_like(batch.reward)
    )


def _sizes_of(batch: CBInput) -> Array:
    if batch.arm_presence is not None:
        return jnp.sum(batch.arm_presence.astype(jnp.float32), axis=1)
    return (
        jnp.ones(batch.reward.shape[0]) * batch.context_arm_features.shape[1]
    )


class PolicyEvaluator(BaseOfflineEval):
    def _process_all_data(
        self, state: OfflineEvalState, batch: CBInput
    ) -> OfflineEvalState:
        assert batch.reward is not None
        weights = _weights_of(batch)
        sizes = _sizes_of(batch)
        return state.replace(
            sum_weight_all_data_local=state.sum_weight_all_data_local + jnp.sum(weights),
            sum_reward_weighted_all_data_local=state.sum_reward_weighted_all_data_local
            + jnp.sum(weights * batch.reward),
            sum_size_weighted_all_data_local=state.sum_size_weighted_all_data_local
            + jnp.sum(weights.reshape(-1) * sizes),
        )

    def _process_used_data(
        self, state: OfflineEvalState, batch: CBInput
    ) -> OfflineEvalState:
        assert batch.reward is not None and batch.importance_weight is not None
        weights = _weights_of(batch)
        eff = effective_weight(batch)
        accepted = (batch.importance_weight > 0).astype(jnp.float32)
        sizes = _sizes_of(batch)
        return state.replace(
            sum_reward_importance_weighted_accepted_local=(
                state.sum_reward_importance_weighted_accepted_local
                + jnp.sum(eff * batch.reward)
            ),
            sum_reward_weighted_accepted_local=(
                state.sum_reward_weighted_accepted_local
                + jnp.sum(weights * accepted * batch.reward)
            ),
            sum_weight_accepted_local=(
                state.sum_weight_accepted_local + jnp.sum(weights * accepted)
            ),
            sum_importance_weight_accepted_local=(
                state.sum_importance_weight_accepted_local + jnp.sum(eff)
            ),
            sum_size_weighted_accepted_local=(
                state.sum_size_weighted_accepted_local
                + jnp.sum((weights * accepted).reshape(-1) * sizes)
            ),
            sum_weight_since_update_local=(
                state.sum_weight_since_update_local + jnp.sum(weights)
            ),
        )

    def aggregate_across_instances(
        self, state: OfflineEvalState, axis_name: Optional[str] = None
    ) -> OfflineEvalState:
        """Fold the local window into global sums (ref :71-154).

        Inside ``shard_map``/``pmap`` pass ``axis_name`` and the local sums are
        ``psum``-reduced over the mesh axis — the reference's
        sync_ddp_if_available, one collective per scalar pytree.
        """
        def reduce(x):
            return jax.lax.psum(x, axis_name) if axis_name else x

        acc = reduce(state.sum_weight_accepted_local)
        imp = reduce(state.sum_importance_weight_accepted_local)
        alld = reduce(state.sum_weight_all_data_local)
        r_acc = reduce(state.sum_reward_weighted_accepted_local)
        r_imp = reduce(state.sum_reward_importance_weighted_accepted_local)
        r_all = reduce(state.sum_reward_weighted_all_data_local)
        s_acc = reduce(state.sum_size_weighted_accepted_local)
        s_all = reduce(state.sum_size_weighted_all_data_local)
        rejected = alld - acc
        r_rej = r_all - r_acc
        s_rej = s_all - s_acc
        z = jnp.zeros(())
        return state.replace(
            sum_reward_weighted_accepted=state.sum_reward_weighted_accepted + r_acc,
            sum_reward_importance_weighted_accepted=(
                state.sum_reward_importance_weighted_accepted + r_imp
            ),
            sum_weight_accepted=state.sum_weight_accepted + acc,
            sum_importance_weight_accepted=state.sum_importance_weight_accepted + imp,
            sum_weight_all_data=state.sum_weight_all_data + alld,
            frac_accepted=acc / jnp.maximum(alld, EPSILON),
            avg_reward_accepted=r_acc / jnp.maximum(acc, EPSILON),
            avg_reward_rejected=r_rej / jnp.maximum(rejected, EPSILON),
            avg_reward_all_data=r_all / jnp.maximum(alld, EPSILON),
            accepted_rejected_reward_ratio=(r_acc / jnp.maximum(acc, EPSILON))
            / jnp.maximum(r_rej / jnp.maximum(rejected, EPSILON), EPSILON),
            avg_size_accepted=s_acc / jnp.maximum(acc, EPSILON),
            avg_size_rejected=s_rej / jnp.maximum(rejected, EPSILON),
            sum_weight_accepted_local=z,
            sum_importance_weight_accepted_local=z,
            sum_weight_all_data_local=z,
            sum_reward_weighted_accepted_local=z,
            sum_reward_importance_weighted_accepted_local=z,
            sum_reward_weighted_all_data_local=z,
            sum_size_weighted_accepted_local=z,
            sum_size_weighted_all_data_local=z,
        )

    def get_avg_reward(self, state: OfflineEvalState) -> float:
        """IPS replay estimate of the evaluated policy's average reward."""
        assert float(state.sum_importance_weight_accepted_local) == 0.0, (
            "call aggregate_across_instances() before reading the estimate"
        )
        return float(
            state.sum_reward_importance_weighted_accepted
            / (state.sum_importance_weight_accepted + EPSILON)
        )
