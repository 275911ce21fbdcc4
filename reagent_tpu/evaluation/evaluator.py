"""Evaluator: run the full CPE suite over an EvaluationDataPage.

Reference: reagent/evaluation/evaluator.py:57-143.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

from reagent_tpu.core.tracker import ObservableMixin
from reagent_tpu.evaluation.cpe import CpeDetails, CpeEstimateSet
from reagent_tpu.evaluation.doubly_robust_estimator import DoublyRobustEstimator
from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage
from reagent_tpu.evaluation.sequential_doubly_robust_estimator import (
    SequentialDoublyRobustEstimator,
)
from reagent_tpu.evaluation.weighted_sequential_doubly_robust_estimator import (
    WeightedSequentialDoublyRobustEstimator,
)

logger = logging.getLogger(__name__)


def get_metrics_to_score(metric_reward_values: Optional[Dict[str, float]]) -> List[str]:
    if metric_reward_values is None:
        return []
    return sorted(metric_reward_values.keys())


class Evaluator(ObservableMixin):
    NUM_J_STEPS_FOR_MAGIC_ESTIMATOR = 25

    _observable_value_types = {"cpe_details": CpeDetails}

    def __init__(
        self, action_names, gamma, trainer=None, metrics_to_score=None,
        use_jax_sequential_estimators: bool = True,
    ) -> None:
        super().__init__()
        self.action_names = action_names
        self.metrics_to_score = metrics_to_score or []
        self.doubly_robust_estimator = DoublyRobustEstimator()
        if use_jax_sequential_estimators:
            # device-vectorized [N_traj, T] path (parity-tested vs the numpy
            # oracles in tests/test_jax_cpe.py); scales to production EDPs
            from reagent_tpu.evaluation.jax_sequential_estimators import (
                JaxSequentialDoublyRobustEstimator,
                JaxWeightedSequentialDoublyRobustEstimator,
            )

            self.sequential_doubly_robust_estimator = (
                JaxSequentialDoublyRobustEstimator(gamma)
            )
            self.weighted_sequential_doubly_robust_estimator = (
                JaxWeightedSequentialDoublyRobustEstimator(gamma)
            )
        else:
            self.sequential_doubly_robust_estimator = SequentialDoublyRobustEstimator(gamma)
            self.weighted_sequential_doubly_robust_estimator = (
                WeightedSequentialDoublyRobustEstimator(gamma)
            )

    def evaluate_post_training(self, edp: EvaluationDataPage) -> CpeDetails:
        cpe_details = CpeDetails()
        cpe_details.reward_estimates = self.score_cpe("Reward", edp)

        if (
            self.metrics_to_score is not None
            and edp.logged_metrics is not None
            and self.action_names is not None
        ):
            for i, metric in enumerate(self.metrics_to_score):
                logger.info("Scoring metric: %s", metric)
                metric_reward_edp = edp.set_metric_as_reward(i, len(self.action_names))
                cpe_details.metric_estimates[metric] = self.score_cpe(
                    metric, metric_reward_edp
                )

        if self.action_names is not None:
            if edp.optimal_q_values is not None:
                value_means = edp.optimal_q_values.mean(axis=0)
                cpe_details.q_value_means = {
                    action: float(value_means[i])
                    for i, action in enumerate(self.action_names)
                }
                value_stds = edp.optimal_q_values.std(axis=0, ddof=1)
                cpe_details.q_value_stds = {
                    action: float(value_stds[i])
                    for i, action in enumerate(self.action_names)
                }
            if edp.eval_action_idxs is not None:
                cpe_details.action_distribution = {
                    action: float((edp.eval_action_idxs == i).sum())
                    / edp.eval_action_idxs.shape[0]
                    for i, action in enumerate(self.action_names)
                }
        self.notify_observers(cpe_details=cpe_details)
        return cpe_details

    def score_cpe(self, metric_name: str, edp: EvaluationDataPage) -> CpeEstimateSet:
        from reagent_tpu.evaluation.jax_sequential_estimators import (
            JaxSequentialDoublyRobustEstimator,
            JaxWeightedSequentialDoublyRobustEstimator,
            pad_edp_trajectories,
        )

        direct_method, inverse_propensity, doubly_robust = (
            self.doubly_robust_estimator.estimate(edp)
        )
        # pad once and share across the three sequential estimates (the
        # O(N*T*A) padding + device transfer would otherwise repeat per call)
        seq_is_jax = isinstance(
            self.sequential_doubly_robust_estimator, JaxSequentialDoublyRobustEstimator
        )
        wdr_is_jax = isinstance(
            self.weighted_sequential_doubly_robust_estimator,
            JaxWeightedSequentialDoublyRobustEstimator,
        )
        padded = pad_edp_trajectories(edp) if (seq_is_jax or wdr_is_jax) else None
        sequential_doubly_robust = (
            self.sequential_doubly_robust_estimator.estimate_padded(padded)
            if seq_is_jax
            else self.sequential_doubly_robust_estimator.estimate(edp)
        )
        if wdr_is_jax:
            weighted_doubly_robust = (
                self.weighted_sequential_doubly_robust_estimator.estimate_padded(
                    padded, num_j_steps=1,
                    whether_self_normalize_importance_weights=True,
                )
            )
            magic = self.weighted_sequential_doubly_robust_estimator.estimate_padded(
                padded,
                num_j_steps=Evaluator.NUM_J_STEPS_FOR_MAGIC_ESTIMATOR,
                whether_self_normalize_importance_weights=True,
            )
        else:
            weighted_doubly_robust = (
                self.weighted_sequential_doubly_robust_estimator.estimate(
                    edp, num_j_steps=1,
                    whether_self_normalize_importance_weights=True,
                )
            )
            magic = self.weighted_sequential_doubly_robust_estimator.estimate(
                edp,
                num_j_steps=Evaluator.NUM_J_STEPS_FOR_MAGIC_ESTIMATOR,
                whether_self_normalize_importance_weights=True,
            )
        return CpeEstimateSet(
            direct_method=direct_method,
            inverse_propensity=inverse_propensity,
            doubly_robust=doubly_robust,
            sequential_doubly_robust=sequential_doubly_robust,
            weighted_doubly_robust=weighted_doubly_robust,
            magic=magic,
        )
