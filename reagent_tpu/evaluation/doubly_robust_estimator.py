"""Single-step DM / IPS / DR estimators.

Reference: reagent/evaluation/doubly_robust_estimator.py:101-340 (the standard
DoublyRobustEstimator path; arXiv:1612.01205).
"""

from __future__ import annotations

import logging
from typing import Tuple

import numpy as np

from reagent_tpu.evaluation.cpe import CpeEstimate, bootstrapped_std_error_of_mean
from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage

logger = logging.getLogger(__name__)

DEFAULT_BOOTSTRAP_SAMPLE_PERCENT = 0.5
DEFAULT_BOOTSTRAP_NUM_SAMPLES = 1000


class DoublyRobustEstimator:
    def __init__(
        self,
        bootstrap_sample_percent: float = DEFAULT_BOOTSTRAP_SAMPLE_PERCENT,
        bootstrap_num_samples: int = DEFAULT_BOOTSTRAP_NUM_SAMPLES,
    ):
        self.bootstrap_sample_percent = bootstrap_sample_percent
        self.bootstrap_num_samples = bootstrap_num_samples

    def estimate(
        self, edp: EvaluationDataPage
    ) -> Tuple[CpeEstimate, CpeEstimate, CpeEstimate]:
        """Returns (direct_method, inverse_propensity, doubly_robust)."""
        # target propensity of the logged action (ref :225-233)
        target_prop = np.sum(
            edp.model_propensities * edp.action_mask, axis=1, keepdims=True
        )
        importance_weights = target_prop / edp.logged_propensities

        logged_policy_score = float(np.mean(edp.logged_rewards))
        if logged_policy_score < 1e-6:
            logger.warning(
                "Can't normalize DR-CPE because of small or negative logged_policy_score"
            )
            normalizer = 0.0
        else:
            normalizer = 1.0 / logged_policy_score

        if edp.model_rewards is None:
            direct_method_values = np.zeros(
                (edp.model_propensities.shape[0], 1), dtype=np.float32
            )
        else:
            direct_method_values = np.sum(
                edp.model_propensities * edp.model_rewards, axis=1, keepdims=True
            )

        direct_method_score = float(np.mean(direct_method_values))
        dm_std = bootstrapped_std_error_of_mean(
            direct_method_values.reshape(-1),
            sample_percent=self.bootstrap_sample_percent,
            num_samples=self.bootstrap_num_samples,
        )
        direct_method = CpeEstimate(
            raw=direct_method_score,
            normalized=direct_method_score * normalizer,
            raw_std_error=dm_std,
            normalized_std_error=dm_std * normalizer,
        )

        ips = importance_weights * edp.logged_rewards
        dr = (
            importance_weights
            * (edp.logged_rewards - edp.model_rewards_for_logged_action)
        ) + direct_method_values

        ips_score = float(np.mean(ips))
        ips_std = bootstrapped_std_error_of_mean(
            ips.reshape(-1),
            sample_percent=self.bootstrap_sample_percent,
            num_samples=self.bootstrap_num_samples,
        )
        inverse_propensity = CpeEstimate(
            raw=ips_score,
            normalized=ips_score * normalizer,
            raw_std_error=ips_std,
            normalized_std_error=ips_std * normalizer,
        )

        dr_score = float(np.mean(dr))
        dr_std = bootstrapped_std_error_of_mean(
            dr.reshape(-1),
            sample_percent=self.bootstrap_sample_percent,
            num_samples=self.bootstrap_num_samples,
        )
        doubly_robust = CpeEstimate(
            raw=dr_score,
            normalized=dr_score * normalizer,
            raw_std_error=dr_std,
            normalized_std_error=dr_std * normalizer,
        )
        return direct_method, inverse_propensity, doubly_robust
