"""Counterfactual policy evaluation (CPE).

Reference: reagent/evaluation/ — EvaluationDataPage (evaluation_data_page.py:30),
DM/IPS/DR (doubly_robust_estimator.py:101), sequential DR
(sequential_doubly_robust_estimator.py:18), MAGIC
(weighted_sequential_doubly_robust_estimator.py:18), Evaluator (evaluator.py:57).
"""

from reagent_tpu.evaluation.cpe import (
    CpeDetails,
    CpeEstimate,
    CpeEstimateSet,
    bootstrapped_std_error_of_mean,
)
from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage
from reagent_tpu.evaluation.doubly_robust_estimator import DoublyRobustEstimator
from reagent_tpu.evaluation.sequential_doubly_robust_estimator import (
    SequentialDoublyRobustEstimator,
)
from reagent_tpu.evaluation.weighted_sequential_doubly_robust_estimator import (
    WeightedSequentialDoublyRobustEstimator,
)
from reagent_tpu.evaluation.evaluator import Evaluator

__all__ = [
    "CpeDetails",
    "CpeEstimate",
    "CpeEstimateSet",
    "bootstrapped_std_error_of_mean",
    "EvaluationDataPage",
    "DoublyRobustEstimator",
    "SequentialDoublyRobustEstimator",
    "WeightedSequentialDoublyRobustEstimator",
    "Evaluator",
]
