from reagent_tpu.ope.estimators.estimator import (
    Estimator,
    EstimatorResult,
    EstimatorResults,
    Evaluator,
)

__all__ = ["Estimator", "EstimatorResult", "EstimatorResults", "Evaluator"]
