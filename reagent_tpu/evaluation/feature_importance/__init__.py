"""Permutation feature importance (reference: reagent/evaluation/feature_importance/)."""

from reagent_tpu.evaluation.feature_importance.feature_importance_perturbation import (
    FeatureImportanceBase,
    FeatureImportancePerturbation,
    create_default_perturb_fn,
)

__all__ = [
    "FeatureImportanceBase",
    "FeatureImportancePerturbation",
    "create_default_perturb_fn",
]
