"""Gradient-free / combinatorial optimizers (reference: reagent/lite/)."""

from reagent_tpu.lite.optimizer import (
    BestResultsQueue,
    ComboOptimizerBase,
    GumbelSoftmaxOptimizer,
    PolicyGradientOptimizer,
    QLearningOptimizer,
    RandomSearchOptimizer,
    BayesianMLPEnsemblerOptimizer,
    NeverGradOptimizer,
)

__all__ = [
    "BestResultsQueue",
    "ComboOptimizerBase",
    "RandomSearchOptimizer",
    "GumbelSoftmaxOptimizer",
    "PolicyGradientOptimizer",
    "QLearningOptimizer",
    "BayesianMLPEnsemblerOptimizer",
    "NeverGradOptimizer",
]
