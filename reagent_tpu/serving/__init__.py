"""Python-side serving config DSL + client for the C++ decision service.

Reference: serving/reagent/serving/config/ (builder.py:21 DecisionPlanBuilder,
operators.py operator stubs, applications/example/); the runtime itself is the
dependency-free C++ service under /serving.
"""

from reagent_tpu.serving.builder import DecisionPlanBuilder, export_plan
from reagent_tpu.serving.operators import (
    ActionValueScoring,
    EpsilonGreedyRanker,
    Expression,
    Frechet,
    InputFromRequest,
    PropensityFit,
    Softmax,
    SoftmaxRanker,
    Ucb,
)
from reagent_tpu.serving.client import DecisionServiceClient

__all__ = [
    "DecisionPlanBuilder",
    "export_plan",
    "Ucb",
    "Softmax",
    "SoftmaxRanker",
    "EpsilonGreedyRanker",
    "Frechet",
    "Expression",
    "PropensityFit",
    "ActionValueScoring",
    "InputFromRequest",
    "DecisionServiceClient",
]
