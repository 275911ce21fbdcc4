"""Contextual-bandit offline evaluation (reference: reagent/evaluation/cb/)."""

from reagent_tpu.evaluation.cb.base_evaluator import BaseOfflineEval, OfflineEvalState
from reagent_tpu.evaluation.cb.policy_evaluator import PolicyEvaluator
from reagent_tpu.evaluation.cb.utils import add_importance_weights
from reagent_tpu.evaluation.cb.synthetic_contextual_bandit_data import (
    DynamicBanditAgent,
    DynamicBanditEnv,
)

__all__ = [
    "BaseOfflineEval",
    "OfflineEvalState",
    "PolicyEvaluator",
    "add_importance_weights",
    "DynamicBanditAgent",
    "DynamicBanditEnv",
]
