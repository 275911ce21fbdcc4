from reagent_tpu.ope.trainers.rl_tabular_trainers import (
    DPTrainer,
    DPValueFunction,
    TabularPolicy,
)
from reagent_tpu.ope.trainers.linear_trainers import (
    LinearTrainer,
    LogisticRegressionTrainer,
    SGDClassifierTrainer,
    DecisionTreeTrainer,
)

__all__ = [
    "TabularPolicy",
    "DPTrainer",
    "DPValueFunction",
    "LinearTrainer",
    "LogisticRegressionTrainer",
    "SGDClassifierTrainer",
    "DecisionTreeTrainer",
]
