"""Multi-armed bandit library (reference: reagent/mab/)."""

from reagent_tpu.mab.mab_algorithm import (
    MABAlgo,
    MABState,
    GreedyAlgo,
    RandomActionsAlgo,
    randomized_argmax,
)
from reagent_tpu.mab.ucb import UCB1, MetricUCB, UCBTuned
from reagent_tpu.mab.thompson_sampling import (
    BernoulliBetaThompson,
    NormalGammaThompson,
)
from reagent_tpu.mab.simulation import BernoulliMAB, single_evaluation_bandit_algo

__all__ = [
    "MABAlgo",
    "MABState",
    "GreedyAlgo",
    "RandomActionsAlgo",
    "randomized_argmax",
    "UCB1",
    "MetricUCB",
    "UCBTuned",
    "BernoulliBetaThompson",
    "NormalGammaThompson",
    "BernoulliMAB",
    "single_evaluation_bandit_algo",
]
