"""Trainers: one functional, fully-jitted train step per algorithm.

Reference: reagent/training/ — there each algorithm is a Lightning module
whose ``train_step_gen`` yields one loss per optimizer
(reagent_lightning_module.py:71,109-134).  TPU-native design: each trainer is
a plain object holding static config + flax modules, exposing
``init(rng, ...) -> TrainerState`` and a pure jitted
``train_step(state, batch) -> (state, metrics)`` in which every sub-network
gets its own grad computation and the target-network blend (the reference's
``SoftUpdate`` fake optimizer) is a pytree polyak average.
"""

from reagent_tpu.training.dqn_trainer import DQNTrainer, DQNTrainerState
from reagent_tpu.training.sac_trainer import SACTrainer, SACTrainerState
from reagent_tpu.training.td3_trainer import TD3Trainer, TD3TrainerState
from reagent_tpu.training.c51_trainer import C51Trainer, C51TrainerState
from reagent_tpu.training.qrdqn_trainer import QRDQNTrainer, QRDQNTrainerState
from reagent_tpu.training.reinforce_trainer import ReinforceTrainer, ReinforceTrainerState
from reagent_tpu.training.ppo_trainer import PPOTrainer, PPOTrainerState
from reagent_tpu.training.parametric_dqn_trainer import (
    ParametricDQNTrainer,
    ParametricDQNTrainerState,
)
from reagent_tpu.training.discrete_crr_trainer import CRRTrainerState, DiscreteCRRTrainer

from reagent_tpu.training.scan_loop import (
    make_sampled_train_fn,
    make_scanned_train_fn,
)

__all__ = [
    "make_sampled_train_fn",
    "make_scanned_train_fn",
    "DQNTrainer",
    "DQNTrainerState",
    "SACTrainer",
    "SACTrainerState",
    "TD3Trainer",
    "TD3TrainerState",
    "C51Trainer",
    "C51TrainerState",
    "QRDQNTrainer",
    "QRDQNTrainerState",
    "ReinforceTrainer",
    "ReinforceTrainerState",
    "PPOTrainer",
    "PPOTrainerState",
    "ParametricDQNTrainer",
    "ParametricDQNTrainerState",
    "DiscreteCRRTrainer",
    "CRRTrainerState",
]
