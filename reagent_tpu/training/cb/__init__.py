"""Contextual-bandit trainers (reference: reagent/training/cb/)."""

from reagent_tpu.training.cb.linucb_trainer import LinUCBTrainer
from reagent_tpu.training.cb.disjoint_linucb_trainer import DisjointLinUCBTrainer
from reagent_tpu.training.cb.supervised_trainer import SupervisedTrainer

__all__ = ["LinUCBTrainer", "DisjointLinUCBTrainer", "SupervisedTrainer"]
