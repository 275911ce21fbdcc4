"""Contextual-bandit trainers (reference: reagent/training/cb/)."""

from reagent_tpu.training.cb.linucb_trainer import LinUCBTrainer
from reagent_tpu.training.cb.disjoint_linucb_trainer import DisjointLinUCBTrainer
from reagent_tpu.training.cb.supervised_trainer import SupervisedTrainer
from reagent_tpu.training.cb.deep_represent_linucb_trainer import DeepRepresentLinUCBTrainer
from reagent_tpu.training.cb.mab_trainer import MABTrainer

__all__ = ["LinUCBTrainer", "DisjointLinUCBTrainer", "SupervisedTrainer", "DeepRepresentLinUCBTrainer", "MABTrainer"]
