"""Slate-ranking trainers (reference: reagent/training/ranking/)."""

from reagent_tpu.training.ranking.seq2slate_trainer import (
    Seq2SlateTrainer,
    Seq2SlateTrainerState,
)

__all__ = ["Seq2SlateTrainer", "Seq2SlateTrainerState"]
