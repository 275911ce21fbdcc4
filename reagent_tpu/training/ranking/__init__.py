"""Slate-ranking trainers (reference: reagent/training/ranking/)."""

from reagent_tpu.training.ranking.seq2slate_trainer import (
    Seq2SlateTrainer,
    Seq2SlateTrainerState,
)
from reagent_tpu.training.ranking.seq2slate_attn_trainer import (
    Seq2SlatePairwiseAttnTrainer,
)

__all__ = [
    "Seq2SlateTrainer",
    "Seq2SlateTrainerState",
    "Seq2SlatePairwiseAttnTrainer",
]
