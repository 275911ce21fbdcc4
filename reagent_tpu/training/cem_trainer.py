"""CEM trainer: train an ensemble of MDN-RNN world models for planning.

Reference: reagent/training/cem_trainer.py:36 — the "trainer" trains each
ensemble member's world model; planning itself needs no gradient updates.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import CEMTrainerParameters
from reagent_tpu.training.world_model.mdnrnn_trainer import (
    MDNRNNTrainer,
    MDNRNNTrainerState,
)

Array = jax.Array


class CEMTrainer:
    def __init__(
        self,
        cem_planner_network,
        world_model_trainers: List[MDNRNNTrainer],
        parameters: CEMTrainerParameters = CEMTrainerParameters(),
    ):
        self.cem_planner_network = cem_planner_network
        self.world_model_trainers = world_model_trainers
        self.parameters = parameters

    def init(self, rng: Array, batch_proto: rlt.MemoryNetworkInput) -> List[MDNRNNTrainerState]:
        return [
            t.init(jax.random.fold_in(rng, i), batch_proto)
            for i, t in enumerate(self.world_model_trainers)
        ]

    def train_step(
        self, states: List[MDNRNNTrainerState], batch: rlt.MemoryNetworkInput
    ) -> Tuple[List[MDNRNNTrainerState], Dict[str, Array]]:
        """Every world model trains on the batch (reference cem_trainer.py:60-80)."""
        new_states = []
        metrics: Dict[str, Array] = {}
        for i, (trainer, st) in enumerate(zip(self.world_model_trainers, states)):
            st, m = trainer.train_step(st, batch)
            new_states.append(st)
            metrics[f"wm{i}_loss"] = m["loss"]
        return new_states, metrics
