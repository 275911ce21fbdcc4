"""Gradient-free optimization (reference: reagent/training/gradient_free/)."""

from reagent_tpu.training.gradient_free.evolution_pool import EvolutionPool
from reagent_tpu.training.gradient_free.es_worker import EsWorker
from reagent_tpu.training.gradient_free.ars_util import ARSOptimizer

__all__ = ["EvolutionPool", "EsWorker", "ARSOptimizer"]
