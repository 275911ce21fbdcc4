"""Ranking samplers (reference: reagent/samplers/)."""

from reagent_tpu.samplers.frechet import FrechetSort

__all__ = ["FrechetSort"]
