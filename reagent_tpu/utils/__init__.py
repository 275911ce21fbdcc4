"""Utilities: checkpointing, rng helpers."""
