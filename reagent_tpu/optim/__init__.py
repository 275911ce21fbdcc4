"""Optimizer configuration: tagged-union configs over optax.

Reference: reagent/optimizer/ (union.py auto-wraps torch.optim; soft_update.py
models target-network blending as a fake optimizer).  Here optimizers are optax
gradient transforms built from the same ``{Name: {kwargs}}`` config shape, and
soft update is a pure pytree blend applied inside the jitted train step.
"""

from reagent_tpu.optim.union import (
    Adam,
    AdamW,
    Adagrad,
    RMSprop,
    SGD,
    Lion,
    OptimizerConfig,
    make_optimizer,
)
from reagent_tpu.optim.soft_update import soft_update

__all__ = [
    "Adam",
    "AdamW",
    "Adagrad",
    "RMSprop",
    "SGD",
    "Lion",
    "OptimizerConfig",
    "make_optimizer",
    "soft_update",
]
