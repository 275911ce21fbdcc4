"""Learning-rate scheduler configs: tagged-union over optax schedules.

Reference: reagent/optimizer/scheduler.py + scheduler_union.py (auto-wrapped
torch.optim.lr_scheduler classes) and uninferrable_schedulers.py.  The torch
classes map onto optax schedule fns; a scheduler composes with any optimizer
config via ``with_scheduler`` (optax.scale_by_schedule replaces torch's
in-place param-group mutation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import optax

from reagent_tpu.core.registry import Registry

LR_SCHEDULERS: Registry = Registry("optim.lr_scheduler")


@dataclasses.dataclass(frozen=True)
class LearningRateSchedulerConfig:
    """Base: subclasses produce an optax schedule fn step -> multiplier.

    The schedule yields a MULTIPLIER on the optimizer's base lr (torch
    semantics), applied with ``optax.scale_by_schedule``.
    """

    def make_schedule(self) -> optax.Schedule:
        raise NotImplementedError


@LR_SCHEDULERS.register()
@dataclasses.dataclass(frozen=True)
class StepLR(LearningRateSchedulerConfig):
    step_size: int = 1000
    gamma: float = 0.1

    def make_schedule(self) -> optax.Schedule:
        return lambda step: self.gamma ** (step // self.step_size)


@LR_SCHEDULERS.register()
@dataclasses.dataclass(frozen=True)
class MultiStepLR(LearningRateSchedulerConfig):
    milestones: Sequence[int] = ()
    gamma: float = 0.1

    def make_schedule(self) -> optax.Schedule:
        milestones = tuple(self.milestones)

        def schedule(step):
            mult = 1.0
            for m in milestones:
                mult = mult * (self.gamma ** (step >= m))
            return mult

        return schedule


@LR_SCHEDULERS.register()
@dataclasses.dataclass(frozen=True)
class ExponentialLR(LearningRateSchedulerConfig):
    gamma: float = 0.99

    def make_schedule(self) -> optax.Schedule:
        return lambda step: self.gamma**step


@LR_SCHEDULERS.register()
@dataclasses.dataclass(frozen=True)
class LinearLR(LearningRateSchedulerConfig):
    start_factor: float = 1.0 / 3
    end_factor: float = 1.0
    total_iters: int = 5

    def make_schedule(self) -> optax.Schedule:
        def schedule(step):
            t = jnp.clip(step / self.total_iters, 0.0, 1.0)
            return self.start_factor + (self.end_factor - self.start_factor) * t

        return schedule


@LR_SCHEDULERS.register()
@dataclasses.dataclass(frozen=True)
class CosineAnnealingLR(LearningRateSchedulerConfig):
    T_max: int = 1000
    eta_min: float = 0.0

    def make_schedule(self) -> optax.Schedule:
        def schedule(step):
            return self.eta_min + (1.0 - self.eta_min) * 0.5 * (
                1 + jnp.cos(jnp.pi * jnp.minimum(step, self.T_max) / self.T_max)
            )

        return schedule


@LR_SCHEDULERS.register()
@dataclasses.dataclass(frozen=True)
class OneCycleLR(LearningRateSchedulerConfig):
    """Warmup to max then cosine down (torch OneCycleLR essentials)."""

    max_lr_factor: float = 10.0
    total_steps: int = 1000
    pct_start: float = 0.3

    def make_schedule(self) -> optax.Schedule:
        warm = max(int(self.total_steps * self.pct_start), 1)

        def schedule(step):
            up = self.max_lr_factor * step / warm
            t = jnp.clip((step - warm) / max(self.total_steps - warm, 1), 0.0, 1.0)
            down = self.max_lr_factor * 0.5 * (1 + jnp.cos(jnp.pi * t))
            return jnp.where(step < warm, up, down)

        return schedule


def with_scheduler(
    optimizer: optax.GradientTransformation,
    scheduler: Optional[LearningRateSchedulerConfig],
) -> optax.GradientTransformation:
    """Compose optimizer with a multiplier schedule (ref make_optimizer_scheduler)."""
    if scheduler is None:
        return optimizer
    return optax.chain(
        optimizer, optax.scale_by_schedule(scheduler.make_schedule())
    )
