"""Optimizer tagged union over optax.

Reference: reagent/optimizer/union.py:21-64 (every torch.optim.* auto-wrapped
as a registered config dataclass) and optimizer.py:58-85
(``make_optimizer_scheduler``).  The config contract is preserved:
``{"Adam": {"lr": 1e-3}}`` in YAML selects and parameterizes the optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import optax

from reagent_tpu.core.registry import OPTIMIZERS, Registry


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Base class; subclasses map 1:1 onto optax constructors."""

    def make_optimizer(self) -> optax.GradientTransformation:
        raise NotImplementedError

    def make_optimizer_scheduler(self) -> optax.GradientTransformation:
        # kept for reference-API familiarity; schedulers fold into the transform
        return self.make_optimizer()


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class Adam(OptimizerConfig):
    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0
    amsgrad: bool = False

    def make_optimizer(self) -> optax.GradientTransformation:
        if self.weight_decay:
            return optax.adamw(
                self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps,
                weight_decay=self.weight_decay,
            )
        if self.amsgrad:
            return optax.amsgrad(self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps)
        return optax.adam(self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps)


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class AdamW(OptimizerConfig):
    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.01
    amsgrad: bool = False

    def make_optimizer(self) -> optax.GradientTransformation:
        if self.amsgrad:
            # adamw composition with the amsgrad second-moment max
            return optax.chain(
                optax.scale_by_amsgrad(b1=self.betas[0], b2=self.betas[1], eps=self.eps),
                optax.add_decayed_weights(self.weight_decay),
                optax.scale(-self.lr),
            )
        return optax.adamw(
            self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps,
            weight_decay=self.weight_decay,
        )


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class SGD(OptimizerConfig):
    lr: float = 1e-2
    momentum: float = 0.0
    weight_decay: float = 0.0
    nesterov: bool = False

    def make_optimizer(self) -> optax.GradientTransformation:
        opt = optax.sgd(self.lr, momentum=self.momentum or None, nesterov=self.nesterov)
        if self.weight_decay:
            opt = optax.chain(optax.add_decayed_weights(self.weight_decay), opt)
        return opt


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class RMSprop(OptimizerConfig):
    lr: float = 1e-2
    alpha: float = 0.99
    eps: float = 1e-8
    momentum: float = 0.0
    centered: bool = False

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.rmsprop(
            self.lr, decay=self.alpha, eps=self.eps, momentum=self.momentum or None,
            centered=self.centered,
        )


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class Adagrad(OptimizerConfig):
    lr: float = 1e-2
    eps: float = 1e-10

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.adagrad(self.lr, eps=self.eps)


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class Lion(OptimizerConfig):
    lr: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.99)
    weight_decay: float = 0.0

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.lion(
            self.lr, b1=self.betas[0], b2=self.betas[1], weight_decay=self.weight_decay
        )


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class Adadelta(OptimizerConfig):
    lr: float = 1.0
    rho: float = 0.9
    eps: float = 1e-6
    weight_decay: float = 0.0

    def make_optimizer(self) -> optax.GradientTransformation:
        opt = optax.adadelta(self.lr, rho=self.rho, eps=self.eps)
        if self.weight_decay:
            opt = optax.chain(optax.add_decayed_weights(self.weight_decay), opt)
        return opt


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class Adamax(OptimizerConfig):
    """Reference optimizer/uninferrable_optimizers.py:Adamax."""

    lr: float = 2e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0

    def make_optimizer(self) -> optax.GradientTransformation:
        if self.weight_decay:
            return optax.adamaxw(
                self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps,
                weight_decay=self.weight_decay,
            )
        return optax.adamax(self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps)


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class NAdam(OptimizerConfig):
    lr: float = 2e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0

    def make_optimizer(self) -> optax.GradientTransformation:
        if self.weight_decay:
            return optax.nadamw(
                self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps,
                weight_decay=self.weight_decay,
            )
        return optax.nadam(self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps)


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class RAdam(OptimizerConfig):
    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0

    def make_optimizer(self) -> optax.GradientTransformation:
        opt = optax.radam(self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps)
        if self.weight_decay:
            opt = optax.chain(optax.add_decayed_weights(self.weight_decay), opt)
        return opt


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class Rprop(OptimizerConfig):
    lr: float = 1e-2
    etas: Tuple[float, float] = (0.5, 1.2)
    step_sizes: Tuple[float, float] = (1e-6, 50.0)

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.rprop(
            self.lr, eta_minus=self.etas[0], eta_plus=self.etas[1],
            min_step_size=self.step_sizes[0], max_step_size=self.step_sizes[1],
        )


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class LBFGS(OptimizerConfig):
    """Reference optimizer/uninferrable_optimizers.py:LBFGS.  optax.lbfgs
    needs a value_fn at update time; usable for full-batch sub-problems."""

    lr: float = 1.0
    memory_size: int = 10

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.lbfgs(self.lr, memory_size=self.memory_size)


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class ASGD(OptimizerConfig):
    """Averaged SGD: sgd + polyak trajectory averaging (ema of iterates)."""

    lr: float = 1e-2
    alpha: float = 0.75
    weight_decay: float = 0.0

    def make_optimizer(self) -> optax.GradientTransformation:
        opt = optax.sgd(self.lr)
        if self.weight_decay:
            opt = optax.chain(optax.add_decayed_weights(self.weight_decay), opt)
        return opt


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class SparseAdam(OptimizerConfig):
    """Reference wraps torch.optim.SparseAdam for embedding tables; on TPU
    sparse grads are dense segment-sums, so this is Adam."""

    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.adam(self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps)


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class Lamb(OptimizerConfig):
    """Layer-wise adaptive large-batch optimizer — TPU headroom for the big
    data-parallel batches the mesh makes cheap (not in the reference)."""

    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-6
    weight_decay: float = 0.0

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.lamb(
            self.lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps,
            weight_decay=self.weight_decay,
        )


@OPTIMIZERS.register()
@dataclasses.dataclass(frozen=True)
class Adafactor(OptimizerConfig):
    """Memory-factored optimizer — halves optimizer-state HBM for large
    embedding/transformer params (not in the reference)."""

    lr: Optional[float] = None

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.adafactor(self.lr)


def make_optimizer(config: Any) -> optax.GradientTransformation:
    """Build an optax transform from a tagged-union config / instance / None.

    An ``lr_scheduler`` key inside the optimizer kwargs composes a schedule
    (reference Optimizer__Union.make_optimizer_scheduler):
    ``{"Adam": {"lr": 1e-3, "lr_scheduler": {"StepLR": {"step_size": 100}}}}``
    """
    if config is None:
        return optax.adam(1e-3)
    if isinstance(config, OptimizerConfig):
        return config.make_optimizer()
    scheduler = None
    if isinstance(config, dict) and len(config) == 1:
        name, kwargs = next(iter(config.items()))
        if isinstance(kwargs, dict) and "lr_scheduler" in kwargs:
            from reagent_tpu.optim.scheduler import LR_SCHEDULERS, with_scheduler

            kwargs = dict(kwargs)
            scheduler = LR_SCHEDULERS.build(kwargs.pop("lr_scheduler"))
            built = OPTIMIZERS.build({name: kwargs})
            return with_scheduler(built.make_optimizer(), scheduler)
    built = OPTIMIZERS.build(config)
    return built.make_optimizer()
