"""Metrics bus: observers + aggregators + ambient summary-writer context.

Reference: reagent/core/tracker.py:16-137 (Observer/Aggregator/@observable),
reagent/core/aggregators.py, reagent/core/tensorboardX.py:64 (ambient writer).

TPU-native twist: jitted train steps return a flat ``{name: scalar}`` metrics
dict (device arrays).  The host-side bus consumes those dicts asynchronously —
values are only pulled to host (blocking) at flush time, so logging never
stalls the device pipeline.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class Observer:
    """Receives values published under a set of keys (reference tracker.py:16)."""

    def __init__(self, observing_keys: Sequence[str]):
        self.observing_keys = list(observing_keys)

    def update(self, key: str, value: Any) -> None:
        raise NotImplementedError


class ValueListObserver(Observer):
    """Stores every observed value (reference: core/observers.py:117)."""

    def __init__(self, observing_key: str):
        super().__init__([observing_key])
        self.values: List[Any] = []

    def update(self, key: str, value: Any) -> None:
        self.values.append(value)

    def reset(self) -> None:
        self.values = []


class Aggregator:
    """Accumulates values for one key, flushes an aggregate (reference aggregators.py:19)."""

    def __init__(self, key: str):
        self.key = key
        self.values: List[Any] = []

    def update(self, key: str, value: Any) -> None:
        self.values.append(value)

    def __call__(self, key: str, values: List[Any]) -> None:
        """Fold a buffered list of values (reference aggregators.py:19-24)."""
        assert key == self.key, f"{key} != {self.key}"
        for v in values:
            self.values.append(v)

    def flush(self) -> Optional[float]:
        if not self.values:
            return None
        out = self.aggregate([np.asarray(v) for v in self.values])
        self.values = []
        return out

    def aggregate(self, values: List[np.ndarray]) -> float:
        raise NotImplementedError


class MeanAggregator(Aggregator):
    def aggregate(self, values: List[np.ndarray]) -> float:
        return float(np.mean([np.mean(v) for v in values]))


class LastValueAggregator(Aggregator):
    def aggregate(self, values: List[np.ndarray]) -> float:
        return float(np.mean(values[-1]))


class EpochMeanAggregator(MeanAggregator):
    pass


class ObservableMixin:
    """Anything that can notify observers of published values."""

    def __init__(self) -> None:
        self._observers: Dict[str, List[Observer]] = defaultdict(list)

    def add_observer(self, observer: Observer) -> "ObservableMixin":
        for key in observer.observing_keys:
            if observer not in self._observers[key]:
                self._observers[key].append(observer)
        return self

    def add_observers(self, observers: Sequence[Observer]) -> "ObservableMixin":
        for o in observers:
            self.add_observer(o)
        return self

    def notify_observers(self, **kwargs: Any) -> None:
        for key, value in kwargs.items():
            if value is None:
                continue
            for observer in self._observers.get(key, []):
                observer.update(key, value)


class SummaryWriterContext:
    """Ambient TensorBoard writer stack with a global step.

    Reference: reagent/core/tensorboardX.py:64-123.  Any code can call
    ``SummaryWriterContext.add_scalar(...)`` without plumbing a writer through;
    no-ops when no writer is pushed (exactly the reference's semantics).
    """

    _writer_stacks: List[Any] = []
    _global_step: int = 0

    @classmethod
    def _current_writer(cls):
        return cls._writer_stacks[-1] if cls._writer_stacks else None

    @classmethod
    def increase_global_step(cls) -> None:
        cls._global_step += 1

    @classmethod
    def add_scalar(cls, key: str, value: Any, walltime: Optional[float] = None) -> None:
        writer = cls._current_writer()
        if writer is None:
            return
        writer.add_scalar(key, np.asarray(value).item(), global_step=cls._global_step)

    @classmethod
    def add_histogram(cls, key: str, value: Any) -> None:
        writer = cls._current_writer()
        if writer is None:
            return
        writer.add_histogram(key, np.asarray(value), global_step=cls._global_step)

    @classmethod
    def push(cls, writer) -> None:
        cls._writer_stacks.append(writer)

    @classmethod
    def pop(cls):
        return cls._writer_stacks.pop()

    @classmethod
    def reset(cls) -> None:
        cls._writer_stacks = []
        cls._global_step = 0


class summary_writer_context:
    """``with summary_writer_context(writer): ...`` (reference tensorboardX.py:126)."""

    def __init__(self, writer):
        self._writer = writer

    def __enter__(self):
        SummaryWriterContext.push(self._writer)
        return self._writer

    def __exit__(self, *args):
        SummaryWriterContext.pop()
        return False
