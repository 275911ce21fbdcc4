"""Tracing / profiling helpers.

Reference: the reference has no profiling beyond logging (SURVEY §5); the TPU
equivalent is the jax profiler (xprof traces) + simple step timers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xprof trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking wall-clock timer for jitted steps (forces device sync)."""

    def __init__(self):
        self.times: list = []

    @contextlib.contextmanager
    def measure(self, result_to_block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        arr = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p99_s": float(np.percentile(arr, 99)),
            "steps_per_s": float(1.0 / max(arr.mean(), 1e-12)),
        }


def annotate(name: str):
    """Named region in xprof traces."""
    return jax.profiler.TraceAnnotation(name)
