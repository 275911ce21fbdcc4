"""Device-resident multi-step training loops (``lax.scan`` over train steps).

The reference's offline hot loop streams one minibatch per ``training_step``
through a host dataloader (reagent/workflow/training.py:214 via Lightning +
petastorm, workflow/utils.py:64-118).  On TPU that per-step host round trip
is the bottleneck: each dispatch costs ~1 ms over the runtime even when the
step itself takes 100 us.  The TPU-native shape is to keep the (preprocessed)
training table in device memory and run K train steps as ONE compiled
program — XLA pipelines the minibatch gathers with the update math and the
host is touched once per K steps.

Works with any trainer exposing the standard jitted two-argument
``train_step(state, batch) -> (state, metrics)`` — the DQN family,
actor-critic, slate, reward-network, and world-model trainers.  Trainers with
different signatures (CEMTrainer, MultiStageTrainer, the cb trainers, and the
rng-taking Seq2SlateTrainerWithSimulation) are rejected with a clear error.
Semantics are exactly K sequential ``train_step`` calls — asserted by
tests/test_scan_loop.py.
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _raw_train_step(trainer: Any) -> Callable:
    """The undecorated train_step (so we don't nest jit dispatch in the scan)."""
    raw = getattr(type(trainer).train_step, "__wrapped__", None)
    if raw is None:
        raw = type(trainer).train_step
    params = [
        p
        for p in inspect.signature(raw).parameters.values()
        if p.default is inspect.Parameter.empty
        and p.kind
        in (inspect.Parameter.POSITIONAL_ONLY, inspect.Parameter.POSITIONAL_OR_KEYWORD)
    ]
    if len(params) != 3:  # self, state, batch
        raise TypeError(
            f"{type(trainer).__name__}.train_step has signature "
            f"{inspect.signature(raw)}; the scan loop needs the standard "
            "(state, batch) -> (state, metrics) form"
        )
    return raw


def make_scanned_train_fn(trainer: Any) -> Callable:
    """``(state, batches) -> (state, metrics)`` running one train step per
    leading-axis slice of ``batches`` in a single compiled scan.

    ``batches`` is any batch pytree whose array leaves carry a leading
    ``[K, ...]`` axis (K stacked minibatches).  ``metrics`` leaves are
    ``[K]``-stacked.
    """
    raw_step = _raw_train_step(trainer)

    @functools.partial(jax.jit, donate_argnums=0)
    def run(state, batches):
        def body(s, b):
            return raw_step(trainer, s, b)

        return jax.lax.scan(body, state, batches)

    return run


def make_sampled_train_fn(
    trainer: Any,
    dataset: Any,
    minibatch_size: int,
    num_steps: int,
    num_rows: Optional[int] = None,
    allow_static_leaves: bool = False,
) -> Callable:
    """``(state, rng) -> (state, metrics)``: ``num_steps`` train steps, each
    on a uniformly sampled minibatch gathered from the device-resident
    ``dataset`` (a batch pytree with leading axis ``[N, ...]``), all inside
    one compiled program.

    This is the TPU equivalent of the reference's
    ``OfflineReplayBufferDataset`` epoch (gym/datasets/
    replay_buffer_dataset.py:150-206): sample-with-replacement minibatches
    over a fixed corpus.
    """
    raw_step = _raw_train_step(trainer)
    if num_rows is None:
        num_rows = jax.tree_util.tree_leaves(dataset)[0].shape[0]

    # every batched array leaf must be per-row ([num_rows, ...]); 0-d leaves
    # and (with allow_static_leaves) fixed per-dataset arrays such as a [D]
    # normalization vector are passed through whole instead of gathered
    def _is_static(x) -> bool:
        return hasattr(x, "shape") and (
            x.ndim < 1 or (allow_static_leaves and x.shape[0] != num_rows)
        )

    bad = [
        (i, x.shape)
        for i, x in enumerate(jax.tree_util.tree_leaves(dataset))
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] != num_rows
        and not allow_static_leaves
    ]
    if bad:
        raise ValueError(
            f"dataset leaves {bad} do not have leading dim num_rows={num_rows}; "
            "every batched leaf must be stacked per-row for minibatch "
            "gathering (pass allow_static_leaves=True to carry fixed "
            "per-dataset arrays through whole)"
        )

    def gather(idx):
        return jax.tree_util.tree_map(
            lambda x: x[idx] if hasattr(x, "shape") and not _is_static(x) else x,
            dataset,
        )

    @functools.partial(jax.jit, donate_argnums=0)
    def run(state, rng):
        def body(s, r):
            idx = jax.random.randint(r, (minibatch_size,), 0, num_rows)
            return raw_step(trainer, s, gather(idx))

        return jax.lax.scan(body, state, jax.random.split(rng, num_steps))

    return run
