"""Data-parallel training over a device mesh.

The learner step is compiled once with sharding annotations:
  * trainer state (params, opt state, targets): fully replicated
  * batch: sharded along its leading (batch) axis over the ``data`` mesh axis

XLA's SPMD partitioner then emits an all-reduce (psum) for the gradients over
ICI — the collective the reference obtains from torch DDP (docs/distributed.rst:19-22).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """1-D data mesh by default; reshape for (hosts, chips) if 2 axes given."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices)
    if len(axis_names) > 1:
        # split leading axis into hosts x local
        n_hosts = max(1, len(devices) // jax.local_device_count())
        arr = arr.reshape(n_hosts, -1)
    return Mesh(arr, axis_names)


def replicate(pytree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(pytree, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf along its leading axis over the data axis."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def make_data_parallel_train_step(
    trainer: Any, mesh: Mesh, axis: str = "data", donate_state: bool = True
) -> Callable:
    """Compile ``trainer.train_step`` for the mesh.

    Returns a function ``(state, batch) -> (state, metrics)`` with state
    replicated and batch sharded; gradients are all-reduced by XLA.
    """
    raw_step = getattr(type(trainer).train_step, "__wrapped__", None)
    if raw_step is None:
        raw_step = type(trainer).train_step

    replicated = NamedSharding(mesh, P())

    def batch_spec(x):
        return NamedSharding(mesh, P(axis, *([None] * (max(x.ndim, 1) - 1))))

    def step(state, batch):
        return raw_step(trainer, state, batch)

    def compiled(state, batch):
        in_shardings = (
            jax.tree_util.tree_map(lambda _: replicated, state),
            jax.tree_util.tree_map(batch_spec, batch),
        )
        fn = jax.jit(
            step,
            in_shardings=in_shardings,
            out_shardings=(
                jax.tree_util.tree_map(lambda _: replicated, state),
                None,
            ),
            donate_argnums=(0,) if donate_state else (),
        )
        return fn(state, batch)

    return compiled
