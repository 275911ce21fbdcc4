"""Model-parallel embedding sharding composed with data parallelism.

Reference parity: the reference only *flags* large-embedding model parallelism
(reagent/models/base.py:59-61 ``requires_model_parallel``; the actual torchrec
sharder is FB-internal). Here it is a real TPU feature: embedding tables are
row-sharded over a ``model`` mesh axis while the dense trunk stays replicated,
and the batch is sharded over the ``data`` axis — a 2-D (data, model) mesh.

How it maps to hardware: a row-sharded table keeps each shard in its chip's
HBM (tables larger than one chip's memory become trainable), and XLA's SPMD
partitioner turns the padded-ID gather into a partitioned gather + psum over
the ``model`` axis riding ICI. Gradients for the table are computed shard-local
(scatter-add onto the local rows) — no replicated [table_size, dim] tensor ever
materializes.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EMBEDDING_PARAM_NAME = "embedding"


def make_2d_mesh(
    n_devices: Optional[int] = None,
    data_parallel: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """(data, model) mesh. ``data_parallel`` defaults to n_devices // 2."""
    devices = list(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    dp = data_parallel if data_parallel is not None else max(1, n // 2)
    assert n % dp == 0, f"{n} devices not divisible by data_parallel={dp}"
    return Mesh(np.array(devices).reshape(dp, n // dp), axis_names)


def _is_embedding_path(path) -> bool:
    for k in path:
        name = getattr(k, "key", getattr(k, "name", None))
        if name == EMBEDDING_PARAM_NAME:
            return True
    return False


def embedding_specs(pytree: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree: embedding tables row-sharded, everything else replicated.

    Works on the full trainer state: optimizer moments (e.g. Adam mu/nu) mirror
    the param tree, so their paths also contain the ``embedding`` key and get
    the same row sharding — shard-local optimizer updates, no gather.
    """

    def spec(path, x):
        if _is_embedding_path(path) and getattr(x, "ndim", 0) >= 2:
            return P(model_axis, *([None] * (x.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, pytree)


def shard_state(state: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """Place trainer state on the mesh with embedding tables row-sharded."""
    specs = embedding_specs(state, model_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def make_model_parallel_train_step(
    trainer: Any,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    donate_state: bool = True,
) -> Callable:
    """Compile ``trainer.train_step`` for a 2-D (data, model) mesh.

    state: embedding tables P(model, None), rest replicated.
    batch: leading axis P(data).
    XLA inserts the gather/psum collectives for the sharded lookups and the
    grad all-reduce over ``data`` — same program, one partitioner.
    """
    raw_step = getattr(type(trainer).train_step, "__wrapped__", None)
    if raw_step is None:
        raw_step = type(trainer).train_step

    def batch_sharding(x):
        return NamedSharding(
            mesh, P(data_axis, *([None] * (max(x.ndim, 1) - 1)))
        )

    def step(state, batch):
        return raw_step(trainer, state, batch)

    def compiled(state, batch):
        state_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), embedding_specs(state, model_axis)
        )
        fn = jax.jit(
            step,
            in_shardings=(
                state_shardings,
                jax.tree_util.tree_map(batch_sharding, batch),
            ),
            out_shardings=(state_shardings, None),
            donate_argnums=(0,) if donate_state else (),
        )
        return fn(state, batch)

    return compiled
