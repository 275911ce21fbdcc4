"""Distributed execution: mesh construction + data-parallel learner.

Reference: the reference delegates data parallelism to PyTorch-Lightning DDP
(workflow/utils.py:135-165, docs/distributed.rst) with NCCL/Gloo all-reduce,
plus an explicit ProcessGroup all-reduce in evolution strategies
(training/gradient_free/es_worker.py:37-46).

TPU-native design: a ``jax.sharding.Mesh`` over (hosts x chips); the trainer
state is replicated, batches are sharded over the ``data`` axis, and the SPMD
partitioner inserts the gradient ``psum`` over ICI automatically — no wrapper
class, no process groups, no rendezvous files.
"""

from reagent_tpu.parallel.data_parallel import (
    make_mesh,
    make_data_parallel_train_step,
    replicate,
    shard_batch,
)
from reagent_tpu.parallel.model_parallel import (
    embedding_specs,
    make_2d_mesh,
    make_model_parallel_train_step,
    shard_state,
)
from reagent_tpu.parallel.scaling import host_shard_batch, measure_scaling_efficiency

__all__ = [
    "make_mesh",
    "make_data_parallel_train_step",
    "replicate",
    "shard_batch",
    "embedding_specs",
    "make_2d_mesh",
    "make_model_parallel_train_step",
    "shard_state",
    "host_shard_batch",
    "measure_scaling_efficiency",
]
