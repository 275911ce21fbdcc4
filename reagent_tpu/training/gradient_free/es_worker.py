"""Distributed evolution-strategies worker.

Reference: reagent/training/gradient_free/es_worker.py:20-60 — each worker
evaluates a population shard and all-reduces rewards over an explicit
torch.distributed ProcessGroup.

TPU-native: the all-reduce is a ``jax.lax.psum`` over a device-mesh axis via
``shard_map`` — no process groups, no NCCL.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from reagent_tpu.core.parameters import EvolutionParameters
from reagent_tpu.training.gradient_free.evolution_pool import EvolutionPool

Array = jax.Array


class EsWorker:
    def __init__(
        self,
        individual_pool: EvolutionPool,
        es_params: EvolutionParameters,
        mesh: Mesh,
        axis: str = "data",
    ) -> None:
        self.pool = individual_pool
        self.es_params = es_params
        self.mesh = mesh
        self.axis = axis

    def run_epoch(
        self, reward_fn: Callable[[Dict[str, Array]], Array], iteration: int
    ) -> float:
        """Evaluate the population sharded over devices; psum the rewards.

        Each device computes rewards for its population shard; the
        all-gathered reward vector drives the parent update (the reference's
        ProcessGroup all_reduce at es_worker.py:37-46).
        """
        pop_tensors = self.pool.population_tensors

        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=P(self.axis),  # prefix spec: shard every leaf's pop axis
            out_specs=P(),
            check_vma=False,  # result is replicated by the all_gather below
        )
        def sharded_eval(shard):
            local_rewards = jax.vmap(reward_fn)(shard)  # [pop/n]
            # all-gather across the mesh axis -> full reward vector everywhere
            return jax.lax.all_gather(local_rewards, self.axis).reshape(-1)

        rewards = sharded_eval(pop_tensors)
        self.pool.apply_global_reward(rewards, iteration + 1)
        return float(jnp.mean(rewards))
