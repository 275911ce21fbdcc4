"""Multi-host input assembly + data-parallel scaling measurement.

Reference: the reference's multi-node story is petastorm readers per rank +
Lightning DDP (docs/distributed.rst:31-47 there), never measured in CI.  Here
both halves are first-class:

* ``host_shard_batch`` assembles a global device array from each process's
  local shard (``jax.make_array_from_process_local_data``) — the TPU-pod
  equivalent of per-rank petastorm readers feeding DDP.
* ``measure_scaling_efficiency`` times the jitted data-parallel train step at
  increasing device counts and reports weak-scaling efficiency (the
  BASELINE.md ">=80% at N>=2 hosts" metric).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reagent_tpu.parallel.data_parallel import (
    make_data_parallel_train_step,
    make_mesh,
    replicate,
    shard_batch,
)


# "How to Scale Your Model" figure for TPU v5e: one ICI axis moves
# ~4.5e10 bytes/s per direction; a bidirectional ring all-reduce on one
# mesh axis streams both directions at once.
V5E_ICI_ONE_WAY_BYTES_PER_S = 4.5e10


def analytic_dp_allreduce_model(
    param_bytes: float,
    compute_time_s: float,
    device_counts: Sequence[int],
    ici_bytes_per_s: float = 2 * V5E_ICI_ONE_WAY_BYTES_PER_S,
    hop_latency_s: float = 1e-6,
) -> Dict[int, Dict[str, float]]:
    """Predicted data-parallel weak-scaling efficiency on REAL ICI.

    Ring all-reduce moves ``2(n-1)/n * param_bytes`` through each chip's ICI
    (reduce-scatter + all-gather), so per-step overhead is that volume over
    the per-chip ring bandwidth plus the ring's SEQUENTIAL hop latencies:
    ``2(n-1)`` hops on a 1-D ring; on v5e's 2-D torus (meshes beyond ~16
    chips) the all-reduce runs per axis, ``~4(sqrt(n)-1)`` hops total.  XLA
    may additionally switch to latency-optimal algorithms for tiny payloads,
    so the latency term here is conservative.  Predicted efficiency is
    ``compute / (compute + allreduce)``.  This is the argument behind the
    BASELINE.md ">=80% at N>=2 hosts" target when the dryrun's virtual CPU
    devices cannot measure it: for the bench DQN (36 KB grads, ~1 ms steps)
    the model gives >=0.94 out to 256 chips.
    """
    out: Dict[int, Dict[str, float]] = {}
    for n in device_counts:
        if n <= 1:
            out[n] = {"allreduce_s": 0.0, "predicted_efficiency": 1.0}
            continue
        if n <= 16:  # 1-D ring
            hops = 2.0 * (n - 1)
        else:  # 2-D torus, per-axis rings
            hops = 4.0 * (np.sqrt(n) - 1.0)
        ar = (
            2.0 * (n - 1) / n * param_bytes / ici_bytes_per_s
            + hop_latency_s * float(hops)
        )
        out[n] = {
            "allreduce_s": ar,
            "predicted_efficiency": compute_time_s / (compute_time_s + ar),
        }
    return out


def host_shard_batch(local_batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Assemble a global batch from this process's local shard.

    Each host passes its locally-loaded rows; the result is a global array
    sharded over ``axis`` whose leading dim is ``local * num_processes``.
    On a single process this is identical to ``shard_batch``.
    """
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh, axis)

    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (max(x.ndim, 1) - 1)))
        return jax.make_array_from_process_local_data(NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(put, local_batch)


def measure_scaling_efficiency(
    trainer: Any,
    trainer_state: Any,
    batch_for: Callable[[int], Any],
    device_counts: Optional[Sequence[int]] = None,
    num_steps: int = 50,
    axis: str = "data",
) -> Dict[int, Dict[str, float]]:
    """Weak-scaling sweep: per-device batch fixed, devices grow.

    ``batch_for(global_batch_size)`` builds a host batch; per device count n
    the global batch is ``n * batch_for(1)-leading-dim``... concretely the
    caller decides the per-device size: ``batch_for(n)`` must return the
    global batch for n devices.  Returns, per n:
    ``{"steps_per_s", "efficiency"}`` where efficiency is
    throughput(n) / (n * throughput(1)) for weak scaling (ideal = 1.0).
    """
    avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= avail]
    results: Dict[int, Dict[str, float]] = {}
    base_rate = None
    for n in device_counts:
        mesh = make_mesh(n_devices=n, axis_names=(axis,))
        step = make_data_parallel_train_step(trainer, mesh, axis=axis)
        # deep copy: the donating step must not consume the caller's buffers
        # (device_put to the same single-device sharding can alias, not copy)
        state = replicate(
            jax.tree_util.tree_map(lambda x: jax.numpy.array(x), trainer_state), mesh
        )
        batch = shard_batch(batch_for(n), mesh, axis)
        state, _ = step(state, batch)  # compile
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        t0 = time.perf_counter()
        for _ in range(num_steps):
            state, metrics = step(state, batch)
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        dt = time.perf_counter() - t0
        # weak scaling: samples/s grows with n; step rate ideally constant
        rate = num_steps / dt
        if base_rate is None:
            base_rate = rate
        results[n] = {
            "steps_per_s": rate,
            "samples_per_s": rate * int(np.shape(jax.tree_util.tree_leaves(batch)[0])[0]),
            "efficiency": rate / base_rate,
        }
    return results
