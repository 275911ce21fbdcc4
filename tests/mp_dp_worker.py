"""Worker for the real multi-process data-parallel test.

Run modes (argv[1]):
  dist <pid> <nproc> <port> <out.json>  — join a jax.distributed cluster of
      <nproc> processes x 4 local CPU devices, assemble the global batch from
      this process's local shard via host_shard_batch (the multi-process
      branch of parallel/scaling.py), run 3 DP train steps, pid 0 dumps
      metrics.
  single <out.json> — same training on 8 devices in one process (the oracle).

The reference's analogue is the manual multi-node Lightning DDP recipe
(/root/reference/docs/distributed.rst:31-47), never exercised in its CI.
"""

import json
import os
import sys


def main() -> None:
    mode = sys.argv[1]
    if mode == "dist":
        pid, nproc, port, out_path = (
            int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5],
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    else:
        out_path = sys.argv[2]
        pid, nproc = 0, 1
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from reagent_tpu.core import types as rlt
    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.parallel import (
        host_shard_batch,
        make_data_parallel_train_step,
        make_mesh,
        replicate,
    )
    from reagent_tpu.training import DQNTrainer

    assert jax.device_count() == 8, jax.device_count()
    GLOBAL_B = 64
    local_b = GLOBAL_B // nproc
    rng = np.random.default_rng(0)

    def full(shape):
        return rng.normal(size=shape).astype(np.float32)

    # one deterministic global batch; each process slices its contiguous shard
    states = full((GLOBAL_B, 4))
    next_states = full((GLOBAL_B, 4))
    actions = np.eye(2, dtype=np.float32)[rng.integers(0, 2, GLOBAL_B)]
    next_actions = np.eye(2, dtype=np.float32)[rng.integers(0, 2, GLOBAL_B)]
    rewards = full((GLOBAL_B, 1))
    lo, hi = pid * local_b, (pid + 1) * local_b
    sl = slice(lo, hi)
    local_batch = rlt.DiscreteDqnInput(
        state=rlt.FeatureData(float_features=states[sl]),
        next_state=rlt.FeatureData(float_features=next_states[sl]),
        action=actions[sl],
        next_action=next_actions[sl],
        reward=rewards[sl],
        time_diff=np.ones((local_b, 1), np.float32),
        step=np.ones((local_b, 1), np.int32),
        not_terminal=np.zeros((local_b, 1), np.float32),
        possible_actions_mask=np.ones((local_b, 2), np.float32),
        possible_next_actions_mask=np.ones((local_b, 2), np.float32),
    )

    q_net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = DQNTrainer(
        q_network=q_net, rl=RLParameters(gamma=0.9), optimizer={"SGD": {"lr": 0.1}}
    )
    mesh = make_mesh(len(jax.devices()))
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    state = replicate(state, mesh)
    batch = host_shard_batch(local_batch, mesh)
    leading = jax.tree_util.tree_leaves(batch)[0].shape[0]
    assert leading == GLOBAL_B, f"global batch {leading} != {GLOBAL_B}"

    dp_step = make_data_parallel_train_step(trainer, mesh)
    losses = []
    for _ in range(3):
        state, metrics = dp_step(state, batch)
        losses.append(float(metrics["td_loss"]))

    param_sum = float(
        sum(float(jnp.sum(x)) for x in jax.tree_util.tree_leaves(state.q_params))
    )
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "losses": losses,
                    "param_sum": param_sum,
                    "process_count": jax.process_count(),
                },
                f,
            )
    print(f"worker pid={pid} done losses={losses}", flush=True)


if __name__ == "__main__":
    main()
