"""REAL multi-process data-parallel execution (VERDICT round-2 item 2).

Launches 2 OS processes that join one jax.distributed cluster (4 virtual CPU
devices each -> 8 global), assemble a global batch from per-process local
shards via ``host_shard_batch``'s multi-process branch
(``jax.make_array_from_process_local_data``), and train DQN data-parallel on
the shared mesh.  The loss trajectory must match a single-process 8-device
run on the same global batch.

Reference analogue: /root/reference/docs/distributed.rst:31-47 (multi-node
DDP recipe, documented but never executed in the reference's CI).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "mp_dp_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    # workers configure their own platform/devices
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.serial
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    dist_out = tmp_path / "dist.json"
    single_out = tmp_path / "single.json"
    env = _clean_env()

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "dist", str(pid), "2", str(port), str(dist_out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)[-4000:]

    single = subprocess.run(
        [sys.executable, WORKER, "single", str(single_out)],
        env=env, capture_output=True, timeout=420,
    )
    assert single.returncode == 0, single.stdout[-2000:] + single.stderr[-2000:]

    dist = json.loads(dist_out.read_text())
    ref = json.loads(single_out.read_text())
    assert dist["process_count"] == 2
    assert ref["process_count"] == 1
    np.testing.assert_allclose(dist["losses"], ref["losses"], rtol=1e-6, atol=1e-7)
    assert dist["param_sum"] == pytest.approx(ref["param_sum"], rel=1e-6)
