"""Python <-> C++ serving integration: boot the decision service, run the
e-commerce customer simulation against it, and check the online-learning loop.

Reference: docs/rasp_tutorial.rst:144-161 — the heuristic plan's published
baseline is ~0.363 avg reward over 1000 simulated requests; the UCB plan must
climb toward the best arm (electronics, p=0.5) as feedback accumulates.
"""

import os
import signal
import socket
import subprocess
import time

import pytest

SERVER_BIN = os.path.join(os.path.dirname(__file__), "..", "serving", "build", "reagent_serving")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SERVER_BIN), reason="C++ serving binary not built"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from examples.ecommerce.customer_simulator import make_plans

    d = tmp_path_factory.mktemp("serving")
    plans = str(d / "plans")
    log = str(d / "decisions.jsonl")
    make_plans(plans)
    port = _free_port()
    proc = subprocess.Popen(
        [os.path.abspath(SERVER_BIN), "--plans", plans, "--port", str(port), "--log", log],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        from reagent_tpu.serving import DecisionServiceClient

        client = DecisionServiceClient(port=port)
        for _ in range(100):
            if client.healthy():
                break
            time.sleep(0.1)
        else:
            raise RuntimeError("serving binary never became healthy")
        yield {"port": port, "log": log}
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=5)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=5)


def test_heuristic_plan_matches_published_baseline(server):
    """~0.363 avg reward over 1000 requests (generous +-0.08 band)."""
    from examples.ecommerce.customer_simulator import simulate

    avg = simulate("heuristic", server["port"], num_requests=1000, seed=1)
    assert 0.28 <= avg <= 0.45, avg


def test_ucb_plan_learns_online(server):
    """UCB feedback updates the arm stats in real time: over 1000 requests the
    average beats the heuristic and approaches the best arm's 0.5."""
    from examples.ecommerce.customer_simulator import simulate

    avg = simulate("multi_armed_bandit", server["port"], num_requests=1000, seed=2)
    assert avg >= 0.40, avg


def test_decision_feedback_log_joined(server):
    """Decisions and feedback are joined and written as JSON lines."""
    import json

    from reagent_tpu.serving import DecisionServiceClient

    client = DecisionServiceClient(port=server["port"])
    resp = client.request("epsilon_greedy", ["a", "b"], input={"a": 1.0, "b": 0.5})
    assert resp["actions"], resp
    client.feedback(resp["request_id"], "epsilon_greedy", resp["actions"][0]["name"], {"purchase": 1.0})
    time.sleep(0.3)
    with open(server["log"]) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    joined = [
        l for l in lines
        if l.get("request", {}).get("request_id") == resp["request_id"]
    ]
    assert joined, f"request {resp['request_id']} not in log ({len(lines)} lines)"
