"""Estimate parity of the jitted sequential estimators vs the reference's
own numpy estimators at production log scale (nightly) and CI scale (fast).

Reference: reagent/evaluation/weighted_sequential_doubly_robust_estimator.py
and sequential_doubly_robust_estimator.py — the per-trajectory host-loop
implementations this package replaces with one jitted [N, T] program.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")  # bench.py lives at the repo root


def _run_both(n_traj: int):
    import bench

    old_n = bench._CPE_N
    bench._CPE_N = n_traj
    try:
        timed = bench.prep_cpe_at_scale_tpu()
        ours = timed()
        ref = bench.bench_cpe_reference_cpu()
    finally:
        bench._CPE_N = old_n
    assert ref is not None, "reference tree not importable"
    return ours, ref


@pytest.mark.parametrize("est", ["magic", "seqdr"])
def test_cpe_parity_ci_scale(est):
    ours, ref = _run_both(500)
    rel = abs(ours[f"{est}_raw"] - ref[f"{est}_raw"]) / abs(ref[f"{est}_raw"])
    assert rel < 5e-3, (ours[f"{est}_raw"], ref[f"{est}_raw"])


@pytest.mark.nightly
def test_cpe_parity_at_scale():
    """N=20k x T=50 x A=10 — the BENCH workload size."""
    ours, ref = _run_both(20_000)
    for est in ("magic", "seqdr"):
        rel = abs(ours[f"{est}_raw"] - ref[f"{est}_raw"]) / abs(ref[f"{est}_raw"])
        assert rel < 5e-3, (est, ours[f"{est}_raw"], ref[f"{est}_raw"])
        # and the jitted path must actually be faster than the host loops
        assert ours[f"{est}_s"] < ref[f"{est}_s"], (
            est, ours[f"{est}_s"], ref[f"{est}_s"]
        )
