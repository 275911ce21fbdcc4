"""Hyper-parameter tuning: seed-averaged parallel evaluation + search loop.

Reference: reagent/scripts/hparam_tuning.py:20-207 (Ax-backed there; Ax is not
in this image, so the search loop uses the lite combinatorial optimizers over
discrete grids — same evaluate-params contract).
"""

from __future__ import annotations

import copy
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def evaluate_params(
    params_list: List[Dict],
    fixed_params: Dict,
    eval_fn: Callable[[Dict], Dict[str, float]],
    parse_params_fn: Optional[Callable] = None,
    num_seeds: int = 10,
    num_proc: int = 4,
) -> List[Dict[str, Tuple[float, float]]]:
    """Evaluate each config averaged over seeds (reference ax_evaluate_params).

    Returns, per config, {metric: (mean, sem)} across seeds.
    """
    jobs = []
    for ci, params in enumerate(params_list):
        for s in range(num_seeds):
            p = copy.deepcopy(params)
            p.update(fixed_params)
            p["seed"] = s
            if parse_params_fn is not None:
                p = parse_params_fn(p)
            jobs.append((ci, p))

    if num_proc > 1:
        with ThreadPoolExecutor(max_workers=num_proc) as pool:
            metrics = list(pool.map(lambda job: eval_fn(job[1]), jobs))
    else:
        metrics = [eval_fn(p) for _, p in jobs]

    results: List[Dict[str, Tuple[float, float]]] = []
    for ci in range(len(params_list)):
        per_metric: Dict[str, List[float]] = {}
        for (cj, _), m in zip(jobs, metrics):
            if cj != ci:
                continue
            for k, v in m.items():
                per_metric.setdefault(k, []).append(v)
        results.append(
            {
                k: (float(np.mean(v)), float(np.std(v) / np.sqrt(len(v))))
                for k, v in per_metric.items()
            }
        )
    return results


def grid_search(
    param_grid: Dict[str, Sequence],
    eval_fn: Callable[[Dict], Dict[str, float]],
    objective: str,
    fixed_params: Optional[Dict] = None,
    num_seeds: int = 3,
    minimize: bool = False,
    num_proc: int = 4,
) -> Tuple[Dict, Dict[str, Tuple[float, float]]]:
    """Exhaustive grid search returning (best_params, best_metrics)."""
    import itertools

    keys = list(param_grid)
    configs = [
        dict(zip(keys, combo)) for combo in itertools.product(*param_grid.values())
    ]
    results = evaluate_params(
        configs, fixed_params or {}, eval_fn, num_seeds=num_seeds, num_proc=num_proc
    )
    scores = [r[objective][0] for r in results]
    best = int(np.argmin(scores) if minimize else np.argmax(scores))
    return configs[best], results[best]
