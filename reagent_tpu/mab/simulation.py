"""Bandit simulation + benchmark loops.

Reference: reagent/mab/simulation.py:18-225 (BernoulliMAB env, per-algo
evaluation loops collecting regret trajectories).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Type

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.mab.mab_algorithm import MABAlgo, MABState

Array = jax.Array


class MAB:
    """Synthetic bandit environment base (reference simulation.py:24)."""

    def __init__(self, max_steps: int, expected_rewards: Array, arm_ids=None):
        self.max_steps = max_steps
        self.expected_rewards = jnp.asarray(expected_rewards)
        self.n_arms = self.expected_rewards.shape[0]
        self.arm_ids = arm_ids or [str(i) for i in range(self.n_arms)]
        self.best_action_value = float(jnp.max(self.expected_rewards))
        self.t = 0

    def act(self, arm_id: str, rng: Array) -> float:
        raise NotImplementedError


class BernoulliMAB(MAB):
    """Bernoulli rewards with per-arm success probabilities (reference :58)."""

    def __init__(self, max_steps: int, probs: Array, arm_ids=None):
        assert float(jnp.max(probs)) <= 1.0 and float(jnp.min(probs)) >= 0.0
        super().__init__(max_steps, probs, arm_ids)

    def act(self, arm_id: str, rng: Array) -> float:
        idx = self.arm_ids.index(arm_id)
        p = self.expected_rewards[idx]
        return float(jax.random.bernoulli(rng, p))


def single_evaluation_bandit_algo(
    bandit: MAB, algo: MABAlgo, seed: int = 0, update_every: int = 1
) -> np.ndarray:
    """Run one bandit-vs-algo episode, return per-step pseudo-regret trajectory.

    Reference: simulation.py:70-120.
    """
    rng = jax.random.PRNGKey(seed)
    state = algo.init()
    regrets: List[float] = []
    pending = {a: [0, 0.0, 0.0] for a in algo.arm_ids}  # n, sum, sum_sq
    for t in range(bandit.max_steps):
        rng, r_act, r_rew = jax.random.split(rng, 3)
        arm = algo.get_action(state, r_act)
        reward = bandit.act(arm, r_rew)
        idx = algo.arm_ids.index(arm)
        regrets.append(
            bandit.best_action_value - float(bandit.expected_rewards[idx])
        )
        p = pending[arm]
        p[0] += 1
        p[1] += reward
        p[2] += reward**2
        if (t + 1) % update_every == 0:
            n = jnp.asarray([pending[a][0] for a in algo.arm_ids], jnp.float32)
            s = jnp.asarray([pending[a][1] for a in algo.arm_ids], jnp.float32)
            s2 = jnp.asarray([pending[a][2] for a in algo.arm_ids], jnp.float32)
            state = algo.add_batch_observations(state, n, s, s2)
            pending = {a: [0, 0.0, 0.0] for a in algo.arm_ids}
    return np.cumsum(regrets)


def compare_bandit_algos(
    algo_clss: Sequence[Type[MABAlgo]],
    bandit: MAB,
    n_trials: int = 5,
    update_every: int = 1,
) -> Dict[str, np.ndarray]:
    """Mean cumulative-regret trajectory per algorithm (reference :150-225)."""
    results = {}
    for cls in algo_clss:
        trajs = [
            single_evaluation_bandit_algo(
                bandit, cls(n_arms=bandit.n_arms), seed=s, update_every=update_every
            )
            for s in range(n_trials)
        ]
        results[cls.__name__] = np.mean(np.stack(trajs), axis=0)
    return results
