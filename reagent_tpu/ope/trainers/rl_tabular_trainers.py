"""Tabular ground-truth policies / value functions for OPE benchmarks.

Reference: reagent/ope/trainers/rl_tabular_trainers.py:1-394 (TabularPolicy,
DPTrainer value iteration, DPValueFunction).
"""

from __future__ import annotations

from typing import Callable, Dict, Hashable, List, Optional

import numpy as np


class TabularPolicy:
    """state -> action distribution table."""

    def __init__(self, num_actions: int, epsilon: float = 0.0, rng=None):
        self.num_actions = num_actions
        self.epsilon = epsilon
        self._table: Dict[Hashable, np.ndarray] = {}
        self._rng = rng or np.random.default_rng(0)

    def update(self, state: Hashable, action: int) -> None:
        """Make ``action`` the greedy choice with eps-smoothing."""
        probs = np.full(self.num_actions, self.epsilon / self.num_actions)
        probs[action] += 1.0 - self.epsilon
        self._table[state] = probs

    def action_dist(self, state: Hashable) -> np.ndarray:
        return self._table.get(
            state, np.full(self.num_actions, 1.0 / self.num_actions)
        )

    def sample(self, state: Hashable) -> int:
        return int(self._rng.choice(self.num_actions, p=self.action_dist(state)))

    def __call__(self, state: Hashable) -> np.ndarray:
        return self.action_dist(state)


class DPTrainer:
    """Dynamic-programming (value iteration) trainer on an enumerable MDP.

    The MDP protocol: ``states`` list, ``transition(s, a) -> list of
    (prob, next_state, reward, done)``.
    """

    def __init__(self, mdp, policy: Optional[TabularPolicy] = None):
        self.mdp = mdp
        self.policy = policy

    def train(self, gamma: float = 0.9, iterations: int = 1000, tol: float = 1e-8) -> Dict:
        V: Dict[Hashable, float] = {s: 0.0 for s in self.mdp.states}
        num_actions = self.mdp.num_actions
        for _ in range(iterations):
            delta = 0.0
            for s in self.mdp.states:
                qs = []
                for a in range(num_actions):
                    q = 0.0
                    for prob, ns, r, done in self.mdp.transition(s, a):
                        q += prob * (r + (0.0 if done else gamma * V[ns]))
                    qs.append(q)
                best = max(qs)
                delta = max(delta, abs(best - V[s]))
                V[s] = best
                if self.policy is not None:
                    self.policy.update(s, int(np.argmax(qs)))
            if delta < tol:
                break
        return V


class DPValueFunction:
    """Policy evaluation for a fixed tabular policy (reference :300-394)."""

    def __init__(self, policy: TabularPolicy, mdp, gamma: float = 0.9):
        self.policy = policy
        self.mdp = mdp
        self.gamma = gamma
        self._V: Optional[Dict] = None

    def evaluate(self, iterations: int = 1000, tol: float = 1e-8) -> Dict:
        V: Dict[Hashable, float] = {s: 0.0 for s in self.mdp.states}
        for _ in range(iterations):
            delta = 0.0
            for s in self.mdp.states:
                v = 0.0
                probs = self.policy.action_dist(s)
                for a in range(self.mdp.num_actions):
                    for prob, ns, r, done in self.mdp.transition(s, a):
                        v += probs[a] * prob * (r + (0.0 if done else self.gamma * V[ns]))
                delta = max(delta, abs(v - V[s]))
                V[s] = v
            if delta < tol:
                break
        self._V = V
        return V

    def state_value(self, state) -> float:
        if self._V is None:
            self.evaluate()
        return self._V.get(state, 0.0)
