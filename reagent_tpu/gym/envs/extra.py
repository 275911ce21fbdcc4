"""Additional pure-JAX benchmark environments.

Reference envs re-designed as functional step functions:
  * LinDyna        — reagent/gym/envs/dynamics/linear_dynamics.py (LQR system)
  * OpenGridworld  — MiniGrid-Empty-5x5 equivalent used by
                     gym/tests/configs/open_gridworld/
  * StringGame     — reagent/gym/envs/pomdp/string_game.py (POMDP: reward
                     depends on the last 3 actions; "ABB" -> +5, "BBB" -> -5)
  * ChangingArms   — reagent/gym/envs/changing_arms.py (sparse-feature bandit)
  * RecSimSlate    — simplified interest-evolution slate env in the spirit of
                     gym/envs/recsim.py (SlateQ benchmark)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from reagent_tpu.gym.envs.functional import FunctionalEnv, FunctionalEnvState

Array = jax.Array


class LinDyna(FunctionalEnv):
    """x' = Ax + Bu; reward = -(x'Qx + u'Ru); 4-step episodes (ref linear_dynamics.py)."""

    observation_dim = 3
    action_dim = 2
    discrete = False
    max_steps = 4

    A = 0.2 * jnp.array([[-1.0, -1.0, 1.0], [2.0, 0.0, 2.0], [0.0, -1.0, 2.0]])
    B = 0.2 * jnp.array([[2.0, 2.0], [2.0, 2.0], [0.0, 1.0]])
    Q = 0.2 * jnp.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.5], [0.0, 0.5, 1.0]])
    R = 0.2 * jnp.array([[1.0, -1.0], [-1.0, 2.0]])

    def reset(self, rng: Array):
        x = jax.random.randint(rng, (3,), -1, 2).astype(jnp.float32)
        return FunctionalEnvState(physics=x, t=jnp.zeros((), jnp.int32)), x

    def step(self, state: FunctionalEnvState, action: Array, rng: Array):
        x = state.physics
        u = jnp.clip(action.reshape(-1), -3.0, 3.0)
        # cost is positive-definite quadratic; reward is its negation
        cost = x @ self.Q @ x + u @ self.R @ u
        nx = self.A @ x + self.B @ u
        t = state.t + 1
        done = t >= self.max_steps
        return (
            FunctionalEnvState(physics=nx, t=t),
            nx,
            -cost.astype(jnp.float32),
            done,
        )


class OpenGridworld(FunctionalEnv):
    """Empty gridworld: actions {left, right, up, down}; reach the goal.

    Matches MiniGrid-Empty-5x5 semantics (the reference's open-gridworld
    benchmark env): the 5x5 grid has walls, so the playable area is 3x3
    (``size=3``), max_steps = 4*5*5 = 100, and success reward =
    1 - 0.9 * t/max_steps.  Observation: one-hot of (x, y).
    """

    discrete = True

    def __init__(self, size: int = 3, max_steps: int = 100):
        self.size = size
        self.max_steps = max_steps
        self.observation_dim = 2 * size
        self.action_dim = 4

    def _obs(self, physics: Array) -> Array:
        x = jax.nn.one_hot(physics[0].astype(jnp.int32), self.size)
        y = jax.nn.one_hot(physics[1].astype(jnp.int32), self.size)
        return jnp.concatenate([x, y])

    def reset(self, rng: Array):
        physics = jnp.zeros(2)
        return FunctionalEnvState(physics=physics, t=jnp.zeros((), jnp.int32)), self._obs(physics)

    def step(self, state: FunctionalEnvState, action: Array, rng: Array):
        a = action.astype(jnp.int32)
        dx = jnp.where(a == 0, -1, jnp.where(a == 1, 1, 0))
        dy = jnp.where(a == 2, -1, jnp.where(a == 3, 1, 0))
        x = jnp.clip(state.physics[0] + dx, 0, self.size - 1)
        y = jnp.clip(state.physics[1] + dy, 0, self.size - 1)
        physics = jnp.stack([x, y]).astype(jnp.float32)
        t = state.t + 1
        at_goal = jnp.logical_and(x == self.size - 1, y == self.size - 1)
        reward = jnp.where(
            at_goal, 1.0 - 0.9 * t.astype(jnp.float32) / self.max_steps, 0.0
        )
        done = jnp.logical_or(at_goal, t >= self.max_steps)
        return FunctionalEnvState(physics=physics, t=t), self._obs(physics), reward, done


class StringGame(FunctionalEnv):
    """POMDP string game (ref pomdp/string_game.py): 2 actions (A=0, B=1);
    reward +5 for trailing window 'ABB', -5 for 'BBB'; 6-step episodes.
    Observation = one-hot of last action (the memoryless observation making it
    a POMDP)."""

    observation_dim = 2
    action_dim = 2
    discrete = True
    max_steps = 6

    def reset(self, rng: Array):
        # physics = [a_{t-2}, a_{t-1}, a_t] encoded as -1 (none) / 0 / 1
        physics = jnp.full((3,), -1.0)
        return FunctionalEnvState(physics=physics, t=jnp.zeros((), jnp.int32)), jnp.zeros(2)

    def step(self, state: FunctionalEnvState, action: Array, rng: Array):
        a = action.astype(jnp.float32)
        physics = jnp.stack([state.physics[1], state.physics[2], a])
        is_abb = jnp.all(physics == jnp.array([0.0, 1.0, 1.0]))
        is_bbb = jnp.all(physics == jnp.array([1.0, 1.0, 1.0]))
        reward = jnp.where(is_abb, 5.0, jnp.where(is_bbb, -5.0, 0.0))
        t = state.t + 1
        done = t >= self.max_steps
        obs = jax.nn.one_hot(a.astype(jnp.int32), 2)
        return FunctionalEnvState(physics=physics, t=t), obs, reward, done


class StringGameV1(FunctionalEnv):
    """Stochastic-length string game (ref pomdp/string_game_v1.py:46).

    2 actions (A=0, B=1); episodes last at most 3 steps with state-dependent
    survival: after playing A the episode continues with p=0.5, after B with
    p=0.9.  Terminal reward: +5 for observing 'AAA', +4 for 'BA', else 0 —
    planning with termination probabilities prefers B first (E[Q_B]=1.8 >
    E[Q_A]=1.25).
    """

    observation_dim = 2
    action_dim = 2
    discrete = True
    max_steps = 3

    def reset(self, rng: Array):
        physics = jnp.full((3,), -1.0)  # action history, -1 = none
        return FunctionalEnvState(physics=physics, t=jnp.zeros((), jnp.int32)), jnp.zeros(2)

    def step(self, state: FunctionalEnvState, action: Array, rng: Array):
        a = action.astype(jnp.float32)
        t = state.t
        physics = state.physics.at[t].set(a)
        t1 = t + 1
        # survival prob depends on the action just taken (the new state)
        p_continue = jnp.where(a == 0.0, 0.5, 0.9)
        survived = jax.random.uniform(rng) < p_continue
        done = jnp.logical_or(t1 >= self.max_steps, jnp.logical_not(survived))
        is_aaa = jnp.logical_and(t1 == 3, jnp.all(physics == jnp.array([0.0, 0.0, 0.0])))
        is_ba = jnp.logical_and(
            t1 == 2, jnp.all(physics[:2] == jnp.array([1.0, 0.0]))
        )
        reward = jnp.where(
            done, jnp.where(is_aaa, 5.0, jnp.where(is_ba, 4.0, 0.0)), 0.0
        )
        obs = jax.nn.one_hot(a.astype(jnp.int32), 2)
        return FunctionalEnvState(physics=physics, t=t1), obs, reward, done


class ChangingArms(FunctionalEnv):
    """Sparse-feature bandit (ref changing_arms.py): each arm's reward mean
    drifts; obs stacks [mu, legal-mask, mu-changes] rows as a flat vector.
    Pulling an illegal arm ends the episode with 0; the num_arms-th action is
    a no-op "pass"."""

    discrete = True

    def __init__(self, num_arms: int = 5, max_steps: int = 200):
        self.num_arms = num_arms
        self.max_steps = max_steps
        self.observation_dim = 3 * num_arms
        self.action_dim = num_arms + 1

    def _obs(self, mus, legal, changes):
        return jnp.concatenate([mus, legal, changes])

    def reset(self, rng: Array):
        r1, r2 = jax.random.split(rng)
        mus = jax.random.uniform(r1, (self.num_arms,), minval=-1.0, maxval=1.0) * 5
        legal = (jax.random.uniform(r2, (self.num_arms,)) > 0.5).astype(jnp.float32)
        changes = jnp.zeros(self.num_arms)
        physics = jnp.concatenate([mus, legal, changes, jnp.zeros(1)])
        return (
            FunctionalEnvState(physics=physics, t=jnp.zeros((), jnp.int32)),
            self._obs(mus, legal, changes),
        )

    def step(self, state: FunctionalEnvState, action: Array, rng: Array):
        K = self.num_arms
        mus = state.physics[:K]
        legal = state.physics[K : 2 * K]
        r1, r2, r3 = jax.random.split(rng, 3)
        a = action.astype(jnp.int32)
        is_pass = a >= K
        chosen_legal = jnp.where(is_pass, 1.0, legal[jnp.minimum(a, K - 1)])
        reward = jnp.where(
            is_pass,
            0.0,
            jnp.where(chosen_legal > 0, mus[jnp.minimum(a, K - 1)], 0.0),
        )
        changes = jax.random.normal(r1, (K,))
        new_mus = jnp.clip(mus + changes, -10.0, 10.0)
        new_legal = (jax.random.uniform(r2, (K,)) > 0.5).astype(jnp.float32)
        t = state.t + 1
        done = jnp.logical_or(
            t >= self.max_steps, jnp.logical_and(~is_pass, chosen_legal == 0)
        )
        physics = jnp.concatenate([new_mus, new_legal, changes, jnp.zeros(1)])
        return (
            FunctionalEnvState(physics=physics, t=t),
            self._obs(new_mus, new_legal, changes),
            reward.astype(jnp.float32),
            done,
        )


@struct.dataclass
class RecSimState:
    user_interest: Array  # [num_topics]
    docs: Array  # [num_candidates, num_topics]
    doc_quality: Array  # [num_candidates]
    t: Array
    budget: Array
    last_clicked: Array = None  # slate position clicked last step, -1 = no click


class RecSimSlate:
    """Simplified interest-evolution slate env (SlateQ benchmark).

    A user with a topic-interest vector receives a slate; a softmax choice
    model picks one doc (or skip); clicking drifts interest toward the doc's
    topics and consumes time budget; reward = watch time ~ quality.
    Mirrors the structure RecSim's interest_evolution env exposes to SlateQ
    (gym/envs/recsim.py).
    """

    discrete = False

    def __init__(
        self,
        num_candidates: int = 10,
        slate_size: int = 3,
        num_topics: int = 5,
        max_steps: int = 40,
    ):
        self.num_candidates = num_candidates
        self.slate_size = slate_size
        self.num_topics = num_topics
        self.max_steps = max_steps
        self.observation_dim = num_topics

    def reset(self, rng: Array):
        r1, r2, r3 = jax.random.split(rng, 3)
        interest = jax.random.uniform(r1, (self.num_topics,), minval=-1.0, maxval=1.0)
        docs = jax.random.dirichlet(
            r2, jnp.ones(self.num_topics), (self.num_candidates,)
        )
        quality = jax.random.uniform(r3, (self.num_candidates,), minval=0.5, maxval=1.5)
        state = RecSimState(
            user_interest=interest,
            docs=docs,
            doc_quality=quality,
            t=jnp.zeros((), jnp.int32),
            budget=jnp.asarray(float(self.max_steps)),
            last_clicked=jnp.asarray(-1, jnp.int32),
        )
        return state, self._obs(state)

    def _obs(self, state: RecSimState):
        return {
            "user": state.user_interest,
            "doc_features": state.docs,
            "doc_quality": state.doc_quality,
        }

    def step(self, state: RecSimState, slate: Array, rng: Array):
        """slate: [slate_size] candidate indices."""
        r_choice, r_next = jax.random.split(rng)
        slate_docs = state.docs[slate]  # [S, T]
        scores = 3.0 * (slate_docs @ state.user_interest)  # [S] sharpened choice
        # no-click option has score 0
        logits = jnp.concatenate([scores, jnp.zeros(1)])
        choice = jax.random.categorical(r_choice, logits)
        clicked = choice < self.slate_size
        doc_idx = jnp.where(clicked, slate[jnp.minimum(choice, self.slate_size - 1)], 0)
        # watch time scales with both quality and interest alignment
        alignment = jax.nn.sigmoid(2.0 * state.docs[doc_idx] @ state.user_interest)
        watch_time = jnp.where(clicked, state.doc_quality[doc_idx] * (0.5 + alignment), 0.0)
        # interest drift toward the clicked doc
        drift = jnp.where(clicked, 0.1, 0.0)
        new_interest = state.user_interest + drift * (
            state.docs[doc_idx] - state.user_interest
        )
        budget = state.budget - jnp.where(clicked, watch_time * 0.5, 1.0)
        t = state.t + 1
        done = jnp.logical_or(budget <= 0, t >= self.max_steps)
        new_state = state.replace(
            user_interest=new_interest, t=t, budget=budget,
            last_clicked=jnp.where(clicked, choice, -1).astype(jnp.int32),
        )
        return new_state, self._obs(new_state), watch_time.astype(jnp.float32), done
