"""POMDP benchmark environments.

Reference: reagent/gym/envs/pomdp/ — PocManEnv (pocman.py, 502 LoC),
StateEmbedEnv (state_embed_env.py), and gym/envs/toy_vm.py (cascading-click
slate VM).  Pocman here is a compact faithful variant: a small maze with
random-walk ghosts, food pellets, and a local-perception observation vector
(the partial observability that defines the task).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from reagent_tpu.gym.envs.functional import FunctionalEnv

Array = jax.Array

# 7x7 maze: 1 = wall, 0 = corridor (pocman-style cross corridors)
_MAZE = np.array(
    [
        [1, 1, 1, 1, 1, 1, 1],
        [1, 0, 0, 0, 0, 0, 1],
        [1, 0, 1, 0, 1, 0, 1],
        [1, 0, 0, 0, 0, 0, 1],
        [1, 0, 1, 0, 1, 0, 1],
        [1, 0, 0, 0, 0, 0, 1],
        [1, 1, 1, 1, 1, 1, 1],
    ],
    np.int32,
)
_H, _W = _MAZE.shape
_FREE = np.argwhere(_MAZE == 0)
_DIRS = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]], np.int32)  # N S W E


@struct.dataclass
class PocManState:
    agent: Array  # [2]
    ghosts: Array  # [num_ghosts, 2]
    food: Array  # [H, W] 0/1
    t: Array


class PocManEnv(FunctionalEnv):
    """Partially observed pac-man: observe only wall/food/ghost adjacency.

    Observation (10 bits): per direction — wall?, ghost within 2 in that
    direction?; plus food adjacent? and a bias; matching the perception
    structure of the reference pocman (pocman.py observation bits).
    """

    discrete = True
    action_dim = 4
    observation_dim = 10

    def __init__(self, num_ghosts: int = 2, max_steps: int = 80):
        self.num_ghosts = num_ghosts
        self.max_steps = max_steps
        self._maze = jnp.asarray(_MAZE)
        self._free = jnp.asarray(_FREE)
        self._dirs = jnp.asarray(_DIRS)

    def _obs(self, state: PocManState) -> Array:
        a = state.agent
        bits = []
        for d in range(4):
            n = a + self._dirs[d]
            bits.append(self._maze[n[0], n[1]].astype(jnp.float32))  # wall bit
        for d in range(4):  # ghost within 2 cells in direction d
            n1 = a + self._dirs[d]
            n2 = a + 2 * self._dirs[d]
            g_near = jnp.any(
                jnp.all(state.ghosts == n1[None], axis=1)
                | jnp.all(state.ghosts == n2[None], axis=1)
            )
            bits.append(g_near.astype(jnp.float32))
        food_adj = jnp.asarray(0.0)
        for d in range(4):
            n = a + self._dirs[d]
            food_adj = jnp.maximum(food_adj, state.food[n[0], n[1]].astype(jnp.float32))
        bits.append(food_adj)
        bits.append(jnp.asarray(1.0))
        return jnp.stack(bits)

    def reset(self, rng: Array):
        r1, r2 = jax.random.split(rng)
        agent = self._free[0]
        ghost_idx = jax.random.choice(
            r1, self._free.shape[0], (self.num_ghosts,), replace=False
        )
        ghosts = self._free[ghost_idx]
        food = (self._maze == 0).astype(jnp.int32)
        food = food.at[agent[0], agent[1]].set(0)
        state = PocManState(
            agent=agent, ghosts=ghosts, food=food, t=jnp.zeros((), jnp.int32)
        )
        return state, self._obs(state)

    def step(self, state: PocManState, action: Array, rng: Array):
        a = action.astype(jnp.int32)
        delta = self._dirs[a]
        target = state.agent + delta
        blocked = self._maze[target[0], target[1]] == 1
        agent = jnp.where(blocked, state.agent, target)

        # ghosts take uniform random legal moves
        def move_ghost(g, r):
            d = jax.random.randint(r, (), 0, 4)
            t = g + self._dirs[d]
            return jnp.where(self._maze[t[0], t[1]] == 1, g, t)

        keys = jax.random.split(rng, self.num_ghosts)
        ghosts = jax.vmap(move_ghost)(state.ghosts, keys)

        ate = state.food[agent[0], agent[1]] == 1
        food = state.food.at[agent[0], agent[1]].set(0)
        caught = jnp.any(jnp.all(ghosts == agent[None], axis=1))
        t = state.t + 1
        reward = (
            jnp.where(ate, 1.0, -0.05)  # food reward / step cost
            + jnp.where(caught, -10.0, 0.0)
        )
        all_eaten = jnp.sum(food) == 0
        done = caught | all_eaten | (t >= self.max_steps)
        new_state = PocManState(agent=agent, ghosts=ghosts, food=food, t=t)
        return new_state, self._obs(new_state), reward.astype(jnp.float32), done


class Document(NamedTuple):
    tap: float
    quality: float
    abandon: float


def simulate_reward(slate: List[Document], prng: np.random.RandomState) -> float:
    """Cascading click model (reference toy_vm.py:14-31)."""
    reward = 0.0
    position = 0
    n = len(slate)
    if not n:
        return 0.0
    comparison = slate[position].tap
    roll = prng.rand()
    done = comparison < roll
    while not done:
        reward += slate[position].quality
        comparison = 1 - slate[position].abandon
        roll = prng.rand()
        position += 1
        done = (comparison < roll) or (position >= n)
    return reward


def random_document(prng) -> Document:
    from scipy.special import expit, logit

    p, q, r = prng.rand(), prng.rand(), prng.rand()
    return Document(expit(logit(p) + 1), q, expit(logit(r) - 2))


class ToyVMEnv:
    """Slate re-ranking toy env with the cascading reward (reference toy_vm.py)."""

    def __init__(self, slate_size: int, max_steps: int = 20, seed: int = 0):
        self.slate_size = slate_size
        self.max_steps = max_steps
        self._prng = np.random.RandomState(seed)
        self._t = 0

    def _sample_docs(self) -> List[Document]:
        return [random_document(self._prng) for _ in range(self.slate_size)]

    def reset(self):
        self._t = 0
        self.docs = self._sample_docs()
        return self.docs

    def step(self, permutation: List[int]):
        slate = [self.docs[i] for i in permutation]
        reward = simulate_reward(slate, self._prng)
        self._t += 1
        done = self._t >= self.max_steps
        self.docs = self._sample_docs()
        return self.docs, reward, done
