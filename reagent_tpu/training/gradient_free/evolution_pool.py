"""Evolution-strategies pool.

Reference: reagent/training/gradient_free/evolution_pool.py:21-120 — mutate a
parent pytree into a population, estimate the gradient from normalized rewards,
apply with Adam.

TPU-native: the whole population lives as one stacked pytree (leading pop
axis); mutation/gradient-estimation are vectorized; evaluation can be vmapped.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
import optax

from reagent_tpu.core.parameters import EvolutionParameters

Array = jax.Array


class EvolutionPool:
    def __init__(
        self,
        seed: int,
        es_params: EvolutionParameters,
        tensor_sizes: Dict[str, List[int]],
    ) -> None:
        self.es_params = es_params
        self.tensor_sizes = tensor_sizes
        rng = jax.random.PRNGKey(seed)
        keys = jax.random.split(rng, len(tensor_sizes) + 1)
        self.rng = keys[0]
        self.parent_tensors: Dict[str, Array] = {
            name: jax.random.normal(k, tuple(size))
            for k, (name, size) in zip(keys[1:], tensor_sizes.items())
        }
        self.optimizer = optax.adam(es_params.learning_rate)
        self.opt_state = self.optimizer.init(self.parent_tensors)
        self.population_tensors: Dict[str, Array] = {}
        self._noise: Dict[str, Array] = {}
        self.populate_children(0)

    def populate_children(self, iteration: int) -> None:
        """Population = parent + N(0, mutation_power), stacked (ref :65-73)."""
        key = jax.random.fold_in(self.rng, iteration)
        pop = self.es_params.population_size
        self._noise = {}
        self.population_tensors = {}
        for i, (name, parent) in enumerate(self.parent_tensors.items()):
            noise = (
                jax.random.normal(jax.random.fold_in(key, i), (pop, *parent.shape))
                * self.es_params.mutation_power
            )
            self._noise[name] = noise
            self.population_tensors[name] = parent[None] + noise

    def apply_global_reward(self, rewards: Array, next_iteration: int) -> None:
        """ES gradient estimate from normalized rewards (ref :75-110)."""
        rewards = jnp.asarray(rewards, jnp.float32)
        std = jnp.std(rewards)
        if float(jnp.abs(std)) > 1e-6:
            normalized = (rewards - jnp.mean(rewards)) / std
            pop = self.es_params.population_size
            grads = {}
            for name, noise in self._noise.items():
                # - sum_i r_i * eps_i / (pop * sigma): ascend the reward
                w = normalized.reshape((-1,) + (1,) * (noise.ndim - 1))
                grads[name] = -jnp.sum(noise * w, axis=0) / (
                    pop * self.es_params.mutation_power
                )
            updates, self.opt_state = self.optimizer.update(
                grads, self.opt_state, self.parent_tensors
            )
            self.parent_tensors = optax.apply_updates(self.parent_tensors, updates)
        self.populate_children(next_iteration)

    def compute_all_local_rewards(
        self, reward_fn: Callable[[Dict[str, Array]], Array]
    ) -> Array:
        """vmapped population evaluation (replaces the reference's loop)."""
        return jax.vmap(reward_fn)(self.population_tensors)


class OneMaxEvolutionPool(EvolutionPool):
    """Demo pool (reference :121-132): reward is maximized as the tensor
    approaches [+inf, -inf, +inf, -inf, ...]."""

    def compute_local_reward(self, individual: Dict[str, Array]) -> Array:
        sigmoid_params = jax.nn.sigmoid(individual["data"])
        total = jnp.sum(sigmoid_params[0::2]) + jnp.sum(1 - sigmoid_params[1::2])
        return total / sigmoid_params.shape[0]

    def compute_rewards(self) -> Array:
        return self.compute_all_local_rewards(self.compute_local_reward)
