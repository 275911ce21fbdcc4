"""MAB base: per-arm sufficient statistics + batch-update API.

Reference: reagent/mab/mab_algorithm.py:103 ``MABAlgo`` — arms tracked by id,
batch observations fold (n, sum_reward, sum_reward^2) per arm; scores are
computed from the sufficient statistics.

TPU-native: state is a pytree of per-arm stat arrays; updates are one-hot
scatter-adds; arm ids map to indices host-side.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class MABState:
    total_n_obs_per_arm: Array  # [K]
    total_sum_reward_per_arm: Array  # [K]
    total_sum_reward_squared_per_arm: Array  # [K]
    # extra per-algorithm stats (e.g. NormalGamma posteriors)
    extra: Optional[Dict[str, Array]] = None

    @property
    def total_n_obs_all_arms(self) -> Array:
        return jnp.sum(self.total_n_obs_per_arm)


def randomized_argmax(x: Array, rng: Array) -> Array:
    """Argmax with uniform tie-breaking (reference mab_algorithm.py:78)."""
    z = jnp.max(x)
    ties = (x == z).astype(jnp.float32)
    return jax.random.categorical(rng, jnp.log(ties / jnp.sum(ties)))


class MABAlgo:
    """Base: holds arm ids host-side; all math on the MABState pytree."""

    def __init__(
        self,
        n_arms: Optional[int] = None,
        arm_ids: Optional[Sequence[str]] = None,
    ):
        if arm_ids is not None:
            self.arm_ids: List[str] = list(arm_ids)
        else:
            assert n_arms is not None
            self.arm_ids = [str(i) for i in range(n_arms)]
        self.n_arms = len(self.arm_ids)
        self._id2idx = {a: i for i, a in enumerate(self.arm_ids)}

    def init(self) -> MABState:
        K = self.n_arms
        return MABState(
            total_n_obs_per_arm=jnp.zeros(K),
            total_sum_reward_per_arm=jnp.zeros(K),
            total_sum_reward_squared_per_arm=jnp.zeros(K),
            extra=self.init_extra(),
        )

    def init_extra(self) -> Optional[Dict[str, Array]]:
        return None

    def add_batch_observations(
        self,
        state: MABState,
        n_obs_per_arm: Array,
        sum_reward_per_arm: Array,
        sum_reward_squared_per_arm: Array,
    ) -> MABState:
        """Reference mab_algorithm.py:126."""
        return state.replace(
            total_n_obs_per_arm=state.total_n_obs_per_arm + n_obs_per_arm,
            total_sum_reward_per_arm=state.total_sum_reward_per_arm + sum_reward_per_arm,
            total_sum_reward_squared_per_arm=(
                state.total_sum_reward_squared_per_arm + sum_reward_squared_per_arm
            ),
        )

    def add_single_observation(self, state: MABState, arm_id: str, reward: float) -> MABState:
        idx = self._id2idx[arm_id]
        onehot = jax.nn.one_hot(idx, self.n_arms)
        return self.add_batch_observations(
            state, onehot, onehot * reward, onehot * reward**2
        )

    def get_avg_reward_values(self, state: MABState) -> Array:
        return state.total_sum_reward_per_arm / jnp.maximum(
            state.total_n_obs_per_arm, 1e-12
        )

    def get_scores(self, state: MABState, rng: Optional[Array] = None) -> Array:
        raise NotImplementedError

    def get_action(self, state: MABState, rng: Array) -> str:
        """UCB convention: explore unseen arms first (reference :167-179)."""
        unseen = state.total_n_obs_per_arm == 0
        r1, r2 = jax.random.split(rng)

        def pick_unseen():
            w = unseen.astype(jnp.float32)
            return jax.random.categorical(r1, jnp.log(w / jnp.sum(w)))

        if bool(jnp.any(unseen)):
            idx = int(pick_unseen())
        else:
            idx = int(randomized_argmax(self.get_scores(state, r2), r1))
        return self.arm_ids[idx]

    def forward(self, state: MABState, rng: Optional[Array] = None) -> Array:
        return self.get_scores(state, rng)


class RandomActionsAlgo(MABAlgo):
    def get_scores(self, state: MABState, rng: Optional[Array] = None) -> Array:
        assert rng is not None
        return jax.random.uniform(rng, (self.n_arms,))


class GreedyAlgo(MABAlgo):
    def get_scores(self, state: MABState, rng: Optional[Array] = None) -> Array:
        return self.get_avg_reward_values(state)
