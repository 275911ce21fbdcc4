"""Functionality-test envs.

Reference: reagent/gym/envs/functionality/possible_actions_mask_tester.py —
the state only encodes the step index; the ONLY signal about which action
pays reward 10 is the possible_actions_mask (one legal action per step).
MDP value = 10 * max_steps = 200.  Exercises mask plumbing end-to-end.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from reagent_tpu.gym.envs.functional import FunctionalEnv

Array = jax.Array


@struct.dataclass
class MaskTesterState:
    step_idx: Array
    legal_action: Array
    t: Array


class PossibleActionsMaskTester(FunctionalEnv):
    discrete = True

    def __init__(self, max_steps: int = 20, action_num: int = 4):
        self.max_steps = max_steps
        self.action_num = action_num
        self.action_dim = action_num
        # obs = [one-hot step | possible_actions_mask]
        self.observation_dim = max_steps + action_num

    def _obs(self, state: MaskTesterState) -> Array:
        onehot = jnp.where(
            state.step_idx < self.max_steps,
            jax.nn.one_hot(state.step_idx, self.max_steps),
            jnp.zeros(self.max_steps),
        )
        mask = jax.nn.one_hot(state.legal_action, self.action_num)
        return jnp.concatenate([onehot, mask])

    def possible_actions_mask(self, obs: Array) -> Array:
        """Extract the mask from an observation (tail components)."""
        return obs[..., self.max_steps:]

    def reset(self, rng: Array) -> Tuple[MaskTesterState, Array]:
        state = MaskTesterState(
            step_idx=jnp.zeros((), jnp.int32),
            legal_action=jax.random.randint(rng, (), 0, self.action_num),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def step(self, state: MaskTesterState, action: Array, rng: Array):
        reward = jnp.where(
            action.astype(jnp.int32) == state.legal_action, 10.0, 0.0
        ).astype(jnp.float32)
        done = state.step_idx == (self.max_steps - 1)
        new_state = MaskTesterState(
            step_idx=state.step_idx + 1,
            legal_action=jax.random.randint(rng, (), 0, self.action_num),
            t=state.t + 1,
        )
        return new_state, self._obs(new_state), reward, done
