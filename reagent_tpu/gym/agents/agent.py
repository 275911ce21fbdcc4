"""Agent: obs preprocessing -> policy -> action extraction + episode hooks.

Reference: reagent/gym/agents/agent.py:20-136.  Used on the host-env
(gymnasium) path; the pure-JAX path fuses these stages into the jitted loop.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.gym.policies.policy import Policy


def discrete_action_extractor(actor_output) -> int:
    return int(np.argmax(np.asarray(actor_output.action)))


def continuous_action_extractor(actor_output) -> np.ndarray:
    return np.asarray(actor_output.action).reshape(-1)


class Agent:
    def __init__(
        self,
        policy: Policy,
        params_fn: Callable[[], Any],
        action_extractor: Callable = discrete_action_extractor,
        obs_preprocessor: Optional[Callable] = None,
        post_transition_callback: Optional[Callable] = None,
        post_episode_callback: Optional[Callable] = None,
        rng: Optional[jax.Array] = None,
    ):
        self.policy = policy
        self.params_fn = params_fn  # late-bound so training updates flow through
        self.action_extractor = action_extractor
        self.obs_preprocessor = obs_preprocessor
        self.post_transition_callback = post_transition_callback
        self.post_episode_callback = post_episode_callback
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

    @classmethod
    def create_for_env(
        cls, env, policy: Policy, params_fn: Callable[[], Any], **kwargs
    ) -> "Agent":
        """Pick the action extractor from the env's action space (ref :58-96)."""
        import gymnasium

        if isinstance(env.action_space, gymnasium.spaces.Discrete):
            extractor = discrete_action_extractor
        else:
            extractor = continuous_action_extractor
        return cls(policy, params_fn, action_extractor=extractor, **kwargs)

    def act(self, obs) -> Any:
        self._rng, r = jax.random.split(self._rng)
        x = obs if self.obs_preprocessor is None else self.obs_preprocessor(obs)
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        out = self.policy.act(self.params_fn(), x, r)
        return self.action_extractor(out)

    def post_step(self, transition) -> None:
        if self.post_transition_callback is not None:
            self.post_transition_callback(transition)

    def post_episode(self, trajectory) -> None:
        if self.post_episode_callback is not None:
            self.post_episode_callback(trajectory)
