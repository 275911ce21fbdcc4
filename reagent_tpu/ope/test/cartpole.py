"""CartPole sequential-OPE benchmark: IPS/DR/MAGIC vs on-policy truth.

Reference: reagent/ope/test/cartpole.py — roll out a behavior policy on
CartPole, estimate the value of a better target policy with the sequential
estimators, compare against the target policy's true (simulated) value.

TPU-native: trajectories come from the pure-JAX CartPole inside a vmapped
rollout; both policies are softmax heads over a trained DQN Q-network.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.gym.envs import CartPole
from reagent_tpu.ope.estimators.estimator import EstimatorResult
from reagent_tpu.ope.estimators.sequential_estimators import (
    DoublyRobustEstimator,
    IPSEstimator,
    MAGICEstimator,
    RLEstimatorInput,
)

Array = jax.Array


def collect_trajectories(
    env: CartPole,
    scores_fn,  # obs [S] -> action scores [A]
    temperature: float,
    num_episodes: int,
    horizon: int,
    rng: Array,
) -> Dict[str, np.ndarray]:
    """Vmapped softmax-policy rollouts with per-step propensities."""

    def one(rng):
        r_reset, r_steps = jax.random.split(rng)
        state, obs = env.reset(r_reset)

        def step(carry, r):
            state, obs, done = carry
            logits = scores_fn(obs) / temperature
            probs = jax.nn.softmax(logits)
            a = jax.random.categorical(r, logits)
            nstate, nobs, reward, ndone = env.step(state, a, r)
            valid = ~done
            return (
                (nstate, nobs, done | ndone),
                (obs, a, reward * valid, probs, valid),
            )

        _, (obs_seq, actions, rewards, probs, valid) = jax.lax.scan(
            step, (state, obs, jnp.bool_(False)), jax.random.split(r_steps, horizon)
        )
        return obs_seq, actions, rewards, probs, valid

    obs, actions, rewards, probs, valid = jax.vmap(one)(
        jax.random.split(rng, num_episodes)
    )
    return {
        "states": np.asarray(obs),
        "actions": np.asarray(actions),
        "rewards": np.asarray(rewards),
        "propensities": np.asarray(probs),
        "mask": np.asarray(valid, np.float64),
    }


def evaluate_cartpole(
    q_apply,
    q_params,
    behavior_temperature: float = 2.0,
    target_temperature: float = 0.2,
    num_episodes: int = 200,
    horizon: int = 100,
    gamma: float = 0.99,
    seed: int = 0,
    max_steps: Optional[int] = None,
) -> Tuple[Dict[str, EstimatorResult], float]:
    """Log with a high-temperature policy; estimate the sharp policy's value."""
    env = CartPole(max_steps=max_steps or horizon)
    scores_fn = lambda obs: q_apply(q_params, obs[None])[0]
    rng = jax.random.PRNGKey(seed)
    r_log, r_tgt = jax.random.split(rng)

    logs = collect_trajectories(
        env, scores_fn, behavior_temperature, num_episodes, horizon, r_log
    )
    # logged propensity of the taken action / target propensities per step
    N, T = logs["actions"].shape
    A = logs["propensities"].shape[-1]
    log_prop = logs["propensities"][
        np.arange(N)[:, None], np.arange(T)[None, :], logs["actions"]
    ]
    q_all = np.asarray(
        jax.vmap(jax.vmap(lambda o: q_apply(q_params, o[None])[0]))(
            jnp.asarray(logs["states"])
        )
    )
    tgt_logits = q_all / target_temperature
    tgt_prop = np.exp(tgt_logits - tgt_logits.max(-1, keepdims=True))
    tgt_prop /= tgt_prop.sum(-1, keepdims=True)

    # ground truth: run the target policy itself
    truth = collect_trajectories(
        env, scores_fn, target_temperature, num_episodes, horizon, r_tgt
    )
    decay = gamma ** np.arange(T)
    gt = float(np.mean(np.sum(truth["rewards"] * truth["mask"] * decay, axis=1)))

    einput = RLEstimatorInput(
        gamma=gamma,
        actions=logs["actions"],
        rewards=logs["rewards"],
        log_propensities=log_prop,
        tgt_propensities=tgt_prop,
        mask=logs["mask"],
        q_values=q_all,
        ground_truth_reward=gt,
    ).with_absorbing_padding()
    results = {
        "ips": IPSEstimator().evaluate(einput),
        "dr": DoublyRobustEstimator().evaluate(einput),
        "magic": MAGICEstimator().evaluate(einput),
    }
    return results, gt
