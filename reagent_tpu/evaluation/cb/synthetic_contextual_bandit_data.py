"""Synthetic non-stationary contextual-bandit environment + LinUCB agent.

Reference: reagent/evaluation/cb/synthetic_contextual_bandit_data.py:42-333 —
episodes draw a random "campaign" (batch of arms) from a fixed catalogue;
features ~ N(mf, sf) per arm; reward = w·f + per-arm shift + noise; the agent
(joint LinUCB, greedy over UCB) accumulates reward/regret.

TPU-native: the catalogue (mf, sf, weight, shifts) is built once from a PRNG
key; get_batch is pure (rng -> CBInput), so data generation jits and vmaps.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core.types import CBInput
from reagent_tpu.models.linear_regression import LinearRegressionUCB
from reagent_tpu.training.cb.linucb_trainer import LinUCBTrainer

Array = jax.Array


class DynamicBanditEnv:
    def __init__(
        self,
        num_unique_batches: int = 100,
        batch_size: int = 4,
        num_arms_per_episode: int = 10,
        feature_dim: int = 500,
        mu_shift: float = 0.0,
        sigma_shift: float = 0.0,
        reward_noise_sigma: float = 0.01,
        rng: Array = None,
    ):
        self.num_unique_batches = num_unique_batches
        self.batch_size = batch_size
        self.num_arms_per_episode = num_arms_per_episode
        self.feature_dim = feature_dim
        self.num_arms_all = num_unique_batches * batch_size * num_arms_per_episode
        self.mu_shift = mu_shift
        self.sigma_shift = sigma_shift
        self.reward_noise_sigma = reward_noise_sigma

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_ids, r_mf, r_sf, r_w, r_shift = jax.random.split(rng, 5)
        # catalogue of arm ids (ref gen_all_arms_ids)
        self.all_unique_arm_ids = jax.random.permutation(
            r_ids, self.num_arms_all
        ).reshape(num_unique_batches, batch_size, num_arms_per_episode)
        # per-arm feature distributions (ref gen_all_arms_feature_distribution)
        shape = (num_unique_batches, batch_size, num_arms_per_episode, feature_dim)
        self.mf = jax.random.normal(r_mf, shape)
        self.sf = jnp.abs(jax.random.normal(r_sf, shape))
        # linear reward map + per-batch shift (ref gen_mapping_weights)
        self.weight = jax.random.normal(r_w, (feature_dim,))
        self.reward_shifts = (
            jax.random.normal(r_shift, (self.num_arms_all,)) * sigma_shift + mu_shift
        )
        self.reward_regret_track_start()

    def reward_regret_track_start(self):
        self.accumulated_rewards: List[float] = []
        self.accumulated_regrets: List[float] = []
        self.accumulated_rewards_final = 0.0
        self.accumulated_regrets_final = 0.0

    def get_batch(self, rng: Array) -> Tuple[CBInput, Array]:
        """One batch of episodes + per-arm rewards [B, K] (ref get_batch)."""
        r_idx, r_feat, r_noise = jax.random.split(rng, 3)
        batch_idx = jax.random.randint(r_idx, (), 0, self.num_unique_batches)
        arms = self.all_unique_arm_ids[batch_idx]
        features = self.mf[batch_idx] + self.sf[batch_idx] * jax.random.normal(
            r_feat, self.mf[batch_idx].shape
        )
        rewards_all_arms = (
            features @ self.weight
            + self.reward_shifts[batch_idx]
            + jax.random.normal(r_noise, arms.shape) * self.reward_noise_sigma
        )
        return (
            CBInput(context_arm_features=features, arms=arms),
            rewards_all_arms,
        )

    def add_chosen_action_reward(
        self, chosen_action_idx: Array, batch: CBInput, rewards_all_arms: Array
    ) -> CBInput:
        row = jnp.arange(self.batch_size)
        chosen = chosen_action_idx.reshape(-1)
        chosen_reward = rewards_all_arms[row, chosen][:, None]
        new_batch = batch.replace(reward=chosen_reward, action=chosen[:, None])
        # host-side tracking (ref reward_regret_tracking)
        self.accumulated_rewards_final += float(jnp.sum(chosen_reward))
        self.accumulated_rewards.append(self.accumulated_rewards_final)
        regret = jnp.max(rewards_all_arms, axis=1) - chosen_reward.reshape(-1)
        self.accumulated_regrets_final += float(jnp.sum(regret))
        self.accumulated_regrets.append(self.accumulated_regrets_final)
        return new_batch


class DynamicBanditAgent:
    """Joint LinUCB + greedy argmax over UCB scores (ref :42-98)."""

    def __init__(self, trainer: LinUCBTrainer, feature_dim: int):
        self.trainer = trainer
        self.feature_dim = feature_dim

    @classmethod
    def make_agent(cls, feature_dim: int, ucb_alpha: float = 1.0, gamma: float = 1.0):
        scorer = LinearRegressionUCB(
            input_dim=feature_dim, ucb_alpha=ucb_alpha, gamma=gamma
        )
        return cls(trainer=LinUCBTrainer(scorer), feature_dim=feature_dim)

    def init_state(self):
        return self.trainer.init()

    def act(self, state, obs: CBInput) -> Tuple[Array, Array]:
        """Greedy argmax over UCB scores -> ([B, 1] actions, [B] log-probs)."""
        scores = self.trainer.score(state, obs)
        chosen = jnp.argmax(scores, axis=1).astype(jnp.int32)
        log_prob = jnp.zeros(chosen.shape[0])  # greedy: log(1)
        return chosen[:, None], log_prob

    def learn(self, state, batch: CBInput):
        state, metrics = self.trainer.train_step(state, batch)
        return self.trainer.on_epoch_end(state), metrics


def run_dynamic_bandit_env(
    num_unique_batches: int = 10,
    batch_size: int = 4,
    num_arms_per_episode: int = 5,
    feature_dim: int = 16,
    num_obs: int = 100,
    rand_seed: int = 937162211,
) -> Tuple[DynamicBanditAgent, List[float], List[float]]:
    """Train LinUCB online in the synthetic env (ref run_synthetic_bandit.py:45-88)."""
    rng = jax.random.PRNGKey(rand_seed)
    env = DynamicBanditEnv(
        num_unique_batches=num_unique_batches,
        batch_size=batch_size,
        num_arms_per_episode=num_arms_per_episode,
        feature_dim=feature_dim,
        rng=rng,
    )
    agent = DynamicBanditAgent.make_agent(feature_dim=feature_dim)
    state = agent.init_state()
    for i in range(num_obs):
        rng, sub = jax.random.split(rng)
        obs, rewards_all = env.get_batch(sub)
        action, _log_prob = agent.act(state, obs)
        obs = env.add_chosen_action_reward(action.reshape(-1), obs, rewards_all)
        state, _ = agent.learn(state, obs)
    return agent, env.accumulated_rewards, env.accumulated_regrets
