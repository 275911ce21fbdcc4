"""EvaluationDataPage: everything CPE needs about one evaluation pass.

Reference: reagent/evaluation/evaluation_data_page.py:30-52 (fields),
create_from_tensors_dqn (:309), compute_values (:496), validate (:542),
set_metric_as_reward (:628).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core import types as rlt


@dataclasses.dataclass
class EvaluationDataPage:
    """Arrays are numpy on host (evaluation is not the training hot loop)."""

    mdp_id: Optional[np.ndarray]
    sequence_number: Optional[np.ndarray]
    logged_propensities: np.ndarray  # [N, 1]
    logged_rewards: np.ndarray  # [N, 1]
    action_mask: np.ndarray  # [N, A] one-hot logged action
    model_propensities: np.ndarray  # [N, A] target-policy propensities
    model_rewards: np.ndarray  # [N, A] predicted reward per action
    model_rewards_for_logged_action: np.ndarray  # [N, 1]
    model_values: Optional[np.ndarray] = None  # [N, A] Q-values
    possible_actions_mask: Optional[np.ndarray] = None
    optimal_q_values: Optional[np.ndarray] = None
    eval_action_idxs: Optional[np.ndarray] = None
    logged_values: Optional[np.ndarray] = None
    logged_metrics: Optional[np.ndarray] = None
    logged_metrics_values: Optional[np.ndarray] = None
    model_metrics: Optional[np.ndarray] = None
    model_metrics_for_logged_action: Optional[np.ndarray] = None
    model_metrics_values: Optional[np.ndarray] = None
    model_metrics_values_for_logged_action: Optional[np.ndarray] = None
    contexts: Optional[np.ndarray] = None

    def replace(self, **kwargs) -> "EvaluationDataPage":
        return dataclasses.replace(self, **kwargs)

    # ------------------------------------------------------------ factories

    @classmethod
    def create_from_tensors_dqn(
        cls,
        trainer,
        trainer_state,
        mdp_ids: np.ndarray,
        sequence_numbers: np.ndarray,
        states: jnp.ndarray,
        actions: jnp.ndarray,
        propensities: jnp.ndarray,
        rewards: jnp.ndarray,
        possible_actions_mask: jnp.ndarray,
        metrics: Optional[jnp.ndarray] = None,
    ) -> "EvaluationDataPage":
        """Forward the trainer's Q/reward/CPE networks over logged data.

        Reference: evaluation_data_page.py:309-404.
        """
        num_actions = possible_actions_mask.shape[1]
        temperature = getattr(trainer.rl, "temperature", 1.0)

        optimal_q_values = trainer.q_network.apply(trainer_state.q_params, states)
        eval_action_idxs = jnp.argmax(
            optimal_q_values + (1 - possible_actions_mask) * -1e9, axis=1
        )
        model_propensities = jax.nn.softmax(
            optimal_q_values / max(temperature, 1e-9)
            + jnp.log(jnp.clip(possible_actions_mask, 1e-20, 1.0)),
            axis=1,
        )
        if trainer_state.cpe_params is not None:
            model_values = trainer.q_network_cpe.apply(trainer_state.cpe_params, states)
        else:
            model_values = optimal_q_values
        if trainer_state.reward_params is not None:
            model_rewards = trainer.reward_network.apply(
                trainer_state.reward_params, states
            )
        else:
            model_rewards = jnp.zeros_like(optimal_q_values)
        rewards_for_logged = jnp.sum(model_rewards * actions, axis=1, keepdims=True)

        return cls(
            mdp_id=np.asarray(mdp_ids),
            sequence_number=np.asarray(sequence_numbers),
            logged_propensities=np.asarray(propensities).reshape(-1, 1),
            logged_rewards=np.asarray(rewards).reshape(-1, 1),
            action_mask=np.asarray(actions),
            model_propensities=np.asarray(model_propensities),
            model_rewards=np.asarray(model_rewards),
            model_rewards_for_logged_action=np.asarray(rewards_for_logged),
            model_values=np.asarray(model_values),
            possible_actions_mask=np.asarray(possible_actions_mask),
            optimal_q_values=np.asarray(optimal_q_values),
            eval_action_idxs=np.asarray(eval_action_idxs),
        )

    # ------------------------------------------------------------ operations

    def append(self, edp: "EvaluationDataPage") -> "EvaluationDataPage":
        new_vals = {}
        for f in dataclasses.fields(self):
            a, b = getattr(self, f.name), getattr(edp, f.name)
            if a is None or b is None:
                new_vals[f.name] = None
            else:
                new_vals[f.name] = np.concatenate([a, b], axis=0)
        return EvaluationDataPage(**new_vals)

    def sort(self) -> "EvaluationDataPage":
        """Sort by (mdp_id, sequence_number) — reference :470-494."""
        assert self.mdp_id is not None and self.sequence_number is not None
        mdp = np.asarray(self.mdp_id).reshape(-1)
        seq = np.asarray(self.sequence_number).reshape(-1)
        order = np.lexsort((seq, mdp))
        new_vals = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            new_vals[f.name] = None if v is None else np.asarray(v)[order]
        return EvaluationDataPage(**new_vals)

    def compute_values(self, gamma: float) -> "EvaluationDataPage":
        """Per-step discounted returns-to-go within each episode (ref :496)."""
        assert self.mdp_id is not None and self.sequence_number is not None
        logged_values = compute_values_for_mdps(
            self.logged_rewards, self.mdp_id, self.sequence_number, gamma
        )
        logged_metrics_values = None
        if self.logged_metrics is not None:
            logged_metrics_values = compute_values_for_mdps(
                self.logged_metrics, self.mdp_id, self.sequence_number, gamma
            )
        return self.replace(
            logged_values=logged_values, logged_metrics_values=logged_metrics_values
        )

    def validate(self) -> None:
        """Reference :542-568."""
        assert self.logged_propensities.ndim == 2
        assert self.logged_rewards.ndim == 2
        assert self.logged_propensities.shape[1] == 1
        assert self.logged_rewards.shape[1] == 1
        num_actions = self.model_propensities.shape[1]
        assert self.model_rewards.shape[1] == num_actions
        assert self.action_mask.shape == self.model_propensities.shape
        assert np.all(self.logged_propensities > 0), "Logged propensities must be > 0"

    def set_metric_as_reward(self, i: int, num_actions: int) -> "EvaluationDataPage":
        """Swap metric i into the reward slots (reference :628-657)."""
        assert self.logged_metrics is not None, "metrics must not be none"
        assert self.model_metrics is not None
        assert self.model_metrics_values is not None
        return self.replace(
            logged_rewards=self.logged_metrics[:, i : i + 1],
            logged_values=(
                None
                if self.logged_metrics_values is None
                else self.logged_metrics_values[:, i : i + 1]
            ),
            model_rewards=self.model_metrics[
                :, i * num_actions : (i + 1) * num_actions
            ],
            model_rewards_for_logged_action=(
                None
                if self.model_metrics_for_logged_action is None
                else self.model_metrics_for_logged_action[:, i : i + 1]
            ),
            model_values=self.model_metrics_values[
                :, i * num_actions : (i + 1) * num_actions
            ],
            logged_metrics=None,
            model_metrics=None,
            model_metrics_values=None,
        )


def compute_values_for_mdps(
    rewards: np.ndarray,
    mdp_ids: np.ndarray,
    sequence_numbers: np.ndarray,
    gamma: float,
) -> np.ndarray:
    """Backward within-episode discounted sums (reference :523-540)."""
    rewards = np.asarray(rewards, dtype=np.float64)
    values = rewards.copy().reshape(-1)
    mdp = np.asarray(mdp_ids).reshape(-1)
    seq = np.asarray(sequence_numbers).reshape(-1).astype(np.float64)
    for x in range(len(values) - 2, -1, -1):
        if mdp[x] != mdp[x + 1]:
            continue
        values[x] += values[x + 1] * math.pow(gamma, seq[x + 1] - seq[x])
    return values.reshape(-1, 1).astype(np.float32)
