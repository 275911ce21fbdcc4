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
    def create_from_training_batch(
        cls, tdb, trainer, trainer_state
    ) -> "EvaluationDataPage":
        """Dispatch on the typed batch (reference evaluation_data_page.py:53-88):
        DiscreteDqnInput -> create_from_tensors_dqn, ParametricDqnInput ->
        create_from_tensors_parametric_dqn."""
        extras = getattr(tdb, "extras", None) or rlt.ExtraData()
        if isinstance(tdb, rlt.DiscreteDqnInput):
            return cls.create_from_tensors_dqn(
                trainer,
                trainer_state,
                mdp_ids=extras.mdp_id,
                sequence_numbers=extras.sequence_number,
                states=tdb.state.float_features,
                actions=tdb.action,
                propensities=extras.action_probability,
                rewards=tdb.reward,
                possible_actions_mask=tdb.possible_actions_mask,
                metrics=extras.metrics,
            )
        if isinstance(tdb, rlt.ParametricDqnInput):
            return cls.create_from_tensors_parametric_dqn(
                trainer,
                trainer_state,
                mdp_ids=extras.mdp_id,
                sequence_numbers=extras.sequence_number,
                states=tdb.state.float_features,
                actions=tdb.action.float_features,
                propensities=extras.action_probability,
                rewards=tdb.reward,
                possible_actions_mask=tdb.possible_actions_mask,
                possible_actions=tdb.possible_actions.float_features,
                max_num_actions=extras.max_num_actions
                or tdb.possible_actions_mask.shape[1],
                metrics=extras.metrics,
            )
        raise NotImplementedError(f"training_input type: {type(tdb)}")

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

    @classmethod
    def create_from_tensors_seq2slate(
        cls,
        seq2slate_net,
        seq2slate_params,
        reward_network,
        reward_params,
        training_input,
        eval_greedy: bool,
        mdp_ids: Optional[np.ndarray] = None,
        sequence_numbers: Optional[np.ndarray] = None,
    ) -> "EvaluationDataPage":
        """Slate-ranking EDP (reference evaluation_data_page.py:92-182).

        ``eval_greedy=True`` evaluates the greedy ranking policy: propensity 1
        for its single deterministic slate, action_mask = indicator(logged
        slate == greedy slate).  ``eval_greedy=False`` evaluates the
        stochastic policy: the model propensity of the *logged* slate (true
        IPS, but DM/DR are not meaningful — computing all slates' propensities
        is exponential; reference :134-145).

        ``seq2slate_net``/``reward_network`` are flax-style modules used via
        ``.apply(params, ...)`` — the ranker with the Seq2SlateTransformerModel
        mode convention, the reward net over a PreprocessedRankingInput.
        """
        from reagent_tpu.models.seq2slate import Seq2SlateMode

        assert training_input.slate_reward is not None
        assert training_input.tgt_out_probs is not None
        assert training_input.tgt_out_idx is not None
        assert training_input.tgt_out_seq is not None
        B, T, C = training_input.tgt_out_seq.float_features.shape

        rank_output = seq2slate_net.apply(
            seq2slate_params,
            Seq2SlateMode.RANK_MODE.value,
            training_input.state.float_features,
            training_input.src_seq.float_features,
            tgt_seq_len=T,
            greedy=True,
        )
        ranked_idx = rank_output.ranked_tgt_out_idx
        assert ranked_idx is not None

        if eval_greedy:
            model_propensities = np.ones((B, 1), np.float32)
            action_mask = np.asarray(
                jnp.all(
                    training_input.tgt_out_idx == ranked_idx, axis=1, keepdims=True
                ),
                dtype=np.float32,
            )
        else:
            log_probs = seq2slate_net.apply(
                seq2slate_params,
                Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value,
                training_input.state.float_features,
                training_input.src_seq.float_features,
                tgt_in_idx=training_input.tgt_in_idx,
                tgt_out_idx=training_input.tgt_out_idx,
                tgt_in_seq=(
                    None
                    if training_input.tgt_in_seq is None
                    else training_input.tgt_in_seq.float_features
                ),
            ).per_seq_log_probs
            model_propensities = np.asarray(jnp.exp(log_probs)).reshape(B, 1)
            action_mask = np.ones((B, 1), np.float32)

        # predicted reward of the LOGGED slate
        model_rewards_for_logged_action = np.asarray(
            reward_network.apply(reward_params, training_input)
        ).reshape(-1, 1)

        # predicted reward of the greedily RANKED slate (item i sits at
        # index i + 2 in the vocab — reference :156-159)
        ranked_tgt_out_seq = jnp.take_along_axis(
            training_input.src_seq.float_features,
            (ranked_idx - 2)[:, :, None],
            axis=1,
        )
        ranked_input = training_input.replace(
            tgt_out_seq=rlt.FeatureData(float_features=ranked_tgt_out_seq),
            tgt_out_idx=ranked_idx,
        )
        model_rewards = np.asarray(
            reward_network.apply(reward_params, ranked_input)
        ).reshape(-1, 1)

        return cls(
            mdp_id=None if mdp_ids is None else np.asarray(mdp_ids),
            sequence_number=(
                None if sequence_numbers is None else np.asarray(sequence_numbers)
            ),
            model_propensities=model_propensities,
            model_rewards=model_rewards,
            action_mask=action_mask,
            logged_rewards=np.asarray(training_input.slate_reward).reshape(-1, 1),
            model_rewards_for_logged_action=model_rewards_for_logged_action,
            logged_propensities=np.asarray(training_input.tgt_out_probs).reshape(
                -1, 1
            ),
        )

    @classmethod
    def create_from_tensors_parametric_dqn(
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
        possible_actions: jnp.ndarray,  # [B * max_num_actions, action_dim] tiled
        max_num_actions: int,
        metrics: Optional[jnp.ndarray] = None,
    ) -> "EvaluationDataPage":
        """Parametric-DQN EDP (reference evaluation_data_page.py:186-305).

        The (state, action) Q-network is forwarded over every possible action
        by tiling states ``max_num_actions`` times, mirroring the reference's
        ``possible_actions_state_concat``.
        """
        assert trainer.reward_network is not None, (
            "CFEval requires a trained reward network"
        )
        B = possible_actions_mask.shape[0]
        M = max_num_actions
        state_dim = states.shape[1]
        tiled_states = jnp.reshape(
            jnp.tile(states, (1, M)), (-1, state_dim)
        )  # [B*M, state_dim]

        # FIXME parity (reference :215-218): model_values should come from a
        # CPE Q-network once parametric dqn grows one; until then q_network.
        model_values = trainer.q_network.apply(
            trainer_state.q_params, tiled_states, possible_actions
        ).reshape(B, M)
        optimal_q_values = model_values
        eval_action_idxs = None

        temperature = getattr(trainer.rl, "temperature", 1.0)
        model_propensities = jax.nn.softmax(
            optimal_q_values / max(temperature, 1e-9)
            + jnp.log(jnp.clip(possible_actions_mask.astype(jnp.float32), 1e-20, 1.0)),
            axis=1,
        )

        rewards_and_metrics = trainer.reward_network.apply(
            trainer_state.reward_params, tiled_states, possible_actions
        )
        model_rewards = rewards_and_metrics[:, :1].reshape(B, M)
        model_metrics = rewards_and_metrics[:, 1:].reshape(B, -1)

        model_rewards_for_logged_action = trainer.reward_network.apply(
            trainer_state.reward_params, states, actions
        )[:, :1]

        action_dim = actions.shape[1]
        # tolerant float match, restricted to actions the mask allows
        # (duplicate padded rows outside the mask must not double-match)
        action_mask = (
            jnp.all(
                jnp.isclose(
                    possible_actions.reshape(B, M, action_dim),
                    actions[:, None, :],
                    atol=1e-6,
                ),
                axis=2,
            ).astype(jnp.float32)
            * possible_actions_mask.astype(jnp.float32)
        )
        assert np.all(np.asarray(action_mask).sum(axis=1) == 1), (
            "each logged action must match exactly one allowed possible action"
        )
        num_metrics = model_metrics.shape[1] // M

        model_metrics_values = None
        if num_metrics > 0:
            # FIXME parity (reference :276-279)
            model_metrics_values = jnp.tile(model_values, (1, num_metrics))

        return cls(
            mdp_id=np.asarray(mdp_ids),
            sequence_number=np.asarray(sequence_numbers),
            logged_propensities=np.asarray(propensities).reshape(-1, 1),
            logged_rewards=np.asarray(rewards).reshape(-1, 1),
            action_mask=np.asarray(action_mask),
            model_rewards=np.asarray(model_rewards),
            model_rewards_for_logged_action=np.asarray(
                model_rewards_for_logged_action
            ),
            model_values=np.asarray(model_values),
            model_metrics_values=(
                None
                if model_metrics_values is None
                else np.asarray(model_metrics_values)
            ),
            model_propensities=np.asarray(model_propensities),
            logged_metrics=None if metrics is None else np.asarray(metrics),
            model_metrics=None if num_metrics == 0 else np.asarray(model_metrics),
            possible_actions_mask=np.asarray(possible_actions_mask),
            optimal_q_values=np.asarray(optimal_q_values),
            eval_action_idxs=eval_action_idxs,
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
