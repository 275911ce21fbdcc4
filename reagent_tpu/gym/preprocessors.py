"""Replay-sample -> typed-batch makers.

Reference: reagent/gym/preprocessors/trainer_preprocessor.py:32-484 — there the
batch maker is picked by inspecting the trainer's ``train_step_gen`` type
annotation.  Here makers are explicit pure functions passed into the loop.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt

Array = jax.Array


def make_discrete_dqn_batch(batch: Dict[str, Array], num_actions: int) -> rlt.DiscreteDqnInput:
    """Reference: trainer_preprocessor.py DiscreteDqnInputMaker."""
    action_idx = batch["action"].reshape(-1).astype(jnp.int32)
    next_action_idx = batch["next_action"].reshape(-1).astype(jnp.int32)
    B = action_idx.shape[0]
    terminal = batch["terminal"].reshape(B, 1).astype(jnp.float32)
    return rlt.DiscreteDqnInput(
        state=rlt.FeatureData(float_features=batch["state"]),
        next_state=rlt.FeatureData(float_features=batch["next_state"]),
        action=jax.nn.one_hot(action_idx, num_actions),
        next_action=jax.nn.one_hot(next_action_idx, num_actions),
        reward=batch["reward"].reshape(B, 1),
        time_diff=jnp.ones((B, 1), jnp.float32),
        step=batch["step"].reshape(B, 1),
        not_terminal=1.0 - terminal,
        possible_actions_mask=batch.get(
            "possible_actions_mask", jnp.ones((B, num_actions), jnp.float32)
        ),
        possible_next_actions_mask=batch.get(
            "next_possible_actions_mask", jnp.ones((B, num_actions), jnp.float32)
        ),
        extras=rlt.ExtraData(),
    )


def make_parametric_dqn_batch(
    batch: Dict[str, Array], num_actions: int
) -> rlt.ParametricDqnInput:
    """Discrete env -> parametric batch: actions become one-hot feature vectors
    and possible-actions are all actions tiled (trainer_preprocessor.py
    ParametricDqnInputMaker)."""
    action_idx = batch["action"].reshape(-1).astype(jnp.int32)
    next_action_idx = batch["next_action"].reshape(-1).astype(jnp.int32)
    B = action_idx.shape[0]
    terminal = batch["terminal"].reshape(B, 1).astype(jnp.float32)
    eye = jnp.eye(num_actions)
    tiled_actions = jnp.tile(eye, (B, 1))  # [B*A, A]
    return rlt.ParametricDqnInput(
        state=rlt.FeatureData(float_features=batch["state"]),
        next_state=rlt.FeatureData(float_features=batch["next_state"]),
        action=rlt.FeatureData(float_features=jax.nn.one_hot(action_idx, num_actions)),
        next_action=rlt.FeatureData(
            float_features=jax.nn.one_hot(next_action_idx, num_actions)
        ),
        possible_actions=rlt.FeatureData(float_features=tiled_actions),
        possible_actions_mask=jnp.ones((B, num_actions)),
        possible_next_actions=rlt.FeatureData(float_features=tiled_actions),
        possible_next_actions_mask=jnp.ones((B, num_actions)),
        reward=batch["reward"].reshape(B, 1),
        time_diff=jnp.ones((B, 1), jnp.float32),
        step=batch["step"].reshape(B, 1),
        not_terminal=1.0 - terminal,
        extras=rlt.ExtraData(),
    )


def make_policy_network_batch(batch: Dict[str, Array]) -> rlt.PolicyNetworkInput:
    """Continuous-control batch (SAC/TD3), trainer_preprocessor.py PolicyNetworkInputMaker."""
    B = batch["state"].shape[0]
    terminal = batch["terminal"].reshape(B, 1).astype(jnp.float32)
    action = batch["action"]
    next_action = batch["next_action"]
    if action.ndim == 1:
        action = action[:, None]
        next_action = next_action[:, None]
    return rlt.PolicyNetworkInput(
        state=rlt.FeatureData(float_features=batch["state"]),
        next_state=rlt.FeatureData(float_features=batch["next_state"]),
        action=rlt.FeatureData(float_features=action),
        next_action=rlt.FeatureData(float_features=next_action),
        reward=batch["reward"].reshape(B, 1),
        time_diff=jnp.ones((B, 1), jnp.float32),
        step=batch["step"].reshape(B, 1),
        not_terminal=1.0 - terminal,
        extras=rlt.ExtraData(),
    )


def make_slate_q_batch(batch: Dict[str, Array]) -> rlt.SlateQInput:
    """Slate replay dict -> SlateQInput.

    Reference: trainer_preprocessor.py:230-275 SlateQInputMaker.  Expects the
    slate keys the RecSim-style envs log into replay: ``doc`` [B, C, D]
    candidate features, ``doc_value`` [B, C] (the ValueWrapper head),
    ``action`` [B, S] slate indices, ``position_reward`` [B, S] per-position
    reward (watch time), ``response_click`` [B, S] click indicators — plus
    their ``next_*`` counterparts from the buffer.  Unlike the reference we
    keep the slate un-augmented (no null-action concat): with
    ``single_selection=True`` our SlateQTrainer masks no-click positions out
    of the loss via ``reward_mask``; with ``single_selection=False`` it
    trains every position against its per-position reward (zero when
    unclicked), which is the reference's multi-select math — so neither path
    needs the null-action row.
    """
    B = batch["state"].shape[0]
    terminal = batch["terminal"].reshape(B, 1).astype(jnp.float32)

    def docs(prefix: str = "") -> rlt.DocList:
        feats = batch[prefix + "doc"]
        return rlt.DocList(
            float_features=feats,
            mask=batch.get(
                prefix + "item_mask", jnp.ones(feats.shape[:2], jnp.float32)
            ),
            value=batch[prefix + "doc_value"],
        )

    return rlt.SlateQInput(
        state=rlt.FeatureData(float_features=batch["state"], candidate_docs=docs()),
        next_state=rlt.FeatureData(
            float_features=batch["next_state"], candidate_docs=docs("next_")
        ),
        action=batch["action"].astype(jnp.int32),
        next_action=batch["next_action"].astype(jnp.int32),
        reward=batch["position_reward"],
        reward_mask=batch["response_click"].astype(bool),
        time_diff=jnp.ones((B, 1), jnp.float32),
        step=batch["step"].reshape(B, 1) if "step" in batch else None,
        not_terminal=1.0 - terminal,
    )


def make_trainer_preprocessor(trainer, num_actions: Optional[int] = None):
    """Pick the batch maker from the trainer's train_step batch annotation.

    Reference: gym/preprocessors/trainer_preprocessor.py:32-57 — inspects the
    training-batch type hint and dispatches to the matching input maker.
    """
    import typing

    hints = typing.get_type_hints(type(trainer).train_step)
    batch_type = hints.get("batch")
    name = getattr(batch_type, "__name__", str(batch_type))
    if name == "DiscreteDqnInput":
        assert num_actions is not None, "DiscreteDqnInput needs num_actions"
        return lambda d: make_discrete_dqn_batch(d, num_actions)
    if name == "ParametricDqnInput":
        assert num_actions is not None, "ParametricDqnInput needs num_actions"
        return lambda d: make_parametric_dqn_batch(d, num_actions)
    if name == "PolicyNetworkInput":
        return make_policy_network_batch
    if name == "SlateQInput":
        return make_slate_q_batch
    raise NotImplementedError(
        f"no batch maker for trainer {type(trainer).__name__} (batch: {name})"
    )
