"""Shared RL-trainer utilities.

Reference: reagent/training/dqn_trainer_base.py:24-79 (``DQNTrainerMixin``
max-Q utilities), reagent/training/rl_trainer_pytorch.py (``RLTrainerMixin``
hyper-parameter plumbing).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters

# Q-value for an impossible action: guaranteed worse than any real action
# (reference dqn_trainer_base.py:27).
ACTION_NOT_POSSIBLE_VAL = -1e9


def get_max_q_values_with_target(
    q_values: jnp.ndarray,
    q_values_target: jnp.ndarray,
    possible_actions_mask: jnp.ndarray,
    double_q_learning: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Max-Q with action masking and optional double-Q selection.

    Reference: dqn_trainer_base.py:34-79.  Returns ([B,1] max q, [B,1] argmax).
    """
    q_values = q_values.reshape(possible_actions_mask.shape)
    q_values_target = q_values_target.reshape(possible_actions_mask.shape)
    penalty = ACTION_NOT_POSSIBLE_VAL * (1.0 - possible_actions_mask)
    q_values = q_values + penalty
    q_values_target = q_values_target + penalty
    if double_q_learning:
        max_idx = jnp.argmax(q_values, axis=1, keepdims=True)
        max_q = jnp.take_along_axis(q_values_target, max_idx, axis=1)
    else:
        max_idx = jnp.argmax(q_values_target, axis=1, keepdims=True)
        max_q = jnp.take_along_axis(q_values_target, max_idx, axis=1)
    return max_q, max_idx


def get_max_q_values(
    q_values: jnp.ndarray, possible_actions_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return get_max_q_values_with_target(
        q_values, q_values, possible_actions_mask, double_q_learning=False
    )


def boost_rewards(
    rewards: jnp.ndarray,
    actions_onehot: jnp.ndarray,
    reward_boosts: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Add per-action reward boost (reference dqn_trainer_base.py:116-126)."""
    if reward_boosts is None:
        return rewards
    boost = jnp.sum(actions_onehot * reward_boosts, axis=1, keepdims=True)
    return rewards + boost


def compute_discount_tensor(
    batch,
    gamma: float,
    use_seq_num_diff_as_time_diff: bool = False,
    multi_steps: Optional[int] = None,
) -> jnp.ndarray:
    """gamma, gamma^time_diff, or gamma^step (reference dqn_trainer.py:168-178)."""
    discount = jnp.full_like(batch.reward, gamma)
    if use_seq_num_diff_as_time_diff:
        discount = gamma ** batch.time_diff.astype(jnp.float32)
    if multi_steps is not None and batch.step is not None:
        discount = gamma ** batch.step.astype(jnp.float32)
    return discount


def q_network_loss_fn(name: str):
    """"mse" or "huber" (reference rl_trainer_pytorch.py q_network_loss)."""
    if name == "mse":
        return lambda pred, target: jnp.mean((pred - target) ** 2)
    if name in ("huber", "smooth_l1"):
        def huber(pred, target):
            err = pred - target
            a = jnp.abs(err)
            return jnp.mean(jnp.where(a < 1.0, 0.5 * err**2, a - 0.5))
        return huber
    raise ValueError(f"unknown q_network_loss {name!r}")


def reward_boost_array(
    reward_boost: Optional[Dict[str, float]], action_names: Optional[Tuple[str, ...]]
) -> Optional[jnp.ndarray]:
    if not reward_boost or not action_names:
        return None
    return jnp.array([reward_boost.get(a, 0.0) for a in action_names], jnp.float32)
