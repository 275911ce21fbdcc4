"""Gym batch-RL pipeline: collect random data -> timeline -> train -> evaluate.

Reference: reagent/workflow/gym_batch_rl.py:66-220 — the 4-command offline E2E
(offline_gym_random, timeline_operator, identify_and_train_network,
evaluate_gym).  The Spark JVM boundary dissolves into the pandas timeline.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np
import pandas as pd

from reagent_tpu.data.timeline import timeline_transform
from reagent_tpu.data.data_module import TableSpec
from reagent_tpu.gym.envs.gym_env import Gym

logger = logging.getLogger(__name__)

PRE_TIMELINE_SUFFIX = "_pre_timeline_operator"


def offline_gym_random(
    env_name: str,
    pkl_path: str,
    num_train_transitions: int,
    max_steps: Optional[int] = None,
    seed: int = 1,
) -> None:
    """Random-policy rollouts -> pre-timeline pandas pickle (reference :66-84)."""
    env = Gym(env_name=env_name, set_max_steps=max_steps)
    rng = np.random.default_rng(seed)
    rows = []
    mdp_id = 0
    obs = env.reset(seed=seed)
    seq = 0
    import gymnasium

    discrete = isinstance(env.action_space, gymnasium.spaces.Discrete)
    num_actions = env.action_space.n if discrete else None
    while len(rows) < num_train_transitions:
        if discrete:
            action = int(rng.integers(0, num_actions))
            action_str = str(action)
            action_prob = 1.0 / num_actions
            possible_actions = [str(a) for a in range(num_actions)]
        else:
            action = rng.uniform(env.action_space.low, env.action_space.high)
            action_str = {i: float(v) for i, v in enumerate(action)}
            action_prob = 1.0
            possible_actions = None
        next_obs, reward, done = env.step(action)
        row = {
            "ds": "2026-01-01",
            "mdp_id": str(mdp_id),
            "sequence_number": seq,
            "state_features": {i: float(v) for i, v in enumerate(obs)},
            "action": action_str,
            "reward": float(reward),
            "action_probability": action_prob,
            "metrics": {"reward": float(reward)},
        }
        if possible_actions is not None:
            row["possible_actions"] = possible_actions
        rows.append(row)
        seq += 1
        obs = next_obs
        if done:
            mdp_id += 1
            seq = 0
            obs = env.reset()
    env.close()
    df = pd.DataFrame(rows)
    logger.info("Saving %d pre-timeline rows to %s", len(df), pkl_path)
    df.to_pickle(pkl_path)


def timeline_operator(pkl_path: str, input_table_spec: TableSpec) -> None:
    """pandas timeline transform -> parquet/pickle table (reference :138-170)."""
    df = pd.read_pickle(pkl_path)
    out = timeline_transform(df)
    out_path = input_table_spec.path or (pkl_path + ".timeline.pkl")
    out.to_pickle(out_path)
    logger.info("Timeline table with %d rows written to %s", len(out), out_path)


def evaluate_gym(
    env_name: str,
    model_path: str,
    num_eval_episodes: int = 20,
    passing_score_bar: Optional[float] = None,
    max_steps: Optional[int] = None,
    seed: int = 0,
) -> float:
    """Load the exported serving artifact, run greedy episodes.

    Dispatches on the artifact's model_type (discrete DQN → argmax over
    action scores; actor → continuous action), like the reference's
    create_predictor_policy_from_model (gym_batch_rl.py:173-220,
    gym/policies/predictor_policies.py:24-60).
    """
    from reagent_tpu.prediction.predictor_wrapper import load_predictor

    predictor = load_predictor(model_path)
    continuous = getattr(predictor, "model_type", "discrete_dqn") == "actor"
    env = Gym(env_name=env_name, set_max_steps=max_steps)
    returns = []
    for ep in range(num_eval_episodes):
        obs = env.reset(seed=seed + ep)
        total, done = 0.0, False
        while not done:
            features = {i: float(v) for i, v in enumerate(np.asarray(obs).reshape(-1))}
            if continuous:
                action = np.asarray(predictor.predict(features)).reshape(-1)
            else:
                _, q = predictor.predict(features)
                action = int(np.argmax(np.asarray(q).reshape(-1)))
            obs, reward, done = env.step(action)
            total += reward
        returns.append(total)
    env.close()
    mean_reward = float(np.mean(returns))
    logger.info("Mean eval reward over %d episodes: %.1f", num_eval_episodes, mean_reward)
    if passing_score_bar is not None:
        assert mean_reward >= passing_score_bar, (
            f"{mean_reward} <= {passing_score_bar}, eval failed"
        )
    return mean_reward
