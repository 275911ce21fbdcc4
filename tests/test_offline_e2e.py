"""Offline E2E pipeline: random data -> timeline -> train -> eval.

Mirrors the reference CI job ``dqn_cartpole_e2e`` (4-command CLI pipeline,
passing_score_bar 120 from discrete_dqn_cartpole_offline.yaml:55).
"""

import os

import numpy as np
import pandas as pd
import pytest

from reagent_tpu.data.data_module import TableSpec
from reagent_tpu.data.timeline import multi_step_timeline_transform, timeline_transform
from reagent_tpu.workflow.gym_batch_rl import (
    evaluate_gym,
    offline_gym_random,
    timeline_operator,
)
from reagent_tpu.workflow.training import identify_and_train_network


def _toy_logged_df():
    rows = []
    for mdp in range(3):
        for t in range(4):
            rows.append(
                {
                    "ds": "2026-01-01",
                    "mdp_id": str(mdp),
                    "sequence_number": t * 2,  # gaps -> time_diff 2
                    "state_features": {0: float(mdp), 1: float(t)},
                    "action": str(t % 2),
                    "reward": 1.0,
                    "action_probability": 0.5,
                    "possible_actions": ["0", "1"],
                }
            )
    return pd.DataFrame(rows)


def test_timeline_transform_contract():
    df = _toy_logged_df()
    out = timeline_transform(df, shuffle=False)
    assert len(out) == 12
    ep0 = out[out.mdp_id == "0"].sort_values("sequence_number")
    # adjacent-pair shift
    assert ep0.iloc[0]["next_state_features"] == {0: 0.0, 1: 1.0}
    assert ep0.iloc[0]["next_action"] == "1"
    assert ep0.iloc[0]["time_diff"] == 2
    assert list(ep0["sequence_number_ordinal"]) == [1, 2, 3, 4]
    assert list(ep0["time_since_first"]) == [0, 2, 4, 6]
    # terminal row
    last = ep0.iloc[-1]
    assert last["not_terminal"] == 0
    assert last["next_state_features"] == {}
    assert last["possible_next_actions"] == []


def test_multi_step_timeline():
    df = _toy_logged_df()
    out = multi_step_timeline_transform(df, multi_steps=2, shuffle=False)
    ep0 = out[out.mdp_id == "0"].sort_values("sequence_number")
    first = ep0.iloc[0]
    assert len(first["next_state_features"]) == 2
    assert first["reward"] == [1.0, 1.0]
    assert first["not_terminal"] == 1
    # second-to-last has horizon 1 and is terminal-reaching
    penult = ep0.iloc[-2]
    assert len(penult["next_state_features"]) == 1
    assert penult["not_terminal"] == 0


@pytest.mark.slow
def test_dqn_cartpole_offline_e2e(tmp_path):
    pkl = str(tmp_path / "pre_timeline.pkl")
    table = str(tmp_path / "table.pkl")
    out_dir = str(tmp_path / "model_out")

    # 1. collect random transitions (reference offline_gym_random)
    offline_gym_random(
        env_name="CartPole-v1", pkl_path=pkl,
        num_train_transitions=12000, max_steps=200, seed=1,
    )
    # 2. timeline operator
    spec = TableSpec(table_name="cartpole", path=table, table_sample=90.0, eval_table_sample=10.0)
    timeline_operator(pkl, spec)
    # 3. train
    model_config = {
        "DiscreteDQN": {
            "trainer_param": {
                "actions": ["0", "1"],
                "rl": {"gamma": 0.99, "target_update_rate": 0.2, "maxq_learning": True},
                "double_q_learning": True,
                "minibatch_size": 512,
                "optimizer": {"Adam": {"lr": 0.01}},
            },
            "net_builder": {
                "FullyConnected": {
                    "sizes": [128, 64], "activations": ["leaky_relu", "leaky_relu"]
                }
            },
            "eval_parameters": {"calc_cpe_in_training": True},
        }
    }
    # the manager's reporter writes TB events (action histograms etc.)
    from torch.utils.tensorboard import SummaryWriter

    from reagent_tpu.core.tracker import summary_writer_context

    tb_dir = str(tmp_path / "tb")
    writer = SummaryWriter(log_dir=tb_dir)
    with summary_writer_context(writer):
        result = identify_and_train_network(
            input_table_spec=spec, model=model_config, num_epochs=25, output_dir=out_dir,
        )
    writer.close()
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tb_dir)
    acc.Reload()
    scalars = set(acc.Tags()["scalars"])
    assert {"actions/logged/0", "actions/logged/1"} <= scalars, scalars
    assert "td_loss" in set(acc.Tags()["histograms"])
    assert "default_model" in result.output_paths
    assert result.training_report.td_loss is not None
    cpe = result.training_report.cpe_details
    assert cpe is not None, "CPE should run on the eval split"
    assert np.isfinite(cpe.reward_estimates.direct_method.raw)
    # 4. evaluate the exported artifact in the real env against the bar
    mean_reward = evaluate_gym(
        env_name="CartPole-v1",
        model_path=result.output_paths["default_model"],
        num_eval_episodes=20,
        passing_score_bar=120.0,
        max_steps=200,
    )
    print(f"offline e2e mean eval reward: {mean_reward}")


def test_warm_start_incremental_training(tmp_path):
    """Incremental training: warm_start_path restores trainer state before
    training and is overwritten after (reference workflow/utils.py:161,173-176
    resume semantics + reagent_lightning_module.py:30-34 step persistence)."""
    import jax
    import jax.numpy as jnp

    from reagent_tpu.utils.checkpointing import restore_checkpoint
    from reagent_tpu.core.registry import MODEL_MANAGERS

    pkl = str(tmp_path / "pre.pkl")
    table = str(tmp_path / "table.pkl")
    warm = str(tmp_path / "warm_start")
    offline_gym_random(
        env_name="CartPole-v1", pkl_path=pkl,
        num_train_transitions=1200, max_steps=100, seed=3,
    )
    spec = TableSpec(table_name="cp", path=table, table_sample=100.0, eval_table_sample=0.0)
    timeline_operator(pkl, spec)
    model_config = {
        "DiscreteDQN": {
            "trainer_param": {
                "actions": ["0", "1"],
                "rl": {"gamma": 0.99, "target_update_rate": 0.2},
                "minibatch_size": 256,
                "optimizer": {"Adam": {"lr": 0.003}},
            },
            "net_builder": {"FullyConnected": {"sizes": [32], "activations": ["relu"]}},
        }
    }
    r1 = identify_and_train_network(
        input_table_spec=spec, model=model_config, num_epochs=2,
        output_dir=str(tmp_path / "out1"), warm_start_path=warm,
    )
    assert os.path.exists(warm)

    # inspect the saved step counter
    manager = MODEL_MANAGERS.build(model_config)
    df = pd.read_pickle(table)
    ndm = manager.run_feature_identification(df)
    trainer = manager.build_trainer(ndm)
    proto = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, manager.state_dim(ndm))))
    step_after_1 = int(restore_checkpoint(warm, proto).step)
    assert step_after_1 > 0

    r2 = identify_and_train_network(
        input_table_spec=spec, model=model_config, num_epochs=2,
        output_dir=str(tmp_path / "out2"), warm_start_path=warm,
    )
    step_after_2 = int(restore_checkpoint(warm, proto).step)
    # second run continued from the first run's optimizer step counter
    assert step_after_2 == 2 * step_after_1, (step_after_1, step_after_2)
    assert r2.training_report.td_loss is not None


def test_reward_options_shaping():
    """RewardOptions: metric-weighted rewards, custom expressions, multi-step
    folding (reference workflow/types.py:79, oss_data_fetcher.py:35-63)."""
    from reagent_tpu.data.reward_options import (
        RewardOptions,
        apply_reward_options,
        calc_reward_multi_steps,
    )

    df = pd.DataFrame(
        {
            "reward": [1.0, 2.0, 3.0],
            "metrics": [{"ctr": 0.5, "watch": 2.0}, {"ctr": 0.1}, {}],
        }
    )
    # weighted metrics replace the reward
    out = apply_reward_options(df, RewardOptions(metric_reward_values={"ctr": 10.0, "watch": 1.0}))
    np.testing.assert_allclose(out["reward"], [7.0, 1.0, 0.0])
    # custom expression over reward + metrics columns
    out = apply_reward_options(
        df, RewardOptions(custom_reward_expression="reward * 2 + metrics_ctr")
    )
    np.testing.assert_allclose(out["reward"], [2.5, 4.1, 6.0])
    # both: metrics first, then expression sees the new reward
    out = apply_reward_options(
        df,
        RewardOptions(
            metric_reward_values={"ctr": 1.0},
            custom_reward_expression="reward * 10",
        ),
    )
    np.testing.assert_allclose(out["reward"], [5.0, 1.0, 0.0])
    # multi-step discounted fold
    ms = pd.DataFrame({"reward": [[1.0, 1.0, 1.0], [2.0], 3.0]})
    out = calc_reward_multi_steps(ms, gamma=0.5)
    np.testing.assert_allclose(out["reward"], [1 + 0.5 + 0.25, 2.0, 3.0])


def test_workflow_with_custom_reward_expression(tmp_path):
    """reward_options threads through identify_and_train_network."""
    pkl = str(tmp_path / "pre.pkl")
    table = str(tmp_path / "table.pkl")
    offline_gym_random(
        env_name="CartPole-v1", pkl_path=pkl,
        num_train_transitions=600, max_steps=100, seed=2,
    )
    spec = TableSpec(table_name="cp", path=table, table_sample=100.0, eval_table_sample=0.0)
    timeline_operator(pkl, spec)
    result = identify_and_train_network(
        input_table_spec=spec,
        model={
            "DiscreteDQN": {
                "trainer_param": {
                    "actions": ["0", "1"],
                    "rl": {"gamma": 0.99, "target_update_rate": 0.2},
                    "minibatch_size": 128,
                    "optimizer": {"Adam": {"lr": 0.01}},
                },
                "net_builder": {"FullyConnected": {"sizes": [16], "activations": ["relu"]}},
            }
        },
        num_epochs=1, output_dir=str(tmp_path / "out"),
        reward_options={"custom_reward_expression": "reward * 0.5"},
    )
    assert result.training_report.td_loss is not None


def test_partitioned_timeline_matches_single_shard():
    """Hash-partitioned parallel timeline == single-shard transform
    (reference: Spark distributes Timeline.scala by mdp_id hash)."""
    from reagent_tpu.data.timeline import (
        partitioned_timeline_transform,
        timeline_transform,
    )

    rng = np.random.default_rng(0)
    rows = []
    for mdp in range(40):
        n = int(rng.integers(2, 12))
        for t in range(n):
            rows.append(
                {
                    "ds": "2026-01-01",
                    "mdp_id": f"m{mdp}",
                    "sequence_number": t * 2,
                    "state_features": {0: float(t), 1: float(mdp)},
                    "action": str(int(rng.integers(2))),
                    "action_probability": 0.5,
                    "reward": float(rng.normal()),
                    "possible_actions": ["0", "1"],
                }
            )
    df = pd.DataFrame(rows)
    single = timeline_transform(df, shuffle=False)
    multi = partitioned_timeline_transform(df, num_partitions=4, shuffle=False)
    key = ["mdp_id", "sequence_number"]
    single = single.sort_values(key).reset_index(drop=True)
    multi = multi.sort_values(key).reset_index(drop=True)
    assert len(single) == len(multi)
    for col in ("next_action", "time_diff", "sequence_number_ordinal",
                "time_since_first", "not_terminal"):
        assert list(single[col]) == list(multi[col]), col
    assert list(single["next_state_features"]) == list(multi["next_state_features"])
    # percentile filtering uses the global distribution in both paths
    s2 = timeline_transform(df, percentile=0.7, shuffle=False)
    m2 = partitioned_timeline_transform(df, num_partitions=4, percentile=0.7, shuffle=False)
    assert len(s2) == len(m2)
