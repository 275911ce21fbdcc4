"""Offline workflow with CRR and parametric-DQN managers (BASELINE configs:
'Offline batch workflow: parametric DQN + CRR on logged timeline data')."""

import numpy as np
import pytest

from reagent_tpu.data.data_module import TableSpec
from reagent_tpu.workflow.gym_batch_rl import (
    evaluate_gym,
    offline_gym_random,
    timeline_operator,
)
from reagent_tpu.workflow.training import identify_and_train_network


@pytest.fixture(scope="module")
def cartpole_table(tmp_path_factory):
    d = tmp_path_factory.mktemp("crr_data")
    pkl = str(d / "pre.pkl")
    table = str(d / "table.pkl")
    offline_gym_random(
        env_name="CartPole-v1", pkl_path=pkl,
        num_train_transitions=10000, max_steps=200, seed=3,
    )
    spec = TableSpec(table_name="cp", path=table, table_sample=95.0, eval_table_sample=5.0)
    timeline_operator(pkl, spec)
    return spec


@pytest.mark.slow
def test_crr_offline_e2e(cartpole_table, tmp_path):
    model_config = {
        "DiscreteCRR": {
            "trainer_param": {
                "actions": ["0", "1"],
                "rl": {"gamma": 0.99, "target_update_rate": 0.1},
                "optimizer": {"Adam": {"lr": 0.003}},
                "beta": 1.0,
            },
            "net_builder": {"FullyConnected": {"sizes": [64, 64], "activations": ["relu", "relu"]}},
            "actor_net_builder": {"FullyConnected": {"sizes": [64, 64], "activations": ["relu", "relu"]}},
        }
    }
    result = identify_and_train_network(
        input_table_spec=cartpole_table, model=model_config, num_epochs=20,
        output_dir=str(tmp_path / "crr_out"),
    )
    # CRR serving = the actor; greedy eval against the reference bar 100
    mean_reward = evaluate_gym(
        env_name="CartPole-v1",
        model_path=result.output_paths["default_model"],
        num_eval_episodes=20,
        passing_score_bar=100.0,
        max_steps=200,
    )
    print(f"CRR offline eval: {mean_reward}")


@pytest.mark.slow
def test_parametric_dqn_offline_trains(cartpole_table, tmp_path):
    model_config = {
        "ParametricDQN": {
            "trainer_param": {
                "actions": ["0", "1"],
                "rl": {"gamma": 0.99, "target_update_rate": 0.1},
                "optimizer": {"Adam": {"lr": 0.003}},
            },
            "net_builder": {"FullyConnected": {"sizes": [64, 64], "activations": ["relu", "relu"]}},
        }
    }
    result = identify_and_train_network(
        input_table_spec=cartpole_table, model=model_config, num_epochs=10,
        output_dir=str(tmp_path / "pdqn_out"),
    )
    assert result.training_report.td_loss is not None
    assert np.isfinite(result.training_report.td_loss)
