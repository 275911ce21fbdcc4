"""Offline workflow with SAC/TD3 managers on continuous-action logged data.

Reference flow: reagent/workflow/training.py driven by the
model_managers/actor_critic managers (sac.py, td3.py) — identify state AND
action normalization, train from PolicyNetworkInput minibatches, export the
actor as the serving artifact.
"""

import numpy as np
import pytest

from reagent_tpu.data.data_module import TableSpec
from reagent_tpu.workflow.gym_batch_rl import offline_gym_random, timeline_operator
from reagent_tpu.workflow.training import identify_and_train_network


@pytest.fixture(scope="module")
def pendulum_table(tmp_path_factory):
    d = tmp_path_factory.mktemp("sac_data")
    pkl = str(d / "pre.pkl")
    table = str(d / "table.pkl")
    offline_gym_random(
        env_name="Pendulum-v1", pkl_path=pkl,
        num_train_transitions=2000, max_steps=200, seed=5,
    )
    spec = TableSpec(table_name="pd", path=table, table_sample=95.0, eval_table_sample=5.0)
    timeline_operator(pkl, spec)
    return spec


@pytest.mark.slow
def test_sac_offline_trains(pendulum_table, tmp_path):
    model_config = {
        "SAC": {
            "trainer_param": {
                "rl": {"gamma": 0.99, "target_update_rate": 0.05},
                "q_network_optimizer": {"Adam": {"lr": 0.001}},
                "actor_network_optimizer": {"Adam": {"lr": 0.001}},
                "minibatch_size": 256,
            },
            "actor_net_builder": {
                "GaussianFullyConnected": {"sizes": [64, 64], "activations": ["relu", "relu"]}
            },
            "critic_net_builder": {
                "FullyConnected": {"sizes": [64, 64], "activations": ["relu", "relu"]}
            },
        }
    }
    result = identify_and_train_network(
        input_table_spec=pendulum_table, model=model_config, num_epochs=2,
        output_dir=str(tmp_path / "sac_out"),
    )
    assert result.training_report.td_loss is not None
    assert np.isfinite(result.training_report.td_loss)
    # serving artifact: actor forward on raw sparse features
    model_path = result.output_paths["default_model"]
    assert model_path
    from reagent_tpu.prediction.predictor_wrapper import load_predictor

    predictor = load_predictor(model_path)
    act = predictor.predict({i: 0.1 for i in range(3)})
    act = np.asarray(act).reshape(-1)
    assert act.shape[-1] == 1 and np.isfinite(act).all()


@pytest.mark.slow
def test_td3_offline_trains(pendulum_table, tmp_path):
    model_config = {
        "TD3": {
            "trainer_param": {
                "rl": {"gamma": 0.99, "target_update_rate": 0.05},
                "q_network_optimizer": {"Adam": {"lr": 0.001}},
                "actor_network_optimizer": {"Adam": {"lr": 0.001}},
                "minibatch_size": 256,
            },
            "actor_net_builder": {
                "FullyConnected": {"sizes": [64, 64], "activations": ["relu", "relu"]}
            },
            "critic_net_builder": {
                "FullyConnected": {"sizes": [64, 64], "activations": ["relu", "relu"]}
            },
        }
    }
    result = identify_and_train_network(
        input_table_spec=pendulum_table, model=model_config, num_epochs=2,
        output_dir=str(tmp_path / "td3_out"),
    )
    assert result.training_report.td_loss is not None
    assert np.isfinite(result.training_report.td_loss)


@pytest.mark.slow
def test_sac_pendulum_offline_cli_pipeline(tmp_path):
    """The reference's sac_pendulum_e2e CI job: 4 CLI commands driven by
    sample_configs/sac_pendulum_offline.yaml (.circleci/config.yml:79-128)."""
    import json

    from click.testing import CliRunner

    from reagent_tpu.workflow.cli import reagent

    cfg = "reagent_tpu/workflow/sample_configs/sac_pendulum_offline.yaml"
    table = str(tmp_path / "table.pkl")
    overrides = {
        "pkl_path": str(tmp_path / "pre.pkl"),
        "input_table_spec": {
            "table_name": "pendulum_offline", "path": table,
            "table_sample": 95.0, "eval_table_sample": 5.0,
        },
        "num_train_transitions": 3000,
        "max_steps": 200,
        "num_epochs": 2,
        "num_eval_episodes": 2,
        "passing_score_bar": -100000.0,
        "output_dir": str(tmp_path / "model"),
        "model_path": str(tmp_path / "model" / "serving_model"),
    }
    runner = CliRunner()
    for entry in (
        "reagent_tpu.workflow.gym_batch_rl.offline_gym_random",
        "reagent_tpu.workflow.gym_batch_rl.timeline_operator",
        "reagent_tpu.workflow.training.identify_and_train_network",
        "reagent_tpu.workflow.gym_batch_rl.evaluate_gym",
    ):
        result = runner.invoke(
            reagent,
            ["run", entry, cfg, "--extra-options", json.dumps(overrides)],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, (entry, result.output)
    # the artifact produces env-unit actions (pendulum torque range [-2, 2])
    from reagent_tpu.prediction.predictor_wrapper import load_predictor

    predictor = load_predictor(overrides["model_path"])
    assert predictor.model_type == "actor"
    act = np.asarray(predictor.predict({0: 0.5, 1: -0.5, 2: 0.1})).reshape(-1)
    assert act.shape == (1,) and np.isfinite(act).all()
    assert -2.0 <= float(act[0]) <= 2.0
