"""All registered model managers construct their trainers; distributional DQN
managers run the offline pipeline end-to-end.

Reference: reagent/model_managers/* (union registry) + workflow/training.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core.registry import MODEL_MANAGERS
import reagent_tpu.model_managers  # noqa: F401 — registration
from reagent_tpu.data.data_module import TableSpec
from reagent_tpu.workflow.gym_batch_rl import offline_gym_random, timeline_operator
from reagent_tpu.workflow.training import identify_and_train_network


def test_all_reference_managers_registered():
    expected = {
        "DiscreteDQN", "DiscreteCRR", "DiscreteC51DQN", "DiscreteQRDQN",
        "ParametricDQN", "SAC", "TD3", "PPO", "Reinforce", "SlateQ",
        "WorldModel", "Seq2RewardModel", "CrossEntropyMethod", "SyntheticReward",
    }
    assert expected <= set(MODEL_MANAGERS.members())


@pytest.fixture(scope="module")
def cartpole_table(tmp_path_factory):
    d = tmp_path_factory.mktemp("mm_data")
    pkl = str(d / "pre.pkl")
    table = str(d / "table.pkl")
    offline_gym_random(
        env_name="CartPole-v1", pkl_path=pkl,
        num_train_transitions=3000, max_steps=200, seed=11,
    )
    spec = TableSpec(table_name="cp", path=table, table_sample=95.0, eval_table_sample=5.0)
    timeline_operator(pkl, spec)
    return spec


@pytest.mark.slow
def test_qrdqn_manager_offline_e2e(cartpole_table, tmp_path):
    result = identify_and_train_network(
        input_table_spec=cartpole_table,
        model={
            "DiscreteQRDQN": {
                "trainer_param": {
                    "actions": ["0", "1"],
                    "rl": {"gamma": 0.9, "target_update_rate": 0.05},
                    "optimizer": {"AdamW": {"lr": 0.001, "amsgrad": True}},
                    "minibatch_size": 512,
                },
                "net_builder": {
                    "QuantileFullyConnected": {
                        "sizes": [64, 64], "activations": ["relu", "relu"], "num_atoms": 11
                    }
                },
            }
        },
        num_epochs=2,
        output_dir=str(tmp_path / "qr_out"),
    )
    assert np.isfinite(result.training_report.td_loss)
    # quantile artifact round-trips and scores
    from reagent_tpu.prediction.predictor_wrapper import CategoricalDqnPredictorWrapper

    path = result.output_paths["default_model"]
    assert path
    fwd = CategoricalDqnPredictorWrapper.load(path)
    names, q = fwd(np.zeros((1, 4), np.float32), np.ones((1, 4), bool))
    assert names == ["0", "1"] and q.shape == (1, 2) and np.isfinite(q).all()


@pytest.mark.slow
def test_c51_manager_offline_e2e(cartpole_table, tmp_path):
    result = identify_and_train_network(
        input_table_spec=cartpole_table,
        model={
            "DiscreteC51DQN": {
                "trainer_param": {
                    "actions": ["0", "1"],
                    "rl": {"gamma": 0.99, "target_update_rate": 0.1},
                    "optimizer": {"Adam": {"lr": 0.002}},
                    "minibatch_size": 512,
                },
                "net_builder": {
                    "Categorical": {"sizes": [64, 64], "activations": ["relu", "relu"],
                                    "num_atoms": 21, "qmin": 0.0, "qmax": 200.0}
                },
            }
        },
        num_epochs=2,
        output_dir=str(tmp_path / "c51_out"),
    )
    assert np.isfinite(result.training_report.td_loss)


def test_pg_world_model_managers_construct_and_step():
    rng = jax.random.PRNGKey(0)
    # Reinforce / PPO
    for name in ("Reinforce", "PPO"):
        mgr = MODEL_MANAGERS.build({name: {
            "trainer_param": {"actions": ["0", "1"], "gamma": 0.99,
                              "optimizer": {"Adam": {"lr": 0.001}}},
            "policy_net_builder": {"FullyConnected": {"sizes": [32], "activations": ["relu"]}},
        }})
        trainer = mgr.build_trainer(state_dim=4)
        ts = trainer.init(rng, jnp.zeros((1, 4)))
        policy = mgr.create_policy(trainer)
        out = policy.act(ts.policy_params, jnp.zeros((1, 4)), rng)
        assert out.action.shape[-1] == 2

    # WorldModel
    from reagent_tpu.core import types as rlt

    wm = MODEL_MANAGERS.build({"WorldModel": {
        "trainer_param": {"hidden_size": 16, "num_gaussians": 3}}})
    trainer = wm.build_trainer(state_dim=4, action_dim=2)
    proto = rlt.MemoryNetworkInput(
        state=rlt.FeatureData(float_features=jnp.zeros((6, 2, 4))),
        action=rlt.FeatureData(float_features=jnp.zeros((6, 2, 2))),
        next_state=rlt.FeatureData(float_features=jnp.zeros((6, 2, 4))),
        reward=jnp.zeros((6, 2)),
        not_terminal=jnp.ones((6, 2)),
        time_diff=None, step=None,
    )
    ts = trainer.init(rng, proto)
    ts, metrics = trainer.train_step(ts, proto)
    assert np.isfinite(float(metrics["loss"]))

    # SlateQ
    sq = MODEL_MANAGERS.build({"SlateQ": {
        "slate_size": 3,
        "trainer_param": {"rl": {"gamma": 0.9, "target_update_rate": 0.1},
                          "optimizer": {"Adam": {"lr": 0.001}}},
    }})
    trainer = sq.build_trainer(state_dim=5, candidate_dim=4)
    ts = trainer.init(rng, jnp.zeros((1, 5)), jnp.zeros((1, 4)))

    # SyntheticReward
    sr = MODEL_MANAGERS.build({"SyntheticReward": {
        "trainer_param": {"optimizer": {"Adam": {"lr": 0.001}}}}})
    trainer = sr.build_trainer(state_dim=4, action_dim=2)

    # CrossEntropyMethod
    cem = MODEL_MANAGERS.build({"CrossEntropyMethod": {
        "trainer_param": {
            "plan_horizon_length": 3, "num_world_models": 2,
            "cem_population_size": 10, "cem_num_iterations": 2,
            "ensemble_population_size": 5, "num_elites": 2,
            "mdnrnn": {"hidden_size": 8, "num_gaussians": 2},
        }}})
    trainer = cem.build_trainer(state_dim=4, action_dim=2)
    assert len(trainer.world_model_trainers) == 2

    # Seq2Reward
    s2r = MODEL_MANAGERS.build({"Seq2RewardModel": {
        "trainer_param": {"action_names": ("0", "1"), "multi_steps": 2},
        "net_builder": {"num_hiddens": 16, "num_hidden_layers": 1},
    }})
    trainer = s2r.build_trainer(state_dim=4)
    assert trainer.seq2reward_network.action_dim == 2


@pytest.mark.slow
def test_discrete_dqn_fused_kernel_offline_e2e(cartpole_table, tmp_path):
    """use_fused_kernel: the whole DQN update runs as one Pallas kernel
    inside the standard offline workflow, and the serving export scores."""
    result = identify_and_train_network(
        input_table_spec=cartpole_table,
        model={
            "DiscreteDQN": {
                "trainer_param": {
                    "actions": ["0", "1"],
                    "rl": {"gamma": 0.9, "target_update_rate": 0.05},
                    "optimizer": {"Adam": {"lr": 0.001}},
                    "minibatch_size": 512,
                    "use_fused_kernel": True,
                },
                "net_builder": {
                    "FullyConnected": {
                        "sizes": [64, 32], "activations": ["relu", "relu"]
                    }
                },
                "eval_parameters": {"calc_cpe_in_training": False},
            }
        },
        num_epochs=2,
        output_dir=str(tmp_path / "fused_out"),
    )
    assert np.isfinite(result.training_report.td_loss)
    # exported artifact loads and scores
    from reagent_tpu.prediction.predictor_wrapper import load_predictor

    predictor = load_predictor(result.output_paths["default_model"])
    names, scores = predictor.predict({i: 0.1 * i for i in range(4)})
    scores = np.asarray(scores).reshape(-1)
    assert list(names) == ["0", "1"]
    assert scores.shape[-1] == 2 and np.isfinite(scores).all()
