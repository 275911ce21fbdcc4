"""Tests: gradient-free, multi-stage, cfeval, checkpointing, reporting, BC/reward nets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import EvolutionParameters
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.parallel import make_mesh
from reagent_tpu.reporting import DiscreteDQNReporter
from reagent_tpu.training.behavioral_cloning_trainer import BehavioralCloningTrainer
from reagent_tpu.training.cfeval import BanditRewardNetTrainer, BayesByBackpropTrainer
from reagent_tpu.training.cfeval.bayes_by_backprop_trainer import BayesianMLP
from reagent_tpu.training.gradient_free import ARSOptimizer, EsWorker, EvolutionPool
from reagent_tpu.training.multi_stage_trainer import MultiStageTrainer
from reagent_tpu.training.reward_network_trainer import RewardNetTrainer
from reagent_tpu.utils.checkpointing import restore_checkpoint, save_checkpoint


def test_evolution_pool_optimizes_quadratic():
    es = EvolutionParameters(population_size=64, mutation_power=0.3, learning_rate=0.05)
    pool = EvolutionPool(seed=0, es_params=es, tensor_sizes={"w": [3]})
    target = jnp.array([1.0, -2.0, 0.5])

    def reward_fn(ind):
        return -jnp.sum((ind["w"] - target) ** 2)

    for it in range(150):
        rewards = pool.compute_all_local_rewards(reward_fn)
        pool.apply_global_reward(rewards, it + 1)
    final = np.asarray(pool.parent_tensors["w"])
    np.testing.assert_allclose(final, np.asarray(target), atol=0.4)


def test_es_worker_psum_matches_local():
    es = EvolutionParameters(population_size=8, mutation_power=0.3, learning_rate=0.05)
    pool = EvolutionPool(seed=0, es_params=es, tensor_sizes={"w": [2]})
    mesh = make_mesh(8)
    worker = EsWorker(pool, es, mesh)

    def reward_fn(ind):
        return -jnp.sum(ind["w"] ** 2)

    mean_r = worker.run_epoch(reward_fn, 0)
    assert np.isfinite(mean_r)


def test_ars_optimizer():
    opt = ARSOptimizer(feature_dim=2, n_pert=8, alpha=0.5, noise=0.5)
    target = np.array([2.0, -1.0])
    for _ in range(60):
        pairs = opt.sample_perturbed_params()
        rewards = []
        for pos, neg in pairs:
            rewards.append(-np.sum((pos - target) ** 2))
            rewards.append(-np.sum((neg - target) ** 2))
        opt.update_ars_params(np.array(rewards))
    np.testing.assert_allclose(opt.ars_params, target, atol=0.5)


def _bc_batch(B=32, seed=0):
    rng = np.random.default_rng(seed)
    obs = rng.normal(size=(B, 4)).astype(np.float32)
    labels = (obs[:, 0] > 0).astype(int)  # action depends on feature 0
    return rlt.BehavioralCloningModelInput(
        state=rlt.FeatureData(float_features=jnp.asarray(obs)),
        action=jax.nn.one_hot(jnp.asarray(labels), 2),
    )


def test_behavioral_cloning_learns():
    net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = BehavioralCloningTrainer(net, optimizer={"Adam": {"lr": 1e-2}})
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    for i in range(100):
        state, m = trainer.train_step(state, _bc_batch(seed=i % 5))
    assert float(m["accuracy"]) > 0.9


def test_bandit_reward_net_trainer():
    net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = BanditRewardNetTrainer(net, optimizer={"Adam": {"lr": 1e-2}})
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    rng = np.random.default_rng(0)
    B = 64
    actions = rng.integers(0, 2, B)
    batch = rlt.BanditRewardModelInput(
        state=rlt.FeatureData(float_features=jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)),
        action=jax.nn.one_hot(jnp.asarray(actions), 2),
        reward=jnp.asarray(actions.astype(np.float32)),  # reward == action id
        action_prob=jnp.full((B, 1), 0.5),
    )
    losses = []
    for _ in range(150):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.2


def test_bayes_by_backprop():
    net = BayesianMLP(in_dim=6, hidden=16, out_dim=1)
    trainer = BayesByBackpropTrainer(net, optimizer={"Adam": {"lr": 1e-2}})
    rng = np.random.default_rng(0)
    B = 64
    actions = rng.integers(0, 2, B)
    batch = rlt.BanditRewardModelInput(
        state=rlt.FeatureData(float_features=jnp.asarray(rng.normal(size=(B, 4)), jnp.float32)),
        action=jax.nn.one_hot(jnp.asarray(actions), 2),
        reward=jnp.asarray(actions.astype(np.float32)),
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    losses = []
    for _ in range(100):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["nll"]))
    assert losses[-1] < losses[0]
    mean, std = trainer.predict_with_uncertainty(state, jnp.zeros((3, 6)))
    assert mean.shape == (3, 1) and np.all(np.asarray(std) >= 0)


def test_multi_stage_trainer():
    class Stub:
        def __init__(self, name):
            self.name = name

        def init(self):
            return {"n": 0}

        def train_step(self, state, batch):
            return {"n": state["n"] + 1}, {"who": self.name}

    ms = MultiStageTrainer([Stub("a"), Stub("b")], epochs=[2, 3])
    states = ms.init_all()
    assert ms.total_epochs == 5
    for epoch in range(5):
        states, m = ms.train_step(states, None, epoch)
    assert states[0]["n"] == 2 and states[1]["n"] == 3
    assert ms.stage_for_epoch(0) == 0 and ms.stage_for_epoch(2) == 1


def test_checkpoint_roundtrip(tmp_path):
    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.training import DQNTrainer

    q = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[8], activations=["relu"])
    trainer = DQNTrainer(q_network=q, rl=RLParameters(), optimizer={"Adam": {"lr": 1e-3}})
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    zero_state = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, zero_state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_reporter_aggregation():
    r = DiscreteDQNReporter()
    for i in range(5):
        r.log(td_loss=float(i), q_values_mean=1.0)
    out = r.flush(epoch=0)
    assert out["td_loss"] == pytest.approx(2.0)
    assert out["q_values_mean"] == pytest.approx(1.0)
    assert r.flush(epoch=1) == {}  # aggregators reset after flush


def test_gym_utils_normalizers_and_replay_export():
    """build_normalizer + create_df_from_replay_buffer -> timeline chain
    (reference gym/utils.py:93-260)."""
    import jax
    import jax.numpy as jnp

    from reagent_tpu.data.timeline import timeline_transform
    from reagent_tpu.gym.envs import CartPole, Pendulum
    from reagent_tpu.gym.online_loop import prefill_replay_buffer
    from reagent_tpu.gym.utils import build_normalizer, create_df_from_replay_buffer
    from reagent_tpu.replay import ReplayBuffer

    n = build_normalizer(CartPole())
    assert set(n.keys()) == {"state", "action"}
    assert len(n["state"].dense_normalization_parameters) == 4
    assert (
        n["action"].dense_normalization_parameters[0].feature_type
        == "DO_NOT_PREPROCESS"
    )
    n = build_normalizer(Pendulum())
    assert n["action"].dense_normalization_parameters[0].feature_type == "CONTINUOUS"

    env = CartPole(max_steps=50)
    rb = ReplayBuffer(replay_capacity=1024, update_horizon=1, gamma=0.99)
    rbs = rb.init(
        observation=jnp.zeros(4), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rbs = prefill_replay_buffer(env, rb, rbs, jax.random.PRNGKey(0), num_steps=300)
    df = create_df_from_replay_buffer(rb, rbs)
    assert len(df) == 299 and df.mdp_id.nunique() > 3
    tdf = timeline_transform(df)
    assert "next_state_features" in tdf.columns and len(tdf) == len(df)


def test_workflow_train_eval_helper():
    """Generic epoch driver (reference workflow/utils.py:135-177)."""
    import jax
    import jax.numpy as jnp

    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.gym.preprocessors import make_discrete_dqn_batch
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.training import DQNTrainer
    from reagent_tpu.workflow.utils import get_rank, train_eval

    assert get_rank() == 0
    q = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    trainer = DQNTrainer(
        q_network=q, rl=RLParameters(gamma=0.9, target_update_rate=0.1),
        optimizer={"Adam": {"lr": 0.01}},
    )
    ts = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    rng = jax.random.PRNGKey(1)

    def batches():
        for i in range(4):
            r = jax.random.fold_in(rng, i)
            yield make_discrete_dqn_batch(
                {
                    "state": jax.random.normal(r, (32, 4)),
                    "action": jax.random.randint(r, (32,), 0, 2),
                    "next_action": jax.random.randint(r, (32,), 0, 2),
                    "reward": jnp.ones((32,)),
                    "next_state": jax.random.normal(r, (32, 4)),
                    "terminal": jnp.zeros((32,), bool),
                    "step": jnp.ones((32,), jnp.int32),
                },
                2,
            )

    ts, metrics = train_eval(trainer, ts, batches, num_epochs=2)
    assert "td_loss" in metrics


def test_manual_data_module_lifecycle(tmp_path):
    """prepare_data -> normalization + hash split -> typed batch iterators
    (reference data/manual_data_module.py:85-250)."""
    import numpy as np

    from reagent_tpu.data.data_module import ManualDataModule, TableSpec
    from reagent_tpu.data.timeline import timeline_transform
    from reagent_tpu.model_managers import DiscreteDQN
    from reagent_tpu.workflow.gym_batch_rl import offline_gym_random

    pkl = str(tmp_path / "pre.pkl")
    offline_gym_random(env_name="CartPole-v1", pkl_path=pkl,
                       num_train_transitions=600, max_steps=100, seed=4)
    import pandas as pd

    timeline_transform(pd.read_pickle(pkl)).to_pickle(str(tmp_path / "t.pkl"))
    spec = TableSpec(table_name="t", path=str(tmp_path / "t.pkl"),
                     table_sample=80.0, eval_table_sample=20.0)
    manager = DiscreteDQN(trainer_param={"actions": ["0", "1"]})
    dm = ManualDataModule(input_table_spec=spec, model_manager=manager)
    dm.prepare_data()
    norm = dm.get_normalization_data_map()
    assert "state" in norm
    batches = list(dm.train_dataset(batch_size=128))
    assert batches and batches[0].state.float_features.shape[1] == 4
    eval_batches = list(dm.eval_dataset(batch_size=128))
    assert eval_batches  # eval split non-empty with 20% sample
    # train/eval mdp split is disjoint
    assert set(dm._train_df.mdp_id) & set(dm._eval_df.mdp_id) == set()
    # prepare_data is idempotent
    dm.prepare_data()


def test_lr_schedulers_compose_with_optimizers():
    """Scheduler tagged-union over optax (reference optimizer/scheduler_union.py)."""
    import jax.numpy as jnp

    from reagent_tpu.optim import make_optimizer
    from reagent_tpu.optim.scheduler import LR_SCHEDULERS, CosineAnnealingLR, StepLR

    assert {"StepLR", "MultiStepLR", "ExponentialLR", "LinearLR",
            "CosineAnnealingLR", "OneCycleLR"} <= set(LR_SCHEDULERS.members())
    s = StepLR(step_size=10, gamma=0.5).make_schedule()
    assert float(s(0)) == 1.0 and float(s(10)) == 0.5
    assert abs(float(CosineAnnealingLR(T_max=100).make_schedule()(100))) < 1e-6

    opt = make_optimizer(
        {"SGD": {"lr": 1.0, "lr_scheduler": {"ExponentialLR": {"gamma": 0.5}}}}
    )
    p = jnp.array(1.0)
    state = opt.init(p)
    lrs = []
    for _ in range(3):
        u, state = opt.update(jnp.array(1.0), state, p)
        lrs.append(float(-u))
    assert lrs == [1.0, 0.5, 0.25]


def test_postprocessor_and_topk_sampler():
    import jax.numpy as jnp
    import numpy as np

    from reagent_tpu.core.parameters import NormalizationParameters
    from reagent_tpu.gym.policies import TopKSampler
    from reagent_tpu.preprocessing.postprocessor import Postprocessor

    post = Postprocessor({
        0: NormalizationParameters(
            feature_type="CONTINUOUS_ACTION", mean=0.0, stddev=1.0,
            min_value=-2.0, max_value=2.0,
        )
    })
    a = post(jnp.array([[-1.0], [0.0], [1.0]]))
    np.testing.assert_allclose(np.asarray(a).ravel(), [-2.0, 0.0, 2.0], atol=1e-2)
    # identity for DO_NOT_PREPROCESS
    post = Postprocessor({
        0: NormalizationParameters(feature_type="DO_NOT_PREPROCESS", mean=0.0, stddev=1.0)
    })
    np.testing.assert_allclose(np.asarray(post(jnp.array([[3.0]]))), [[3.0]])

    out = TopKSampler(2).sample_action(jnp.array([[0.1, 0.9, 0.5]]))
    assert np.asarray(out.action).tolist() == [[1, 2]]


def test_gym_dataset_adapters():
    """Host-loop ReplayBufferDataset/EpisodicDataset (reference gym/datasets/)."""
    import jax
    import jax.numpy as jnp

    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.gym.datasets import EpisodicDataset, ReplayBufferDataset
    from reagent_tpu.gym.envs import CartPole
    from reagent_tpu.gym.policies.samplers import SoftmaxActionSampler
    from reagent_tpu.gym.preprocessors import make_discrete_dqn_batch
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.replay import ReplayBuffer
    from reagent_tpu.training import DQNTrainer

    env = CartPole(max_steps=30)
    q = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    params = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    rb = ReplayBuffer(replay_capacity=512, update_horizon=1, gamma=0.99)
    rbs = rb.init(
        observation=jnp.zeros(4), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    ds = ReplayBufferDataset(
        env, lambda p, o, r: jnp.argmax(q.apply(p, o[None])[0]).astype(jnp.int32),
        params, rb, rbs, lambda d: make_discrete_dqn_batch(d, 2),
        training_frequency=2, num_episodes=2, batch_size=16,
    )
    trainer = DQNTrainer(
        q_network=q, rl=RLParameters(gamma=0.9, target_update_rate=0.1),
        optimizer={"Adam": {"lr": 0.01}},
    )
    ts = trainer.init(jax.random.PRNGKey(1), jnp.zeros((1, 4)))
    batches = 0
    for batch in ds:
        ts, m = trainer.train_step(ts, batch)
        batches += 1
    assert batches >= 5 and float(m["td_loss"]) >= 0

    eds = EpisodicDataset(
        env, lambda p, o: q.apply(p, o), params,
        SoftmaxActionSampler(temperature=1.0), num_episodes=2, max_steps=30,
    )
    eps = list(eds)
    assert len(eps) == len(eds) == 2
    episode, ep_return = eps[0]
    assert float(ep_return) > 0


def test_mlp_scorer_ranking_state():
    import jax
    import jax.numpy as jnp

    from reagent_tpu.core import types as rlt
    from reagent_tpu.models.mlp_scorer import MLPScorer

    obs = rlt.FeatureData(
        float_features=jnp.zeros((2, 5)),
        candidate_docs=rlt.DocList(float_features=jnp.ones((2, 3, 4))),
    )
    m = MLPScorer(input_dim=4, sizes=[8], activations=["relu"])
    p = m.init(jax.random.PRNGKey(0), obs)
    assert m.apply(p, obs).shape == (2, 3)
    # user-feat variant scores the concat vector
    m2 = MLPScorer(input_dim=5 + 3 * 4, sizes=[8], activations=["relu"], has_user_feat=True)
    p2 = m2.init(jax.random.PRNGKey(0), obs)
    assert m2.apply(p2, obs).shape == (2,)


def test_bayesian_hparam_search_finds_optimum():
    """GP-EI search localizes the max of a smooth 1-D objective far better
    than its random-init phase alone (reference hparam_tuning.py:20 Ax flow)."""
    from reagent_tpu.scripts.hparam_tuning import bayesian_search

    calls = []

    def eval_fn(p):
        x = p["x"]
        calls.append(x)
        return {"score": -((x - 0.7) ** 2)}

    space = [{"name": "x", "type": "range", "bounds": [0.0, 1.0]}]
    best, metrics = bayesian_search(
        space, eval_fn, objective="score", num_iterations=18,
        num_random_init=4, num_seeds=1, num_proc=1, seed=3,
    )
    assert abs(best["x"] - 0.7) < 0.12, (best, metrics)
    assert metrics["score"][0] > -0.02


def test_bayesian_hparam_search_choice_params():
    from reagent_tpu.scripts.hparam_tuning import bayesian_search

    def eval_fn(p):
        return {"loss": {16: 3.0, 32: 1.0, 64: 2.0}[p["width"]] + p["lr"]}

    space = [
        {"name": "width", "type": "choice", "values": [16, 32, 64]},
        {"name": "lr", "type": "range", "bounds": [0.0, 1.0]},
    ]
    best, _ = bayesian_search(
        space, eval_fn, objective="loss", minimize=True,
        num_iterations=15, num_random_init=5, num_seeds=1, num_proc=1, seed=0,
    )
    assert best["width"] == 32
    assert best["lr"] < 0.4
