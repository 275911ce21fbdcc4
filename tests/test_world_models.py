"""World-model tests: MDN-RNN, Seq2Reward, CEM planner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import MDNRNNTrainerParameters, Seq2RewardTrainerParameters
from reagent_tpu.models.cem_planner import CEMPlannerNetwork
from reagent_tpu.models.dqn import FullyConnectedDQN
from reagent_tpu.models.mdn_rnn import MemoryNetwork, gmm_loss
from reagent_tpu.models.seq2reward_model import Seq2RewardNetwork, gen_permutations, get_Q
from reagent_tpu.training.cem_trainer import CEMTrainer
from reagent_tpu.training.world_model import (
    CompressModelTrainer,
    MDNRNNTrainer,
    Seq2RewardTrainer,
)

T, B, S, A = 6, 8, 3, 2


def _mn_batch(seed=0, valid=True):
    rng = np.random.default_rng(seed)
    mk = lambda shape: jnp.asarray(rng.normal(size=shape), jnp.float32)
    return rlt.MemoryNetworkInput(
        state=rlt.FeatureData(float_features=mk((T, B, S))),
        next_state=rlt.FeatureData(float_features=mk((T, B, S))),
        action=rlt.FeatureData(float_features=jax.nn.one_hot(jnp.asarray(rng.integers(0, A, (T, B))), A)),
        reward=mk((T, B)),
        time_diff=jnp.ones((T, B)),
        step=None,
        not_terminal=jnp.ones((T, B)),
        valid_step=jnp.full((B, 1), T, jnp.int32) if valid else None,
    )


def test_gmm_loss_analytic():
    # single gaussian, mu=0 sigma=1: -log N(0) = 0.5*log(2pi) per dim
    batch = jnp.zeros((1, 1, 2))
    mus = jnp.zeros((1, 1, 1, 2))
    sigmas = jnp.ones((1, 1, 1, 2))
    logpi = jnp.zeros((1, 1, 1))
    loss = float(gmm_loss(batch, mus, sigmas, logpi))
    assert loss == pytest.approx(0.5 * np.log(2 * np.pi) * 2, rel=1e-5)


def test_mdnrnn_trainer_loss_decreases():
    net = MemoryNetwork(state_dim=S, action_dim=A, num_hiddens=16, num_hidden_layers=1, num_gaussians=2)
    trainer = MDNRNNTrainer(net, MDNRNNTrainerParameters(learning_rate=3e-3))
    batch = _mn_batch()
    state = trainer.init(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(60):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # output shapes
    out = net.apply(state.params, batch.state, batch.action)
    assert out.mus.shape == (T, B, 2, S)
    assert out.reward.shape == (T, B)


def test_seq2reward_trainer_fits_acc_reward():
    net = Seq2RewardNetwork(state_dim=S, action_dim=A, num_hiddens=16, num_hidden_layers=1)
    trainer = Seq2RewardTrainer(
        net, Seq2RewardTrainerParameters(learning_rate=1e-2, multi_steps=T, gamma=1.0)
    )
    batch = _mn_batch()
    state = trainer.init(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(150):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["mse_loss"]))
    assert losses[-1] < losses[0] * 0.5
    assert np.isfinite(float(m["step_entropy_loss"]))


def test_gen_permutations_and_get_q():
    perms = gen_permutations(seq_len=2, num_action=2)
    assert perms.shape == (2, 4, 2)
    # lexical order: [0,0], [0,1], [1,0], [1,1]
    np.testing.assert_array_equal(np.asarray(jnp.argmax(perms, -1)).T, [[0, 0], [0, 1], [1, 0], [1, 1]])

    net = Seq2RewardNetwork(state_dim=S, action_dim=A, num_hiddens=8, num_hidden_layers=1)
    state = jnp.zeros((3, S))
    params = net.init(
        jax.random.PRNGKey(0),
        rlt.FeatureData(float_features=jnp.zeros((2, 1, S))),
        rlt.FeatureData(float_features=jnp.zeros((2, 1, A))),
    )
    q = get_Q(net, params, state, perms)
    assert q.shape == (3, A)


def test_compress_model_trainer():
    s2r = Seq2RewardNetwork(state_dim=S, action_dim=A, num_hiddens=8, num_hidden_layers=1)
    batch = _mn_batch()
    s2r_params = s2r.init(jax.random.PRNGKey(0), batch.state, batch.action)
    compress_net = FullyConnectedDQN(state_dim=S, action_dim=A, sizes=[16], activations=["relu"])
    trainer = CompressModelTrainer(
        compress_net, s2r,
        Seq2RewardTrainerParameters(compress_model_learning_rate=1e-2, multi_steps=3),
    )
    state = trainer.init(jax.random.PRNGKey(1), jnp.zeros((1, S)))
    losses = []
    for _ in range(80):
        state, m = trainer.train_step(state, batch, seq2reward_params=s2r_params)
        losses.append(float(m["mse_loss"]))
    assert losses[-1] < losses[0] * 0.5


def test_cem_planner_discrete():
    net = MemoryNetwork(state_dim=S, action_dim=A, num_hiddens=8, num_hidden_layers=1, num_gaussians=1)
    proto_s = rlt.FeatureData(float_features=jnp.zeros((1, 1, S)))
    proto_a = rlt.FeatureData(float_features=jnp.zeros((1, 1, A)))
    params_list = [
        net.init(jax.random.PRNGKey(i), proto_s, proto_a) for i in range(2)
    ]
    planner = CEMPlannerNetwork(
        mem_net=net, mem_net_params_list=params_list,
        cem_num_iterations=2, cem_population_size=16, ensemble_population_size=2,
        num_elites=4, plan_horizon_length=3, state_dim=S, action_dim=A,
        discrete_action=True, terminal_effective=False, gamma=0.99,
    )
    best, onehot = planner(
        rlt.FeatureData(float_features=jnp.zeros((1, S))), jax.random.PRNGKey(0)
    )
    assert 0 <= best < A
    assert float(onehot[best]) == 1.0


def test_cem_planner_continuous():
    net = MemoryNetwork(state_dim=S, action_dim=1, num_hiddens=8, num_hidden_layers=1, num_gaussians=1)
    proto_s = rlt.FeatureData(float_features=jnp.zeros((1, 1, S)))
    proto_a = rlt.FeatureData(float_features=jnp.zeros((1, 1, 1)))
    params_list = [net.init(jax.random.PRNGKey(0), proto_s, proto_a)]
    planner = CEMPlannerNetwork(
        mem_net=net, mem_net_params_list=params_list,
        cem_num_iterations=2, cem_population_size=16, ensemble_population_size=1,
        num_elites=4, plan_horizon_length=2, state_dim=S, action_dim=1,
        discrete_action=False, terminal_effective=True, gamma=0.99,
        action_upper_bounds=np.array([2.0]), action_lower_bounds=np.array([-2.0]),
    )
    action = planner(
        rlt.FeatureData(float_features=jnp.zeros((1, S))), jax.random.PRNGKey(0)
    )
    assert action.shape == (1,)
    assert -1.0 <= float(action[0]) <= 1.0  # rescaled to training range


def test_cem_trainer_ensemble():
    net = MemoryNetwork(state_dim=S, action_dim=A, num_hiddens=8, num_hidden_layers=1, num_gaussians=1)
    trainers = [MDNRNNTrainer(net, MDNRNNTrainerParameters(learning_rate=1e-3)) for _ in range(2)]
    cem = CEMTrainer(None, trainers)
    batch = _mn_batch()
    states = cem.init(jax.random.PRNGKey(0), batch)
    states, metrics = cem.train_step(states, batch)
    assert "wm0_loss" in metrics and "wm1_loss" in metrics


def test_world_model_evaluators():
    """Loss / feature-importance / action-sensitivity debug evaluators
    (reference evaluation/world_model_evaluator.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reagent_tpu.core import types as rlt
    from reagent_tpu.core.parameters import MDNRNNTrainerParameters
    from reagent_tpu.evaluation.world_model_evaluator import (
        FeatureImportanceEvaluator,
        FeatureSensitivityEvaluator,
        LossEvaluator,
    )
    from reagent_tpu.models.mdn_rnn import MemoryNetwork
    from reagent_tpu.training.world_model.mdnrnn_trainer import MDNRNNTrainer

    T, B, S, A = 6, 8, 3, 2
    rng = jax.random.PRNGKey(0)
    mn = MemoryNetwork(state_dim=S, action_dim=A, num_hiddens=16,
                       num_hidden_layers=1, num_gaussians=2)
    trainer = MDNRNNTrainer(mn, MDNRNNTrainerParameters(hidden_size=16, num_gaussians=2))
    # next_state strongly depends on action feature 0; state feature 2 is noise
    r1, r2, r3 = jax.random.split(rng, 3)
    state = jax.random.normal(r1, (T, B, S))
    action = jax.random.normal(r2, (T, B, A))
    next_state = state * 0.5 + jnp.concatenate(
        [action[..., :1]] * S, axis=-1
    ) * 2.0 + 0.01 * jax.random.normal(r3, (T, B, S))
    batch = rlt.MemoryNetworkInput(
        state=rlt.FeatureData(float_features=state),
        action=rlt.FeatureData(float_features=action),
        next_state=rlt.FeatureData(float_features=next_state),
        reward=jnp.zeros((T, B)),
        not_terminal=jnp.ones((T, B)),
        time_diff=None, step=None,
    )
    ts = trainer.init(rng, batch)
    for _ in range(200):
        ts, _ = trainer.train_step(ts, batch)

    loss_ev = LossEvaluator(trainer, S)
    losses = loss_ev.evaluate(ts.params, batch)
    assert np.isfinite(losses["loss"])

    fi = FeatureImportanceEvaluator(
        trainer, discrete_action=False, state_feature_num=S, action_feature_num=A,
        sorted_action_feature_start_indices=[0, 1],
        sorted_state_feature_start_indices=[0, 1, 2],
    )
    imp = fi.evaluate(ts.params, batch)["feature_loss_increase"]
    assert imp.shape == (A + S,)
    # action feature 0 (drives next_state) must matter more than action feature 1
    assert imp[0] > imp[1], imp

    fs = FeatureSensitivityEvaluator(
        trainer, state_feature_num=S, sorted_state_feature_start_indices=[0, 1, 2]
    )
    sens = fs.evaluate(ts.params, batch)["feature_sensitivity"]
    assert sens.shape == (S,) and (sens > 0).all()


@pytest.mark.slow
@pytest.mark.parametrize("num_world_models", [1, 2])
def test_cem_linear_dynamics_offline_e2e(num_world_models):
    """CEM planning on LinDyna beats the -2.5 bar
    (cem_single_world_model_linear_dynamics_offline.yaml and, with
    num_world_models=2, cem_many_world_models_linear_dynamics_offline.yaml —
    each solution trajectory is simulated by a randomly drawn ensemble
    member, reference cem_planner.py:136)."""
    import numpy as np

    from reagent_tpu.gym.envs import LinDyna
    from reagent_tpu.models.cem_planner import CEMPlannerNetwork

    env = LinDyna()
    S_, A_ = env.observation_dim, env.action_dim
    rng = jax.random.PRNGKey(0)

    # offline corpus: random rollouts as [T, B, ·] sequences
    def rollout(r):
        st, obs = env.reset(r)
        def step(carry, rr):
            st, obs = carry
            u = jax.random.uniform(rr, (A_,), minval=-1.0, maxval=1.0)
            nst, nobs, rew, done = env.step(st, u, rr)
            return (nst, nobs), (obs, u, nobs, rew, 1.0 - done)
        _, seq = jax.lax.scan(step, (st, obs), jax.random.split(r, env.max_steps))
        return seq

    obs, act, nobs, rew, nt = jax.vmap(rollout, out_axes=1)(jax.random.split(rng, 512))
    batch = rlt.MemoryNetworkInput(
        state=rlt.FeatureData(float_features=obs),
        action=rlt.FeatureData(float_features=act),
        next_state=rlt.FeatureData(float_features=nobs),
        reward=rew, not_terminal=nt, time_diff=None, step=None,
    )
    mn = MemoryNetwork(state_dim=S_, action_dim=A_, num_hiddens=100,
                       num_hidden_layers=2, num_gaussians=1)
    trainer = MDNRNNTrainer(mn, MDNRNNTrainerParameters(
        hidden_size=100, num_hidden_layers=2, num_gaussians=1,
        learning_rate=1e-3, not_terminal_loss_weight=0.0))
    params_list = []
    for wm in range(num_world_models):
        ts = trainer.init(jax.random.fold_in(rng, wm), batch)
        for i in range(400):
            ts, m = trainer.train_step(ts, batch)
        assert np.isfinite(float(m["loss"]))
        params_list.append(ts.params)

    planner = CEMPlannerNetwork(
        mem_net=mn, mem_net_params_list=params_list,
        cem_num_iterations=10, cem_population_size=100,
        ensemble_population_size=1, num_elites=15,
        plan_horizon_length=4, state_dim=S_, action_dim=A_,
        discrete_action=False, terminal_effective=False, gamma=1.0,
        action_upper_bounds=np.ones(A_), action_lower_bounds=-np.ones(A_),
    )

    # evaluate planned actions in the real env
    returns = []
    r_eval = jax.random.PRNGKey(7)
    for ep in range(5):
        r_eval, r0 = jax.random.split(r_eval)
        st, obs = env.reset(r0)
        total = 0.0
        for t in range(env.max_steps):
            r_eval, rp, rs = jax.random.split(r_eval, 3)
            u = planner(rlt.FeatureData(float_features=obs[None]), rp)
            st, obs, rew, done = env.step(st, jnp.asarray(u).reshape(-1), rs)
            total += float(rew)
        returns.append(total)
    mean_ret = float(np.mean(returns))
    print(f"CEM LinDyna eval: {mean_ret} (bar -2.5)")
    assert mean_ret >= -2.5


def cem_cartpole_return(seed: int = 0) -> float:
    """CEM planning on CartPole beats the 100 bar
    (reference gym/tests/configs/world_model/cem_cartpole_offline.yaml:
    horizon 10, 1 world model, pop 100, iters 10, elites 15, gamma 1.0,
    passing_score_bar 100).

    Data protocol matches the reference offline run
    (gym/tests/test_gym_offline.py:113-145): a 200k-transition random-policy
    corpus, 1000 minibatches of 1024 *one-step* transitions shaped [1, B, ·] —
    the replay buffer's stack_size=1 path
    (gym/preprocessors/trainer_preprocessor.py:281-354) — matching how the
    planner queries the world model (seq-len 1, fresh hidden state).
    Eval averages 3 episodes (the reference's single episode is fragile)."""
    import numpy as np

    from reagent_tpu.gym.envs import CartPole
    from reagent_tpu.models.cem_planner import CEMPlannerNetwork

    env = CartPole(max_steps=200)
    S_, A_ = env.observation_dim, env.action_dim
    rng = jax.random.PRNGKey(seed)

    # offline corpus: 200k one-step random-policy transitions with auto-reset
    T, B = 200, 1000

    def rollout(r):
        st, obs = env.reset(r)

        def step(carry, rr):
            st, obs = carry
            a = jax.random.randint(rr, (), 0, A_)
            nst, nobs, rew, done = env.step(st, a, rr)
            out = (obs, jax.nn.one_hot(a, A_), nobs, rew,
                   1.0 - done.astype(jnp.float32))
            rst, robs = env.reset(rr)
            nst = jax.tree_util.tree_map(
                lambda x, y: jnp.where(done, x, y), rst, nst)
            nobs = jnp.where(done, robs, nobs)
            return (nst, nobs), out

        _, seq = jax.lax.scan(step, (st, obs), jax.random.split(r, T))
        return seq

    obs, act, nobs, rew, nt = jax.jit(jax.vmap(rollout))(
        jax.random.split(rng, B))
    flat = lambda x: x.reshape((T * B,) + x.shape[2:])  # noqa: E731
    obs, act, nobs, rew, nt = map(flat, (obs, act, nobs, rew, nt))

    # predict_delta: regress the state *change* (TPU-native redesign; the
    # planner rollout compounds one-step predictions, and the residual
    # parameterization cuts one-step mse ~5x on classic-control dynamics)
    mn = MemoryNetwork(state_dim=S_, action_dim=A_, num_hiddens=100,
                       num_hidden_layers=2, num_gaussians=1, predict_delta=True)
    trainer = MDNRNNTrainer(mn, MDNRNNTrainerParameters(
        hidden_size=100, num_hidden_layers=2, num_gaussians=1,
        learning_rate=1e-3, not_terminal_loss_weight=200.0))

    MB = 1024

    def make_batch(idx):
        return rlt.MemoryNetworkInput(
            state=rlt.FeatureData(float_features=obs[idx][None]),
            action=rlt.FeatureData(float_features=act[idx][None]),
            next_state=rlt.FeatureData(float_features=nobs[idx][None]),
            reward=rew[idx][None], not_terminal=nt[idx][None],
            time_diff=None, step=None)

    r0 = jax.random.PRNGKey(seed + 1)
    ts = trainer.init(r0, make_batch(jnp.arange(MB)))
    for _ in range(1000):
        r0, rs = jax.random.split(r0)
        idx = jax.random.randint(rs, (MB,), 0, T * B)
        ts, m = trainer.train_step(ts, make_batch(idx))
    assert np.isfinite(float(m["loss"]))

    planner = CEMPlannerNetwork(
        mem_net=mn, mem_net_params_list=[ts.params],
        cem_num_iterations=10, cem_population_size=100,
        ensemble_population_size=1, num_elites=15,
        plan_horizon_length=10, state_dim=S_, action_dim=A_,
        discrete_action=True, terminal_effective=True, gamma=1.0,
        sample_next_state=False, sample_not_terminal=False,
    )

    returns = []
    for seed in (7, 8, 9):
        r_eval = jax.random.PRNGKey(seed)
        st, obs0 = env.reset(r_eval)
        total = 0.0
        for _ in range(200):
            r_eval, rp, rs = jax.random.split(r_eval, 3)
            a, _ = planner(rlt.FeatureData(float_features=obs0[None]), rp)
            st, obs0, rew_t, done = env.step(st, jnp.asarray(a), rs)
            total += float(rew_t)
            if bool(done):
                break
        returns.append(total)
    mean_ret = float(np.mean(returns))
    print(f"CEM CartPole eval: {returns} mean {mean_ret} (bar 100)")
    return mean_ret


@pytest.mark.slow
def test_cem_cartpole_offline_reaches_bar():
    assert cem_cartpole_return(0) >= 100.0
