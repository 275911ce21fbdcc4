"""Pallas kernel correctness tests (interpret mode on CPU; real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.ops import fused_mlp_forward, nstep_rewards, quantile_huber_loss

INTERPRET = jax.default_backend() != "tpu"


def test_fused_mlp_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(8, 16)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=16), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(16, 4)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=4), jnp.float32)

    out = fused_mlp_forward(
        x, [(w1, b1), (w2, b2)], ["leaky_relu", "linear"], interpret=INTERPRET
    )
    h = x @ w1 + b1
    h = jnp.where(h > 0, h, 0.01 * h)
    ref = h @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_mlp_batch_tiling():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(300, 4)), jnp.float32)  # not divisible by block
    w = jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)
    b = jnp.zeros(2, jnp.float32)
    out = fused_mlp_forward(x, [(w, b)], ["linear"], block_b=128, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w), rtol=1e-5, atol=1e-5)


def test_nstep_rewards_matches_buffer_math():
    capacity, H, gamma = 64, 3, 0.5
    rewards = jnp.arange(capacity, dtype=jnp.float32)
    terminals = jnp.zeros(capacity, jnp.int32).at[5].set(1)
    idx = jnp.array([0, 3, 4, 5, 60], jnp.int32)
    r, s, t = nstep_rewards(rewards, terminals, idx, H, gamma, interpret=INTERPRET)
    r, s, t = np.asarray(r), np.asarray(s), np.asarray(t)
    # idx 0: no terminal in window: 0 + .5*1 + .25*2
    assert r[0] == pytest.approx(0 + 0.5 * 1 + 0.25 * 2)
    assert s[0] == 3 and not t[0]
    # idx 3: terminal at 5 -> steps 3 (3,4,5)
    assert s[1] == 3 and t[1]
    assert r[1] == pytest.approx(3 + 0.5 * 4 + 0.25 * 5)
    # idx 5: terminal immediately
    assert s[3] == 1 and t[3] and r[3] == pytest.approx(5.0)
    # idx 60: window wraps around the capacity
    assert r[4] == pytest.approx(60 + 0.5 * 61 + 0.25 * 62)


def test_quantile_huber_matches_reference():
    rng = np.random.default_rng(2)
    B, N = 32, 8
    tq = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    cq = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    loss = quantile_huber_loss(tq, cq, interpret=INTERPRET, use_kernel=True)
    loss_xla = quantile_huber_loss(tq, cq)  # default XLA path

    taus = (np.arange(N) + 0.5) / N
    td = np.asarray(tq)[:, :, None] - np.asarray(cq)[:, None, :]
    a = np.abs(td)
    huber = np.where(a < 1.0, 0.5 * td**2, a - 0.5)
    weight = np.abs(taus[None, None, :] - (td < 0))
    ref = (huber * weight).mean()
    assert float(loss) == pytest.approx(float(ref), rel=1e-5)
    assert float(loss_xla) == pytest.approx(float(ref), rel=1e-5)


def test_fused_dqn_trainer_matches_dqn_trainer():
    """FusedDQNTrainer (one Pallas kernel) == DQNTrainer in 10-step lockstep."""
    from reagent_tpu.core import types as rlt
    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.training import DQNTrainer
    from reagent_tpu.training.fused_dqn_trainer import FusedDQNTrainer

    B = 64
    q_net = FullyConnectedDQN(
        state_dim=4, action_dim=2, sizes=[32, 16],
        activations=["leaky_relu", "leaky_relu"],
    )
    rl = RLParameters(gamma=0.99, target_update_rate=0.2)
    ref = DQNTrainer(q_network=q_net, rl=rl, optimizer={"Adam": {"lr": 0.01}})
    fused = FusedDQNTrainer(
        q_network=q_net, rl=rl, optimizer={"Adam": {"lr": 0.01}},
        minibatch_size=B, interpret=INTERPRET,
    )
    rng = jax.random.PRNGKey(0)
    ref_state = ref.init(rng, jnp.zeros((1, 4)))
    fused_state = fused.init(rng, jnp.zeros((1, 4)))

    rngn = np.random.default_rng(0)

    def make_batch():
        a = jax.nn.one_hot(jnp.asarray(rngn.integers(0, 2, B)), 2)
        return rlt.DiscreteDqnInput(
            state=rlt.FeatureData(
                float_features=jnp.asarray(rngn.normal(size=(B, 4)), jnp.float32)),
            next_state=rlt.FeatureData(
                float_features=jnp.asarray(rngn.normal(size=(B, 4)), jnp.float32)),
            action=a, next_action=a,
            reward=jnp.asarray(rngn.normal(size=(B, 1)), jnp.float32),
            time_diff=jnp.ones((B, 1)), step=jnp.ones((B, 1), jnp.int32),
            not_terminal=jnp.asarray(rngn.random((B, 1)) > 0.1, jnp.float32),
            possible_actions_mask=jnp.ones((B, 2)),
            possible_next_actions_mask=jnp.ones((B, 2)),
        )

    for _ in range(10):
        batch = make_batch()
        ref_state, mr = ref.train_step(ref_state, batch)
        fused_state, mf = fused.train_step(fused_state, batch)
        np.testing.assert_allclose(
            float(mr["td_loss"]), float(mf["td_loss"]), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            float(mr["q_values_mean"]), float(mf["q_values_mean"]),
            rtol=2e-4, atol=2e-5)

    obs = jnp.asarray(rngn.normal(size=(16, 4)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ref.q_values(ref_state, obs)),
        np.asarray(fused.q_values(fused_state, obs)),
        rtol=2e-4, atol=2e-5,
    )
    # export round-trip: kernel layout -> flax params -> q_network.apply
    p = fused.to_flax_params(fused_state)
    np.testing.assert_allclose(
        np.asarray(q_net.apply(p, obs)),
        np.asarray(fused.q_values(fused_state, obs)),
        rtol=1e-5, atol=1e-6,
    )


def test_fused_dqn_trainer_masked_and_single_q():
    """Masked possible_next_actions + double_q=False parity."""
    from reagent_tpu.core import types as rlt
    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.training import DQNTrainer
    from reagent_tpu.training.fused_dqn_trainer import FusedDQNTrainer

    B = 32
    q_net = FullyConnectedDQN(
        state_dim=3, action_dim=4, sizes=[16], activations=["relu"])
    rl = RLParameters(gamma=0.9, target_update_rate=0.1)
    rngn = np.random.default_rng(1)
    mask = jnp.asarray(rngn.random((B, 4)) > 0.3, jnp.float32)
    mask = mask.at[:, 0].set(1.0)  # at least one action possible
    a = jax.nn.one_hot(jnp.asarray(rngn.integers(0, 4, B)), 4)
    batch = rlt.DiscreteDqnInput(
        state=rlt.FeatureData(
            float_features=jnp.asarray(rngn.normal(size=(B, 3)), jnp.float32)),
        next_state=rlt.FeatureData(
            float_features=jnp.asarray(rngn.normal(size=(B, 3)), jnp.float32)),
        action=a, next_action=a,
        reward=jnp.asarray(rngn.normal(size=(B, 1)), jnp.float32),
        time_diff=jnp.ones((B, 1)), step=jnp.ones((B, 1), jnp.int32),
        not_terminal=jnp.ones((B, 1)),
        possible_actions_mask=jnp.ones((B, 4)),
        possible_next_actions_mask=mask,
    )
    for dq in (True, False):
        ref = DQNTrainer(q_network=q_net, rl=rl, double_q_learning=dq,
                         optimizer={"Adam": {"lr": 0.005}})
        fused = FusedDQNTrainer(q_network=q_net, rl=rl, double_q_learning=dq,
                                optimizer={"Adam": {"lr": 0.005}},
                                minibatch_size=B, interpret=INTERPRET)
        rng = jax.random.PRNGKey(3)
        rs, fs = ref.init(rng, jnp.zeros((1, 3))), fused.init(rng, jnp.zeros((1, 3)))
        for _ in range(3):
            rs, mr = ref.train_step(rs, batch)
            fs, mf = fused.train_step(fs, batch)
            np.testing.assert_allclose(
                float(mr["td_loss"]), float(mf["td_loss"]), rtol=2e-4, atol=2e-5)


def test_fused_offline_kernel_matches_dqn_trainer():
    """Gridded offline kernel (batch streamed through VMEM blocks) ==
    DQNTrainer in 5-step lockstep, incl. the scanned sampled driver."""
    from reagent_tpu.core import types as rlt
    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.training import DQNTrainer
    from reagent_tpu.training.fused_dqn_trainer import FusedDQNTrainer

    B, BLK = 256, 64
    q_net = FullyConnectedDQN(
        state_dim=8, action_dim=4, sizes=[32, 16],
        activations=["leaky_relu", "leaky_relu"],
    )
    rl = RLParameters(gamma=0.99, target_update_rate=0.1)
    ref = DQNTrainer(q_network=q_net, rl=rl, optimizer={"Adam": {"lr": 0.005}})
    fused = FusedDQNTrainer(
        q_network=q_net, rl=rl, optimizer={"Adam": {"lr": 0.005}},
        minibatch_size=B, block_size=BLK, interpret=INTERPRET,
    )
    rng = jax.random.PRNGKey(0)
    ref_state = ref.init(rng, jnp.zeros((1, 8)))
    fused_state = fused.init(rng, jnp.zeros((1, 8)))
    rngn = np.random.default_rng(3)

    def make_batch():
        a = jax.nn.one_hot(jnp.asarray(rngn.integers(0, 4, B)), 4)
        mask = jnp.asarray(rngn.random((B, 4)) > 0.2, jnp.float32)
        mask = mask.at[:, 0].set(1.0)  # at least one possible action
        return rlt.DiscreteDqnInput(
            state=rlt.FeatureData(
                float_features=jnp.asarray(rngn.normal(size=(B, 8)), jnp.float32)),
            next_state=rlt.FeatureData(
                float_features=jnp.asarray(rngn.normal(size=(B, 8)), jnp.float32)),
            action=a, next_action=a,
            reward=jnp.asarray(rngn.normal(size=(B, 1)), jnp.float32),
            time_diff=jnp.ones((B, 1)), step=jnp.ones((B, 1), jnp.int32),
            not_terminal=jnp.asarray(rngn.random((B, 1)) > 0.1, jnp.float32),
            possible_actions_mask=jnp.ones((B, 4)),
            possible_next_actions_mask=mask,
        )

    for _ in range(5):
        batch = make_batch()
        ref_state, mr = ref.train_step(ref_state, batch)
        fused_state, mf = fused.train_step(fused_state, batch)
        np.testing.assert_allclose(
            float(mr["td_loss"]), float(mf["td_loss"]), rtol=2e-4, atol=2e-5)
    obs = jnp.asarray(rngn.normal(size=(16, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ref.q_values(ref_state, obs)),
        np.asarray(fused.q_values(fused_state, obs)),
        rtol=5e-4, atol=5e-5,
    )

    # the scanned sampled driver advances the same state machinery
    dataset = make_batch()
    run = fused.make_sampled_train_fn(dataset, num_steps=3)
    step0 = float(fused_state.step)  # read BEFORE run donates the state
    fused_state2, metrics = run(fused_state, jax.random.PRNGKey(5))
    assert metrics["td_loss"].shape == (3,)
    assert float(fused_state2.step) == step0 + 3


def test_fused_offline_packed_driver_matches_unpacked():
    """The packed single-gather driver trains identically to the 10-leaf
    gather driver given the same rng stream."""
    from reagent_tpu.core import types as rlt
    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.training.fused_dqn_trainer import FusedDQNTrainer

    B = 64
    q_net = FullyConnectedDQN(
        state_dim=8, action_dim=4, sizes=[16],
        activations=["leaky_relu"],
    )
    rl = RLParameters(gamma=0.99, target_update_rate=0.1)

    def mk():
        tr = FusedDQNTrainer(
            q_network=q_net, rl=rl, optimizer={"Adam": {"lr": 0.01}},
            minibatch_size=B, block_size=32, interpret=INTERPRET,
        )
        return tr, tr.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))

    rngn = np.random.default_rng(7)
    N = 256
    a = jax.nn.one_hot(jnp.asarray(rngn.integers(0, 4, N)), 4)
    dataset = rlt.DiscreteDqnInput(
        state=rlt.FeatureData(
            float_features=jnp.asarray(rngn.normal(size=(N, 8)), jnp.float32)),
        next_state=rlt.FeatureData(
            float_features=jnp.asarray(rngn.normal(size=(N, 8)), jnp.float32)),
        action=a, next_action=a,
        reward=jnp.asarray(rngn.normal(size=(N, 1)), jnp.float32),
        time_diff=jnp.ones((N, 1)), step=jnp.ones((N, 1), jnp.int32),
        not_terminal=jnp.ones((N, 1)),
        possible_actions_mask=jnp.ones((N, 4)),
        possible_next_actions_mask=jnp.ones((N, 4)),
    )
    tr1, ts1 = mk()
    tr2, ts2 = mk()
    run1 = tr1.make_sampled_train_fn(dataset, num_steps=4)
    run2 = tr2.make_packed_sampled_train_fn(dataset, num_steps=4)
    ts1, m1 = run1(ts1, jax.random.PRNGKey(9))
    ts2, m2 = run2(ts2, jax.random.PRNGKey(9))
    np.testing.assert_allclose(
        np.asarray(m1["td_loss"]), np.asarray(m2["td_loss"]), rtol=1e-6)
    for w1, w2 in zip(ts1.W, ts2.W):
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6)
