"""Replay buffer tests (mirrors reference test/replay_memory/circular_replay_buffer_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.replay import (
    PrioritizedReplayBuffer,
    ReplayBuffer,
    SumTree,
)


def _example(obs_dim=4):
    return dict(
        observation=jnp.zeros(obs_dim, jnp.float32),
        action=jnp.zeros((), jnp.int32),
        reward=jnp.zeros((), jnp.float32),
        terminal=jnp.zeros((), jnp.bool_),
    )


def _add_seq(rb, state, n, start=0, terminal_at=None, obs_dim=4):
    for i in range(start, start + n):
        term = (terminal_at is not None) and (i == terminal_at)
        state = rb.add(
            state,
            observation=jnp.full(obs_dim, float(i)),
            action=jnp.int32(i % 3),
            reward=jnp.float32(i),
            terminal=jnp.bool_(term),
        )
    return state


def test_capacity_check():
    with pytest.raises(ValueError):
        ReplayBuffer(stack_size=5, replay_capacity=5, update_horizon=1)


def test_add_and_validity_horizon1():
    rb = ReplayBuffer(replay_capacity=10, update_horizon=1, gamma=0.9)
    state = rb.init(**_example())
    state = _add_seq(rb, state, 1)
    # the only transition is right behind the cursor -> not yet sampleable
    assert int(state.size) == 0
    state = _add_seq(rb, state, 1, start=1)
    assert int(state.size) == 1


def test_terminal_makes_trailing_valid():
    rb = ReplayBuffer(replay_capacity=20, update_horizon=3, gamma=1.0)
    state = rb.init(**_example())
    state = _add_seq(rb, state, 5, terminal_at=4)
    # all 5 become valid as soon as terminal hits (trailing min(len, H)=3
    # plus the ones already valid)
    assert int(state.size) == 5


def test_sample_contents_single_step():
    rb = ReplayBuffer(replay_capacity=100, update_horizon=1, gamma=0.99)
    state = rb.init(**_example())
    state = _add_seq(rb, state, 10, terminal_at=9)
    batch = rb.sample(state, jax.random.PRNGKey(0), 32)
    obs0 = np.asarray(batch["state"])[:, 0]
    # next_state must be observation i+1 for non-terminal samples
    nxt0 = np.asarray(batch["next_state"])[:, 0]
    term = np.asarray(batch["terminal"])[:, 0]
    for i in range(32):
        if not term[i]:
            assert nxt0[i] == obs0[i] + 1
    np.testing.assert_allclose(np.asarray(batch["reward"])[:, 0], obs0)


def test_nstep_reward_discounting():
    gamma = 0.5
    rb = ReplayBuffer(replay_capacity=100, update_horizon=3, gamma=gamma)
    state = rb.init(**_example())
    # rewards 0,1,2,3,4 ; terminal at 4
    state = _add_seq(rb, state, 5, terminal_at=4)
    batch = rb.sample(
        state, jax.random.PRNGKey(0), 5, indices=jnp.arange(5, dtype=jnp.int32)
    )
    rew = np.asarray(batch["reward"])[:, 0]
    steps = np.asarray(batch["step"])[:, 0]
    # idx0: 0 + .5*1 + .25*2 = 1.0, 3 steps
    assert rew[0] == pytest.approx(0 + 0.5 * 1 + 0.25 * 2)
    assert steps[0] == 3
    # idx 3: reward 3 + 0.5*4, terminal after 2 steps
    assert rew[3] == pytest.approx(3 + 0.5 * 4)
    assert steps[3] == 2
    # idx 4: terminal itself, 1 step
    assert rew[4] == pytest.approx(4.0)
    assert steps[4] == 1
    term = np.asarray(batch["terminal"])[:, 0]
    np.testing.assert_array_equal(term, [False, False, True, True, True])


def test_stacking():
    rb = ReplayBuffer(stack_size=3, replay_capacity=50, update_horizon=1)
    state = rb.init(**_example(obs_dim=2))
    state = _add_seq(rb, state, 6, terminal_at=5, obs_dim=2)
    # episode pads 2 zero frames at start; first real obs index is 2
    batch = rb.sample(
        state, jax.random.PRNGKey(0), 1, indices=jnp.array([4], jnp.int32)
    )
    # state at storage idx 4 = obs values [0,1,2] stacked on last dim
    st = np.asarray(batch["state"])[0]  # [2, 3]
    np.testing.assert_allclose(st[0], [0.0, 1.0, 2.0])


def test_wraparound_overwrite():
    rb = ReplayBuffer(replay_capacity=8, update_horizon=1)
    state = rb.init(**_example())
    state = _add_seq(rb, state, 20, terminal_at=19)
    assert int(state.add_count) == 20
    # size can never exceed capacity
    assert int(state.size) <= 8
    batch = rb.sample(state, jax.random.PRNGKey(1), 16)
    # all sampled states come from the last 8 adds
    assert np.asarray(batch["state"])[:, 0].min() >= 12


def test_extra_keys_roundtrip():
    rb = ReplayBuffer(replay_capacity=50, update_horizon=1)
    state = rb.init(
        **_example(), possible_actions_mask=jnp.ones(2, jnp.float32), log_prob=jnp.zeros((), jnp.float32)
    )
    for i in range(5):
        state = rb.add(
            state,
            observation=jnp.full(4, float(i)),
            action=jnp.int32(0),
            reward=jnp.float32(i),
            terminal=jnp.bool_(i == 4),
            possible_actions_mask=jnp.array([1.0, float(i % 2)]),
            log_prob=jnp.float32(-0.5 * i),
        )
    batch = rb.sample(
        state, jax.random.PRNGKey(0), 5, indices=jnp.arange(5, dtype=jnp.int32)
    )
    assert batch["possible_actions_mask"].shape == (5, 2)
    assert "next_possible_actions_mask" in batch
    np.testing.assert_allclose(np.asarray(batch["log_prob"])[:, 0], [0, -0.5, -1, -1.5, -2])


def test_sample_uniformity():
    rb = ReplayBuffer(replay_capacity=100, update_horizon=1)
    state = rb.init(**_example())
    state = _add_seq(rb, state, 50, terminal_at=49)
    batch = rb.sample(state, jax.random.PRNGKey(42), 5000)
    idx = np.asarray(batch["indices"])[:, 0]
    counts = np.bincount(idx, minlength=100)
    assert counts[:50].min() > 50  # every valid index hit often
    assert counts[50:].sum() == 0  # invalid never


def test_timeline_format():
    rb = ReplayBuffer(replay_capacity=50, update_horizon=3, gamma=1.0, return_as_timeline_format=True)
    state = rb.init(**_example())
    state = _add_seq(rb, state, 6, terminal_at=5)
    batch = rb.sample(
        state, jax.random.PRNGKey(0), 2, indices=jnp.array([0, 4], jnp.int32)
    )
    assert batch["next_state"].shape == (2, 3, 4)  # [B, H, obs]
    assert batch["reward"].shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(batch["valid_step"])[:, 0], [3, 2])


def test_sum_tree():
    st = SumTree(10)
    s = st.init()
    s = st.set(s, jnp.array([0, 3, 9]), jnp.array([1.0, 2.0, 3.0]))
    assert float(s.total) == pytest.approx(6.0)
    # query 0.5 -> idx 0; 1.5 -> idx 3; 5.9 -> idx 9
    idx = st.sample_from_query(s, jnp.array([0.5, 1.5, 5.9]))
    np.testing.assert_array_equal(np.asarray(idx), [0, 3, 9])
    samples = st.stratified_sample(s, jax.random.PRNGKey(0), 600)
    counts = np.bincount(np.asarray(samples), minlength=10)
    assert counts[0] == pytest.approx(100, rel=0.3)
    assert counts[9] == pytest.approx(300, rel=0.3)


def test_prioritized_replay():
    rb = PrioritizedReplayBuffer(replay_capacity=64, update_horizon=1)
    state = rb.init(**_example())
    for i in range(20):
        state = rb.add(
            state,
            observation=jnp.full(4, float(i)),
            action=jnp.int32(0),
            reward=jnp.float32(i),
            terminal=jnp.bool_(i == 19),
        )
    # knock all priorities to ~0 except index 5
    state = rb.set_priority(
        state, jnp.arange(20), jnp.full(20, 1e-6)
    )
    state = rb.set_priority(state, jnp.array([5]), jnp.array([10.0]))
    batch = rb.sample(state, jax.random.PRNGKey(0), 64)
    idx = np.asarray(batch["indices"])[:, 0]
    assert (idx == 5).mean() > 0.95
    assert batch["sampling_probabilities"].shape == (64, 1)
    # new adds get max priority seen (10.0)
    state2 = rb.add(
        state,
        observation=jnp.zeros(4),
        action=jnp.int32(0),
        reward=jnp.float32(0),
        terminal=jnp.bool_(False),
    )
    assert float(rb.get_priority(state2, jnp.array([20]))[0]) == pytest.approx(10.0)


# ---------------------------------------------------------------- packed fast path


def test_packed_replay_matches_circular():
    """PackedReplayBuffer == ReplayBuffer(stack=1, horizon=1) on identical adds."""
    from reagent_tpu.replay import PackedReplayBuffer

    rb1 = ReplayBuffer(replay_capacity=64, update_horizon=1, gamma=0.99)
    rb2 = PackedReplayBuffer(replay_capacity=64, gamma=0.99)
    s1, s2 = rb1.init(**_example()), rb2.init(**_example())
    rng = np.random.default_rng(0)
    for _ in range(100):  # wraps the 64-capacity ring
        tr = dict(
            observation=jnp.asarray(rng.normal(size=4), jnp.float32),
            action=jnp.int32(rng.integers(0, 3)),
            reward=jnp.float32(rng.normal()),
            terminal=jnp.bool_(rng.random() < 0.1),
        )
        s1, s2 = rb1.add(s1, **tr), rb2.add(s2, **tr)

    idx = jnp.asarray(rng.integers(0, 30, 16), jnp.int32)
    b1 = rb1.sample(s1, jax.random.PRNGKey(0), 16, indices=idx)
    b2 = rb2.sample(s2, jax.random.PRNGKey(0), 16, indices=idx)
    for k in ("state", "action", "reward", "next_state", "next_action", "terminal", "step"):
        np.testing.assert_allclose(
            np.asarray(b1[k], np.float32), np.asarray(b2[k], np.float32),
            rtol=1e-6, err_msg=k,
        )
    # identical closed-form index sampling (same rng -> same indices)
    i1 = rb1.sample_index_batch(s1, jax.random.PRNGKey(7), 64)
    i2 = rb2.sample_index_batch(s2, jax.random.PRNGKey(7), 64)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_packed_replay_extra_keys_and_batch_add():
    from reagent_tpu.replay import PackedReplayBuffer

    rb = PackedReplayBuffer(replay_capacity=32)
    ex = dict(_example(), logged_propensity=jnp.zeros((), jnp.float32))
    state = rb.init(**ex)
    T = 10
    state = rb.add_batch(
        state,
        observation=jnp.arange(T * 4, dtype=jnp.float32).reshape(T, 4),
        action=jnp.arange(T, dtype=jnp.int32) % 2,
        reward=jnp.arange(T, dtype=jnp.float32),
        terminal=jnp.zeros(T, jnp.bool_),
        logged_propensity=jnp.full(T, 0.5, jnp.float32),
    )
    batch = rb.sample(state, jax.random.PRNGKey(0), 8)
    assert batch["logged_propensity"].shape == (8, 1)
    assert batch["next_logged_propensity"].shape == (8, 1)
    np.testing.assert_allclose(np.asarray(batch["logged_propensity"]), 0.5)
    # next_state of row i is row i+1's observation
    idx = np.asarray(batch["indices"])[:, 0]
    np.testing.assert_allclose(
        np.asarray(batch["next_state"]),
        np.arange(T * 4, dtype=np.float32).reshape(T, 4)[(idx + 1) % 32],
    )
