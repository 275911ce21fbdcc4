"""Golden tests for replay insertion + batch makers on known transitions.

Mirrors the reference's gym/tests/preprocessors/
{test_replay_buffer_inserters.py, test_default_preprocessors.py}: insert a
handful of hand-written transitions, sample by explicit index, and assert the
exact contents of the sampled dict and of every typed batch built from it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from reagent_tpu.gym.preprocessors import (
    make_discrete_dqn_batch,
    make_parametric_dqn_batch,
    make_policy_network_batch,
)
from reagent_tpu.replay import ReplayBuffer


def _fill_known(rb, extra=None):
    """5 transitions with obs_i = [i, i+0.1, i+0.2, i+0.3], action i%2."""
    obs = [np.asarray([i, i + 0.1, i + 0.2, i + 0.3], np.float32) for i in range(5)]
    state = rb.init(
        observation=jnp.zeros(4), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
        **({k: jnp.asarray(v[0]) for k, v in (extra or {}).items()}),
    )
    for i in range(5):
        state = rb.add(
            state,
            observation=jnp.asarray(obs[i]),
            action=jnp.int32(i % 2),
            reward=jnp.float32(float(i)),
            terminal=jnp.bool_(i == 4),
            **({k: jnp.asarray(v[i]) for k, v in (extra or {}).items()}),
        )
    return state, obs


def test_basic_inserter_golden():
    """Reference TestBasicReplayBufferInserter.test_cartpole: index-0 sample
    returns transition 0's obs/action and transition 1's as next_*."""
    rb = ReplayBuffer(replay_capacity=6, update_horizon=1, gamma=0.99)
    state, obs = _fill_known(rb)
    batch = rb.sample(state, jax.random.PRNGKey(0), 1,
                      indices=jnp.asarray([0], jnp.int32))
    npt.assert_array_almost_equal(obs[0], np.asarray(batch["state"])[0])
    npt.assert_array_almost_equal(obs[1], np.asarray(batch["next_state"])[0])
    npt.assert_array_equal(0, np.asarray(batch["action"])[0])
    npt.assert_array_equal(1, np.asarray(batch["next_action"])[0])
    npt.assert_array_almost_equal(0.0, np.asarray(batch["reward"])[0])
    assert not bool(np.asarray(batch["terminal"])[0])

    # the terminal row: next_* is self (no successor), terminal flag set
    batch4 = rb.sample(state, jax.random.PRNGKey(0), 1,
                       indices=jnp.asarray([4], jnp.int32))
    assert bool(np.asarray(batch4["terminal"])[0])
    npt.assert_array_almost_equal(4.0, np.asarray(batch4["reward"])[0])


def test_extra_storage_keys_golden():
    """Dict-obs payloads ride as extra storage keys (the reference's RecSim
    inserter stores doc/response arrays the same way)."""
    docs = [np.full((3, 2), i, np.float32) for i in range(5)]
    rb = ReplayBuffer(replay_capacity=6, update_horizon=1, gamma=0.99)
    state, _ = _fill_known(rb, extra={"doc": docs})
    batch = rb.sample(state, jax.random.PRNGKey(0), 1,
                      indices=jnp.asarray([2], jnp.int32))
    npt.assert_array_equal(docs[2], np.asarray(batch["doc"])[0])
    npt.assert_array_equal(docs[3], np.asarray(batch["next_doc"])[0])


def test_discrete_dqn_batch_maker_golden():
    rb = ReplayBuffer(replay_capacity=6, update_horizon=1, gamma=0.99)
    state, obs = _fill_known(rb)
    raw = rb.sample(state, jax.random.PRNGKey(0), 2,
                    indices=jnp.asarray([1, 3], jnp.int32))
    b = make_discrete_dqn_batch(raw, num_actions=2)
    npt.assert_array_almost_equal(np.stack([obs[1], obs[3]]),
                                  np.asarray(b.state.float_features))
    npt.assert_array_almost_equal(np.stack([obs[2], obs[4]]),
                                  np.asarray(b.next_state.float_features))
    # actions 1, 1 -> one-hot [0, 1]
    npt.assert_array_equal([[0, 1], [0, 1]], np.asarray(b.action))
    # next actions 0, 0
    npt.assert_array_equal([[1, 0], [1, 0]], np.asarray(b.next_action))
    npt.assert_array_almost_equal([[1.0], [3.0]], np.asarray(b.reward))
    # neither row is the terminal transition (the flag lives on row 4)
    npt.assert_array_equal([[1.0], [1.0]], np.asarray(b.not_terminal))
    npt.assert_array_equal(np.ones((2, 2)), np.asarray(b.possible_actions_mask))


def test_parametric_batch_maker_golden():
    rb = ReplayBuffer(replay_capacity=6, update_horizon=1, gamma=0.99)
    state, obs = _fill_known(rb)
    raw = rb.sample(state, jax.random.PRNGKey(0), 1,
                    indices=jnp.asarray([0], jnp.int32))
    b = make_parametric_dqn_batch(raw, num_actions=2)
    npt.assert_array_equal([[1, 0]], np.asarray(b.action.float_features))
    npt.assert_array_equal([[0, 1]], np.asarray(b.next_action.float_features))
    # possible actions = all actions tiled [B*A, A]
    npt.assert_array_equal(np.eye(2), np.asarray(b.possible_actions.float_features))


def test_policy_network_batch_maker_golden():
    rb = ReplayBuffer(replay_capacity=6, update_horizon=1, gamma=0.99)
    state = rb.init(
        observation=jnp.zeros(3), action=jnp.zeros(2),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    acts = [np.asarray([i * 0.1, -i * 0.1], np.float32) for i in range(3)]
    for i in range(3):
        state = rb.add(
            state, observation=jnp.full(3, float(i)), action=jnp.asarray(acts[i]),
            reward=jnp.float32(i), terminal=jnp.bool_(i == 2),
        )
    raw = rb.sample(state, jax.random.PRNGKey(0), 1,
                    indices=jnp.asarray([0], jnp.int32))
    b = make_policy_network_batch(raw)
    npt.assert_array_almost_equal([acts[0]], np.asarray(b.action.float_features))
    npt.assert_array_almost_equal([acts[1]], np.asarray(b.next_action.float_features))
    assert b.reward.shape == (1, 1) and b.not_terminal.shape == (1, 1)


def test_slate_q_batch_maker_golden():
    """End-to-end: slate transitions through the replay buffer's extra keys
    into make_slate_q_batch, exact contents asserted (reference
    SlateQInputMaker, trainer_preprocessor.py:230-275)."""
    import jax.numpy as jnp

    from reagent_tpu.gym.preprocessors import make_slate_q_batch
    from reagent_tpu.training.slate_q_trainer import SlateQTrainer  # noqa: F401

    C, D, S = 4, 3, 2
    rb = ReplayBuffer(replay_capacity=6, update_horizon=1, gamma=0.99)
    docs = [np.full((C, D), i, np.float32) for i in range(4)]
    values = [np.arange(C, dtype=np.float32) + i for i in range(4)]
    slates = [np.asarray([i % C, (i + 1) % C], np.int64) for i in range(4)]
    pos_rew = [np.asarray([i, 0.0], np.float32) for i in range(4)]
    clicks = [np.asarray([1.0, 0.0], np.float32) for i in range(4)]
    state = rb.init(
        observation=jnp.zeros(3), action=jnp.zeros(S, jnp.int32),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
        doc=jnp.asarray(docs[0]), doc_value=jnp.asarray(values[0]),
        position_reward=jnp.asarray(pos_rew[0]), response_click=jnp.asarray(clicks[0]),
    )
    for i in range(4):
        state = rb.add(
            state, observation=jnp.full(3, float(i)),
            action=jnp.asarray(slates[i], jnp.int32),
            reward=jnp.float32(pos_rew[i].sum()), terminal=jnp.bool_(i == 3),
            doc=jnp.asarray(docs[i]), doc_value=jnp.asarray(values[i]),
            position_reward=jnp.asarray(pos_rew[i]),
            response_click=jnp.asarray(clicks[i]),
        )
    raw = rb.sample(state, jax.random.PRNGKey(0), 1,
                    indices=jnp.asarray([1], jnp.int32))
    b = make_slate_q_batch(raw)
    npt.assert_array_equal([slates[1]], np.asarray(b.action))
    npt.assert_array_equal([slates[2]], np.asarray(b.next_action))
    npt.assert_array_equal([docs[1]], np.asarray(b.state.candidate_docs.float_features))
    npt.assert_array_equal([docs[2]],
                           np.asarray(b.next_state.candidate_docs.float_features))
    npt.assert_array_equal([values[1]], np.asarray(b.state.candidate_docs.value))
    npt.assert_array_almost_equal([pos_rew[1]], np.asarray(b.reward))
    npt.assert_array_equal([[True, False]], np.asarray(b.reward_mask))
    npt.assert_array_equal([[1.0]], np.asarray(b.not_terminal))

    # the built batch trains through SlateQTrainer without shape errors
    from reagent_tpu.models import FullyConnectedCritic

    q = FullyConnectedCritic(state_dim=3, action_dim=D, sizes=[8],
                             activations=["relu"])
    trainer = SlateQTrainer(q_network=q, slate_size=S,
                            optimizer={"Adam": {"lr": 1e-3}})
    raw2 = rb.sample(state, jax.random.PRNGKey(0), 2,
                     indices=jnp.asarray([0, 1], jnp.int32))
    ts = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, D)))
    ts, m = trainer.train_step(ts, make_slate_q_batch(raw2))
    assert np.isfinite(float(m["td_loss"]))


def test_trainer_preprocessor_dispatch():
    """Annotation-driven batch-maker dispatch covers all four batch types
    (reference trainer_preprocessor.py:32-57)."""
    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.gym.preprocessors import make_trainer_preprocessor
    from reagent_tpu.models import (
        FullyConnectedCritic,
        FullyConnectedDQN,
        GaussianFullyConnectedActor,
    )
    from reagent_tpu.training import DQNTrainer, ParametricDQNTrainer, SACTrainer
    from reagent_tpu.training.slate_q_trainer import SlateQTrainer

    q = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[8], activations=["relu"])
    crit = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[8], activations=["relu"])
    actor = GaussianFullyConnectedActor(state_dim=3, action_dim=1, sizes=[8], activations=["relu"])
    rl = RLParameters(gamma=0.9, target_update_rate=0.1)
    assert make_trainer_preprocessor(
        DQNTrainer(q_network=q, rl=rl), num_actions=2) is not None
    assert make_trainer_preprocessor(
        ParametricDQNTrainer(q_network=crit, rl=rl), num_actions=2) is not None
    assert make_trainer_preprocessor(
        SACTrainer(actor_network=actor, q1_network=crit, q2_network=crit, rl=rl)
    ) is not None
    from reagent_tpu.gym.preprocessors import make_slate_q_batch

    assert make_trainer_preprocessor(
        SlateQTrainer(q_network=crit, slate_size=2)) is make_slate_q_batch
