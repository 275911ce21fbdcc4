"""Fused noise-tape online DQN engine (gym/fused_dqn_loop.py).

Mirrors the reference interleaved loop semantics
(reagent/gym/datasets/replay_buffer_dataset.py): act -> env.step -> insert ->
sample -> update, once per env step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.gym.envs import CartPole
from reagent_tpu.gym.fused_dqn_loop import FusedLoopConfig, run_fused_online_dqn
from reagent_tpu.gym.online_loop import prefill_replay_buffer
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.replay import PackedReplayBuffer
from reagent_tpu.training.fused_dqn_trainer import FusedDQNTrainer

INTERPRET = jax.default_backend() != "tpu"


def _setup(B=64):
    env = CartPole(max_steps=100)
    q_net = FullyConnectedDQN(
        state_dim=4, action_dim=2, sizes=[32, 16],
        activations=["leaky_relu", "leaky_relu"],
    )
    trainer = FusedDQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.99, target_update_rate=0.2),
        optimizer={"Adam": {"lr": 0.01}},
        minibatch_size=B, interpret=INTERPRET,
    )
    rb = PackedReplayBuffer(replay_capacity=2048, gamma=0.99)
    r_init, r_fill = jax.random.split(jax.random.PRNGKey(0))
    tstate = trainer.init(r_init, jnp.zeros((1, 4)))
    rb_state = rb.init(
        observation=jnp.zeros(4), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rb_state = prefill_replay_buffer(env, rb, rb_state, r_fill, num_steps=200)
    return env, trainer, tstate, rb, rb_state


def test_fused_loop_runs_and_trains():
    env, trainer, tstate, rb, rb_state = _setup()
    N = 300
    cfg = FusedLoopConfig(num_steps=N, minibatch_size=64, unroll=2)
    ts, rs, aux = run_fused_online_dqn(
        env, trainer, tstate, rb, rb_state, jax.random.PRNGKey(1), cfg
    )
    losses = np.asarray(aux["td_losses"])
    assert losses.shape == (N,) and np.isfinite(losses).all()
    assert int(rs.add_count) == int(rb_state.add_count) + N
    assert int(ts.step) == N
    assert int(aux["episodes_completed"]) >= 1
    # parameters actually moved
    assert not np.allclose(np.asarray(ts.W[0]), np.asarray(tstate.W[0]))


def test_fused_loop_reset_from_uniform_matches_reset_distribution():
    env = CartPole(max_steps=100)
    u = jax.random.uniform(jax.random.PRNGKey(0), (env.reset_noise_dim,))
    state, obs = env.reset_from_uniform(u)
    assert obs.shape == (4,)
    assert (np.abs(np.asarray(obs)) <= 0.05 + 1e-7).all()
    assert int(state.t) == 0


def test_gumbel_max_equals_softmax_sampling():
    """argmax(q/T + gumbel) samples from softmax(q/T) — the fused loop's
    exploration is distribution-identical to SoftmaxActionSampler."""
    q = jnp.asarray([1.0, 0.2, -0.5])
    T = 1.0
    n = 20000
    g = jax.random.gumbel(jax.random.PRNGKey(0), (n, 3))
    actions = np.asarray(jnp.argmax(q / T + g, axis=1))
    freq = np.bincount(actions, minlength=3) / n
    expected = np.asarray(jax.nn.softmax(q / T))
    np.testing.assert_allclose(freq, expected, atol=0.02)
