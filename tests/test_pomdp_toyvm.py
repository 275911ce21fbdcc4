"""Pocman POMDP + ToyVM env tests (mirrors reference test_pomdp.py sanity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.gym.envs.pomdp import (
    Document,
    PocManEnv,
    ToyVMEnv,
    simulate_reward,
)


def test_pocman_rollout_sane():
    env = PocManEnv()
    rng = jax.random.PRNGKey(0)
    state, obs = env.reset(rng)
    assert obs.shape == (10,)
    total, steps = 0.0, 0
    for i in range(200):
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        a = jax.random.randint(r1, (), 0, 4)
        state, obs, rew, done = env.step(state, a, r2)
        total += float(rew)
        steps += 1
        # agent must always be on a corridor cell
        assert int(env._maze[state.agent[0], state.agent[1]]) == 0
        if bool(done):
            state, obs = env.reset(r3)
    assert np.isfinite(total)
    assert steps == 200


def test_pocman_observation_is_partial():
    """Two different global states can produce the same observation."""
    env = PocManEnv(num_ghosts=1)
    s1, o1 = env.reset(jax.random.PRNGKey(0))
    s2, o2 = env.reset(jax.random.PRNGKey(3))
    # obs dims are local bits only
    assert o1.shape == o2.shape == (10,)


def test_toy_vm_cascading_reward():
    prng = np.random.RandomState(0)
    # all-tap, no-abandon slate: reward = sum of qualities
    docs = [Document(tap=1.0, quality=0.5, abandon=0.0) for _ in range(3)]
    r = simulate_reward(docs, prng)
    assert r == pytest.approx(1.5)
    # zero-tap slate: no reward
    docs = [Document(tap=0.0, quality=0.5, abandon=0.0) for _ in range(3)]
    assert simulate_reward(docs, prng) == 0.0


def test_toy_vm_env():
    env = ToyVMEnv(slate_size=4, max_steps=5)
    docs = env.reset()
    assert len(docs) == 4
    total = 0.0
    done = False
    while not done:
        docs, reward, done = env.step(list(range(4)))
        total += reward
    assert np.isfinite(total)
