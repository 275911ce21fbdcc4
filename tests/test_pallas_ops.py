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
