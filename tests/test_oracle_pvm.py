"""OraclePVM env mechanics + a gradient-free learner recovering the weights.

Reference: reagent/gym/envs/oracle_pvm.py (reward semantics) and its use in
the reference gym test-suite for policy-optimizer smoke tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from reagent_tpu.gym.envs.oracle_pvm import (
    MATCH_REWARD_BOOST,
    OraclePVM,
    kendall_tau,
)


def test_kendall_tau_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.permutation(7)
        b = rng.permutation(7)
        ours = float(kendall_tau(jnp.asarray(a), jnp.asarray(b)))
        ref, _ = stats.kendalltau(a, b)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ground_truth_action_gets_boost():
    env = OraclePVM(num_candidates=5)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (env.observation_dim,)
    _, _, reward, done = env.step(state, jnp.ones(3), jax.random.PRNGKey(1))
    assert env.is_match(reward)
    assert float(reward) == MATCH_REWARD_BOOST
    assert bool(done)


def test_reversed_weights_get_negative_tau():
    """With docs pre-sorted so the oracle ranking is [0..n-1], negated
    weights reverse it and tau(arange, reversed) = -1 exactly."""
    from reagent_tpu.gym.envs.oracle_pvm import OraclePVMState

    env = OraclePVM(num_candidates=6)
    docs = jnp.tile(jnp.linspace(1.0, 0.1, 6)[:, None], (1, 3))
    state = OraclePVMState(user=jnp.zeros(1), docs=docs, t=jnp.zeros((), jnp.int32))
    _, _, reward, _ = env.step(state, -jnp.ones(3), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(reward), -1.0, atol=1e-6)


def test_random_search_recovers_weights():
    """Best-of-N vmapped search over weight vectors converges to matches."""
    env = OraclePVM(num_candidates=5)

    @jax.jit
    def mean_reward(weights, rng):
        def one(r):
            state, _ = env.reset(r)
            _, _, reward, _ = env.step(state, weights, r)
            return reward

        return jnp.mean(jax.vmap(one)(jax.random.split(rng, 16)))

    rng = jax.random.PRNGKey(3)
    cands = jax.random.uniform(rng, (64, 3), minval=-1.0, maxval=1.0)
    rewards = jax.vmap(lambda w: mean_reward(w, jax.random.PRNGKey(7)))(cands)
    best = cands[jnp.argmax(rewards)]
    final = float(mean_reward(best, jax.random.PRNGKey(11)))
    # a good weight vector matches the oracle on most of 16 fresh episodes
    assert final > 1.5, f"best-of-64 search only reached mean reward {final}"
