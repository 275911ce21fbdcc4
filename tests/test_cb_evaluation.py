"""Contextual-bandit offline evaluation: replay-method PolicyEvaluator +
synthetic dynamic-bandit env.

Reference: reagent/evaluation/cb/{policy_evaluator.py, base_evaluator.py,
synthetic_contextual_bandit_data.py, run_synthetic_bandit.py}.
"""

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core.types import CBInput
from reagent_tpu.evaluation.cb import (
    DynamicBanditAgent,
    DynamicBanditEnv,
    PolicyEvaluator,
    add_importance_weights,
)
from reagent_tpu.evaluation.cb.synthetic_contextual_bandit_data import (
    run_dynamic_bandit_env,
)


def _batch(actions, rewards, log_probs=None, num_arms=3):
    B = len(actions)
    return CBInput(
        context_arm_features=jnp.ones((B, num_arms, 2)),
        action=jnp.asarray(actions).reshape(B, 1),
        reward=jnp.asarray(rewards, jnp.float32).reshape(B, 1),
        log_prob=None if log_probs is None else jnp.log(jnp.asarray(log_probs)).reshape(B, 1),
    )


def test_importance_weights_zero_on_mismatch():
    batch = _batch([0, 1, 2], [1.0, 2.0, 3.0], log_probs=[0.5, 0.25, 0.25])
    model_actions = jnp.array([[0], [0], [2]])
    out = add_importance_weights(batch, model_actions)
    np.testing.assert_allclose(
        np.asarray(out.importance_weight).reshape(-1), [2.0, 0.0, 4.0]
    )


def test_importance_weights_uniform_fallback_and_clip():
    batch = _batch([0, 1], [1.0, 2.0])  # no log_prob -> uniform 1/3
    out = add_importance_weights(batch, jnp.array([[0], [1]]), max_importance_weight=2.5)
    np.testing.assert_allclose(
        np.asarray(out.importance_weight).reshape(-1), [2.5, 2.5]
    )


def test_policy_evaluator_replay_estimate():
    """Uniform logging (p=1/3): the IPS replay estimate equals the mean reward
    of accepted rows (importance weights cancel)."""
    ev = PolicyEvaluator()
    state = ev.init_state()
    batch = _batch([0, 1, 2, 0], [1.0, 5.0, 3.0, 2.0], log_probs=[1 / 3] * 4)
    model_actions = jnp.array([[0], [1], [0], [1]])  # accept rows 0, 1
    state, new_batch = ev.ingest_batch(state, batch, model_actions)
    state = ev.aggregate_across_instances(state)
    est = ev.get_avg_reward(state)
    np.testing.assert_allclose(est, (1.0 + 5.0) / 2, atol=1e-5)
    assert abs(float(state.frac_accepted) - 0.5) < 1e-6
    # rejected rows avg: (3+2)/2
    np.testing.assert_allclose(float(state.avg_reward_rejected), 2.5, atol=1e-5)
    r = ev.get_formatted_result_string(state)
    assert "Avg reward" in r


def test_policy_evaluator_inside_jit_scan():
    """The ingest path must run inside lax.scan (state is a pytree)."""
    ev = PolicyEvaluator()

    def body(state, rng):
        B, K = 8, 3
        feats = jax.random.normal(rng, (B, K, 2))
        batch = CBInput(
            context_arm_features=feats,
            action=jax.random.randint(rng, (B, 1), 0, K),
            reward=jax.random.uniform(rng, (B, 1)),
            log_prob=jnp.full((B, 1), jnp.log(1 / 3)),
        )
        model_actions = jnp.argmax(jnp.sum(feats, -1), axis=1)[:, None]
        state, _ = ev.ingest_batch(state, batch, model_actions)
        return state, None

    state, _ = jax.lax.scan(body, ev.init_state(), jax.random.split(jax.random.PRNGKey(0), 20))
    state = ev.aggregate_across_instances(state)
    est = ev.get_avg_reward(state)
    assert np.isfinite(est)
    assert float(state.sum_weight_all_data) == 160.0


def test_dynamic_bandit_linucb_beats_noise():
    """LinUCB's cumulative regret grows sublinearly: later-half per-step regret
    must be well below the first-half per-step regret."""
    agent, rewards, regrets = run_dynamic_bandit_env(
        num_unique_batches=5, batch_size=4, num_arms_per_episode=5,
        feature_dim=8, num_obs=120, rand_seed=3,
    )
    regrets = np.asarray(regrets)
    first_half = regrets[len(regrets) // 2] / (len(regrets) // 2)
    second_half = (regrets[-1] - regrets[len(regrets) // 2]) / (len(regrets) // 2)
    assert second_half < 0.5 * first_half, (first_half, second_half)


def test_deep_represent_linucb_learns_nonlinear_reward():
    """MSE drops and the greedy policy beats random on a reward the linear
    model can't represent (reward = |w.x|)."""
    from reagent_tpu.models.deep_represent_linucb import (
        DeepRepresentLinearRegressionUCB,
    )
    from reagent_tpu.training.cb.deep_represent_linucb_trainer import (
        DeepRepresentLinUCBTrainer,
    )

    rng = jax.random.PRNGKey(0)
    D, K, B = 6, 4, 32
    w = jax.random.normal(jax.random.PRNGKey(9), (D,))

    scorer = DeepRepresentLinearRegressionUCB(
        input_dim=D, sizes=[16, 4], activations=["relu", "relu"]
    )
    trainer = DeepRepresentLinUCBTrainer(scorer, lr=3e-3)
    state = trainer.init(rng)

    first_loss = last_loss = None
    for i in range(300):
        rng, sub = jax.random.split(rng)
        feats = jax.random.normal(sub, (B, K, D))
        rewards_all = jnp.abs(feats @ w)
        action = jax.random.randint(sub, (B, 1), 0, K)
        row = jnp.arange(B)
        batch = CBInput(
            context_arm_features=feats,
            action=action,
            reward=rewards_all[row, action.reshape(-1)][:, None],
        )
        state, m = trainer.train_step(state, batch)
        if first_loss is None:
            first_loss = float(m["mse_loss"])
        last_loss = float(m["mse_loss"])
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    # greedy over UCB picks better-than-random arms
    rng, sub = jax.random.split(rng)
    feats = jax.random.normal(sub, (256, K, D))
    rewards_all = jnp.abs(feats @ w)
    scores = trainer.score(state, CBInput(context_arm_features=feats), ucb_alpha=0.0)
    picked = rewards_all[jnp.arange(256), jnp.argmax(scores, axis=1)]
    assert float(picked.mean()) > 1.15 * float(rewards_all.mean())
