"""CPE estimator correctness (mirrors reference test/evaluation tests).

Analytic ground truths: with logged propensity p_l and target propensity p_t,
IPS = E[(p_t/p_l) r]; with a perfect reward model DM = E_pi[r]; DR is exact
when either the model or propensities are exact.
"""

import numpy as np
import pytest

from reagent_tpu.evaluation import (
    DoublyRobustEstimator,
    EvaluationDataPage,
    Evaluator,
    SequentialDoublyRobustEstimator,
    WeightedSequentialDoublyRobustEstimator,
)
from reagent_tpu.evaluation.evaluation_data_page import compute_values_for_mdps


def _edp_bandit(N=4000, seed=0):
    """One-step episodes. Logged: uniform; target: always action 0.

    True reward: action 0 -> 1.0, action 1 -> 0.0.  Target policy value = 1.0.
    Logged value = 0.5.
    """
    rng = np.random.default_rng(seed)
    actions = rng.integers(0, 2, N)
    action_mask = np.eye(2)[actions]
    rewards = (actions == 0).astype(np.float64).reshape(-1, 1)
    model_propensities = np.tile([1.0, 0.0], (N, 1))  # target: always action 0
    model_rewards = np.tile([1.0, 0.0], (N, 1))  # perfect reward model
    model_values = np.tile([1.0, 0.0], (N, 1))  # Q == reward (1-step)
    return EvaluationDataPage(
        mdp_id=np.arange(N).reshape(-1, 1),
        sequence_number=np.zeros((N, 1)),
        logged_propensities=np.full((N, 1), 0.5),
        logged_rewards=rewards,
        action_mask=action_mask,
        model_propensities=model_propensities,
        model_rewards=model_rewards,
        model_rewards_for_logged_action=(action_mask * model_rewards).sum(
            1, keepdims=True
        ),
        model_values=model_values,
    )


def test_dm_ips_dr_analytic():
    edp = _edp_bandit()
    dm, ips, dr = DoublyRobustEstimator().estimate(edp)
    # true target-policy value is 1.0; logged value 0.5 -> normalized 2.0
    assert dm.raw == pytest.approx(1.0, abs=1e-6)
    assert ips.raw == pytest.approx(1.0, abs=0.05)
    assert dr.raw == pytest.approx(1.0, abs=0.05)
    assert dm.normalized == pytest.approx(2.0, rel=0.05)


def test_ips_unbiased_under_same_policy():
    edp = _edp_bandit()
    # target == logged (uniform): IPS == mean logged reward
    edp = edp.replace(model_propensities=np.full_like(edp.model_propensities, 0.5))
    _, ips, _ = DoublyRobustEstimator().estimate(edp)
    assert ips.raw == pytest.approx(float(edp.logged_rewards.mean()), abs=1e-6)
    assert ips.normalized == pytest.approx(1.0, abs=1e-6)


def test_sequential_dr_single_step_matches_dr():
    edp = _edp_bandit(N=2000)
    sdr = SequentialDoublyRobustEstimator(gamma=0.9).estimate(edp)
    assert sdr.raw == pytest.approx(1.0, abs=0.05)


def _edp_two_step(N=500, gamma=1.0):
    """N two-step episodes, logged == target == deterministic action 0.

    reward 1 at each step -> episode value 2.0 under gamma=1.
    """
    mdp_id = np.repeat(np.arange(N), 2).reshape(-1, 1)
    seq = np.tile([0, 1], N).reshape(-1, 1)
    n = 2 * N
    action_mask = np.tile([1.0, 0.0], (n, 1))
    model_propensities = np.tile([1.0, 0.0], (n, 1))
    rewards = np.ones((n, 1))
    # Q(s0, a0) = 2, Q(s1, a0) = 1 under gamma=1
    model_values = np.zeros((n, 2))
    model_values[0::2, 0] = 2.0
    model_values[1::2, 0] = 1.0
    return EvaluationDataPage(
        mdp_id=mdp_id,
        sequence_number=seq,
        logged_propensities=np.ones((n, 1)),
        logged_rewards=rewards,
        action_mask=action_mask,
        model_propensities=model_propensities,
        model_rewards=model_values.copy(),
        model_rewards_for_logged_action=(action_mask * model_values).sum(1, keepdims=True),
        model_values=model_values,
    )


def test_sequential_dr_two_step_exact():
    edp = _edp_two_step()
    sdr = SequentialDoublyRobustEstimator(gamma=1.0).estimate(edp)
    assert sdr.raw == pytest.approx(2.0, abs=1e-5)
    assert sdr.normalized == pytest.approx(1.0, abs=1e-5)


def test_magic_two_step_exact():
    edp = _edp_two_step()
    est = WeightedSequentialDoublyRobustEstimator(gamma=1.0).estimate(
        edp, num_j_steps=1, whether_self_normalize_importance_weights=True
    )
    assert est.raw == pytest.approx(2.0, abs=1e-4)
    magic = WeightedSequentialDoublyRobustEstimator(gamma=1.0).estimate(
        edp, num_j_steps=3, whether_self_normalize_importance_weights=True
    )
    assert magic.raw == pytest.approx(2.0, abs=0.05)


def test_compute_values_for_mdps():
    rewards = np.array([[1.0], [1.0], [5.0]])
    mdp_ids = np.array([[0], [0], [1]])
    seq = np.array([[0], [1], [0]])
    vals = compute_values_for_mdps(rewards, mdp_ids, seq, gamma=0.5)
    np.testing.assert_allclose(vals.reshape(-1), [1.5, 1.0, 5.0])


def test_edp_sort_and_append():
    edp = _edp_bandit(N=10)
    shuffled_ids = np.array([3, 1, 2, 0, 4, 9, 7, 5, 8, 6]).reshape(-1, 1)
    edp = edp.replace(mdp_id=shuffled_ids)
    s = edp.sort()
    assert np.all(np.diff(s.mdp_id.reshape(-1)) >= 0)
    both = edp.append(edp)
    assert both.logged_rewards.shape[0] == 20


def test_evaluator_full_suite():
    edp = _edp_two_step(N=100)
    evaluator = Evaluator(action_names=["a", "b"], gamma=1.0)
    details = evaluator.evaluate_post_training(edp)
    details.reward_estimates.check_estimates_exist()
    assert details.reward_estimates.magic is not None
    assert details.reward_estimates.sequential_doubly_robust.raw == pytest.approx(2.0, abs=1e-4)
    # action stats only populated when the EDP carries q-values/action idxs
    edp2 = edp.replace(
        optimal_q_values=np.asarray(edp.model_values),
        eval_action_idxs=np.zeros(edp.logged_rewards.shape[0], dtype=np.int64),
    )
    details2 = evaluator.evaluate_post_training(edp2)
    assert details2.action_distribution == {"a": 1.0, "b": 0.0}
    assert details2.q_value_means is not None


def test_parametric_dqn_edp():
    """create_from_tensors_parametric_dqn smoke + internal consistency
    (reference evaluation_data_page.py:186-305)."""
    import jax
    import jax.numpy as jnp

    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.evaluation.ope_adapter import OPEstimatorAdapter
    from reagent_tpu.models.critic import FullyConnectedCritic
    from reagent_tpu.ope.estimators.contextual_bandits_estimators import (
        DoublyRobustEstimator as OpeDR,
    )
    from reagent_tpu.training import ParametricDQNTrainer

    B, M, state_dim = 16, 3, 4
    net_kw = dict(state_dim=state_dim, action_dim=M, sizes=[16], activations=["relu"])
    trainer = ParametricDQNTrainer(
        q_network=FullyConnectedCritic(**net_kw),
        rl=RLParameters(gamma=0.9, target_update_rate=0.1, temperature=0.5),
        reward_network=FullyConnectedCritic(**net_kw),
    )
    ts = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, state_dim)), jnp.zeros((1, M)))

    rng = np.random.default_rng(0)
    states = jnp.asarray(rng.normal(size=(B, state_dim)).astype(np.float32))
    logged_idx = rng.integers(0, M, B)
    actions = jnp.asarray(np.eye(M, dtype=np.float32)[logged_idx])
    possible_actions = jnp.asarray(np.tile(np.eye(M, dtype=np.float32), (B, 1)))
    edp = EvaluationDataPage.create_from_tensors_parametric_dqn(
        trainer,
        ts,
        mdp_ids=np.arange(B).reshape(-1, 1),
        sequence_numbers=np.zeros((B, 1)),
        states=states,
        actions=actions,
        propensities=jnp.full((B, 1), 1.0 / M),
        rewards=jnp.asarray(rng.uniform(size=(B, 1)).astype(np.float32)),
        possible_actions_mask=jnp.ones((B, M)),
        possible_actions=possible_actions,
        max_num_actions=M,
    )
    edp.validate()
    assert edp.model_values.shape == (B, M)
    assert edp.model_propensities.shape == (B, M)
    np.testing.assert_allclose(edp.model_propensities.sum(axis=1), 1.0, atol=1e-5)
    # the logged one-hot action must be recovered exactly
    np.testing.assert_array_equal(np.argmax(edp.action_mask, axis=1), logged_idx)
    # reward net consistency: row gather == direct forward on the logged action
    np.testing.assert_allclose(
        edp.model_rewards[np.arange(B), logged_idx],
        edp.model_rewards_for_logged_action.reshape(-1),
        atol=1e-5,
    )
    # the full CPE pipeline consumes it
    _, _, dr = DoublyRobustEstimator().estimate(edp)
    assert np.isfinite(dr.raw)
    assert np.isfinite(OPEstimatorAdapter(OpeDR()).estimate(edp).raw)


def test_create_from_training_batch_dispatch():
    """EDP factory dispatch on the typed batch (reference
    evaluation_data_page.py:53-88)."""
    import jax
    import jax.numpy as jnp

    from reagent_tpu.core import types as rlt
    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.training import DQNTrainer

    B, S, A = 12, 4, 3
    rng = np.random.default_rng(0)
    trainer = DQNTrainer(
        q_network=FullyConnectedDQN(
            state_dim=S, action_dim=A, sizes=[8], activations=["relu"]
        ),
        rl=RLParameters(gamma=0.9, target_update_rate=0.1),
    )
    ts = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, S)))
    actions = rng.integers(0, A, B)
    batch = rlt.DiscreteDqnInput(
        state=rlt.FeatureData(
            float_features=jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
        ),
        next_state=rlt.FeatureData(
            float_features=jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
        ),
        action=jnp.asarray(np.eye(A, dtype=np.float32)[actions]),
        next_action=jnp.asarray(np.eye(A, dtype=np.float32)[rng.integers(0, A, B)]),
        reward=jnp.asarray(rng.uniform(size=(B, 1)).astype(np.float32)),
        time_diff=jnp.ones((B, 1)),
        step=jnp.ones((B, 1), jnp.int32),
        not_terminal=jnp.ones((B, 1)),
        possible_actions_mask=jnp.ones((B, A)),
        possible_next_actions_mask=jnp.ones((B, A)),
        extras=rlt.ExtraData(
            mdp_id=jnp.arange(B),
            sequence_number=jnp.zeros(B, jnp.int32),
            action_probability=jnp.full((B, 1), 1.0 / A),
        ),
    )
    edp = EvaluationDataPage.create_from_training_batch(batch, trainer, ts)
    edp.validate()
    assert edp.model_propensities.shape == (B, A)
    np.testing.assert_array_equal(np.argmax(edp.action_mask, axis=1), actions)

    with pytest.raises(NotImplementedError):
        EvaluationDataPage.create_from_training_batch(object(), trainer, ts)
