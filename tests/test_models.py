"""Model zoo smoke + math tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.models import (
    CategoricalDQN,
    DuelingQNetwork,
    FullyConnectedActor,
    FullyConnectedCritic,
    FullyConnectedDQN,
    GaussianFullyConnectedActor,
    ParametricDuelingQNetwork,
    ValueNetwork,
)
from reagent_tpu.models.bcq import bcq_mask_q_values


def test_fully_connected_dqn_shapes():
    net = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16, 8], activations=["relu", "relu"])
    params = net.init(jax.random.PRNGKey(0), net.input_prototype())
    q = net.apply(params, jnp.ones((7, 4)))
    assert q.shape == (7, 2)


def test_dueling_q_identity():
    net = DuelingQNetwork(state_dim=4, action_dim=3, layers=[16], activations=["relu"])
    params = net.init(jax.random.PRNGKey(0), net.input_prototype())
    q = net.apply(params, jnp.ones((5, 4)))
    assert q.shape == (5, 3)


def test_parametric_dueling():
    net = ParametricDuelingQNetwork(state_dim=4, action_dim=2, layers=[16], activations=["relu"])
    s, a = net.input_prototype()
    params = net.init(jax.random.PRNGKey(0), s, a)
    q = net.apply(params, jnp.ones((5, 4)), jnp.ones((5, 2)))
    assert q.shape == (5, 1)


def test_categorical_dqn_distribution():
    net = CategoricalDQN(
        state_dim=4, action_dim=2, num_atoms=11, qmin=-10, qmax=10,
        sizes=[16], activations=["relu"],
    )
    params = net.init(jax.random.PRNGKey(0), net.input_prototype(), method="log_dist")
    log_dist = net.apply(params, jnp.ones((3, 4)), method="log_dist")
    assert log_dist.shape == (3, 2, 11)
    np.testing.assert_allclose(np.exp(log_dist).sum(-1), 1.0, rtol=1e-5)
    q = net.apply(params, jnp.ones((3, 4)))
    assert q.shape == (3, 2)
    assert np.all(np.abs(np.asarray(q)) <= 10.0)


def test_critic():
    net = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[8], activations=["relu"])
    s, a = net.input_prototype()
    params = net.init(jax.random.PRNGKey(0), s, a)
    assert net.apply(params, jnp.ones((4, 3)), jnp.ones((4, 1))).shape == (4, 1)


def test_gaussian_actor_log_prob_consistency():
    net = GaussianFullyConnectedActor(
        state_dim=3, action_dim=2, sizes=[16], activations=["relu"]
    )
    obs = jnp.ones((6, 3))
    params = net.init(jax.random.PRNGKey(0), obs)
    out = net.apply(params, obs, jax.random.PRNGKey(1))
    assert out.action.shape == (6, 2)
    assert np.all(np.abs(np.asarray(out.action)) <= 1.0)
    # log_prob of the sampled action recomputed externally must match forward's
    lp = net.apply(params, obs, out.action, method="get_log_prob")
    np.testing.assert_allclose(np.asarray(lp), np.asarray(out.log_prob), atol=1e-3)
    # deterministic mean path
    out_det = net.apply(params, obs)
    np.testing.assert_allclose(
        np.asarray(out_det.action), np.asarray(out_det.squashed_mean), atol=1e-6
    )


def test_deterministic_actor_bounds():
    net = FullyConnectedActor(state_dim=3, action_dim=2, sizes=[8], activations=["relu"])
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
    out = net.apply(params, jnp.ones((4, 3)))
    assert np.all(np.abs(np.asarray(out.action)) <= 1.0)


def test_value_network():
    net = ValueNetwork(state_dim=5, sizes=[8], activations=["relu"])
    params = net.init(jax.random.PRNGKey(0), net.input_prototype())
    assert net.apply(params, jnp.ones((3, 5))).shape == (3, 1)


def test_bcq_masking():
    q = jnp.array([[1.0, 2.0, 3.0]])
    logits = jnp.array([[10.0, 0.0, 10.0]])  # middle action unlikely
    masked = bcq_mask_q_values(q, logits, drop_threshold=0.1)
    assert np.asarray(masked)[0, 1] < -1e30
    assert np.asarray(masked)[0, 0] == 1.0


def test_residual_and_sequential_wrappers():
    """ResidualWrapper / Sequential / use_skip_connections
    (reference models/residual_wrapper.py, models/containers.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reagent_tpu.models.fully_connected_network import (
        FullyConnectedNetwork,
        ResidualWrapper,
        Sequential,
    )

    net = FullyConnectedNetwork(
        sizes=[4, 8, 8, 2], activations=["relu", "relu", "linear"],
        use_skip_connections=True,
    )
    p = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    assert net.apply(p, jnp.ones((2, 4))).shape == (2, 2)

    inner = FullyConnectedNetwork(sizes=[4, 4], activations=["relu"])
    rw = ResidualWrapper(module=inner)
    p = rw.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    x = jnp.ones((1, 4))
    expected = x + inner.apply({"params": p["params"]["module"]}, x)
    np.testing.assert_allclose(np.asarray(rw.apply(p, x)), np.asarray(expected), rtol=1e-6)

    seq = Sequential(layers=(
        FullyConnectedNetwork(sizes=[4, 8], activations=["relu"]),
        FullyConnectedNetwork(sizes=[8, 2], activations=["linear"]),
    ))
    p = seq.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    assert seq.apply(p, jnp.ones((3, 4))).shape == (3, 2)


def test_trainer_preprocessor_dispatch():
    """Signature-driven batch-maker dispatch (ref trainer_preprocessor.py:32-57)."""
    import jax.numpy as jnp
    import pytest

    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.gym.preprocessors import make_trainer_preprocessor
    from reagent_tpu.models import FullyConnectedCritic, FullyConnectedDQN
    from reagent_tpu.models.actor import GaussianFullyConnectedActor
    from reagent_tpu.training import DQNTrainer
    from reagent_tpu.training.sac_trainer import SACTrainer

    q = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[8], activations=["relu"])
    mk = make_trainer_preprocessor(DQNTrainer(q_network=q, rl=RLParameters()), num_actions=2)
    batch = mk({
        "state": jnp.zeros((2, 4)), "action": jnp.zeros(2, jnp.int32),
        "next_action": jnp.zeros(2, jnp.int32), "reward": jnp.ones(2),
        "next_state": jnp.zeros((2, 4)), "terminal": jnp.zeros(2, bool),
        "step": jnp.ones(2, jnp.int32),
    })
    assert type(batch).__name__ == "DiscreteDqnInput"

    actor = GaussianFullyConnectedActor(state_dim=3, action_dim=1, sizes=[8], activations=["relu"])
    c = FullyConnectedCritic(state_dim=3, action_dim=1, sizes=[8], activations=["relu"])
    mk2 = make_trainer_preprocessor(SACTrainer(actor_network=actor, q1_network=c))
    assert mk2.__name__ == "make_policy_network_batch"

    with pytest.raises(AssertionError):
        make_trainer_preprocessor(DQNTrainer(q_network=q, rl=RLParameters()))
