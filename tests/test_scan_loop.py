"""Scanned multi-step training loops == K sequential train_step calls."""

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.training import DQNTrainer, make_sampled_train_fn, make_scanned_train_fn


def _batch(rng, B=32, S=4, A=2):
    g = np.random.default_rng(rng)
    return rlt.DiscreteDqnInput(
        state=rlt.FeatureData(float_features=jnp.asarray(g.normal(size=(B, S)), jnp.float32)),
        next_state=rlt.FeatureData(float_features=jnp.asarray(g.normal(size=(B, S)), jnp.float32)),
        action=jnp.asarray(np.eye(A, dtype=np.float32)[g.integers(0, A, B)]),
        next_action=jnp.asarray(np.eye(A, dtype=np.float32)[g.integers(0, A, B)]),
        reward=jnp.asarray(g.normal(size=(B, 1)), jnp.float32),
        time_diff=jnp.ones((B, 1)),
        step=jnp.ones((B, 1), jnp.int32),
        not_terminal=jnp.ones((B, 1)),
        possible_actions_mask=jnp.ones((B, A)),
        possible_next_actions_mask=jnp.ones((B, A)),
    )


def _trainer():
    q = FullyConnectedDQN(state_dim=4, action_dim=2, sizes=[16], activations=["relu"])
    return DQNTrainer(
        q_network=q, rl=RLParameters(gamma=0.9, target_update_rate=0.1),
        optimizer={"Adam": {"lr": 1e-3}},
    )


def test_scanned_matches_sequential():
    trainer = _trainer()
    K = 5
    batches = [_batch(i) for i in range(K)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

    ts_seq = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    seq_losses = []
    for b in batches:
        ts_seq, m = trainer.train_step(ts_seq, b)
        seq_losses.append(float(m["td_loss"]))

    ts_scan = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    run = make_scanned_train_fn(trainer)
    ts_scan, metrics = run(ts_scan, stacked)

    np.testing.assert_allclose(
        np.asarray(metrics["td_loss"]), np.asarray(seq_losses), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ts_seq.q_params),
                    jax.tree_util.tree_leaves(ts_scan.q_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_sampled_matches_manual_gather():
    trainer = _trainer()
    dataset = _batch(42, B=256)
    K, MB = 4, 64
    run = make_sampled_train_fn(trainer, dataset, minibatch_size=MB, num_steps=K)
    ts = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    rng = jax.random.PRNGKey(7)
    ts2, metrics = run(ts, rng)
    assert metrics["td_loss"].shape == (K,)

    # replay the same index stream manually
    ts_manual = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    for r in jax.random.split(rng, K):
        idx = jax.random.randint(r, (MB,), 0, 256)
        mb = jax.tree_util.tree_map(
            lambda x: x[idx] if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == 256 else x,
            dataset,
        )
        ts_manual, m = trainer.train_step(ts_manual, mb)
    for a, b in zip(jax.tree_util.tree_leaves(ts_manual.q_params),
                    jax.tree_util.tree_leaves(ts2.q_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_sampled_rejects_mismatched_leaf():
    """A dataset leaf whose leading dim is not num_rows must fail fast with a
    clear error, not an opaque trace-time shape error (advisor round-3)."""
    import pytest

    trainer = _trainer()
    dataset = _batch(0, B=32)
    broken = dataset.replace(reward=dataset.reward[:16])
    with pytest.raises(ValueError, match="leading dim num_rows"):
        make_sampled_train_fn(trainer, broken, minibatch_size=4, num_steps=2)


def test_scan_rejects_nonstandard_train_step_signature():
    """Trainers whose train_step is not (state, batch) are rejected up front
    (advisor round-3: CEM/MultiStage/rng-taking variants)."""
    import pytest

    class OddTrainer:
        def train_step(self, state, batch, rng):
            return state, {}

    with pytest.raises(TypeError, match="standard"):
        make_scanned_train_fn(OddTrainer())
