"""Reporter depth parity: action histograms, per-action value summaries, and
recent-reward windows flow from real trainer steps into TensorBoard event
files (reference reporting/discrete_dqn_reporter.py:30-70,
slate_q_reporter.py:20-55)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.core.tracker import summary_writer_context
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.reporting.reporters import DiscreteDQNReporter, SlateQReporter
from reagent_tpu.training import DQNTrainer


def _batch(B=16, obs=4, A=2, seed=0):
    rng = np.random.default_rng(seed)
    action_idx = rng.integers(0, A, B)
    return rlt.DiscreteDqnInput(
        state=rlt.FeatureData(
            float_features=jnp.asarray(rng.normal(size=(B, obs)), jnp.float32)
        ),
        next_state=rlt.FeatureData(
            float_features=jnp.asarray(rng.normal(size=(B, obs)), jnp.float32)
        ),
        action=jax.nn.one_hot(jnp.asarray(action_idx), A),
        next_action=jax.nn.one_hot(jnp.asarray(rng.integers(0, A, B)), A),
        reward=jnp.asarray(rng.normal(size=(B, 1)), jnp.float32),
        time_diff=jnp.ones((B, 1)),
        step=jnp.ones((B, 1), jnp.int32),
        not_terminal=jnp.ones((B, 1)),
        possible_actions_mask=jnp.ones((B, A)),
        possible_next_actions_mask=jnp.ones((B, A)),
    )


def _run_dqn_with_reporter(tmp_path, steps=5):
    from torch.utils.tensorboard import SummaryWriter

    q_net = FullyConnectedDQN(
        state_dim=4, action_dim=2, sizes=[16], activations=["relu"]
    )
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.9, target_update_rate=0.5),
        optimizer={"Adam": {"lr": 1e-2}},
        emit_reporter_arrays=True,
    )
    state = trainer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    reporter = DiscreteDQNReporter(actions=["left", "right"])
    writer = SummaryWriter(log_dir=str(tmp_path))
    with summary_writer_context(writer):
        for i in range(steps):
            state, metrics = trainer.train_step(state, _batch(seed=i))
            reporter.log(**metrics)
        flushed = reporter.flush(epoch=0)
    writer.close()
    return reporter, flushed


def _load_events(tmp_path):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    return acc


def test_dqn_reporter_trainer_arrays(tmp_path):
    reporter, flushed = _run_dqn_with_reporter(tmp_path)
    # scalar aggregates still flush
    assert "td_loss" in flushed and np.isfinite(flushed["td_loss"])
    # action-count distributions over the logged one-hot actions
    counts = reporter.observer("logged_actions")
    dist = counts.get_cumulative_distributions()
    assert set(dist) == {"left", "right"}
    assert sum(dist.values()) == pytest.approx(1.0)
    assert all(v > 0 for v in dist.values())
    # recent-rewards ring buffer caps at its window
    recent = reporter.observer("recent_rewards")
    assert len(recent.values) == 5 * 16  # < window, all retained
    # per-action model-value summaries
    fba = reporter.observer("model_values")
    assert set(fba.values["mean"]) == {"left", "right"}
    assert len(fba.values["mean"]["left"]) == 5


def test_dqn_reporter_writes_tb_events(tmp_path):
    _run_dqn_with_reporter(tmp_path)
    acc = _load_events(tmp_path)
    scalars = set(acc.Tags()["scalars"])
    histos = set(acc.Tags()["histograms"])
    # action-count scalars (reference TensorBoardActionCountAggregator)
    assert {"actions/logged/left", "actions/logged/right"} <= scalars
    assert {"actions/model/left", "actions/model/right"} <= scalars
    # per-action model-value histograms + means
    assert {
        "train/model_values/left",
        "train/model_values/right",
        "td_loss",
        "reward/logged",
    } <= histos
    assert "train/model_values/left/mean" in scalars
    # every step contributed an action-count point
    assert len(acc.Scalars("actions/logged/left")) == 5


def test_slate_q_reporter_recent_rewards(tmp_path):
    from torch.utils.tensorboard import SummaryWriter

    reporter = SlateQReporter(recent_window_size=32)
    writer = SummaryWriter(log_dir=str(tmp_path))
    with summary_writer_context(writer):
        for i in range(8):
            reporter.log(
                td_loss=np.float32(1.0 / (i + 1)),
                logged_rewards=np.arange(10, dtype=np.float32) + i,
            )
        flushed = reporter.flush(epoch=0)
    writer.close()
    assert flushed["td_loss"] > 0
    # ring buffer keeps only the newest window
    recent = reporter.observer("recent_rewards")
    assert len(recent.values) == 32
    assert recent.values[-1] == pytest.approx(16.0)
    acc = _load_events(tmp_path)
    assert {"td_loss", "reward/logged"} <= set(acc.Tags()["histograms"])
