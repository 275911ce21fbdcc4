"""End-to-end offline training pipeline.

Reference: reagent/workflow/training.py:59-323 — identify_and_train_network:
feature identification -> query/split data -> train -> CPE eval -> export
serving module -> validate -> publish.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

import reagent_tpu.model_managers  # noqa: F401 — registers model managers
import reagent_tpu.publishers  # noqa: F401 — registers publishers
import reagent_tpu.validators  # noqa: F401 — registers validators
from reagent_tpu.core.registry import MODEL_MANAGERS, PUBLISHERS, VALIDATORS
from reagent_tpu.data.data_module import (
    TableSpec,
    get_sample_range,
    iterate_minibatches,
    split_by_sample_range,
)
from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage
from reagent_tpu.evaluation.evaluator import Evaluator
from reagent_tpu.workflow.types import RLTrainingOutput, RLTrainingReport

logger = logging.getLogger(__name__)


def identify_and_train_network(
    input_table_spec: TableSpec,
    model: Dict[str, Any],
    num_epochs: int,
    output_dir: str = "/tmp/reagent_tpu_model",
    use_gpu: bool = False,
    seed: int = 0,
    minibatch_size: Optional[int] = None,
    warm_start_path: Optional[str] = None,
    reward_options: Optional[Dict[str, Any]] = None,
) -> RLTrainingOutput:
    """Reference: training.py:59-122."""
    manager = MODEL_MANAGERS.build(model)
    df = _load_table(input_table_spec)
    normalization_data_map = manager.run_feature_identification(df)
    return query_and_train(
        input_table_spec,
        model,
        num_epochs,
        output_dir=output_dir,
        use_gpu=use_gpu,
        seed=seed,
        normalization_data_map=normalization_data_map,
        warm_start_path=warm_start_path,
        reward_options=reward_options,
        minibatch_size=minibatch_size,
        _df=df,
        _manager=manager,
    )


def _load_table(spec: TableSpec) -> pd.DataFrame:
    assert spec.path, "TableSpec.path (parquet/pickle) required"
    if spec.path.endswith((".pkl", ".pickle")):
        return pd.read_pickle(spec.path)
    return pd.read_parquet(spec.path)


def query_and_train(
    input_table_spec: TableSpec,
    model: Dict[str, Any],
    num_epochs: int,
    output_dir: str,
    use_gpu: bool = False,
    seed: int = 0,
    normalization_data_map=None,
    minibatch_size: Optional[int] = None,
    warm_start_path: Optional[str] = None,
    reward_options: Optional[Dict[str, Any]] = None,
    _df: Optional[pd.DataFrame] = None,
    _manager=None,
) -> RLTrainingOutput:
    """Reference: training.py:106-213."""
    manager = _manager or MODEL_MANAGERS.build(model)
    df = _df if _df is not None else _load_table(input_table_spec)
    if reward_options:
        from reagent_tpu.data.reward_options import RewardOptions, apply_reward_options

        opts = (
            reward_options
            if isinstance(reward_options, RewardOptions)
            else RewardOptions(**reward_options)
        )
        df = apply_reward_options(df, opts)
    calc_cpe = getattr(manager, "eval_params", None) and manager.eval_params.calc_cpe_in_training
    sample_range = get_sample_range(input_table_spec, bool(calc_cpe))
    train_df = split_by_sample_range(df, sample_range.train_sample_range)
    eval_df = split_by_sample_range(df, sample_range.eval_sample_range)
    logger.info("train rows=%d eval rows=%d", len(train_df), len(eval_df))
    return train_workflow(
        manager,
        train_df,
        eval_df,
        num_epochs=num_epochs,
        output_dir=output_dir,
        seed=seed,
        normalization_data_map=normalization_data_map,
        minibatch_size=minibatch_size,
        warm_start_path=warm_start_path,
    )


def train_workflow(
    manager,
    train_df: pd.DataFrame,
    eval_df: pd.DataFrame,
    num_epochs: int,
    output_dir: str,
    seed: int = 0,
    normalization_data_map=None,
    minibatch_size: Optional[int] = None,
    warm_start_path: Optional[str] = None,
) -> RLTrainingOutput:
    """Reference: training.py:214-323.

    ``warm_start_path``: incremental training — if the file exists, the
    trainer state (params, optimizer state, targets, step) is restored from
    it before training, and it is OVERWRITTEN with the final state after
    (the reference's resume_from_checkpoint + save-after-fit semantics,
    workflow/utils.py:161,173-176 there).
    """
    if normalization_data_map is None:
        normalization_data_map = manager.run_feature_identification(train_df)

    trainer = manager.build_trainer(normalization_data_map)
    batch_preprocessor = manager.build_batch_preprocessor(normalization_data_map)
    bs = minibatch_size or manager._param.minibatch_size

    state_dim = manager.state_dim(normalization_data_map)
    if hasattr(manager, "init_trainer_state"):
        trainer_state = manager.init_trainer_state(
            trainer, jax.random.PRNGKey(seed), state_dim
        )
    else:
        trainer_state = trainer.init(jax.random.PRNGKey(seed), jnp.zeros((1, state_dim)))

    if warm_start_path and os.path.exists(warm_start_path):
        from reagent_tpu.utils.checkpointing import restore_checkpoint

        trainer_state = restore_checkpoint(warm_start_path, trainer_state)
        logger.info("warm-started trainer state from %s", warm_start_path)

    reporter = manager.get_reporter()
    t0 = time.perf_counter()
    last_loss = None
    for epoch in range(num_epochs):
        for batch_df in iterate_minibatches(train_df, bs, seed=seed + epoch):
            batch = batch_preprocessor(batch_df)
            trainer_state, metrics = trainer.train_step(trainer_state, batch)
            if reporter is not None:
                reporter.log(**metrics)
        if reporter is not None:
            reporter.flush(epoch)
        loss_key = "td_loss" if "td_loss" in metrics else (
            "q1_loss" if "q1_loss" in metrics else next(iter(metrics))
        )
        last_loss = float(metrics[loss_key])
        logger.info("epoch %d td_loss=%.4f", epoch, last_loss)
    logger.info("training took %.1fs", time.perf_counter() - t0)

    report = RLTrainingReport(td_loss=last_loss)
    if len(eval_df) > 0 and getattr(trainer, "calc_cpe_in_training", False):
        edp = _build_edp(manager, trainer, trainer_state, batch_preprocessor, eval_df, bs)
        if edp is not None:
            evaluator = Evaluator(
                action_names=manager.action_names, gamma=trainer.gamma
            )
            report.cpe_details = evaluator.evaluate_post_training(edp)

    if warm_start_path:
        from reagent_tpu.utils.checkpointing import save_checkpoint

        os.makedirs(os.path.dirname(warm_start_path) or ".", exist_ok=True)
        save_checkpoint(warm_start_path, trainer_state)
        logger.info("saved warm-start state to %s", warm_start_path)

    serving = manager.build_serving_module(
        trainer, trainer_state, normalization_data_map
    )
    os.makedirs(output_dir, exist_ok=True)
    model_path = os.path.join(output_dir, "serving_model")
    if hasattr(serving, "save"):
        serving.save(model_path)
    else:
        model_path = ""
    return RLTrainingOutput(
        output_paths={"default_model": model_path}, training_report=report
    )


def _build_edp(manager, trainer, trainer_state, batch_preprocessor, eval_df, bs):
    """Accumulate an EvaluationDataPage over the eval split (ref dqn_trainer_base.py:455-495)."""
    edp = None
    for batch_df in iterate_minibatches(eval_df, min(bs, max(len(eval_df), 1)), drop_last=False):
        batch = batch_preprocessor(batch_df)
        page = EvaluationDataPage.create_from_tensors_dqn(
            trainer,
            trainer_state,
            np.asarray(batch.extras.mdp_id),
            np.asarray(batch.extras.sequence_number),
            batch.state.float_features,
            batch.action,
            jnp.clip(batch.extras.action_probability, 1e-6),
            batch.reward,
            batch.possible_actions_mask,
        )
        edp = page if edp is None else edp.append(page)
    if edp is not None:
        edp = edp.sort().compute_values(trainer.gamma)
        edp.validate()
    return edp


def run_validator(validator_config, training_output: RLTrainingOutput) -> RLTrainingOutput:
    """Reference: training.py:326-336."""
    validator = VALIDATORS.build(validator_config)
    result = validator.validate(training_output)
    return RLTrainingOutput(
        output_paths=training_output.output_paths,
        validation_result=result,
        training_report=training_output.training_report,
    )


def run_publisher(
    publisher_config, model_config, training_output: RLTrainingOutput, recurring_period=None
) -> RLTrainingOutput:
    """Reference: training.py:337-360."""
    publisher = PUBLISHERS.build(publisher_config)
    result = publisher.publish(model_config, training_output, recurring_period)
    return RLTrainingOutput(
        output_paths=training_output.output_paths,
        validation_result=training_output.validation_result,
        publishing_result=result,
        training_report=training_output.training_report,
    )
