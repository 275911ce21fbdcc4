"""Workflow option/result types (reference: reagent/workflow/types.py:63-161)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from reagent_tpu.data.data_module import Dataset, TableSpec  # noqa: F401 re-export


@dataclasses.dataclass
class ReaderOptions:
    minibatch_size: int = 512
    reader_pool_type: str = "thread"


@dataclasses.dataclass
class ResourceOptions:
    gpu: int = 0
    min_nodes: Optional[int] = None
    max_nodes: Optional[int] = None


@dataclasses.dataclass
class RLTrainingReport:
    td_loss: Optional[float] = None
    mean_reward: Optional[float] = None
    cpe_details: Optional[Any] = None


@dataclasses.dataclass
class RLTrainingOutput:
    output_paths: Dict[str, str] = dataclasses.field(default_factory=dict)
    validation_result: Optional[Any] = None
    publishing_result: Optional[Any] = None
    training_report: Optional[RLTrainingReport] = None
    logger_data: Dict[str, Any] = dataclasses.field(default_factory=dict)
