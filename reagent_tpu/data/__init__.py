"""Data layer: timeline transform, train/eval split, dataset iteration.

Reference: preprocessing/src/main/scala Timeline.scala (Spark ETL),
reagent/data/ (ManualDataModule, OssDataFetcher), reagent/workflow/utils.py
(petastorm readers).

TPU-native design: the timeline transform is a columnar pandas/pyarrow
group-shift (same schema contract as the Scala job); datasets iterate parquet
into fixed-shape device batches.
"""

from reagent_tpu.data.timeline import multi_step_timeline_transform, timeline_transform
from reagent_tpu.data.data_module import get_sample_range, TableSpec, Dataset

__all__ = [
    "timeline_transform",
    "multi_step_timeline_transform",
    "get_sample_range",
    "TableSpec",
    "Dataset",
]
