"""ModelManager base: ties net builder + trainer + data + reporter + export.

Reference: reagent/model_managers/model_manager.py:37-230.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from reagent_tpu.core.parameters import NormalizationData


class ModelManager:
    def build_trainer(
        self,
        normalization_data_map: Dict[str, NormalizationData],
        use_gpu: bool = False,
    ):
        raise NotImplementedError

    def create_policy(self, trainer, trainer_state, serving: bool = False):
        raise NotImplementedError

    def build_serving_module(
        self, trainer, trainer_state, normalization_data_map: Dict[str, NormalizationData]
    ):
        raise NotImplementedError

    def run_feature_identification(self, df) -> Dict[str, NormalizationData]:
        raise NotImplementedError

    def get_reporter(self):
        """Per-algorithm reporter for the training loop (reference
        model_manager.py get_reporter); None = no reporting."""
        return None
