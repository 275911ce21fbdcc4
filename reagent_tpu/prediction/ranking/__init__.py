from reagent_tpu.prediction.ranking.predictor_wrapper import (
    DeterminantalPointProcessPredictorWrapper,
    Kernel,
)

__all__ = ["DeterminantalPointProcessPredictorWrapper", "Kernel"]
