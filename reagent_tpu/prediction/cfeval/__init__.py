from reagent_tpu.prediction.cfeval.predictor_wrapper import (
    BanditRewardNetPredictorWrapper,
)

__all__ = ["BanditRewardNetPredictorWrapper"]
