"""Prediction/export: bundle normalization + policy into a serving artifact.

Reference: reagent/prediction/predictor_wrapper.py:94-150 — there,
``*WithPreprocessor`` modules are traced + scripted into one TorchScript file
that RASP's C++ scorer loads.

TPU-native design: the artifact is a directory with a JSON manifest
(normalization spec, action names, layer topology) plus a flat float32 weight
blob — loadable by the Python predictor (jit fn) AND by the C++ serving
scorer without any framework dependency.
"""

from reagent_tpu.prediction.predictor_wrapper import (
    ActorPredictorWrapper,
    DiscreteDqnPredictorWrapper,
    ParametricDqnPredictorWrapper,
)

__all__ = [
    "DiscreteDqnPredictorWrapper",
    "ParametricDqnPredictorWrapper",
    "ActorPredictorWrapper",
]
