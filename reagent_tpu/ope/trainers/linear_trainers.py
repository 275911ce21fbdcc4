"""Reward-model trainers for the bandit estimators.

Reference: reagent/ope/trainers/linear_trainers.py:1-363 (sklearn-backed
logistic/linear/decision-tree/SGD trainers with a common Trainer protocol).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class TrainingData:
    train_x: np.ndarray
    train_y: np.ndarray
    train_weight: Optional[np.ndarray] = None
    validation_x: Optional[np.ndarray] = None
    validation_y: Optional[np.ndarray] = None


class LinearTrainer:
    """Ridge regression (reference LinearTrainer)."""

    def __init__(self, alpha: float = 1.0):
        self.alpha = alpha
        self._model = None

    def train(self, data: TrainingData) -> None:
        from sklearn.linear_model import Ridge

        self._model = Ridge(alpha=self.alpha)
        self._model.fit(data.train_x, data.train_y, sample_weight=data.train_weight)

    def predict(self, x: np.ndarray) -> np.ndarray:
        assert self._model is not None, "call train first"
        return self._model.predict(x)

    def score(self, x: np.ndarray, y: np.ndarray) -> float:
        return float(self._model.score(x, y))


class LogisticRegressionTrainer(LinearTrainer):
    def __init__(self, C: float = 1.0):
        super().__init__()
        self.C = C

    def train(self, data: TrainingData) -> None:
        from sklearn.linear_model import LogisticRegression

        self._model = LogisticRegression(C=self.C, max_iter=1000)
        self._model.fit(data.train_x, data.train_y, sample_weight=data.train_weight)

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        return self._model.predict_proba(x)


class SGDClassifierTrainer(LinearTrainer):
    def __init__(self, loss: str = "log_loss", max_iter: int = 1000):
        super().__init__()
        self.loss = loss
        self.max_iter = max_iter

    def train(self, data: TrainingData) -> None:
        from sklearn.linear_model import SGDClassifier

        self._model = SGDClassifier(loss=self.loss, max_iter=self.max_iter)
        self._model.fit(data.train_x, data.train_y, sample_weight=data.train_weight)


class DecisionTreeTrainer(LinearTrainer):
    def __init__(self, max_depth: Optional[int] = None):
        super().__init__()
        self.max_depth = max_depth

    def train(self, data: TrainingData) -> None:
        from sklearn.tree import DecisionTreeRegressor

        self._model = DecisionTreeRegressor(max_depth=self.max_depth)
        self._model.fit(data.train_x, data.train_y, sample_weight=data.train_weight)
