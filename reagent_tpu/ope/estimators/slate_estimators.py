"""Slate OPE estimators: PBM and pseudo-inverse / IPS variants.

Reference: reagent/ope/estimators/slate_estimators.py (1,551 LoC) — the core
estimators re-designed vectorized:

* DMEstimator        — position-weighted model scores
* IPSEstimator       — whole-slate importance sampling
* PBMEstimator       — position-based click model (per-position IS)
* PseudoInverseEstimator — slot-decomposed IS (Swaminathan et al. 2017)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from reagent_tpu.ope.estimators.estimator import Estimator, EstimatorResult


@dataclasses.dataclass
class SlateEstimatorInput:
    """N logged slates of K positions over M items.

    log_slate: [N, K] item ids; log_slate_prob: [N] whole-slate propensity;
    log_item_probs: [N, K, M] per-position behavior distribution;
    tgt_item_probs: [N, K, M] per-position target distribution;
    log_reward: [N] observed slate reward;
    position_weights: [K] (e.g. examination probabilities for PBM);
    item_rewards: [N, K, M] optional model of per-slot item reward.
    """

    log_slate: np.ndarray
    log_reward: np.ndarray
    log_item_probs: np.ndarray
    tgt_item_probs: np.ndarray
    log_slate_prob: Optional[np.ndarray] = None
    tgt_slate_prob: Optional[np.ndarray] = None
    position_weights: Optional[np.ndarray] = None
    item_rewards: Optional[np.ndarray] = None
    ground_truth_reward: Optional[float] = None

    @property
    def n(self):
        return self.log_slate.shape[0]

    @property
    def slots(self):
        return self.log_slate.shape[1]

    def slot_probs(self, probs: np.ndarray) -> np.ndarray:
        """probs of the logged item at each slot: [N, K]."""
        n, k = self.log_slate.shape
        return probs[np.arange(n)[:, None], np.arange(k)[None, :], self.log_slate]


def _res(input: SlateEstimatorInput, est: np.ndarray) -> EstimatorResult:
    return EstimatorResult(
        log_reward=float(np.mean(input.log_reward)),
        estimated_reward=float(np.mean(est)),
        ground_truth_reward=input.ground_truth_reward,
        estimated_reward_std_error=float(np.std(est) / np.sqrt(max(len(est), 1))),
    )


class DMEstimator(Estimator):
    def evaluate(self, input: SlateEstimatorInput, **kwargs) -> EstimatorResult:
        assert input.item_rewards is not None
        w = (
            input.position_weights
            if input.position_weights is not None
            else np.ones(input.slots)
        )
        est = np.sum(
            np.sum(input.tgt_item_probs * input.item_rewards, axis=2) * w, axis=1
        )
        return _res(input, est)


class IPSEstimator(Estimator):
    """Whole-slate IS: prod_k tgt/log of logged items (reference slate IPS)."""

    def __init__(self, clamp_max: Optional[float] = None, self_normalize: bool = False):
        self.clamp_max = clamp_max
        self.self_normalize = self_normalize

    def evaluate(self, input: SlateEstimatorInput, **kwargs) -> EstimatorResult:
        if input.log_slate_prob is not None and input.tgt_slate_prob is not None:
            w = input.tgt_slate_prob / np.maximum(input.log_slate_prob, 1e-12)
        else:
            ratio = input.slot_probs(input.tgt_item_probs) / np.maximum(
                input.slot_probs(input.log_item_probs), 1e-12
            )
            w = np.prod(ratio, axis=1)
        if self.clamp_max is not None:
            w = np.minimum(w, self.clamp_max)
        if self.self_normalize:
            w = w / max(np.mean(w), 1e-12)
        return _res(input, w * input.log_reward)


class PBMEstimator(Estimator):
    """Position-based model: reward decomposes per position; IS per slot.

    estimate = mean over slates of sum_k w_k * (tgt_k/log_k) * r/K-share
    (reference PBMEstimator; uses examination weights).
    """

    def __init__(self, clamp_max: Optional[float] = None):
        self.clamp_max = clamp_max

    def evaluate(self, input: SlateEstimatorInput, **kwargs) -> EstimatorResult:
        k = input.slots
        pos_w = (
            input.position_weights
            if input.position_weights is not None
            else np.ones(k)
        )
        ratio = input.slot_probs(input.tgt_item_probs) / np.maximum(
            input.slot_probs(input.log_item_probs), 1e-12
        )
        if self.clamp_max is not None:
            ratio = np.minimum(ratio, self.clamp_max)
        # reward share per slot weighted by examination probability
        share = pos_w / np.sum(pos_w)
        est = np.sum(ratio * share[None, :], axis=1) * input.log_reward
        return _res(input, est)


class PseudoInverseEstimator(Estimator):
    """Slot-decomposed IS (pseudo-inverse, Swaminathan et al. 2017): the
    per-slot ratio sum replaces the exploding product."""

    def evaluate(self, input: SlateEstimatorInput, **kwargs) -> EstimatorResult:
        k = input.slots
        ratio = input.slot_probs(input.tgt_item_probs) / np.maximum(
            input.slot_probs(input.log_item_probs), 1e-12
        )
        est = (np.sum(ratio, axis=1) - (k - 1)) * input.log_reward
        return _res(input, est)


# --------------------------------------------------------------------------
# Slate metrics (reference slate_estimators.py:798-909) — what "reward of a
# slate" means for a benchmark.  Vectorized over a batch of slates: input is
# per-slot item relevances [N, K], output per-slate reward [N].
# --------------------------------------------------------------------------


class SlateMetric:
    """Base: sum of slot rewards (reference :798-832)."""

    def slot_weights(self, slate_size: int) -> np.ndarray:
        return np.ones(slate_size)

    def slot_values(self, rewards: np.ndarray) -> np.ndarray:
        return rewards

    def calculate_reward(self, rewards: np.ndarray) -> np.ndarray:
        rewards = np.atleast_2d(np.asarray(rewards, np.float64))
        w = self.slot_weights(rewards.shape[1])
        return self.slot_values(rewards) @ w

    def __call__(self, rewards: np.ndarray) -> np.ndarray:
        return self.calculate_reward(rewards)


class DCGSlateMetric(SlateMetric):
    """(2^rel - 1) / log2(pos + 1) (reference :834-860)."""

    def slot_weights(self, slate_size: int) -> np.ndarray:
        return 1.0 / np.log2(np.arange(2, slate_size + 2, dtype=np.float64))

    def slot_values(self, rewards: np.ndarray) -> np.ndarray:
        return np.power(2.0, rewards) - 1.0


class NDCGSlateMetric(DCGSlateMetric):
    """DCG normalized by the ideal DCG over the full item-relevance vector
    (reference :863-888)."""

    def __init__(self, item_rewards: np.ndarray):
        self._sorted_rewards = np.sort(np.asarray(item_rewards, np.float64))[::-1]

    def calculate_reward(self, rewards: np.ndarray) -> np.ndarray:
        rewards = np.atleast_2d(np.asarray(rewards, np.float64))
        K = rewards.shape[1]
        assert len(self._sorted_rewards) >= K
        w = self.slot_weights(K)
        idcg = float((np.power(2.0, self._sorted_rewards[:K]) - 1.0) @ w)
        if idcg == 0:
            return np.zeros(rewards.shape[0])
        return (self.slot_values(rewards) @ w) / idcg


class ERRSlateMetric(SlateMetric):
    """Expected reciprocal rank (reference :891-909)."""

    def __init__(self, max_reward: float):
        self._max_reward = max_reward

    def slot_weights(self, slate_size: int) -> np.ndarray:
        return 1.0 / (np.arange(slate_size, dtype=np.float64) + 1.0)

    def calculate_reward(self, rewards: np.ndarray) -> np.ndarray:
        rewards = np.atleast_2d(np.asarray(rewards, np.float64))
        d = 2.0 ** self._max_reward
        r = (np.power(2.0, np.clip(rewards, 0.0, self._max_reward)) - 1.0) / d
        # err[i] = prod_{j<i}(1-r_j) * r_i — cumulative product along slots
        stop = np.cumprod(1.0 - r, axis=1)
        prior = np.concatenate([np.ones((r.shape[0], 1)), stop[:, :-1]], axis=1)
        err = prior * r
        return err @ self.slot_weights(r.shape[1])


# --------------------------------------------------------------------------
# Ranking distributions (reference :129-210): P(slate | item values)
# --------------------------------------------------------------------------


class RankingDistribution:
    """Base for distributions over rankings given item values."""

    def __init__(self, deterministic: bool = False):
        self._deterministic = deterministic

    def sample_ranking(self, values: np.ndarray, rng=None) -> np.ndarray:
        raise NotImplementedError


class PassThruDistribution(RankingDistribution):
    """Rank by raw item value (reference :168-186)."""

    def sample_ranking(self, values: np.ndarray, rng=None) -> np.ndarray:
        values = np.asarray(values, np.float64)
        if self._deterministic:
            return np.argsort(-values)
        rng = rng or np.random.default_rng()
        p = values - values.min()
        p = p / p.sum() if p.sum() > 0 else np.full(len(values), 1.0 / len(values))
        return rng.choice(len(values), size=len(values), replace=False, p=p)


class FrechetDistribution(RankingDistribution):
    """Frechet-sort: perturb values with Gumbel^(1/shape) noise then sort
    (reference :189-210); equivalent to samplers/frechet.py FrechetSort."""

    def __init__(self, shape: float, deterministic: bool = False):
        super().__init__(deterministic)
        self._shape = shape

    def sample_ranking(self, values: np.ndarray, rng=None) -> np.ndarray:
        values = np.asarray(values, np.float64)
        if self._deterministic:
            return np.argsort(-values)
        rng = rng or np.random.default_rng()
        gumbel = -np.log(-np.log(rng.uniform(size=values.shape)))
        return np.argsort(-(self._shape * np.log(np.maximum(values, 1e-12)) + gumbel))
