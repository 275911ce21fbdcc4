"""Contextual-bandit OPE estimators: DM, IPS, DR, Switch, SwitchDR.

Reference: reagent/ope/estimators/contextual_bandits_estimators.py:84-750
(arXiv:1612.01205 for DR; Switch from Wang et al. arXiv:1612.01205 §4-5).

Vectorized re-design: the input carries arrays, not per-sample objects.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from reagent_tpu.ope.estimators.estimator import Estimator, EstimatorResult

PROPENSITY_THRESHOLD = 1e-6


@dataclasses.dataclass
class BanditsEstimatorInput:
    """Arrays over N logged samples with A actions.

    log_action: [N] int; log_reward: [N]; log_propensities: [N, A] behavior
    policy; tgt_propensities: [N, A] target policy; dm_rewards: [N, A]
    reward-model predictions (optional); ground_truth_reward: scalar optional.
    """

    log_action: np.ndarray
    log_reward: np.ndarray
    log_propensities: np.ndarray
    tgt_propensities: np.ndarray
    dm_rewards: Optional[np.ndarray] = None
    ground_truth_reward: Optional[float] = None

    @property
    def n(self) -> int:
        return self.log_action.shape[0]

    @property
    def num_actions(self) -> int:
        return self.log_propensities.shape[1]

    def logged_propensity_of_action(self) -> np.ndarray:
        return self.log_propensities[np.arange(self.n), self.log_action]

    def target_propensity_of_action(self) -> np.ndarray:
        return self.tgt_propensities[np.arange(self.n), self.log_action]

    def importance_weights(self, clamp_max: Optional[float] = None) -> np.ndarray:
        logp = self.logged_propensity_of_action()
        w = np.where(
            logp < PROPENSITY_THRESHOLD, 0.0, self.target_propensity_of_action() / np.maximum(logp, PROPENSITY_THRESHOLD)
        )
        if clamp_max is not None:
            w = np.minimum(w, clamp_max)
        return w


def _result(input: BanditsEstimatorInput, estimate: np.ndarray) -> EstimatorResult:
    return EstimatorResult(
        log_reward=float(np.mean(input.log_reward)),
        estimated_reward=float(np.mean(estimate)),
        ground_truth_reward=input.ground_truth_reward,
        estimated_reward_std_error=float(np.std(estimate) / np.sqrt(max(len(estimate), 1))),
    )


class DMEstimator(Estimator):
    """Direct method: E_pi[reward model] (reference :84-300)."""

    def evaluate(self, input: BanditsEstimatorInput, **kwargs) -> EstimatorResult:
        assert input.dm_rewards is not None, "DM needs a reward model"
        est = np.sum(input.tgt_propensities * input.dm_rewards, axis=1)
        return _result(input, est)


class IPSEstimator(Estimator):
    """Inverse propensity scoring (reference :304-370)."""

    def __init__(self, clamp_max: Optional[float] = None):
        self.clamp_max = clamp_max

    def evaluate(self, input: BanditsEstimatorInput, **kwargs) -> EstimatorResult:
        est = input.importance_weights(self.clamp_max) * input.log_reward
        return _result(input, est)


class DoublyRobustEstimator(Estimator):
    """DR = DM + w * (r - r_hat(logged action)) (reference :374-450)."""

    def __init__(self, clamp_max: Optional[float] = None):
        self.clamp_max = clamp_max

    def evaluate(self, input: BanditsEstimatorInput, **kwargs) -> EstimatorResult:
        assert input.dm_rewards is not None
        w = input.importance_weights(self.clamp_max)
        dm = np.sum(input.tgt_propensities * input.dm_rewards, axis=1)
        r_hat_logged = input.dm_rewards[np.arange(input.n), input.log_action]
        est = dm + w * (input.log_reward - r_hat_logged)
        return _result(input, est)


class SwitchEstimator(Estimator):
    """SWITCH: IPS where weights are small, DM where they explode.

    tau grid search minimizing estimated MSE = var + bias-bound^2
    (reference :453-650, CANDIDATES=21, EXP_BASE=1.5).
    """

    CANDIDATES = 21
    EXP_BASE = 1.5
    EPSILON = 1e-6

    def __init__(self, rmax: Optional[float] = None, switch_dr: bool = False):
        self._rmax = rmax
        self._switch_dr = switch_dr

    def evaluate(self, input: BanditsEstimatorInput, **kwargs) -> EstimatorResult:
        assert input.dm_rewards is not None
        n, A = input.n, input.num_actions
        # weight for each (sample, action)
        ws = np.where(
            input.log_propensities < PROPENSITY_THRESHOLD,
            0.0,
            input.tgt_propensities / np.maximum(input.log_propensities, PROPENSITY_THRESHOLD),
        )  # [N, A]
        actions_onehot = np.eye(A)[input.log_action]  # [N, A]
        rmax = self._rmax
        if rmax is None:
            rmax = max(float(np.max(input.log_reward)), float(np.max(input.dm_rewards)))

        # tau candidates on an exponential grid spanning observed weights
        w_max = max(float(ws.max()), 1.0)
        taus = w_max ** (
            np.arange(self.CANDIDATES) / (self.CANDIDATES - 1)
        )  # 1 .. w_max geometric
        best_est, best_mse = None, np.inf
        for tau in taus:
            use_ips = ws <= tau  # [N, A]
            ips_part = np.sum(
                ws * use_ips * actions_onehot * input.log_reward[:, None], axis=1
            )
            if self._switch_dr:
                dm_all = np.sum(
                    input.tgt_propensities * input.dm_rewards * (~use_ips), axis=1
                )
                r_hat_logged = input.dm_rewards[np.arange(n), input.log_action]
                dr_corr = np.sum(
                    ws * use_ips * actions_onehot
                    * (input.log_reward - r_hat_logged)[:, None],
                    axis=1,
                )
                dm_in = np.sum(
                    input.tgt_propensities * input.dm_rewards * use_ips, axis=1
                )
                est = dm_in + dr_corr + dm_all
            else:
                dm_part = np.sum(
                    input.tgt_propensities * input.dm_rewards * (~use_ips), axis=1
                )
                est = ips_part + dm_part
            var = float(np.var(est)) / max(n, 1)
            # bias bound: mass moved to DM times rmax (reference :545-560)
            bias_bound = float(
                np.mean(np.sum(input.tgt_propensities * (~use_ips), axis=1)) * rmax
            ) if not self._switch_dr else float(
                np.mean(np.sum(input.tgt_propensities * (~use_ips), axis=1)) * rmax * 0.5
            )
            mse = var + bias_bound**2
            if mse < best_mse:
                best_mse, best_est = mse, est
        return _result(input, best_est)


class SwitchDREstimator(SwitchEstimator):
    """Switch with a DR core (reference :651-750)."""

    def __init__(self, rmax: Optional[float] = None):
        super().__init__(rmax=rmax, switch_dr=True)
