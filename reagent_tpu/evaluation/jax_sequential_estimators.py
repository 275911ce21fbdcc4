"""TPU-native sequential CPE estimators: padded [N_traj, T] jitted compute.

The reference's sequential estimators
(reagent/evaluation/weighted_sequential_doubly_robust_estimator.py:18,
sequential_doubly_robust_estimator.py:18) run per-trajectory python loops on
host — fine for CI-sized EDPs, quadratic pain on production logged datasets.

Here the O(N * T * A) work — importance-weight cumprods, self-normalization,
all j-step returns, per-subset infinite-step returns, and the per-episode DR
recursion — is one jitted XLA program over zero/one-padded [N_traj, T]
arrays.  Only the O(J^2) MAGIC blending (a J<=25-dim QP via scipy SLSQP, the
reference's exact solver) and the tiny bootstrap loop stay on host, so the
results are bit-identical to the numpy oracles in this package (asserted in
tests/test_jax_cpe.py).

Padding contract: rewards/actions/target-propensities/Q pad with 0,
logged propensities pad with 1 — exactly the reference's
``transform_to_equal_length_trajectories`` fill values (reference :242-310),
which make padded steps contribute nothing to any estimate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.evaluation.cpe import CpeEstimate, bootstrapped_std_error_of_mean
from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage
from reagent_tpu.evaluation.weighted_sequential_doubly_robust_estimator import (
    WeightedSequentialDoublyRobustEstimator,
)

Array = jax.Array


class PaddedTrajectories(NamedTuple):
    """Equal-length episode views of a flat (sorted-by-mdp,seq) EDP."""

    actions: Array  # [N, T, A] one-hot logged action, 0-padded
    rewards: Array  # [N, T], 0-padded
    logged_propensities: Array  # [N, T], 1-padded
    target_propensities: Array  # [N, T, A], 0-padded
    q_values: Array  # [N, T, A], 0-padded


def pad_edp_trajectories(edp: EvaluationDataPage) -> PaddedTrajectories:
    """Vectorized host-side padding (no per-episode python loops)."""
    assert edp.mdp_id is not None and edp.model_values is not None
    mdp = np.asarray(edp.mdp_id).reshape(-1)
    n = mdp.shape[0]
    change = mdp[1:] != mdp[:-1]
    ends = np.nonzero(np.append(change, True))[0]
    starts = np.concatenate([[0], ends[:-1] + 1])
    lengths = ends - starts + 1
    N, T = len(starts), int(lengths.max())
    A = edp.action_mask.shape[1]
    row = np.repeat(np.arange(N), lengths)
    col = np.arange(n) - np.repeat(starts, lengths)

    actions = np.zeros((N, T, A), np.float32)
    actions[row, col] = np.asarray(edp.action_mask)
    rewards = np.zeros((N, T), np.float32)
    rewards[row, col] = np.asarray(edp.logged_rewards).reshape(-1)
    logged_prop = np.ones((N, T), np.float32)
    logged_prop[row, col] = np.asarray(edp.logged_propensities).reshape(-1)
    target_prop = np.zeros((N, T, A), np.float32)
    target_prop[row, col] = np.asarray(edp.model_propensities)
    q_values = np.zeros((N, T, A), np.float32)
    q_values[row, col] = np.asarray(edp.model_values)
    return PaddedTrajectories(
        actions=jnp.asarray(actions),
        rewards=jnp.asarray(rewards),
        logged_propensities=jnp.asarray(logged_prop),
        target_propensities=jnp.asarray(target_prop),
        q_values=jnp.asarray(q_values),
    )


# ---------------------------------------------------------------- WDR / MAGIC


def _normalize_iw(iw: Array, self_normalize: bool) -> Array:
    """Reference normalize_importance_weights (:312-328): per-time-column
    self-normalization with the all-zero-column -> uniform fixup."""
    if not self_normalize:
        return iw / iw.shape[0]
    sums = jnp.sum(iw, axis=0)  # [T]
    zero = sums == 0.0
    iw = jnp.where(zero[None, :], 1.0, iw)
    sums = jnp.where(zero, float(iw.shape[0]), sums)
    return iw / sums


def _segment_normalize_iw(
    iw: Array, seg_ids: Array, seg_sizes: Array, num_segments: int,
    self_normalize: bool,
) -> Array:
    """normalize_importance_weights applied independently per subset."""
    if not self_normalize:
        return iw / seg_sizes[seg_ids][:, None]
    sums = jax.ops.segment_sum(iw, seg_ids, num_segments=num_segments)  # [S, T]
    zero = sums == 0.0
    iw = jnp.where(zero[seg_ids], 1.0, iw)
    sums = jnp.where(zero, seg_sizes[:, None].astype(iw.dtype), sums)
    return iw / sums[seg_ids]


@functools.partial(jax.jit, static_argnames=("self_normalize", "num_segments"))
def _wdr_core(
    padded: PaddedTrajectories,
    j_index: Array,  # [J] int32, already clipped to [-1, T-1]
    gammas: Array,  # [T] discount powers
    seg_ids: Array,  # [N] contiguous subset ids for CB estimation
    seg_sizes: Array,  # [S]
    num_segments: int,
    self_normalize: bool,
) -> Tuple[Array, Array, Array, Array]:
    """Returns (j_step_return_trajectories [J, N], j_step_returns [J],
    infinite_step_returns [S], episode_values [N])."""
    actions, rewards, logged_prop, target_prop, q_values = padded
    N, T = rewards.shape

    target_prop_logged = jnp.sum(target_prop * actions, axis=2)  # [N, T]
    q_logged = jnp.sum(q_values * actions, axis=2)
    state_values = jnp.sum(target_prop * q_values, axis=2)

    ratios = target_prop_logged / logged_prop

    def step_returns(iw: Array, iw_oe: Array, sub_rewards, sub_sv, sub_q):
        """[rows, T] weighted inputs -> per-row return at every j (cols 0..T)."""
        wd = gammas[None, :] * iw
        wd_oe = gammas[None, :] * iw_oe
        isr = jnp.concatenate(
            [jnp.zeros((iw.shape[0], 1)), jnp.cumsum(wd * sub_rewards, axis=1)],
            axis=1,
        )  # [rows, T+1]; col j+1 = IS return through step j
        cv = jnp.concatenate(
            [
                jnp.zeros((iw.shape[0], 1)),
                jnp.cumsum(wd * sub_q - wd_oe * sub_sv, axis=1),
            ],
            axis=1,
        )
        dm = jnp.concatenate(
            [wd_oe * sub_sv, jnp.zeros((iw.shape[0], 1))], axis=1
        )  # col j+1 = DM bootstrap value at step j+1 (0 past the horizon)
        return isr + dm - cv  # [rows, T+1]

    # ---- main path: all trajectories, all j-steps at once
    iw = _normalize_iw(jnp.cumprod(ratios, axis=1), self_normalize)
    iw_oe = jnp.concatenate(
        [jnp.full((N, 1), 1.0 / N), iw[:, :-1]], axis=1
    )
    all_returns = step_returns(iw, iw_oe, rewards, state_values, q_logged)
    j_step_return_trajectories = all_returns[:, j_index + 1].T  # [J, N]
    j_step_returns = jnp.sum(j_step_return_trajectories, axis=1)

    # ---- per-subset infinite-step returns (confidence-bound inputs)
    iw_s = _segment_normalize_iw(
        jnp.cumprod(ratios, axis=1), seg_ids, seg_sizes, num_segments,
        self_normalize,
    )
    first_col = (1.0 / seg_sizes[seg_ids].astype(rewards.dtype))[:, None]
    iw_s_oe = jnp.concatenate([first_col, iw_s[:, :-1]], axis=1)
    inf_per_row = step_returns(iw_s, iw_s_oe, rewards, state_values, q_logged)[:, T]
    infinite_step_returns = jax.ops.segment_sum(
        inf_per_row, seg_ids, num_segments=num_segments
    )

    episode_values = jnp.sum(rewards * gammas[None, :], axis=1)
    return (
        j_step_return_trajectories, j_step_returns, infinite_step_returns,
        episode_values,
    )


class JaxWeightedSequentialDoublyRobustEstimator:
    """Drop-in WDR/MAGIC with the array work on device.

    The MAGIC blend itself (confidence bounds + J-dim SLSQP QP + the 50-sample
    bootstrap over j-step subsets) reuses the numpy oracle's host methods on
    the device-computed returns, so given the same ``np.random`` stream the
    result is bit-identical to ``WeightedSequentialDoublyRobustEstimator``.
    """

    def __init__(self, gamma: float):
        self.gamma = gamma
        self._oracle = WeightedSequentialDoublyRobustEstimator(gamma)

    def estimate(
        self,
        edp: EvaluationDataPage,
        num_j_steps: int,
        whether_self_normalize_importance_weights: bool,
    ) -> CpeEstimate:
        padded = pad_edp_trajectories(edp)
        return self.estimate_padded(
            padded, num_j_steps, whether_self_normalize_importance_weights
        )

    def estimate_padded(
        self,
        padded: PaddedTrajectories,
        num_j_steps: int,
        whether_self_normalize_importance_weights: bool,
    ) -> CpeEstimate:
        N, T = padded.rewards.shape

        # MAGIC's confidence bounds need >=2 trajectories to form subsets
        # (the reference divides by a floored-to-zero subset count there,
        # weighted_sequential_doubly_robust_estimator.py:99); degrade to the
        # plain WDR estimate instead of crashing.
        if N < 2:
            num_j_steps = 1

        j_steps = [float("inf")]
        if num_j_steps > 1:
            j_steps.append(-1)
        if num_j_steps > 2:
            interval = T // (num_j_steps - 1)
            j_steps.extend([i * interval for i in range(1, num_j_steps - 1)])
        j_index = jnp.asarray(
            [int(min(j, T - 1)) for j in j_steps], jnp.int32
        )

        # Subsets feed only the multi-j confidence bounds; the oracle skips
        # them entirely for a single j-step (:99-107).  Clamp to >=1 so a
        # 1-trajectory EDP (num_subsets would floor to 0) cannot divide by
        # zero on the single-j path either.
        if len(j_steps) > 1:
            num_subsets = max(
                1,
                int(
                    min(
                        N / 2,
                        WeightedSequentialDoublyRobustEstimator.NUM_SUBSETS_FOR_CB_ESTIMATES,
                    )
                ),
            )
        else:
            num_subsets = 1
        interval = N / num_subsets
        bounds = [
            (int(i * interval), int((i + 1) * interval)) for i in range(num_subsets)
        ]
        seg_ids = np.zeros(N, np.int32)
        seg_sizes = np.zeros(num_subsets, np.int32)
        for s, (lo, hi) in enumerate(bounds):
            seg_ids[lo:hi] = s
            seg_sizes[s] = hi - lo

        gammas = jnp.asarray(
            np.logspace(start=0, stop=T - 1, num=T, base=self.gamma), jnp.float32
        )
        (
            j_step_return_trajectories, j_step_returns, infinite_step_returns,
            episode_values,
        ) = _wdr_core(
            padded, j_index, gammas, jnp.asarray(seg_ids), jnp.asarray(seg_sizes),
            num_segments=num_subsets,
            self_normalize=whether_self_normalize_importance_weights,
        )
        j_step_return_trajectories = np.asarray(
            j_step_return_trajectories, np.float64
        )
        j_step_returns = np.asarray(j_step_returns, np.float64)
        infinite_step_returns = [float(x) for x in np.asarray(infinite_step_returns)]

        if len(j_step_returns) == 1:
            wdr = float(j_step_returns[0])
            wdr_std_error = 0.0
        else:
            wdr = self._oracle.compute_weighted_doubly_robust_point_estimate(
                j_steps, num_j_steps, j_step_returns, infinite_step_returns,
                j_step_return_trajectories,
            )
            bootstrapped_means = []
            sample_size = min(
                int(self._oracle.BOOTSTRAP_SAMPLE_PCT * num_subsets), num_j_steps
            )
            for _ in range(self._oracle.NUM_BOOTSTRAP_SAMPLES):
                random_idxs = np.random.choice(num_j_steps, sample_size, replace=False)
                random_idxs.sort()
                bootstrapped_means.append(
                    self._oracle.compute_weighted_doubly_robust_point_estimate(
                        j_steps=[j_steps[i] for i in random_idxs],
                        num_j_steps=sample_size,
                        j_step_returns=j_step_returns[random_idxs],
                        infinite_step_returns=infinite_step_returns,
                        j_step_return_trajectories=j_step_return_trajectories[
                            random_idxs
                        ],
                    )
                )
            wdr_std_error = float(np.std(bootstrapped_means))

        logged_policy_score = float(np.nanmean(np.asarray(episode_values)))
        if logged_policy_score < 1e-6:
            return CpeEstimate(
                raw=wdr, normalized=0.0, raw_std_error=wdr_std_error,
                normalized_std_error=0.0,
            )
        return CpeEstimate(
            raw=wdr,
            normalized=wdr / logged_policy_score,
            raw_std_error=wdr_std_error,
            normalized_std_error=wdr_std_error / logged_policy_score,
        )


# ------------------------------------------------------------------- seq-DR


@jax.jit
def _seq_dr_core(padded: PaddedTrajectories, gamma: Array) -> Tuple[Array, Array]:
    """Per-episode recursive DR + discounted episode values, vmapped.

    DR_t = V(s_t) + w_t * (r_t + gamma * DR_{t+1} - Q(s_t, a_t)), computed
    right-to-left (reference sequential_doubly_robust_estimator.py:42-58).
    The reference iterates only real steps, so padded tail steps (identified
    by their all-zero one-hot action) are masked to leave (dr, ev) unchanged.
    """
    actions, rewards, logged_prop, target_prop, q_values = padded
    state_values = jnp.sum(target_prop * q_values, axis=2)
    q_logged = jnp.sum(q_values * actions, axis=2)
    target_prop_logged = jnp.sum(target_prop * actions, axis=2)
    iw = target_prop_logged / logged_prop
    valid = jnp.sum(actions, axis=2) > 0  # padded steps are all-zero one-hots

    def one_episode(sv, w, r, q, m):
        def step(carry, xs):
            dr, ev = carry
            sv_t, w_t, r_t, q_t, m_t = xs
            dr_new = sv_t + w_t * (r_t + gamma * dr - q_t)
            ev_new = ev * gamma + r_t
            dr = jnp.where(m_t, dr_new, dr)
            ev = jnp.where(m_t, ev_new, ev)
            return (dr, ev), None

        (dr, ev), _ = jax.lax.scan(
            step, (0.0, 0.0), (sv, w, r, q, m), reverse=True
        )
        return dr, ev

    return jax.vmap(one_episode)(state_values, iw, rewards, q_logged, valid)


class JaxSequentialDoublyRobustEstimator:
    """Vectorized drop-in for SequentialDoublyRobustEstimator."""

    def __init__(self, gamma: float):
        self.gamma = gamma

    def estimate(self, edp: EvaluationDataPage) -> CpeEstimate:
        return self.estimate_padded(pad_edp_trajectories(edp))

    def estimate_padded(self, padded: PaddedTrajectories) -> CpeEstimate:
        drs, evs = _seq_dr_core(padded, jnp.asarray(self.gamma, jnp.float32))
        drs = np.asarray(drs, np.float64)
        evs = np.asarray(evs, np.float64)
        dr_score = float(np.mean(drs))
        dr_std = bootstrapped_std_error_of_mean(drs)
        logged_policy_score = float(np.mean(evs))
        if logged_policy_score < 1e-6:
            return CpeEstimate(
                raw=dr_score, normalized=0.0, raw_std_error=dr_std,
                normalized_std_error=0.0,
            )
        return CpeEstimate(
            raw=dr_score,
            normalized=dr_score / logged_policy_score,
            raw_std_error=dr_std,
            normalized_std_error=dr_std / logged_policy_score,
        )
