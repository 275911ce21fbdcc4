"""Sequential (RL) OPE estimators: DM, IPS, DR, MAGIC, NeuralDualDICE.

Reference: reagent/ope/estimators/sequential_estimators.py:221-533.
Inputs are padded trajectory arrays (the vectorized form of the reference's
per-transition Transition/MDPSequence objects).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

from reagent_tpu.ope.estimators.estimator import Estimator, EstimatorResult


@dataclasses.dataclass
class RLEstimatorInput:
    """Padded trajectories over N episodes and horizon T, A discrete actions.

    actions: [N, T] int; rewards: [N, T]; log_propensities: [N, T] of logged
    action; tgt_propensities: [N, T, A]; mask: [N, T] valid steps;
    q_values: [N, T, A] model Q for the target policy (optional);
    states: [N, T, S] raw features (optional, for DICE).
    """

    gamma: float
    actions: np.ndarray
    rewards: np.ndarray
    log_propensities: np.ndarray
    tgt_propensities: np.ndarray
    mask: np.ndarray
    q_values: Optional[np.ndarray] = None
    states: Optional[np.ndarray] = None
    ground_truth_reward: Optional[float] = None

    @property
    def n(self):
        return self.actions.shape[0]

    @property
    def horizon(self):
        return self.actions.shape[1]

    def discounts(self) -> np.ndarray:
        return self.gamma ** np.arange(self.horizon)

    def log_value(self) -> float:
        return float(np.mean(np.sum(self.rewards * self.mask * self.discounts(), axis=1)))

    def tgt_prop_of_logged(self) -> np.ndarray:
        n, t = self.actions.shape
        return self.tgt_propensities[
            np.arange(n)[:, None], np.arange(t)[None, :], self.actions
        ]

    def cum_importance_weights(self, self_normalize: bool = True) -> np.ndarray:
        """rho = cumprod(pi_e/pi_b) zeroed at masked steps, normalized per
        timestep column — by the column weight-sum ("weighted", the reference
        default) or the column valid-count; near-zero denominators get +N
        (reference sequential_estimators.py:266-298 _calc_weights)."""
        ratio = np.where(
            self.mask > 0,
            self.tgt_prop_of_logged() / np.maximum(self.log_propensities, 1e-12),
            1.0,
        )
        w = np.cumprod(ratio, axis=1) * self.mask
        if self_normalize:
            denom = np.sum(w, axis=0, keepdims=True)
        else:
            denom = np.sum(self.mask, axis=0, keepdims=True)
        denom = denom + (denom < 1.0e-15) * len(w)
        return w / denom


    def with_absorbing_padding(self) -> "RLEstimatorInput":
        """Replace masked (post-termination) steps with absorbing transitions:
        reward 0, importance ratio 1, Q = V = 0, mask 1.

        The reference weighting (sequential_estimators.py:290-298) gives the
        episodes surviving at step t the FULL column weight, so logs of
        episodes that simply end overweight long survivors; padding episodic
        logs with an absorbing state keeps every episode in the per-step
        denominator and is the statistically sound preparation for the
        reference semantics.
        """
        dead = self.mask <= 0
        A = self.tgt_propensities.shape[2]
        actions = np.where(dead, 0, self.actions)
        rewards = np.where(dead, 0.0, self.rewards)
        log_prop = np.where(dead, 1.0, self.log_propensities)
        tgt_prop = np.where(
            dead[:, :, None], np.eye(A)[np.zeros_like(self.actions)],
            self.tgt_propensities,
        )
        q_values = (
            None
            if self.q_values is None
            else np.where(dead[:, :, None], 0.0, self.q_values)
        )
        return dataclasses.replace(
            self,
            actions=actions,
            rewards=rewards,
            log_propensities=log_prop,
            tgt_propensities=tgt_prop,
            mask=np.ones_like(self.mask),
            q_values=q_values,
        )


def _res(input: RLEstimatorInput, est_per_traj: np.ndarray) -> EstimatorResult:
    return EstimatorResult(
        log_reward=input.log_value(),
        estimated_reward=float(np.sum(est_per_traj)) if est_per_traj.ndim else float(est_per_traj),
        ground_truth_reward=input.ground_truth_reward,
    )


class DMEstimator(Estimator):
    """Direct method (reference :221-246): the reference's _estimate_value
    (:205-218) sums the model state value along the LOGGED trajectory,
    mean_episodes[ Σ_t γ^t V(s_t) ], with V(s) = Σ_a π_tgt(a|s) Q(s, a) —
    not just V(s_0)."""

    def evaluate(self, input: RLEstimatorInput, **kwargs) -> EstimatorResult:
        assert input.q_values is not None
        v = np.sum(input.tgt_propensities * input.q_values, axis=2)  # [N, T]
        est = np.sum(v * input.mask * input.discounts(), axis=1)
        return EstimatorResult(
            log_reward=input.log_value(),
            estimated_reward=float(np.mean(est)),
            ground_truth_reward=input.ground_truth_reward,
        )


class IPSEstimator(Estimator):
    """Per-step weighted IS (reference :250-340)."""

    def __init__(self, self_normalize: bool = True):
        self.self_normalize = self_normalize

    def evaluate(self, input: RLEstimatorInput, **kwargs) -> EstimatorResult:
        w = input.cum_importance_weights(self.self_normalize)
        est = np.sum(w * input.rewards * input.mask * input.discounts(), axis=1)
        return _res(input, est)


class DoublyRobustEstimator(Estimator):
    """Per-step DR (reference :349-430); the same step-return math as the
    evaluation-side MAGIC j=inf case."""

    def __init__(self, self_normalize: bool = True):
        self.self_normalize = self_normalize

    def evaluate(self, input: RLEstimatorInput, **kwargs) -> EstimatorResult:
        assert input.q_values is not None
        n, t = input.actions.shape
        w = input.cum_importance_weights(self.self_normalize)
        w_prev = np.hstack([np.full((n, 1), 1.0 / n), w[:, :-1]])
        disc = input.discounts()
        q_logged = input.q_values[
            np.arange(n)[:, None], np.arange(t)[None, :], input.actions
        ]
        v = np.sum(input.tgt_propensities * input.q_values, axis=2)
        est = np.sum(
            (w * input.rewards * input.mask - (w * q_logged - w_prev * v) * input.mask)
            * disc,
            axis=1,
        )
        return _res(input, est)


class MAGICEstimator(Estimator):
    """Blend of j-step returns (reference :430-533); delegates to the
    evaluation-side implementation on the same padded arrays."""

    def __init__(self, num_j_steps: int = 25):
        self.num_j_steps = num_j_steps

    def evaluate(self, input: RLEstimatorInput, **kwargs) -> EstimatorResult:
        from reagent_tpu.evaluation.weighted_sequential_doubly_robust_estimator import (
            WeightedSequentialDoublyRobustEstimator,
        )
        from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage

        n, t = input.actions.shape
        A = input.tgt_propensities.shape[2]
        # flatten padded trajectories into an EDP-shaped table
        keep = input.mask.reshape(-1) > 0
        mdp_id = np.repeat(np.arange(n), t).reshape(-1, 1)[keep]
        action_mask = np.eye(A)[input.actions.reshape(-1)][keep]
        edp = EvaluationDataPage(
            mdp_id=mdp_id,
            sequence_number=np.tile(np.arange(t), n).reshape(-1, 1)[keep],
            logged_propensities=input.log_propensities.reshape(-1, 1)[keep],
            logged_rewards=input.rewards.reshape(-1, 1)[keep],
            action_mask=action_mask,
            model_propensities=input.tgt_propensities.reshape(-1, A)[keep],
            model_rewards=np.zeros_like(action_mask),
            model_rewards_for_logged_action=np.zeros((int(keep.sum()), 1)),
            model_values=input.q_values.reshape(-1, A)[keep],
        )
        est = WeightedSequentialDoublyRobustEstimator(input.gamma).estimate(
            edp, num_j_steps=self.num_j_steps,
            whether_self_normalize_importance_weights=True,
        )
        return EstimatorResult(
            log_reward=input.log_value(),
            estimated_reward=est.raw,
            ground_truth_reward=input.ground_truth_reward,
            estimated_reward_std_error=est.raw_std_error,
        )


class NeuralDualDICE(Estimator):
    """DualDICE stationary-distribution correction (Nachum et al. 2019).

    Reference: sequential_estimators.py:533+ (torch MLPs there).  Learns
    nu(s, a) and zeta(s, a) by the saddle-point objective; the estimate is
    E_log[zeta * reward] / (1 - gamma)-normalized.
    """

    def __init__(
        self,
        state_dim: int,
        num_actions: int,
        hidden_dim: int = 64,
        training_samples: int = 2000,
        batch_size: int = 256,
        lr: float = 1e-3,
        zeta_lr: float = 1e-3,
    ):
        self.state_dim = state_dim
        self.num_actions = num_actions
        self.hidden_dim = hidden_dim
        self.training_samples = training_samples
        self.batch_size = batch_size
        self.lr = lr
        self.zeta_lr = zeta_lr

    def evaluate(self, input: RLEstimatorInput, **kwargs) -> EstimatorResult:
        import jax
        import jax.numpy as jnp
        import optax
        from flax import linen as nn

        assert input.states is not None
        n, t = input.actions.shape
        keep = input.mask.reshape(-1) > 0
        s = jnp.asarray(input.states.reshape(n * t, -1)[keep], jnp.float32)
        a = jnp.asarray(input.actions.reshape(-1)[keep], jnp.int32)
        r = jnp.asarray(input.rewards.reshape(-1)[keep], jnp.float32)
        # next state within trajectory (shift); last steps map to themselves
        ns_full = np.concatenate(
            [input.states[:, 1:], input.states[:, -1:]], axis=1
        ).reshape(n * t, -1)
        ns = jnp.asarray(ns_full[keep], jnp.float32)
        tgt_next = jnp.asarray(
            np.concatenate(
                [input.tgt_propensities[:, 1:], input.tgt_propensities[:, -1:]], axis=1
            ).reshape(n * t, -1)[keep],
            jnp.float32,
        )
        s0 = jnp.asarray(input.states[:, 0], jnp.float32)
        tgt0 = jnp.asarray(input.tgt_propensities[:, 0], jnp.float32)
        gamma = input.gamma

        class Net(nn.Module):
            out: int

            @nn.compact
            def __call__(self, x):
                h = nn.relu(nn.Dense(self.hidden_dim_)(x))
                h = nn.relu(nn.Dense(self.hidden_dim_)(h))
                return nn.Dense(self.out)(h)

            hidden_dim_: int = self.hidden_dim

        nu_net, zeta_net = Net(out=self.num_actions), Net(out=self.num_actions)
        rng = jax.random.PRNGKey(0)
        nu_params = nu_net.init(rng, s[:1])
        zeta_params = zeta_net.init(jax.random.fold_in(rng, 1), s[:1])
        nu_opt = optax.adam(self.lr)
        zeta_opt = optax.adam(self.zeta_lr)
        nu_state = nu_opt.init(nu_params)
        zeta_state = zeta_opt.init(zeta_params)

        def batch_indices(key, size):
            return jax.random.randint(key, (self.batch_size,), 0, size)

        @jax.jit
        def step(nu_params, zeta_params, nu_state, zeta_state, key):
            idx = batch_indices(key, s.shape[0])
            bs, ba, bns, btn = s[idx], a[idx], ns[idx], tgt_next[idx]
            i0 = batch_indices(jax.random.fold_in(key, 1), s0.shape[0])
            bs0, bt0 = s0[i0], tgt0[i0]

            def loss_fn(nu_p, zeta_p):
                nu_sa = jnp.take_along_axis(
                    nu_net.apply(nu_p, bs), ba[:, None], axis=1
                )[:, 0]
                nu_next = jnp.sum(nu_net.apply(nu_p, bns) * btn, axis=1)
                zeta_sa = jnp.take_along_axis(
                    zeta_net.apply(zeta_p, bs), ba[:, None], axis=1
                )[:, 0]
                nu0 = jnp.sum(nu_net.apply(nu_p, bs0) * bt0, axis=1)
                bellman_residual = nu_sa - gamma * nu_next
                # f(x) = x^2/2 convex conjugate form (DualDICE eq. 6)
                obj = jnp.mean(
                    bellman_residual * zeta_sa - 0.5 * zeta_sa**2
                ) - (1 - gamma) * jnp.mean(nu0)
                return obj

            # nu minimizes, zeta maximizes
            g_nu = jax.grad(loss_fn, argnums=0)(nu_params, zeta_params)
            g_zeta = jax.grad(lambda zp: -loss_fn(nu_params, zp))(zeta_params)
            nu_up, nu_state2 = nu_opt.update(g_nu, nu_state, nu_params)
            zeta_up, zeta_state2 = zeta_opt.update(g_zeta, zeta_state, zeta_params)
            return (
                optax.apply_updates(nu_params, nu_up),
                optax.apply_updates(zeta_params, zeta_up),
                nu_state2,
                zeta_state2,
            )

        for i in range(self.training_samples):
            rng, k = jax.random.split(rng)
            nu_params, zeta_params, nu_state, zeta_state = step(
                nu_params, zeta_params, nu_state, zeta_state, k
            )

        zeta_all = jnp.take_along_axis(
            zeta_net.apply(zeta_params, s), a[:, None], axis=1
        )[:, 0]
        est = float(jnp.mean(zeta_all * r) / (1 - gamma))
        return EstimatorResult(
            log_reward=input.log_value(),
            estimated_reward=est,
            ground_truth_reward=input.ground_truth_reward,
        )
