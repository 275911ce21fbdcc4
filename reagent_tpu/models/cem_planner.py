"""CEM planner over an ensemble of MDN-RNN world models.

Reference: reagent/models/cem_planner.py:35-310 — there, trajectories are
simulated with a triple python loop (solutions x ensemble x horizon).

TPU-native re-design: world-model rollouts are a single jitted
``vmap(solutions) . scan(horizon)`` program; the ensemble assignment is a
random member index per trajectory; CEM iterations run under ``lax.fori``-style
host loop (few iterations).  Discrete planning is the reference's random
shooting with first-action reward tallies.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import CONTINUOUS_TRAINING_ACTION_RANGE
from reagent_tpu.models.mdn_rnn import MemoryNetwork
from reagent_tpu.training.utils import rescale_actions

Array = jax.Array


class CEMPlannerNetwork:
    def __init__(
        self,
        mem_net: MemoryNetwork,
        mem_net_params_list: List[Any],
        cem_num_iterations: int,
        cem_population_size: int,
        ensemble_population_size: int,
        num_elites: int,
        plan_horizon_length: int,
        state_dim: int,
        action_dim: int,
        discrete_action: bool,
        terminal_effective: bool,
        gamma: float,
        alpha: float = 0.25,
        epsilon: float = 0.001,
        action_upper_bounds: Optional[np.ndarray] = None,
        action_lower_bounds: Optional[np.ndarray] = None,
        sample_next_state: bool = True,
        sample_not_terminal: bool = True,
    ):
        """``sample_next_state=False`` propagates the GMM's expected next
        state instead of sampling one (reference :202-209 always samples).
        With a unimodal world model this makes every action-sequence score
        deterministic, removing simulation variance from elite selection —
        use it when num_gaussians == 1.

        ``sample_not_terminal=False`` likewise replaces the reference's
        Bernoulli terminal sample (:211-216) with the expected survival
        probability, so each solution scores its expected discounted return
        under the terminal model.  Defaults keep reference semantics."""
        self.mem_net = mem_net
        # stack ensemble params into one pytree with leading ensemble axis
        self.ensemble_params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *mem_net_params_list
        )
        self.num_ensemble = len(mem_net_params_list)
        self.cem_num_iterations = cem_num_iterations
        self.cem_pop_size = cem_population_size
        self.ensemble_pop_size = ensemble_population_size
        self.num_elites = num_elites
        self.plan_horizon_length = plan_horizon_length
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.discrete_action = discrete_action
        self.sample_next_state = sample_next_state
        self.sample_not_terminal = sample_not_terminal
        self.terminal_effective = terminal_effective
        self.gamma = gamma
        self.alpha = alpha
        self.epsilon = epsilon
        if not discrete_action:
            assert action_upper_bounds is not None and action_lower_bounds is not None
            self.action_upper_bounds = np.tile(action_upper_bounds, plan_horizon_length)
            self.action_lower_bounds = np.tile(action_lower_bounds, plan_horizon_length)
            self.orig_action_upper = jnp.asarray(action_upper_bounds)
            self.orig_action_lower = jnp.asarray(action_lower_bounds)

    # ------------------------------------------------------- world-model sim

    @functools.partial(jax.jit, static_argnums=0)
    def acc_rewards_of_all_solutions(
        self, init_state: Array, solutions: Array, rng: Array
    ) -> Array:
        """Discounted return per solution, vectorized.

        init_state [state_dim]; solutions [P, H, action_dim] -> [P].
        Each solution is simulated by one randomly chosen ensemble member
        (as in the reference's per-trajectory member draw, :136).
        """
        P = solutions.shape[0]
        member_rng, roll_rng = jax.random.split(rng)
        member_idx = jax.random.randint(member_rng, (P,), 0, self.num_ensemble)
        member_params = jax.tree_util.tree_map(
            lambda leaf: leaf[member_idx], self.ensemble_params
        )

        def rollout(params, actions, rng):
            def step(carry, action):
                state, alive, rng = carry
                rng, r_mix, r_norm, r_term = jax.random.split(rng, 4)
                out = self.mem_net.apply(
                    params,
                    rlt.FeatureData(float_features=state.reshape(1, 1, -1)),
                    rlt.FeatureData(float_features=action.reshape(1, 1, -1)),
                )
                if self.sample_next_state:
                    mix = jax.random.categorical(r_mix, out.logpi[0, 0])
                    next_state = out.mus[0, 0, mix] + out.sigmas[
                        0, 0, mix
                    ] * jax.random.normal(r_norm, (self.state_dim,))
                else:
                    # expected next state under the mixture
                    next_state = jnp.sum(
                        jnp.exp(out.logpi[0, 0])[:, None] * out.mus[0, 0], axis=0
                    )
                reward = out.reward[0, 0] * alive
                if not self.terminal_effective:
                    not_term = jnp.asarray(1.0)
                elif self.sample_not_terminal:
                    not_term = jax.random.bernoulli(
                        r_term, jax.nn.sigmoid(out.not_terminal[0, 0])
                    ).astype(jnp.float32)
                else:
                    # Redesign vs reference :211-216: weight by the *expected*
                    # survival probability instead of sampling it, removing
                    # Bernoulli variance from elite selection / first-action
                    # tallies (pop-size-100 tallies are otherwise very noisy).
                    not_term = jax.nn.sigmoid(out.not_terminal[0, 0])
                return (next_state, alive * not_term, rng), reward

            gammas = self.gamma ** jnp.arange(self.plan_horizon_length)
            (_, _, _), rewards = jax.lax.scan(
                step, (init_state, jnp.asarray(1.0), rng), actions
            )
            return jnp.sum(rewards * gammas)

        return jax.vmap(rollout)(
            member_params, solutions, jax.random.split(roll_rng, P)
        )

    # --------------------------------------------------------------- planning

    def continuous_planning(self, state: Array, rng: Array) -> Array:
        """Reference :225-272; CEM loop on host, sim vectorized on device."""
        mean = (self.action_upper_bounds + self.action_lower_bounds) / 2
        var = (self.action_upper_bounds - self.action_lower_bounds) ** 2 / 16
        D = mean.shape[0]
        for _ in range(self.cem_num_iterations):
            rng, r_samp, r_sim = jax.random.split(rng, 3)
            lb_dist = mean - self.action_lower_bounds
            ub_dist = self.action_upper_bounds - mean
            const_var = np.minimum(np.minimum((lb_dist / 2) ** 2, (ub_dist / 2) ** 2), var)
            noise = np.asarray(
                jax.random.truncated_normal(r_samp, -2.0, 2.0, (self.cem_pop_size, D))
            )
            solutions = noise * np.sqrt(const_var) + mean
            action_solutions = jnp.asarray(
                solutions.reshape(self.cem_pop_size, self.plan_horizon_length, self.action_dim),
                jnp.float32,
            )
            acc = np.asarray(
                self.acc_rewards_of_all_solutions(state, action_solutions, r_sim)
            )
            elites = solutions[np.argsort(acc)][-self.num_elites:]
            mean = self.alpha * mean + (1 - self.alpha) * elites.mean(axis=0)
            var = self.alpha * var + (1 - self.alpha) * elites.var(axis=0)
            if var.max() <= self.epsilon:
                break
        raw_action = jnp.asarray(mean[: self.action_dim])
        lo, hi = CONTINUOUS_TRAINING_ACTION_RANGE
        return rescale_actions(
            raw_action,
            new_min=jnp.asarray(lo),
            new_max=jnp.asarray(hi),
            prev_min=self.orig_action_lower,
            prev_max=self.orig_action_upper,
        )

    def discrete_planning(self, state: Array, rng: Array) -> Tuple[int, Array]:
        """Random shooting + first-action tallies (reference :273-310)."""
        r_seq, r_sim = jax.random.split(rng)
        seqs = jax.random.randint(
            r_seq, (self.cem_pop_size, self.plan_horizon_length), 0, self.action_dim
        )
        action_solutions = jax.nn.one_hot(seqs, self.action_dim)
        acc = self.acc_rewards_of_all_solutions(state, action_solutions, r_sim)
        first = seqs[:, 0]
        onehot_first = jax.nn.one_hot(first, self.action_dim)
        tally = jnp.sum(onehot_first, axis=0)
        reward_tally = jnp.sum(onehot_first * acc[:, None], axis=0)
        avg = jnp.where(tally > 0, reward_tally / jnp.maximum(tally, 1), -jnp.inf)
        best = int(jnp.argmax(avg))
        onehot = jax.nn.one_hot(jnp.asarray(best), self.action_dim)
        return best, onehot

    def __call__(self, state: rlt.FeatureData, rng: Array):
        sf = state.float_features.reshape(-1)
        if self.discrete_action:
            return self.discrete_planning(sf, rng)
        return self.continuous_planning(sf, rng)
