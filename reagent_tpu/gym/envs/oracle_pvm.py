"""OraclePVM: personalized-VM-tuning environment (slate ranking bandit).

Reference: reagent/gym/envs/oracle_pvm.py:55-160 — the env hides per-doc score
functions (score_i = doc_feat[i]) and ground-truth mixing weights (all ones);
an action is a weight vector; reward is the Kendall-tau between the action's
ranking of docs and the oracle ranking, boosted to MATCH_REWARD_BOOST on an
exact match.  Single-step episodes.

TPU-native: dynamics are pure functions (reset samples user/doc features from
the PRNG key; step computes rankings with argsort and Kendall-tau as a [n, n]
pairwise concordance sum), so the env runs inside jit/vmap — no scipy, no
host ranking loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from reagent_tpu.gym.envs.functional import FunctionalEnv

Array = jax.Array

VM_WEIGHT_LOW = -1.0
VM_WEIGHT_HIGH = 1.0
MATCH_REWARD_BOOST = 3.0


def kendall_tau(rank_a: Array, rank_b: Array) -> Array:
    """Kendall rank correlation of two permutations (scipy.stats.kendalltau
    equivalent for distinct ranks; reference oracle_pvm.py:126)."""
    da = rank_a[:, None] - rank_a[None, :]
    db = rank_b[:, None] - rank_b[None, :]
    concordance = jnp.sign(da) * jnp.sign(db)  # +1 concordant, -1 discordant
    n = rank_a.shape[0]
    num_pairs = n * (n - 1) / 2.0
    return jnp.sum(jnp.triu(concordance, k=1)) / num_pairs


@struct.dataclass
class OraclePVMState:
    user: Array  # [user_feat_dim]
    docs: Array  # [num_candidates, candidate_feat_dim]
    t: Array


class OraclePVM(FunctionalEnv):
    """Learn the hidden ground-truth mixing weights (all ones)."""

    discrete = False

    def __init__(
        self,
        num_candidates: int = 5,
        user_feat_dim: int = 1,
        candidate_feat_dim: int = 3,
        num_weights: int = 3,
    ):
        assert num_weights <= candidate_feat_dim
        self.num_candidates = num_candidates
        self.slate_size = num_candidates  # ref asserts slate_size == num_candidates
        self.user_feat_dim = user_feat_dim
        self.candidate_feat_dim = candidate_feat_dim
        self.num_weights = num_weights
        self.ground_truth_weights = jnp.ones((num_weights,))
        self.action_dim = num_weights
        self.observation_dim = user_feat_dim + num_candidates * candidate_feat_dim
        self.max_steps = 1

    def _obs(self, state: OraclePVMState) -> Array:
        return jnp.concatenate([state.user, state.docs.reshape(-1)])

    def reset(self, rng: Array) -> Tuple[OraclePVMState, Array]:
        r_user, r_doc = jax.random.split(rng)
        state = OraclePVMState(
            user=jax.random.uniform(r_user, (self.user_feat_dim,)),
            docs=jax.random.uniform(
                r_doc, (self.num_candidates, self.candidate_feat_dim)
            ),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def _scores(self, state: OraclePVMState) -> Array:
        # score_fn_i(user, doc) = doc[i] (ref make_default_score_fn)
        return state.docs[:, : self.num_weights]  # [n_docs, num_weights]

    def _ranking(self, scores: Array, weights: Array) -> Array:
        values = jnp.sum(scores * weights[None, :], axis=1)
        return jnp.argsort(-values)

    def step(
        self, state: OraclePVMState, action: Array, rng: Array
    ) -> Tuple[OraclePVMState, Array, Array, Array]:
        scores = self._scores(state)
        truth = self._ranking(scores, self.ground_truth_weights)
        policy = self._ranking(scores, action)
        exact = jnp.all(truth == policy)
        reward = jnp.where(
            exact, MATCH_REWARD_BOOST, kendall_tau(truth, policy)
        ).astype(jnp.float32)
        new_state = state.replace(t=state.t + 1)
        return new_state, self._obs(new_state), reward, jnp.bool_(True)

    @staticmethod
    def is_match(reward) -> bool:
        return float(reward) > MATCH_REWARD_BOOST - 1e-6
