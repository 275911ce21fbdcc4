"""RecSim interest-evolution simulator, pure JAX.

Reference: reagent/gym/envs/recsim.py:16-63 wraps google-research/recsim's
``interest_evolution`` environment (plus a multi-click variant built from the
same user model) and is the benchmark behind the five
``gym/tests/configs/recsim/slate_q_recsim_online*.yaml`` configs
(passing_score_bar 154, slate 3 of 10 candidates).

The recsim package is not available in this image, so the simulator is
re-implemented here as a jittable functional env with the interest-evolution
*structure* (SlateQ paper, Ie et al. 2019; recsim
environments/interest_evolution.py):

  * documents: one-hot topic over ``NUM_TOPICS`` topics; per-doc quality
    drawn around a cluster mean — 70% "chocolatey" topics with quality means
    in [-3, 0] and 30% "nutritious" in [0, 3]; documents are resampled every
    step (``resample_documents=True`` in the reference configs).
  * user: a per-topic interest vector in [-1, 1]^T; a multinomial-logit
    choice model over the slate plus a no-click option; on click, interest
    drifts along the clicked topic with the recsim sign-flip rule
    (P(positive update) = (interest+1)/2); a time budget consumed by watch
    time, partially refunded in proportion to document quality, and a step
    penalty on no-click.
  * reward: clicked watch time (recsim's ``clicked_watchtime_reward``).

Constants marked CALIBRATED below are tuned (the recsim values are not
reproducible without the package) such that the reference's absolute bar of
154 separates a trained SlateQ policy from a random slate policy — random
slates score ~95-115, interest-aligned slates ~160+ (see
tests/test_slateq_recsim.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array

NUM_TOPICS = 20
VIDEO_LENGTH = 4.0          # recsim UtilityModelVideoSampler(video_length=4.0)
STEP_PENALTY = 0.5          # recsim UtilityModelUserSampler step_penalty
NO_CLICK_MASS = 1.0         # recsim no_click_mass (logit of the skip option)
QUALITY_BONUS_ALPHA = 0.9 / 3.4  # recsim user_update_alpha
MIN_QUALITY, MAX_QUALITY = -3.0, 3.0  # recsim UtilityModelVideoSampler
QUALITY_STD = 0.1
TIME_BUDGET = 250.0         # CALIBRATED (recsim uses 200-unit budgets)
CHOICE_TEMPERATURE = 4.0    # CALIBRATED (recsim rescales scores differently)
INTEREST_ALPHA = 0.25       # CALIBRATED interest-drift step
ENGAGEMENT_FLOOR = 0.2      # CALIBRATED: watch = len * (floor + (1-floor)*align)
MULTI_CLICK_BIAS = -3.0     # CALIBRATED sigmoid bias for the multi-click model

# 70% of topics are low-quality ("chocolatey"), 30% high ("nutritious") —
# recsim interest_evolution.UtilityModelVideoSampler cluster means.
_N_TRASHY = int(NUM_TOPICS * 0.7)
CLUSTER_QUALITY_MEANS = jnp.asarray(
    np.concatenate([
        np.linspace(MIN_QUALITY, 0.0, _N_TRASHY),
        np.linspace(0.0, MAX_QUALITY, NUM_TOPICS - _N_TRASHY),
    ]),
    jnp.float32,
)


@struct.dataclass
class RecSimIEState:
    user_interest: Array      # [T]
    doc_topics: Array         # [C] int32 topic ids
    doc_quality: Array        # [C]
    budget: Array             # scalar
    t: Array                  # int32 step counter
    last_clicked: Array       # int32 slate position of the click, -1 if none
    last_position_watch: Array  # [S] per-position watch time of the last step


class RecSimInterestEvolution:
    """Jittable interest-evolution slate env (single- or multi-click).

    ``step(state, slate, rng) -> (state, obs, reward, done)`` where ``slate``
    is ``[slate_size]`` candidate indices and reward is the step's total
    clicked watch time.  Per-position credit for SlateQ training is exposed
    as ``state.last_clicked`` (single-selection) / ``state.
    last_position_watch`` (multi-selection).
    """

    discrete = False

    def __init__(
        self,
        num_candidates: int = 10,
        slate_size: int = 3,
        max_steps: int = 50,
        single_selection: bool = True,
        is_interest_exploration: bool = False,
    ):
        """``is_interest_exploration`` mirrors the reference wrapper's flag
        (recsim.py:37,54-56): recsim's interest_exploration environment —
        click reward instead of watch time, a zero value head
        (``ValueWrapper(env, lambda user, doc: 0.0)``), and no interest
        drift/budget bonus (exploration of static per-topic affinities)."""
        if is_interest_exploration and not single_selection:
            raise NotImplementedError(
                "Multiselect interest exploration not implemented"
            )  # same constraint as the reference (recsim.py:42-45)
        self.num_candidates = num_candidates
        self.slate_size = slate_size
        self.max_steps = max_steps
        self.single_selection = single_selection
        self.is_interest_exploration = is_interest_exploration
        self.num_topics = NUM_TOPICS
        self.observation_dim = NUM_TOPICS

    # ------------------------------------------------------------- sampling

    def _sample_docs(self, rng: Array) -> Tuple[Array, Array]:
        r_topic, r_q = jax.random.split(rng)
        topics = jax.random.randint(r_topic, (self.num_candidates,), 0, NUM_TOPICS)
        quality = CLUSTER_QUALITY_MEANS[topics] + QUALITY_STD * jax.random.normal(
            r_q, (self.num_candidates,)
        )
        return topics, quality

    def reset(self, rng: Array):
        r_u, r_d = jax.random.split(rng)
        interest = jax.random.uniform(r_u, (NUM_TOPICS,), minval=-1.0, maxval=1.0)
        topics, quality = self._sample_docs(r_d)
        state = RecSimIEState(
            user_interest=interest,
            doc_topics=topics,
            doc_quality=quality,
            budget=jnp.asarray(TIME_BUDGET),
            t=jnp.zeros((), jnp.int32),
            last_clicked=jnp.asarray(-1, jnp.int32),
            last_position_watch=jnp.zeros(self.slate_size),
        )
        return state, self._obs(state)

    def _obs(self, state: RecSimIEState):
        return {
            "user": state.user_interest,
            "doc_features": jax.nn.one_hot(state.doc_topics, NUM_TOPICS),
            "doc_quality": state.doc_quality,
        }

    def doc_value(self, state_or_obs) -> Array:
        """The reference ValueWrapper's value head (recsim.py:24-29):
        dot(user, doc) for single selection, (dot+1)/2 for multi."""
        user = state_or_obs["user"] if isinstance(state_or_obs, dict) else (
            state_or_obs.user_interest
        )
        feats = (
            state_or_obs["doc_features"] if isinstance(state_or_obs, dict)
            else jax.nn.one_hot(state_or_obs.doc_topics, NUM_TOPICS)
        )
        if self.is_interest_exploration:
            return jnp.zeros(feats.shape[:-1])  # ValueWrapper(env, 0.0)
        dots = feats @ user
        return dots if self.single_selection else (dots + 1.0) / 2.0

    # ----------------------------------------------------------------- step

    def _drift_interest(self, interest: Array, topic: Array, rng: Array) -> Array:
        """recsim IEvUserModel.update_state: move the clicked topic's interest
        by +-alpha*(1-|target|), sign positive w.p. (interest+1)/2."""
        cur = interest[topic]
        update = INTEREST_ALPHA * (1.0 - cur)
        pos_prob = (cur + 1.0) / 2.0
        sign = jnp.where(jax.random.bernoulli(rng, pos_prob), 1.0, -1.0)
        return interest.at[topic].set(jnp.clip(cur + sign * update, -1.0, 1.0))

    def step(self, state: RecSimIEState, slate: Array, rng: Array):
        if self.single_selection:
            return self._step_single(state, slate, rng)
        return self._step_multi(state, slate, rng)

    def _step_single(self, state: RecSimIEState, slate: Array, rng: Array):
        r_choice, r_drift, r_docs = jax.random.split(rng, 3)
        u = state.user_interest
        topics = state.doc_topics[slate]                      # [S]
        align = u[topics]                                     # [S] in [-1, 1]
        logits = jnp.concatenate(
            [CHOICE_TEMPERATURE * align, jnp.asarray([NO_CLICK_MASS])]
        )
        choice = jax.random.categorical(r_choice, logits)
        clicked = choice < self.slate_size
        pos = jnp.minimum(choice, self.slate_size - 1)
        topic = topics[pos]
        quality = state.doc_quality[slate][pos]

        align01 = (u[topic] + 1.0) / 2.0
        if self.is_interest_exploration:
            # recsim interest_exploration: reward is the click itself; static
            # affinities (no drift), unit step cost (episode = max_steps)
            watch = jnp.where(clicked, 1.0, 0.0)
            new_interest = u
            budget = state.budget - 1.0
        else:
            engagement = VIDEO_LENGTH * (
                ENGAGEMENT_FLOOR + (1.0 - ENGAGEMENT_FLOOR) * align01
            )
            watch = jnp.where(clicked, jnp.minimum(state.budget, engagement), 0.0)

            new_interest = jnp.where(
                clicked, self._drift_interest(u, topic, r_drift), u
            )
            bonus = QUALITY_BONUS_ALPHA * watch * quality
            budget = jnp.where(
                clicked, state.budget - watch + bonus, state.budget - STEP_PENALTY
            )
        topics_new, quality_new = self._sample_docs(r_docs)  # resample_documents
        t = state.t + 1
        done = jnp.logical_or(budget <= 0.0, t >= self.max_steps)
        pos_watch = jnp.zeros(self.slate_size).at[pos].set(watch)
        new_state = RecSimIEState(
            user_interest=new_interest,
            doc_topics=topics_new,
            doc_quality=quality_new,
            budget=budget,
            t=t,
            last_clicked=jnp.where(clicked, pos, -1).astype(jnp.int32),
            last_position_watch=jnp.where(clicked, pos_watch, jnp.zeros_like(pos_watch)),
        )
        return new_state, self._obs(new_state), watch.astype(jnp.float32), done

    def _step_multi(self, state: RecSimIEState, slate: Array, rng: Array):
        """Multi-click variant (reference create_multiclick_environment):
        every slate item is examined; independent click probabilities from the
        same interest scores."""
        r_click, r_drift, r_docs = jax.random.split(rng, 3)
        u = state.user_interest
        topics = state.doc_topics[slate]
        align = u[topics]
        p_click = jax.nn.sigmoid(CHOICE_TEMPERATURE * align + MULTI_CLICK_BIAS)
        clicks = jax.random.bernoulli(r_click, p_click).astype(jnp.float32)  # [S]

        align01 = (align + 1.0) / 2.0
        engagement = VIDEO_LENGTH * (
            ENGAGEMENT_FLOOR + (1.0 - ENGAGEMENT_FLOOR) * align01
        )
        watch = clicks * engagement                                          # [S]
        total_watch = jnp.minimum(jnp.sum(watch), state.budget)
        scale = jnp.where(jnp.sum(watch) > 0, total_watch / jnp.maximum(jnp.sum(watch), 1e-6), 0.0)
        watch = watch * scale

        # drift once per clicked topic (vectorized: sum of one-topic updates)
        def drift_one(interest, i):
            return jnp.where(
                clicks[i] > 0,
                self._drift_interest(interest, topics[i], jax.random.fold_in(r_drift, i)),
                interest,
            )
        new_interest = u
        for i in range(self.slate_size):
            new_interest = drift_one(new_interest, i)

        quality = state.doc_quality[slate]
        bonus = QUALITY_BONUS_ALPHA * jnp.sum(watch * quality)
        any_click = jnp.sum(clicks) > 0
        budget = jnp.where(
            any_click,
            state.budget - total_watch + bonus,
            state.budget - STEP_PENALTY,
        )
        topics_new, quality_new = self._sample_docs(r_docs)
        t = state.t + 1
        done = jnp.logical_or(budget <= 0.0, t >= self.max_steps)
        new_state = RecSimIEState(
            user_interest=new_interest,
            doc_topics=topics_new,
            doc_quality=quality_new,
            budget=budget,
            t=t,
            last_clicked=jnp.asarray(-1, jnp.int32),
            last_position_watch=watch,
        )
        return (
            new_state,
            self._obs(new_state),
            jnp.sum(watch).astype(jnp.float32),
            done,
        )
