"""Frechet-sort: differentiable stochastic ranking policy.

Reference: reagent/samplers/frechet.py:19-160 — perturb (log-)scores with
Gumbel(0, 1/shape) noise, argsort descending; the log-prob of a permutation is
the Plackett-Luce chain sum of successive masked log-softmax heads.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt

Array = jax.Array


class FrechetSort:
    EPS = 1e-12

    def __init__(
        self,
        shape: float = 1.0,
        topk: Optional[int] = None,
        equiv_len: Optional[int] = None,
        log_scores: bool = False,
    ):
        self.shape = shape
        self.topk = topk
        self.upto = equiv_len
        if topk is not None:
            if equiv_len is None:
                self.upto = topk
            if self.upto is not None and self.upto > topk:
                raise ValueError(f"Equiv length {equiv_len} cannot exceed topk={topk}.")
        self.log_scores = log_scores

    def sample_action(self, scores: Array, rng: Array) -> rlt.ActorOutput:
        """scores [B, N] -> permutation [B, N] (or topk prefix)."""
        assert scores.ndim == 2, "sample_action only accepts batches"
        log_scores = scores if self.log_scores else jnp.log(scores)
        gumbel = jax.random.gumbel(rng, scores.shape) / self.shape
        perturbed = log_scores + gumbel
        action = jnp.argsort(-perturbed, axis=1)
        log_prob = self.log_prob(scores, action)
        if self.topk is not None:
            action = action[:, : self.topk]
        return rlt.ActorOutput(action=action, log_prob=log_prob)

    def log_prob(
        self,
        scores: Array,
        action: Array,
        equiv_len_override: Optional[Array] = None,
    ) -> Array:
        """Plackett-Luce log-prob of the top-``upto`` prefix (ref frechet.py:90)."""
        if scores.ndim == 1:
            scores = scores[None]
            action = action[None]
        n = scores.shape[1]
        assert action.shape[1] == n, (
            f"action must cover all {n} scores; pad shorter slates with index {n}"
        )
        log_scores = scores if self.log_scores else jnp.log(scores)
        # padding slot: -inf score at index n
        padded = jnp.concatenate(
            [log_scores, jnp.full((log_scores.shape[0], 1), -jnp.inf)], axis=1
        )
        s = jnp.take_along_axis(padded, action, axis=1) * self.shape

        upto = self.upto if equiv_len_override is None else equiv_len_override
        p = upto if upto is not None else n

        def head_logprob(i):
            # log softmax over the remaining tail, take the head
            tail = s[:, i:]
            lp = jax.nn.log_softmax(tail, axis=1)[:, 0]
            return jnp.nan_to_num(lp, neginf=0.0)

        if isinstance(p, int) or p is None:
            log_prob = sum(head_logprob(i) for i in range(int(p)))
        else:
            p = jnp.asarray(p)
            log_prob = sum(
                head_logprob(i) * (i < p).astype(jnp.float32) for i in range(n)
            )
        return log_prob
