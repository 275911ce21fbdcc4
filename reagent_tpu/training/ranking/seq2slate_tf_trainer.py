"""Seq2Slate teacher-forcing + simulation trainers.

Reference: reagent/training/ranking/seq2slate_tf_trainer.py:24 (KL toward
ground-truth optimal orderings) and seq2slate_sim_trainer.py:62 (train on
slates re-labeled by a reward-model simulator).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import Seq2SlateParameters
from reagent_tpu.models.seq2slate import Seq2SlateMode, Seq2SlateTransformerModel
from reagent_tpu.optim import make_optimizer
from reagent_tpu.training.ranking.seq2slate_trainer import Seq2SlateTrainer

Array = jax.Array


@struct.dataclass
class Seq2SlateTFTrainerState:
    policy_params: Any
    policy_opt_state: Any
    step: Array


class Seq2SlateTeacherForcingTrainer:
    """KL(per-symbol distribution || one-hot optimal ordering) (ref tf_trainer.py:66-90)."""

    def __init__(
        self,
        seq2slate_net: Seq2SlateTransformerModel,
        params: Seq2SlateParameters = Seq2SlateParameters(),
        policy_optimizer: Any = None,
        calc_cpe: bool = False,
        reward_network: Optional[nn.Module] = None,
        reward_params: Any = None,
    ):
        self.seq2slate_net = seq2slate_net
        self.params = params
        self.policy_opt = make_optimizer(policy_optimizer)
        assert not calc_cpe or reward_network is not None
        self.calc_cpe = calc_cpe
        self.reward_network = reward_network
        self.reward_params = reward_params

    def validation_step(
        self, state: "Seq2SlateTFTrainerState",
        batch: rlt.PreprocessedRankingInput, reward_params: Any = None,
    ):
        """Reference seq2slate_tf_trainer.py:100-137 (no baseline net)."""
        from reagent_tpu.training.ranking.seq2slate_trainer import (
            seq2slate_validation_step,
        )

        return seq2slate_validation_step(
            self.seq2slate_net,
            state.policy_params,
            batch,
            calc_cpe=self.calc_cpe,
            reward_network=self.reward_network,
            reward_params=(
                reward_params if reward_params is not None else self.reward_params
            ),
        )

    def init(self, rng: Array, batch_proto: rlt.PreprocessedRankingInput) -> Seq2SlateTFTrainerState:
        policy_params = self.seq2slate_net.init(
            rng,
            Seq2SlateMode.PER_SYMBOL_LOG_PROB_DIST_MODE.value,
            batch_proto.state.float_features,
            batch_proto.src_seq.float_features,
            tgt_in_idx=batch_proto.tgt_in_idx,
            tgt_out_idx=batch_proto.tgt_out_idx,
            tgt_in_seq=batch_proto.tgt_in_seq.float_features,
        )
        return Seq2SlateTFTrainerState(
            policy_params=policy_params,
            policy_opt_state=self.policy_opt.init(policy_params),
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: Seq2SlateTFTrainerState, batch: rlt.PreprocessedRankingInput
    ) -> Tuple[Seq2SlateTFTrainerState, Dict[str, Array]]:
        assert batch.optim_tgt_out_idx is not None
        C = batch.src_seq.float_features.shape[1] + 2
        labels = jax.nn.one_hot(batch.optim_tgt_out_idx, C)  # [B, T, C]

        def loss_fn(pp):
            log_probs = self.seq2slate_net.apply(
                pp,
                Seq2SlateMode.PER_SYMBOL_LOG_PROB_DIST_MODE.value,
                batch.state.float_features,
                batch.src_seq.float_features,
                tgt_in_idx=batch.optim_tgt_in_idx,
                tgt_out_idx=batch.optim_tgt_out_idx,
                tgt_in_seq=batch.optim_tgt_in_seq.float_features,
            ).per_symbol_log_probs
            # batchmean KL to the one-hot target == mean NLL of the label
            return -jnp.mean(jnp.sum(labels * log_probs, axis=(1, 2)))

        loss, grads = jax.value_and_grad(loss_fn)(state.policy_params)
        updates, opt_state = self.policy_opt.update(
            grads, state.policy_opt_state, state.policy_params
        )
        return (
            state.replace(
                policy_params=optax.apply_updates(state.policy_params, updates),
                policy_opt_state=opt_state,
                step=state.step + 1,
            ),
            {"kl_loss": loss},
        )


class Seq2SlateSimulationTrainer:
    """On-policy training against a reward-model simulator.

    Reference: seq2slate_sim_trainer.py:62-200 — rank with the current policy,
    score the ranked slates with a reward model, then run the policy-gradient
    update as if those were logged slates.
    """

    def __init__(
        self,
        seq2slate_net: Seq2SlateTransformerModel,
        reward_net: nn.Module,
        reward_params: Any,
        params: Seq2SlateParameters = Seq2SlateParameters(),
        policy_optimizer: Any = None,
        baseline_net: Optional[nn.Module] = None,
    ):
        self.seq2slate_net = seq2slate_net
        self.reward_net = reward_net
        self.reward_params = reward_params
        self.trainer = Seq2SlateTrainer(
            seq2slate_net, params=params, baseline_net=baseline_net,
            policy_optimizer=policy_optimizer,
        )

    def init(self, rng: Array, batch_proto: rlt.PreprocessedRankingInput):
        return self.trainer.init(rng, batch_proto)

    def validation_step(self, state, batch: rlt.PreprocessedRankingInput):
        """The reference sim trainer inherits Seq2SlateTrainer's
        validation_step (seq2slate_sim_trainer.py:62); the simulator's reward
        model doubles as the CPE reward network, so calc_cpe is always on."""
        from reagent_tpu.training.ranking.seq2slate_trainer import (
            seq2slate_validation_step,
        )

        return seq2slate_validation_step(
            self.seq2slate_net,
            state.policy_params,
            batch,
            baseline_net=self.trainer.baseline_net,
            baseline_params=state.baseline_params,
            calc_cpe=True,
            reward_network=self.reward_net,
            reward_params=self.reward_params,
        )

    def train_step(self, state, batch: rlt.PreprocessedRankingInput, rng: Array):
        # 1. rank with the current policy (sampling)
        out = self.seq2slate_net.apply(
            state.policy_params,
            Seq2SlateMode.RANK_MODE.value,
            batch.state.float_features,
            batch.src_seq.float_features,
            tgt_seq_len=batch.tgt_out_idx.shape[1],
            greedy=False,
            rng=rng,
        )
        ranked_idx = out.ranked_tgt_out_idx
        B, T = ranked_idx.shape
        cand = jnp.concatenate(
            [jnp.zeros((B, 2, batch.src_seq.float_features.shape[2])),
             batch.src_seq.float_features], axis=1
        )
        tgt_in = jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32), ranked_idx[:, :-1]], axis=1
        )
        sim_batch = batch.replace(
            tgt_out_idx=ranked_idx,
            tgt_in_idx=tgt_in,
            tgt_in_seq=rlt.FeatureData(
                float_features=jnp.take_along_axis(cand, tgt_in[:, :, None], axis=1)
            ),
            tgt_out_seq=rlt.FeatureData(
                float_features=jnp.take_along_axis(cand, ranked_idx[:, :, None], axis=1)
            ),
            tgt_out_probs=out.ranked_per_seq_probs,
        )
        # 2. simulated reward from the reward model
        sim_reward = self.reward_net.apply(self.reward_params, sim_batch)
        sim_batch = sim_batch.replace(slate_reward=jax.lax.stop_gradient(sim_reward))
        # 3. policy-gradient update on the simulated slates
        return self.trainer.train_step(state, sim_batch)
