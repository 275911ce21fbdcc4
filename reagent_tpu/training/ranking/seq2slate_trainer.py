"""Seq2Slate policy-gradient trainer (off-policy REINFORCE with IPS clamp).

Reference: reagent/training/ranking/seq2slate_trainer.py:25-220.
Loss: -clamp(p_model / p_logged) * (slate_reward - baseline).
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
from reagent_tpu.core.parameters import IPSClamp, IPSClampMethod, Seq2SlateParameters
from reagent_tpu.models.seq2slate import Seq2SlateMode, Seq2SlateTransformerModel
from reagent_tpu.optim import make_optimizer

Array = jax.Array


def ips_clamp(impt_smpl: Array, clamp: Optional[IPSClamp]) -> Array:
    """Reference: reagent/model_utils/seq2slate_utils.py ips_clamp."""
    if clamp is None:
        return impt_smpl
    if clamp.clamp_method == IPSClampMethod.AGGRESSIVE:
        # zero out (drop) samples with too-large weights
        return jnp.where(impt_smpl > clamp.clamp_max, 0.0, impt_smpl)
    return jnp.clip(impt_smpl, None, clamp.clamp_max)


@struct.dataclass
class Seq2SlateTrainerState:
    policy_params: Any
    policy_opt_state: Any
    step: Array
    baseline_params: Any = None
    baseline_opt_state: Any = None


class Seq2SlateTrainer:
    def __init__(
        self,
        seq2slate_net: Seq2SlateTransformerModel,
        params: Seq2SlateParameters = Seq2SlateParameters(),
        baseline_net: Optional[nn.Module] = None,
        baseline_warmup_num_batches: int = 0,
        policy_optimizer: Any = None,
        baseline_optimizer: Any = None,
    ) -> None:
        self.seq2slate_net = seq2slate_net
        self.params = params
        self.baseline_net = baseline_net
        self.baseline_warmup_num_batches = baseline_warmup_num_batches
        self.policy_opt = make_optimizer(policy_optimizer)
        self.baseline_opt = make_optimizer(baseline_optimizer)

    def init(self, rng: Array, batch_proto: rlt.PreprocessedRankingInput) -> Seq2SlateTrainerState:
        r1, r2 = jax.random.split(rng)
        policy_params = self.seq2slate_net.init(
            r1,
            Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value,
            batch_proto.state.float_features,
            batch_proto.src_seq.float_features,
            tgt_in_idx=batch_proto.tgt_in_idx,
            tgt_out_idx=batch_proto.tgt_out_idx,
            tgt_in_seq=batch_proto.tgt_in_seq.float_features,
        )
        state = Seq2SlateTrainerState(
            policy_params=policy_params,
            policy_opt_state=self.policy_opt.init(policy_params),
            step=jnp.zeros((), jnp.int32),
        )
        if self.baseline_net is not None:
            baseline_params = self.baseline_net.init(
                r2, batch_proto.state.float_features
            )
            state = state.replace(
                baseline_params=baseline_params,
                baseline_opt_state=self.baseline_opt.init(baseline_params),
            )
        return state

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: Seq2SlateTrainerState, batch: rlt.PreprocessedRankingInput
    ) -> Tuple[Seq2SlateTrainerState, Dict[str, Array]]:
        reward = batch.slate_reward.reshape(-1, 1)

        # baseline
        baseline_params = state.baseline_params
        baseline_opt_state = state.baseline_opt_state
        baseline_loss = jnp.asarray(0.0)
        if self.baseline_net is not None:
            def b_loss_fn(bp):
                b = self.baseline_net.apply(bp, batch.state.float_features)
                return jnp.mean((b - reward) ** 2), b

            (baseline_loss, b), b_grads = jax.value_and_grad(b_loss_fn, has_aux=True)(
                state.baseline_params
            )
            b_up, baseline_opt_state = self.baseline_opt.update(
                b_grads, state.baseline_opt_state, state.baseline_params
            )
            baseline_params = optax.apply_updates(state.baseline_params, b_up)
            b = jax.lax.stop_gradient(b)
        else:
            b = jnp.zeros_like(reward)

        logged_propensities = batch.tgt_out_probs.reshape(-1, 1)

        def policy_loss_fn(pp):
            log_probs = self.seq2slate_net.apply(
                pp,
                Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value,
                batch.state.float_features,
                batch.src_seq.float_features,
                tgt_in_idx=batch.tgt_in_idx,
                tgt_out_idx=batch.tgt_out_idx,
                tgt_in_seq=batch.tgt_in_seq.float_features,
            ).per_seq_log_probs
            model_propensities = jnp.exp(log_probs)
            impt_smpl = model_propensities / jnp.clip(logged_propensities, 1e-35)
            clamped = ips_clamp(impt_smpl, self.params.ips_clamp)
            obj_loss = jnp.mean(-clamped * (reward - b))
            return obj_loss, (impt_smpl, clamped)

        (obj_loss, (impt_smpl, clamped)), grads = jax.value_and_grad(
            policy_loss_fn, has_aux=True
        )(state.policy_params)

        # baseline warmup: freeze policy updates until warmed (branchless)
        do_update = state.step >= self.baseline_warmup_num_batches
        p_up, new_p_opt = self.policy_opt.update(
            grads, state.policy_opt_state, state.policy_params
        )
        blend = lambda n, o: jax.tree_util.tree_map(
            lambda a, c: jnp.where(do_update, a, c), n, o
        )
        policy_params = blend(
            optax.apply_updates(state.policy_params, p_up), state.policy_params
        )
        policy_opt_state = blend(new_p_opt, state.policy_opt_state)

        return (
            state.replace(
                policy_params=policy_params,
                policy_opt_state=policy_opt_state,
                baseline_params=baseline_params,
                baseline_opt_state=baseline_opt_state,
                step=state.step + 1,
            ),
            {
                "obj_loss": obj_loss,
                "baseline_loss": baseline_loss,
                "ips_mean": jnp.mean(impt_smpl),
                "clamped_ips_mean": jnp.mean(clamped),
            },
        )

    def rank(
        self, state: Seq2SlateTrainerState, batch: rlt.PreprocessedRankingInput,
        tgt_seq_len: int, greedy: bool = True, rng: Optional[Array] = None,
    ):
        return self.seq2slate_net.apply(
            state.policy_params,
            Seq2SlateMode.RANK_MODE.value,
            batch.state.float_features,
            batch.src_seq.float_features,
            tgt_seq_len=tgt_seq_len,
            greedy=greedy,
            rng=rng,
        )
