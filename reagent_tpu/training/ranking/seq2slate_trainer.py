"""Seq2Slate policy-gradient trainer (off-policy REINFORCE with IPS clamp).

Reference: reagent/training/ranking/seq2slate_trainer.py:25-220.
Loss: -clamp(p_model / p_logged) * (slate_reward - baseline).
Validation/CPE: validation_step (reference :196-259) builds greedy and
non-greedy EvaluationDataPages scored by the slate reward network.
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


def seq2slate_validation_step(
    seq2slate_net,
    policy_params,
    batch: rlt.PreprocessedRankingInput,
    baseline_net=None,
    baseline_params=None,
    calc_cpe: bool = False,
    reward_network=None,
    reward_params=None,
):
    """Shared seq2slate validation pass (reference seq2slate_trainer.py:196-259,
    seq2slate_tf_trainer.py:100-137).

    Returns ``(metrics, edp_g, edp_ng)``; the EDPs are ``None`` unless
    ``calc_cpe`` (then ``reward_network``/``reward_params`` are required).
    ``metrics`` carries the arrays the reference logs: eval_baseline_loss,
    eval_advantages, logged_slate_rank_probs, ranked_slate_rank_probs.
    """
    from reagent_tpu.evaluation.evaluation_data_page import EvaluationDataPage

    reward = batch.slate_reward.reshape(-1, 1)
    T = batch.tgt_out_idx.shape[1]

    logged_slate_rank_probs = jnp.exp(
        seq2slate_net.apply(
            policy_params,
            Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value,
            batch.state.float_features,
            batch.src_seq.float_features,
            tgt_in_idx=batch.tgt_in_idx,
            tgt_out_idx=batch.tgt_out_idx,
            tgt_in_seq=(
                None if batch.tgt_in_seq is None else batch.tgt_in_seq.float_features
            ),
        ).per_seq_log_probs
    ).reshape(-1)

    eval_baseline_loss = jnp.asarray(0.0)
    if baseline_net is not None and baseline_params is not None:
        b = baseline_net.apply(baseline_params, batch.state.float_features)
        eval_baseline_loss = jnp.mean((b - reward) ** 2)
    else:
        b = jnp.zeros_like(reward)
    eval_advantages = (reward - b).reshape(-1)

    ranked_output = seq2slate_net.apply(
        policy_params,
        Seq2SlateMode.RANK_MODE.value,
        batch.state.float_features,
        batch.src_seq.float_features,
        tgt_seq_len=T,
        greedy=True,
    )
    metrics = {
        "eval_baseline_loss": eval_baseline_loss,
        "eval_advantages": eval_advantages,
        "logged_slate_rank_probs": logged_slate_rank_probs,
        "ranked_slate_rank_probs": ranked_output.ranked_per_seq_probs.reshape(-1),
    }
    if not calc_cpe:
        return metrics, None, None

    assert reward_network is not None, "calc_cpe requires a slate reward network"
    mdp_ids = None if batch.extras is None else batch.extras.mdp_id
    seq_nums = None if batch.extras is None else batch.extras.sequence_number
    edp_g = EvaluationDataPage.create_from_tensors_seq2slate(
        seq2slate_net, policy_params, reward_network, reward_params, batch,
        eval_greedy=True, mdp_ids=mdp_ids, sequence_numbers=seq_nums,
    )
    edp_ng = EvaluationDataPage.create_from_tensors_seq2slate(
        seq2slate_net, policy_params, reward_network, reward_params, batch,
        eval_greedy=False, mdp_ids=mdp_ids, sequence_numbers=seq_nums,
    )
    return metrics, edp_g, edp_ng


def accumulate_edp_pairs(pairs):
    """validation_epoch_end equivalent (reference seq2slate_trainer.py:262-279):
    concatenate per-batch (edp_g, edp_ng) pairs into one pair."""
    pairs = [p for p in pairs if p[0] is not None]
    if not pairs:
        return None, None
    edp_g, edp_ng = pairs[0]
    for g, ng in pairs[1:]:
        edp_g = edp_g.append(g)
        edp_ng = edp_ng.append(ng)
    return edp_g, edp_ng


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
        calc_cpe: bool = False,
        reward_network: Optional[nn.Module] = None,
        reward_params: Any = None,
    ) -> None:
        self.seq2slate_net = seq2slate_net
        self.params = params
        self.baseline_net = baseline_net
        self.baseline_warmup_num_batches = baseline_warmup_num_batches
        self.policy_opt = make_optimizer(policy_optimizer)
        self.baseline_opt = make_optimizer(baseline_optimizer)
        assert not calc_cpe or reward_network is not None
        self.calc_cpe = calc_cpe
        self.reward_network = reward_network
        self.reward_params = reward_params

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

    def validation_step(
        self, state: Seq2SlateTrainerState, batch: rlt.PreprocessedRankingInput,
        reward_params: Any = None,
    ):
        """Reference seq2slate_trainer.py:196-259: eval metrics + (edp_g, edp_ng)
        when calc_cpe.  Feed the accumulated EDPs to
        evaluation.ope_adapter.OPEstimatorAdapter for slate OPE."""
        return seq2slate_validation_step(
            self.seq2slate_net,
            state.policy_params,
            batch,
            baseline_net=self.baseline_net,
            baseline_params=state.baseline_params,
            calc_cpe=self.calc_cpe,
            reward_network=self.reward_network,
            reward_params=(
                reward_params if reward_params is not None else self.reward_params
            ),
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
