"""Seq2Reward trainer + compress-model trainer.

Reference: reagent/training/world_model/seq2reward_trainer.py:68-270 and
compress_model_trainer.py — (1) fit the LSTM to discounted cumulative rewards
of logged action sequences + a step-count classifier; (2) compress the
resulting planning Q into a feedforward net.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import Seq2RewardTrainerParameters
from reagent_tpu.models.fully_connected_network import FullyConnectedNetwork
from reagent_tpu.models.seq2reward_model import Seq2RewardNetwork, gen_permutations, get_Q
from reagent_tpu.optim import Adam, make_optimizer

Array = jax.Array


@struct.dataclass
class Seq2RewardTrainerState:
    params: Any
    opt_state: Any
    step_params: Any
    step_opt_state: Any
    step: Array


class Seq2RewardTrainer:
    def __init__(
        self,
        seq2reward_network: Seq2RewardNetwork,
        params: Seq2RewardTrainerParameters = Seq2RewardTrainerParameters(),
    ):
        self.seq2reward_network = seq2reward_network
        self.params = params
        self.optimizer = make_optimizer(Adam(lr=params.learning_rate))
        # step-count classifier over num-valid-steps (ref :93-97)
        self.step_predict_network = FullyConnectedNetwork(
            sizes=[
                seq2reward_network.state_dim,
                params.step_predict_net_size,
                params.step_predict_net_size,
                self._max_steps(),
            ],
            activations=["relu", "relu", "linear"],
        )

    def _max_steps(self) -> int:
        return self.params.multi_steps

    def init(self, rng: Array, batch_proto: rlt.MemoryNetworkInput) -> Seq2RewardTrainerState:
        r1, r2 = jax.random.split(rng)
        params = self.seq2reward_network.init(
            r1, batch_proto.state, batch_proto.action
        )
        step_params = self.step_predict_network.init(
            r2, batch_proto.state.float_features[0]
        )
        return Seq2RewardTrainerState(
            params=params,
            opt_state=self.optimizer.init(params),
            step_params=step_params,
            step_opt_state=self.optimizer.init(step_params),
            step=jnp.zeros((), jnp.int32),
        )

    def get_mse_loss(self, params, batch: rlt.MemoryNetworkInput) -> Array:
        """Reference :202-246."""
        valid_step = batch.valid_step.reshape(-1)
        out = self.seq2reward_network.apply(
            params, batch.state, batch.action, valid_step
        )
        T, B = batch.reward.shape
        gammas = self.params.gamma ** jnp.arange(T)
        acc = jnp.cumsum(batch.reward * gammas[:, None], axis=0)  # [T, B]
        target = acc[(valid_step - 1).astype(jnp.int32), jnp.arange(B)][:, None]
        return jnp.mean((out.acc_reward - target) ** 2)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: Seq2RewardTrainerState, batch: rlt.MemoryNetworkInput
    ) -> Tuple[Seq2RewardTrainerState, Dict[str, Array]]:
        mse_loss, grads = jax.value_and_grad(self.get_mse_loss)(state.params, batch)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        valid_step = batch.valid_step.reshape(-1)

        def step_loss_fn(sp):
            logits = self.step_predict_network.apply(
                sp, batch.state.float_features[0]
            )
            labels = (valid_step - 1).astype(jnp.int32)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )

        step_loss, s_grads = jax.value_and_grad(step_loss_fn)(state.step_params)
        s_up, step_opt_state = self.optimizer.update(
            s_grads, state.step_opt_state, state.step_params
        )
        step_params = optax.apply_updates(state.step_params, s_up)
        return (
            state.replace(
                params=params,
                opt_state=opt_state,
                step_params=step_params,
                step_opt_state=step_opt_state,
                step=state.step + 1,
            ),
            {"mse_loss": mse_loss, "step_entropy_loss": step_loss},
        )


@struct.dataclass
class CompressModelTrainerState:
    params: Any
    opt_state: Any
    step: Array


class CompressModelTrainer:
    """Fit a feedforward net to the seq2reward planning Q (ref compress_model_trainer.py)."""

    def __init__(
        self,
        compress_model_network,  # state -> [B, num_actions]
        seq2reward_network: Seq2RewardNetwork,
        params: Seq2RewardTrainerParameters = Seq2RewardTrainerParameters(),
    ):
        self.compress_model_network = compress_model_network
        self.seq2reward_network = seq2reward_network
        self.params = params
        self.optimizer = make_optimizer(Adam(lr=params.compress_model_learning_rate))
        self.num_actions = len(params.action_names) or seq2reward_network.action_dim
        self.all_permut = gen_permutations(params.multi_steps, self.num_actions)

    def init(self, rng: Array, obs_proto: Array) -> CompressModelTrainerState:
        params = self.compress_model_network.init(rng, obs_proto)
        return CompressModelTrainerState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self,
        state: CompressModelTrainerState,
        batch: rlt.MemoryNetworkInput,
        seq2reward_params=None,
    ) -> Tuple[CompressModelTrainerState, Dict[str, Array]]:
        first_state = batch.state.float_features[0]
        target_q = jax.lax.stop_gradient(
            get_Q(self.seq2reward_network, seq2reward_params, first_state, self.all_permut)
        )

        def loss_fn(p):
            q = self.compress_model_network.apply(p, first_state)
            return jnp.mean((q - target_q) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            {"mse_loss": loss},
        )
