"""MDN-RNN trainer.

Reference: reagent/training/world_model/mdnrnn_trainer.py:21-180.
Loss = gmm / (state_dim + 2) + bce(not_terminal) + mse(reward).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import MDNRNNTrainerParameters
from reagent_tpu.models.mdn_rnn import MemoryNetwork, gmm_loss
from reagent_tpu.optim import Adam, make_optimizer

Array = jax.Array


@struct.dataclass
class MDNRNNTrainerState:
    params: Any
    opt_state: Any
    step: Array


class MDNRNNTrainer:
    def __init__(
        self,
        memory_network: MemoryNetwork,
        params: MDNRNNTrainerParameters = MDNRNNTrainerParameters(),
    ):
        self.memory_network = memory_network
        self.params = params
        self.optimizer = make_optimizer(Adam(lr=params.learning_rate))

    def init(self, rng: Array, batch_proto: rlt.MemoryNetworkInput) -> MDNRNNTrainerState:
        net_params = self.memory_network.init(rng, batch_proto.state, batch_proto.action)
        return MDNRNNTrainerState(
            params=net_params,
            opt_state=self.optimizer.init(net_params),
            step=jnp.zeros((), jnp.int32),
        )

    def get_loss(
        self, net_params, batch: rlt.MemoryNetworkInput
    ) -> Dict[str, Array]:
        state_dim = batch.state.float_features.shape[2]
        out = self.memory_network.apply(net_params, batch.state, batch.action)
        mus, sigmas, logpi = out.mus, out.sigmas, out.logpi
        rs, nts = out.reward, out.not_terminal

        next_state = batch.next_state.float_features
        not_terminal = batch.not_terminal.astype(jnp.float32)
        reward = batch.reward
        if self.params.fit_only_one_next_step:
            next_state, not_terminal, reward = (
                next_state[-1:], not_terminal[-1:], reward[-1:]
            )
            mus, sigmas, logpi, nts, rs = (
                mus[-1:], sigmas[-1:], logpi[-1:], nts[-1:], rs[-1:]
            )

        gmm = gmm_loss(next_state, mus, sigmas, logpi) * self.params.next_state_loss_weight
        bce = (
            jnp.mean(optax.sigmoid_binary_cross_entropy(nts, not_terminal))
            * self.params.not_terminal_loss_weight
        )
        mse = jnp.mean((rs - reward) ** 2) * self.params.reward_loss_weight
        loss = gmm / (state_dim + 2) + bce + mse
        return {"gmm": gmm, "bce": bce, "mse": mse, "loss": loss}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: MDNRNNTrainerState, batch: rlt.MemoryNetworkInput
    ) -> Tuple[MDNRNNTrainerState, Dict[str, Array]]:
        def loss_fn(p):
            losses = self.get_loss(p, batch)
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            losses,
        )
