"""Pallas TPU kernels for hot ops.

The compute path is mostly XLA-fused jnp; these kernels cover the spots where
hand control of VMEM/grid beats the compiler:

* fused_mlp        — single-kernel small-MLP forward (policy scoring)
* nstep_replay     — fused horizon-window gather + discounted-reward dot
* quantile_huber   — pairwise quantile-huber loss for QR-DQN
"""

from reagent_tpu.ops.fused_mlp import fused_mlp_forward
from reagent_tpu.ops.nstep_replay import nstep_rewards
from reagent_tpu.ops.quantile_huber import quantile_huber_loss

__all__ = ["fused_mlp_forward", "nstep_rewards", "quantile_huber_loss"]
