"""On-device replay memory: circular + prioritized buffers as pure pytree updates."""

from reagent_tpu.replay.circular import ReplayBuffer, ReplayBufferState
from reagent_tpu.replay.sum_tree import SumTree, SumTreeState
from reagent_tpu.replay.prioritized import PrioritizedReplayBuffer
from reagent_tpu.replay.packed import PackedReplayBuffer, PackedReplayBufferState

__all__ = [
    "ReplayBuffer",
    "ReplayBufferState",
    "SumTree",
    "SumTreeState",
    "PrioritizedReplayBuffer",
    "PackedReplayBuffer",
    "PackedReplayBufferState",
]
