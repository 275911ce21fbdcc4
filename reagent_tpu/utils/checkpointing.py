"""Checkpoint / resume for trainer + replay-buffer state.

Reference: the reference delegates checkpointing to Lightning
(workflow/utils.py:161,173-176 resume_from_checkpoint + warm-start overwrite)
and keeps incremental-training epoch counters in registered buffers
(training/reagent_lightning_module.py:30-34,63-69).

TPU-native: everything that matters — params, optimizer state, target nets,
replay-buffer contents, RNG keys, step counters — is one pytree, so a
checkpoint is a single orbax save.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-indexed checkpoints with keep-last-k retention."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, f"no checkpoints in {self.directory}"
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()


def save_checkpoint(path: str, state: Any) -> None:
    """One-shot save of any pytree (trainer state, replay state, ...)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state_like: Any) -> Any:
    """Restore into the same pytree structure as ``state_like``."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), state_like)
