"""Target-network soft update.

Reference: reagent/optimizer/soft_update.py:9 — modeled there as a fake torch
optimizer so Lightning steps it; here it is simply a pure pytree blend applied
inside the jitted train step:  target <- tau * source + (1 - tau) * target.
"""

from __future__ import annotations

import jax


def soft_update(source_params, target_params, tau: float):
    """Polyak averaging. ``tau=1`` is a hard copy."""
    return jax.tree_util.tree_map(
        lambda s, t: tau * s + (1.0 - tau) * t, source_params, target_params
    )
