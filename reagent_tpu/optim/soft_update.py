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


def soft_update_excluding(source_params, target_params, tau: float, hard_copy_fn):
    """Soft update, except leaves whose key path satisfies ``hard_copy_fn``
    are copied verbatim (tau=1).

    Reference: reagent/models/no_soft_update_embedding.py — embedding tables
    are excluded from polyak blending and synced by hard copy instead.
    ``hard_copy_fn`` receives the '/'-joined key path of each leaf, e.g.
    ``lambda path: "embedding" in path``.
    """

    def blend(path, s, t):
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if hard_copy_fn(name):
            return s
        return tau * s + (1.0 - tau) * t

    return jax.tree_util.tree_map_with_path(blend, source_params, target_params)
