"""Permutation feature importance finds the feature the model depends on.

Reference: reagent/evaluation/feature_importance/feature_importance_perturbation.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.evaluation.feature_importance import (
    FeatureImportancePerturbation,
    create_default_perturb_fn,
)


def test_important_feature_ranks_first():
    rng = jax.random.PRNGKey(0)
    # model output depends heavily on feature 0, mildly on 1, not on 2
    w = jnp.array([10.0, 1.0, 0.0])

    def pred_fn(model_w, data):
        values, presence = data["state"]
        return (values * presence) @ model_w

    batches = []
    for i in range(3):
        rng, sub = jax.random.split(rng)
        values = jax.random.normal(sub, (64, 3))
        batches.append({"state": (values, jnp.ones((64, 3)))})

    fi = FeatureImportancePerturbation(
        model=w,
        sorted_feature_ids=[100, 200, 300],
        data_loader=batches,
        pred_fn=pred_fn,
        perturb_fn=create_default_perturb_fn("state"),
        repeat=2,
        rng=jax.random.PRNGKey(7),
    )
    df = fi.compute_feature_importance()
    assert list(df["feature_id"]) == [100, 200, 300]
    assert df["feature_importance"].iloc[0] > 5 * df["feature_importance"].iloc[1]
    np.testing.assert_allclose(df["feature_importance"].iloc[2], 0.0, atol=1e-6)
