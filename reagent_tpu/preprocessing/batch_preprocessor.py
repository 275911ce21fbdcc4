"""Batch preprocessors: raw timeline columns -> typed device batches.

Reference: reagent/preprocessing/batch_preprocessor.py:26 (DiscreteDqn/
ParametricDqn/PolicyNetwork batch preprocessors) and
reagent/preprocessing/sparse_to_dense.py (map<fid, value> -> dense+presence).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from reagent_tpu.core import types as rlt
from reagent_tpu.preprocessing.preprocessor import Preprocessor

Array = jax.Array


def sparse_to_dense(
    feature_dicts: Sequence[Optional[Dict]], sorted_features: List[int]
) -> Tuple[np.ndarray, np.ndarray]:
    """map<feature_id, value> rows -> (values, presence) in sorted-feature order.

    Reference: preprocessing/sparse_to_dense.py PandasSparseToDenseProcessor.
    """
    n, f = len(feature_dicts), len(sorted_features)
    values = np.zeros((n, f), np.float32)
    presence = np.zeros((n, f), np.float32)
    col = {fid: j for j, fid in enumerate(sorted_features)}
    for i, d in enumerate(feature_dicts):
        if not d:
            continue
        for fid, v in d.items():
            j = col.get(int(fid))
            if j is not None and v is not None:
                values[i, j] = v
                presence[i, j] = 1.0
    return values, presence


class BatchPreprocessor:
    pass


class DiscreteDqnBatchPreprocessor(BatchPreprocessor):
    """Reference: batch_preprocessor.py:26-50."""

    def __init__(
        self,
        num_actions: int,
        state_preprocessor: Preprocessor,
        action_names: Optional[Sequence[str]] = None,
    ):
        self.num_actions = num_actions
        self.state_preprocessor = state_preprocessor
        self.action_names = list(action_names) if action_names else [
            str(i) for i in range(num_actions)
        ]
        self._a2i = {a: i for i, a in enumerate(self.action_names)}

    def _one_hot_actions(self, actions: Sequence) -> np.ndarray:
        out = np.zeros((len(actions), self.num_actions), np.float32)
        for i, a in enumerate(actions):
            key = str(a)
            if key in self._a2i:
                out[i, self._a2i[key]] = 1.0
        return out

    def _possible_mask(self, rows: Sequence) -> np.ndarray:
        out = np.zeros((len(rows), self.num_actions), np.float32)
        for i, pa in enumerate(rows):
            if pa is None or (isinstance(pa, float) and np.isnan(pa)):
                continue
            for a in pa:
                j = self._a2i.get(str(a))
                if j is not None:
                    out[i, j] = 1.0
        return out

    def __call__(self, batch_df: pd.DataFrame) -> rlt.DiscreteDqnInput:
        sf = self.state_preprocessor.sorted_features
        sv, sp = sparse_to_dense(batch_df["state_features"].tolist(), sf)
        nv, npres = sparse_to_dense(batch_df["next_state_features"].tolist(), sf)
        state = self.state_preprocessor(jnp.asarray(sv), jnp.asarray(sp))
        next_state = self.state_preprocessor(jnp.asarray(nv), jnp.asarray(npres))

        action = self._one_hot_actions(batch_df["action"].tolist())
        next_action = self._one_hot_actions(batch_df["next_action"].tolist())
        not_terminal = batch_df["not_terminal"].to_numpy(np.float32).reshape(-1, 1)
        if "possible_actions" in batch_df.columns:
            pam = self._possible_mask(batch_df["possible_actions"].tolist())
        else:
            pam = np.ones((len(batch_df), self.num_actions), np.float32)
        if "possible_next_actions" in batch_df.columns:
            pnam = self._possible_mask(batch_df["possible_next_actions"].tolist())
        else:
            pnam = np.tile(not_terminal, (1, self.num_actions))

        B = len(batch_df)
        mdp_raw = batch_df["mdp_id"].tolist()
        mdp_codes = pd.factorize(pd.Series([str(m) for m in mdp_raw]))[0]
        extras = rlt.ExtraData(
            mdp_id=jnp.asarray(mdp_codes.reshape(-1, 1)),
            sequence_number=jnp.asarray(
                batch_df["sequence_number"].to_numpy(np.int64).reshape(-1, 1)
            ),
            action_probability=jnp.asarray(
                batch_df.get(
                    "action_probability", pd.Series(np.ones(B))
                ).to_numpy(np.float32).reshape(-1, 1)
            ),
        )
        return rlt.DiscreteDqnInput(
            state=rlt.FeatureData(float_features=state),
            next_state=rlt.FeatureData(float_features=next_state),
            action=jnp.asarray(action),
            next_action=jnp.asarray(next_action),
            reward=jnp.asarray(batch_df["reward"].to_numpy(np.float32).reshape(-1, 1)),
            time_diff=jnp.asarray(batch_df["time_diff"].to_numpy(np.float32).reshape(-1, 1)),
            step=jnp.ones((B, 1), jnp.int32),
            not_terminal=jnp.asarray(not_terminal),
            possible_actions_mask=jnp.asarray(pam),
            possible_next_actions_mask=jnp.asarray(pnam),
            extras=extras,
        )


class PolicyNetworkBatchPreprocessor(BatchPreprocessor):
    """Continuous actions as map<fid, value> (reference batch_preprocessor.py:96)."""

    def __init__(self, state_preprocessor: Preprocessor, action_preprocessor: Preprocessor):
        self.state_preprocessor = state_preprocessor
        self.action_preprocessor = action_preprocessor

    def __call__(self, batch_df: pd.DataFrame) -> rlt.PolicyNetworkInput:
        sf = self.state_preprocessor.sorted_features
        af = self.action_preprocessor.sorted_features
        sv, sp = sparse_to_dense(batch_df["state_features"].tolist(), sf)
        nv, npres = sparse_to_dense(batch_df["next_state_features"].tolist(), sf)
        av, ap = sparse_to_dense(batch_df["action"].tolist(), af)
        nav, nap = sparse_to_dense(batch_df["next_action"].tolist(), af)
        B = len(batch_df)
        not_terminal = batch_df["not_terminal"].to_numpy(np.float32).reshape(-1, 1)
        return rlt.PolicyNetworkInput(
            state=rlt.FeatureData(
                float_features=self.state_preprocessor(jnp.asarray(sv), jnp.asarray(sp))
            ),
            next_state=rlt.FeatureData(
                float_features=self.state_preprocessor(jnp.asarray(nv), jnp.asarray(npres))
            ),
            action=rlt.FeatureData(
                float_features=self.action_preprocessor(jnp.asarray(av), jnp.asarray(ap))
            ),
            next_action=rlt.FeatureData(
                float_features=self.action_preprocessor(jnp.asarray(nav), jnp.asarray(nap))
            ),
            reward=jnp.asarray(batch_df["reward"].to_numpy(np.float32).reshape(-1, 1)),
            time_diff=jnp.asarray(batch_df["time_diff"].to_numpy(np.float32).reshape(-1, 1)),
            step=jnp.ones((B, 1), jnp.int32),
            not_terminal=jnp.asarray(not_terminal),
            extras=rlt.ExtraData(),
        )
