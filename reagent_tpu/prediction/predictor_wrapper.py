"""Predictor wrappers: preprocessor + network fused into one exportable fn.

Reference: reagent/prediction/predictor_wrapper.py — DiscreteDqnWithPreprocessor
(:94), DiscreteDqnPredictorWrapper (:117), parametric (:214) and actor (:260)
variants.

Export format (framework-free, consumed by serving/ C++ scorer too):
  <dir>/manifest.json   — model_type, action_names, normalization spec,
                          layer shapes + activations
  <dir>/weights.bin     — float32 little-endian [W1 | b1 | W2 | b2 | ...]
                          (row-major W: [in, out])
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core.parameters import NormalizationData
from reagent_tpu.preprocessing.normalization import serialize
from reagent_tpu.preprocessing.preprocessor import Preprocessor

Array = jax.Array


def _extract_dense_layers(params) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Collect (kernel, bias) pairs in traversal order from a flax params tree."""
    layers: List[Tuple[np.ndarray, np.ndarray]] = []

    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and "bias" in node:
                layers.append(
                    (np.asarray(node["kernel"]), np.asarray(node["bias"]))
                )
            else:
                for key in sorted(node.keys(), key=_layer_sort_key):
                    walk(node[key])

    root = params["params"] if "params" in params else params
    walk(root)
    return layers


def _layer_sort_key(name: str):
    import re

    m = re.search(r"_(\d+)$", name)
    return (re.sub(r"_\d+$", "", name), int(m.group(1)) if m else -1)


class DiscreteDqnWithPreprocessor:
    """Pure fn: raw (values, presence) -> q-values (reference :94-116)."""

    def __init__(self, q_network, q_params, state_preprocessor: Preprocessor):
        self.q_network = q_network
        self.q_params = q_params
        self.preprocessor = state_preprocessor
        self._fn = jax.jit(self._forward)

    def _forward(self, values: Array, presence: Array) -> Array:
        obs = self.preprocessor(values, presence)
        return self.q_network.apply(self.q_params, obs)

    def __call__(self, values: Array, presence: Array) -> Array:
        return self._fn(values, presence)


class DiscreteDqnPredictorWrapper:
    """Reference :117-150: named-action scoring + export."""

    def __init__(
        self,
        dqn_with_preprocessor: DiscreteDqnWithPreprocessor,
        action_names: Sequence[str],
        activations: Optional[Sequence[str]] = None,
    ):
        self.model = dqn_with_preprocessor
        self.action_names = list(action_names)
        self.activations = list(activations) if activations else None

    def __call__(self, values: Array, presence: Array) -> Tuple[List[str], Array]:
        return self.action_names, self.model(values, presence)

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        layers = _extract_dense_layers(self.model.q_params)
        manifest: Dict[str, Any] = {
            "model_type": "discrete_dqn",
            "action_names": self.action_names,
            "normalization": {
                str(k): v
                for k, v in serialize(
                    self.model.preprocessor.normalization_parameters
                ).items()
            },
            "sorted_features": self.model.preprocessor.sorted_features,
            "layers": [
                {"in": int(k.shape[0]), "out": int(k.shape[1])} for k, _ in layers
            ],
            "activations": self.activations
            or (["relu"] * (len(layers) - 1) + ["linear"]),
        }
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        blob = b"".join(
            np.ascontiguousarray(a, np.float32).tobytes()
            for k, b in layers
            for a in (k, b)
        )
        with open(os.path.join(path, "weights.bin"), "wb") as f:
            f.write(blob)

    @staticmethod
    def load(path: str):
        """Rebuild a pure numpy forward fn from an exported artifact."""
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        raw = np.fromfile(os.path.join(path, "weights.bin"), np.float32)
        layers = []
        off = 0
        for spec in manifest["layers"]:
            k = raw[off : off + spec["in"] * spec["out"]].reshape(spec["in"], spec["out"])
            off += spec["in"] * spec["out"]
            b = raw[off : off + spec["out"]]
            off += spec["out"]
            layers.append((k, b))

        from reagent_tpu.preprocessing.normalization import deserialize

        norm = deserialize(manifest["normalization"])
        pre = Preprocessor(norm)
        acts = manifest["activations"]

        def forward(values, presence):
            x = np.asarray(pre(jnp.asarray(values), jnp.asarray(presence)))
            for (k, b), act in zip(layers, acts):
                x = x @ k + b
                if act == "relu":
                    x = np.maximum(x, 0)
                elif act == "leaky_relu":
                    x = np.where(x > 0, x, 0.01 * x)
                elif act == "tanh":
                    x = np.tanh(x)
            return manifest["action_names"], x

        return forward


class ParametricDqnWithPreprocessor:
    """Reference :214-250."""

    def __init__(
        self, q_network, q_params,
        state_preprocessor: Preprocessor, action_preprocessor: Preprocessor,
    ):
        self.q_network = q_network
        self.q_params = q_params
        self.state_preprocessor = state_preprocessor
        self.action_preprocessor = action_preprocessor
        self._fn = jax.jit(self._forward)

    def _forward(self, sv, sp, av, ap):
        s = self.state_preprocessor(sv, sp)
        a = self.action_preprocessor(av, ap)
        return self.q_network.apply(self.q_params, s, a)

    def __call__(self, sv, sp, av, ap):
        return self._fn(sv, sp, av, ap)


class ParametricDqnPredictorWrapper:
    def __init__(self, dqn_with_preprocessor: ParametricDqnWithPreprocessor):
        self.model = dqn_with_preprocessor

    def __call__(self, sv, sp, av, ap) -> Tuple[List[str], Array]:
        return ["Q"], self.model(sv, sp, av, ap)


class ActorWithPreprocessor:
    """Reference :260-300: actor + state preprocessor (+ action rescaling)."""

    def __init__(
        self, actor_network, actor_params, state_preprocessor: Preprocessor,
        action_postprocessor=None,
    ):
        self.actor_network = actor_network
        self.actor_params = actor_params
        self.preprocessor = state_preprocessor
        self.action_postprocessor = action_postprocessor
        self._fn = jax.jit(self._forward)

    def _forward(self, values, presence):
        obs = self.preprocessor(values, presence)
        out = self.actor_network.apply(self.actor_params, obs)
        action = out.action
        if self.action_postprocessor is not None:
            action = self.action_postprocessor(action)
        return action

    def __call__(self, values, presence):
        return self._fn(values, presence)


class ActorPredictorWrapper:
    def __init__(self, actor_with_preprocessor: ActorWithPreprocessor, action_feature_ids: Optional[List[int]] = None):
        self.model = actor_with_preprocessor
        self.action_feature_ids = action_feature_ids or []

    def __call__(self, values, presence) -> Array:
        return self.model(values, presence)

    def save(self, path: str) -> None:
        """Pickle artifact: normalization spec + flax actor module + params.

        The discrete-DQN artifact is framework-free (manifest+weights) for the
        C++ scorer; actors (Gaussian mean head, tanh squash) carry structure a
        flat MLP blob can't, so they export as a python-loadable artifact
        (reference exports TorchScript here; predictor_wrapper.py:260-300).
        """
        import pickle

        os.makedirs(path, exist_ok=True)
        manifest = {"model_type": "actor"}
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        payload = {
            "normalization": serialize(self.model.preprocessor.normalization_parameters),
            "module": self.model.actor_network,
            "params": jax.tree_util.tree_map(np.asarray, self.model.actor_params),
        }
        if self.model.action_postprocessor is not None:
            payload["action_normalization"] = serialize(
                self.model.action_postprocessor.normalization_parameters
            )
        with open(os.path.join(path, "actor.pkl"), "wb") as f:
            pickle.dump(payload, f)

    @staticmethod
    def load(path: str):
        """Rebuild a forward fn producing the greedy/mean action."""
        import pickle

        with open(os.path.join(path, "actor.pkl"), "rb") as f:
            payload = pickle.load(f)
        from reagent_tpu.preprocessing.normalization import deserialize

        pre = Preprocessor(deserialize(payload["normalization"]))
        module, params = payload["module"], payload["params"]
        post = None
        if "action_normalization" in payload:
            from reagent_tpu.preprocessing.postprocessor import Postprocessor

            post = Postprocessor(deserialize(payload["action_normalization"]))

        @jax.jit
        def _fwd(values, presence):
            obs = pre(values, presence)
            out = module.apply(params, obs)
            return post._forward(out.action) if post is not None else out.action

        def forward(values, presence):
            return np.asarray(_fwd(jnp.asarray(values), jnp.asarray(presence)))

        return forward


def load_predictor(path: str):
    """Load any exported artifact by its manifest model_type.

    Returns a callable taking a sparse feature dict {fid: value} (single row)
    and returning the model head (scores for DQN, action for actors).
    """
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    model_type = manifest.get("model_type", "discrete_dqn")
    if model_type == "actor":
        fwd = ActorPredictorWrapper.load(path)
        import pickle

        with open(os.path.join(path, "actor.pkl"), "rb") as f:
            payload = pickle.load(f)
        from reagent_tpu.preprocessing.normalization import deserialize

        sorted_features = Preprocessor(
            deserialize(payload["normalization"])
        ).sorted_features

        def predict_actor(features: Dict[int, float]):
            values = np.array(
                [[features.get(f, 0.0) for f in sorted_features]], np.float32
            )
            presence = np.array([[f in features for f in sorted_features]], np.bool_)
            return fwd(values, presence)

        return type(
            "Predictor",
            (),
            {"predict": staticmethod(predict_actor), "model_type": "actor"},
        )()
    fwd = DiscreteDqnPredictorWrapper.load(path)
    sorted_features = manifest["sorted_features"]

    def predict_dqn(features: Dict[int, float]):
        values = np.array(
            [[features.get(f, 0.0) for f in sorted_features]], np.float32
        )
        presence = np.array([[f in features for f in sorted_features]], np.bool_)
        return fwd(values, presence)

    return type(
        "Predictor",
        (),
        {"predict": staticmethod(predict_dqn), "model_type": model_type},
    )()


class CategoricalDqnPredictorWrapper:
    """C51 serving: E[Z(s,a)] = sum_z p(z|s,a) * z per action.

    Reference: prediction/predictor_wrapper.py exports the categorical head
    through the same discrete-DQN wrapper after taking the expectation; the
    distributional head isn't a flat MLP, so the artifact is pickle-based
    (module + params + normalization), like actors.
    """

    def __init__(self, q_network, q_params, state_preprocessor: Preprocessor,
                 action_names: Sequence[str]):
        self.q_network = q_network
        self.q_params = q_params
        self.preprocessor = state_preprocessor
        self.action_names = list(action_names)
        self._fn = jax.jit(self._forward)

    def _forward(self, values, presence):
        obs = self.preprocessor(values, presence)
        return self.q_network.apply(self.q_params, obs)  # expected Q [B, A]

    def __call__(self, values, presence):
        return self.action_names, self._fn(values, presence)

    def save(self, path: str) -> None:
        import pickle

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(
                {"model_type": "categorical_dqn", "action_names": self.action_names},
                f, indent=2,
            )
        payload = {
            "normalization": serialize(self.preprocessor.normalization_parameters),
            "module": self.q_network,
            "params": jax.tree_util.tree_map(np.asarray, self.q_params),
            "action_names": self.action_names,
        }
        with open(os.path.join(path, "model.pkl"), "wb") as f:
            pickle.dump(payload, f)

    @staticmethod
    def load(path: str):
        import pickle

        with open(os.path.join(path, "model.pkl"), "rb") as f:
            payload = pickle.load(f)
        from reagent_tpu.preprocessing.normalization import deserialize

        pre = Preprocessor(deserialize(payload["normalization"]))
        module, params = payload["module"], payload["params"]

        @jax.jit
        def _fwd(values, presence):
            return module.apply(params, pre(values, presence))

        def forward(values, presence):
            return payload["action_names"], np.asarray(
                _fwd(jnp.asarray(values), jnp.asarray(presence))
            )

        return forward


class _QuantileMeanHead:
    """Picklable head: [B, A*N] quantile outputs -> mean over atoms [B, A]."""

    def __init__(self, module, num_actions: int, num_atoms: int):
        self.module = module
        self.num_actions = num_actions
        self.num_atoms = num_atoms

    def apply(self, params, obs):
        out = self.module.apply(params, obs)
        return out.reshape(obs.shape[0], self.num_actions, self.num_atoms).mean(axis=2)


def make_quantile_dqn_predictor_wrapper(
    q_network, q_params, state_preprocessor, action_names, num_atoms: int
) -> "CategoricalDqnPredictorWrapper":
    """QR-DQN serving: Q(s,a) = mean of quantile atoms (ref qrdqn export)."""
    head = _QuantileMeanHead(q_network, len(action_names), num_atoms)
    return CategoricalDqnPredictorWrapper(
        head, q_params, state_preprocessor, action_names
    )
