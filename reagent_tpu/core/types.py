"""Typed batch pytrees — the data contracts every trainer consumes.

TPU-native re-design of the reference's tensor dataclasses
(reference: reagent/core/types.py:51 ``TensorDataClass`` and the batch types at
types.py:314 ``FeatureData``, :774 ``DiscreteDqnInput``, :868
``ParametricDqnInput``, :901 ``PolicyNetworkInput``, :920
``PolicyGradientInput``, :821 ``SlateQInput``, :1004 ``MemoryNetworkInput``).

Design differences from the reference (deliberate, TPU-first):

* Every batch type is a ``flax.struct`` pytree, so it flows through ``jit`` /
  ``grad`` / ``shard_map`` / ``lax.scan`` transparently.  The reference's
  recursive ``.cuda()/.cpu()`` method broadcast (types.py:90-109) dissolves:
  device placement is ``jax.device_put(batch, sharding)`` on any pytree.
* All shapes are static.  Jagged sparse features (the reference's torchrec
  ``KeyedJaggedTensor``) are represented as fixed-width padded ``IdListFeature``
  arrays with presence masks — the XLA-friendly encoding of raggedness.
* Optional fields default to ``None``; ``None`` leaves are simply absent from
  the pytree, so trainers can branch on presence at trace time (static).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


# ---------------------------------------------------------------------------
# Sparse (ID-list) feature encoding: fixed-width padded, XLA-friendly
# ---------------------------------------------------------------------------


@struct.dataclass
class IdListFeature:
    """Padded equivalent of a jagged ID-list feature (torchrec KJT in the ref).

    ``ids``: int32[batch, max_len] padded with 0; ``mask``: bool[batch, max_len]
    marking valid entries.  Embedding lookup is a gather + masked mean/sum —
    a segment-sum-free formulation that maps onto the MXU/VPU with static
    shapes (reference: reagent/preprocessing/sparse_preprocessor.py:16-60).
    """

    ids: Array
    mask: Array

    @property
    def lengths(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)


@struct.dataclass
class IdScoreListFeature:
    """Padded jagged (id, score) pairs — weighted ID-list features."""

    ids: Array
    scores: Array
    mask: Array


# ---------------------------------------------------------------------------
# Feature configuration (host-side, static — NOT pytrees)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class IdListFeatureConfig:
    """Reference: reagent/core/types.py:131."""

    name: str
    feature_id: int
    id_mapping_name: str


@dataclasses.dataclass(frozen=True)
class IdScoreListFeatureConfig:
    """Reference: reagent/core/types.py:142."""

    name: str
    feature_id: int
    id_mapping_name: str


@dataclasses.dataclass(frozen=True)
class FloatFeatureInfo:
    """Reference: reagent/core/types.py:153."""

    name: str
    feature_id: int


@dataclasses.dataclass(frozen=True)
class IdMappingConfig:
    """Embedding-table spec for one ID space (reference: types.py:159)."""

    embedding_table_size: int
    embedding_dim: int
    hashing: bool = True
    pooling: str = "mean"  # "mean" | "sum"
    max_length: int = 32  # padded width of the jagged dimension


@dataclasses.dataclass
class ModelFeatureConfig:
    """Reference: reagent/core/types.py:182."""

    float_feature_infos: List[FloatFeatureInfo] = dataclasses.field(default_factory=list)
    id_mapping_config: Dict[str, IdMappingConfig] = dataclasses.field(default_factory=dict)
    id_list_feature_configs: List[IdListFeatureConfig] = dataclasses.field(default_factory=list)
    id_score_list_feature_configs: List[IdScoreListFeatureConfig] = dataclasses.field(
        default_factory=list
    )

    def __post_init__(self) -> None:
        both = list(self.id_list_feature_configs) + list(self.id_score_list_feature_configs)
        ids = [c.feature_id for c in both]
        names = [c.name for c in both]
        if len(ids) != len(set(ids)):
            raise ValueError(f"duplicate sparse feature ids: {ids}")
        if len(names) != len(set(names)):
            raise ValueError(f"duplicate sparse feature names: {names}")
        self._id2name = {c.feature_id: c.name for c in both}
        self._name2id = {c.name: c.feature_id for c in both}
        self._name2config = {c.name: c for c in both}

    @property
    def only_dense(self) -> bool:
        return not (self.id_list_feature_configs or self.id_score_list_feature_configs)

    @property
    def id2name(self) -> Dict[int, str]:
        return self._id2name

    @property
    def name2id(self) -> Dict[str, int]:
        return self._name2id

    @property
    def name2config(self) -> Dict[str, Any]:
        return self._name2config


# ---------------------------------------------------------------------------
# Core feature containers
# ---------------------------------------------------------------------------


@struct.dataclass
class DocList:
    """A slate of candidate documents (reference: types.py:254).

    float_features: [batch, num_candidates, dim]; mask/value: [batch, num_candidates].
    """

    float_features: Array
    mask: Optional[Array] = None
    value: Optional[Array] = None

    def select_slate(self, action: Array) -> "DocList":
        """Gather the docs at slate positions ``action`` [batch, slate_size]."""
        row = jnp.arange(self.float_features.shape[0])[:, None]
        return DocList(
            float_features=self.float_features[row, action],
            mask=None if self.mask is None else self.mask[row, action],
            value=None if self.value is None else self.value[row, action],
        )

    def as_feature_data(self) -> "FeatureData":
        b, n, d = self.float_features.shape
        return FeatureData(float_features=self.float_features.reshape(b * n, d))


@struct.dataclass
class FeatureData:
    """Dense (+optionally sparse/candidate) features for one entity.

    Reference: reagent/core/types.py:314.
    """

    float_features: Array
    id_list_features: Optional[Dict[str, IdListFeature]] = None
    id_score_list_features: Optional[Dict[str, IdScoreListFeature]] = None
    stacked_float_features: Optional[Array] = None
    candidate_docs: Optional[DocList] = None
    time_since_first: Optional[Array] = None

    @property
    def has_float_features_only(self) -> bool:
        return (
            not self.id_list_features
            and not self.id_score_list_features
            and self.time_since_first is None
            and self.candidate_docs is None
        )

    def get_tiled_batch(self, num_tiles: int) -> "FeatureData":
        """Repeat each row ``num_tiles`` times: [b, d] -> [b*t, d].

        Reference: types.py:350 (used by max-over-possible-actions Q eval).
        """
        f = self.float_features
        b, d = f.shape
        tiled = jnp.repeat(f, num_tiles, axis=0)
        return FeatureData(float_features=tiled)

    def get_ranking_state(self, has_user_feat: bool) -> Array:
        """Reference types.py:382-387."""
        if has_user_feat:
            return self.concat_user_doc()
        assert self.candidate_docs is not None
        return self.candidate_docs.float_features

    def concat_user_doc(self) -> Array:
        """[b, user_dim + num_docs * doc_dim] concat (reference types.py:367)."""
        assert self.candidate_docs is not None
        b, n, d = self.candidate_docs.float_features.shape
        return jnp.concatenate(
            [self.float_features, self.candidate_docs.float_features.reshape(b, n * d)],
            axis=1,
        )


@struct.dataclass
class ValuePresence:
    """Raw (value, presence) pair before normalization (reference types.py:241)."""

    value: Array
    presence: Optional[Array] = None


@struct.dataclass
class GaussianSamplerScore:
    """Gaussian policy head output consumed by GaussianSampler
    (reference: reagent/gym/types.py GaussianSamplerScore)."""

    loc: Array
    scale_log: Array


@struct.dataclass
class ActorOutput:
    """Reference: types.py:247."""

    action: Array
    log_prob: Optional[Array] = None
    squashed_mean: Optional[Array] = None


@struct.dataclass
class ExtraData:
    """Logged metadata riding alongside a batch (reference types.py:442)."""

    mdp_id: Optional[Array] = None
    sequence_number: Optional[Array] = None
    action_probability: Optional[Array] = None
    max_num_actions: Optional[int] = struct.field(pytree_node=False, default=None)
    metrics: Optional[Array] = None

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "ExtraData":
        return cls(**{f.name: d.get(f.name, None) for f in dataclasses.fields(cls)})


# ---------------------------------------------------------------------------
# Training batch types (one per trainer family)
# ---------------------------------------------------------------------------


@struct.dataclass
class BaseInput:
    """Common MDP-transition fields (reference types.py:689 BaseInput)."""

    state: FeatureData
    next_state: FeatureData
    reward: Array
    time_diff: Array
    step: Optional[Array]
    not_terminal: Array

    def batch_size(self) -> int:
        return self.state.float_features.shape[0]


@struct.dataclass
class DiscreteDqnInput(BaseInput):
    """Reference: types.py:774.  ``action`` is one-hot [b, num_actions]."""

    action: Array = None
    next_action: Array = None
    possible_actions_mask: Array = None
    possible_next_actions_mask: Array = None
    extras: ExtraData = struct.field(default_factory=ExtraData)


@struct.dataclass
class SlateQInput(BaseInput):
    """Reference: types.py:821.

    ``action``: [b, slate_size] item indices into candidate_docs;
    ``reward``/``reward_mask``: [b, slate_size] per-position.
    """

    action: Array = None
    next_action: Array = None
    reward_mask: Array = None
    extras: Optional[ExtraData] = None


@struct.dataclass
class ParametricDqnInput(BaseInput):
    """Reference: types.py:868.  Actions are feature vectors."""

    action: FeatureData = None
    next_action: FeatureData = None
    possible_actions: FeatureData = None
    possible_actions_mask: Array = None
    possible_next_actions: FeatureData = None
    possible_next_actions_mask: Array = None
    extras: Optional[ExtraData] = None
    weight: Optional[Array] = None


@struct.dataclass
class PolicyNetworkInput(BaseInput):
    """Continuous-control transition batch (reference types.py:901)."""

    action: FeatureData = None
    next_action: FeatureData = None
    extras: Optional[ExtraData] = None


@struct.dataclass
class PolicyGradientInput:
    """One full episode (or a padded batch of them); reference types.py:920.

    ``valid_mask`` [T] marks real steps when the episode is padded to a static
    length (an artifact of XLA static shapes; None == all valid, matching the
    reference's exact-length episodes).
    """

    state: FeatureData
    action: Array
    reward: Array
    log_prob: Array
    possible_actions_mask: Optional[Array] = None
    valid_mask: Optional[Array] = None

    def batch_size(self) -> int:
        return self.state.float_features.shape[0]


@struct.dataclass
class BanditRewardModelInput:
    """Reference: types.py:964."""

    state: FeatureData
    action: Array
    reward: Array
    action_prob: Optional[Array] = None


@struct.dataclass
class BehavioralCloningModelInput:
    """Reference: types.py:985."""

    state: FeatureData
    action: Array
    possible_actions_mask: Optional[Array] = None


@struct.dataclass
class MemoryNetworkInput(BaseInput):
    """World-model training sequences (reference types.py:1004).

    All leading dims are [seq_len, batch, ...].
    """

    action: FeatureData = None
    valid_step: Optional[Array] = None
    extras: ExtraData = struct.field(default_factory=ExtraData)


@struct.dataclass
class MemoryNetworkOutput:
    """MDN-RNN forward output (reference types.py:1045)."""

    mus: Array
    sigmas: Array
    logpi: Array
    reward: Array
    not_terminal: Array
    last_step_hidden: Array
    last_step_cell: Array
    all_steps_hidden: Array


@struct.dataclass
class Seq2RewardOutput:
    """Reference: types.py:1056."""

    acc_reward: Array


@struct.dataclass
class CBInput:
    """Contextual-bandit batch (reference types.py:1123).

    ``context_arm_features``: [b, num_arms, feature_dim].
    """

    context_arm_features: Array
    arm_presence: Optional[Array] = None
    action: Optional[Array] = None
    reward: Optional[Array] = None
    label: Optional[Array] = None
    log_prob: Optional[Array] = None
    weight: Optional[Array] = None
    arms: Optional[Array] = None
    mdp_id: Optional[Array] = None
    importance_weight: Optional[Array] = None
    features_of_chosen_arm: Optional[Array] = None
    chosen_arm_id: Optional[Array] = None

    @classmethod
    def input_prototype(cls, batch_size: int = 2, num_arms: int = 3, dim: int = 4) -> "CBInput":
        return cls(context_arm_features=jnp.ones((batch_size, num_arms, dim)))

    @property
    def device(self):
        return None

    def batch_size(self) -> int:
        return self.context_arm_features.shape[0]


@struct.dataclass
class PreprocessedRankingInput:
    """Seq2Slate training batch (reference types.py:455).

    Index convention follows the reference: vocab = {0: PAD, 1: DECODER_START,
    2..: items}, so item i sits at index i + 2.
    """

    state: FeatureData
    src_seq: FeatureData
    src_src_mask: Optional[Array] = None
    tgt_in_seq: Optional[FeatureData] = None
    tgt_out_seq: Optional[FeatureData] = None
    tgt_tgt_mask: Optional[Array] = None
    slate_reward: Optional[Array] = None
    position_reward: Optional[Array] = None
    src_in_idx: Optional[Array] = None
    tgt_in_idx: Optional[Array] = None
    tgt_out_idx: Optional[Array] = None
    tgt_out_probs: Optional[Array] = None
    optim_tgt_in_idx: Optional[Array] = None
    optim_tgt_out_idx: Optional[Array] = None
    optim_tgt_in_seq: Optional[FeatureData] = None
    optim_tgt_out_seq: Optional[FeatureData] = None
    extras: Optional[ExtraData] = None

    def batch_size(self) -> int:
        return self.state.float_features.shape[0]


@struct.dataclass
class RankingOutput:
    """Seq2Slate forward output (reference types.py:1078)."""

    ranked_tgt_out_idx: Optional[Array] = None
    ranked_per_symbol_probs: Optional[Array] = None
    ranked_per_seq_probs: Optional[Array] = None
    log_probs: Optional[Array] = None
    encoder_scores: Optional[Array] = None


# ---------------------------------------------------------------------------
# Utility
# ---------------------------------------------------------------------------


def stack_feature_data(items: List[FeatureData]) -> FeatureData:
    """Stack a list of unbatched FeatureData into one batch."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)


def batch_to_device(batch: Any, sharding=None) -> Any:
    """Place a batch pytree on device (the JAX analogue of ``.cuda()``)."""
    if sharding is None:
        return jax.device_put(batch)
    return jax.device_put(batch, sharding)
