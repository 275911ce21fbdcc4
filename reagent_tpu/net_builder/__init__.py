"""Net builders: config-driven network factories, one union per network role.

Reference: reagent/net_builder/ (discrete_dqn_net_builder.py:33 and siblings) —
each builder is a config dataclass registered into a role union; YAML selects
``{BuilderName: {kwargs}}``.  Builders derive input dims from NormalizationData
and return flax modules.
"""

from reagent_tpu.net_builder import (  # noqa: F401
    categorical_dqn,
    continuous_actor,
    discrete_actor,
    discrete_dqn,
    parametric_dqn,
    quantile_dqn,
    slate_ranking,
    slate_reward,
    synthetic_reward,
    value,
)
