"""ReAgent-TPU: a TPU-native applied reinforcement-learning platform.

A ground-up JAX/XLA re-design of the capabilities of facebookresearch/ReAgent
("Horizon"): offline (batch) RL on logged data, online gym training, replay
memory, counterfactual policy evaluation, feature normalization, and policy
export — built TPU-first around jitted pure train steps, on-device replay,
`lax.scan` environment engines, and `jax.sharding` data parallelism.

Layer map (mirrors SURVEY.md section 1 of the reference analysis):
  core          typed pytree batches, config/registry system, parameters
  preprocessing feature-type identification + jitted normalization
  replay        on-device circular / prioritized replay buffers
  models        flax modules: Q-nets, actors, critics, seq2slate, world models
  training      one functional Trainer per algorithm (jitted train_step)
  net_builder   config-driven network factories
  gym           pure-JAX envs + gymnasium adapters, Policy = scorer . sampler
  evaluation    counterfactual policy evaluation (DM/IPS/DR/MAGIC) + OPE lib
  prediction    export of normalization+policy as a single serialized fn
  parallel      mesh construction, data-parallel learner, collectives
  workflow      timeline transform, CLI, end-to-end train pipelines
  mab / lite    multi-armed bandits, gradient-free combinatorial optimizers
  serving       decision-service (operator DAG) runtime
"""

__version__ = "0.1.0"
