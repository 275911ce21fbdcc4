"""Standalone off-policy-evaluation research library.

Reference: reagent/ope/ (~7,900 LoC) — contextual-bandit estimators
(DM/IPS/DR/Switch/SwitchDR), sequential estimators (DM/IPS/DR/MAGIC/
NeuralDualDICE), slate estimators (PBM/IPS), tabular + linear trainers, and
benchmark harnesses.  Re-designed vectorized (numpy/JAX) instead of the
reference's per-sample python loops.
"""
