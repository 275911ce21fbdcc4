"""Workflow: YAML-driven offline training pipelines + CLI.

Reference: reagent/workflow/ (training.py:59-323, gym_batch_rl.py:66-220,
cli.py:20-94, identify_types_flow.py).
"""
