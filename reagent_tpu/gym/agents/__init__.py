from reagent_tpu.gym.agents.agent import Agent

__all__ = ["Agent"]
