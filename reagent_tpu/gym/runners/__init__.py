from reagent_tpu.gym.runners.gymrunner import evaluate_for_n_episodes, run_episode

__all__ = ["run_episode", "evaluate_for_n_episodes"]
