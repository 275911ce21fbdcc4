"""REINFORCE for CartPole control — runnable tutorial.

Mirror of the reference's tutorial notebook
(reagent/notebooks/REINFORCE_for_CartPole_Control.ipynb) on the TPU-native
stack: policy net + softmax sampler + ReinforceTrainer, one jitted episodic
train step, greedy evaluation at the end.

    PYTHONPATH=/path/to/repo python examples/tutorials/reinforce_cartpole.py

On CPU this takes ~1-2 minutes; the bar (mean eval >= 180 over 20 episodes)
is the reference's discrete_reinforce_cartpole_online.yaml passing score.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.gym.envs import CartPole
from reagent_tpu.gym.episodic import make_episodic_trainer_step
from reagent_tpu.gym.online_loop import evaluate_policy
from reagent_tpu.gym.policies.samplers import SoftmaxActionSampler
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.training import ReinforceTrainer


def main(num_episodes: int = 300, seed: int = 0, eval_episodes: int = 20):
    env = CartPole(max_steps=200)
    scorer = FullyConnectedDQN(
        state_dim=4, action_dim=2, sizes=[64, 64],
        activations=["leaky_relu", "leaky_relu"],
    )
    sampler = SoftmaxActionSampler(temperature=1.0)
    trainer = ReinforceTrainer(
        scorer=scorer, sampler=sampler, gamma=0.99,
        optimizer={"Adam": {"lr": 5e-3}}, normalize=True, subtract_mean=True,
    )
    state = trainer.init(jax.random.PRNGKey(seed), jnp.zeros((1, 4)))
    # one compiled step = roll a full episode on-device AND apply the
    # policy-gradient update on it
    step = make_episodic_trainer_step(
        env, scorer.apply, sampler, trainer, max_steps=200
    )

    rng = jax.random.PRNGKey(seed + 1)
    returns = []
    for i in range(num_episodes):
        rng, r = jax.random.split(rng)
        state, ep_ret, _ = step(state, r)
        returns.append(float(ep_ret))
        if (i + 1) % 50 == 0:
            print(f"episode {i + 1}: mean train return (last 50) = "
                  f"{np.mean(returns[-50:]):.1f}")

    def greedy_act(ts, obs, rng):
        scores = scorer.apply(ts.policy_params, obs[None])
        return jnp.argmax(scores[0]).astype(jnp.int32)

    evals = evaluate_policy(
        env, greedy_act, state, jax.random.PRNGKey(seed + 2),
        num_episodes=eval_episodes,
    )
    mean_eval = float(np.mean(np.asarray(evals)))
    print(f"greedy eval over {eval_episodes} episodes: {mean_eval:.1f} "
          f"(reference bar: 180)")
    return mean_eval


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    main(num_episodes=args.episodes, seed=args.seed)
