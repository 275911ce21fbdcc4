"""SlateQ on the RecSim-style slate env: learned slates beat random.

Mirrors reference slate_q_recsim_online.yaml intent (bar 154 there with the
full RecSim simulator; our simplified interest-evolution env has a different
reward scale, so the bar is: learned policy beats the random policy by a
margin).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import RLParameters
from reagent_tpu.gym.envs.extra import RecSimSlate
from reagent_tpu.models import FullyConnectedCritic
from reagent_tpu.training.slate_q_trainer import SlateQTrainer

NUM_CAND, SLATE, TOPICS = 8, 2, 4


def _collect(env, policy_fn, episodes, rng):
    """Roll out; emit SlateQInput rows (obs docs as candidate_docs)."""
    rows = []
    returns = []
    for ep in range(episodes):
        rng, r0 = jax.random.split(rng)
        state, obs = env.reset(r0)
        total = 0.0
        prev = None
        for t in range(env.max_steps):
            rng, r_act, r_step = jax.random.split(rng, 3)
            slate = policy_fn(obs, r_act)
            nstate, nobs, reward, done = env.step(state, slate, r_step)
            rows.append((obs, slate, reward, nobs, done, int(nstate.last_clicked)))
            total += float(reward)
            state, obs = nstate, nobs
            if bool(done):
                break
        returns.append(total)
    return rows, float(np.mean(returns)), rng


def _batchify(rows):
    def docs(obs_list):
        # doc features = topics ++ quality (the Q-net must see quality)
        feats = jnp.concatenate(
            [
                jnp.stack([o["doc_features"] for o in obs_list]),
                jnp.stack([o["doc_quality"] for o in obs_list])[..., None],
            ],
            axis=2,
        )
        return rlt.DocList(
            float_features=feats,
            mask=jnp.ones((len(obs_list), NUM_CAND)),
            value=jnp.stack([o["doc_quality"] for o in obs_list]),
        )

    obs = [r[0] for r in rows]
    nobs = [r[3] for r in rows]
    B = len(rows)
    reward = jnp.asarray([float(r[2]) for r in rows]).reshape(B, 1)
    # single-selection credit: reward lands on the clicked position
    clicked = np.asarray([r[5] for r in rows])
    pos_onehot = np.zeros((B, SLATE), np.float32)
    mask = np.zeros((B, SLATE), bool)
    for i, c in enumerate(clicked):
        if c >= 0:
            pos_onehot[i, c] = 1.0
            mask[i, c] = True
    return rlt.SlateQInput(
        state=rlt.FeatureData(
            float_features=jnp.stack([o["user"] for o in obs]),
            candidate_docs=docs(obs),
        ),
        next_state=rlt.FeatureData(
            float_features=jnp.stack([o["user"] for o in nobs]),
            candidate_docs=docs(nobs),
        ),
        action=jnp.stack([r[1] for r in rows]),
        next_action=jnp.zeros((B, SLATE), jnp.int32),
        reward=jnp.asarray(pos_onehot) * reward,
        reward_mask=jnp.asarray(mask),
        time_diff=jnp.ones((B, 1)),
        step=None,
        not_terminal=jnp.asarray([[0.0 if r[4] else 1.0] for r in rows]),
    )


@pytest.mark.slow
def test_slateq_learns_on_recsim():
    env = RecSimSlate(num_candidates=NUM_CAND, slate_size=SLATE, num_topics=TOPICS, max_steps=20)
    rng = jax.random.PRNGKey(0)

    def random_policy(obs, r):
        return jax.random.choice(r, NUM_CAND, (SLATE,), replace=False)

    rows, random_return, rng = _collect(env, random_policy, 60, rng)
    batch = _batchify(rows)

    q_net = FullyConnectedCritic(
        state_dim=TOPICS, action_dim=TOPICS + 1, sizes=[64], activations=["relu"]
    )
    trainer = SlateQTrainer(
        q_network=q_net, slate_size=SLATE,
        rl=RLParameters(gamma=0.9, target_update_rate=0.1, maxq_learning=True),
        optimizer={"Adam": {"lr": 3e-3}},
    )
    ts = trainer.init(jax.random.PRNGKey(1), jnp.zeros((1, TOPICS)), jnp.zeros((1, TOPICS + 1)))
    for _ in range(300):
        ts, m = trainer.train_step(ts, batch)

    def greedy_policy(obs, r):
        docs = jnp.concatenate(
            [jnp.asarray(obs["doc_features"]), jnp.asarray(obs["doc_quality"])[:, None]],
            axis=1,
        )  # [C, T+1]
        user = jnp.asarray(obs["user"])[None]
        q = trainer.q_network.apply(
            ts.q_params, jnp.tile(user, (NUM_CAND, 1)), docs
        ).reshape(-1)
        return jax.lax.top_k(q, SLATE)[1]

    _, learned_return, _ = _collect(env, greedy_policy, 60, jax.random.PRNGKey(7))
    print(f"SlateQ: random={random_return:.2f} learned={learned_return:.2f}")
    assert learned_return > random_return * 1.1
