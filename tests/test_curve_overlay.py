"""Learning-curve overlay: our trainers vs the reference implementation's
training recipes, matched hyperparameters, 3 seeds.

The reference's own Lightning/gym harness is not runnable in this image
(pytorch_lightning and gym are absent), so the reference side here is its
EXACT trainer math re-implemented in torch, driven by the reference configs:

* DQN CartPole online — gym/tests/configs/cartpole/
  discrete_dqn_cartpole_online.yaml (double-Q, Adam lr 0.01, tau 0.2,
  softmax temperature 1.0 exploration, batch 512, bar 100) with the update
  of reagent/training/dqn_trainer.py.
* SAC Pendulum online — gym/tests/configs/pendulum/sac_pendulum_online.yaml
  (twin Q, Adam lr 1e-3, tau 0.005, entropy temperature 0.3, batch 256,
  bar -500) with the update of reagent/training/sac_trainer.py:196-330
  (value_network=None branch, fixed temperature).

Each side trains 3 seeds; the test asserts the final greedy/mean-eval
distributions overlap (means within 2 pooled standard errors OR both
clearly above the reference's passing bar).  Curve tables are printed for
docs/curve_overlay.md.
"""

import math

import numpy as np
import pytest

SEEDS = (0, 1, 2)


# ---------------------------------------------------------------- reference


def _train_reference_dqn_cartpole(seed: int):
    """Reference DQN recipe in torch; returns (final_eval_mean, curve)."""
    import gymnasium
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    torch.set_num_threads(2)
    env = gymnasium.make("CartPole-v1", max_episode_steps=200)
    rng = np.random.default_rng(seed)

    def net():
        return nn.Sequential(
            nn.Linear(4, 128), nn.LeakyReLU(),
            nn.Linear(128, 64), nn.LeakyReLU(), nn.Linear(64, 2),
        )

    q, q_target = net(), net()
    q_target.load_state_dict(q.state_dict())
    opt = torch.optim.Adam(q.parameters(), lr=0.01)
    gamma, tau, B = 0.99, 0.2, 512

    cap = 100000
    obs_b = np.zeros((cap, 4), np.float32)
    nobs_b = np.zeros((cap, 4), np.float32)
    a_b = np.zeros(cap, np.int64)
    r_b = np.zeros(cap, np.float32)
    d_b = np.zeros(cap, np.float32)
    cur, size = 0, 0

    def push(o, a, r, no, d):
        nonlocal cur, size
        obs_b[cur], a_b[cur], r_b[cur], nobs_b[cur], d_b[cur] = o, a, r, no, d
        cur = (cur + 1) % cap
        size = min(size + 1, cap)

    obs, _ = env.reset(seed=seed)
    for _ in range(10000):  # train_after_ts prefill, random policy
        a = int(rng.integers(2))
        nobs, r, term, trunc, _ = env.step(a)
        push(obs, a, r, nobs, float(term))
        obs = nobs if not (term or trunc) else env.reset()[0]

    def train_step():
        idx = rng.integers(0, size, B)
        o = torch.from_numpy(obs_b[idx])
        no = torch.from_numpy(nobs_b[idx])
        a = torch.from_numpy(a_b[idx])
        r = torch.from_numpy(r_b[idx])
        nd = torch.from_numpy(1.0 - d_b[idx])
        with torch.no_grad():
            sel = q(no).argmax(1, keepdim=True)  # double-Q
            tgt = r + gamma * nd * q_target(no).gather(1, sel).squeeze(1)
        pred = q(o).gather(1, a.unsqueeze(1)).squeeze(1)
        loss = torch.nn.functional.mse_loss(pred, tgt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            for tp, sp in zip(q_target.parameters(), q.parameters()):
                tp.mul_(1 - tau).add_(tau * sp)

    curve = []
    episodes, ep_ret = 0, 0.0
    obs, _ = env.reset()
    while episodes < 120:
        with torch.no_grad():
            logits = q(torch.from_numpy(np.asarray(obs, np.float32))[None])[0]
            probs = torch.softmax(logits, 0).numpy()  # temperature 1.0
        a = int(rng.choice(2, p=probs / probs.sum()))
        nobs, r, term, trunc, _ = env.step(a)
        push(obs, a, r, nobs, float(term))
        ep_ret += r
        obs = nobs
        train_step()  # train_every_ts 1
        if term or trunc:
            curve.append(ep_ret)
            episodes += 1
            ep_ret = 0.0
            obs, _ = env.reset()

    evals = []
    for _ in range(20):
        obs, _ = env.reset()
        total = 0.0
        while True:
            with torch.no_grad():
                a = int(q(torch.from_numpy(np.asarray(obs, np.float32))[None]).argmax())
            obs, r, term, trunc, _ = env.step(a)
            total += r
            if term or trunc:
                break
        evals.append(total)
    env.close()
    return float(np.mean(evals)), curve


def _train_reference_sac_pendulum(seed: int):
    """Reference SAC recipe in torch (no value net, fixed temperature)."""
    import gymnasium
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    torch.set_num_threads(2)
    env = gymnasium.make("Pendulum-v1", max_episode_steps=200)
    rng = np.random.default_rng(seed)
    LOG_PROB_MIN, LOG_PROB_MAX = -2.0, 2.0  # reference models/actor.py:29-30
    alpha, gamma, tau, B = 0.3, 0.99, 0.005, 256

    class Actor(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = nn.Sequential(
                nn.Linear(3, 64), nn.LeakyReLU(), nn.Linear(64, 64), nn.LeakyReLU()
            )
            self.mu = nn.Linear(64, 1)
            self.log_std = nn.Linear(64, 1)

        def forward(self, s):
            h = self.body(s)
            mu = self.mu(h)
            log_std = self.log_std(h).clamp(-5, 2)
            std = log_std.exp()
            eps = torch.randn_like(mu)
            pre = mu + std * eps
            act = torch.tanh(pre)
            logp = (
                -0.5 * (eps**2 + math.log(2 * math.pi)) - log_std
                - torch.log(1 - act**2 + 1e-6)
            ).sum(-1, keepdim=True)
            return act, logp

    def critic():
        return nn.Sequential(
            nn.Linear(4, 64), nn.LeakyReLU(), nn.Linear(64, 64), nn.LeakyReLU(),
            nn.Linear(64, 1),
        )

    actor = Actor()
    q1, q2 = critic(), critic()
    q1t, q2t = critic(), critic()
    q1t.load_state_dict(q1.state_dict())
    q2t.load_state_dict(q2.state_dict())
    opt_a = torch.optim.Adam(actor.parameters(), lr=1e-3)
    opt_q = torch.optim.Adam(list(q1.parameters()) + list(q2.parameters()), lr=1e-3)

    cap = 100000
    S = np.zeros((cap, 3), np.float32)
    A = np.zeros((cap, 1), np.float32)
    R = np.zeros(cap, np.float32)
    NS = np.zeros((cap, 3), np.float32)
    D = np.zeros(cap, np.float32)
    cur, size = 0, 0

    def push(s, a, r, ns, d):
        nonlocal cur, size
        S[cur], A[cur], R[cur], NS[cur], D[cur] = s, a, r, ns, d
        cur = (cur + 1) % cap
        size = min(size + 1, cap)

    obs, _ = env.reset(seed=seed)
    for _ in range(5000):  # prefill with uniform actions in [-1, 1]
        a = rng.uniform(-1, 1, 1)
        nobs, r, term, trunc, _ = env.step(2.0 * a)
        push(obs, a, r, nobs, float(term))
        obs = nobs if not (term or trunc) else env.reset()[0]

    def train_step():
        idx = rng.integers(0, size, B)
        s = torch.from_numpy(S[idx])
        a = torch.from_numpy(A[idx])
        r = torch.from_numpy(R[idx]).unsqueeze(1)
        ns = torch.from_numpy(NS[idx])
        nd = torch.from_numpy(1.0 - D[idx]).unsqueeze(1)
        with torch.no_grad():
            na, nlogp = actor(ns)
            nsa = torch.cat([ns, na], 1)
            nv = torch.min(q1t(nsa), q2t(nsa))
            nv = nv - alpha * nlogp.clamp(LOG_PROB_MIN, LOG_PROB_MAX)
            tgt = r + gamma * nv * nd
        sa = torch.cat([s, a], 1)
        q_loss = torch.nn.functional.mse_loss(q1(sa), tgt) + \
            torch.nn.functional.mse_loss(q2(sa), tgt)
        opt_q.zero_grad()
        q_loss.backward()
        opt_q.step()
        pa, plogp = actor(s)
        psa = torch.cat([s, pa], 1)
        min_q = torch.min(q1(psa), q2(psa))
        a_loss = (alpha * plogp.clamp(LOG_PROB_MIN, LOG_PROB_MAX) - min_q).mean()
        opt_a.zero_grad()
        a_loss.backward()
        opt_a.step()
        with torch.no_grad():
            for tp, sp in zip(q1t.parameters(), q1.parameters()):
                tp.mul_(1 - tau).add_(tau * sp)
            for tp, sp in zip(q2t.parameters(), q2.parameters()):
                tp.mul_(1 - tau).add_(tau * sp)

    curve = []
    episodes, ep_ret = 0, 0.0
    obs, _ = env.reset()
    while episodes < 40:
        with torch.no_grad():
            a, _ = actor(torch.from_numpy(np.asarray(obs, np.float32))[None])
        a = a[0].numpy()
        nobs, r, term, trunc, _ = env.step(2.0 * a)
        push(obs, a, r, nobs, float(term))
        ep_ret += r
        obs = nobs
        train_step()
        if term or trunc:
            curve.append(ep_ret)
            episodes += 1
            ep_ret = 0.0
            obs, _ = env.reset()

    evals = []
    for _ in range(20):
        obs, _ = env.reset()
        total = 0.0
        while True:
            with torch.no_grad():
                h = actor.body(torch.from_numpy(np.asarray(obs, np.float32))[None])
                a = torch.tanh(actor.mu(h))[0].numpy()  # mean action
            obs, r, term, trunc, _ = env.step(2.0 * a)
            total += r
            if term or trunc:
                break
        evals.append(total)
    env.close()
    return float(np.mean(evals)), curve


# --------------------------------------------------------------------- ours


def _train_ours_dqn_cartpole(seed: int):
    import jax
    import jax.numpy as jnp

    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.gym.envs import CartPole
    from reagent_tpu.gym.online_loop import (
        OnlineLoopConfig,
        evaluate_policy,
        prefill_replay_buffer,
        run_online_training,
    )
    from reagent_tpu.gym.policies.samplers import SoftmaxActionSampler
    from reagent_tpu.gym.preprocessors import make_discrete_dqn_batch
    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.replay import ReplayBuffer
    from reagent_tpu.training import DQNTrainer

    env = CartPole(max_steps=200)
    q_net = FullyConnectedDQN(
        state_dim=4, action_dim=2, sizes=[128, 64],
        activations=["leaky_relu", "leaky_relu"],
    )
    trainer = DQNTrainer(
        q_network=q_net,
        rl=RLParameters(gamma=0.99, target_update_rate=0.2, maxq_learning=True),
        double_q_learning=True,
        optimizer={"Adam": {"lr": 0.01}},
    )
    rb = ReplayBuffer(replay_capacity=100000, update_horizon=1, gamma=0.99)
    r_init, r_fill, r_train, r_eval = jax.random.split(jax.random.PRNGKey(seed), 4)
    ts = trainer.init(r_init, jnp.zeros((1, 4)))
    rbs = rb.init(observation=jnp.zeros(4), action=jnp.int32(0),
                  reward=jnp.float32(0), terminal=jnp.bool_(False))
    rbs = prefill_replay_buffer(env, rb, rbs, r_fill, num_steps=10000)
    sampler = SoftmaxActionSampler(temperature=1.0)

    def policy_act(tstate, obs, rng):
        scores = trainer.q_network.apply(tstate.q_params, obs[None])
        out = sampler.sample_action(scores, rng)
        idx = jnp.argmax(out.action[0]).astype(jnp.int32)
        return idx, idx

    ts, rbs, aux = run_online_training(
        env, trainer, ts, rb, rbs, policy_act,
        lambda d: make_discrete_dqn_batch(d, 2), r_train,
        OnlineLoopConfig(num_steps=20000, train_every=1, train_after=0,
                         minibatch_size=512),
    )

    def greedy_act(tstate, obs, rng):
        scores = trainer.q_network.apply(tstate.q_params, obs[None])
        return jnp.argmax(scores[0]).astype(jnp.int32)

    returns = evaluate_policy(env, greedy_act, ts, r_eval, num_episodes=20)
    curve = np.asarray(aux["recent_episode_returns"])
    return float(np.mean(np.asarray(returns))), curve[~np.isnan(curve)].tolist()


def _train_ours_sac_pendulum(seed: int):
    import jax
    import jax.numpy as jnp

    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.gym.envs import Pendulum
    from reagent_tpu.gym.online_loop import (
        OnlineLoopConfig,
        evaluate_policy,
        prefill_replay_buffer,
        run_online_training,
    )
    from reagent_tpu.gym.preprocessors import make_policy_network_batch
    from reagent_tpu.models import FullyConnectedCritic, GaussianFullyConnectedActor
    from reagent_tpu.replay import ReplayBuffer
    from reagent_tpu.training import SACTrainer

    env = Pendulum()
    actor = GaussianFullyConnectedActor(
        state_dim=3, action_dim=1, sizes=[64, 64],
        activations=["leaky_relu", "leaky_relu"],
    )
    mk_q = lambda: FullyConnectedCritic(  # noqa: E731
        state_dim=3, action_dim=1, sizes=[64, 64],
        activations=["leaky_relu", "leaky_relu"],
    )
    trainer = SACTrainer(
        actor_network=actor, q1_network=mk_q(), q2_network=mk_q(),
        rl=RLParameters(gamma=0.99, target_update_rate=0.005),
        q_network_optimizer={"Adam": {"lr": 1e-3}},
        actor_network_optimizer={"Adam": {"lr": 1e-3}},
        entropy_temperature=0.3,
    )
    r_init, r_fill, r_train, r_eval = jax.random.split(jax.random.PRNGKey(seed), 4)
    ts = trainer.init(r_init, jnp.zeros((1, 3)), jnp.zeros((1, 1)))
    rb = ReplayBuffer(replay_capacity=100000, update_horizon=1, gamma=0.99)
    rbs = rb.init(observation=jnp.zeros(3), action=jnp.zeros(1),
                  reward=jnp.float32(0), terminal=jnp.bool_(False))
    rbs = prefill_replay_buffer(env, rb, rbs, r_fill, num_steps=5000)

    def policy_act(tstate, obs, rng):
        out = trainer.actor_network.apply(tstate.actor_params, obs[None], rng)
        return out.action[0] * 2.0, out.action[0]

    ts, rbs, aux = run_online_training(
        env, trainer, ts, rb, rbs, policy_act,
        make_policy_network_batch, r_train,
        OnlineLoopConfig(num_steps=8000, train_every=1, train_after=0,
                         minibatch_size=256),
    )

    def mean_act(tstate, obs, rng):
        out = trainer.actor_network.apply(tstate.actor_params, obs[None])
        return out.action[0] * 2.0

    returns = evaluate_policy(env, mean_act, ts, r_eval, num_episodes=20)
    curve = np.asarray(aux["recent_episode_returns"])
    return float(np.mean(np.asarray(returns))), curve[~np.isnan(curve)].tolist()


# -------------------------------------------------------------------- tests


def _overlap_assert(name, ref_finals, our_finals, bar):
    ref_m, our_m = np.mean(ref_finals), np.mean(our_finals)
    pooled_se = math.sqrt(
        np.var(ref_finals, ddof=1) / len(ref_finals)
        + np.var(our_finals, ddof=1) / len(our_finals)
    )
    print(f"\n{name}: reference finals {ref_finals} (mean {ref_m:.1f}), "
          f"ours {our_finals} (mean {our_m:.1f}), pooled SE {pooled_se:.1f}")
    both_pass = ref_m >= bar and our_m >= bar
    within = abs(ref_m - our_m) <= max(2.0 * pooled_se, 0.15 * abs(ref_m) + 10)
    assert both_pass, f"{name}: bar {bar} not met: ref {ref_m}, ours {our_m}"
    assert within or (ref_m >= bar and our_m >= ref_m), (
        f"{name}: distributions do not overlap: ref {ref_finals} vs ours "
        f"{our_finals}"
    )


@pytest.mark.nightly
def test_dqn_cartpole_curve_overlay():
    ref = [_train_reference_dqn_cartpole(s) for s in SEEDS]
    ours = [_train_ours_dqn_cartpole(s) for s in SEEDS]
    for label, runs in (("reference", ref), ("ours", ours)):
        for s, (final, curve) in zip(SEEDS, runs):
            tail = np.mean(curve[-10:]) if len(curve) >= 10 else np.mean(curve)
            print(f"DQN {label} seed {s}: final eval {final:.1f}, "
                  f"train-curve tail {tail:.1f}")
    _overlap_assert(
        "DQN CartPole", [f for f, _ in ref], [f for f, _ in ours], bar=100.0
    )


@pytest.mark.nightly
def test_sac_pendulum_curve_overlay():
    ref = [_train_reference_sac_pendulum(s) for s in SEEDS]
    ours = [_train_ours_sac_pendulum(s) for s in SEEDS]
    for label, runs in (("reference", ref), ("ours", ours)):
        for s, (final, curve) in zip(SEEDS, runs):
            tail = np.mean(curve[-5:]) if len(curve) >= 5 else np.mean(curve)
            print(f"SAC {label} seed {s}: final eval {final:.1f}, "
                  f"train-curve tail {tail:.1f}")
    _overlap_assert(
        "SAC Pendulum", [f for f, _ in ref], [f for f, _ in ours], bar=-500.0
    )
