"""Benchmark: fused online DQN actor-learner throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: env-steps/s where every step also performs one learner update
(minibatch 512, net [128, 64]) — the hot loop of reference stack §3.2
(reagent/gym/datasets/replay_buffer_dataset.py interleaving env.step, replay
insert, sample, and training_step).

Baseline: a faithful torch-CPU re-creation of the reference's per-step work
(gymnasium CartPole env step + numpy replay insert/sample + torch
forward/backward + soft update), measured inline.  vs_baseline = ours/theirs.
"""

import json
import os
import time


def bench_reference_torch_cpu(num_steps: int = 300) -> float:
    """Reference-equivalent host loop: steps/s (each step = env + train)."""
    import gymnasium
    import numpy as np
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)
    env = gymnasium.make("CartPole-v1")
    obs, _ = env.reset(seed=0)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.f = nn.Sequential(
                nn.Linear(4, 128), nn.LeakyReLU(),
                nn.Linear(128, 64), nn.LeakyReLU(),
                nn.Linear(64, 2),
            )

        def forward(self, x):
            return self.f(x)

    q, q_target = Net(), Net()
    q_target.load_state_dict(q.state_dict())
    opt = torch.optim.Adam(q.parameters(), lr=0.01)

    cap, B = 100000, 512
    store_obs = np.zeros((cap, 4), np.float32)
    store_next = np.zeros((cap, 4), np.float32)
    store_a = np.zeros(cap, np.int64)
    store_r = np.zeros(cap, np.float32)
    store_d = np.zeros(cap, np.float32)
    cursor, size = 0, 0

    # warm fill
    for _ in range(1000):
        a = env.action_space.sample()
        nobs, r, term, trunc, _ = env.step(a)
        store_obs[cursor], store_next[cursor] = obs, nobs
        store_a[cursor], store_r[cursor], store_d[cursor] = a, r, float(term)
        cursor = (cursor + 1) % cap
        size = min(size + 1, cap)
        obs = nobs if not (term or trunc) else env.reset()[0]

    t0 = time.perf_counter()
    for _ in range(num_steps):
        with torch.no_grad():
            scores = q(torch.from_numpy(obs).unsqueeze(0))
            a = int(torch.distributions.Categorical(logits=scores).sample())
        nobs, r, term, trunc, _ = env.step(a)
        store_obs[cursor], store_next[cursor] = obs, nobs
        store_a[cursor], store_r[cursor], store_d[cursor] = a, r, float(term)
        cursor = (cursor + 1) % cap
        size = min(size + 1, cap)
        obs = nobs if not (term or trunc) else env.reset()[0]

        idx = np.random.randint(0, size, B)
        bo = torch.from_numpy(store_obs[idx])
        bn = torch.from_numpy(store_next[idx])
        ba = torch.from_numpy(store_a[idx])
        br = torch.from_numpy(store_r[idx])
        bd = torch.from_numpy(store_d[idx])
        with torch.no_grad():
            next_q = q(bn)
            next_qt = q_target(bn)
            sel = next_q.argmax(1, keepdim=True)
            target = br + 0.99 * (1 - bd) * next_qt.gather(1, sel).squeeze(1)
        pred = q(bo).gather(1, ba.unsqueeze(1)).squeeze(1)
        loss = torch.nn.functional.mse_loss(pred, target)
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            for tp, sp in zip(q_target.parameters(), q.parameters()):
                tp.mul_(0.8).add_(0.2 * sp)
    dt = time.perf_counter() - t0
    env.close()
    return num_steps / dt


def bench_reagent_tpu(num_steps: int = 30000) -> float:
    """Fused jitted actor-learner loop: steps/s (each step = env + train)."""
    import jax
    import jax.numpy as jnp

    from reagent_tpu.core.parameters import RLParameters
    from reagent_tpu.gym.envs import CartPole
    from reagent_tpu.gym.online_loop import (
        OnlineLoopConfig,
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
        rl=RLParameters(gamma=0.99, target_update_rate=0.2),
        optimizer={"Adam": {"lr": 0.01}},
    )
    rb = ReplayBuffer(replay_capacity=100000, update_horizon=1, gamma=0.99)
    rng = jax.random.PRNGKey(0)
    r_init, r_fill, r_train = jax.random.split(rng, 3)
    tstate = trainer.init(r_init, jnp.zeros((1, 4)))
    rb_state = rb.init(
        observation=jnp.zeros(4), action=jnp.int32(0),
        reward=jnp.float32(0), terminal=jnp.bool_(False),
    )
    rb_state = prefill_replay_buffer(env, rb, rb_state, r_fill, num_steps=1000)

    sampler = SoftmaxActionSampler(temperature=1.0)

    def policy_act(ts, obs, rng):
        scores = trainer.q_network.apply(ts.q_params, obs[None])
        out = sampler.sample_action(scores, rng)
        idx = jnp.argmax(out.action[0]).astype(jnp.int32)
        return idx, idx

    cfg = OnlineLoopConfig(
        num_steps=num_steps, train_every=1, train_after=0, minibatch_size=512,
        unroll=2,  # measured +2% steps/s and ~10x faster compile vs unroll=1
    )
    maker = lambda d: make_discrete_dqn_batch(d, 2)

    # compile warmup with the SAME config (scan length is part of the program;
    # the timed second invocation then measures pure steady-state throughput)
    tstate, rb_state, aux = run_online_training(
        env, trainer, tstate, rb, rb_state, policy_act, maker,
        jax.random.PRNGKey(1), cfg,
    )
    jax.block_until_ready(aux["episodes_completed"])

    t0 = time.perf_counter()
    tstate, rb_state, aux = run_online_training(
        env, trainer, tstate, rb, rb_state, policy_act, maker, r_train, cfg
    )
    jax.block_until_ready(aux["episodes_completed"])
    dt = time.perf_counter() - t0
    return num_steps / dt


def main():
    ours = bench_reagent_tpu()
    try:
        baseline = bench_reference_torch_cpu()
    except Exception:
        baseline = None
    result = {
        "metric": "online_dqn_env_steps_plus_updates_per_s",
        "value": round(ours, 1),
        "unit": "steps/s (env step + learner update each)",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
