"""CEM CartPole v2: 1-step training corpus from full rollouts."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import MDNRNNTrainerParameters
from reagent_tpu.gym.envs import CartPole
from reagent_tpu.models.cem_planner import CEMPlannerNetwork
from reagent_tpu.models.mdn_rnn import MemoryNetwork
from reagent_tpu.training.world_model.mdnrnn_trainer import MDNRNNTrainer

env = CartPole(max_steps=200)
S_, A_ = 4, 2
rng = jax.random.PRNGKey(0)

def rollout(r):  # full 200 steps with auto-reset
    st, obs = env.reset(r)
    def step(carry, rr):
        st, obs = carry
        a = jax.random.randint(rr, (), 0, A_)
        nst, nobs, rew, done = env.step(st, a, rr)
        out = (obs, jax.nn.one_hot(a, A_), nobs, rew, 1.0 - done.astype(jnp.float32))
        rst, robs = env.reset(rr)
        nst = jax.tree_util.tree_map(lambda x, y: jnp.where(done, x, y), rst, nst)
        nobs = jnp.where(done, robs, nobs)
        return (nst, nobs), out
    _, seq = jax.lax.scan(step, (st, obs), jax.random.split(r, 200))
    return seq

obs, act, nobs, rew, nt = jax.vmap(rollout)(jax.random.split(rng, 256))
# flatten to [1, N, .] single-step sequences (planner also uses T=1 rollouts)
flat = lambda x: x.reshape(1, -1, *x.shape[2:])
obs, act, nobs, rew, nt = map(flat, (obs, act, nobs, rew, nt))
print("corpus:", obs.shape, "terminal frac:", 1 - float(nt.mean()))

batch = rlt.MemoryNetworkInput(
    state=rlt.FeatureData(float_features=obs),
    action=rlt.FeatureData(float_features=act),
    next_state=rlt.FeatureData(float_features=nobs),
    reward=rew, not_terminal=nt, time_diff=None, step=None,
)
mn = MemoryNetwork(state_dim=S_, action_dim=A_, num_hiddens=100,
                   num_hidden_layers=2, num_gaussians=1)
trainer = MDNRNNTrainer(mn, MDNRNNTrainerParameters(
    hidden_size=100, num_hidden_layers=2, num_gaussians=1,
    learning_rate=1e-3, not_terminal_loss_weight=200.0))
ts = trainer.init(rng, batch)
t0 = time.time()
for i in range(1500):
    ts, m = trainer.train_step(ts, batch)
    if i % 1000 == 0:
        print(i, {k: round(float(v), 4) for k, v in m.items()})
print("train time:", round(time.time() - t0, 1))

dead = jnp.asarray([0.0, 0.0, 0.19, 1.0])   # near boundary, falling
ok = jnp.asarray([0.0, 0.0, 0.0, 0.0])
for nm, s in (("near-death", dead), ("ok", ok)):
    out = mn.apply(ts.params,
                   rlt.FeatureData(float_features=s.reshape(1, 1, -1)),
                   rlt.FeatureData(float_features=jnp.asarray([[[1., 0.]]])))
    print(nm, "p(not_term) =", round(float(jax.nn.sigmoid(out.not_terminal[0, 0])), 4),
          "pred reward =", round(float(out.reward[0, 0]), 4))

planner = CEMPlannerNetwork(
    mem_net=mn, mem_net_params_list=[ts.params],
    cem_num_iterations=10, cem_population_size=100,
    ensemble_population_size=1, num_elites=15,
    plan_horizon_length=10, state_dim=S_, action_dim=A_,
    discrete_action=True, terminal_effective=True, gamma=1.0,
)
state_tilt = jnp.asarray([0.0, 0.0, 0.15, 1.0])
seqs = jax.random.randint(jax.random.PRNGKey(3), (500, 10), 0, 2)
sols = jax.nn.one_hot(seqs, 2)
acc = np.asarray(planner.acc_rewards_of_all_solutions(state_tilt, sols, jax.random.PRNGKey(4)))
first = np.asarray(seqs[:, 0])
print("tilted: avg return a=0 (left):", acc[first == 0].mean(),
      " a=1 (right):", acc[first == 1].mean())

def eval_episode(r):
    r0, r = jax.random.split(r)
    st, obs0 = env.reset(r0)
    def step(carry, rr):
        st, obs0, alive = carry
        rp, rs = jax.random.split(rr)
        seqs = jax.random.randint(rp, (1000, 10), 0, 2)
        sols = jax.nn.one_hot(seqs, 2)
        acc = planner.acc_rewards_of_all_solutions.__wrapped__(planner, obs0, sols, rp)
        first_oh = jax.nn.one_hot(seqs[:, 0], 2)
        tally = jnp.sum(first_oh, axis=0)
        avg = jnp.where(tally > 0, jnp.sum(first_oh * acc[:, None], axis=0) / jnp.maximum(tally, 1), -jnp.inf)
        a = jnp.argmax(avg).astype(jnp.int32)
        st, obs0, rew, done = env.step(st, a, rs)
        ret = rew * alive
        alive = alive * (1.0 - done.astype(jnp.float32))
        return (st, obs0, alive), ret
    (_, _, _), rets = jax.lax.scan(step, (st, obs0, jnp.asarray(1.0)), jax.random.split(r, 200))
    return jnp.sum(rets)

print("compiling eval...", time.time()-t0); rets = jax.jit(jax.vmap(eval_episode))(jax.random.split(jax.random.PRNGKey(7), 5))
print("episode returns:", np.asarray(rets), "mean:", float(rets.mean()))
