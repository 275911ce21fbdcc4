"""Debug CEM CartPole: world-model quality + planner behavior."""
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
T_seg = 20

def rollout(r):
    st, obs = env.reset(r)
    def step(carry, rr):
        st, obs = carry
        a = jax.random.randint(rr, (), 0, A_)
        nst, nobs, rew, done = env.step(st, a, rr)
        onehot = jax.nn.one_hot(a, A_)
        out = (obs, onehot, nobs, rew, 1.0 - done.astype(jnp.float32))
        rst, robs = env.reset(rr)
        nst = jax.tree_util.tree_map(lambda x, y: jnp.where(done, x, y), rst, nst)
        nobs = jnp.where(done, robs, nobs)
        return (nst, nobs), out
    _, seq = jax.lax.scan(step, (st, obs), jax.random.split(r, T_seg))
    return seq

obs, act, nobs, rew, nt = jax.vmap(rollout, out_axes=1)(jax.random.split(rng, 1024))
print("terminal fraction in corpus:", 1 - float(nt.mean()))
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
for i in range(600):
    ts, m = trainer.train_step(ts, batch)
    if i % 150 == 0:
        print(i, {k: round(float(v), 4) for k, v in m.items()})

# WM terminal-prediction check: one-step forward from corpus states
out = mn.apply(ts.params, batch.state, batch.action)
# MemoryNetwork output: what's the structure?
print("wm output type:", type(out))

planner = CEMPlannerNetwork(
    mem_net=mn, mem_net_params_list=[ts.params],
    cem_num_iterations=10, cem_population_size=100,
    ensemble_population_size=1, num_elites=15,
    plan_horizon_length=10, state_dim=S_, action_dim=A_,
    discrete_action=True, terminal_effective=True, gamma=1.0,
)
r_eval = jax.random.PRNGKey(7)
for ep in range(0):
    r_eval, r0 = jax.random.split(r_eval)
    st, obs0 = env.reset(r0)
    total = 0.0
    for _ in range(200):
        r_eval, rp, rs = jax.random.split(r_eval, 3)
        a, _ = planner(rlt.FeatureData(float_features=obs0[None]), rp)
        st, obs0, rew, done = env.step(st, jnp.asarray(a), rs)
        total += float(rew)
        if bool(done):
            break
    print("episode return:", total)

# --- discrimination test: tilted state, compare avg return by first action
state_tilt = jnp.asarray([0.0, 0.0, 0.15, 1.0])  # theta=0.15 rad (~8.6deg), falling right
r = jax.random.PRNGKey(3)
seqs = jax.random.randint(r, (500, 10), 0, 2)
sols = jax.nn.one_hot(seqs, 2)
acc = planner.acc_rewards_of_all_solutions(state_tilt, sols, jax.random.PRNGKey(4))
acc = np.asarray(acc)
first = np.asarray(seqs[:, 0])
print("tilted right: avg return a=0 (left):", acc[first == 0].mean(),
      " a=1 (right):", acc[first == 1].mean())

# what does the WM's terminal head say about a clearly-dead state?
dead = jnp.asarray([0.0, 0.0, 0.3, 0.0])   # way past 12deg
ok = jnp.asarray([0.0, 0.0, 0.0, 0.0])
for nm, s in (("dead", dead), ("ok", ok)):
    out = mn.apply(ts.params,
                   rlt.FeatureData(float_features=s.reshape(1, 1, -1)),
                   rlt.FeatureData(float_features=jnp.asarray([[ [1.,0.] ]])))
    print(nm, "p(not_terminal) =", float(jax.nn.sigmoid(out.not_terminal[0, 0])),
          "pred reward =", float(out.reward[0, 0]))
