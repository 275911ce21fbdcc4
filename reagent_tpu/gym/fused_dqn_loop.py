"""Speed-of-light online DQN engine: noise-tape scan + fused Pallas update.

This is the specialized fast path for the reference's flagship online loop
(reagent/gym/datasets/replay_buffer_dataset.py: env.step -> replay insert ->
sample -> training_step, one transition at a time).  The generic engine is
``gym/online_loop.py``; this one additionally:

  * pre-generates ALL per-step randomness in three vectorized draws before
    the scan (a "noise tape" consumed as scan xs) — no threefry hashing, no
    key splitting inside the hot loop;
  * samples actions by gumbel-max over q/T (identical distribution to
    SoftmaxActionSampler) straight from the tape;
  * uses the packed replay layout (one row write, two row gathers); and
  * trains with ``FusedDQNTrainer`` — the whole update is one Pallas kernel.

Constraints: FunctionalEnv with ``reset_from_uniform``, discrete actions,
softmax exploration, train_every=1.  Everything else should use the generic
loop.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from reagent_tpu.core import types as rlt
from reagent_tpu.gym.envs.functional import FunctionalEnv, FunctionalEnvState
from reagent_tpu.replay.packed import PackedReplayBuffer, PackedReplayBufferState

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FusedLoopConfig:
    num_steps: int
    minibatch_size: int = 512
    temperature: float = 1.0
    episode_return_buffer: int = 64
    unroll: int = 2


_CACHE: dict = {}
_CACHE_MAX = 16


def run_fused_online_dqn(
    env: FunctionalEnv,
    trainer,
    trainer_state,
    rb: PackedReplayBuffer,
    rb_state: PackedReplayBufferState,
    rng: Array,
    config: FusedLoopConfig,
):
    """One fused scan over ``num_steps`` (env step + insert + sample + update).

    Returns (trainer_state, rb_state, aux) like ``run_online_training``.
    """
    assert env.discrete, "fused DQN loop is for discrete-action envs"
    assert hasattr(env, "reset_from_uniform"), (
        "env must provide reset_from_uniform(u) for the noise-tape fast path"
    )
    # The fused loop trains from step 0 (no train_after warm-up): the buffer
    # must be prefilled, or minibatch sampling would gather never-written
    # all-zero rows and silently train on fabricated transitions.
    prefilled = int(rb_state.add_count)
    if prefilled < config.minibatch_size:
        raise ValueError(
            f"fused DQN loop requires a prefilled replay buffer: add_count="
            f"{prefilled} < minibatch_size={config.minibatch_size}. Prefill "
            "with a random policy (gym/utils.fill_replay_buffer) first."
        )

    key = (id(env), id(trainer), id(rb), config)
    cached = _CACHE.get(key)
    if cached is not None:
        run, _refs = cached
        return _invoke(run, env, trainer_state, rb_state, rng, config)

    N = config.num_steps
    B = config.minibatch_size
    A = env.action_dim
    T = config.temperature
    K = config.episode_return_buffer
    cap = rb.capacity
    add_fn = type(rb).add.__wrapped__
    sample_fn = type(rb).sample.__wrapped__
    R = env.reset_noise_dim
    # Prefer the raw-row kernel interface (no XLA-side batch assembly).
    packed_cols = None
    if hasattr(trainer, "configure_packed"):
        packed_cols = trainer.configure_packed(rb)
        train_packed_fn = type(trainer).train_step_packed.__wrapped__
    else:
        train_fn = (
            getattr(type(trainer).train_step, "__wrapped__", None)
            or type(trainer).train_step
        )

    def body(carry, xs):
        env_state, obs, rb_state, tstate, ep_ret, returns, ep_idx = carry
        gumbel, reset_u, sample_u = xs  # [A], [R], [B]

        # --- act: gumbel-max softmax sample (SoftmaxActionSampler parity)
        q = trainer.q_values(tstate, obs[None])[0]  # [A]
        action = jnp.argmax(q / T + gumbel).astype(jnp.int32)

        # --- env step (deterministic dynamics; reset noise from tape)
        env_state, next_obs, reward, done = env.step(env_state, action, None)

        # --- replay insert: one packed row write
        rb_state = add_fn(
            rb, rb_state,
            observation=obs, action=action, reward=reward, terminal=done,
        )

        # --- bookkeeping + auto-reset
        ep_ret = ep_ret + reward
        slot = ep_idx % K
        returns = returns.at[slot].set(jnp.where(done, ep_ret, returns[slot]))
        ep_idx = ep_idx + done.astype(jnp.int32)
        ep_ret = jnp.where(done, 0.0, ep_ret)
        reset_state, reset_obs = env.reset_from_uniform(reset_u)
        env_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), reset_state, env_state
        )
        next_obs = jnp.where(done, reset_obs, next_obs)

        # --- uniform minibatch indices from the tape (insert-then-sample)
        term_col = rb._layout["terminal"][0]
        cur = rb_state.add_count % cap
        written = jnp.minimum(rb_state.add_count, cap)
        t_excl = jnp.where(done, 0, jnp.minimum(rb_state.episode_len, 1))
        valid_count = jnp.maximum(written - t_excl, 1)
        u = jnp.floor(sample_u * valid_count.astype(jnp.float32)).astype(jnp.int32)
        indices = ((cur - t_excl - 1 - u) % cap).astype(jnp.int32)

        if packed_cols is not None:
            rows = rb_state.rows[indices]
            next_rows = rb_state.rows[(indices + 1) % cap]
            tstate, metrics = train_packed_fn(
                trainer, tstate, rows, next_rows, packed_cols
            )
        else:
            batch_dict = sample_fn(rb, rb_state, None, B, indices=indices)
            act_oh = jax.nn.one_hot(
                batch_dict["action"][:, 0], A, dtype=jnp.float32
            )
            ones = jnp.ones((B, A), jnp.float32)
            batch = rlt.DiscreteDqnInput(
                state=rlt.FeatureData(float_features=batch_dict["state"]),
                next_state=rlt.FeatureData(
                    float_features=batch_dict["next_state"]),
                action=act_oh,
                next_action=act_oh,
                reward=batch_dict["reward"],
                time_diff=None,
                step=None,
                not_terminal=1.0 - batch_dict["terminal"].astype(jnp.float32),
                possible_actions_mask=ones,
                possible_next_actions_mask=ones,
            )
            tstate, metrics = train_fn(trainer, tstate, batch)
        carry = (env_state, next_obs, rb_state, tstate, ep_ret, returns, ep_idx)
        return carry, metrics["td_loss"]

    def run(env_state, obs, rb_state, trainer_state, tape):
        carry = (
            env_state, obs, rb_state, trainer_state,
            jnp.asarray(0.0, jnp.float32),
            jnp.full((K,), jnp.nan, jnp.float32),
            jnp.zeros((), jnp.int32),
        )
        carry, td_losses = jax.lax.scan(
            body, carry, tape, length=N, unroll=config.unroll
        )
        _, _, rb_state, trainer_state, _, returns, ep_idx = carry
        return trainer_state, rb_state, {
            "recent_episode_returns": returns,
            "episodes_completed": ep_idx,
            "td_losses": td_losses,
        }

    run = jax.jit(run)
    while len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = (run, (env, trainer, rb))
    return _invoke(run, env, trainer_state, rb_state, rng, config)


def _invoke(run, env, trainer_state, rb_state, rng, config: FusedLoopConfig):
    N, B, A, R = (
        config.num_steps, config.minibatch_size, env.action_dim,
        env.reset_noise_dim,
    )
    r0, r_gumbel, r_reset, r_sample = jax.random.split(rng, 4)
    env_state, obs = env.reset(r0)
    # the whole run's randomness in three vectorized draws
    gumbel = jax.random.gumbel(r_gumbel, (N, A), jnp.float32)
    reset_u = jax.random.uniform(r_reset, (N, R), jnp.float32)
    sample_u = jax.random.uniform(r_sample, (N, B), jnp.float32)
    return run(env_state, obs, rb_state, trainer_state, (gumbel, reset_u, sample_u))
