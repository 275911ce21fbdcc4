"""Seq2Slate + SlateQ + FrechetSort tests (mirrors reference ranking tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reagent_tpu.core import types as rlt
from reagent_tpu.core.parameters import IPSClamp, IPSClampMethod, RLParameters, Seq2SlateParameters
from reagent_tpu.models import FullyConnectedCritic, ValueNetwork
from reagent_tpu.models.seq2slate import (
    Seq2SlateMode,
    Seq2SlateOutputArch,
    Seq2SlateTransformerModel,
    per_symbol_to_per_seq_probs,
)
from reagent_tpu.samplers import FrechetSort
from reagent_tpu.training.ranking import Seq2SlateTrainer
from reagent_tpu.training.ranking.seq2slate_trainer import ips_clamp
from reagent_tpu.training.slate_q_trainer import SlateQTrainer

B, S, T, SD, CD = 4, 6, 4, 5, 7


def _model(arch=Seq2SlateOutputArch.AUTOREGRESSIVE):
    return Seq2SlateTransformerModel(
        state_dim=SD, candidate_dim=CD, num_stacked_layers=2, num_heads=2,
        dim_model=16, dim_feedforward=32, max_src_seq_len=S, max_tgt_seq_len=T,
        output_arch=arch,
    )


def _rank_inputs(seed=0):
    rng = jax.random.PRNGKey(seed)
    state = jax.random.normal(rng, (B, SD))
    src = jax.random.normal(jax.random.fold_in(rng, 1), (B, S, CD))
    return state, src


def test_seq2slate_rank_valid_permutation():
    m = _model()
    state, src = _rank_inputs()
    params = m.init(jax.random.PRNGKey(1), Seq2SlateMode.RANK_MODE.value, state, src, greedy=True)
    out = m.apply(params, Seq2SlateMode.RANK_MODE.value, state, src, greedy=True)
    idx = np.asarray(out.ranked_tgt_out_idx)
    assert idx.shape == (B, T)
    for b in range(B):
        assert len(set(idx[b].tolist())) == T
        assert (idx[b] >= 2).all() and (idx[b] < S + 2).all()


def test_seq2slate_rank_log_prob_consistency():
    m = _model()
    state, src = _rank_inputs()
    params = m.init(jax.random.PRNGKey(1), Seq2SlateMode.RANK_MODE.value, state, src, greedy=True)
    out = m.apply(params, Seq2SlateMode.RANK_MODE.value, state, src, greedy=True)
    cand = jnp.concatenate([jnp.zeros((B, 2, CD)), src], axis=1)
    tgt_out = out.ranked_tgt_out_idx
    tgt_in = jnp.concatenate([jnp.ones((B, 1), jnp.int32), tgt_out[:, :-1]], axis=1)
    tgt_in_seq = jnp.take_along_axis(cand, tgt_in[:, :, None], axis=1)
    lp = m.apply(
        params, Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value, state, src,
        tgt_in_idx=tgt_in, tgt_out_idx=tgt_out, tgt_in_seq=tgt_in_seq,
    )
    np.testing.assert_allclose(
        np.exp(np.asarray(lp.per_seq_log_probs)),
        np.asarray(out.ranked_per_seq_probs),
        rtol=1e-3,
    )


def test_seq2slate_trainer_improves_objective():
    """Off-policy training pushes model propensity toward high-reward slates."""
    m = _model()
    state, src = _rank_inputs()
    tgt_out = jnp.tile(jnp.arange(2, T + 2)[None], (B, 1))
    tgt_in = jnp.concatenate([jnp.ones((B, 1), jnp.int32), tgt_out[:, :-1]], axis=1)
    cand = jnp.concatenate([jnp.zeros((B, 2, CD)), src], axis=1)
    batch = rlt.PreprocessedRankingInput(
        state=rlt.FeatureData(float_features=state),
        src_seq=rlt.FeatureData(float_features=src),
        tgt_in_seq=rlt.FeatureData(float_features=jnp.take_along_axis(cand, tgt_in[:, :, None], axis=1)),
        tgt_in_idx=tgt_in,
        tgt_out_idx=tgt_out,
        tgt_out_probs=jnp.full((B, 1), 0.1),
        slate_reward=jnp.ones((B, 1)),
    )
    trainer = Seq2SlateTrainer(
        m,
        params=Seq2SlateParameters(
            on_policy=False, ips_clamp=IPSClamp(IPSClampMethod.UNIVERSAL, 10.0)
        ),
        policy_optimizer={"Adam": {"lr": 1e-3}},
    )
    ts = trainer.init(jax.random.PRNGKey(0), batch)

    def seq_prob(ts):
        lp = m.apply(
            ts.policy_params, Seq2SlateMode.PER_SEQ_LOG_PROB_MODE.value, state, src,
            tgt_in_idx=tgt_in, tgt_out_idx=tgt_out,
            tgt_in_seq=batch.tgt_in_seq.float_features,
        ).per_seq_log_probs
        return float(jnp.mean(lp))

    p0 = seq_prob(ts)
    for _ in range(30):
        ts, metrics = trainer.train_step(ts, batch)
    p1 = seq_prob(ts)
    # positive reward + positive IS weight => propensity of logged slates rises
    assert p1 > p0
    assert np.isfinite(float(metrics["obj_loss"]))


def test_ips_clamp_methods():
    w = jnp.array([0.5, 5.0, 20.0])
    np.testing.assert_allclose(
        np.asarray(ips_clamp(w, IPSClamp(IPSClampMethod.UNIVERSAL, 10.0))), [0.5, 5.0, 10.0]
    )
    np.testing.assert_allclose(
        np.asarray(ips_clamp(w, IPSClamp(IPSClampMethod.AGGRESSIVE, 10.0))), [0.5, 5.0, 0.0]
    )
    np.testing.assert_allclose(np.asarray(ips_clamp(w, None)), np.asarray(w))


def test_frechet_sort():
    sampler = FrechetSort(shape=5.0, topk=3, equiv_len=3, log_scores=True)
    scores = jnp.tile(jnp.array([[3.0, 2.0, 1.0, 0.0]]), (2, 1))
    out = sampler.sample_action(scores, jax.random.PRNGKey(0))
    assert out.action.shape == (2, 3)
    # strong shape => near-deterministic descending sort
    counts = 0
    for s in range(50):
        o = sampler.sample_action(scores, jax.random.PRNGKey(s))
        counts += int((np.asarray(o.action[0]) == [0, 1, 2]).all())
    assert counts > 35
    # log_prob of the perfect descending permutation beats a reversed one
    perm_good = jnp.array([[0, 1, 2, 3]])
    perm_bad = jnp.array([[3, 2, 1, 0]])
    lp_good = float(sampler.log_prob(scores[:1], perm_good)[0])
    lp_bad = float(sampler.log_prob(scores[:1], perm_bad)[0])
    assert lp_good > lp_bad


def test_slate_q_trainer():
    batch_size, num_cand, slate, state_dim, cdim = 8, 5, 2, 3, 4
    rng = np.random.default_rng(0)

    def docs(seed):
        r = np.random.default_rng(seed)
        return rlt.DocList(
            float_features=jnp.asarray(r.normal(size=(batch_size, num_cand, cdim)), jnp.float32),
            mask=jnp.ones((batch_size, num_cand)),
            value=jnp.asarray(r.uniform(size=(batch_size, num_cand)), jnp.float32),
        )

    batch = rlt.SlateQInput(
        state=rlt.FeatureData(
            float_features=jnp.asarray(rng.normal(size=(batch_size, state_dim)), jnp.float32),
            candidate_docs=docs(1),
        ),
        next_state=rlt.FeatureData(
            float_features=jnp.asarray(rng.normal(size=(batch_size, state_dim)), jnp.float32),
            candidate_docs=docs(2),
        ),
        action=jnp.asarray(rng.integers(0, num_cand, (batch_size, slate))),
        next_action=jnp.asarray(rng.integers(0, num_cand, (batch_size, slate))),
        reward=jnp.asarray(rng.normal(size=(batch_size, slate)), jnp.float32),
        reward_mask=jnp.ones((batch_size, slate), bool),
        time_diff=jnp.ones((batch_size, 1)),
        step=None,
        not_terminal=jnp.zeros((batch_size, 1)),
    )
    q_net = FullyConnectedCritic(state_dim=state_dim, action_dim=cdim, sizes=[32], activations=["relu"])
    trainer = SlateQTrainer(
        q_network=q_net, slate_size=slate,
        rl=RLParameters(gamma=0.9, target_update_rate=0.5, maxq_learning=False),
        optimizer={"Adam": {"lr": 3e-3}},
    )
    ts = trainer.init(
        jax.random.PRNGKey(0), jnp.zeros((1, state_dim)), jnp.zeros((1, cdim))
    )
    losses = []
    for _ in range(100):
        ts, m = trainer.train_step(ts, batch)
        losses.append(float(m["td_loss"]))
    assert losses[-1] < losses[0] * 0.5

    # maxq path compiles and runs
    trainer2 = SlateQTrainer(
        q_network=q_net, slate_size=slate,
        rl=RLParameters(gamma=0.9, target_update_rate=0.5, maxq_learning=True),
        optimizer={"Adam": {"lr": 3e-3}},
    )
    ts2 = trainer2.init(jax.random.PRNGKey(0), jnp.zeros((1, state_dim)), jnp.zeros((1, cdim)))
    ts2, m2 = trainer2.train_step(ts2, batch)
    assert np.isfinite(float(m2["td_loss"]))


def test_seq2slate_bfloat16_matches_f32():
    """Mixed precision: bf16 activations, f32 params + pointer softmax —
    per-seq log probs must track the f32 model closely."""
    import jax.numpy as jnp

    m32 = _model()
    m16 = Seq2SlateTransformerModel(
        state_dim=SD, candidate_dim=CD, num_stacked_layers=2, num_heads=2,
        dim_model=16, dim_feedforward=32, max_src_seq_len=S, max_tgt_seq_len=T,
        output_arch=Seq2SlateOutputArch.AUTOREGRESSIVE, compute_dtype=jnp.bfloat16,
    )
    state, src = _rank_inputs()
    params = m32.init(jax.random.PRNGKey(1), Seq2SlateMode.RANK_MODE.value, state, src, greedy=True)
    o32 = m32.apply(params, Seq2SlateMode.RANK_MODE.value, state, src, greedy=True)
    o16 = m16.apply(params, Seq2SlateMode.RANK_MODE.value, state, src, greedy=True)
    # same params: greedy rankings should agree on nearly every slot
    agree = np.mean(np.asarray(o32.ranked_tgt_out_idx) == np.asarray(o16.ranked_tgt_out_idx))
    assert agree >= 0.9, agree
    np.testing.assert_allclose(
        np.asarray(o16.ranked_per_seq_probs), np.asarray(o32.ranked_per_seq_probs),
        rtol=0.15, atol=1e-4,
    )
