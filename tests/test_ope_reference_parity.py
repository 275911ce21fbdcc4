"""Golden parity for the ope/ estimator library against the reference's own
estimators (reagent/ope/estimators/{contextual_bandits,sequential,slate}_
estimators.py) on identical synthetic logs.

The evaluation/-side CPE stack already has golden parity
(test_cpe_reference_parity.py); this closes the same loop for the standalone
OPE library: dense-array inputs here are converted into the reference's
per-sample object model and both implementations must produce the same
estimates.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from reagent_tpu.ope.estimators.contextual_bandits_estimators import (
    BanditsEstimatorInput,
    DMEstimator,
    DoublyRobustEstimator,
    IPSEstimator,
    SwitchDREstimator,
    SwitchEstimator,
)
from reagent_tpu.ope.estimators.sequential_estimators import (
    DMEstimator as SeqDM,
    DoublyRobustEstimator as SeqDR,
    IPSEstimator as SeqIPS,
    MAGICEstimator,
    RLEstimatorInput,
)
from reagent_tpu.ope.estimators.slate_estimators import (
    IPSEstimator as SlateIPS,
    PBMEstimator,
    PseudoInverseEstimator,
    SlateEstimatorInput,
)


def _reference():
    from reagent_tpu.utils.reference_compat import add_reference_to_path

    torch = pytest.importorskip("torch")
    if not add_reference_to_path():
        pytest.skip("reference tree not available")
    return torch


# ------------------------------------------------------------------ bandits


def _bandit_arrays(seed=3, n=200, a=3):
    rng = np.random.default_rng(seed)
    logits_b = rng.normal(size=(n, a))
    logits_t = rng.normal(size=(n, a))
    log_p = np.exp(logits_b) / np.exp(logits_b).sum(1, keepdims=True)
    tgt_p = np.exp(logits_t) / np.exp(logits_t).sum(1, keepdims=True)
    actions = np.array([rng.choice(a, p=log_p[i]) for i in range(n)])
    rewards = rng.uniform(0.1, 1.0, n)
    dm_rewards = rng.uniform(0.0, 1.0, (n, a))
    return actions, rewards, log_p, tgt_p, dm_rewards


def _to_ref_bandit_input(torch, actions, rewards, log_p, tgt_p, dm_rewards):
    from reagent.ope.estimators.contextual_bandits_estimators import (
        ActionDistribution,
        BanditsEstimatorInput as RefInput,
        LogSample,
        ModelOutputs,
    )
    from reagent.ope.estimators.types import Action, ActionSpace

    n, a = log_p.shape
    samples = [
        LogSample(
            context=None,
            log_action=Action(int(actions[i])),
            log_reward=float(rewards[i]),
            log_action_probabilities=ActionDistribution(
                torch.tensor(log_p[i], dtype=torch.double)
            ),
            tgt_action_probabilities=ActionDistribution(
                torch.tensor(tgt_p[i], dtype=torch.double)
            ),
            tgt_action=Action(int(actions[i])),
            model_outputs=ModelOutputs(
                tgt_reward_from_log_action=float(dm_rewards[i, actions[i]]),
                tgt_rewards=torch.tensor(dm_rewards[i], dtype=torch.double),
            ),
        )
        for i in range(n)
    ]
    return RefInput(ActionSpace(a), samples, True)


@pytest.mark.parametrize(
    "name,mine_cls,kwargs",
    [
        ("DMEstimator", DMEstimator, {}),
        ("IPSEstimator", IPSEstimator, {}),
        ("DoublyRobustEstimator", DoublyRobustEstimator, {}),
        ("SwitchEstimator", SwitchEstimator, {}),
        ("SwitchDREstimator", SwitchDREstimator, {}),
        ("SwitchEstimator", SwitchEstimator, {"exp_base": 2.0}),
        ("SwitchDREstimator", SwitchDREstimator, {"candidates": 5}),
    ],
)
def test_bandit_estimator_parity(name, mine_cls, kwargs):
    torch = _reference()
    import reagent.ope.estimators.contextual_bandits_estimators as ref_mod

    arrays = _bandit_arrays()
    mine_input = BanditsEstimatorInput(
        log_action=arrays[0],
        log_reward=arrays[1],
        log_propensities=arrays[2],
        tgt_propensities=arrays[3],
        dm_rewards=arrays[4],
    )
    ref_input = _to_ref_bandit_input(torch, *arrays)

    mine = mine_cls().evaluate(mine_input, **kwargs)
    theirs = getattr(ref_mod, name)().evaluate(ref_input, **kwargs)
    assert mine.estimated_reward == pytest.approx(
        theirs.estimated_reward, abs=1e-6
    )
    assert mine.estimated_reward_normalized == pytest.approx(
        theirs.estimated_reward_normalized, abs=1e-6
    )
    assert mine.log_reward == pytest.approx(theirs.log_reward, abs=1e-6)


# --------------------------------------------------------------- sequential


def _sequential_arrays(seed=5, n=24, t=8, a=3, gamma=0.9):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(2, t + 1, n)
    mask = (np.arange(t)[None, :] < lengths[:, None]).astype(float)
    logits_b = rng.normal(size=(n, t, a))
    logits_t = rng.normal(size=(n, t, a))
    log_full = np.exp(logits_b) / np.exp(logits_b).sum(2, keepdims=True)
    tgt = np.exp(logits_t) / np.exp(logits_t).sum(2, keepdims=True)
    actions = np.stack(
        [[rng.choice(a, p=log_full[i, j]) for j in range(t)] for i in range(n)]
    )
    log_p = log_full[
        np.arange(n)[:, None], np.arange(t)[None, :], actions
    ]
    rewards = rng.uniform(0.0, 1.0, (n, t)) * mask
    q_values = rng.uniform(0.0, 2.0, (n, t, a))
    return RLEstimatorInput(
        gamma=gamma,
        actions=actions,
        rewards=rewards,
        log_propensities=log_p,
        tgt_propensities=tgt,
        mask=mask,
        q_values=q_values,
    )


def _to_ref_sequential_input(torch, inp: RLEstimatorInput):
    from reagent.ope.estimators.sequential_estimators import (
        ActionDistribution,
        RLEstimatorInput as RefInput,
        RLPolicy,
        State,
        Transition,
        ValueFunction,
    )
    from reagent.ope.estimators.types import Action, ActionSpace

    n, t = inp.actions.shape
    a = inp.tgt_propensities.shape[2]

    class TablePolicy(RLPolicy):
        def __init__(self):
            super().__init__(ActionSpace(a))

        def action_dist(self, state):
            i, j = state.value
            return ActionDistribution(
                torch.tensor(inp.tgt_propensities[i, j], dtype=torch.double)
            )

    class TableValueFunction(ValueFunction):
        def state_action_value(self, state, action):
            i, j = state.value
            return float(inp.q_values[i, j, action.value])

        def state_value(self, state):
            i, j = state.value
            return float(
                (inp.q_values[i, j] * inp.tgt_propensities[i, j]).sum()
            )

        def reset(self):
            pass

    log = []
    for i in range(n):
        mdp = []
        for j in range(t):
            if inp.mask[i, j] == 0:
                break
            mdp.append(
                Transition(
                    last_state=State((i, j)),
                    action=Action(int(inp.actions[i, j])),
                    action_prob=float(inp.log_propensities[i, j]),
                    state=State((i, j + 1)),
                    reward=float(inp.rewards[i, j]),
                )
            )
        log.append(mdp)
    return RefInput(
        gamma=inp.gamma,
        log=log,
        target_policy=TablePolicy(),
        value_function=TableValueFunction(),
    )


@pytest.mark.parametrize(
    "mine,ref_name,ref_kwargs",
    [
        (SeqDM(), "DMEstimator", {}),
        (SeqIPS(self_normalize=True), "IPSEstimator", {"weighted": True}),
        (SeqIPS(self_normalize=False), "IPSEstimator", {"weighted": False}),
        (SeqDR(self_normalize=True), "DoublyRobustEstimator", {"weighted": True}),
    ],
)
def test_sequential_estimator_parity(mine, ref_name, ref_kwargs):
    torch = _reference()
    import reagent.ope.estimators.sequential_estimators as ref_mod

    inp = _sequential_arrays()
    ref_input = _to_ref_sequential_input(torch, inp)
    theirs = getattr(ref_mod, ref_name)(**ref_kwargs).evaluate(ref_input).results[0]
    ours = mine.evaluate(inp)
    assert ours.estimated_reward == pytest.approx(
        theirs.estimated_reward, rel=1e-5, abs=1e-6
    )
    assert ours.log_reward == pytest.approx(theirs.log_reward, rel=1e-5, abs=1e-6)


def test_sequential_magic_close_to_reference():
    """The reference ope-MAGIC blends the same WDR step returns through a
    stochastic softmax-SGD + bootstrap (sequential_estimators.py:410-525);
    our MAGIC delegates to the evaluation-side MAGIC (itself golden vs the
    reference evaluation MAGIC).  The two variants must agree on a
    well-conditioned log within a modest tolerance (the reference's own
    adapter-vs-module test uses CPE_PASS_BAR=1.0)."""
    torch = _reference()
    import reagent.ope.estimators.sequential_estimators as ref_mod

    inp = _sequential_arrays(seed=11)
    ref_input = _to_ref_sequential_input(torch, inp)
    random.seed(0)
    torch.manual_seed(0)
    theirs = ref_mod.MAGICEstimator().evaluate(ref_input).results[0]
    ours = MAGICEstimator(num_j_steps=8).evaluate(inp)
    assert np.isfinite(ours.estimated_reward)
    assert np.isfinite(theirs.estimated_reward)
    # MAGIC blends j-step returns, so it may shrink away from plain WDR on a
    # high-variance random log; the two MAGIC variants must still agree.
    assert abs(ours.estimated_reward - theirs.estimated_reward) < 1.0


# -------------------------------------------------------------------- slate


def _slate_arrays(seed=7, n=40, k=2, m=4):
    rng = np.random.default_rng(seed)
    logit_l = rng.normal(size=(n, k, m))
    logit_t = rng.normal(size=(n, k, m))
    log_p = np.exp(logit_l) / np.exp(logit_l).sum(2, keepdims=True)
    tgt_p = np.exp(logit_t) / np.exp(logit_t).sum(2, keepdims=True)
    # logged slates: distinct items per slate (sequential without replacement)
    slates = np.stack([rng.permutation(m)[:k] for _ in range(n)])
    rewards = rng.uniform(0.0, 2.0, n)
    weights = 1.0 / np.log2(np.arange(k) + 2)
    return SlateEstimatorInput(
        log_slate=slates,
        log_reward=rewards,
        log_item_probs=log_p,
        tgt_item_probs=tgt_p,
        position_weights=weights,
    )


def _to_ref_slate_input(torch, inp: SlateEstimatorInput):
    from reagent.ope.estimators.slate_estimators import (
        LogSample,
        SlateContext,
        SlateEstimatorInput as RefInput,
        SlateItem,
        SlateItemValues,
        SlateMetric,
        SlateQuery,
        SlateSlotItemProbabilities,
        SlateSlots,
        SlateSlotValues,
        make_slate,
    )

    n, k = inp.log_slate.shape
    slots = SlateSlots(k)
    metric = SlateMetric()
    samples = []
    for i in range(n):
        samples.append(
            LogSample(
                context=SlateContext(SlateQuery(i), slots),
                metric=metric,
                log_slate=make_slate(
                    slots, [SlateItem(int(x)) for x in inp.log_slate[i]]
                ),
                log_reward=float(inp.log_reward[i]),
                _log_slot_item_probabilities=SlateSlotItemProbabilities(
                    [
                        SlateItemValues(
                            torch.tensor(row, dtype=torch.double)
                        )
                        for row in inp.log_item_probs[i]
                    ]
                ),
                _tgt_slot_item_probabilities=SlateSlotItemProbabilities(
                    [
                        SlateItemValues(
                            torch.tensor(row, dtype=torch.double)
                        )
                        for row in inp.tgt_item_probs[i]
                    ]
                ),
                slot_weights=SlateSlotValues(
                    torch.tensor(inp.position_weights, dtype=torch.double)
                ),
            )
        )
    return RefInput(samples)


@pytest.mark.parametrize(
    "mine,ref_name",
    [
        (SlateIPS(chain_prob=True, weighted=True), "IPSEstimator"),
        (PBMEstimator(use_expectations=True, weighted=True), "PBMEstimator"),
        (
            PseudoInverseEstimator(reference_pinv=True, weighted=True),
            "PseudoInverseEstimator",
        ),
    ],
)
def test_slate_estimator_parity(mine, ref_name):
    torch = _reference()
    import reagent.ope.estimators.slate_estimators as ref_mod

    inp = _slate_arrays()
    ref_input = _to_ref_slate_input(torch, inp)
    theirs = getattr(ref_mod, ref_name)().evaluate(ref_input)
    ours = mine.evaluate(inp)
    assert ours.estimated_reward == pytest.approx(
        theirs.estimated_reward, rel=1e-6, abs=1e-6
    ), ref_name
    assert ours.log_reward == pytest.approx(theirs.log_reward, abs=1e-6)
