"""OPE benchmark harnesses: multiclass-bandit and CartPole sequential.

Reference: reagent/ope/test/{multiclass_bandits.py, cartpole.py}.
"""

import numpy as np
import pytest

from reagent_tpu.ope.test.multiclass_bandits import MultiClassDataset, evaluate_all


def test_multiclass_bandit_estimators_recover_truth():
    ds = MultiClassDataset.from_sklearn("digits")
    res = evaluate_all(ds, seed=1)
    gt = res["ips"].ground_truth_reward
    for name in ("dm", "ips", "dr"):
        est = res[name].estimated_reward
        assert abs(est - gt) < 0.08, (name, est, gt)
    # the benchmark is non-trivial: logged reward far from target value
    assert abs(res["ips"].log_reward - gt) > 0.1


def test_multiclass_dataset_from_csv(tmp_path):
    import pandas as pd

    p = tmp_path / "data.csv"
    pd.DataFrame(
        {"f0": [0.1, 0.9, 0.2, 0.8], "f1": [1.0, 0.0, 1.0, 0.0], "y": [0, 1, 0, 1]}
    ).to_csv(p, header=False, index=False)
    ds = MultiClassDataset.from_csv({"file": str(p), "label_col": -1})
    assert len(ds) == 4 and ds.num_actions == 2
    assert ds.features.shape == (4, 2)


def test_multiclass_dataset_missing_keys():
    with pytest.raises(ValueError, match="file"):
        MultiClassDataset.from_csv({"label_col": 0})
    with pytest.raises(ValueError, match="label_col"):
        MultiClassDataset.from_csv({"file": "x.csv"})


@pytest.mark.slow
def test_cartpole_sequential_ope_close_to_truth():
    import jax
    import jax.numpy as jnp

    from reagent_tpu.models import FullyConnectedDQN
    from reagent_tpu.ope.test.cartpole import evaluate_cartpole

    q_net = FullyConnectedDQN(
        state_dim=4, action_dim=2, sizes=[32], activations=["relu"]
    )
    params = q_net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    results, gt = evaluate_cartpole(
        q_net.apply, params, num_episodes=100, horizon=50,
        behavior_temperature=1.5, target_temperature=0.5, seed=2,
    )
    # untrained net: policies are near-random; IPS should still track truth
    ips = results["ips"].estimated_reward
    assert np.isfinite(ips)
    assert abs(ips - gt) < 0.5 * gt, (ips, gt)
    assert np.isfinite(results["magic"].estimated_reward)


def test_slate_benchmark_pi_beats_ips_variance():
    """PI is near-unbiased with far lower variance than whole-slate IPS
    (Swaminathan et al. 2017; reference mslr_slate.py experiment)."""
    from reagent_tpu.ope.test.slate_benchmark import (
        QueryCorpus,
        evaluate_slate_benchmark,
    )

    corpus = QueryCorpus.synthetic(num_queries=150, num_docs=15, seed=2)
    res = evaluate_slate_benchmark(corpus, seed=3)
    gt = res["ips"].ground_truth_reward
    pi = res["pseudo_inverse"]
    # PI within 10% of truth
    assert abs(pi.estimated_reward - gt) < 0.1 * gt, (pi.estimated_reward, gt)
    # and much lower standard error than slate-level IPS
    assert pi.estimated_reward_std_error < 0.3 * res["ips"].estimated_reward_std_error
    # benchmark non-trivial: logged reward far from target value
    assert abs(res["ips"].log_reward - gt) > 0.2 * gt


def test_web_search_click_log_pipeline():
    """Yandex-style harness: click logs -> aggregated relevances -> slate OPE."""
    from reagent_tpu.ope.test.web_search import (
        WebSearchDataset,
        click_to_relevances,
        evaluate_web_search,
        generate_client_logs,
        load_logged_queries,
    )

    # dwell-time grading thresholds (reference yandex_web_search.py:61-75)
    pos, url = click_to_relevances([(0, 500), (2, 100), (3, 10)], [7, 8, 9, 11])
    assert pos[0] == 2.0 and pos[2] == 1.0 and pos[3] == 0.0
    assert url[7] == 2.0 and url[9] == 1.0 and url[11] == 0.0

    logs = generate_client_logs(num_queries=30, num_users=150, seed=3)
    queries = load_logged_queries(logs)
    assert len(queries) >= 20  # most queries exceed MIN_QUERY_COUNT
    assert all(q.count >= 10 for q in queries)

    ds = WebSearchDataset.from_training_queries(queries, num_urls_per_query=12)
    res = evaluate_web_search(ds, seed=4)
    gt = res["ips"].ground_truth_reward
    for name in ("ips", "pbm", "pseudo_inverse"):
        est = res[name].estimated_reward
        assert np.isfinite(est)
        assert abs(est - gt) < 0.35 * abs(gt), (name, est, gt)
    # PBM/PI exploit position structure: lower variance than raw IPS
    assert (
        res["pseudo_inverse"].estimated_reward_std_error
        <= res["ips"].estimated_reward_std_error
    )
