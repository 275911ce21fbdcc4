"""Real-file ingestion for the OPE benchmark harnesses, driven on in-repo
fixtures: UCI-format CSV (reference ope/test/multiclass_bandits.py:56-100),
MSLR-format ranking dumps (reference mslr_slate.py:94-150), and Yandex
click-log sessions (reference yandex_web_search.py:230-292)."""

from __future__ import annotations

import os

import numpy as np

from reagent_tpu.ope.test.multiclass_bandits import MultiClassDataset, evaluate_all
from reagent_tpu.ope.test.slate_benchmark import (
    QueryCorpus,
    evaluate_slate_benchmark,
)
from reagent_tpu.ope.test.web_search import (
    WebSearchDataset,
    evaluate_web_search,
    load_logged_queries,
    parse_yandex_log,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


# ----------------------------------------------------------------- UCI CSV


def test_uci_csv_loader():
    ds = MultiClassDataset.from_csv(
        {
            "file": os.path.join(DATA, "uci_sample.data"),
            "sep": r"\s+",
            "index_col": 0,
            "label_col": -1,
        }
    )
    assert len(ds) == 45
    assert ds.features.shape == (45, 7)
    assert ds.num_actions == 3
    # features are the numeric columns, labels densely re-indexed
    assert set(np.unique(ds.labels)) == {0, 1, 2}
    assert np.all((ds.features >= 0) & (ds.features <= 1))


def test_uci_csv_bandit_benchmark():
    ds = MultiClassDataset.from_csv(
        {
            "file": os.path.join(DATA, "uci_sample.data"),
            "sep": r"\s+",
            "index_col": 0,
            "label_col": -1,
        }
    )
    results = evaluate_all(ds, seed=1)
    gt = results["ips"].ground_truth_reward
    assert 0.0 < gt <= 1.0
    for name, res in results.items():
        assert np.isfinite(res.estimated_reward), name
        assert -0.5 <= res.estimated_reward <= 1.5, name


# -------------------------------------------------------------------- MSLR


def test_mslr_loader():
    corpus = QueryCorpus.from_mslr(os.path.join(DATA, "mslr_sample.txt"))
    assert corpus.num_queries == 4
    assert corpus.num_docs == 8
    assert corpus.features.shape == (4, 8, 10)
    assert corpus.relevances.min() >= 0 and corpus.relevances.max() <= 4
    # truncation to fewer docs per query
    small = QueryCorpus.from_mslr(
        os.path.join(DATA, "mslr_sample.txt"), num_docs=5
    )
    assert small.relevances.shape == (4, 5)
    np.testing.assert_allclose(small.relevances, corpus.relevances[:, :5])


def test_mslr_slate_benchmark():
    corpus = QueryCorpus.from_mslr(os.path.join(DATA, "mslr_sample.txt"))
    results = evaluate_slate_benchmark(
        corpus, slate_size=3, num_samples_per_query=50, seed=0
    )
    gt = results["ips"].ground_truth_reward
    assert np.isfinite(gt) and gt > 0
    for name, res in results.items():
        assert np.isfinite(res.estimated_reward), name
    # IPS on its own logged propensities should track the ground truth
    assert abs(results["ips"].estimated_reward - gt) < 0.5 * gt


# ------------------------------------------------------------- Yandex logs


def test_yandex_parser():
    queries = parse_yandex_log(os.path.join(DATA, "yandex_sample.txt"))
    # 12 sessions x 2 SERPs
    assert len(queries) == 24
    assert all(len(q.url_list) == 10 for q in queries)
    assert {q.query_id for q in queries} == {10, 11, 12}

    # session 0, serp 0: click url_list[0] with dwell 500 -> grade 2.0,
    # then url_list[2] with dwell 30 -> noise (grade 0.0)
    q0 = queries[0]
    assert q0.user_id == 100
    assert q0.clicks == [(0, 500), (2, 30)]
    assert q0.position_relevances[0] == 2.0
    assert q0.position_relevances[2] == 0.0
    # session 0, serp 1: its last click closes the session -> dwell 10000
    q1 = queries[1]
    assert q1.clicks[-1][1] == 10000
    assert q1.position_relevances[q1.clicks[-1][0]] == 2.0
    # odd sessions: single click with dwell 120 -> grade 1.0
    q_odd = queries[2]
    assert q_odd.clicks[0][1] == 120
    assert q_odd.position_relevances[q_odd.clicks[0][0]] == 1.0


def test_yandex_end_to_end():
    queries = parse_yandex_log(os.path.join(DATA, "yandex_sample.txt"))
    training = load_logged_queries(queries, min_query_count=2)
    assert len(training) == 3
    assert all(tq.count >= 2 for tq in training)
    dataset = WebSearchDataset.from_real_queries(training, num_urls_per_query=10)
    assert dataset.url_relevances.shape == (3, 10)
    # clicked positions aggregated into nonzero relevance mass
    assert dataset.position_relevances.sum() > 0
    results = evaluate_web_search(dataset, slate_size=3, samples_per_query=40)
    for name, res in results.items():
        assert np.isfinite(res.estimated_reward), name
