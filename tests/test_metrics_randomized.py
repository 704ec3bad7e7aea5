"""Randomized pin of the DataFrame-native ranking metrics against
mllib.RankingMetrics: 5 seeded corpora × 40 users of random pred/truth lists
with empty/duplicate/disjoint edge cases mixed in."""

from __future__ import annotations

import random

import pytest

from ds_ga1004_bigdata_project_spark.ml.metrics import ranking_metrics


def _random_cases(seed: int, n_users: int = 40):
    rng = random.Random(seed)
    cases = []
    for _ in range(n_users):
        pred_len = rng.randint(0, 12)
        pred = [rng.randint(0, 20) for _ in range(pred_len)]  # dups likely
        truth = rng.sample(range(25), rng.randint(0, 8))      # maybe empty
        cases.append((pred, truth))
    return cases


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_corpora_match_mllib(spark, seed):
    cases = [(p, t) for p, t in _random_cases(seed) if p]  # mllib needs pred rows
    k = 5
    pred = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(cases)], "user int, pred_items array<int>")
    truth = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(cases)], "user int, truth_items array<int>")
    ours = ranking_metrics(pred, truth, k, round_scale=None).collect()[0]

    from pyspark.mllib.evaluation import RankingMetrics

    m = RankingMetrics(spark.sparkContext.parallelize(cases))
    assert ours["map"] == pytest.approx(m.meanAveragePrecision, abs=1e-9)
    assert ours["precision_at_k"] == pytest.approx(m.precisionAt(k), abs=1e-9)
    assert ours["ndcg_at_k"] == pytest.approx(m.ndcgAt(k), abs=1e-9)
