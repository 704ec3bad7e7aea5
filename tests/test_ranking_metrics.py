"""Pin the DataFrame-native ranking metrics against mllib.RankingMetrics
(SURVEY §7.4: "pin against RankingMetrics numerically before swapping in the
DataFrame version") and against hand-computed values on edge cases."""

from __future__ import annotations

import math

import pytest

from ds_ga1004_bigdata_project_spark.ml.metrics import ranking_metrics, rmse

# (pred ordered best-first, truth) pairs incl. the SURVEY §7.4 edge cases:
# empty truth list, k > |truth|, duplicate predicted items, disjoint lists.
CASES = [
    ([1, 2, 3, 4, 5], [1, 3, 9]),
    ([9, 8, 7], [7]),
    ([1, 1, 2], [1, 2]),          # duplicate predictions count each occurrence
    ([5, 6], []),                  # empty truth → 0 per mllib
    ([4], [4, 5, 6, 7, 8, 9]),     # k > |pred|, |truth| > k
    ([10, 11, 12], [1, 2, 3]),     # no hits
]
K = 3


def _df_pairs(spark):
    pred = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(CASES)], "user int, pred_items array<int>")
    truth = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(CASES)], "user int, truth_items array<int>")
    return pred, truth


def test_matches_mllib(spark):
    pred, truth = _df_pairs(spark)
    ours = ranking_metrics(pred, truth, K, round_scale=None).collect()[0]

    from pyspark.mllib.evaluation import RankingMetrics

    rdd = spark.sparkContext.parallelize(
        [(p, t) for p, t in CASES])
    m = RankingMetrics(rdd)
    assert ours["map"] == pytest.approx(m.meanAveragePrecision, abs=1e-12)
    assert ours["precision_at_k"] == pytest.approx(m.precisionAt(K), abs=1e-12)
    assert ours["ndcg_at_k"] == pytest.approx(m.ndcgAt(K), abs=1e-12)
    assert ours["n_users"] == len(CASES)


def test_hand_computed_single_user(spark):
    # pred [1,2,3], truth {1,3}: hits at pos 0 (P=1/1) and pos 2 (P=2/3)
    # AP = (1 + 2/3)/2 = 5/6 ; P@3 = 2/3 ; DCG = 1/log2(2)+1/log2(4) = 1.5,
    # IDCG@2 = 1/log2(2)+1/log2(3) → NDCG = 1.5/(1+1/log2(3))
    pred = spark.createDataFrame([(0, [1, 2, 3])], "user int, pred_items array<int>")
    truth = spark.createDataFrame([(0, [1, 3])], "user int, truth_items array<int>")
    r = ranking_metrics(pred, truth, 3, round_scale=None).collect()[0]
    assert r["map"] == pytest.approx(5 / 6, abs=1e-12)
    assert r["precision_at_k"] == pytest.approx(2 / 3, abs=1e-12)
    idcg = 1.0 + 1.0 / math.log2(3)
    assert r["ndcg_at_k"] == pytest.approx(1.5 / idcg, abs=1e-12)


def test_rmse_native(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 3.0), (5.0, 1.0)], "label double, pred double")
    r = rmse(df, "label", "pred").collect()[0]
    assert r["rmse"] == pytest.approx(math.sqrt((1 + 0 + 16) / 3), abs=1e-12)
    assert r["n"] == 3


# ---------------------------------------------------------------------
# retrieval_recall_at_k (ANN-tier eval, q155)
# ---------------------------------------------------------------------

def test_retrieval_recall_hand_case(spark):
    from ds_ga1004_bigdata_project_spark.ml.metrics import \
        retrieval_recall_at_k
    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12),
         (2, 20), (2, 21), (2, 22),
         (3, 30), (3, 31), (3, 32)],
        "query_id int, neighbor_id int")
    cand = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99),     # 2/3 overlap
         (2, 20), (2, 21), (2, 22),     # perfect
         (3, 90), (3, 91), (3, 92)],    # zero overlap — must still appear
        "query_id int, neighbor_id int")
    out = {r.query_id: (r.n_overlap, r.recall)
           for r in retrieval_recall_at_k(truth, cand, k=3).collect()}
    assert out == {1: (2, 0.6667), 2: (3, 1.0), 3: (0, 0.0)}


def test_retrieval_recall_rejects_bad_k(spark):
    import pytest
    from ds_ga1004_bigdata_project_spark.ml.metrics import \
        retrieval_recall_at_k
    df = spark.createDataFrame([(1, 2)], "query_id int, neighbor_id int")
    with pytest.raises(ValueError):
        retrieval_recall_at_k(df, df, k=0)
