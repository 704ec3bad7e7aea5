"""Native AUC metric (hand-computed pins) + quality-classifier pipeline."""

from __future__ import annotations

import pytest

from ds_ga1004_bigdata_project_spark.ml import metrics as M
from ds_ga1004_bigdata_project_spark.ml import quality as Q
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_SMOKE


def _auc_of(spark, rows):
    df = spark.createDataFrame(rows, "score double, y int")
    return M.auc(df, "score", "y").first()


def test_auc_perfect_separation(spark):
    r = _auc_of(spark, [(0.1, 0), (0.2, 0), (0.3, 1), (0.4, 1)])
    assert r["auc"] == 1.0 and r["n_pos"] == 2 and r["n_neg"] == 2


def test_auc_reversed_is_zero(spark):
    r = _auc_of(spark, [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)])
    assert r["auc"] == 0.0


def test_auc_all_tied_is_half(spark):
    r = _auc_of(spark, [(0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)])
    assert r["auc"] == 0.5


def test_auc_hand_computed_mixed_case(spark):
    # positives {2,4,5}, negatives {1,3}: 5 of 6 pairs correctly ordered
    r = _auc_of(spark, [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1), (5.0, 1)])
    assert r["auc"] == pytest.approx(5 / 6, abs=1e-6)


def test_auc_partition_order_invariant(spark):
    rows = [(float(i % 7) / 7.0, 1 if i % 3 == 0 else 0) for i in range(200)]
    a = _auc_of(spark, rows)["auc"]
    df = spark.createDataFrame(rows, "score double, y int").repartition(13)
    b = M.auc(df, "score", "y").first()["auc"]
    assert a == b


def test_auc_degenerate_single_class_is_null(spark):
    # All-positive / all-negative splits have no defined ROC: auc must come
    # back NULL (not crash, not divide by zero).
    r = _auc_of(spark, [(0.1, 1), (0.2, 1), (0.3, 1)])
    assert r["auc"] is None and r["n_pos"] == 3 and r["n_neg"] == 0
    r = _auc_of(spark, [(0.1, 0), (0.2, 0)])
    assert r["auc"] is None and r["n_pos"] == 0 and r["n_neg"] == 2


def test_auc_adaptive_dispatch(spark):
    # Above the distinct-score threshold the cumulative count MUST come from
    # the range-partitioned prefix sum (never an unpartitioned window over a
    # big table); below it, the cheap single-window path runs and the
    # machinery is skipped. Both paths must agree numerically.
    rows = [(float(i % 97), i % 2) for i in range(500)]
    df = spark.createDataFrame(rows, "score double, y int")
    captured = {}
    import ds_ga1004_bigdata_project_spark.operators.ranks as R
    orig = R.global_prefix_sum

    def spy(*a, **k):
        captured["called"] = captured.get("called", 0) + 1
        return orig(*a, **k)

    R.global_prefix_sum = spy
    try:
        big = M.auc(df, "score", "y", small_distinct_max=10).first()
        assert captured.get("called") == 1, \
            "large-cardinality auc no longer uses the scalable prefix-sum path"
        small = M.auc(df, "score", "y").first()
        assert captured.get("called") == 1, \
            "small-cardinality auc should skip the range-sort machinery"
    finally:
        R.global_prefix_sum = orig
    assert big["auc"] == small["auc"]
    assert (big["n_pos"], big["n_neg"]) == (small["n_pos"], small["n_neg"])


def test_quality_classifier_learns_and_is_deterministic(spark):
    docs = Catalog(spark, SF_SMOKE).documents
    qm1 = Q.train_quality_classifier(docs)
    auc1, n_pos, n_neg = qm1.train_auc_row
    # token count correlates with char length -> model must separate well
    assert auc1 > 0.8
    assert n_pos > 0 and n_neg > 0
    qm2 = Q.train_quality_classifier(docs)
    assert qm2.train_auc_row == qm1.train_auc_row  # seeded + hash split

    scored = Q.score_corpus(qm1, docs)
    stats = scored.agg({"quality_score": "min"}).first()[0]
    assert 0.0 <= stats <= 1.0
    assert scored.count() == docs.count()


def test_quality_classifier_shared_features_identical(spark):
    # Featurize-once path (train + score share one persisted table) must be
    # numerically identical to the featurize-twice path.
    docs = Catalog(spark, SF_SMOKE).documents
    qm_twice = Q.train_quality_classifier(docs)
    feats = Q.featurize(docs).persist()
    try:
        qm_once = Q.train_quality_classifier(docs, features=feats)
        assert qm_once.train_auc_row == qm_twice.train_auc_row
        a = {tuple(r) for r in Q.score_corpus(qm_once, docs,
                                              features=feats).collect()}
        b = {tuple(r) for r in Q.score_corpus(qm_twice, docs).collect()}
        assert a == b
    finally:
        feats.unpersist()


def test_auc_empty_input_is_null_not_crash(spark):
    df = spark.createDataFrame([], "score double, y int")
    r = M.auc(df, "score", "y").first()
    assert r["auc"] is None and r["n_pos"] == 0 and r["n_neg"] == 0
