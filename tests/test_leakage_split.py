"""Round-8 leakage-safe corpus split (dedup.leakage_safe_split): near-dup
clusters — not documents — are the unit of train/val/test assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators.dedup import leakage_safe_split


@pytest.fixture(scope="module")
def corpus(spark):
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    rows = [(1, base), (2, base), (3, near)]          # one 3-doc cluster
    rows += [(10 + i, f"unique doc {i} " + " ".join(f"u{i}x{j}" for j in range(30)))
             for i in range(40)]                       # 40 singletons
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_every_doc_assigned_exactly_once(spark, corpus):
    out = leakage_safe_split(corpus)
    assert out.count() == corpus.count()
    assert out.select("doc_id").distinct().count() == corpus.count()
    assert out.filter(F.col("split").isin("train", "val", "test")).count() \
        == corpus.count()


def test_near_dups_never_straddle_splits(spark, corpus):
    rows = {r.doc_id: r for r in leakage_safe_split(corpus).collect()}
    # docs 1,2 exact dups and 3 a near-dup: one cluster, one split
    assert rows[1].cluster_id == rows[2].cluster_id == rows[3].cluster_id == 1
    assert rows[1].split == rows[2].split == rows[3].split


def test_singletons_keep_own_id(spark, corpus):
    rows = leakage_safe_split(corpus).filter(F.col("doc_id") >= 10).collect()
    assert all(r.cluster_id == r.doc_id for r in rows)


def test_split_is_function_of_cluster_hash_only(spark, corpus):
    # Re-running on a reordered/repartitioned input gives identical
    # assignments — the split derives from the cluster id alone.
    a = {(r.doc_id, r.split)
         for r in leakage_safe_split(corpus).collect()}
    b = {(r.doc_id, r.split)
         for r in leakage_safe_split(
             corpus.repartition(7).orderBy(F.desc("doc_id"))).collect()}
    assert a == b


def test_fractions_move_thresholds(spark, corpus):
    # With fractions (1.0, 0.0) everything is train.
    out = leakage_safe_split(corpus, fractions=(1.0, 0.0))
    assert out.filter(F.col("split") != "train").count() == 0
