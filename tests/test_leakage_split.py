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


@pytest.fixture(scope="module")
def boiler_corpus(spark):
    """Corpus for the stop-list trade (VERDICT r9 #5): every doc carries
    the same boilerplate header (its shingles hit every doc, df = corpus
    size), but every true near-dup pair ALSO shares a rare body. Two
    extra docs (98, 99) share ONLY the boilerplate — the one pair the
    documented recall trade is allowed to drop."""
    boiler = " ".join(f"lic{i}" for i in range(12))     # 10 shingles, df=n
    bodies = [" ".join(f"b{k}t{j}" for j in range(25)) for k in range(8)]
    rows = []
    did = 0
    for k, body in enumerate(bodies):                   # 8 dup pairs
        for _ in range(2):
            rows.append((did, boiler + " " + body)); did += 1
    for i in range(30):                                 # singletons
        rows.append((did, boiler + " " +
                     " ".join(f"s{i}x{j}" for j in range(25)))); did += 1
    rows.append((98, boiler))                           # boiler-only pair
    rows.append((99, boiler))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stoplist_leaves_split_assignments_unchanged(spark, boiler_corpus):
    # VERDICT r9 #5: with the cap sized above every RARE shared shingle's
    # df (but far below the boilerplate's), candidate pruning drops only
    # postings — every true pair still meets on its body shingles, so the
    # whole (doc_id, cluster_id, split) relation is IDENTICAL. This is
    # the invariant that lets a cluster operator engage the valve without
    # re-validating the split.
    full = {(r.doc_id, r.cluster_id, r.split)
            for r in leakage_safe_split(boiler_corpus).collect()
            if r.doc_id not in (98, 99)}
    capped = {(r.doc_id, r.cluster_id, r.split)
              for r in leakage_safe_split(
                  boiler_corpus, max_doc_freq=8).collect()
              if r.doc_id not in (98, 99)}
    assert capped == full


def test_stoplist_recall_trade_is_exactly_the_documented_one(spark,
                                                             boiler_corpus):
    # The ONLY pair the cap may sever is one sharing nothing but
    # stop-listed shingles (98, 99 here): uncapped they cluster together;
    # capped they fall back to singletons. Nothing else moves.
    full = {r.doc_id: r.cluster_id
            for r in leakage_safe_split(boiler_corpus).collect()}
    capped = {r.doc_id: r.cluster_id
              for r in leakage_safe_split(
                  boiler_corpus, max_doc_freq=8).collect()}
    assert full[98] == full[99]               # uncapped: one cluster
    assert capped[98] == 98 and capped[99] == 99   # capped: severed
    changed = {d for d in full if capped[d] != full[d]}
    assert changed == {99} or changed == {98, 99} or changed == {98}
