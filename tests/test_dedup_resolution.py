"""Keep-list resolution: min-label propagation over near-dup pairs must
produce exactly one survivor per connected cluster, including chains longer
than one hop (a~b, b~c ⇒ one survivor for {a,b,c} even if a≁c directly)."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.operators.dedup import (
    dedup_corpus,
    resolve_keep_list,
)


def test_chain_collapses_to_one_survivor(spark):
    ids = spark.createDataFrame([(i,) for i in range(10)], "id long")
    # chain 0-1-2-3-4 plus pair 7-8; 5,6,9 isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (7, 8)], "a long, b long")
    labels = {r["id"]: r["keep_id"] for r in resolve_keep_list(ids, pairs).collect()}
    assert labels == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
                      5: 5, 6: 6, 7: 7, 8: 7, 9: 9}


def test_dedup_corpus_keeps_min_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (4, 5)], "a long, b long")
    cleaned = dedup_corpus(docs, pairs)
    assert sorted(r["doc_id"] for r in cleaned.collect()) == [0, 1, 3, 4]
