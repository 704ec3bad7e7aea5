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


def test_driver_and_distributed_tiers_agree(spark):
    # The adaptive small-edge tier (driver union-find) and the distributed
    # min-label propagation must produce identical keep lists on a graph
    # with chains, a clique, cross-links, and isolated nodes.
    import random

    rng = random.Random(7)
    n = 200
    edges = set()
    # random clusters of varying shapes
    for _ in range(60):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame(sorted(edges), "a long, b long")
    small = {r["id"]: r["keep_id"] for r in
             resolve_keep_list(ids, pairs, driver_edge_max=10**6).collect()}
    dist = {r["id"]: r["keep_id"] for r in
            resolve_keep_list(ids, pairs, driver_edge_max=0).collect()}
    assert small == dist
    # survivors are component minima: every keep_id maps to itself
    assert all(small[k] == k for k in set(small.values()))


def test_driver_tier_empty_edges(spark):
    ids = spark.createDataFrame([(i,) for i in range(5)], "id long")
    pairs = spark.createDataFrame([], "a long, b long")
    out = {r["id"]: (r["keep_id"], r["is_kept"])
           for r in resolve_keep_list(ids, pairs).collect()}
    assert out == {i: (i, True) for i in range(5)}


def test_overlap_broadcast_and_index_plans_agree(spark):
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        cross_split_ngram_overlap)
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    docs = Catalog(spark, SF_SMOKE).documents
    a = {r["doc_id"]: r["n_shared_ngrams"] for r in cross_split_ngram_overlap(
        docs, ["src0", "src1"], n=5, broadcast_eval=True).collect()}
    b = {r["doc_id"]: r["n_shared_ngrams"] for r in cross_split_ngram_overlap(
        docs, ["src0", "src1"], n=5, broadcast_eval=False).collect()}
    assert a == b and len(a) > 0


def test_minhash_banded_pairs_finds_planted_dups(spark):
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        minhash_banded_pairs)

    base = " ".join(f"w{i}" for i in range(60))
    mutated = " ".join(f"w{i}" for i in range(58)) + " x1 x2"  # ~high overlap
    distinct = " ".join(f"z{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, mutated), (3, distinct)],
        "doc_id long, text string")
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in minhash_banded_pairs(docs, n=5, min_jaccard=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert all(3 not in p for p in pairs)  # the distinct doc never pairs

    # jaccard must equal the hand-computed STRING-shingle jaccard (the
    # int64-hashed set representation is an implementation detail)
    def sh(text, n=5):
        t = text.split()
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

    if (0, 2) in pairs:
        a, b = sh(base), sh(mutated)
        expect = round(len(a & b) / len(a | b), 6)
        assert pairs[(0, 2)] == expect


def test_minhash_hot_bucket_join_path_matches_inrow_path(spark, monkeypatch):
    # ADVICE r7 (dedup.py bucket blast radius): buckets above
    # _LSH_BUCKET_EXPAND_MAX must pair via the streamed within-bucket
    # self-join, and that path must produce EXACTLY the same verified pair
    # set as the in-row expansion (no silent candidate drop). Force every
    # bucket onto the hot path by shrinking the cap to 1 and compare.
    from ds_ga1004_bigdata_project_spark.operators import dedup as D

    # tiny vocabulary -> many docs collide into the same LSH buckets
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % 7}" for j in range(i % 4, i % 4 + 40)))
         for i in range(24)],
        "doc_id long, text string")

    def run():
        return {(r["a"], r["b"]): r["jaccard"]
                for r in D.minhash_banded_pairs(docs, n=3).collect()}

    baseline = run()
    monkeypatch.setattr(D, "_LSH_BUCKET_EXPAND_MAX", 1)
    hot = run()
    assert baseline == hot
    assert baseline  # the fixture really does produce candidate pairs


def test_resolve_iterate_runs_even_with_max_iters_one(spark):
    # ADVICE r7 (dedup.py resolve_keep_list): nonconverged='iterate' with
    # max_iters <= 1 used to skip the propagation loop entirely (changed
    # stayed None) and return seeded-init labels — split components on any
    # graph with diameter > 1. The chain 0-1-2-3-4-5 needs several
    # propagation rounds past the seeded init; 'iterate' must deliver the
    # exact component minimum regardless of max_iters. driver_edge_max=0
    # forces the distributed tier (the driver tier is exact by nature).
    ids = spark.createDataFrame([(i,) for i in range(8)], "id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "a long, b long")
    labels = {r["id"]: r["keep_id"] for r in
              resolve_keep_list(ids, chain, max_iters=1, driver_edge_max=0,
                                nonconverged="iterate").collect()}
    assert labels == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 6: 6, 7: 7}


def test_resolve_keeps_caller_cache_alive(spark):
    # Cache-ownership regression (round 8): resolve_keep_list used to
    # persist `pairs.select("a","b")` — a TRIVIAL projection of an
    # (a,b)-only caller-persisted frame — and its unpersist evicted the
    # caller's cache entry too, so every later plan over the caller's
    # handle silently recomputed upstream. A caller-owned cache must
    # survive resolution and still substitute into downstream plans.
    edges = spark.createDataFrame([(0, 1), (2, 3)], "a long, b long")
    # route through a non-trivial upstream so recompute would be visible
    pairs = edges.filter("a >= 0").persist()
    pairs.count()
    ids = spark.createDataFrame([(i,) for i in range(4)], "id long")
    try:
        resolve_keep_list(ids, pairs).collect()
        assert pairs.storageLevel.useMemory or pairs.storageLevel.useDisk
        plan = (pairs.select("a")._jdf.queryExecution()
                .executedPlan().toString())
        assert "InMemoryTableScan" in plan, \
            "caller cache no longer substitutes after resolve_keep_list"
    finally:
        pairs.unpersist()


def test_incremental_ingest_dedup_semantics(spark):
    """Hand-built fixture: batch doc dropped if its fingerprint is in the
    index; within-batch dups resolve to min id; order/repetition-invariant
    fingerprints (bag-of-words canonical) count as duplicates."""
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        fingerprint_dedup, incremental_ingest_dedup)

    ingested = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string")
    index = fingerprint_dedup(ingested).select("fingerprint")
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma"),      # exact dup of indexed -> dropped
         (11, "gamma beta alpha"),      # reordered dup of indexed -> dropped
         (12, "delta epsilon"),         # new -> kept
         (13, "epsilon delta delta"),   # bag-dup of 12 -> loses to min id
         (14, "zeta")],                 # new -> kept
        "doc_id long, text string")
    out = incremental_ingest_dedup(batch, index)
    assert sorted(r["doc_id"] for r in out.collect()) == [12, 14]
