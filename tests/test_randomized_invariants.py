"""Seeded-random adversarial sweeps for the round-6 operators: bloom join
exactness on hostile key domains, SCD2 invariants under random batch
sequences, and the CMS bucket convention on fuzzed unicode tokens."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators import bloom, sketches
from ds_ga1004_bigdata_project_spark.operators import relational as rel


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bloom_joins_exact_on_hostile_keys(spark, seed):
    """Random key domains mixing negatives, INT64 extremes, and dense
    collision-prone ranges; tiny bitset to force heavy false positives.
    Both bloom joins must still equal their plain twins exactly."""
    rng = random.Random(seed)
    pool = ([rng.randint(-2**62, 2**62) for _ in range(300)]
            + [rng.randint(-50, 50) for _ in range(300)]
            + [2**63 - 1, -2**63, 0, -1, 1])
    probe_keys = [rng.choice(pool) for _ in range(800)]
    build_keys = [rng.choice(pool) for _ in range(120)]
    probe = spark.createDataFrame([(k, i) for i, k in enumerate(probe_keys)],
                                  "k long, payload long")
    build = spark.createDataFrame([(k,) for k in build_keys], "bk long")
    keys = build.select(F.col("bk").alias("k")).distinct()

    want_semi = rel.semi_join(probe, keys, "k")
    got_semi = bloom.bloom_semi_join(probe, build, "k", "bk", num_bits=256)
    assert got_semi.exceptAll(want_semi).count() == 0
    assert want_semi.exceptAll(got_semi).count() == 0

    want_anti = rel.anti_join(probe, keys, "k")
    got_anti = bloom.bloom_anti_join(probe, build, "k", "bk", num_bits=256)
    assert got_anti.exceptAll(want_anti).count() == 0
    assert want_anti.exceptAll(got_anti).count() == 0


@pytest.mark.parametrize("seed", [0, 1])
def test_scd2_invariants_under_random_batches(spark, seed):
    """Apply 3 random update batches; for every key: exactly one open
    version, closed intervals abut with no gaps or overlaps, and version
    count = 1 + number of batches that touched the key."""
    rng = random.Random(seed)
    keys = list(range(12))
    dim = spark.createDataFrame([(k, "v0") for k in keys], "k int, seg string")
    dates = ["2024-02-01", "2024-05-01", "2024-08-01"]
    touched = {k: 0 for k in keys}
    v = None
    for i, d in enumerate(dates):
        batch_keys = rng.sample(keys, rng.randint(1, 8))
        upd = spark.createDataFrame([(k, f"v{i + 1}") for k in batch_keys],
                                    "k int, seg string")
        v = (rel.scd2_apply(dim, upd, "k", d) if v is None
             else rel.scd2_apply_incremental(v, upd, "k", d))
        for k in batch_keys:
            touched[k] += 1

    rows = v.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, versions in by_key.items():
        assert len(versions) == 1 + touched[k], k
        opens = [r for r in versions if r["is_current"]]
        assert len(opens) == 1 and opens[0]["valid_to"] is None, k
        ordered = sorted(versions, key=lambda r: str(r["valid_from"]))
        for a, b in zip(ordered, ordered[1:]):
            assert str(a["valid_to"]) == str(b["valid_from"]), (k, a, b)


def test_cms_bucket_twin_on_fuzzed_tokens(spark):
    """Unicode/control/quote-laden tokens must bucket identically on both
    engines — the md5-nibble convention has no token-content assumptions."""
    rng = random.Random(7)
    alphabet = "ab01 \t'\"\\%_éß日本語🚀\u0000replace"
    words = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
             for _ in range(40)]
    words = [w.replace("\u0000", "n") for w in words]  # parquet-safe
    df = spark.createDataFrame([(w,) for w in set(words)], "token string")
    got = {r["token"]: r["b"] for r in df.select(
        "token", sketches._bucket(F.col("token"), 2, 64).alias("b")).collect()}
    con = duckdb.connect()
    for w, b in got.items():
        sql = sketches._bucket_sql("$tok", 2, 64)
        want = con.execute(f"SELECT {sql} AS b", {"tok": w}).fetchone()[0]
        assert b == want, repr(w)


# ---------------------------------------------------------------------------
# Round-6 third-wave operators: partition-invariance + adversarial inputs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1])
def test_editdist_pairs_invariant_to_partitioning(spark, seed):
    """The pair set is a pure function of content — repartitioning the
    corpus must not change it (shuffle-order independence)."""
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        editdist_blocked_pairs)

    rng = random.Random(40_000 + seed)
    vocab = ["alpha", "beta", "gamma", "delta", "x"]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randint(3, 8))))
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(df):
        return sorted(tuple(r) for r in editdist_blocked_pairs(
            df, block_len=6, prefix_len=30, max_dist=6).collect())

    assert pairs(docs) == pairs(docs.repartition(7)) \
        == pairs(docs.repartition(1))


@pytest.mark.parametrize("seed", [0, 1])
def test_pagerank_invariant_to_partitioning_and_edge_order(spark, seed):
    """Ranks (rounded at the oracle's 1e-6 discipline) must not depend on
    edge-list partitioning or row order."""
    from ds_ga1004_bigdata_project_spark.operators.graph import pagerank

    rng = random.Random(41_000 + seed)
    n = 40
    und = {(a, b) for a in range(n) for b in range(a + 1, n)
           if rng.random() < 0.15}
    e = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    # isolated nodes would be dangling; the symmetric construction has none
    edges = spark.createDataFrame(e, "src long, dst long")

    def ranks(df):
        return {r["node"]: round(r["rank"], 6)
                for r in pagerank(df, iters=2).collect()}

    shuffled = spark.createDataFrame(
        sorted(e, key=lambda t: (t[1], t[0])), "src long, dst long")
    assert ranks(edges) == ranks(edges.repartition(9)) == ranks(shuffled)


@pytest.mark.parametrize("seed", [0, 1])
def test_k_anonymize_release_is_idempotent_and_partition_invariant(
        spark, seed):
    """Releasing an already-released corpus changes nothing (groups only
    ever shrink by suppression, never below k), and the released id set
    is partition-independent."""
    from ds_ga1004_bigdata_project_spark.operators.privacy import k_anonymize

    rng = random.Random(42_000 + seed)
    segs, geos = ["A", "B", "C", None], ["de", "fr", None]
    rows = [(rng.choice(segs), rng.choice(geos), i) for i in range(200)]
    df = spark.createDataFrame(rows, "seg string, geo string, id int")

    def ids(frame):
        return sorted(r["id"] for r in frame.collect())

    once = k_anonymize(df, ["seg", "geo"], k=7)
    assert ids(k_anonymize(once, ["seg", "geo"], k=7)) == ids(once)
    assert ids(k_anonymize(df.repartition(11), ["seg", "geo"], k=7)) \
        == ids(once)
