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
