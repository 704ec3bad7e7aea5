"""Sampling operators: seed determinism + stratification invariants (R1-R4;
not oracle-expressible, so the correctness story lives here)."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.operators import sampling as S
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_ORACLE


def test_bernoulli_seed_determinism(spark):
    li = Catalog(spark, SF_ORACLE).lineitem
    a = S.bernoulli_sample(li, 0.1, seed=66).count()
    b = S.bernoulli_sample(li, 0.1, seed=66).count()
    c = S.bernoulli_sample(li, 0.1, seed=67).count()
    assert a == b
    assert a != c  # different seed → different sample (overwhelmingly)
    n = li.count()
    assert 0.07 * n < a < 0.13 * n  # fraction roughly honored


def test_stratified_sample_keeps_whole_groups(spark):
    li = Catalog(spark, SF_ORACLE).lineitem
    sampled = S.stratified_key_sample(li, ["l_orderkey"], 0.2, seed=42)
    # every sampled order keeps ALL its lineitems (group-atomic sampling)
    full = li.groupBy("l_orderkey").count().withColumnRenamed("count", "n_full")
    got = sampled.groupBy("l_orderkey").count().withColumnRenamed("count", "n_got")
    mismatched = got.join(full, "l_orderkey") \
        .filter("n_got <> n_full").count()
    assert mismatched == 0


def test_hash_sample_engine_independent_and_stable(spark):
    ev = Catalog(spark, SF_ORACLE).events
    a = sorted(r["event_id"] for r in
               S.deterministic_hash_sample(ev, ["event_id"], 0.2).select("event_id").collect())
    b = sorted(r["event_id"] for r in
               S.deterministic_hash_sample(ev, ["event_id"], 0.2).select("event_id").collect())
    assert a == b and len(a) > 0
    # content-determined: repartitioning must not change membership
    c = sorted(r["event_id"] for r in
               S.deterministic_hash_sample(ev.repartition(13), ["event_id"], 0.2)
               .select("event_id").collect())
    assert a == c


def test_modulo_sample_matches_duckdb_oracle(spark):
    # The cross-engine sampling contract, certified directly: DuckDB running
    # the same integer arithmetic must keep the IDENTICAL key set.
    import duckdb

    from .conftest import SF_ORACLE as SF

    ev = Catalog(spark, SF).events
    got = sorted(r["event_id"] for r in
                 S.modulo_sample(ev, "event_id", 0.2).select("event_id").collect())
    want = [r[0] for r in duckdb.sql(f"""
        SELECT event_id FROM read_parquet('{SF}/events.parquet')
        WHERE ((event_id % 2147483648) * 2654435761 + 42) % 1000000 < 200000
        ORDER BY event_id
    """).fetchall()]
    assert got == want and len(got) > 0
    frac = len(got) / ev.count()
    assert 0.15 < frac < 0.25  # multiplicative hash tracks the target rate
