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
    pred = S.modulo_sample_predicate_sql("event_id", 0.2)
    want = [r[0] for r in duckdb.sql(f"""
        SELECT event_id FROM read_parquet('{SF}/events.parquet')
        WHERE {pred} ORDER BY event_id
    """).fetchall()]
    assert got == want and len(got) > 0
    frac = len(got) / ev.count()
    assert 0.15 < frac < 0.25  # multiplicative hash tracks the target rate


def test_modulo_sample_negative_keys_cross_engine(spark):
    # Spark pmod is non-negative, DuckDB % keeps the dividend's sign — the
    # explicit canonicalization must make NEGATIVE keys agree too.
    import duckdb

    keys = list(range(-500, 500, 7))
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = sorted(r["k"] for r in S.modulo_sample(df, "k", 0.3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?::BIGINT[]) AS k", [keys])
    pred = S.modulo_sample_predicate_sql("k", 0.3)
    want = sorted(r[0] for r in
                  con.execute(f"SELECT k FROM t WHERE {pred}").fetchall())
    assert got == want and len(got) > 0


def test_modulo_sample_no_million_periodicity(spark):
    # r3 ADVICE: without high-bit mixing, keys exactly 1e6 apart were always
    # co-sampled. The div-2^16 step must break that lockstep.
    pairs = [(k, k + 1_000_000) for k in range(0, 200_000_000, 9_999_937)]
    flat = [(k,) for p in pairs for k in p]
    df = spark.createDataFrame(flat, "k bigint")
    kept = {r["k"] for r in S.modulo_sample(df, "k", 0.3).collect()}
    disagree = sum((a in kept) != (b in kept) for a, b in pairs)
    assert disagree > 0, "keys 1e6 apart still co-sample in lockstep"


def test_shard_assign_matches_duckdb_and_is_uniform(spark):
    import duckdb

    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        shard_assign, shard_assign_sql)

    df = spark.range(-500, 10_000).withColumnRenamed("id", "k")
    got = {r["k"]: r["shard"]
           for r in shard_assign(df, "k", 16).collect()}
    con = duckdb.connect()
    want = dict(con.execute(
        f"SELECT k, {shard_assign_sql('k', 16)} AS s "
        "FROM (SELECT unnest(range(-500, 10000)) AS k)").fetchall())
    assert got == want
    # rough uniformity: every shard within 2x of the mean occupancy
    from collections import Counter
    occ = Counter(got.values())
    assert len(occ) == 16
    mean = len(got) / 16
    assert all(0.5 * mean < c < 2 * mean for c in occ.values()), occ


def test_per_group_quota_deterministic_and_exact(spark):
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        per_group_quota_sample)

    df = spark.createDataFrame(
        [(i % 7, i) for i in range(1000)], "grp int, k long")
    a = sorted((r["grp"], r["k"])
               for r in per_group_quota_sample(df, "grp", "k", 3).collect())
    b = sorted((r["grp"], r["k"])
               for r in per_group_quota_sample(
                   df.repartition(13), "grp", "k", 3).collect())
    assert a == b, "keep-set must not depend on partitioning"
    from collections import Counter
    assert all(c == 3 for c in Counter(g for g, _ in a).values())


def test_write_training_shards_layout(spark, tmp_path):
    import os

    from ds_ga1004_bigdata_project_spark.sources.catalog import (
        write_training_shards)

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = str(tmp_path / "shards")
    write_training_shards(df, out, "doc_id", 8)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(8)]
    back = spark.read.parquet(out)
    assert back.count() == 2000
    # partition pruning: reading one shard touches one directory
    one = spark.read.parquet(out).filter("shard = 3")
    assert 0 < one.count() < 2000


def test_mixture_sample_matches_duckdb_and_respects_rates(spark):
    import duckdb

    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        mixture_sample, mixture_sample_predicate_sql)

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(9000)]
    df = spark.createDataFrame(rows, "k long, src string")
    fr = {"a": 1.0, "b": 0.25}
    got = sorted(r["k"] for r in mixture_sample(df, "src", "k", fr,
                                                default=0.0).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, src VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = mixture_sample_predicate_sql("src", "k", fr, default=0.0)
    want = sorted(r[0] for r in con.execute(
        f"SELECT k FROM t WHERE {pred}").fetchall())
    assert got == want
    # per-source realized rates near nominal; 'c' fully dropped
    kept_src = {k % 3 for k in got}
    assert 2 not in kept_src
    n_a = sum(1 for k in got if k % 3 == 0)
    n_b = sum(1 for k in got if k % 3 == 1)
    assert n_a == 3000                      # rate 1.0 keeps everything
    assert 0.15 * 3000 < n_b < 0.35 * 3000  # rate 0.25 ± tolerance


def test_mixture_sql_escapes_quoted_source_names(spark):
    """A source name containing a single quote must produce a well-formed,
    correctly-matching DuckDB predicate (r5 ADVICE: quote escaping)."""
    import duckdb

    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        mixture_sample, mixture_sample_predicate_sql)

    rows = [(i, ["o'reilly", "plain"][i % 2]) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, src string")
    fr = {"o'reilly": 0.5, "plain": 0.1}
    got = sorted(r["k"] for r in mixture_sample(df, "src", "k", fr).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, src VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = mixture_sample_predicate_sql("src", "k", fr)
    want = sorted(r[0] for r in con.execute(
        f"SELECT k FROM t WHERE {pred}").fetchall())
    assert got == want and len(got) > 0


def test_weighted_bernoulli_matches_duckdb_and_tracks_weight(spark):
    """Per-row weighted Bernoulli: exact cross-engine keep-set via the SQL
    twin, realized rates tracking the row weights, clamping outside [0,1]."""
    import duckdb

    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        weighted_bernoulli_sample, weighted_bernoulli_predicate_sql)

    # weights 0.0/0.25/0.75/1.3(→1.0) cycling by k
    rows = [(i, [0.0, 0.25, 0.75, 1.3][i % 4]) for i in range(8000)]
    df = spark.createDataFrame(rows, "k long, w double")
    got = sorted(r["k"] for r in
                 weighted_bernoulli_sample(df, "k", "w").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = weighted_bernoulli_predicate_sql("k", "w")
    want = sorted(r[0] for r in con.execute(
        f"SELECT k FROM t WHERE {pred}").fetchall())
    assert got == want and len(got) > 0
    by_w = {0: 0, 1: 0, 2: 0, 3: 0}
    for k in got:
        by_w[k % 4] += 1
    assert by_w[0] == 0                      # weight 0 drops everything
    assert by_w[3] == 2000                   # clamped weight 1 keeps all
    assert 0.15 * 2000 < by_w[1] < 0.35 * 2000
    assert 0.65 * 2000 < by_w[2] < 0.85 * 2000


def test_per_group_quota_is_scrambled_not_key_monotone(spark):
    """Regression for the raw-hash ordering defect: _knuth_hash's div-2^16
    keeps the product's monotone high bits, so ordering by it == ordering
    by key and the 'sample' kept each group's smallest ids. The _perm_rank
    order must NOT be the smallest-keys prefix, and must decorrelate
    across salts (different salt -> different keep-set)."""
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        per_group_quota_sample)

    df = spark.createDataFrame([(0, i) for i in range(1000)],
                               "grp int, k long")
    kept = sorted(r["k"] for r in
                  per_group_quota_sample(df, "grp", "k", 10).collect())
    assert kept != list(range(10)), "quota sample degenerated to min-keys"
    other = sorted(r["k"] for r in
                   per_group_quota_sample(df, "grp", "k", 10,
                                          salt=43).collect())
    assert kept != other, "salt must change the keep-set"


def test_temperature_mixture_plan_hand_values(spark):
    import math

    import pytest

    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        temperature_mixture_plan)

    df = spark.createDataFrame(
        [("a", 1000), ("a", 1000), ("b", 125)], "source string, n int")
    out = {r["source"]: r for r in temperature_mixture_plan(
        df, tokens_col="n", tau=0.5, budget=1000).collect()}
    # n_a=2000, n_b=125; p = round(sqrt(n), 4) -> 44.7214, 11.1803
    pa, pb = round(math.sqrt(2000), 4), round(math.sqrt(125), 4)
    wa = round(pa / (pa + pb), 6)
    wb = round(pb / (pa + pb), 6)
    assert out["a"]["weight"] == pytest.approx(wa, abs=0)
    assert out["b"]["weight"] == pytest.approx(wb, abs=0)
    assert out["a"]["planned_tokens_per_epoch"] == math.floor(wa * 1000.0)
    assert out["b"]["epochs_to_exhaust"] == pytest.approx(
        round(125 / math.floor(wb * 1000.0), 2), abs=0)
    # tau<1 up-weights the small source relative to proportional share
    assert wb > 125 / 2125


def test_temperature_mixture_tau_one_is_proportional(spark):
    import pytest

    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        temperature_mixture_plan)

    df = spark.createDataFrame(
        [("a", 3000), ("b", 1000)], "source string, n int")
    out = {r["source"]: r["weight"] for r in temperature_mixture_plan(
        df, tokens_col="n", tau=1.0, budget=100).collect()}
    assert out["a"] == pytest.approx(0.75, abs=1e-6)
    assert out["b"] == pytest.approx(0.25, abs=1e-6)
