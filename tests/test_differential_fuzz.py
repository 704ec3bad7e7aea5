"""Differential fuzzing: seeded random filter/group-by/aggregate specs are
compiled from ONE abstract spec into BOTH a Spark DataFrame plan and a
DuckDB SQL string, then executed side-by-side on the same parquet.

This extends the fixed oracle suite with generative coverage of the
relational core: the fixed queries certify the shapes we thought of; the
fuzzer sweeps the combinatorial space of predicate × grouping × aggregate
combinations we didn't. Seeded (not hypothesis-driven) so failures are
reproducible by seed number and CI time is bounded.

Float discipline mirrors the registry rules: sums go through DECIMAL casts
on both engines, min/max compare the same stored doubles, count/distinct
are exact integers.
"""

from __future__ import annotations

import datetime
import random

import duckdb
import pytest

from pyspark.sql import functions as F

from .conftest import SF_SMOKE

# --------------------------------------------------------------- spec atoms

_FLAGS = ("A", "N", "R")
_STATUS = ("O", "F")


def _gen_spec(rng: random.Random) -> dict:
    filters = []
    for _ in range(rng.randint(0, 3)):
        kind = rng.choice(("qty", "disc", "flag", "status", "date", "mod"))
        if kind == "qty":
            filters.append(("qty", rng.randint(1, 49)))
        elif kind == "disc":
            filters.append(("disc", round(rng.randint(0, 10) / 100, 2)))
        elif kind == "flag":
            filters.append(("flag", rng.choice(_FLAGS)))
        elif kind == "status":
            filters.append(("status", rng.choice(_STATUS)))
        elif kind == "date":
            d = datetime.date(1993 + rng.randint(0, 4), rng.randint(1, 12), 1)
            filters.append(("date", d.isoformat()))
        else:
            k = rng.choice((2, 3, 5, 7))
            filters.append(("mod", (k, rng.randrange(k))))
    join_part = rng.random() < 0.4
    key_pool = ["l_returnflag", "l_linestatus", "ship_year"]
    agg_pool = ["n", "sum_qty", "min_price", "max_disc", "nd_part"]
    if join_part:
        key_pool.append("p_brand")
        agg_pool.append("min_retail")
    n_keys = rng.randint(0, 2)
    keys = rng.sample(key_pool, n_keys)
    aggs = rng.sample(agg_pool, rng.randint(1, 4))
    return {"filters": filters, "keys": sorted(keys), "aggs": sorted(aggs),
            "join_part": join_part}


# ------------------------------------------------------------- spark compile

def _spark_query(spark, spec, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    if spec["join_part"]:
        part = spark.read.parquet(f"{sf_dir}/part.parquet")
        df = df.join(F.broadcast(part),
                     df["l_partkey"] == part["p_partkey"])
    for kind, arg in spec["filters"]:
        if kind == "qty":
            df = df.filter(F.col("l_quantity") > arg)
        elif kind == "disc":
            df = df.filter(F.col("l_discount") <= arg)
        elif kind == "flag":
            df = df.filter(F.col("l_returnflag") == arg)
        elif kind == "status":
            df = df.filter(F.col("l_linestatus") == arg)
        elif kind == "date":
            df = df.filter(F.col("l_shipdate")
                           < F.lit(arg).cast("timestamp"))
        else:
            k, r = arg
            df = df.filter(F.pmod(F.col("l_partkey"), F.lit(k)) == r)
    if "ship_year" in spec["keys"]:
        df = df.withColumn("ship_year", F.year("l_shipdate"))
    agg_map = {
        "n": F.count(F.lit(1)).alias("n"),
        "sum_qty": F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"),
            2).alias("sum_qty"),
        "min_price": F.min("l_extendedprice").alias("min_price"),
        "max_disc": F.max("l_discount").alias("max_disc"),
        "nd_part": F.countDistinct("l_partkey").alias("nd_part"),
        "min_retail": F.round(F.min("p_retailprice"), 2).alias("min_retail"),
    }
    aggs = [agg_map[a] for a in spec["aggs"]]
    if spec["keys"]:
        return df.groupBy(*spec["keys"]).agg(*aggs)
    return df.agg(*aggs)


# ------------------------------------------------------------ duckdb compile

def _duck_sql(spec, sf_dir) -> str:
    preds = []
    for kind, arg in spec["filters"]:
        if kind == "qty":
            preds.append(f"l_quantity > {arg}")
        elif kind == "disc":
            preds.append(f"l_discount <= {arg}")
        elif kind == "flag":
            preds.append(f"l_returnflag = '{arg}'")
        elif kind == "status":
            preds.append(f"l_linestatus = '{arg}'")
        elif kind == "date":
            preds.append(f"l_shipdate < TIMESTAMP '{arg} 00:00:00'")
        else:
            k, r = arg
            preds.append(f"l_partkey % {k} = {r}")
    agg_map = {
        "n": "CAST(count(*) AS BIGINT) AS n",
        "sum_qty": ("round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))"
                    " AS DOUBLE), 2) AS sum_qty"),
        "min_price": "min(l_extendedprice) AS min_price",
        "max_disc": "max(l_discount) AS max_disc",
        "nd_part": "CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part",
        "min_retail": "round(min(p_retailprice), 2) AS min_retail",
    }
    sel_keys = [("year(l_shipdate) AS ship_year" if k == "ship_year" else k)
                for k in spec["keys"]]
    select = ", ".join(sel_keys + [agg_map[a] for a in spec["aggs"]])
    src = f"'{sf_dir}/lineitem.parquet'"
    if spec["join_part"]:
        src += (f" JOIN '{sf_dir}/part.parquet'"
                " ON l_partkey = p_partkey")
    sql = f"SELECT {select} FROM {src}"
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if spec["keys"]:
        group = ", ".join("year(l_shipdate)" if k == "ship_year" else k
                          for k in spec["keys"])
        sql += f" GROUP BY {group}"
    return sql


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            return f"{v + 0.0:.10g}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("seed", range(30))
def test_random_spec_matches_duckdb(spark, seed):
    rng = random.Random(10_000 + seed)
    spec = _gen_spec(rng)
    sdf = _spark_query(spark, spec, SF_SMOKE)
    got = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    res = con.execute(_duck_sql(spec, SF_SMOKE))
    exp = _norm([d[0] for d in res.description], res.fetchall())
    assert sorted(sdf.columns) == sorted(d[0] for d in res.description), spec
    assert got == exp, f"spec {spec} diverged: {got[:3]} vs {exp[:3]}"


# ---------------------------------------------------- window-function specs

_WIN_FUNCS = ("row_number", "rank", "dense_rank", "running_sum")


def _gen_window_spec(rng: random.Random) -> dict:
    part = rng.choice((None, "l_returnflag", "l_linestatus"))
    desc = rng.random() < 0.5
    fn = rng.choice(_WIN_FUNCS)
    filters = []
    if rng.random() < 0.5:
        filters.append(("qty", rng.randint(10, 40)))
    return {"part": part, "desc": desc, "fn": fn, "filters": filters}


def _spark_window_query(spark, spec, sf_dir):
    from pyspark.sql import Window

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for kind, arg in spec["filters"]:
        df = df.filter(F.col("l_quantity") > arg)
    # total order: price direction, then the table's unique key — rank/
    # dense_rank/row_number all coincide under a total order, so cross-
    # engine comparison is exact (ties would make row_number legitimately
    # engine-dependent; the registry pins the same discipline).
    price = F.col("l_extendedprice")
    keys = [price.desc() if spec["desc"] else price.asc(),
            F.col("l_orderkey").asc(), F.col("l_linenumber").asc()]
    w = Window.partitionBy(*( [spec["part"]] if spec["part"] else [] )) \
        .orderBy(*keys)
    if spec["fn"] == "row_number":
        val = F.row_number().over(w).cast("long")
    elif spec["fn"] == "rank":
        val = F.rank().over(w).cast("long")
    elif spec["fn"] == "dense_rank":
        val = F.dense_rank().over(w).cast("long")
    else:
        val = F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                      .over(w.rowsBetween(Window.unboundedPreceding, 0))
                      .cast("double"), 2)
    return df.select("l_orderkey", "l_linenumber", val.alias("wval"))


def _duck_window_sql(spec, sf_dir) -> str:
    d = "DESC" if spec["desc"] else "ASC"
    order = (f"l_extendedprice {d}, l_orderkey ASC, l_linenumber ASC")
    over = (f"PARTITION BY {spec['part']} " if spec["part"] else "") \
        + f"ORDER BY {order}"
    if spec["fn"] == "running_sum":
        expr = (f"round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))"
                f" OVER ({over} ROWS BETWEEN UNBOUNDED PRECEDING AND"
                f" CURRENT ROW) AS DOUBLE), 2)")
    else:
        expr = f"CAST({spec['fn']}() OVER ({over}) AS BIGINT)"
    sql = (f"SELECT l_orderkey, l_linenumber, {expr} AS wval"
           f" FROM '{sf_dir}/lineitem.parquet'")
    if spec["filters"]:
        sql += " WHERE " + " AND ".join(
            f"l_quantity > {arg}" for _, arg in spec["filters"])
    return sql


@pytest.mark.parametrize("seed", range(15))
def test_random_window_spec_matches_duckdb(spark, seed):
    rng = random.Random(20_000 + seed)
    spec = _gen_window_spec(rng)
    sdf = _spark_window_query(spark, spec, SF_SMOKE)
    got = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    res = con.execute(_duck_window_sql(spec, SF_SMOKE))
    exp = _norm([d[0] for d in res.description], res.fetchall())
    assert got == exp, f"window spec {spec} diverged"


# ------------------------------------------- set ops / having / ordered topN

def test_setop_specs_match_duckdb(spark):
    """Distinct set semantics (UNION/EXCEPT/INTERSECT) over two filtered
    key projections — Spark's union() is ALL, so the distinct discipline
    (union().distinct() / subtract() / intersect()) must line up with the
    SQL operators exactly."""
    rng = random.Random(31_000)
    con = duckdb.connect()
    src = f"'{SF_SMOKE}/lineitem.parquet'"
    for _ in range(8):
        a_q, b_q = rng.randint(10, 40), rng.randint(10, 40)
        op = rng.choice(("union", "except", "intersect"))
        df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        a = df.filter(F.col("l_quantity") > a_q).select("l_partkey")
        b = df.filter(F.col("l_discount") <= b_q / 100).select("l_partkey")
        if op == "union":
            got_df = a.union(b).distinct()
        elif op == "except":
            got_df = a.subtract(b)
        else:
            got_df = a.intersect(b)
        got = sorted(r["l_partkey"] for r in got_df.collect())
        sql_op = {"union": "UNION", "except": "EXCEPT",
                  "intersect": "INTERSECT"}[op]
        exp = sorted(r[0] for r in con.execute(
            f"SELECT l_partkey FROM {src} WHERE l_quantity > {a_q} "
            f"{sql_op} "
            f"SELECT l_partkey FROM {src} WHERE l_discount <= {b_q / 100}"
        ).fetchall())
        assert got == exp, (op, a_q, b_q)


def test_having_specs_match_duckdb(spark):
    rng = random.Random(32_000)
    con = duckdb.connect()
    src = f"'{SF_SMOKE}/lineitem.parquet'"
    for _ in range(6):
        thresh = rng.randint(100, 2000)
        keys = rng.choice((["l_returnflag"], ["l_returnflag", "l_linestatus"]))
        df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        got_df = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
                  .filter(F.col("n") > thresh))
        got = _norm(got_df.columns, [tuple(r) for r in got_df.collect()])
        k = ", ".join(keys)
        res = con.execute(
            f"SELECT {k}, CAST(count(*) AS BIGINT) AS n FROM {src} "
            f"GROUP BY {k} HAVING count(*) > {thresh}")
        exp = _norm([d[0] for d in res.description], res.fetchall())
        assert got == exp, (keys, thresh)


def test_ordered_topn_sequences_match_duckdb(spark):
    """ORDER of the result certified, not just the multiset: top-N under a
    total order (price direction + unique key tiebreak) must come back in
    the identical sequence from both engines."""
    rng = random.Random(33_000)
    con = duckdb.connect()
    src = f"'{SF_SMOKE}/lineitem.parquet'"
    for _ in range(6):
        n = rng.randint(1, 50)
        desc = rng.random() < 0.5
        df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        price = F.col("l_extendedprice")
        got_df = (df.select("l_orderkey", "l_linenumber", "l_extendedprice")
                  .orderBy(price.desc() if desc else price.asc(),
                           F.col("l_orderkey").asc(),
                           F.col("l_linenumber").asc())
                  .limit(n))
        got = [tuple(r) for r in got_df.collect()]
        d = "DESC" if desc else "ASC"
        exp = con.execute(
            f"SELECT l_orderkey, l_linenumber, l_extendedprice FROM {src} "
            f"ORDER BY l_extendedprice {d}, l_orderkey, l_linenumber "
            f"LIMIT {n}").fetchall()
        assert got == [tuple(r) for r in exp], (n, desc)


# ---------------------------------------------- permutation-hash family
# Generative coverage for the deterministic-ordering operators after the
# round-8 findings that (a) raw _knuth_hash order is key-monotone and
# (b) bit 0 of a multiplicative mix is the input's parity: random keys
# (including negatives), salts, budgets and epochs, compiled through the
# operator AND its SQL twin side-by-side.


@pytest.mark.parametrize("seed", range(6))
def test_random_epoch_manifests_match_duckdb(spark, seed):
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        epoch_batch_manifest, epoch_batch_manifest_sql)

    rng = random.Random(9_000 + seed)
    n = rng.randint(40, 300)
    salt = rng.randint(0, 1_000_000)
    budget = rng.choice((64, 128, 500, 1009))
    epochs = rng.randint(1, 3)
    keys = rng.sample(range(-(1 << 40), 1 << 40), n)
    rows = [(k, rng.randint(1, 50)) for k in keys]

    sdf = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    caches: list = []
    try:
        got = sorted(map(tuple, epoch_batch_manifest(
            sdf, "doc_id", "n_tokens", budget=budget, epochs=epochs,
            salt=salt, caches=caches).collect()))
    finally:
        for c in caches:
            c.unpersist()

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, n_tokens INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        epoch_batch_manifest_sql("doc_id", "n_tokens", budget=budget,
                                 epochs=epochs, salt=salt)).fetchall()))
    assert got == want, f"seed {seed}: manifest diverged"
    # structural invariants on top of cross-engine equality
    per_epoch = {}
    for e, b, nd, st, _ in got:
        per_epoch.setdefault(e, [0, 0])
        per_epoch[e][0] += nd
        per_epoch[e][1] += st
    total = sum(t for _, t in rows)
    for e, (nd, st) in per_epoch.items():
        assert nd == n and st == total


@pytest.mark.parametrize("seed", range(6))
def test_random_quota_samples_match_duckdb(spark, seed):
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        per_group_quota_sample, per_group_quota_sql)

    rng = random.Random(17_000 + seed)
    n = rng.randint(60, 400)
    salt = rng.randint(0, 1_000_000)
    quota = rng.randint(1, 7)
    n_groups = rng.randint(1, 6)
    keys = rng.sample(range(-(1 << 40), 1 << 40), n)
    rows = [(rng.randrange(n_groups), k) for k in keys]

    sdf = spark.createDataFrame(rows, "grp int, k long")
    got = sorted((r["grp"], r["k"]) for r in per_group_quota_sample(
        sdf, "grp", "k", quota, salt=salt).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp INT, k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        "SELECT grp, k FROM "
        + per_group_quota_sql("t", "grp", "k", quota, salt=salt)
        + " q").fetchall()))
    assert got == want, f"seed {seed}: quota keep-set diverged"
