"""Named query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 gets a named query here: a Spark
builder ``(spark, sf_dir) -> DataFrame`` composed from the engine's operator
library, plus (where SQL-expressible) a DuckDB oracle twin with IDENTICAL
output column names. Computed columns are aliased on both sides; money/qty
aggregates go through exact DECIMAL sums (see ``operators.aggregates``) so the
value-hash comparison is engine-independent.

Determinism rule: any query with a LIMIT/top-k carries a total-order tiebreak;
any grouped list is order-embedded (``sort_array``); floats are rounded after
exact arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as T
from .operators import aggregates as agg
from .operators import dedup, relational as rel, sampling, similarity as sim
from .sources.catalog import Catalog


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None → rows-only harness check
    survey: str         # SURVEY.md §2 operator ids this query covers


REGISTRY: dict[str, Query] = {}


def _register(name: str, survey: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, survey)
        return fn
    return deco


# =====================================================================
# Relational core (SURVEY §2.1-2.8) on the TPC-H-ish star schema
# =====================================================================

@_register(
    "q01_top_parts",
    survey="S1,A3,O4,J1 (flagship: Exploration-EDA.ipynb#cell72-75 top-tracks shape)",
    oracle="""
        SELECT l.l_partkey, p.p_name,
               round(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY l.l_partkey, p.p_name
        ORDER BY sum_qty DESC, l.l_partkey ASC
        LIMIT 20
    """,
)
def q01_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: top-20 most-shipped parts — scan → agg → broadcast-join dim →
    global top-N (the reference's top-tracks EDA query re-expressed)."""
    cat = Catalog(spark, sf_dir)
    sums = cat.lineitem.groupBy("l_partkey").agg(agg.exact_sum("l_quantity", "sum_qty"))
    named = rel.broadcast_inner_join(
        sums, cat.part.select(F.col("p_partkey").alias("l_partkey"), "p_name"),
        "l_partkey")
    return rel.global_topn(
        named.select("l_partkey", "p_name", "sum_qty"),
        [F.col("sum_qty").desc(), F.col("l_partkey").asc()], 20)


@_register(
    "q02_pricing_summary",
    survey="A3,A8,P7 (TPC-H Q1 shape; groupby-sum Exploration-EDA.ipynb#cell73)",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
               count(*) AS cnt
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q02_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: multi-aggregate hash agg with partial (map-side)
    combine — per-key state only crosses the shuffle."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        agg.exact_sum("l_quantity", "sum_qty"),
        agg.exact_sum("l_extendedprice", "sum_base_price"),
        agg.exact_avg("l_quantity", "avg_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@_register(
    "q03_scan_filter_project",
    survey="P1,P7 (projection+range predicate; pushdown to parquet scan)",
    oracle="""
        SELECT l_orderkey, l_partkey, l_quantity
        FROM lineitem
        WHERE l_quantity BETWEEN 5 AND 10 AND l_returnflag = 'R'
    """,
)
def q03_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + range filter. Both reach the parquet reader (PushedFilters
    + 3-column ReadSchema in the physical plan)."""
    cat = Catalog(spark, sf_dir)
    return (rel.filter_in_range(cat.lineitem, "l_quantity", 5, 10)
            .filter(F.col("l_returnflag") == "R")
            .select("l_orderkey", "l_partkey", "l_quantity"))


@_register(
    "q04_semi_join",
    survey="P4,J5 (isin → left-semi rewrite of sample_indexer.py:39)",
    oracle="""
        SELECT o_orderkey, o_custkey,
               round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS total
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    keys = (cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
            .select(F.col("c_custkey").alias("o_custkey")))
    return rel.semi_join(cat.orders, keys, "o_custkey").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice").cast("decimal(18,2)").cast("double"), 2)
        .alias("total"))


@_register(
    "q05_anti_join",
    survey="J4,U2 (driver-side set difference → left-anti rewrite of sample_indexer.py:28-33)",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    keys = cat.orders.select(F.col("o_custkey").alias("c_custkey"))
    return rel.anti_join(cat.customer, keys, "c_custkey").select("c_custkey", "c_name")


@_register(
    "q06_join_chain_revenue",
    survey="J1,J2,A3 (multi-key inner-join chain, Exploration-EDA.ipynb#cell45-52)",
    oracle="""
        SELECT r.r_name, n.n_name,
               round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                     AS DOUBLE), 4) AS revenue,
               count(*) AS n_items
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey  = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY r.r_name, n.n_name
    """,
)
def q06_join_chain_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join. Dims broadcast (explicitly hinted); only the
    fact→orders join shuffles, and AQE re-plans it from runtime stats."""
    cat = Catalog(spark, sf_dir)
    joined = rel.join_chain(
        cat.lineitem,
        (F.broadcast(cat.orders.select("o_orderkey", "o_custkey")),
         F.col("l_orderkey") == F.col("o_orderkey")),
        (F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
         F.col("o_custkey") == F.col("c_custkey")),
        (F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey")),
        (F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey")),
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return joined.groupBy("r_name", "n_name").agg(
        F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_register(
    "q07_full_outer_counts",
    survey="J3 (full-outer join, Exploration-EDA.ipynb#cell35,#cell39)",
    oracle="""
        WITH cc AS (SELECT c_nationkey AS nationkey, count(*) AS customer_cnt
                    FROM customer GROUP BY 1),
             sc AS (SELECT s_nationkey AS nationkey, count(*) AS supplier_cnt
                    FROM supplier GROUP BY 1)
        SELECT coalesce(cc.nationkey, sc.nationkey) AS nationkey,
               coalesce(customer_cnt, 0) AS customer_cnt,
               coalesce(supplier_cnt, 0) AS supplier_cnt
        FROM cc FULL OUTER JOIN sc ON cc.nationkey = sc.nationkey
    """,
)
def q07_full_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cc = cat.customer.groupBy(F.col("c_nationkey").alias("nationkey")) \
        .agg(F.count(F.lit(1)).alias("customer_cnt"))
    sc = cat.supplier.groupBy(F.col("s_nationkey").alias("nationkey")) \
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
    return (cc.join(sc, "nationkey", "outer")
            .select("nationkey",
                    F.coalesce("customer_cnt", F.lit(0)).alias("customer_cnt"),
                    F.coalesce("supplier_cnt", F.lit(0)).alias("supplier_cnt")))


@_register(
    "q08_distinct_flags",
    survey="A2 (distinct as hash agg, sample_indexer.py:28-30)",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q08_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.select("l_returnflag", "l_linestatus").distinct()


@_register(
    "q09_count_distinct",
    survey="A4 (count-distinct-by-group, Exploration-EDA.ipynb#cell72)",
    oracle="""
        SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_segments,
               count(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    """,
)
def q09_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.customer.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.count(F.lit(1)).alias("n_customers"))


@_register(
    "q10_sorted_collect_list",
    survey="A1,O2-fix,P3 (order-embedded collect_list; param_train_1st.py:39-41)",
    oracle="""
        SELECT l_orderkey,
               string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS parts,
               count(*) AS n_items
        FROM lineitem
        WHERE l_orderkey % 100 = 0
        GROUP BY l_orderkey
    """,
)
def q10_sorted_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic grouped-list (the reference's ground-truth track lists
    with the O2 nondeterminism fixed by embedding order in the aggregate)."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(F.col("l_orderkey") % 100 == 0)
    lists = agg.collect_sorted_string(li, ["l_orderkey"], "l_partkey", "parts")
    counts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    return lists.join(counts, "l_orderkey")


@_register(
    "q11_argmax_per_order",
    survey="A11,W1 (argmax-over-group; dominant-genre shape Exploration-EDA.ipynb#cell96)",
    oracle="""
        SELECT l_orderkey, top_qty, top_part FROM (
          SELECT l_orderkey,
                 l_quantity AS top_qty, l_partkey AS top_part,
                 row_number() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_quantity DESC, l_partkey DESC) AS rn
          FROM lineitem) WHERE rn = 1
    """,
)
def q11_argmax_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmax via ``max(struct(value, key))`` — one hash agg, no
    window sort (the oracle uses the window form; same result, worse plan)."""
    cat = Catalog(spark, sf_dir)
    top_qty, top_part = agg.argmax_struct("l_quantity", "l_partkey",
                                          "top_qty", "top_part")
    return cat.lineitem.groupBy("l_orderkey").agg(top_qty, top_part) \
        .select("l_orderkey", "top_qty", "top_part")


@_register(
    "q12_quantity_histogram",
    survey="A7,F8,P7 (binned counts + fractions, Exploration-EDA.ipynb#cell77-81)",
    oracle="""
        WITH b AS (
          SELECT CASE WHEN l_quantity < 1 THEN '<1'
                      WHEN l_quantity >= 1  AND l_quantity < 10 THEN '[1,10)'
                      WHEN l_quantity >= 10 AND l_quantity < 25 THEN '[10,25)'
                      WHEN l_quantity >= 25 AND l_quantity < 40 THEN '[25,40)'
                      ELSE '>=40' END AS bucket
          FROM lineitem)
        SELECT bucket, count(*) AS cnt,
               round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 4) AS ratio
        FROM b GROUP BY bucket
    """,
)
def q12_quantity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return agg.histogram(cat.lineitem, "l_quantity", [1, 10, 25, 40])


@_register(
    "q13_rank_suppliers",
    survey="W2,W3 (rank over window, Exploration-EDA.ipynb#cell86)",
    oracle="""
        SELECT s_suppkey, s_nationkey,
               round(CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE), 2) AS acctbal,
               rank() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal DESC, s_suppkey ASC) AS bal_rank
        FROM supplier
    """,
)
def q13_rank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    df = cat.supplier.select(
        "s_suppkey", "s_nationkey",
        F.round(F.col("s_acctbal").cast("decimal(18,2)").cast("double"), 2)
        .alias("acctbal"))
    return rel.rank_in_group(
        df, ["s_nationkey"],
        [F.col("acctbal").desc(), F.col("s_suppkey").asc()], "bal_rank")


@_register(
    "q14_topk_per_brand",
    survey="W1 (top-k per group = recommendForUserSubset relational analog)",
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
          FROM part) WHERE rn <= 3
    """,
)
def q14_topk_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return rel.topk_per_group(
        cat.part.select("p_brand", "p_partkey", "p_retailprice"),
        ["p_brand"], [F.col("p_retailprice").desc(), F.col("p_partkey").asc()], 3)


@_register(
    "q15_global_topn_orders",
    survey="O1,O4,O5 (global top-N → TakeOrderedAndProject)",
    oracle="""
        SELECT o_orderkey, o_custkey,
               round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS total
        FROM orders ORDER BY total DESC, o_orderkey ASC LIMIT 25
    """,
)
def q15_global_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    df = cat.orders.select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice").cast("decimal(18,2)").cast("double"), 2)
        .alias("total"))
    return rel.global_topn(df, [F.col("total").desc(), F.col("o_orderkey").asc()], 25)


@_register(
    "q16_union_distinct_keys",
    survey="U1,U3 (set union rewrite of sample_indexer.py:32)",
    oracle="""
        SELECT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION SELECT s_nationkey FROM supplier)
    """,
)
def q16_union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return rel.union_distinct(
        cat.customer.select(F.col("c_nationkey").alias("nationkey")),
        cat.supplier.select(F.col("s_nationkey").alias("nationkey")))


@_register(
    "q17_except_keys",
    survey="U2,J4 (set difference rewrite of sample_indexer.py:33)",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT SELECT o_custkey FROM orders
    """,
)
def q17_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return rel.difference(
        cat.customer.select(F.col("c_custkey").alias("custkey")).distinct(),
        cat.orders.select(F.col("o_custkey").alias("custkey")).distinct())


@_register(
    "q18_intersect_keys",
    survey="U (intersect — free surface per SURVEY §2.7)",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey FROM supplier
    """,
)
def q18_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return rel.intersection(
        cat.customer.select(F.col("c_nationkey").alias("nationkey")),
        cat.supplier.select(F.col("s_nationkey").alias("nationkey")))


@_register(
    "q19_scalar_string_funcs",
    survey="F1,F2,F3,F4,F7 (scalar exprs replacing pandas .apply; Exploration-EDA.ipynb#cell99-104)",
    oracle="""
        SELECT p_partkey,
               substr(p_name, 1, 10) AS name_prefix,
               CASE WHEN contains(lower(p_name), 'green') THEN 1 ELSE 0 END AS has_green,
               p_size - 1 AS size_shifted,
               round(CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS price_rounded,
               coalesce(NULLIF(p_brand, 'Brand#11'), 'NA') AS brand_or_na,
               regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowels
        FROM part
    """,
)
def q19_scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import scalars as S
    cat = Catalog(spark, sf_dir)
    return cat.part.select(
        "p_partkey",
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.when(S.contains_word(F.col("p_name"), "green"), 1).otherwise(0)
        .alias("has_green"),
        S.shift_index(F.col("p_size")).alias("size_shifted"),
        F.round(F.col("p_retailprice").cast("decimal(18,2)").cast("double"), 2)
        .alias("price_rounded"),
        S.na_sentinel(F.nullif(F.col("p_brand"), F.lit("Brand#11"))).alias("brand_or_na"),
        F.regexp_replace("p_type", "[aeiou]", "").alias("type_novowels"),
    )


@_register(
    "q20_null_sentinel",
    survey="P6 (0-as-null normalization, Exploration-EDA.ipynb#cell46)",
    oracle="""
        WITH e AS (SELECT event_type,
                          CASE WHEN value < 1 THEN NULL ELSE value END AS v
                   FROM events)
        SELECT event_type, count(*) AS n_events, count(v) AS n_nonnull,
               round(count(v) / CAST(count(*) AS DOUBLE), 4) AS nonnull_ratio
        FROM e GROUP BY event_type
    """,
)
def q20_null_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    e = cat.events.withColumn(
        "v", F.when(F.col("value") < 1, None).otherwise(F.col("value")))
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("v").alias("n_nonnull"),
        F.round(F.count("v") / F.count(F.lit(1)).cast("double"), 4)
        .alias("nonnull_ratio"))


@_register(
    "q21_daily_rollup",
    survey="net-new date/time surface (SURVEY §2.8 note; events testbed)",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        FROM events GROUP BY 1
    """,
)
def q21_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        agg.exact_sum("value", "sum_value"))


@_register(
    "q22_hourly_window",
    survey="streaming-shape tumbling window (SURVEY §2.13; F.window on events)",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
)
def q22_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window via ``F.window`` — the exact construct that
    becomes a Structured Streaming windowed agg by swapping read→readStream
    (see ``streaming/``)."""
    cat = Catalog(spark, sf_dir)
    return (cat.events
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 agg.exact_sum("value", "sum_value"))
            .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    "event_type", "n_events", "sum_value"))


@_register(
    "q23_token_explode_count",
    survey="F5,A6,O4 (explode + token frequency, Exploration-EDA.ipynb#cell85)",
    oracle="""
        SELECT tok, count(*) AS cnt
        FROM (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part)
        GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 15
    """,
)
def q23_token_explode_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    toks = cat.part.select(F.explode(F.split("p_name", " ")).alias("tok"))
    counts = agg.group_counts(toks, ["tok"])
    return rel.global_topn(counts, [F.col("cnt").desc(), F.col("tok").asc()], 15)


@_register(
    "q24_sessionize",
    survey="streaming-shape sessionization (lag window + gap cumsum; batch form)",
    oracle="""
        WITH g AS (
          SELECT user_id, ts,
                 CASE WHEN date_diff('second',
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                          ts) > 1800
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events)
        SELECT user_id, count(*) AS n_events, sum(new_session) AS n_sessions
        FROM g GROUP BY user_id
    """,
)
def q24_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag + cumulative new-session markers. The
    streaming twin is ``applyInPandasWithState`` / ``session_window`` (see
    ``streaming/``); this batch form is the oracle-checkable shape."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = cat.events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    return marked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("new_session").alias("n_sessions"))
