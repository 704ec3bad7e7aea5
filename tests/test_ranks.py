"""Scalable global ranks vs the unpartitioned-window forms."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators.ranks import (
    global_distribution_ranks, global_prefix_sum, global_row_numbers)
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_SMOKE


def test_global_row_numbers_match_window(spark):
    li = Catalog(spark, SF_SMOKE).lineitem.select(
        "l_orderkey", "l_linenumber", "l_extendedprice")
    order = [F.col("l_extendedprice").asc(), F.col("l_orderkey").asc(),
             F.col("l_linenumber").asc()]
    scalable = global_row_numbers(li, order, num_partitions=7,
                                  out_col="rn", small_input_max=0)
    w = Window.orderBy(*order)
    windowed = li.withColumn("rn", F.row_number().over(w))
    key = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    mism = (scalable.join(windowed.withColumnRenamed("rn", "rn_w"), key)
            .filter(F.col("rn") != F.col("rn_w")).count())
    # NB: (orderkey, linenumber) dupes exist; with the full 3-col tiebreak
    # equal rows are interchangeable, so compare the multisets instead.
    a = sorted(tuple(r) for r in scalable.select(*key, "rn").collect())
    b = sorted(tuple(r) for r in windowed.select(*key, "rn").collect())
    assert a == b
    assert mism == 0 or a == b


def test_distribution_ranks_match_window(spark):
    cust = Catalog(spark, SF_SMOKE).customer.select("c_custkey", "c_acctbal")
    scalable = global_distribution_ranks(cust, ["c_acctbal"], ["c_custkey"],
                                         small_input_max=0)
    w = Window.orderBy(F.col("c_acctbal").asc())
    windowed = cust.select(
        "c_custkey",
        F.rank().over(w).alias("rank"),
        F.percent_rank().over(w).alias("percent_rank"),
        F.cume_dist().over(w).alias("cume_dist"))
    j = scalable.select("c_custkey", "rank", "percent_rank", "cume_dist") \
        .withColumnRenamed("rank", "r1") \
        .withColumnRenamed("percent_rank", "p1") \
        .withColumnRenamed("cume_dist", "c1") \
        .join(windowed, "c_custkey")
    bad = j.filter(
        (F.col("r1") != F.col("rank"))
        | (F.abs(F.col("p1") - F.col("percent_rank")) > 1e-12)
        | (F.abs(F.col("c1") - F.col("cume_dist")) > 1e-12)).count()
    assert bad == 0
    assert scalable.count() == cust.count()


def test_distribution_ranks_no_forced_broadcast(spark):
    # The per-key (min,max) table has one row per DISTINCT key — O(N) for
    # near-unique keys — so the plan must not FORCE a broadcast of it. The
    # logical plan is hint-free (AQE may still pick a small-table broadcast
    # at runtime from real statistics; that is fine and size-gated).
    cust = Catalog(spark, SF_SMOKE).customer.select("c_custkey", "c_acctbal")
    out = global_distribution_ranks(cust, ["c_acctbal"], ["c_custkey"],
                                    small_input_max=0)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical, logical


def test_global_prefix_sum_matches_window(spark):
    # (c_acctbal, c_custkey) is a TOTAL order (custkey unique) — required:
    # with ties, tied rows' intermediate cumsums depend on their relative
    # order and the two constructions could disagree row-by-row.
    cust = Catalog(spark, SF_SMOKE).customer.select("c_custkey", "c_acctbal")
    order = [F.col("c_acctbal").asc(), F.col("c_custkey").asc()]
    caches: list = []
    scalable = global_prefix_sum(cust, order, "c_acctbal", out_col="run",
                                 num_partitions=7, caches=caches)
    w = (Window.orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    windowed = cust.withColumn("run", F.sum("c_acctbal").over(w))
    j = (scalable.select("c_custkey", F.col("run").alias("r1"))
         .join(windowed.select("c_custkey", "run"), "c_custkey"))
    bad = j.filter(F.abs(F.col("r1") - F.col("run")) > 1e-6).count()
    assert bad == 0
    assert scalable.count() == cust.count()
    for c in caches:
        c.unpersist()


def test_ranks_caches_are_released(spark):
    # Cache-ownership contract: persisted internals are handed to the caller
    # via `caches`, and unpersisting them empties the storage layer.
    cust = Catalog(spark, SF_SMOKE).customer.select("c_custkey", "c_acctbal")
    caches: list = []
    out = global_distribution_ranks(cust, ["c_acctbal"], ["c_custkey"],
                                    caches=caches, small_input_max=0)
    out.count()
    assert caches, "internal persist not surfaced to the caller"
    for c in caches:
        assert c.storageLevel.useMemory or c.storageLevel.useDisk
        c.unpersist(blocking=True)
    for c in caches:
        assert not (c.storageLevel.useMemory or c.storageLevel.useDisk)


def test_ntile_matches_window(spark):
    cust = Catalog(spark, SF_SMOKE).customer.select("c_custkey", "c_acctbal")
    for k in (3, 4, 7):
        scalable = global_distribution_ranks(
            cust, ["c_acctbal", "c_custkey"], [], ntile=k, small_input_max=0)
        w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
        windowed = cust.select("c_custkey", F.ntile(k).over(w).alias("nt"))
        bad = (scalable.select("c_custkey", "ntile")
               .join(windowed, "c_custkey")
               .filter(F.col("ntile") != F.col("nt")).count())
        assert bad == 0, f"ntile({k}) mismatch"


def test_adaptive_dispatch_small_equals_large(spark):
    # The two dispatch arms must be value-identical: run the same input
    # through the forced-small and forced-large paths and compare rows.
    cust = Catalog(spark, SF_SMOKE).customer.select("c_custkey", "c_acctbal")
    small = global_distribution_ranks(
        cust, ["c_acctbal"], ["c_custkey"], ntile=4,
        small_input_max=10**9)
    large = global_distribution_ranks(
        cust, ["c_acctbal"], ["c_custkey"], ntile=4, small_input_max=0)
    cols = ["c_custkey", "row_number", "rank", "percent_rank",
            "cume_dist", "ntile"]
    a = sorted(tuple(r) for r in small.select(*cols).collect())
    b = sorted(tuple(r) for r in large.select(*cols).collect())
    assert a == b and len(a) == cust.count()


def test_adaptive_dispatch_small_path_plan_has_no_range_machinery(spark):
    # Below the threshold the plan must be ONE window stage: no
    # repartitionByRange exchange, no InMemoryRelation from the internal
    # persist, no spark_partition_id column.
    cust = Catalog(spark, SF_SMOKE).customer.select("c_custkey", "c_acctbal")
    out = global_distribution_ranks(
        cust, ["c_acctbal"], ["c_custkey"], small_input_max=10**9)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" not in plan
    assert "InMemoryRelation" not in plan
    assert "SPARK_PARTITION_ID" not in plan.upper()


def test_adaptive_dispatch_row_numbers_small_equals_large(spark):
    cust = Catalog(spark, SF_SMOKE).customer.select("c_custkey", "c_acctbal")
    order = [F.col("c_acctbal").asc(), F.col("c_custkey").asc()]
    small = global_row_numbers(cust, order, out_col="rn",
                               small_input_max=10**9)
    large = global_row_numbers(cust, order, out_col="rn", small_input_max=0)
    a = sorted(tuple(r) for r in small.select("c_custkey", "rn").collect())
    b = sorted(tuple(r) for r in large.select("c_custkey", "rn").collect())
    assert a == b


def test_sequence_pack_offsets_match_window_and_plan(spark):
    """q112's operator: pack assignment equals the naive unpartitioned-window
    cumsum form, and its plan contains no unpartitioned Window (the
    range-partitioned construction is the point)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.functions.text import (
        sequence_pack_offsets, token_count)
    from ds_ga1004_bigdata_project_spark.plans.inspect import physical_plan

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    caches = []
    # num_partitions=4 forces the MULTI-partition offset arithmetic even on
    # the small fixture — the path where stale range boundaries mis-assign
    # offsets if the cache-ownership contract is violated (the q112 sf0.1
    # parity bug: unpersisting before the consuming action).
    got = sequence_pack_offsets(docs, seq_len=512, num_partitions=4,
                                caches=caches)
    naive = docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")) \
        .withColumn("cum", F.sum("n_tokens").over(
            W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0))) \
        .select("doc_id", "n_tokens",
                (F.col("cum") - F.col("n_tokens")).cast("long").alias("start_offset"),
                F.floor((F.col("cum") - F.col("n_tokens")) / 512).cast("long").alias("first_pack"),
                F.floor((F.col("cum") - 1) / 512).cast("long").alias("last_pack"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    plan = physical_plan(got)
    assert "Window [" not in plan.replace("partitionBy", "") or \
        "_pid" in plan, "expected the range-partitioned (_pid-local) window"
    for c in caches:
        c.unpersist()
