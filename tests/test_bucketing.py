"""Bucketed co-located joins: the write-once-shuffle-never property, asserted
on the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.plans.inspect import physical_plan
from ds_ga1004_bigdata_project_spark.sources import bucketing as B
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    cat = Catalog(spark, SF_SMOKE)
    B.write_bucketed(cat.lineitem.select("l_orderkey", "l_partkey", "l_quantity"),
                     "li_bucketed", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    B.write_bucketed(cat.orders.select("o_orderkey", "o_custkey"),
                     "ord_bucketed", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables):
    li, ords = bucketed_tables
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = B.cobucketed_join(
            spark, li, ords,
            F.col("l_orderkey") == F.col("o_orderkey"))
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.replace("BroadcastExchange", ""), \
            f"co-bucketed join still shuffles:\n{plan}"
        # and it returns correct rows
        n = joined.count()
        cat = Catalog(spark, SF_SMOKE)
        want = cat.lineitem.join(
            cat.orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    li, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = spark.table(li).groupBy("l_orderkey") \
            .agg(F.sum("l_quantity").alias("q"))
        plan = physical_plan(agg)
        assert "Exchange" not in plan.replace("BroadcastExchange", ""), \
            f"groupBy on bucket key still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
