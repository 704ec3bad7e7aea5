"""Approximate aggregates — the sketches that replace exact distinct/quantile
at 100 TB (fixed-size state instead of per-key hash tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_ORACLE


def test_approx_count_distinct_within_tolerance(spark):
    cat = Catalog(spark, SF_ORACLE)
    row = cat.lineitem.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_approx_percentile_close_to_exact(spark):
    cat = Catalog(spark, SF_ORACLE)
    row = cat.orders.agg(
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("approx_med"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_med"),
    ).collect()[0]
    assert abs(row["approx_med"] - row["exact_med"]) / row["exact_med"] < 0.02
