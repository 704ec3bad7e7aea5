"""Pandas-UDF boundary pins (scalar + grouped-agg) and observed writes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators import pandas_udfs as P
from ds_ga1004_bigdata_project_spark.sources.catalog import (
    Catalog, audited_write_parquet)

from .conftest import SF_SMOKE


def test_scalar_pandas_udf_matches_native(spark):
    li = Catalog(spark, SF_SMOKE).lineitem.select(
        "l_orderkey", "l_linenumber", "l_extendedprice")
    both = li.select(
        P.signed_log1p(F.col("l_extendedprice")).alias("py"),
        P.signed_log1p_native(F.col("l_extendedprice")).alias("jvm"))
    bad = both.filter(F.abs(F.col("py") - F.col("jvm")) > 1e-12).count()
    assert bad == 0


def test_grouped_agg_pandas_udf_matches_pandas(spark):
    li = Catalog(spark, SF_SMOKE).lineitem
    out = {r["l_returnflag"]: r["tm"]
           for r in li.groupBy("l_returnflag")
           .agg(P.trimmed_mean_10("l_extendedprice").alias("tm")).collect()}
    pdf = li.select("l_returnflag", "l_extendedprice").toPandas()
    for flag, grp in pdf.groupby("l_returnflag")["l_extendedprice"]:
        lo, hi = grp.quantile(0.1), grp.quantile(0.9)
        expect = grp[(grp >= lo) & (grp <= hi)].mean()
        assert out[flag] == pytest.approx(expect, rel=1e-12)


def test_audited_write_returns_metrics(spark, tmp_path):
    nation = Catalog(spark, SF_SMOKE).nation
    m = audited_write_parquet(nation, str(tmp_path / "obs_out"))
    assert m["n_rows"] == nation.count()
    assert m["n_null_n_name"] == 0
    assert spark.read.parquet(str(tmp_path / "obs_out")).count() == m["n_rows"]
