"""Native window z-score vs applyInPandas grouped-map twin, and the UDTF
Python-boundary contract.

NB: (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem, so
comparisons use sorted full-row multisets, not key joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators import grouped as G
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_SMOKE


def _rows(df, zcol, ndigits=9):
    out = df.select("l_orderkey", "l_linenumber", "l_extendedprice", zcol)
    return sorted((r[0], r[1], r[2],
                   r[3] if ndigits is None else round(r[3], ndigits))
                  for r in out.collect())


def test_native_and_pandas_zscore_agree(spark):
    li = Catalog(spark, SF_SMOKE).lineitem.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    native = G.zscore_native(li, "l_extendedprice", ["l_returnflag"],
                             out_col="z", scale=None)
    pandas_ = G.zscore_pandas(li, "l_extendedprice", ["l_returnflag"],
                              out_col="z", scale=None)
    assert _rows(native, "z") == _rows(pandas_, "z")


def test_pandas_path_does_not_mutate_input_schema(spark):
    li = Catalog(spark, SF_SMOKE).lineitem.select(
        "l_orderkey", "l_returnflag", "l_extendedprice")
    before = list(li.columns)
    G.zscore_pandas(li, "l_extendedprice", ["l_returnflag"], out_col="zz")
    assert list(li.columns) == before  # StructType.add mutation regression


def test_zscore_partition_invariant(spark):
    li = Catalog(spark, SF_SMOKE).lineitem
    a = G.zscore_native(li, "l_extendedprice", ["l_returnflag"])
    b = G.zscore_native(li.repartition(17), "l_extendedprice",
                        ["l_returnflag"])
    # exact-moment path: bit-identical, not approximately equal
    assert _rows(a, "z", ndigits=None) == _rows(b, "z", ndigits=None)


def test_udtf_handles_null_and_empty(spark):
    from ds_ga1004_bigdata_project_spark.functions.udtf_ops import register_udtfs
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "short but-here-is-a-longtoken"), (2, None), (3, "")],
        "id long, text string")
    df.createOrReplaceTempView("_udtf_null_probe")
    out = spark.sql("SELECT id, t.tok FROM _udtf_null_probe d, "
                    "LATERAL long_tokens(d.text, 8) t").collect()
    assert [(r["id"], r["tok"]) for r in out] == \
        [(1, "but-here-is-a-longtoken")]


def test_key_skew_report_flags_planted_hot_key(spark):
    """A 50%-hot-key table: the report's top key carries ~half the rows at
    far beyond the 10x-mean salting threshold."""
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.operators.aggregates import (
        key_skew_report)

    n = 10_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(1000))).alias("k"))
    rep = key_skew_report(df, ["k"], top_n=3).collect()
    top = rep[0]
    assert top["k"] == 7
    assert abs(top["row_share"] - 0.5) < 0.01
    assert top["x_mean_load"] > 10
    # remaining keys are near-uniform: nowhere near the threshold
    assert all(r["x_mean_load"] < 10 for r in rep[1:])
