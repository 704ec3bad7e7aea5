"""SCD Type-2 semantics beyond the q135 single-batch oracle: multi-batch
history composition and interval invariants."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators import relational as rel


def _dim(spark):
    return spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "k int, seg string")


def test_single_batch_intervals(spark):
    upd = spark.createDataFrame([(2, "B2")], "k int, seg string")
    v = rel.scd2_apply(_dim(spark), upd, "k", "2024-06-01")
    rows = {(r["k"], r["seg"]): r for r in v.collect()}
    assert len(rows) == 4                       # 2 untouched + closed + new
    closed = rows[(2, "B")]
    assert str(closed["valid_to"]) == "2024-06-01" and not closed["is_current"]
    new = rows[(2, "B2")]
    assert str(new["valid_from"]) == "2024-06-01"
    assert new["valid_to"] is None and new["is_current"]
    for k, seg in [(1, "A"), (3, "C")]:
        assert rows[(k, seg)]["is_current"]


def test_two_batches_make_three_versions(spark):
    v1 = rel.scd2_apply(_dim(spark),
                        spark.createDataFrame([(2, "B2")], "k int, seg string"),
                        "k", "2024-06-01")
    v2 = rel.scd2_apply_incremental(
        v1, spark.createDataFrame([(2, "B3")], "k int, seg string"),
        "k", "2024-09-01")
    k2 = sorted(((str(r["valid_from"]), str(r["valid_to"]), r["seg"],
                  r["is_current"])
                 for r in v2.filter("k = 2").collect()))
    assert k2 == [("1900-01-01", "2024-06-01", "B", False),
                  ("2024-06-01", "2024-09-01", "B2", False),
                  ("2024-09-01", "None", "B3", True)]
    # exactly one current row per key, intervals abut with no gaps
    per_key = v2.groupBy("k").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur"))
    assert all(r["n_cur"] == 1 for r in per_key.collect())


def test_key_count_invariant(spark):
    """Every key has exactly one open version; version count = 1 + times
    updated."""
    upd = spark.createDataFrame([(1, "A2"), (2, "B2")], "k int, seg string")
    v = rel.scd2_apply(_dim(spark), upd, "k", "2024-06-01")
    counts = {r["k"]: r["n"] for r in
              v.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {1: 2, 2: 2, 3: 1}
