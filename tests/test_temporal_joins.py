"""As-of and range join operators: semantics on hand-built fixtures, the
tolerance knob, and the single-shuffle plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)
from ds_ga1004_bigdata_project_spark.plans.inspect import physical_plan


def _fixtures(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 15, "e3"), (3, 9, "e4")],
        "k int, ts int, ev string")
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 15, 300.0), (4, 1, 999.0)],
        "k int, ts int, price double")
    return left, right


def test_asof_semantics(spark):
    left, right = _fixtures(spark)
    out = {r["ev"]: r["price"]
           for r in asof_join(left, right, "k", "ts", ["price"]).collect()}
    assert out == {
        "e0": None,     # ts=5: no right row at/before
        "e1": 100.0,    # ts=10: latest is ts=8
        "e2": 200.0,    # ts=20: latest is ts=15
        "e3": 300.0,    # equal timestamps match (inclusive)
        "e4": None,     # key 3 has no right rows at all
    }


def test_asof_tolerance(spark):
    left, right = _fixtures(spark)
    out = {r["ev"]: r["price"]
           for r in asof_join(left, right, "k", "ts", ["price"],
                              tolerance=F.lit(2)).collect()}
    # e1 (ts=10, match ts=8, staleness 2) kept; e2 (20-15=5) nulled
    assert out["e1"] == 100.0 and out["e2"] is None and out["e3"] == 300.0


def test_asof_single_shuffle(spark):
    left, right = _fixtures(spark)
    plan = physical_plan(asof_join(left, right, "k", "ts", ["price"]))
    shuffles = [ln for ln in plan.splitlines()
                if ln.strip().startswith("(") and "Exchange" in ln
                and "Broadcast" not in ln]
    assert len(shuffles) <= 1, f"as-of join should shuffle once:\n{plan}"


def test_range_join_matches_naive(spark):
    points = spark.range(0, 100).select(
        (F.col("id") % 37).cast("double").alias("v"), F.col("id").alias("pid"))
    intervals = spark.createDataFrame(
        [(1, 0.0, 5.0), (2, 10.0, 12.0), (3, 30.0, 40.0), (4, 50.0, 60.0)],
        "iid int, lo double, hi double")
    fast = {(r["pid"], r["iid"]) for r in
            range_join_binned(points, intervals, "v", "lo", "hi", 4.0).collect()}
    naive = {(r["pid"], r["iid"]) for r in
             points.join(intervals, (F.col("v") >= F.col("lo"))
                         & (F.col("v") <= F.col("hi"))).collect()}
    assert fast == naive and len(fast) > 0


def test_range_count_matches_pair_materializing_join(spark):
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.operators.temporal import (
        range_count_binned, range_join_binned)
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    cat = Catalog(spark, SF_SMOKE)
    events = cat.events.select("event_id", "value")
    intervals = cat.part.select(
        "p_partkey",
        (F.col("p_partkey") % 35).cast("double").alias("lo"),
        (F.col("p_partkey") % 35 + 1 + F.col("p_size") % 5)
        .cast("double").alias("hi"))
    via_pairs = (range_join_binned(events, intervals, "value", "lo", "hi", 2.0)
                 .groupBy("p_partkey", "lo", "hi")
                 .agg(F.count(F.lit(1)).alias("n_points")))
    pushed = range_count_binned(events, intervals, "value", "lo", "hi",
                                ["p_partkey"], bin_width=0.3)
    keys = ["p_partkey", "lo", "hi"]
    mism = (via_pairs.withColumnRenamed("n_points", "a")
            .join(pushed.withColumnRenamed("n_points", "b"), keys, "full")
            .filter(F.col("a").isNull() | F.col("b").isNull()
                    | (F.col("a") != F.col("b"))).count())
    assert mism == 0


def test_resample_ffill_semantics(spark):
    """Hand-built series: grid spans trunc(min) .. max hourly; gaps carry
    the last value forward; exact-at-grid observations flag is_observed;
    pre-first-observation cells are dropped."""
    from datetime import datetime

    from ds_ga1004_bigdata_project_spark.operators.temporal import (
        resample_ffill)

    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 10.0),   # first obs 00:30
        (1, datetime(2024, 1, 1, 2, 0), 20.0),    # exactly on the 02:00 grid
        (1, datetime(2024, 1, 1, 4, 15), 30.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.grid_ts.strftime("%H:%M"): (r.value, r.is_observed)
           for r in resample_ffill(ev, "user_id", "ts", "value").collect()}
    assert out == {
        # 00:00 dropped (before the first observation)
        "01:00": (10.0, False),
        "02:00": (20.0, True),
        "03:00": (20.0, False),
        "04:00": (20.0, False),   # 04:15 obs is after the 04:00 cell
    }
