"""Approximate aggregates — the sketches that replace exact distinct/quantile
at 100 TB (fixed-size state instead of per-key hash tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_ORACLE, SF_SMOKE


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


def test_distinct_sketch_partials_merge_and_pin(spark):
    """Mergeable HLL rollup (q111's operators): partial sketches per shard
    union into a per-group estimate. Estimates are deterministic for fixed
    data + lg_k, so they are VALUE-pinned at sf0.001 (exact: A=1081,
    N=1110, R=1096); both paths must land within the 5% contract."""
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.operators import aggregates as agg

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    direct = {r[0]: r[1] for r in li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("l_orderkey", F.lit(12))).alias("e")).collect()}
    partials = agg.distinct_sketch_partials(
        li.withColumn("_s", F.pmod(F.col("l_orderkey"), F.lit(7))),
        ["l_returnflag", "_s"], "l_orderkey")
    merged = {r[0]: r[1] for r in agg.merge_distinct_sketches(
        partials, ["l_returnflag"]).collect()}
    assert direct == {"A": 1079, "N": 1102, "R": 1103}
    assert merged == {"A": 1082, "N": 1115, "R": 1101}
    exact = {"A": 1081, "N": 1110, "R": 1096}
    for k, ex in exact.items():
        assert abs(direct[k] - ex) / ex <= 0.05
        assert abs(merged[k] - ex) / ex <= 0.05
    # partials are SMALL (the whole point: kilobytes travel, not keys)
    sizes = [len(bytes(r["sketch"])) for r in partials.collect()]
    assert max(sizes) < 64 * 1024


def test_streaming_hll_partials_match_batch_estimate(spark, tmp_path):
    """The q111 HLL partials maintained INCREMENTALLY over a stream (the
    sketches.run_streaming_cms_partials pattern applied to distinct
    counting): per micro-batch, per-group sketch partials append to a log;
    hll_union_agg folds the log on read. Contract is the q111 tolerance
    form, not bitwise equality: DataSketches HLL uses an HIP estimator
    whose value legitimately depends on how the stream was sliced into
    sketches, so union-of-halves and a one-shot sketch estimate the same
    cardinality within the error bound while differing in the last few
    counts."""
    from ds_ga1004_bigdata_project_spark.operators import aggregates as agg

    li = Catalog(spark, SF_SMOKE).lineitem.select(
        "l_orderkey", "l_returnflag")
    src = str(tmp_path / "li_stream")
    li.filter(F.col("l_orderkey") % 2 == 0).coalesce(1).write.parquet(src)
    li.filter(F.col("l_orderkey") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema("l_orderkey long, l_returnflag string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = str(tmp_path / "hll_partials")

    def append_partials(batch_df, _bid):
        (agg.distinct_sketch_partials(batch_df, ["l_returnflag"],
                                      "l_orderkey")
         .write.mode("append").parquet(out))

    (stream.writeStream.foreachBatch(append_partials)
     .option("checkpointLocation", str(tmp_path / "ckpt"))
     .trigger(availableNow=True).start().awaitTermination(300))

    # >1 batch really ran: more partial rows than groups
    partials = spark.read.parquet(out)
    n_groups = li.select("l_returnflag").distinct().count()
    assert partials.count() > n_groups

    folded = agg.merge_distinct_sketches(partials, ["l_returnflag"])
    got = {r["l_returnflag"]: r["distinct_est"] for r in folded.collect()}
    exact = {r["l_returnflag"]: r["n"] for r in
             li.groupBy("l_returnflag")
             .agg(F.count_distinct("l_orderkey").alias("n")).collect()}
    assert set(got) == set(exact)
    for flag, est in got.items():
        assert abs(est - exact[flag]) / exact[flag] <= 0.05, (flag, est)
