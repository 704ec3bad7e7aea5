"""Streaming exact-dedup: first-seen-wins across micro-batches, with
watermark-bounded state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.streaming import events as SE


@pytest.fixture()
def dup_doc_dir(tmp_path, spark):
    # 20 distinct texts, each written 3x with increasing timestamps
    rows = []
    for i in range(20):
        for rep in range(3):
            rows.append((i * 10 + rep, f"document body {i}",
                         f"2024-01-01 0{rep}:00:00"))
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_s string") \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = str(tmp_path / "dup_docs")
    df.write.parquet(out)
    return out


def test_stream_dedup_first_seen_wins(spark, dup_doc_dir):
    stream = (spark.readStream.schema("doc_id long, text string, ts timestamp")
              .parquet(dup_doc_dir))
    deduped = SE.stream_dedup_exact(stream, ts_col="ts", watermark="10 hours")
    SE.run_available_now(deduped, "dedup_stream_test", output_mode="append")
    rows = spark.table("dedup_stream_test").collect()
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts)) == 20  # one survivor per distinct text


def test_stream_dedup_without_ts(spark, dup_doc_dir):
    stream = (spark.readStream.schema("doc_id long, text string, ts timestamp")
              .parquet(dup_doc_dir))
    deduped = SE.stream_dedup_exact(stream)
    SE.run_available_now(deduped, "dedup_stream_nots", output_mode="append")
    assert spark.table("dedup_stream_nots").count() == 20


def test_param_grid_shape(spark):
    from ds_ga1004_bigdata_project_spark.ml.als import param_grid

    grid = param_grid(ranks=(5, 10), regs=(0.01, 0.1), alphas=(1.0,),
                      max_iter=1)
    assert len(grid) == 4
    assert {(c.rank, c.reg_param) for c in grid} == \
        {(5, 0.01), (5, 0.1), (10, 0.01), (10, 0.1)}
    assert all(c.max_iter == 1 for c in grid)


def test_stream_neardup_suppression_matches_batch_signatures(spark, tmp_path):
    """Near-dup suppression on a stream: reordered copies share a SimHash
    and collapse to one survivor; the surviving signature SET equals the
    batch simhash distinct set."""
    import shutil

    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.operators.dedup import simhash
    from ds_ga1004_bigdata_project_spark.streaming.events import (
        run_available_now, stream_dedup_neardup)

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "epsilon delta gamma beta alpha"),   # reorder of 1 -> same sig
        (3, "totally different content here now"),
        (4, "alpha beta gamma delta epsilon"),   # exact copy of 1
    ]
    src = str(tmp_path / "neardup_docs")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = stream_dedup_neardup(stream)
    assert out.isStreaming
    run_available_now(out, "neardup_stream_test", output_mode="append")
    got = spark.table("neardup_stream_test")
    sigs_stream = {r.simhash for r in got.select("simhash").collect()}
    sigs_batch = {r.simhash for r in
                  simhash(spark.read.parquet(src)).collect()}
    assert sigs_stream == sigs_batch
    assert got.count() == 2            # 1/2/4 collapse; 3 survives
    shutil.rmtree(src, ignore_errors=True)
