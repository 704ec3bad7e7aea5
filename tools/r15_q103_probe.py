#!/usr/bin/env python
"""q103_stream_stream_join cost attribution (r15, VERDICT r14 #5).

Replays q103's exact streaming body but keeps the StreamingQuery handle
so ``recentProgress`` can split the wall into the engine's own buckets
(per micro-batch: addBatch = actual join execution, getBatch/latestOffset
= source listing, queryPlanning, walCommit/stateCommit = checkpoint I/O)
plus state-store metrics (rows buffered, memory, removed-by-watermark).
Then times the IDENTICAL interval join as a plain BATCH query — the
difference is the streaming engine's fixed overhead, which is the
question VERDICT r14 #5 asks (state-dominated would mean watermark/state
pruning work; overhead-dominated means the wall is the engine, not the
plan).

Usage: python tools/r15_q103_probe.py [--reps 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 8)

    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.sources.catalog import load_table
    from ds_ga1004_bigdata_project_spark.streaming import events as SE

    spark = get_local_session(cpus, app_name="r15-q103-probe")
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(sf_dir, "events.parquet")

    for rep in range(args.reps):
        clicks = (SE.read_event_stream_auto(spark, path)
                  .filter(F.col("event_type") == "click"))
        purchases = (SE.read_event_stream_auto(spark, path)
                     .filter(F.col("event_type") == "purchase"))
        joined = SE.interval_join_streams(clicks, purchases, key="user_id",
                                          max_span="1 hour")
        conf_key = "spark.sql.shuffle.partitions"
        prev = spark.conf.get(conf_key)
        spark.conf.set(conf_key, "8")
        t0 = time.perf_counter()
        handle = (joined.writeStream.format("memory")
                  .queryName(f"q103probe_{rep}")
                  .outputMode("append").trigger(availableNow=True).start())
        handle.awaitTermination()
        wall = round(time.perf_counter() - t0, 3)
        spark.conf.set(conf_key, prev)

        prog = [json.loads(p.json) for p in handle.recentProgress]
        dur: dict[str, float] = {}
        state = {"rowsTotal": 0, "memBytes": 0, "rowsRemoved": 0,
                 "commitMs": 0}
        for p in prog:
            for k, v in (p.get("durationMs") or {}).items():
                dur[k] = dur.get(k, 0) + v
            for so in p.get("stateOperators") or []:
                state["rowsTotal"] = max(state["rowsTotal"],
                                         so.get("numRowsTotal", 0))
                state["memBytes"] = max(state["memBytes"],
                                        so.get("memoryUsedBytes", 0))
                state["rowsRemoved"] += so.get("numRowsRemoved", 0)
                state["commitMs"] += so.get("commitTimeMs", 0)
        print(json.dumps({"rep": rep, "wall_s": wall,
                          "n_batches": len(prog),
                          "durationMs_total": dur, "state": state}))

    # batch twin of the same join (identical condition, same source)
    ev = load_table(spark, sf_dir, "events")
    l = (ev.filter(F.col("event_type") == "click")
         .select(F.col("user_id").alias("k"),
                 F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts")))
    r = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("rk"),
                 F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts")))
    cond = ((F.col("k") == F.col("rk"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 hour")))
    batch_walls = []
    for rep in range(args.reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        l.join(r, cond, "inner").write.format("noop") \
            .mode("overwrite").save()
        batch_walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"batch_twin_walls": batch_walls,
                      "batch_min": min(batch_walls)}))
    spark.stop()


if __name__ == "__main__":
    main()
