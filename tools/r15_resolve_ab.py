#!/usr/bin/env python
"""Interleaved same-JVM A/B for the DISTRIBUTED tier of
resolve_keep_list (r15, VERDICT r14 next-round #1b).

The driver union-find short-circuits the distributed min-label loop on
every fixture (edge counts are always << RESOLVE_DRIVER_EDGE_MAX), so
the 100 TB path had never executed under measurement. This probe forces
it (driver_edge_max=0) on a synthetic chain graph big enough to have
real per-batch work and a diameter that exercises several batches:
CHAINS chains of LEN nodes (default 30k x 8 = 240k nodes, 210k edges,
diameter 7 -> seeded init + ~3 batches of 2 propagation steps).

Variants (identical outputs asserted in-run):
  * OLD — the r14 loop, inlined verbatim: eager lineage_cut per batch
    (a dedicated checkpoint job) + a separate convergence-count job,
    session-default shuffle width (32 on this box);
  * NEW — dedup.resolve_keep_list @ r15: the convergence count is the
    batch's materializing action (lazy lineage_cut), shuffle width
    scoped to the cached pair relation's measured partition count,
    AQE kept ON (skew splitting must stay live on hub components).

Protocol: one fresh JVM, warm both, alternate OLD/NEW --reps times,
report walls + per-variant job counts (statusTracker job groups).

Usage: python tools/r15_resolve_ab.py [--reps 4] [--chains 30000] [--len 8]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def resolve_old(ids, pairs, max_iters=8):
    """Verbatim r14 distributed tier (eager cut + separate count,
    session shuffle width)."""
    from ds_ga1004_bigdata_project_spark.operators.relational import (
        lineage_cut)

    pairs_u = pairs.select("a", "b")
    edges = (pairs_u.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionByName(pairs_u.select(F.col("b").alias("src"),
                                         F.col("a").alias("dst"))))

    def propagate(lbl):
        neighbor_min = (edges.join(lbl, edges.dst == lbl.id)
                        .groupBy("src").agg(F.min("keep_id").alias("nbr_min")))
        return (lbl.join(neighbor_min, lbl.id == neighbor_min.src, "left")
                .select(F.col("id"),
                        F.least(F.col("keep_id"),
                                F.coalesce(F.col("nbr_min"), F.col("keep_id")))
                        .alias("keep_id")))

    labels = lineage_cut(
        edges.groupBy("src").agg(F.min("dst").alias("nbr_min"))
        .select(F.col("src").alias("id"),
                F.least(F.col("src"), F.col("nbr_min")).alias("keep_id")))
    steps_done = 1
    changed = None
    while steps_done < max_iters:
        batch = min(2, max_iters - steps_done)
        updated = labels
        for _ in range(batch):
            updated = propagate(updated)
        updated = lineage_cut(updated)
        changed = (updated.alias("u")
                   .join(labels.alias("l"), "id")
                   .filter(F.col("u.keep_id") != F.col("l.keep_id")).count())
        labels = updated
        steps_done += batch
        if changed == 0:
            break
    return (ids.join(labels, "id", "left")
            .select(F.col("id"),
                    F.coalesce(F.col("keep_id"), F.col("id"))
                    .alias("keep_id"))
            .withColumn("is_kept", F.col("id") == F.col("keep_id")))


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--chains", type=int, default=30_000)
    ap.add_argument("--len", dest="length", type=int, default=8)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 8)

    from pyspark import StorageLevel

    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        resolve_keep_list)
    from ds_ga1004_bigdata_project_spark.session import get_local_session

    spark = get_local_session(cpus, app_name="r15-resolve-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    n = args.chains * args.length
    ids = spark.range(n).select(F.col("id"))
    # repartition("a") mimics a real pair pipeline's tail (an
    # aggregation AQE coalesces to data-sized partitions) so the NEW
    # variant's width scoping reads a DATA-sized count, not range()'s
    # default parallelism.
    pairs = (spark.range(n)
             .filter(F.col("id") % args.length != args.length - 1)
             .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
             .repartition("a")
             .persist(StorageLevel.MEMORY_AND_DISK))
    n_edges = pairs.count()
    ids = ids.persist(StorageLevel.MEMORY_AND_DISK)
    ids.count()
    print(json.dumps({"nodes": n, "edges": n_edges,
                      "pair_partitions": pairs.rdd.getNumPartitions()}))

    def run_old():
        return resolve_old(ids, pairs)

    def run_new():
        return resolve_keep_list(ids, pairs, driver_edge_max=0)

    # identity gate: same (id, keep_id, is_kept) rows
    a = run_old().groupBy("keep_id").count()
    b = run_new().groupBy("keep_id").count()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"label histograms diverge ({diff})"
    # exact expectation on the chain graph: every chain labels to its head
    heads = run_new().filter("is_kept").count()
    assert heads == args.chains, f"expected {args.chains} heads, got {heads}"
    print(json.dumps({"identity": "ok", "clusters": heads}))

    walls = {"old": [], "new": []}
    jobs = {"old": [], "new": []}
    tracker = sc.statusTracker()
    for rep in range(args.reps):
        for name, fn in (("old", run_old), ("new", run_new)):
            group = f"resolve_{name}_{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 3))
            jobs[name].append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup(None, None)
    for name in ("old", "new"):
        w = walls[name]
        print(json.dumps({"variant": name, "walls": w, "min": min(w),
                          "median": round(statistics.median(w), 3),
                          "jobs_per_run": jobs[name]}))
    spark.stop()


if __name__ == "__main__":
    main()
