#!/usr/bin/env python
"""Interleaved same-JVM A/B for the r15 subword-loop changes.

Variants (identical outputs asserted in-run):
  * wordpiece OLD — 3 vocab-wide aggregation jobs per iteration
    (pair agg + one per sym_counts broadcast build) + eager fold
    checkpoint (the r14 form, inlined verbatim below);
  * wordpiece NEW — fused single pair+symbol aggregation, lazily
    checkpointed; argmax joins read the checkpointed model-sized
    relation; lazy fold checkpoint (functions/subword.py @ r15).
  * bpe OLD — eager fold checkpoint (2 jobs/iteration);
  * bpe NEW — lazy fold checkpoint (1 job/iteration).

Protocol (SKILL lessons 10/25/33): ONE fresh JVM, warm both variants
first, then alternate OLD/NEW for --reps rounds, report per-rep walls +
min/median and per-variant Spark JOB COUNTS (statusTracker via job
groups — the VERDICT r14 #3 "done" criterion is the per-iteration job
count halving, not just wall clock).

Usage: python tools/r15_subword_ab.py [--reps 4]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def wordpiece_old(df, n_merges=16, min_pair_count=2):
    """Verbatim r14 wordpiece_learn loop (pre-fusion)."""
    from ds_ga1004_bigdata_project_spark.functions.subword import (
        _chars, _loop_confs, _merge_fold)
    from ds_ga1004_bigdata_project_spark.functions.text import ws_tokens

    spark = df.sparkSession
    wp_syms = F.transform(
        _chars(F.col("word")),
        lambda c, i: F.when(i == F.lit(0), c)
        .otherwise(F.concat(F.lit("##"), c)))
    vocab = (df.select(F.explode(ws_tokens(F.lower(F.col("text"))))
                        .alias("word"))
               .filter(F.col("word") != "")
               .groupBy("word").agg(F.count("*").alias("cnt"))
               .withColumn("syms", wp_syms)
               .localCheckpoint())
    merges = []
    with _loop_confs(vocab):
        for rank in range(1, n_merges + 1):
            sym_counts = (vocab.select("cnt", F.explode("syms").alias("sym"))
                          .groupBy("sym").agg(F.sum("cnt").alias("sc")))
            body = F.slice(F.col("syms"), 1, F.size("syms") - 1)
            tail = F.slice(F.col("syms"), 2, F.size("syms") - 1)
            pairs = (vocab.filter(F.size("syms") >= 2)
                     .select("cnt",
                             F.explode(F.zip_with(
                                 body, tail,
                                 lambda a, b: F.struct(a.alias("l"),
                                                       b.alias("r"))))
                              .alias("p"))
                     .groupBy("p.l", "p.r")
                     .agg(F.sum("cnt").alias("pc"))
                     .filter(F.col("pc") >= min_pair_count))
            scored = (pairs
                      .join(F.broadcast(
                          sym_counts.withColumnRenamed("sym", "l")
                                    .withColumnRenamed("sc", "lc")), "l")
                      .join(F.broadcast(
                          sym_counts.withColumnRenamed("sym", "r")
                                    .withColumnRenamed("sc", "rc")), "r")
                      .withColumn("score",
                                  F.col("pc").cast("double")
                                  / (F.col("lc").cast("double")
                                     * F.col("rc").cast("double")))
                      .orderBy(F.desc("score"), "l", "r")
                      .limit(1)
                      .collect())
            if not scored:
                break
            row = scored[0]
            left, right = row["l"], row["r"]
            merged = left + (right[2:] if right.startswith("##") else right)
            merges.append((rank, left, right, merged, int(row["pc"]),
                           int(row["lc"]), int(row["rc"]),
                           round(row["score"], 6)))
            vocab = (vocab.withColumn(
                        "syms", _merge_fold(F.col("syms"), left, right,
                                            fused_sym=merged))
                     .localCheckpoint())
    schema = ("merge_rank int, left string, right string, merged string, "
              "pair_count bigint, left_count bigint, right_count bigint, "
              "score double")
    return spark.createDataFrame(merges, schema)


def bpe_old(df, n_merges=24, min_pair_count=2):
    """Verbatim r14 bpe_learn loop (eager fold checkpoints)."""
    from ds_ga1004_bigdata_project_spark.functions.subword import (
        _chars, _loop_confs, _merge_fold)
    from ds_ga1004_bigdata_project_spark.functions.text import ws_tokens

    spark = df.sparkSession
    vocab = (df.select(F.explode(ws_tokens(F.lower(F.col("text"))))
                        .alias("word"))
               .filter(F.col("word") != "")
               .groupBy("word").agg(F.count("*").alias("cnt"))
               .withColumn("syms", _chars(F.col("word")))
               .localCheckpoint())
    merges = []
    with _loop_confs(vocab):
        for rank in range(1, n_merges + 1):
            body = F.slice(F.col("syms"), 1, F.size("syms") - 1)
            tail = F.slice(F.col("syms"), 2, F.size("syms") - 1)
            pairs = (vocab.filter(F.size("syms") >= 2)
                     .select("cnt",
                             F.explode(F.zip_with(
                                 body, tail,
                                 lambda a, b: F.struct(a.alias("l"),
                                                       b.alias("r"))))
                              .alias("p"))
                     .groupBy("p.l", "p.r")
                     .agg(F.sum("cnt").alias("pc"))
                     .filter(F.col("pc") >= min_pair_count)
                     .orderBy(F.desc("pc"), "l", "r")
                     .limit(1)
                     .collect())
            if not pairs:
                break
            left, right, pc = (pairs[0]["l"], pairs[0]["r"],
                               int(pairs[0]["pc"]))
            merges.append((rank, left, right, left + right, pc))
            vocab = (vocab.withColumn("syms",
                                      _merge_fold(F.col("syms"), left,
                                                  right))
                          .localCheckpoint())
    schema = ("merge_rank int, left string, right string, merged string, "
              "pair_count bigint")
    return spark.createDataFrame(merges, schema)


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 8)

    from ds_ga1004_bigdata_project_spark.functions.subword import (
        bpe_learn, wordpiece_learn)
    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session(cpus, app_name="r15-subword-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = Catalog(spark, sf_dir).documents

    variants = {
        "wp_old": lambda: wordpiece_old(docs, 16).collect(),
        "wp_new": lambda: wordpiece_learn(docs, 16).collect(),
        "bpe_old": lambda: bpe_old(docs, 24).collect(),
        "bpe_new": lambda: bpe_learn(docs, 24).collect(),
    }

    # output-identity gate before timing anything
    wp_a = [tuple(r) for r in wordpiece_old(docs, 16).collect()]
    wp_b = [tuple(r) for r in wordpiece_learn(docs, 16).collect()]
    assert wp_a == wp_b, "wordpiece merge tables diverge"
    bp_a = [tuple(r) for r in bpe_old(docs, 24).collect()]
    bp_b = [tuple(r) for r in bpe_learn(docs, 24).collect()]
    assert bp_a == bp_b, "bpe merge tables diverge"
    print(json.dumps({"identity": "ok", "wp_rows": len(wp_a),
                      "bpe_rows": len(bp_a)}))

    walls: dict[str, list[float]] = {k: [] for k in variants}
    jobs: dict[str, list[int]] = {k: [] for k in variants}
    tracker = sc.statusTracker()
    for rep in range(args.reps):
        for name in ("wp_old", "wp_new", "bpe_old", "bpe_new"):
            spark.catalog.clearCache()
            group = f"{name}_{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            variants[name]()
            walls[name].append(round(time.perf_counter() - t0, 3))
            jobs[name].append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup(None, None)
    for name in variants:
        w = walls[name]
        print(json.dumps({
            "variant": name, "walls": w, "min": min(w),
            "median": round(statistics.median(w), 3),
            "jobs_per_run": jobs[name]}))
    spark.stop()


if __name__ == "__main__":
    main()
