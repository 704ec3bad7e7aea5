#!/usr/bin/env python
"""Measure BM25 query-term pruning under a realistic vocabulary
(VERDICT r9 #6).

q194's registered fixture is honest about its worst case: the synthetic
documents table has a ~30-word vocabulary, so the broadcast query-term
filter in `functions.text.bm25_topk` prunes NOTHING — every corpus
token is a query term and the full token explode enters the postings
shuffle. This tool builds a same-shape side corpus with a realistic
vocabulary (~20k distinct tokens, quadratically skewed toward the head
like natural text) and runs the exact q194 shape (20 probe docs,
8-token-prefix queries, exclude_query_doc, MRR rollup) on BOTH corpora
in one warm JVM, reporting wall time and the postings-relation row
count (the volume that survives the broadcast filter and feeds every
downstream shuffle).

The corpus is hash-generated (xxhash64 → token rank), fully
deterministic and engine-side — no driver-side text synthesis, no RNG
state. Docs average the same length as the fixture (~300 tokens).

Run:  python tools/q194_pruning_bench.py
Emits one JSON line per (corpus, run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.functions.text import bm25_topk
    from ds_ga1004_bigdata_project_spark.session import get_local_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 8)
    spark = get_local_session(cpus, app_name="q194-pruning-bench")
    spark.sparkContext.setLogLevel("ERROR")

    n_docs, doc_len = 5_000, 300

    def corpus(vocab: int, tag: str):
        # token rank = floor(vocab · u²) with u = hash-uniform in [0,1):
        # quadratic skew gives a heavy head (stopword-like) and a long
        # tail, the regime where query-term pruning has something to cut.
        base = spark.range(n_docs).select(F.col("id").alias("doc_id"))

        def tok(pos):
            u = (F.pmod(F.xxhash64(F.col("doc_id"), pos, F.lit(tag)),
                        F.lit(1 << 20))) / F.lit(float(1 << 20))
            return F.concat(F.lit("w"),
                            F.floor(u * u * F.lit(vocab)).cast("string"))

        return base.select(
            "doc_id",
            F.array_join(F.transform(
                F.sequence(F.lit(0), F.lit(doc_len - 1)), tok), " ")
             .alias("text"))

    import tempfile
    tmp = tempfile.mkdtemp(prefix="q194_prune_")
    paths = {}
    for tag, vocab in (("vocab30", 30), ("vocab20k", 20_000)):
        p = os.path.join(tmp, tag)
        corpus(vocab, tag).write.mode("overwrite").parquet(p)
        paths[tag] = p

    # Warm plan shapes once off the books.
    spark.read.parquet(paths["vocab30"]).count()

    for tag in ("vocab30", "vocab20k"):
        docs = spark.read.parquet(paths[tag])
        probes = (docs.filter(F.col("doc_id") < 20)
                  .select(F.col("doc_id").alias("query_id"),
                          F.array_join(F.slice(
                              F.split(F.lower(F.col("text")), r"\s+"),
                              1, 8), " ").alias("qtext")))
        n_distinct = (docs.select(F.explode(F.split(F.lower("text"), r"\s+"))
                                  .alias("t")).select("t").distinct().count())
        for run in (1, 2):
            t0 = time.perf_counter()
            ranked = bm25_topk(docs, probes, k=10)
            hits = (probes.select("query_id")
                    .join(ranked.filter(F.col("doc_id") == F.col("query_id"))
                          .select("query_id", "rank"), "query_id", "left")
                    .select(F.round(F.avg(F.when(
                        F.col("rank").isNotNull(),
                        F.lit(1.0) / F.col("rank")).otherwise(F.lit(0.0))),
                        4).alias("mrr")))
            mrr = hits.collect()[0][0]
            wall = time.perf_counter() - t0
            # Postings volume: rows surviving the broadcast filter.
            toks = F.split(F.lower(F.col("text")), r"\s+")
            qset = (probes.select(F.explode(F.split(F.lower("qtext"),
                                                    r"\s+")).alias("t"))
                    .distinct())
            postings = (docs.select(F.explode(toks).alias("t"))
                        .join(F.broadcast(qset), "t").count())
            total = n_docs * doc_len
            print(json.dumps({
                "corpus": tag, "run": run, "distinct_tokens": n_distinct,
                "wall_sec": round(wall, 2), "mrr": mrr,
                "postings_rows": postings, "token_rows": total,
                "pruned_pct": round(100 * (1 - postings / total), 1)}),
                flush=True)


if __name__ == "__main__":
    main()
