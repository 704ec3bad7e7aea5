#!/usr/bin/env python
"""Fragment timing for q149_cdc_overlap_clusters (r15, VERDICT r14 #1).

Times each pipeline stage of dedup.cdc_overlap_clusters in one warm JVM
(noop sink, labelled jobs) so the 7.8 s close wall can be attributed:
chunking (token window pass) vs doc_fp distinct vs pair generation vs
cluster resolution + output. Also dumps the executed-plan Exchange count
per fragment.

Usage: python tools/r15_q149_fragments.py [--reps 3]
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

    from ds_ga1004_bigdata_project_spark.operators import dedup
    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session(cpus, app_name="r15-q149-fragments")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = Catalog(spark, sf_dir).documents

    def frag_chunks():
        return dedup.cdc_chunks(docs, window=3)

    def frag_doc_fp():
        ch = dedup.cdc_chunks(docs, window=3)
        return ch.select(F.col("doc_id").alias("id"), "fp").distinct()

    def frag_pairs():
        ch = dedup.cdc_chunks(docs, window=3)
        doc_fp = ch.select(F.col("doc_id").alias("id"), "fp").distinct()
        fp_ok = (doc_fp.groupBy("fp").agg(F.count("*").alias("_nd"))
                 .filter((F.col("_nd") >= 2) & (F.col("_nd") <= 64))
                 .select("fp"))
        elig = doc_fp.join(fp_ok, "fp")
        return (elig.alias("x").join(elig.alias("y"), "fp")
                .filter(F.col("x.id") < F.col("y.id"))
                .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
                .agg(F.count("*").alias("shared"))
                .filter(F.col("shared") >= 2)
                .select("a", "b"))

    def frag_full():
        return dedup.cdc_overlap_clusters(docs, window=3,
                                          min_shared_chunks=2,
                                          max_fp_docs=64)

    frags = [("chunks", frag_chunks), ("doc_fp", frag_doc_fp),
             ("pairs", frag_pairs), ("full", frag_full)]

    # warm: one full pass
    frag_full().write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    for name, fn in frags:
        walls = []
        for rep in range(args.reps):
            spark.catalog.clearCache()
            sc.setJobDescription(f"q149-frag-{name}-{rep}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
        df = fn()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        print(json.dumps({"fragment": name, "walls": walls,
                          "min": min(walls),
                          "exchanges": plan.count("Exchange"),
                          "plan_ops": plan.count("\n(")}))
    spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
