"""10× corpus stress for the round-7/8 CDC + LM operators (VERDICT r7 #4).

Replicates sf0.1's documents 10× (ids shifted, sources rotated — the same
construction as SCALE.md's text-pipeline stress), writes BOTH corpora to
parquet so 1× and 10× pay the same scan path, then times each operator
twice per corpus in one warm JVM and reports min-of-two wall and the
10×/1× ratio.

Run:  python tools/stress_10x.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.functions.text import bigram_lm_nll
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        cdc_duplicate_chunks, cdc_overlap_clusters)
    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session(app_name="stress-10x")
    spark.sparkContext.setLogLevel("ERROR")
    docs = Catalog(spark, args.sf_dir).documents
    n1 = docs.count()

    tmp = tempfile.mkdtemp(prefix="stress10x_")
    p1, p10 = os.path.join(tmp, "docs1"), os.path.join(tmp, "docs10")
    docs.write.mode("overwrite").parquet(p1)
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    srcs = [r[0] for r in docs.select("source").distinct().collect()]
    reps = [docs.select(
        (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"),
        F.element_at(F.array(*[F.lit(s) for s in srcs]),
                     ((F.crc32(F.col("doc_id").cast("string")) + i)
                      % len(srcs) + 1).cast("int")).alias("source"),
        "text") for i in range(10)]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big.write.mode("overwrite").parquet(p10)
    d1 = spark.read.parquet(p1)
    d10 = spark.read.parquet(p10)
    print(f"docs: 1x={n1}  10x={d1.sparkSession.read.parquet(p10).count()}")

    ops = {
        "q146 bigram_lm_nll": lambda d: bigram_lm_nll(d),
        "q147 cdc_duplicate_chunks": lambda d: cdc_duplicate_chunks(d),
        "q149 cdc_overlap_clusters": lambda d: cdc_overlap_clusters(d),
    }

    def t(build, d):
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build(d).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"{'operator':28s} {'1x':>7s} {'10x':>8s} {'ratio':>6s}")
    for name, build in ops.items():
        a = t(build, d1)
        b = t(build, d10)
        print(f"{name:28s} {a:6.2f}s {b:7.2f}s {b / a:5.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
