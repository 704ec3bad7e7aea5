#!/usr/bin/env python
"""10× anchor for q208's candidate-pair regime (round 10).

q208_source_overlap_matrix inherits q32's shared-shingle candidate
scaling; this measures it directly under the real-shaped construction
(tools/stress_10x.py's per-replica token bijection — constant dup
density, no cross-replica shingle collisions): pair-count and wall for
the full q208 rollup at 1× and 10×, in one warm JVM.

Expected: pairs ~10× (each replica reproduces the original's internal
pair structure), wall sublinear-to-linear (candidate-bounded join).

Run:  python tools/q208_stress.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
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

    from ds_ga1004_bigdata_project_spark.operators import dedup
    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session(app_name="q208-stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = Catalog(spark, args.sf_dir).documents
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    def salted(i: int):
        tag = F.lit(f"r{i}·")
        return docs.select(
            (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"),
            "source",
            F.array_join(F.transform(F.split(F.col("text"), r"\s+"),
                                     lambda t: F.concat(tag, t)), " ")
             .alias("text"))

    tmp = tempfile.mkdtemp(prefix="q208_stress_")
    p1, p10 = os.path.join(tmp, "d1"), os.path.join(tmp, "d10")
    salted(0).write.mode("overwrite").parquet(p1)
    big = salted(0)
    for i in range(1, 10):
        big = big.unionByName(salted(i))
    big.write.mode("overwrite").parquet(p10)
    spark.read.parquet(p1).count()  # warm

    def run(path: str):
        d = spark.read.parquet(path)
        caches: list = []
        t0 = time.perf_counter()
        pairs = dedup.ngram_jaccard_pairs(d, min_jaccard=0.6,
                                          caches=caches).select("a", "b")
        src = d.select("doc_id", "source")
        lab = (pairs
               .join(F.broadcast(src.withColumnRenamed("doc_id", "a")
                                 .withColumnRenamed("source", "sa")), "a")
               .join(F.broadcast(src.withColumnRenamed("doc_id", "b")
                                 .withColumnRenamed("source", "sb")), "b"))
        out = (lab.groupBy(F.least("sa", "sb").alias("source_a"),
                           F.greatest("sa", "sb").alias("source_b"))
               .agg(F.count(F.lit(1)).alias("n_pairs")))
        rows = out.collect()
        wall = time.perf_counter() - t0
        for c in caches:
            c.unpersist()
        return wall, sum(r.n_pairs for r in rows), len(rows)

    for label, path in (("1x", p1), ("10x", p10)):
        wall, n_pairs, n_cells = run(path)
        print(json.dumps({"corpus": label, "wall_sec": round(wall, 2),
                          "n_pairs": n_pairs, "matrix_cells": n_cells}),
              flush=True)


if __name__ == "__main__":
    main()
