#!/usr/bin/env python
"""10× corpus stress for the round-11 wave's two widest shapes
(SCALE.md dossier evidence, the stress_10x methodology):

- q211_mad_outliers — two value-domain histogram medians + broadcast
  joins back: the histogram is value-distinct, so 10× docs at the same
  length distribution must grow the WINDOW input ~1× and the scans ~10×.
- q218_source_vocab_overlap — (source, token)-distinct postings
  self-join: per-token fan-out is bounded by |sources|, so 10× docs at
  the same vocabulary grows the postings relation sub-linearly and the
  pair relation ~1×.

Corpus construction: the stress_10x replica (ids shifted, sources kept —
keeping |sources| constant is the point for q218), both corpora written
to parquet so 1× and 10× pay the same scan path; min-of-two warm timings.

Run:  python tools/wave11_stress.py [--sf-dir /root/testdata/sf0.1]
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session(app_name="wave11-stress")
    spark.sparkContext.setLogLevel("ERROR")

    docs = Catalog(spark, args.sf_dir).documents
    n = docs.count()
    root = tempfile.mkdtemp(prefix="wave11_stress_")
    one_dir = os.path.join(root, "sf1x")
    ten_dir = os.path.join(root, "sf10x")
    os.makedirs(one_dir)
    os.makedirs(ten_dir)
    docs.write.parquet(os.path.join(one_dir, "documents.parquet"))
    ten = docs
    for i in range(1, 10):
        ten = ten.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n)))
    ten.write.parquet(os.path.join(ten_dir, "documents.parquet"))

    for name in ("q211_mad_outliers", "q212_token_mass_quantiles",
                 "q218_source_vocab_overlap"):
        walls = {}
        for tag, d in (("1x", one_dir), ("10x", ten_dir)):
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                REGISTRY[name].build(spark, d).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            walls[tag] = round(best, 2)
        ratio = round(walls["10x"] / walls["1x"], 2)
        print(f"{name}: 1x {walls['1x']} s, 10x {walls['10x']} s, "
              f"ratio {ratio}")
    spark.stop()


if __name__ == "__main__":
    main()
