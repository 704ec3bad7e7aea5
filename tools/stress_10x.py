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


def real_shaped(sf_dir: str) -> None:
    """Constant-dup-density 10× stress for q149 (VERDICT r8 #4).

    The replica corpus the main mode uses is ADVERSARIAL for overlap
    clustering: every document becomes a 10-clique, so the edge relation
    grows ~100× by construction (880× measured with rotated sources).
    Real 10× growth is 10× FRESH documents at the same duplication rate.
    Construction: replica i rewrites every whitespace token t as
    ``r{i}·t`` — a per-replica bijection on the token alphabet, so each
    replica preserves the original corpus's internal duplicate-pair
    structure exactly (same texts, isomorphic content) while no chunk
    fingerprint can ever collide ACROSS replicas (every token carries
    the replica tag). Dup density is therefore constant and the edge
    relation must grow ~10× (± chunk-boundary variance: CDC boundaries
    are content-hash-defined, so each salt re-draws them). The 1× corpus
    is the replica-0 rewrite of the original, so both sides pay the
    identical salting+scan path."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        cdc_chunks, cdc_overlap_clusters)
    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session(app_name="stress-10x-real")
    spark.sparkContext.setLogLevel("ERROR")
    docs = Catalog(spark, sf_dir).documents
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    def salted(i: int):
        tag = F.lit(f"r{i}·")
        return docs.select(
            (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"),
            "source",
            F.array_join(F.transform(F.split(F.col("text"), r"\s+"),
                                     lambda t: F.concat(tag, t)), " ")
             .alias("text"))

    tmp = tempfile.mkdtemp(prefix="stress10x_real_")
    p1, p10 = os.path.join(tmp, "docs1"), os.path.join(tmp, "docs10")
    salted(0).write.mode("overwrite").parquet(p1)
    big = salted(0)
    for i in range(1, 10):
        big = big.unionByName(salted(i))
    big.write.mode("overwrite").parquet(p10)
    d1, d10 = spark.read.parquet(p1), spark.read.parquet(p10)
    print(f"docs: 1x={d1.count()}  10x={d10.count()}")

    def edges(d):
        ch = cdc_chunks(d)
        doc_fp = ch.select(F.col("doc_id").alias("id"), "fp").distinct()
        fp_ok = (doc_fp.groupBy("fp").agg(F.count("*").alias("nd"))
                 .filter((F.col("nd") >= 2) & (F.col("nd") <= 64))
                 .select("fp"))
        elig = doc_fp.join(fp_ok, "fp")
        return (elig.alias("x").join(elig.alias("y"), "fp")
                .filter(F.col("x.id") < F.col("y.id"))
                .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
                .agg(F.count("*").alias("shared"))
                .filter(F.col("shared") >= 2).count())

    e1, e10 = edges(d1), edges(d10)
    print(f"edges: 1x={e1}  10x={e10}  ratio={e10 / max(e1, 1):.2f}x "
          f"(expect ~10x; replica structure is exact, boundaries re-draw)")

    def t(d):
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            cdc_overlap_clusters(d).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    w1, w10 = t(d1), t(d10)
    print(f"q149 cdc_overlap_clusters wall: 1x={w1:.2f}s  10x={w10:.2f}s  "
          f"ratio={w10 / w1:.2f}x")
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--real-shaped", action="store_true",
                    help="constant-dup-density 10x variant (q149)")
    args = ap.parse_args()
    if args.real_shaped:
        real_shaped(args.sf_dir)
        return

    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.functions.text import (
        bigram_lm_nll, gopher_repetition)
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
        "q188 gopher_repetition": lambda d: gopher_repetition(d),
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
