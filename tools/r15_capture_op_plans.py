#!/usr/bin/env python
"""Pre-checkpoint OPERATOR plan capture for r15 evidence (SKILL lesson
34: localCheckpoint builders hide their computation plan — dump the
operator's pre-checkpoint DataFrame instead).

Captures, to plans/r15/<name>_<tag>.txt:
  * q173_op — dedup.prefix_filtered_jaccard_pairs(documents, t=0.5, n=3)
    (the q173 computation; r15 changes only the p/q rationalization
    literals, 10^9 -> 10^6);
  * wp_iter1_scored — wordpiece_learn's FIRST-iteration argmax plan (the
    r15 fusion target: before = 3 vocab-wide aggregation subtrees, after
    = joins over one lazily-checkpointed combined-counts relation).

Usage: python tools/r15_capture_op_plans.py before|after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dump(df, name: str, tag: str, header: str, sf_dir: str) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(f"# {header} at {sf_dir} [{tag}]\n")
        fh.write(plan)
    print(f"wrote {path} ({plan.count(chr(10))} lines)")


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ds_ga1004_bigdata_project_spark.functions.subword import (
        _chars, _loop_confs)  # noqa: F401
    from ds_ga1004_bigdata_project_spark.functions.text import ws_tokens
    from ds_ga1004_bigdata_project_spark.operators import dedup
    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session(8, app_name="r15-op-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    docs = Catalog(spark, sf_dir).documents

    _dump(dedup.prefix_filtered_jaccard_pairs(docs, threshold=0.5, n=3),
          "q173_op", tag,
          "q173 pre-checkpoint computation plan "
          "(dedup.prefix_filtered_jaccard_pairs, t=0.5, n=3)", sf_dir)

    # First-iteration WordPiece argmax plan: replicate the loop body up
    # to (but not including) the .collect() so the SCORING plan prints.
    wp_syms = F.transform(
        _chars(F.col("word")),
        lambda c, i: F.when(i == F.lit(0), c)
        .otherwise(F.concat(F.lit("##"), c)))
    vocab = (docs.select(F.explode(ws_tokens(F.lower(F.col("text"))))
                         .alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count("*").alias("cnt"))
             .withColumn("syms", wp_syms)
             .localCheckpoint())
    body = F.slice(F.col("syms"), 1, F.size("syms") - 1)
    tail = F.slice(F.col("syms"), 2, F.size("syms") - 1)
    if tag == "before":
        sym_counts = (vocab.select("cnt", F.explode("syms").alias("sym"))
                      .groupBy("sym").agg(F.sum("cnt").alias("sc")))
        pairs = (vocab.filter(F.size("syms") >= 2)
                 .select("cnt",
                         F.explode(F.zip_with(
                             body, tail,
                             lambda a, b: F.struct(a.alias("l"),
                                                   b.alias("r"))))
                          .alias("p"))
                 .groupBy("p.l", "p.r")
                 .agg(F.sum("cnt").alias("pc"))
                 .filter(F.col("pc") >= 2))
    else:
        pair_structs = F.when(
            F.size("syms") >= 2,
            F.zip_with(body, tail,
                       lambda a, b: F.struct(a.alias("l"), b.alias("r")))
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        sym_structs = F.transform(
            F.col("syms"),
            lambda s: F.struct(s.alias("l"),
                               F.lit(None).cast("string").alias("r")))
        counts = (vocab.select(
                      "cnt",
                      F.explode(F.concat(pair_structs, sym_structs))
                       .alias("p"))
                  .groupBy("p.l", "p.r")
                  .agg(F.sum("cnt").alias("c"))
                  .localCheckpoint(eager=False))
        sym_counts = (counts.filter(F.col("r").isNull())
                      .select(F.col("l").alias("sym"),
                              F.col("c").alias("sc")))
        pairs = (counts.filter(F.col("r").isNotNull())
                 .select("l", "r", F.col("c").alias("pc"))
                 .filter(F.col("pc") >= 2))
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
              .limit(1))
    _dump(scored, "wp_iter1_scored", tag,
          "wordpiece_learn iteration-1 argmax plan (loop body, "
          "pre-collect)", sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
