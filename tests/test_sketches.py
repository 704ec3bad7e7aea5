"""Count-min sketch (operators/sketches.py, q129): structural overcount
guarantee, shard-merge associativity, weighted-build equivalence, and the
cross-engine bucket convention against DuckDB."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.functions import text as T
from ds_ga1004_bigdata_project_spark.operators import sketches
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_SMOKE

WIDTH = 32


def _tokens(spark):
    return Catalog(spark, SF_SMOKE).documents.select(
        "doc_id", F.explode(T.ws_tokens(F.col("text"))).alias("token"))


def test_estimate_never_undercounts_any_token(spark):
    tokens = _tokens(spark)
    grid = sketches.cms_build(tokens, width=WIDTH)
    exact = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    est = sketches.cms_estimate(grid, exact.select("token"), width=WIDTH)
    bad = (exact.join(est, "token")
           .filter(F.col("cms_estimate") < F.col("exact")))
    assert bad.count() == 0


def test_shard_merge_equals_direct_build(spark):
    tokens = _tokens(spark)
    direct = sketches.cms_build(tokens, width=WIDTH)
    merged = sketches.cms_merge(
        sketches.cms_build(tokens.filter(F.col("doc_id") % 2 == 0),
                           width=WIDTH),
        sketches.cms_build(tokens.filter(F.col("doc_id") % 2 == 1),
                           width=WIDTH))
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0


def test_weighted_build_equals_row_level_build(spark):
    tokens = _tokens(spark)
    pre = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    direct = sketches.cms_build(tokens, width=WIDTH)
    weighted = sketches.cms_build(pre, weight_col="cnt", width=WIDTH)
    assert direct.exceptAll(weighted).count() == 0
    assert weighted.exceptAll(direct).count() == 0


def test_bucket_convention_matches_duckdb(spark):
    """The md5-nibble bucket arithmetic must agree byte-for-byte with the
    SQL twin — that agreement is the whole basis of q129's oracle."""
    words = ["the", "quick", "brown", "Fox", "jumps", "0", "naïve", ""]
    df = spark.createDataFrame([(w,) for w in words], "token string")
    got = {}
    for row_idx in (0, 3):
        for r in df.select(
                "token",
                sketches._bucket(F.col("token"), row_idx, WIDTH)
                .alias("b")).collect():
            got[(row_idx, r["token"])] = r["b"]
    con = duckdb.connect()
    for row_idx in (0, 3):
        for w in words:
            sql = sketches._bucket_sql("?", row_idx, WIDTH).replace("?", "$tok")
            want = con.execute(f"SELECT {sql} AS b",
                               {"tok": w}).fetchone()[0]
            assert got[(row_idx, w)] == want, (row_idx, w)


def test_streaming_partials_fold_to_batch_grid(spark, tmp_path):
    """Incremental maintenance: stream the corpus in two forced micro-batches
    (maxFilesPerTrigger=1), append per-batch cell partials, fold on read —
    the result must be CELL-IDENTICAL to the one-shot batch grid."""
    docs = Catalog(spark, SF_SMOKE).documents.select("doc_id", "text")
    src = str(tmp_path / "docs_stream")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    stream_tokens = (spark.readStream.schema("doc_id long, text string")
                     .option("maxFilesPerTrigger", 1).parquet(src)
                     .select(F.explode(T.ws_tokens(F.col("text")))
                             .alias("token")))
    out = str(tmp_path / "cms_partials")
    sketches.run_streaming_cms_partials(
        stream_tokens, out, str(tmp_path / "ckpt"), width=WIDTH)

    # more than one batch really ran (≥ 2 files of partials appended)
    folded = sketches.read_cms_grid(spark, out)
    raw = spark.read.parquet(out)
    assert raw.count() > folded.count()

    batch_grid = sketches.cms_build(_tokens(spark), width=WIDTH)
    assert folded.exceptAll(batch_grid).count() == 0
    assert batch_grid.exceptAll(folded).count() == 0


def test_grid_is_bounded_by_depth_times_width(spark):
    grid = sketches.cms_build(_tokens(spark), width=WIDTH, depth=4)
    assert grid.count() <= 4 * WIDTH
    assert set(grid.columns) == {"row", "bucket", "cnt"}
