"""SemDeDup cluster-then-dedup (similarity.semantic_neardup_survivors,
q132): hand-built keep-set semantics and the cluster-restriction property."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators import similarity as sim

from .conftest import SF_SMOKE


def _toy(spark):
    # two tight groups on orthogonal axes + one lone vector
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.99, 0.01]), (2, [0.98, 0.02]),
         (10, [0.0, 1.0]), (11, [0.01, 0.99]),
         (20, [-1.0, -1.0])],
        "vec_id long, embedding array<double>")


def _cents(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, -1.0])],
        "cid long, cvec array<double>")


def test_min_id_survives_each_neardup_group(spark):
    out = {r["vec_id"]: r["cid"] for r in sim.semantic_neardup_survivors(
        _toy(spark), _cents(spark), threshold=0.95).collect()}
    # each near-dup group keeps its lowest id; the loner survives
    assert out == {0: 0, 10: 1, 20: 2}


def test_neardups_in_different_clusters_are_not_compared(spark):
    # vectors 0 and 10 are orthogonal (cos 0) but 0 and 20 would score -1;
    # with threshold=-1.0 everything IN THE SAME cluster dedups, yet
    # cross-cluster pairs are never considered — one survivor per cluster.
    out = sim.semantic_neardup_survivors(
        _toy(spark), _cents(spark), threshold=-1.0)
    rows = {r["vec_id"]: r["cid"] for r in out.collect()}
    assert rows == {0: 0, 10: 1, 20: 2}


def test_quality_gate_runs_identically_on_a_stream(spark, tmp_path):
    """q128's rule cascade is pure stateless expressions, so the SAME
    builder logic runs under readStream unchanged — the batch/streaming
    unification story, asserted: streaming output == batch output."""
    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    docs = Catalog(spark, SF_SMOKE).documents
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    batch = REGISTRY["q128_quality_gate"].build(spark, SF_SMOKE)

    # the SAME library columns over a streaming source
    from ds_ga1004_bigdata_project_spark.functions import text as T

    stream_docs = spark.readStream.schema(docs.schema).parquet(src)
    gate = T.quality_gate_columns(F.col("text"), F.col("lang"))
    out = stream_docs.select(
        "doc_id", gate["n_tokens"].alias("n_tokens"),
        gate["keep"].alias("keep"), gate["reason"].alias("reason"))
    (out.writeStream.format("memory").queryName("stream_gate")
        .outputMode("append").trigger(availableNow=True).start()
        .awaitTermination(120))
    got = sorted(map(tuple, spark.table("stream_gate").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_survivors_partition_matches_assignment(spark):
    """Survivors ⊆ corpus, one-or-more per non-empty cluster, and every
    dropped id has a smaller-id survivor partner in its own cluster at the
    fixture scale."""
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    emb = Catalog(spark, SF_SMOKE).embeddings
    cents = (emb.filter(F.col("vec_id") < 8)
             .select(F.col("vec_id").alias("cid"),
                     F.col("embedding").alias("cvec")))
    out = sim.semantic_neardup_survivors(emb, cents, threshold=0.3)
    n, n_surv = emb.count(), out.count()
    assert 0 < n_surv < n
    # min id of every cluster always survives (nothing smaller to drop it)
    from ds_ga1004_bigdata_project_spark.ml import kmeans

    assigned = kmeans.assign(emb.select("vec_id", "embedding"), cents)
    mins = assigned.groupBy("cid").agg(F.min("vec_id").alias("vec_id"))
    missing = mins.join(out, ["cid", "vec_id"], "left_anti")
    assert missing.count() == 0
