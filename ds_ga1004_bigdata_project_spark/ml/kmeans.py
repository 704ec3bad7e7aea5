"""Distributed Lloyd k-means over an ``array<float>`` embedding column.

Embedding clustering is a workhorse of training-data curation (semantic
bucketing for mixture control, cluster-balanced sampling, near-dup triage —
the SemDeDup/DSIR family of pipelines). Spark's ``pyspark.ml`` KMeans wants
``Vector`` columns and its init is RNG-dependent; this implementation stays
on the native array column, is fully deterministic (explicit init = the k
lowest-id vectors), and every step is registered JVM expressions:

* **assign** — the centroid table folds to ONE row holding an
  ``array<struct(cid, vec)>`` (k·dim doubles — kilobytes), broadcast to
  every task; each row picks ``array_min`` over per-centroid
  ``struct(round(d2, 6), cid)`` structs, so nearest-centroid choice is a
  map-side codegen'd expression with a deterministic (d2, cid) tie-break
  and NO shuffle of the corpus.
* **update** — new centroids are per-(cid, dim) means: ``posexplode`` the
  assigned vectors, partial-agg ``avg`` per (cid, pos), reassemble with
  ``sort_array(collect_list(struct(pos, mean)))``. The only shuffle moves
  k·dim aggregates, map-side combined — never the corpus.

At 100 TB: per-iteration cost is one scan + one k·dim-sized shuffle, the
textbook scalable Lloyd shape. The corpus is persisted once by the caller
(not per iteration) since every iteration re-reads it.

Cross-engine note: distances accumulate in DOUBLE in ascending dimension
order on both engines (Spark ``aggregate`` fold / DuckDB ``list_sum`` over
``range``), so the q126 assignment oracle hash-matches exactly; the
iterative path (q127) is certified by value-pinned snapshots instead —
a recursive-CTE SQL twin would be certifying the oracle, not the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sq_l2(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² in double precision, ascending-index fold order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v)


def centroids_row(centroids: DataFrame, cid_col: str = "cid",
                  vec_col: str = "cvec") -> DataFrame:
    """Fold a (cid, vec) table into one broadcastable array-of-structs row."""
    return centroids.agg(F.sort_array(F.collect_list(
        F.struct(F.col(cid_col).alias("cid"),
                 F.col(vec_col).alias("cvec")))).alias("cents"))


def seed_centroids(df: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Deterministic init: the k lowest-id vectors, cid = 0..k-1 by id order.

    Explicit and engine-reproducible where kmeans|| is RNG- and
    partitioning-dependent. ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — per-task top-k heaps, never a global sort —
    and only the k-row RESULT goes through the cid-numbering window (a
    global window over the corpus here would be the single-partition
    anti-pattern the ranks module exists to avoid)."""
    topk = df.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k)
    w = F.row_number().over(Window.orderBy(F.col(id_col)))
    return topk.select((w - 1).alias("cid"), F.col(vec_col).alias("cvec"))


def assign(df: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
           vec_col: str = "embedding", scale: int = 6) -> DataFrame:
    """Nearest-centroid assignment: adds ``cid`` and ``d2`` (rounded).

    One broadcast of a single kilobyte-sized row; zero corpus shuffle."""
    joined = df.join(F.broadcast(centroids_row(centroids)))
    best = F.array_min(F.transform(
        "cents",
        lambda c: F.struct(
            F.round(_sq_l2(F.col(vec_col), c["cvec"]), scale).alias("d2"),
            c["cid"].alias("cid"))))
    return (joined.withColumn("_best", best)
            .select(*df.columns,
                    F.col("_best.cid").alias("cid"),
                    F.col("_best.d2").alias("d2")))


def update_centroids(assigned: DataFrame, vec_col: str = "embedding",
                     cid_col: str = "cid") -> DataFrame:
    """Per-cluster element-wise mean → new (cid, cvec) table.

    posexplode → partial-agg avg per (cid, pos) → sort_array reassembly;
    only k·dim aggregate rows shuffle. Empty clusters drop out (standard
    Lloyd); callers keep k stable via the deterministic init."""
    per_dim = (assigned
               .select(cid_col, F.posexplode(vec_col).alias("pos", "v"))
               .groupBy(cid_col, "pos")
               .agg(F.avg(F.col("v").cast("double")).alias("m")))
    return (per_dim.groupBy(cid_col)
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("cvec"))
            .select(F.col(cid_col).alias("cid"), "cvec"))


def lloyd(df: DataFrame, k: int, n_iter: int, id_col: str = "vec_id",
          vec_col: str = "embedding") -> DataFrame:
    """``n_iter`` Lloyd rounds from the deterministic seed; returns the
    final assignment (id, cid, d2). Caller should persist ``df`` — each
    iteration is one scan over it."""
    cents = seed_centroids(df, k, id_col, vec_col)
    for _ in range(n_iter):
        assigned = assign(df, cents, id_col, vec_col)
        cents = update_centroids(assigned, vec_col)
    return assign(df, cents, id_col, vec_col)
