"""DataFrame-native evaluation metrics (SURVEY §2.11 M5/M6, §7.2 M5).

The reference evaluated with RDD ``mllib.RankingMetrics`` after a per-row
``.rdd.map`` lambda (``one_train.py:49-54``) — a JVM→Python-worker
serialization of every row (B1, the anti-pattern). These implementations stay
entirely in Catalyst: posexplode the prediction arrays, hash-join the truth
sets, window-scan for running hit counts, aggregate. At 100 TB the metric is
one shuffle on user_id + one scalar reduction.

Definitions match ``org.apache.spark.mllib.evaluation.RankingMetrics``:

- ``precision@k`` = (#relevant among first k predictions) / k  (fixed k denom)
- ``MAP`` = mean over users of Σ_{hit at rank i} (hits≤i / i) / |truth set|,
  duplicates in predictions count each occurrence, empty truth → 0
- ``NDCG@k`` = DCG@k / IDCG@min(|truth|, k) with binary relevance, empty → 0

Pinned numerically against ``mllib.RankingMetrics`` in
``tests/test_ranking_metrics.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rmse(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """RMSE as a native aggregate (A9; replaces RegressionEvaluator —
    ``one_train.py:57-58``). Returns a 1-row DataFrame (rmse, n)."""
    err = F.col(pred_col) - F.col(label_col)
    return df.agg(
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.count(F.lit(1)).alias("n"),
    )


def ranking_metrics(pred_df: DataFrame, truth_df: DataFrame, k: int,
                    user_col: str = "user", pred_col: str = "pred_items",
                    truth_col: str = "truth_items",
                    round_scale: int | None = 6) -> DataFrame:
    """MAP / precision@k / NDCG@k over (ordered prediction array, truth array)
    pairs, fully in DataFrame ops.

    ``pred_df``: (user, array<item> ordered best-first).
    ``truth_df``: (user, array<item>); users absent from truth_df score 0,
    mirroring mllib's empty-truth handling. Users with an EMPTY prediction
    array are excluded from the averages (the semantics the posexplode
    formulation always had; recommenders never emit empty lists). Returns
    one row: (map, precision_at_k, ndcg_at_k, n_users).

    Physical plan (the r4→r5 rewrite — this was the most shuffle-intensive
    shape in the suite): ONE hash join on the user key between the two
    array-per-user tables, then every per-position quantity (running hit
    count, AP numerator, hits@k, DCG) folds inside a single
    ``F.aggregate`` over the prediction array — pure JVM array expressions,
    no posexplode, no per-(user,item) join, no window shuffle, no regroup.
    Shuffles: 2 (the join's two sides) + the scalar reduction, versus 5 in
    the exploded form; bytes shuffled drop from one row per (user, item) to
    one row per user."""
    pred = pred_df.select(
        F.col(user_col).alias("u"), F.col(pred_col).alias("preds")) \
        .filter(F.size("preds") > 0)
    truth = truth_df.select(
        F.col(user_col).alias("u"),
        F.array_distinct(F.col(truth_col)).alias("tset"))
    joined = pred.join(truth, "u", "left")

    # Fold over prediction positions: acc = (cum hits, AP numerator,
    # hits@k, DCG@k). array_contains(NULL tset, x) is NULL → no hit.
    def _step(acc, i):
        hit = F.coalesce(
            F.array_contains(F.col("tset"),
                             F.element_at(F.col("preds"), i + 1)),
            F.lit(False)).cast("int")
        cum = (acc.getField("cum") + hit).alias("cum")
        return F.struct(
            cum,
            (acc.getField("ap") + hit.cast("double") * cum.cast("double")
             / (i.cast("double") + 1.0)).alias("ap"),
            (acc.getField("hk")
             + F.when(i < k, hit).otherwise(F.lit(0))).alias("hk"),
            (acc.getField("dcg")
             + F.when(i < k, hit.cast("double") / F.log2(i.cast("double") + 2.0))
             .otherwise(F.lit(0.0))).alias("dcg"),
        )

    zero = F.struct(F.lit(0).alias("cum"), F.lit(0.0).alias("ap"),
                    F.lit(0).alias("hk"), F.lit(0.0).alias("dcg"))
    folded = F.aggregate(
        F.sequence(F.lit(0), F.size("preds") - 1), zero, _step)

    per_user = joined.select(
        folded.alias("s"),
        F.when(F.col("tset").isNull(), F.lit(0))
        .otherwise(F.size("tset")).alias("truth_size"))

    # IDCG@min(truth_size, k): Σ_{i=0}^{m-1} 1/log2(i+2), m = min(ts, k)
    m = F.least(F.col("truth_size"), F.lit(k))
    idcg = F.when(m > 0, F.aggregate(
        F.sequence(F.lit(0), m - 1),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 2),
    )).otherwise(F.lit(None))

    finalized = per_user.select(
        F.when(F.col("truth_size") > 0,
               F.col("s.ap") / F.col("truth_size"))
        .otherwise(0.0).alias("ap"),
        (F.col("s.hk") / F.lit(float(k))).alias("p_at_k"),
        F.coalesce(F.col("s.dcg") / idcg, F.lit(0.0)).alias("ndcg"),
    )
    out = finalized.agg(
        F.avg("ap").alias("map"),
        F.avg("p_at_k").alias("precision_at_k"),
        F.avg("ndcg").alias("ndcg_at_k"),
        F.count(F.lit(1)).alias("n_users"),
    )
    if round_scale is not None:
        out = out.select(
            F.round("map", round_scale).alias("map"),
            F.round("precision_at_k", round_scale).alias("precision_at_k"),
            F.round("ndcg_at_k", round_scale).alias("ndcg_at_k"),
            "n_users",
        )
    return out


#: Distinct-score count below which the cumulative-count step runs as one
#: single-partition window over the per-score table. The per-score table is
#: 24 bytes/row — 1M rows is a ~24 MB single-task sort, milliseconds on any
#: executor; above it the range-partitioned prefix sum takes over.
AUC_SMALL_DISTINCT_MAX = 1_000_000


def auc(df: DataFrame, score_col: str, label_col: str,
        round_scale: int | None = 6,
        small_distinct_max: int = AUC_SMALL_DISTINCT_MAX) -> DataFrame:
    """Binary-classification ROC AUC as a native aggregate, by the
    rank-statistic identity (Mann-Whitney U):

        AUC = (Σ_{positives} avgrank(score) − P(P+1)/2) / (P·N)

    with average ranks for score ties (avgrank = rank + (ties−1)/2, ascending
    scores), which is exactly the trapezoidal ROC AUC.

    Physical plan — the key move is that NOTHING is ever globally ranked
    row-by-row: the input collapses FIRST to one row per distinct score
    (``groupBy(score)`` — map-side partial agg, shuffle bounded by score
    cardinality, not row count). The average rank of a score group is fully
    determined by the cumulative row count of smaller scores:

        avgrank(s) = cum_before(s) + (cnt(s) + 1) / 2

    so only the per-score table needs an ordered cumulative sum. Dispatch is
    adaptive on the DISTINCT count (already known from sizing the persist):

    - ≤ ``small_distinct_max`` distinct scores (integer-ish predictors,
      rounded probabilities, any realistically-bucketed score): one
      single-partition window over the tiny per-score table — no
      range-sort machinery, no extra jobs. This is NOT the unpartitioned-
      window trap: the window input is the already-aggregated score table,
      whose size the dispatch just bounded.
    - above it (continuous scores at corpus scale): the range-partitioned
      prefix sum (``operators.ranks.global_prefix_sum`` — every task
      cumsums a slice, only per-partition sums reach the driver).

    The metric is a single scalar, so it is computed EAGERLY — and all
    internal persists are released in a ``finally`` so an exception cannot
    leak storage blocks (VERDICT r2 persist-leak audit; ADVICE r3).

    ``label_col`` must be 0/1. Returns one row (auc, n_pos, n_neg). A
    degenerate split (no positives or no negatives) has no defined ROC —
    ``auc`` is NULL in that case, never a crash.
    """
    from ..operators.ranks import global_prefix_sum

    caches: list[DataFrame] = []
    per_score = df.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos_cnt")).persist()
    caches.append(per_score)
    try:
        n_distinct = per_score.count()
        if n_distinct <= small_distinct_max:
            w = (Window.orderBy("s")
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            cum = per_score.withColumn("_cum", F.sum("cnt").over(w))
        else:
            parallelism = df.sparkSession.sparkContext.defaultParallelism
            parts = max(1, min(parallelism, -(-n_distinct // 1_000_000)))
            cum = global_prefix_sum(per_score, [F.col("s").asc()], "cnt",
                                    out_col="_cum", num_partitions=parts,
                                    caches=caches)
        avgrank = F.col("_cum") - F.col("cnt") + (F.col("cnt") + 1) / 2.0
        row = cum.agg(
            F.sum(F.col("pos_cnt") * avgrank).alias("pos_rank_sum"),
            F.sum("pos_cnt").alias("n_pos"),
            F.sum("cnt").alias("n_total")).first()
    finally:
        for c in caches:
            c.unpersist()

    n_pos = int(row["n_pos"] or 0)
    n_neg = int(row["n_total"] or 0) - n_pos
    if n_pos > 0 and n_neg > 0:
        auc_val = (row["pos_rank_sum"] - n_pos * (n_pos + 1) / 2.0) \
            / (n_pos * n_neg)
    else:
        auc_val = None
    out = df.sparkSession.createDataFrame(
        [(auc_val, n_pos, n_neg)], "auc double, n_pos bigint, n_neg bigint")
    if round_scale is not None:
        out = out.select(F.round("auc", round_scale).alias("auc"),
                         "n_pos", "n_neg")
    return out


def retrieval_recall_at_k(truth: DataFrame, cand: DataFrame, k: int,
                          query_col: str = "query_id",
                          id_col: str = "neighbor_id") -> DataFrame:
    """Per-query recall@k of a candidate retrieval list against a
    ground-truth list — the approximation-quality gauge for every ANN
    tier here (quantized/IVF/LSH vs exact brute force): how much of the
    true top-k does the cheap tier actually return?

    Both inputs are top-k result frames (``query_col``, ``id_col``, …);
    only membership matters, ranks don't (standard ANN-recall
    convention). One broadcast-sized equi-join on (query, id) and a
    query-keyed count — the eval costs candidates×1 lookup, nothing
    corpus-shaped. ``n_overlap`` is an exact integer; ``recall`` is the
    IEEE quotient n_overlap/k rounded to 4 dp (identical across engines
    for small integers).

    Returns (``query_col``, n_overlap, recall) — one row per
    ground-truth query, including zero-overlap ones."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    hits = cand.select(query_col, F.col(id_col).alias("_cand_id"))
    return (truth.select(query_col, id_col)
            .join(hits,
                  (truth[query_col] == hits[query_col])
                  & (F.col(id_col) == F.col("_cand_id")),
                  "left")
            .select(truth[query_col].alias(query_col), "_cand_id")
            .groupBy(query_col)
            .agg(F.count("_cand_id").alias("n_overlap"))
            .select(query_col, "n_overlap",
                    F.round(F.col("n_overlap") / F.lit(k), 4)
                     .alias("recall")))


def calibration_table(df: DataFrame, score_col: str, label_col: str,
                      n_bins: int = 10, scale: int = 9) -> DataFrame:
    """Reliability table for a probabilistic scorer — the per-bin basis
    of Expected Calibration Error (Guo et al. 2017): scores in [0, 1]
    bucket into ``n_bins`` fixed-width bins; each bin reports its count,
    positive count, mean score (confidence) and positive rate
    (accuracy). ``ECE = Σ_b |sum_score(b) − pos(b)| / N`` falls out of
    the returned columns — the |mean−rate| form times the bin weight
    algebraically cancels the per-bin divides, so a consumer can compute
    it with integer-exact arithmetic.

    One map-side-combined aggregation over the scored relation — the
    100 TB cost is the scan that produced the scores. Cross-engine
    determinism: the score rounds to ``scale`` at binning time and sums
    as exact DECIMAL; mean_score/pos_rate are one IEEE divide each of
    exact operands (never re-rounded).

    Returns one row per non-empty bin: (bin, n, n_pos, mean_score,
    pos_rate, abs_gap), bin ascending."""
    sc = F.round(F.col(score_col), scale).cast(f"decimal(18,{scale})")
    b = F.least(F.floor(F.col(score_col) * n_bins).cast("int"),
                F.lit(n_bins - 1))
    per = (df.select(b.alias("bin"), sc.alias("s"),
                     F.col(label_col).cast("long").alias("y"))
           .groupBy("bin")
           .agg(F.count("*").alias("n"),
                F.sum("y").alias("n_pos"),
                F.sum("s").alias("sum_s")))
    mean_s = F.col("sum_s").cast("double") / F.col("n").cast("double")
    rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return (per.select("bin", "n", "n_pos",
                       mean_s.alias("mean_score"),
                       rate.alias("pos_rate"),
                       F.abs(mean_s - rate).alias("abs_gap"))
            .orderBy("bin"))


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa between two labelers — chance-corrected agreement,
    the standard consistency check between two annotation passes (or a
    heuristic labeler vs gold labels) in data-curation QA.

    ``κ = (N·Σdiag − Σ_k r_k·c_k) / (N² − Σ_k r_k·c_k)`` — everything
    up to the final divide is exact integer arithmetic from ONE
    confusion-matrix aggregation (classes²-row relation; the marginals
    and their cross-product are rollups of that tiny relation, never a
    second corpus pass). po/pe/kappa are IEEE divides of exact int64
    operands — bit-identical cross-engine, no rounding anywhere.

    Returns one row: (n, n_agree, po, pe, kappa)."""
    conf = (df.groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
            .agg(F.count("*").alias("c")))
    rows = conf.groupBy("a").agg(F.sum("c").alias("rc"))
    cols = conf.groupBy("b").agg(F.sum("c").alias("cc"))
    cross = (rows.join(cols, rows["a"] == cols["b"])
             .agg(F.coalesce(F.sum(F.col("rc") * F.col("cc")), F.lit(0))
                  .alias("s")))
    base = conf.agg(
        F.sum("c").alias("n"),
        F.coalesce(F.sum(F.when(F.col("a") == F.col("b"), F.col("c"))),
                   F.lit(0)).alias("diag"))
    n = F.col("n").cast("double")
    diag = F.col("diag").cast("double")
    s = F.col("s").cast("double")
    return (base.crossJoin(F.broadcast(cross))
            .select(F.col("n").cast("long").alias("n"),
                    F.col("diag").cast("long").alias("n_agree"),
                    (diag / n).alias("po"),
                    (s / (n * n)).alias("pe"),
                    ((n * diag - s) / (n * n - s)).alias("kappa")))
