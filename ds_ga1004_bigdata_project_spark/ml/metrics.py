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
    mirroring mllib's empty-truth handling. Returns one row:
    (map, precision_at_k, ndcg_at_k, n_users)."""
    pred_ex = pred_df.select(
        F.col(user_col).alias("u"),
        F.posexplode(pred_col).alias("pos", "item"),
    )
    truth_sets = truth_df.select(
        F.col(user_col).alias("u"),
        F.array_distinct(F.col(truth_col)).alias("tset"),
    ).select("u", F.size("tset").alias("truth_size"), F.explode("tset").alias("item")) \
     .withColumn("hit", F.lit(1))

    joined = pred_ex.join(truth_sets, ["u", "item"], "left") \
        .select("u", "pos", F.coalesce("hit", F.lit(0)).alias("hit"))

    w = Window.partitionBy("u").orderBy("pos")
    scored = joined.withColumn("hits_cum", F.sum("hit").over(w))

    per_user = scored.groupBy("u").agg(
        F.sum(F.col("hit") * F.col("hits_cum") / (F.col("pos") + 1)).alias("ap_num"),
        F.sum(F.when(F.col("pos") < k, F.col("hit")).otherwise(0)).alias("hits_at_k"),
        F.sum(F.when(F.col("pos") < k,
                     F.col("hit") / F.log2(F.col("pos") + 2)).otherwise(0.0))
        .alias("dcg"),
    )
    tsizes = truth_df.select(
        F.col(user_col).alias("u"),
        F.size(F.array_distinct(F.col(truth_col))).alias("truth_size"))
    per_user = per_user.join(tsizes, "u", "left") \
        .withColumn("truth_size", F.coalesce("truth_size", F.lit(0)))

    # IDCG@min(truth_size, k): Σ_{i=0}^{m-1} 1/log2(i+2), m = min(ts, k)
    m = F.least(F.col("truth_size"), F.lit(k))
    idcg = F.when(m > 0, F.aggregate(
        F.sequence(F.lit(0), m - 1),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 2),
    )).otherwise(F.lit(None))

    finalized = per_user.select(
        F.when(F.col("truth_size") > 0, F.col("ap_num") / F.col("truth_size"))
        .otherwise(0.0).alias("ap"),
        (F.col("hits_at_k") / F.lit(float(k))).alias("p_at_k"),
        F.coalesce(F.col("dcg") / idcg, F.lit(0.0)).alias("ndcg"),
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


def auc(df: DataFrame, score_col: str, label_col: str,
        round_scale: int | None = 6) -> DataFrame:
    """Binary-classification ROC AUC as a native aggregate, by the
    rank-statistic identity (Mann-Whitney U):

        AUC = (Σ_{positives} avgrank(score) − P(P+1)/2) / (P·N)

    with average ranks for score ties (avgrank = rank + (ties−1)/2, ascending
    scores), which is exactly the trapezoidal ROC AUC. One global sort-rank +
    one reduction — no per-threshold sweep, no driver-side collect; at scale
    the sort is a range-partitioned shuffle of (score, label) pairs only.

    ``label_col`` must be 0/1. Returns one row (auc, n_pos, n_neg).
    """
    w = Window.orderBy(F.col(score_col).asc())
    ranked = df.select(
        F.col(label_col).cast("long").alias("y"),
        (F.rank().over(w)
         + (F.count(F.lit(1)).over(Window.partitionBy(score_col)) - 1) / 2.0)
        .alias("avgrank"))
    out = ranked.agg(
        ((F.sum(F.when(F.col("y") == 1, F.col("avgrank")).otherwise(0.0))
          - F.sum("y") * (F.sum("y") + 1) / 2.0)
         / (F.sum("y") * (F.count(F.lit(1)) - F.sum("y")))).alias("auc"),
        F.sum("y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"))
    if round_scale is not None:
        out = out.select(F.round("auc", round_scale).alias("auc"),
                         "n_pos", "n_neg")
    return out
