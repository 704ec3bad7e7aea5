"""Implicit-feedback ALS recsys layer (SURVEY §2.11 M2-M4, M7).

Wraps ``pyspark.ml.recommendation.ALS`` with the reference's full parameter
surface (``param_train_1st.py:53-55``: rank/regParam/alpha/maxIter,
implicitPrefs, nonnegative, numUserBlocks/numItemBlocks, seed) plus the
engine-side fixes the reference lacked:

- inputs are persisted across sweep iterations (X2 — the reference re-read
  parquet every grid point, ``param_train_1st.py:35-36`` commented persist)
- evaluation is DataFrame-native (``ml.metrics``), never ``.rdd.map`` (B1)
- block counts scale with input partitions rather than a hard-coded 50

The driver tables have no MSD interaction file, so
:func:`interactions_from_orders` derives an implicit-feedback table
(customer ⟶ part, strength = total quantity) from lineitem⋈orders — the same
(user, item, count) shape as the reference's ``cf_train.parquet``
(instructions.md:50-61)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import persisted


def interactions_from_orders(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(user_id, item_id, count) implicit-feedback fact table from the driver's
    star schema: one row per (customer, part) with total quantity."""
    return (
        lineitem.join(orders.select("o_orderkey", "o_custkey"),
                      lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("user_id"),
                 F.col("l_partkey").alias("item_id"))
        .agg(F.sum("l_quantity").cast("float").alias("count"))
    )


@dataclass
class ALSConfig:
    """The reference's tuned surface (BASELINE.md: best rank=150, reg=0.05,
    alpha=12.5; defaults here sized for the small driver tables)."""
    rank: int = 10
    reg_param: float = 0.05
    alpha: float = 10.0
    max_iter: int = 10
    seed: int = 123            # the reference's ALS seed (param_train_1st.py:54)
    implicit_prefs: bool = True
    nonnegative: bool = True
    num_blocks: int | None = None  # None → default parallelism
    extra: dict = field(default_factory=dict)


def train_als(interactions: DataFrame, cfg: ALSConfig = ALSConfig(),
              user_col: str = "user_id", item_col: str = "item_id",
              rating_col: str = "count"):
    """Fit implicit ALS (M2). Returns the fitted ALSModel; factor matrices are
    ``model.userFactors`` / ``model.itemFactors`` — (id, array<float>) —
    directly usable by ``operators.similarity`` (the F5 fixture shape)."""
    from pyspark.ml.recommendation import ALS

    kwargs = dict(
        rank=cfg.rank, regParam=cfg.reg_param, alpha=cfg.alpha,
        maxIter=cfg.max_iter, seed=cfg.seed, implicitPrefs=cfg.implicit_prefs,
        nonnegative=cfg.nonnegative, userCol=user_col, itemCol=item_col,
        ratingCol=rating_col, coldStartStrategy="drop", **cfg.extra,
    )
    if cfg.num_blocks:
        kwargs.update(numUserBlocks=cfg.num_blocks, numItemBlocks=cfg.num_blocks)
    return ALS(**kwargs).fit(interactions)


def recommend_topk(model, users: DataFrame, k: int = 500) -> DataFrame:
    """Top-k recommendations per user (M4, ``one_train.py:45-46``): nested
    array-of-struct output unnested via dot-path projection (P2)."""
    recs = model.recommendForUserSubset(users, k)
    item_field = model.getItemCol()
    return recs.select(
        F.col(model.getUserCol()).alias("user"),
        F.col(f"recommendations.{item_field}").alias("pred_items"),
    )


def ground_truth_lists(interactions: DataFrame, user_col: str = "user_id",
                       item_col: str = "item_id") -> DataFrame:
    """Per-user truth lists (A1): order-embedded ``sort_array(collect_list)``
    — the deterministic fix of the reference's orderBy-then-collect_list
    (SURVEY §7.4)."""
    return interactions.groupBy(F.col(user_col).alias("user")).agg(
        F.sort_array(F.collect_list(F.col(item_col))).alias("truth_items"))


def evaluate_model(model, interactions: DataFrame, k: int = 10) -> DataFrame:
    """Ranking evaluation (M6) end-to-end: recommend → truth lists → one-row
    metrics DataFrame. Everything stays in Catalyst."""
    from .metrics import ranking_metrics

    users = interactions.select(
        F.col("user_id").alias(model.getUserCol())).distinct()
    preds = recommend_topk(model, users, k)
    truth = ground_truth_lists(interactions)
    return ranking_metrics(preds, truth, k, user_col="user")


def param_grid(ranks=(10,), regs=(0.05,), alphas=(10.0,),
               **common) -> list[ALSConfig]:
    """The reference's grid construction (``param_train_2nd.py:43-46``:
    ``itertools.product`` over rank × regParam × alpha) as ALSConfig list."""
    import itertools

    return [ALSConfig(rank=r, reg_param=g, alpha=a, **common)
            for r, g, a in itertools.product(ranks, regs, alphas)]


def sweep(interactions: DataFrame, grid: list[ALSConfig], k: int = 10,
          eval_interactions: DataFrame | None = None):
    """Hyperparameter sweep driver (M7, ``param_train_2nd.py:43-85``) with the
    input persisted ONCE across iterations — the optimization the reference
    left commented out.

    ``eval_interactions``: held-out split to score against (the reference
    fits on train and builds truth lists from val,
    ``param_train_2nd.py:38-40``); default None evaluates on the training
    interactions themselves (recall-style sanity sweep)."""
    cached = persisted(interactions)
    ev = (persisted(eval_interactions)
          if eval_interactions is not None else cached)
    try:
        results = []
        for cfg in grid:
            model = train_als(cached, cfg)
            row = evaluate_model(model, ev, k).collect()[0]
            results.append((cfg, row.asDict()))
        return results
    finally:
        cached.unpersist()
        if ev is not cached:
            ev.unpersist()


#: Schema of the sweep-results relation (one row per grid cell).
SWEEP_RESULTS_SCHEMA = ("rank int, reg_param double, alpha double, "
                        "map double, precision_at_k double, "
                        "ndcg_at_k double, n_users bigint")


def sweep_results_df(spark, results) -> DataFrame:
    """Materialize :func:`sweep` output as a small RELATION (one row per
    grid cell: hyperparameters + ranking metrics) so a sweep can be written
    to parquet and queried/joined like any other table — the shape
    ``param_train_2nd.py:75-85`` printed to stdout. The sweep grid is
    metadata-sized by construction (a handful of cells), so building the
    relation driver-side is not a scale concern; each metric row was itself
    computed distributedly by :func:`evaluate_model`."""
    rows = [(cfg.rank, cfg.reg_param, cfg.alpha, m["map"],
             m["precision_at_k"], m["ndcg_at_k"], m["n_users"])
            for cfg, m in results]
    return spark.createDataFrame(rows, SWEEP_RESULTS_SCHEMA)
