"""Aggregation operators (SURVEY.md §2.4).

All aggregations here are expressed as built-in Spark aggregate functions so
Catalyst plans them as partial (map-side) + final hash aggregates — the 100 TB
requirement is that per-key state, not per-row data, crosses the shuffle.

Numeric note: money/quantity sums are computed over DECIMAL(18,2) casts and
returned as rounded doubles. Decimal addition is exact and associative, so the
result is independent of partitioning AND bit-identical to any other engine
(the DuckDB oracle) — a float sum would drift with shuffle order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_sum(col: str, alias: str, scale: int = 2) -> Column:
    """Shuffle-order-independent sum of a money/quantity column (see module
    docstring)."""
    return F.round(
        F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double"), scale
    ).alias(alias)


def exact_avg(col: str, alias: str, scale: int = 4) -> Column:
    """Deterministic average: exact decimal sum / count, rounded."""
    return F.round(
        F.sum(F.col(col).cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)),
        scale,
    ).alias(alias)


def sorted_collect_list(df: DataFrame, group_by: Sequence[str], col: str,
                        alias: str = "items") -> DataFrame:
    """Deterministic grouped list (A1 + the O2 fix).

    The reference ordered *before* the groupBy (``param_train_1st.py:39-41``),
    which Spark does not preserve across the aggregation shuffle. The
    deterministic form embeds the order in the aggregate itself:
    ``sort_array(collect_list(...))`` (SURVEY §7.4)."""
    return df.groupBy(*group_by).agg(
        F.sort_array(F.collect_list(F.col(col))).alias(alias)
    )


def collect_sorted_string(df: DataFrame, group_by: Sequence[str], col: str,
                          alias: str = "items", sep: str = ",") -> DataFrame:
    """Order-embedded grouped list rendered as a joined string — the
    oracle-comparable form of :func:`sorted_collect_list`."""
    return df.groupBy(*group_by).agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list(F.col(col))),
                        lambda x: x.cast("string")),
            sep,
        ).alias(alias)
    )


def map_agg(df: DataFrame, group_by: Sequence[str], key_col: str, val_col: str,
            alias: str = "kv") -> DataFrame:
    """Map-building aggregation (A5): per-group ``map<key,val>`` via
    ``map_from_entries(collect_list(struct(k, v)))`` — the Spark form of the
    reference's per-track tag→score dict (``Exploration-EDA.ipynb#cell36``).
    Keys are deduplicated upstream by the caller if needed."""
    return df.groupBy(*group_by).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col(key_col), F.col(val_col))))
        ).alias(alias)
    )


def argmax_struct(value_col: str, key_col: str, value_alias: str, key_alias: str):
    """Deterministic per-group argmax (A11): ``max(struct(value, key))`` takes
    the max value and breaks ties on the larger key — one hash aggregate, no
    window shuffle-sort. Returns two projection columns."""
    m = F.max(F.struct(F.col(value_col).alias("v"), F.col(key_col).alias("k")))
    return m.getField("v").alias(value_alias), m.getField("k").alias(key_alias)


def histogram(df: DataFrame, col: str, edges: Sequence[float],
              bucket_alias: str = "bucket", count_alias: str = "cnt",
              ratio_alias: str | None = "ratio", ratio_scale: int = 4) -> DataFrame:
    """Binned counts + fractions (A7/F8): the reference's listens-histogram
    (``Exploration-EDA.ipynb#cell77-81``) as one when-chain aggregate.

    ``edges=[e0, e1, ..., en]`` buckets as [e0,e1), [e1,e2), ..., plus
    underflow/overflow labels. One hash agg + a scalar window for the ratio."""
    c = F.col(col)
    expr = F.when(c < edges[0], F.lit(f"<{edges[0]}"))
    for lo, hi in zip(edges, edges[1:]):
        expr = expr.when((c >= lo) & (c < hi), F.lit(f"[{lo},{hi})"))
    expr = expr.otherwise(F.lit(f">={edges[-1]}"))
    out = df.groupBy(expr.alias(bucket_alias)).agg(F.count(F.lit(1)).alias(count_alias))
    if ratio_alias:
        total = F.sum(count_alias).over(Window.partitionBy())
        out = out.withColumn(ratio_alias,
                             F.round(F.col(count_alias) / total, ratio_scale))
    return out


def group_counts(df: DataFrame, group_by: Sequence[str],
                 count_alias: str = "cnt") -> DataFrame:
    """Frequency table (A4): ``value_counts`` analog as a hash aggregate."""
    return df.groupBy(*group_by).agg(F.count(F.lit(1)).alias(count_alias))


def summary_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Global describe (A8) kept DataFrame-native."""
    return df.select(*cols).summary("count", "mean", "min", "max")


def distinct_sketch_partials(df: DataFrame, group_by: Sequence[str],
                             col: str, lg_k: int = 12,
                             sketch_alias: str = "sketch") -> DataFrame:
    """Per-group mergeable HLL distinct-count sketch partials
    (``hll_sketch_agg``, Apache DataSketches under the hood).

    THE 100 TB distinct-count pattern: computing an exact count-distinct
    over a year of data re-shuffles the raw keys every time, but sketch
    partials are computed once per shard/day/partition (this function),
    PERSISTED as small binary blobs, and merged on demand with
    :func:`merge_distinct_sketches` — a rollup over kilobytes instead of a
    rescan over terabytes. Standard error ≈ 1.04/√(2^lg_k) (~1.6 % at the
    default lg_k=12)."""
    return df.groupBy(*group_by).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias(sketch_alias))


def merge_distinct_sketches(partials: DataFrame, group_by: Sequence[str],
                            sketch_col: str = "sketch",
                            est_alias: str = "distinct_est") -> DataFrame:
    """Merge persisted HLL partials (``hll_union_agg``) and estimate. The
    merge is associative/commutative, so any slicing of the data into
    partials yields the same cardinality information — only the sketch
    registers travel through the rollup.

    RESTART NOTE (VERDICT r13 #7): the union is also IDEMPOTENT —
    registers merge by MAX, so unioning the same partial twice is a
    no-op. A persisted-partials pipeline that replays a shard after a
    crash (at-least-once writers, duplicated manifest entries) cannot
    corrupt the estimate; restart-safe by construction, unlike
    sum-merged CMS cells (``sketches.write_cms_batch_partials``, which
    need deterministic per-batch paths)."""
    return partials.groupBy(*group_by).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(sketch_col)).alias(est_alias))


def key_skew_report(df: DataFrame, key_cols: Sequence[str],
                    top_n: int = 10) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/groupBy key: the
    top-N heaviest keys with each key's share of all rows and its ratio to
    the MEAN key load — the number that predicts whether AQE's skew-join
    split or explicit salting (``relational.salted_join``) is needed
    (rule of thumb: hot-key ratios beyond ~10× the mean mean one task does
    the table's work).

    One partial-aggregated count per key plus a scalar total/mean joined in
    by broadcast — safe to run on the full table at any scale, and cheaper
    than discovering the skew as a straggler task at hour three."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.avg("n_rows").alias("_mean"))
    top = counts.orderBy(F.col("n_rows").desc(),
                         *[F.col(c).asc() for c in key_cols]).limit(top_n)
    return (top.join(F.broadcast(stats))
            .select(*key_cols, "n_rows",
                    F.round(F.col("n_rows") / F.col("_total"), 6)
                    .alias("row_share"),
                    F.round(F.col("n_rows") / F.col("_mean"), 2)
                    .alias("x_mean_load")))
