"""Temporal/interval join operators Spark lacks natively (as-of join, range
join), built as compositions of DataFrame primitives — no UDFs, no cartesian
products.

These are the classic time-series/data-lake joins: as-of powers
"price at trade time" lookups, range joins power interval containment
(IP→geo, value→bucket). DuckDB implements ASOF JOIN natively, which the
harness uses as the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: list[str], tolerance: Column | None = None) -> DataFrame:
    """For each left row, attach the LATEST right row with the same key and
    ``right.ts <= left.ts`` (inclusive) — left-outer semantics (no match →
    nulls).

    Implementation — the union-scan trick, O(n log n) with ONE shuffle:
    tag and union both inputs, sort within key by (ts, side) so right rows
    precede left rows at equal timestamps, then carry the last-seen right
    payload forward with ``last(ignorenulls)`` over a running window. No
    per-row probing, no range explosion; at scale this is a single
    shuffle-on-key + per-partition sort — same cost as one sort-merge join.

    Right rows must be unique per (key, ts) — pre-aggregate if not (ties at
    the same timestamp are otherwise order-undefined, matching DuckDB ASOF's
    contract). ``tolerance``: optional max staleness (left.ts - right.ts);
    matches older than it are nulled."""
    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_type = right.select(payload.alias("_p")).schema["_p"].dataType
    # Carry all left columns through the union (re-joining by row id would
    # cost a second shuffle); right rows align to the left schema with nulls.
    left_cols = list(left.columns)
    l = left.select(
        *left_cols,
        F.lit(None).cast(payload_type).alias("_asof_payload"),
        F.lit(1).alias("_side"))
    r_aligned = right.select(
        *[F.col(c) if c in (on, ts) else
          F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
        payload.alias("_asof_payload"), F.lit(0).alias("_side"))
    unioned = l.unionByName(r_aligned)

    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w))
    carried = carried.withColumn(
        "_asof_ts", F.last(F.when(F.col("_side") == 0, F.col(ts)),
                           ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        keep = (F.col(ts) - F.col("_asof_ts")) <= tolerance
        out = out.withColumn("_asof_match",
                             F.when(keep, F.col("_asof_match")))
    return out.select(
        *left_cols,
        *[F.col("_asof_match").getField(c).alias(c) for c in right_cols])


def range_join_binned(points: DataFrame, intervals: DataFrame, point_col: str,
                      lo_col: str, hi_col: str, bin_width: float) -> DataFrame:
    """Point-in-interval join without a nested loop: explode each interval
    into the fixed-width bins it covers, equi-join points on their bin, then
    refine with the exact predicate.

    Cost: |intervals|·(avg_width/bin_width) exploded rows + one hash
    equi-join — instead of |points|·|intervals| comparisons. Size
    ``bin_width`` near the median interval width. Both inputs stay
    distributed (contrast with broadcast-nested-loop, which requires one
    side to fit in memory)."""
    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / bin_width).cast("long"),
            F.floor(F.col(hi_col) / bin_width).cast("long"))))
    binned_pt = points.withColumn(
        "_bin", F.floor(F.col(point_col) / bin_width).cast("long"))
    return (binned_pt.join(binned_iv, "_bin")
            .filter((F.col(point_col) >= F.col(lo_col))
                    & (F.col(point_col) <= F.col(hi_col)))
            .drop("_bin"))


def range_count_binned(points: DataFrame, intervals: DataFrame,
                       point_col: str, lo_col: str, hi_col: str,
                       interval_keys: list[str],
                       bin_width: float) -> DataFrame:
    """Count points per containing interval with the AGGREGATION PUSHED BELOW
    THE JOIN — the specialization of :func:`range_join_binned` for count-type
    results (the dominant range-join use: histogram-per-interval, coverage
    counts).

    The general range join must materialize every (point, interval) match —
    inherently |matches| work. A count never needs the pairs: pre-aggregate
    points into fixed-width cells once, then

    - **interior cells** of each interval (fully contained in [lo, hi]) take
      the cell's pre-computed count — O(cells-per-interval), point-free;
    - only the two **boundary cells** join actual points for exact lo/hi
      refinement — O(points-in-boundary-cells) ∝ bin_width.

    Join traffic drops from |matches| (84M pairs at sf0.1 for q42) to
    |intervals|·width/bin_width tiny cell rows + boundary candidates; shrink
    ``bin_width`` to trade interior explode rows for boundary traffic. The
    cell-count table is bounded by the value domain (broadcastable).

    Returns one row per interval that contains ≥1 point (inner-join
    semantics): interval_keys + lo/hi + ``n_points``.
    """
    def to_bin(c: Column) -> Column:
        return F.floor(c / bin_width).cast("long")

    out_keys = [*interval_keys, lo_col, hi_col]
    pts = points.select(to_bin(F.col(point_col)).alias("_bin"),
                        F.col(point_col).alias("_v"))
    cell_counts = pts.groupBy("_bin").agg(F.count(F.lit(1)).alias("_cnt"))

    iv = intervals.select(*out_keys,
                          to_bin(F.col(lo_col)).alias("_blo"),
                          to_bin(F.col(hi_col)).alias("_bhi"))

    # Interior cells: bins strictly between the boundary bins.
    interior = (iv.filter(F.col("_bhi") >= F.col("_blo") + 2)
                .withColumn("_bin", F.explode(
                    F.sequence(F.col("_blo") + 1, F.col("_bhi") - 1)))
                .join(F.broadcast(cell_counts), "_bin")
                .groupBy(*out_keys).agg(F.sum("_cnt").alias("n_points")))

    # Boundary cells: exact predicate against the points in those cells only.
    boundary_bins = iv.select(
        *out_keys,
        F.explode(F.array_distinct(F.array("_blo", "_bhi"))).alias("_bin"))
    boundary = (pts.join(boundary_bins, "_bin")
                .filter((F.col("_v") >= F.col(lo_col))
                        & (F.col("_v") <= F.col(hi_col)))
                .groupBy(*out_keys).agg(F.count(F.lit(1)).alias("n_points")))

    return (interior.unionByName(boundary)
            .groupBy(*out_keys).agg(F.sum("n_points").alias("n_points")))


def resample_ffill(events: DataFrame, key_col: str, ts_col: str,
                   value_col: str, step: str = "1 hour") -> DataFrame:
    """Per-key time-grid resampling with forward fill — the telemetry/
    feature-engineering shape: snap each key's observations onto a regular
    ``step`` grid spanning [min(ts), max(ts)] and carry the last observed
    value forward across gaps. Output: (key_col, grid_ts, value_col,
    is_observed). The grid anchors to the HOUR boundary at or before the
    key's first observation (``date_trunc('hour', min(ts))``) regardless
    of ``step`` — sub-hour steps subdivide hour-aligned cells, which keeps
    grids from different keys phase-aligned.

    Plan: per-key min/max (one partial-aggregated shuffle) → ``sequence()``
    explodes the grid MAP-SIDE (no shuffle grows with grid length) → as-of
    attach the latest observation at-or-before each grid point via a
    union + last(ignorenulls) window per key — each key sorts only its own
    grid+events. Value rows are carried verbatim (no arithmetic), so the
    result is engine-exact. The hour-truncated grid start can precede the
    key's first observation; those unfillable cells are dropped. Ties at
    an identical (key, ts) resolve to the LARGEST value on both engines
    (deterministic tiebreak)."""
    from pyspark.sql import Window

    span = events.groupBy(key_col).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1"))
    grid = span.select(
        key_col,
        F.explode(F.sequence(
            F.date_trunc("hour", F.col("_t0")),
            F.col("_t1"), F.expr(f"INTERVAL {step}"))).alias("_grid_ts"))
    obs = events.select(
        F.col(key_col), F.col(ts_col).alias("_ev_ts"),
        F.col(value_col).alias("_v"))
    # Union grid points (null value) with observations, order by time with
    # observations FIRST at equal timestamps so a grid point at an exact
    # observation time picks it up; forward-fill via last(ignorenulls).
    g = grid.select(key_col, F.col("_grid_ts").alias("_t"),
                    F.lit(None).cast(obs.schema["_v"].dataType).alias("_v"),
                    F.lit(1).alias("_is_grid"))
    o = obs.select(key_col, F.col("_ev_ts").alias("_t"), "_v",
                   F.lit(0).alias("_is_grid"))
    w = (Window.partitionBy(key_col)
         .orderBy(F.col("_t").asc(), F.col("_is_grid").asc(),
                  F.col("_v").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = g.unionByName(o).withColumn(
        "_ff", F.last("_v", ignorenulls=True).over(w))
    exact = obs.select(key_col, F.col("_ev_ts").alias("_t"),
                       F.lit(0).alias("_obs_flag")).distinct()
    return (filled.filter((F.col("_is_grid") == 1)
                          & F.col("_ff").isNotNull())
            .join(exact, [key_col, "_t"], "left")
            .select(F.col(key_col),
                    F.col("_t").alias("grid_ts"),
                    F.col("_ff").alias(value_col),
                    (F.col("_obs_flag").isNotNull()).alias("is_observed")))
