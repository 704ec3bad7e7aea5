"""Scalable global ranking — the fix for Spark's unpartitioned-window trap.

``rank() OVER (ORDER BY x)`` with no PARTITION BY moves EVERY row into a
single window partition: one task sorts and ranks the whole table, at any
cluster size (Spark even warns). Fine at 30k rows, fatal at 100 TB.

:func:`global_distribution_ranks` computes the same row_number / rank /
percent_rank / cume_dist with full parallelism:

1. range-repartition + sort within partitions on the total order — the same
   distributed sort a global ``orderBy`` performs (sampled boundaries, every
   task sorts its slice);
2. per-partition row counts → prefix-sum offsets (one tiny driver-side
   metadata collect: #partitions rows, never data rows);
3. ``row_number = partition_offset + local row_number``;
4. tie-aware rank/percent_rank/cume_dist from a per-key min/max of the row
   numbers — a hash-partitioned self-join on the key columns. The per-key
   side has one row per DISTINCT key, which can be O(N) for near-unique
   keys (q101 ranks ``c_acctbal``), so it is NEVER broadcast: Catalyst/AQE
   may still pick a broadcast when statistics show the key side is small,
   but the plan must not force one.

The caller must supply a TOTAL order (include a tiebreak column) — that is
what makes the result deterministic and the twin of the window form; the
equality is pinned in tests/test_ranks.py and oracle-certified by
q101_scalable_ranks.

Cache ownership: the range-sorted table is persisted inside (the partition
boundaries come from a runtime sample, so the counts job and every numbering
branch MUST see the same physical partitioning — recomputation could sample
different boundaries). The persisted block lives until the session clears it;
callers that sweep many queries should ``spark.catalog.clearCache()`` between
them (the bench does), or pass ``caches`` to collect handles and unpersist
after their consuming action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Input-row count below which the global ranking runs as a plain
#: unpartitioned window instead of the range-partitioned construction
#: (the adaptive dispatch AUC uses — ``ml/metrics.py:AUC_SMALL_DISTINCT_MAX``).
#: A ≤1M-row single-task sort is milliseconds on any executor, while the
#: range path pays ~3 fixed jobs (boundary sampling, persist, offsets
#: collect) regardless of input size. Size is probed with
#: ``limit(max+1).count()``, which short-circuits after finding max+1 rows —
#: at 100 TB the probe touches a handful of partitions, never a full scan.
RANKS_SMALL_INPUT_MAX = 1_000_000

#: Catalyst-estimated plan output size below which the small path is taken
#: WITHOUT running the probe job at all: ``optimizedPlan().stats()``
#: sizeInBytes comes from file footers + projection scaling, known at plan
#: time. 32 MB estimated ≈ well under one executor's sort budget even at
#: several-× estimation error. Catalyst without CBO never shrinks filter
#: estimates and multiplies join estimates, so errors skew LARGE — an
#: overestimate just falls through to the probe, never the reverse.
RANKS_SMALL_STATS_BYTES = 32 * 1024 * 1024


def _fits_small_path(df: DataFrame, max_rows: int) -> bool:
    """Two-tier size dispatch: plan statistics first (zero jobs), then a
    ``limit(max+1).count()`` probe that short-circuits after max+1 rows —
    at 100 TB the probe reads a handful of partitions, never a full scan."""
    if not max_rows:
        return False
    try:
        # py4j converts the Scala BigInt to a Python int directly.
        est = int(df._jdf.queryExecution().optimizedPlan().stats()
                  .sizeInBytes())
        if est <= RANKS_SMALL_STATS_BYTES:
            return True
    except Exception:
        pass  # stats unavailable (e.g. non-JVM source) → fall through
    return df.limit(max_rows + 1).count() <= max_rows


def _range_sorted_offsets(df: DataFrame, order_cols: list[Column],
                          num_partitions: int | None,
                          caches: list[DataFrame] | None,
                          weight: Column):
    """Shared core of the range-partitioned prefix constructions: range-sort
    ``df``, then compute each partition's starting offset as the sum of
    ``weight`` over all earlier partitions. Returns
    ``(sorted_df_with_pid, offset_expr, grand_total)``.

    One metadata-sized collect (a (pid, sum) row per partition); the grand
    total comes from the same rows, so no extra pass over the data is ever
    needed for it."""
    from .relational import persisted

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Persist BEFORE reading partition sums: range boundaries come from a
    # sample, and a re-execution may sample different boundaries — the sums
    # job and the downstream jobs must see the SAME physical partitioning.
    sorted_df = persisted(
        df.repartitionByRange(parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id()))
    if caches is not None:
        caches.append(sorted_df)
    # Metadata-sized collect: one (pid, sum) row per partition.
    sums = {r["_pid"]: (r["c"] or 0) for r in
            sorted_df.groupBy("_pid").agg(F.sum(weight).alias("c"))
            .collect()}
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    offset_expr = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
        F.col("_pid")) if offsets else F.lit(0)
    return sorted_df, offset_expr, acc


def _range_numbered(df: DataFrame, order_cols: list[Column],
                    num_partitions: int | None, out_col: str,
                    caches: list[DataFrame] | None):
    """Shared core: returns (numbered_df, total_rows)."""
    sorted_df, offset_expr, acc = _range_sorted_offsets(
        df, order_cols, num_partitions, caches, weight=F.lit(1))
    local = Window.partitionBy("_pid").orderBy(*order_cols)
    numbered = (sorted_df
                .withColumn(out_col, offset_expr + F.row_number().over(local))
                .drop("_pid"))
    return numbered, acc


def global_prefix_sum(df: DataFrame, order_cols: list[Column], value_col: str,
                      out_col: str = "_prefix_sum",
                      num_partitions: int | None = None,
                      caches: list[DataFrame] | None = None,
                      small_input_max: int = 0) -> DataFrame:
    """Running total of ``value_col`` along a total order, INCLUSIVE of the
    current row — the scalable form of
    ``sum(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``.

    Same construction as :func:`global_row_numbers`: range-partitioned sort,
    per-partition weight sums collected as metadata, partition offset + local
    window cumsum. No unpartitioned window at any input size by default.

    ``small_input_max`` (r14, OPT-IN — default 0 keeps the range path so
    existing certified consumers' plans are untouched): a positive bound
    enables the same adaptive dispatch :func:`global_row_numbers` has —
    when the size probe bounds the input, one plain window runs instead of
    the range machinery's ~3 fixed jobs (measured 2× on a
    fixture-scale relation in the q251 A/B).

    The caller must supply a TOTAL order; ``caches`` receives the internally
    persisted range-sorted table (see module docstring for the ownership
    contract)."""
    if small_input_max and _fits_small_path(df, small_input_max):
        w = (Window.orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return df.withColumn(out_col, F.sum(value_col).over(w))
    sorted_df, offset_expr, _ = _range_sorted_offsets(
        df, order_cols, num_partitions, caches, weight=F.col(value_col))
    local = (Window.partitionBy("_pid").orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (sorted_df
            .withColumn(out_col, offset_expr + F.sum(value_col).over(local))
            .drop("_pid"))


def global_row_numbers(df: DataFrame, order_cols: list[Column],
                       num_partitions: int | None = None,
                       out_col: str = "_global_rn",
                       caches: list[DataFrame] | None = None,
                       small_input_max: int = RANKS_SMALL_INPUT_MAX) -> DataFrame:
    """Attach a 1-based global row number along a total order, with a
    range-partitioned sort instead of a single window partition.

    Adaptive: inputs the size probe bounds at ``small_input_max`` rows run
    as one plain window (single small sort, zero fixed-cost jobs); pass
    ``small_input_max=0`` to force the range-partitioned construction.

    ``caches``: optional list that receives the internally persisted
    DataFrame(s) so the caller can unpersist after its consuming action."""
    if _fits_small_path(df, small_input_max):
        return df.withColumn(
            out_col, F.row_number().over(Window.orderBy(*order_cols)))
    numbered, _ = _range_numbered(df, order_cols, num_partitions, out_col, caches)
    return numbered


def _ntile_expr(rn: Column, total: int, k: int) -> Column:
    """SQL-standard NTILE(k) from a 1-based global row number and the total
    row count: the first ``total mod k`` tiles hold ``⌈total/k⌉`` rows, the
    rest ``⌊total/k⌋`` — pure arithmetic, no window."""
    q, r = divmod(total, k)
    if q == 0:
        return rn.cast("int")  # fewer rows than tiles: tile == row number
    boundary = r * (q + 1)
    return F.when(
        rn <= boundary, F.floor((rn - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((rn - boundary - 1) / q) + 1).cast("int")


def global_distribution_ranks(df: DataFrame, key_cols: list[str],
                              tiebreak_cols: list[str],
                              ascending: bool = True,
                              ntile: int | None = None,
                              caches: list[DataFrame] | None = None,
                              small_input_max: int = RANKS_SMALL_INPUT_MAX) -> DataFrame:
    """row_number / rank / percent_rank / cume_dist over (key_cols ASC,
    tiebreak_cols) — semantics identical to the unpartitioned-window forms
    ordered by ``key_cols`` (ties = equal key_cols values), physical plan a
    distributed sort + one per-key aggregation + one hash join.

    Adaptive dispatch (the AUC pattern, VERDICT r4 #4): when the size probe
    bounds the input at ``small_input_max`` rows, the native window
    functions run directly — one small single-task sort, none of the range
    path's ~3 fixed jobs. This is not the unpartitioned-window trap: the
    probe just bounded the window's input. ``small_input_max=0`` forces the
    range-partitioned construction (q101 does, to keep its oracle row
    certifying the distributed form).

    The per-key (min, max) row-number table is joined back WITHOUT a
    broadcast hint: with near-unique keys it is the size of the input, and
    forcing a broadcast would ship O(N) rows to every executor. The join is
    hash-partitionable on ``key_cols``; AQE may still elect a broadcast at
    runtime when the key side is genuinely small.

    ``ntile=k`` adds an ``ntile`` column — pure arithmetic over the global
    row number and total (both already known), zero extra cost."""
    key_order = [(F.col(c).asc() if ascending else F.col(c).desc())
                 for c in key_cols]
    order = key_order + [F.col(c).asc() for c in tiebreak_cols]
    if _fits_small_path(df, small_input_max):
        w_full = Window.orderBy(*order)      # total order: row_number/ntile
        w_key = Window.orderBy(*key_order)   # key order: tie-aware ranks
        out = (df
               .withColumn("row_number", F.row_number().over(w_full))
               .withColumn("rank", F.rank().over(w_key))
               .withColumn("percent_rank", F.percent_rank().over(w_key))
               .withColumn("cume_dist", F.cume_dist().over(w_key)))
        if ntile is not None:
            out = out.withColumn("ntile", F.ntile(ntile).over(w_full))
        return out
    # total comes from the partition-count metadata — no extra action. The
    # numbered projection is NOT persisted: both consumers (the per-key agg
    # and the final join) recompute it from the persisted range-sorted table,
    # whose fixed partitioning keeps the row numbers identical across
    # branches.
    rn, total = _range_numbered(df, order, None, "row_number", caches)
    per_key = rn.groupBy(*key_cols).agg(
        F.min("row_number").alias("_rank"),
        F.max("row_number").alias("_maxrn"))
    out = rn.join(per_key, key_cols)
    out = (out
           .withColumn("rank", F.col("_rank"))
           .withColumn("percent_rank",
                       F.when(F.lit(total) > 1,
                              (F.col("_rank") - 1) / F.lit(total - 1))
                       .otherwise(F.lit(0.0)))
           .withColumn("cume_dist", F.col("_maxrn") / F.lit(total))
           .drop("_rank", "_maxrn"))
    if ntile is not None:
        out = out.withColumn("ntile",
                             _ntile_expr(F.col("row_number"), total, ntile))
    return out
