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
   numbers (one extra aggregation over distinct keys, broadcast back).

The caller must supply a TOTAL order (include a tiebreak column) — that is
what makes the result deterministic and the twin of the window form; the
equality is pinned in tests/test_ranks.py and oracle-certified by
q101_scalable_ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_numbers(df: DataFrame, order_cols: list[Column],
                       num_partitions: int | None = None,
                       out_col: str = "_global_rn") -> DataFrame:
    """Attach a 1-based global row number along a total order, with a
    range-partitioned sort instead of a single window partition."""
    from .relational import persisted

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Persist BEFORE reading partition sizes: range boundaries come from a
    # sample, and a re-execution may sample different boundaries — the counts
    # job and the numbering job must see the SAME physical partitioning.
    sorted_df = persisted(
        df.repartitionByRange(parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id()))
    # Metadata-sized collect: one (pid, count) row per partition.
    counts = {r["_pid"]: r["c"] for r in
              sorted_df.groupBy("_pid").agg(F.count(F.lit(1)).alias("c"))
              .collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
        F.col("_pid"))
    local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (sorted_df
            .withColumn(out_col, offset_expr + F.row_number().over(local))
            .drop("_pid"))


def global_distribution_ranks(df: DataFrame, key_cols: list[str],
                              tiebreak_cols: list[str],
                              ascending: bool = True) -> DataFrame:
    """row_number / rank / percent_rank / cume_dist over (key_cols ASC,
    tiebreak_cols) — semantics identical to the unpartitioned-window forms
    ordered by ``key_cols`` (ties = equal key_cols values), physical plan a
    distributed sort + two tiny aggregations."""
    from .relational import persisted

    order = [(F.col(c).asc() if ascending else F.col(c).desc())
             for c in key_cols] + [F.col(c).asc() for c in tiebreak_cols]
    # Persist: the numbered table feeds the total, the per-key agg, and the
    # final join — without this the distributed sort runs three times.
    rn = persisted(global_row_numbers(df, order, out_col="row_number"))
    total = rn.agg(F.max("row_number")).first()[0]
    per_key = rn.groupBy(*key_cols).agg(
        F.min("row_number").alias("_rank"),
        F.max("row_number").alias("_maxrn"))
    out = rn.join(F.broadcast(per_key), key_cols)
    return (out
            .withColumn("rank", F.col("_rank"))
            .withColumn("percent_rank",
                        F.when(F.lit(total) > 1,
                               (F.col("_rank") - 1) / F.lit(total - 1))
                        .otherwise(F.lit(0.0)))
            .withColumn("cume_dist", F.col("_maxrn") / F.lit(total))
            .drop("_rank", "_maxrn"))
