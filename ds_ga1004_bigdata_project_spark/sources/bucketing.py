"""Bucketed tables — co-located, shuffle-free joins (the 100 TB join story).

A fact⋈fact join (lineitem⋈orders at full scale) can't broadcast either side;
the default plan shuffles BOTH inputs on the join key every time the join
runs. Bucketing pays that shuffle ONCE at write time: both tables are written
pre-hash-partitioned into the same number of buckets on the join key, and
every subsequent join (and groupBy on the key) reads co-located buckets with
zero exchanges.

Spark requires a catalog table (saveAsTable) for bucket metadata; the session
warehouse dir defaults to ``spark-warehouse/`` locally and the cluster
catalog in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (optionally sort-within-bucket) catalog
    table. ``num_buckets`` should be sized so one bucket of the LARGER table
    fits an executor's memory (e.g. 100 TB / 8192 buckets ≈ 12 GB splits
    further by file)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    on, how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables. With matching bucket counts and join keys
    this plans a SortMergeJoin with NO Exchange on either side — verified by
    ``tests/test_bucketing.py``."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
