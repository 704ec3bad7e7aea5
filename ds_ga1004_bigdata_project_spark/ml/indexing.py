"""String indexing — frequency-ordered dense codes (SURVEY §2.11 M1).

Two interchangeable paths:

- :func:`ml_string_indexer` — ``pyspark.ml.feature.StringIndexer`` pipeline,
  exactly the reference's construction (``sample_indexer.py:41-45``), with
  ``handleInvalid='skip'`` semantics (unseen labels DROPPED at transform — the
  cold-start filter the evaluation protocol depends on, SURVEY §7.4).
- :func:`sql_string_indexer` — pure-SQL path: dense_rank over (count desc,
  value asc). Oracle-expressible, join-based transform, and — unlike the ML
  path, which collects the label array to the driver — it scales to key
  cardinalities that don't fit driver memory. At 100 TB with ~10⁹ users this
  is the only viable path; the ML path's broadcast label map caps out around
  10⁷-10⁸ labels.

The SQL path's 'skip' analog is an inner join (unseen keys simply don't
match), and transform is a broadcast/shuffle hash join Catalyst sizes itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_sql_indexer(df: DataFrame, col: str, idx_col: str | None = None) -> DataFrame:
    """Build the label↔index map: frequency-ordered dense codes, ties broken
    by value ascending (deterministic, unlike relying on hash order).

    Returns a small DataFrame ``(col, idx_col)`` — the distributed analog of
    the fitted StringIndexer's label array."""
    idx_col = idx_col or f"{col}_idx"
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("_freq"))
    w = Window.orderBy(F.col("_freq").desc(), F.col(col).asc())
    # dense_rank over a global window: fine for a *label table* (one partition
    # of distinct labels), never applied to the fact table itself.
    return counts.withColumn(idx_col, F.dense_rank().over(w) - 1).drop("_freq")


def transform_sql_indexer(df: DataFrame, mapping: DataFrame, col: str,
                          keep_unseen: bool = False) -> DataFrame:
    """Apply a fitted label map. ``keep_unseen=False`` replicates
    ``handleInvalid='skip'`` (rows with unseen labels dropped via inner join);
    ``True`` keeps them with null index (``handleInvalid='keep'``-ish)."""
    how = "left" if keep_unseen else "inner"
    return df.join(F.broadcast(mapping), col, how)


def ml_string_indexer(df: DataFrame, cols: list[str],
                      handle_invalid: str = "skip"):
    """The reference's ML-pipeline construction (``sample_indexer.py:41-47``):
    one StringIndexer per column, wrapped in a Pipeline; returns
    (fitted PipelineModel, transformed DataFrame)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StringIndexer

    stages = [
        StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid=handle_invalid)
        for c in cols
    ]
    model = Pipeline(stages=stages).fit(df)
    return model, model.transform(df)
