"""Grouped transforms: the native-window path vs the pandas grouped-map path.

The engine's rule (README design stance): stay JVM-side unless the semantics
genuinely need Python. Per-group standardization is the canonical example of
an op people reach for ``applyInPandas`` on, that windows express natively —
so both implementations live here, and ``tests/test_grouped.py`` pins them
equal. The pandas twin is the TEMPLATE for genuinely non-relational grouped
logic (per-group model fits, custom solvers); the native one is what you ship
when the math is expressible.

Scale note: the native path is one partition-by-group shuffle and streams —
no group must fit in memory. ``applyInPandas`` materializes EACH GROUP as one
pandas DataFrame on one executor: fine for many small groups, a deal-breaker
for a skewed giant group. That asymmetry is the real reason the native path
is the default at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_native(df: DataFrame, value_col: str, group_cols: list[str],
                  out_col: str = "z", scale: int | None = 4) -> DataFrame:
    """Per-group standardization with EXACT moments: decimal sums for Σx and
    Σx², so mean/variance (and therefore every z) are independent of
    partition/shuffle order — float window-stddev is not.

    Shape: groupBy-aggregate the per-group moments (partial aggregation keeps
    every core busy however few groups there are), then broadcast the tiny
    moment table back onto the rows. The tempting alternative — ``sum OVER
    (PARTITION BY group)`` — collapses each group into ONE window partition:
    with 3 groups at 100 TB that is parallelism 3. Same arithmetic, fatally
    different physical plan.

    Assumes ``value_col`` carries ≤2 decimal places (money/quantity columns;
    exact squares then have ≤4, within decimal(38,8))."""
    x = F.col(value_col)
    xd = x.cast("decimal(18,2)")
    moments = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(xd).cast("double").alias("_s1"),
        F.sum((xd * xd).cast("decimal(38,8)")).cast("double").alias("_s2"))
    joined = df.join(F.broadcast(moments), group_cols)
    mean = F.col("_s1") / F.col("_n")
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_n")) \
        / (F.col("_n") - 1)  # sample variance, exact numerator
    z = (x - mean) / F.sqrt(var)
    return (joined
            .withColumn(out_col, F.round(z, scale) if scale is not None else z)
            .drop("_n", "_s1", "_s2"))


def zscore_pandas(df: DataFrame, value_col: str, group_cols: list[str],
                  out_col: str = "z", scale: int | None = 4) -> DataFrame:
    """``applyInPandas`` twin of :func:`zscore_native` — same contract, Python
    grouped-map execution (Arrow-batched). Kept as the template for grouped
    logic Spark expressions can't say; see module docstring for the memory
    asymmetry."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    # NB: StructType.add mutates in place — never call it on df.schema (that
    # desyncs the Python-side column list from the JVM plan). Build a copy.
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, DoubleType())])

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].astype("float64")
        z = (x - x.mean()) / x.std(ddof=1)
        pdf[out_col] = z.round(scale) if scale is not None else z
        return pdf

    return df.groupBy(*group_cols).applyInPandas(standardize, schema=out_schema)
