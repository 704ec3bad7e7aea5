"""Arrow-vectorized pandas UDF surface: scalar and grouped-aggregate forms.

Completes the engine's Python-boundary coverage (mapInPandas: multimodal;
applyInPandas: grouped.py; applyInPandasWithState: streaming; UDTF:
udtf_ops) with the two remaining shapes:

- **scalar pandas_udf** (Series → Series): batch-vectorized row functions.
  10-100× over row-at-a-time Python UDFs (one Arrow transfer per batch, numpy
  under the hood), still ~an order slower than JVM codegen — use only when no
  builtin expression exists.
- **grouped-aggregate pandas_udf** (Series → scalar): custom UDAFs. Unlike
  applyInPandas it participates in normal aggregation planning (can appear in
  ``groupBy().agg()`` beside builtin aggs), but each group's column still
  materializes in one Python worker — same skew caveat as any grouped-map.

Both demo functions are intentionally expressible natively; tests pin the
pandas path equal to the native twin, certifying the boundary, and the
docstrings carry the real use cases (learned scorers, scipy statistics).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def signed_log1p(v: pd.Series) -> pd.Series:
    """Scalar demo: sign-preserving log1p — the feature-compression transform
    (real uses: model featurizers, scipy special functions). Native twin:
    ``signum(x) * log1p(abs(x))``."""
    import numpy as np

    return np.sign(v) * np.log1p(np.abs(v))


def signed_log1p_native(col):
    """JVM twin of :func:`signed_log1p` — what you ship when the math is
    expressible (stays inside whole-stage codegen)."""
    return F.signum(col) * F.log1p(F.abs(col))


@pandas_udf(DoubleType())
def trimmed_mean_10(v: pd.Series) -> float:
    """Grouped-agg demo: 10%-trimmed mean (drop the bottom/top decile, mean
    the rest) — the robust-statistics shape (real uses: outlier-insensitive
    aggregation over sensor/price data). Whole group's column arrives as one
    Series; returns one scalar."""
    lo, hi = v.quantile(0.1), v.quantile(0.9)
    kept = v[(v >= lo) & (v <= hi)]
    return float(kept.mean()) if len(kept) else float("nan")
