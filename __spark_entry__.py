"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``ds_ga1004_bigdata_project_spark.queries.REGISTRY``): every implemented
operator from SURVEY.md §2 is a named query with a Spark builder and (where
SQL-expressible) a DuckDB oracle twin with matching column names.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ds_ga1004_bigdata_project_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2 M0): top-20 most-shipped parts on sf0.001 —
    scan → hash agg → broadcast dim join → global top-N."""
    return REGISTRY["q01_top_parts"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
