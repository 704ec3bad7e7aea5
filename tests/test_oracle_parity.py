"""Replicates the driver's t2 gate locally: run each registered Spark query and
its DuckDB oracle twin at sf0.01, compare row count, column names, and an
order-insensitive value multiset."""

from __future__ import annotations

import math

import pytest

from ds_ga1004_bigdata_project_spark.queries import REGISTRY, RETIRED_PARITY

from .conftest import SF_ORACLE

# REGISTRY ∪ RETIRED_PARITY: a rule-3 retirement leaves the driver
# window but NEVER leaves this gate (COVERAGE.md proof obligation 1).
_ALL = {**RETIRED_PARITY, **REGISTRY}
ORACLE_QUERIES = sorted(n for n, q in _ALL.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in _ALL.items() if q.oracle is None)


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and ulp-level format noise
        return f"{v + 0.0:.10g}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    q = _ALL[name]
    sdf = q.build(spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), \
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    a = _norm_rows(spark_cols, spark_rows)
    b = _norm_rows(duck_cols, duck_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diff}")


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    q = _ALL[name]
    df = q.build(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # oracle_sql keys must be a subset of queries keys
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
