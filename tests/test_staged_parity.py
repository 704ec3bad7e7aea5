"""Oracle parity for the STAGED (r15 pre-registered) tier.

``ds_ga1004_bigdata_project_spark.staged.STAGED`` holds the r15 wave —
written r14 post-close, registered at r15 open (see the module
docstring and PLANS.md "Round 15 wave pre-design"). This suite runs
the SAME driver-t2 replica compare as ``test_oracle_parity`` over the
staged tier every session, so by registration time each staged query
carries rounds of green parity history instead of a single pre-flight.

Also pinned here: staged names must be disjoint from the registry and
the retired tier (a registration flip must MOVE a query, never shadow
one), must continue the qNNN numbering, and every staged query must
carry an oracle (the staged tier deliberately contains no rows-only
queries — anything needing a pin-based protocol is designed in-round,
not staged). The dtype-kind check mirrors ``tools/driver_replica.py``'s
canonicalization (the q246/q256 lesson: string-value parity can pass
while a HUGEINT→float pandas dtype would fail the driver hash)."""

from __future__ import annotations

import re

import pytest

from ds_ga1004_bigdata_project_spark.queries import REGISTRY, RETIRED_PARITY
from ds_ga1004_bigdata_project_spark.staged import STAGED

from .conftest import SF_ORACLE
from .test_oracle_parity import _norm_rows

STAGED_NAMES = sorted(STAGED)


def test_staged_tier_shape():
    assert not (set(STAGED) & set(REGISTRY))
    assert not (set(STAGED) & set(RETIRED_PARITY))
    assert all(re.match(r"q\d{3}_", n) for n in STAGED)
    top_registered = max(
        int(re.match(r"q(\d+)_", n).group(1)) for n in REGISTRY)
    assert all(int(re.match(r"q(\d+)_", n).group(1)) > top_registered
               for n in STAGED), "staged numbering must extend the registry"
    assert all(q.oracle is not None for q in STAGED.values()), \
        "staged tier is oracle-only by design"


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_staged_oracle_parity(spark, duck, name):
    q = STAGED[name]
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


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_staged_dtype_kinds(spark, duck, name):
    """Driver-hash dtype discipline: pandas dtype KINDS must agree after
    column-name canonicalization (the replica's compare)."""
    q = STAGED[name]
    sp = q.build(spark, SF_ORACLE).toPandas()
    dk = duck.execute(q.oracle).fetchdf()
    sp = sp[sorted(sp.columns)]
    dk = dk[sorted(dk.columns)]
    pairs = [(c, sp[c].dtype.kind, dk[c].dtype.kind) for c in sp.columns]
    bad = [p for p in pairs if p[1] != p[2]]
    assert not bad, f"{name}: dtype-kind mismatch {bad}"
