"""Rule-3 retirement: live-batch invariants + the next-head dry-run.

Round 13 (VERDICT r12 #5) dry-ran the FULL builder+oracle migration of
q68 in memory so the real execution would be a mechanical edit. Round
14 EXECUTED that edit: the first batch (q68/q77/q86/q69/q70/q79/q76,
COVERAGE.md retirement order) moved to ``RETIRED_PARITY`` via
``@_register_retired``. This module now pins, against the live tree:

1. the executed batch is exactly the first seven of the named
   COVERAGE.md batch — retired verbatim (builder + oracle + survey
   string all live in ``RETIRED_PARITY``), never in ``REGISTRY``,
   never in a driver slot;
2. the parity case STILL RUNS on a retired entry — the exact t2-gate
   compare (columns / rowcount / value multiset vs DuckDB at sf0.01)
   executes against the ``RETIRED_PARITY`` copy, which is what
   "coverage proofs never lapse" means in code (the full sweep runs in
   ``test_oracle_parity.py``, parametrized over REGISTRY ∪ RETIRED);
3. the dry-run mechanics stay proven for the NEXT engagement: the same
   in-memory migration sequence runs against q75_string_suite (the head
   of the remaining batch) and restores bit-identically.
"""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark import queries as Q

from .conftest import SF_ORACLE
from .test_oracle_parity import _norm_rows

#: The executed first batch, in COVERAGE.md retirement order.
EXECUTED = (
    "q68_exists_counts", "q77_distinct_aggs", "q86_multiset_ops",
    "q69_above_brand_avg", "q70_stats_suite", "q79_bool_bit_aggs",
    "q76_date_math",
)

#: Head of the remaining named batch — the next dry-run candidate.
NEXT_CANDIDATE = "q75_string_suite"


def test_first_batch_retired_live():
    assert set(EXECUTED) == set(Q.RETIRED_PARITY), (
        "RETIRED_PARITY must hold exactly the executed first batch")
    for name in EXECUTED:
        assert name not in Q.REGISTRY
        q = Q.RETIRED_PARITY[name]
        assert q.oracle is not None, "rows-only queries can never retire"
        assert q.survey and callable(q.build)
    # never in a driver slot: the window is the first 50 REGISTRY keys
    assert not set(EXECUTED) & set(list(Q.REGISTRY)[:50])
    # ceiling math the retirement bought: registry back under the cap
    assert len(Q.REGISTRY) <= 245


def test_retired_parity_case_still_runs(spark, duck):
    # Obligation 1 made concrete on the batch head: the EXACT t2-gate
    # compare runs against the RETIRED_PARITY copy.
    q = Q.RETIRED_PARITY["q68_exists_counts"]
    sdf = q.build(spark, SF_ORACLE)
    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert (_norm_rows(sdf.columns, spark_rows)
            == _norm_rows(duck_cols, duck_rows))


def test_rule3_dryrun_next_candidate(spark, duck):
    """The in-memory migration sequence, kept proven against the next
    batch head so the next engagement stays a mechanical edit."""
    orig_order = list(Q.REGISTRY)
    entry = Q.REGISTRY[NEXT_CANDIDATE]
    assert entry.oracle is not None, "rows-only queries can never retire"
    try:
        Q.RETIRED_PARITY[NEXT_CANDIDATE] = Q.REGISTRY.pop(NEXT_CANDIDATE)
        assert not set(Q.RETIRED_PARITY) & set(Q.REGISTRY)
        assert Q.RETIRED_PARITY[NEXT_CANDIDATE] is entry  # verbatim move

        Q._reorder_for_certification_window()
        assert NEXT_CANDIDATE not in Q.REGISTRY
        assert NEXT_CANDIDATE not in list(Q.REGISTRY)[:50]

        q = Q.RETIRED_PARITY[NEXT_CANDIDATE]
        sdf = q.build(spark, SF_ORACLE)
        res = duck.execute(q.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        spark_rows = [tuple(r) for r in sdf.collect()]
        assert sorted(sdf.columns) == sorted(duck_cols)
        assert len(spark_rows) == len(duck_rows)
        assert (_norm_rows(sdf.columns, spark_rows)
                == _norm_rows(duck_cols, duck_rows))
    finally:
        # restore IN PLACE and in original order: the reorder's tiebreak
        # is registration order, and other modules alias the REGISTRY
        # dict object — never rebind it.
        Q.RETIRED_PARITY.pop(NEXT_CANDIDATE, None)
        Q.REGISTRY[NEXT_CANDIDATE] = entry
        snapshot = {n: Q.REGISTRY[n] for n in orig_order}
        Q.REGISTRY.clear()
        Q.REGISTRY.update(snapshot)
        Q._reorder_for_certification_window()

    assert list(Q.REGISTRY) == orig_order, (
        "dry-run perturbed the registry order — the reorder is not a "
        "pure function of the artifacts + registry membership")
    assert NEXT_CANDIDATE not in Q.RETIRED_PARITY
