"""Rule-3 retirement dry-run (VERDICT r12 #5): exercise the FULL
builder+oracle migration of one first-batch query (q68, COVERAGE.md
retirement order head) into ``RETIRED_PARITY`` — in memory, restored
afterwards — so the r14 execution is a mechanical edit of an
already-proven sequence. The dry-run proves, against the live tree:

1. the migration is verbatim (same Query object — builder, oracle,
   survey string all survive);
2. the tier invariants hold mid-migration (no shadowing, oracle kept);
3. the certification-window reorder runs clean WITHOUT the retired
   query and never schedules it into a driver slot;
4. the parity case STILL RUNS on the migrated entry — the exact
   t2-gate compare (columns / rowcount / value multiset vs DuckDB at
   sf0.01) executes against the RETIRED_PARITY copy, which is what
   "coverage proofs never lapse" means in code;
5. the registry is bit-identical after restore (same names, same
   order), so the dry-run cannot perturb the real window.
"""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark import queries as Q

from .conftest import SF_ORACLE
from .test_oracle_parity import _norm_rows

CANDIDATE = "q68_exists_counts"  # head of the COVERAGE.md first batch


def test_rule3_retirement_dryrun_q68(spark, duck):
    orig_order = list(Q.REGISTRY)
    entry = Q.REGISTRY[CANDIDATE]
    assert entry.oracle is not None, "rows-only queries can never retire"
    try:
        # --- the mechanical migration (what the r14 commit will do via
        # @_register_retired instead of @_register) ---
        Q.RETIRED_PARITY[CANDIDATE] = Q.REGISTRY.pop(CANDIDATE)

        # tier invariants, mid-migration
        assert not set(Q.RETIRED_PARITY) & set(Q.REGISTRY)
        assert Q.RETIRED_PARITY[CANDIDATE] is entry  # verbatim move

        # the window machinery never schedules a retired query
        Q._reorder_for_certification_window()
        assert CANDIDATE not in Q.REGISTRY
        assert CANDIDATE not in list(Q.REGISTRY)[:50]

        # the parity case still runs — the EXACT t2-gate compare, on
        # the RETIRED_PARITY copy (proof obligation 1: a retirement
        # leaves the driver window, never this gate)
        q = Q.RETIRED_PARITY[CANDIDATE]
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
        # --- restore: the dry-run must not perturb the real window.
        # Re-inserting at the dict END would change the reorder's
        # registration-order tiebreak, so rebuild in the original
        # order — the r14 real retirement has no such step (the entry
        # simply stops being registered). ---
        Q.RETIRED_PARITY.pop(CANDIDATE, None)
        Q.REGISTRY[CANDIDATE] = entry
        Q.REGISTRY = {n: Q.REGISTRY[n] for n in orig_order}
        Q._reorder_for_certification_window()

    assert list(Q.REGISTRY) == orig_order, (
        "dry-run perturbed the registry order — the reorder is not a "
        "pure function of the artifacts + registry membership")
    assert CANDIDATE not in Q.RETIRED_PARITY
