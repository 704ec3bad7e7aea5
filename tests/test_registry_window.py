"""Driver correctness-window composition — the first 50 registry entries.

The driver certifies only the FIRST 50 entries of ``queries()``. Round 2
certified the original first 50 (CORRECTNESS_r02.json); round 3 rotates the
never-checked queries into the window. This pins the rotation so a later
refactor can't silently push a query back out of certification."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.queries import _R02_CERTIFIED, REGISTRY


def test_window_holds_all_previously_unchecked_queries():
    names = list(REGISTRY)
    window = set(names[:50])
    unchecked = set(names) - set(_R02_CERTIFIED)
    assert unchecked <= window, \
        f"previously uncertified queries outside the window: {unchecked - window}"


def test_window_has_cross_round_anchor_and_nothing_lost():
    names = list(REGISTRY)
    assert "q01_top_parts" in names[:50]  # sanity anchor across rounds
    assert len(names) == len(set(names))
    assert set(_R02_CERTIFIED) <= set(names)


def test_oracle_queries_all_certifiable_across_rounds():
    # Every oracle-bearing query is either in the r02-certified list or in
    # this round's window — i.e. after r03 runs, no oracle query has never
    # been driver-checked.
    names = list(REGISTRY)
    window = set(names[:50])
    for name, q in REGISTRY.items():
        if q.oracle is not None:
            assert name in window or name in _R02_CERTIFIED, name
