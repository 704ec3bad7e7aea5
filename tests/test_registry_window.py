"""Driver correctness-window composition — the first 50 registry entries.

The driver certifies only the FIRST 50 entries of ``queries()``. Round 2
certified the original first 50 (CORRECTNESS_r02.json); round 3 rotated the
never-checked queries in (r02 ∪ r03 covers everything). From round 4 the
policy is changed-since-certified first: every query this round touched must
lead the window, ahead of staleness refreshes. This pins that policy so a
later refactor can't silently ship changed code outside certification."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.queries import (
    _ANCHOR, _CHANGED_SINCE_CERTIFIED, _R02_CERTIFIED, REGISTRY)


def test_changed_queries_lead_the_window():
    names = list(REGISTRY)
    window = names[:50]
    n = len(_CHANGED_SINCE_CERTIFIED)
    assert list(_CHANGED_SINCE_CERTIFIED) == window[:n], \
        "changed-since-certified queries must occupy the front of the window"
    assert window[n] == _ANCHOR


def test_window_has_cross_round_anchor_and_nothing_lost():
    names = list(REGISTRY)
    assert _ANCHOR in names[:50]  # sanity anchor across rounds
    assert len(names) == len(set(names))
    assert set(_R02_CERTIFIED) <= set(names)
    assert set(_CHANGED_SINCE_CERTIFIED) <= set(names)


#: Queries WITHOUT a past driver row that this round's full window could
#: not admit (the front + ten vintage refreshes + anchor left one spare
#: slot, taken by the riskier q141). Each must carry tri-SF oracle-parity
#: + strict driver-replica evidence instead, and must sit immediately
#: after the window so the next round's reorder pulls it in first.
_DEFERRED_TO_NEXT_WINDOW = ("q140_editdist_neardup", "q142_k_anonymity",
                            "q143_token_budget_selection",
                            "q144_contamination_matrix")


def test_every_query_has_a_certification_round():
    # The union of every driver correctness round certified every existing
    # query (oracle AND rows-only); anything newer must be in the
    # changed-since-certified front (and therefore inside this window) — no
    # query ever exists without a certification round, past or scheduled —
    # except the explicitly documented deferred list above.
    import glob
    import json
    import os

    names = list(REGISTRY)
    window = set(names[:50])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ever_certified = set(_R02_CERTIFIED)
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            ever_certified |= set(json.load(fh))
    for name in names:
        if name in _DEFERRED_TO_NEXT_WINDOW:
            continue
        assert name in ever_certified or name in window, \
            f"{name} has no past certification and is outside the window"


def test_deferred_queries_are_first_in_line_and_oracle_backed():
    names = list(REGISTRY)
    for i, name in enumerate(_DEFERRED_TO_NEXT_WINDOW):
        assert names[50 + i] == name, \
            f"{name} must sit immediately after the window (got {names[50 + i]})"
        assert REGISTRY[name].oracle is not None, \
            f"{name} defers its driver row — it must at least be oracle-backed"
