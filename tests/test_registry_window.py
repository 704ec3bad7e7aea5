"""Driver correctness-window composition — the first 50 registry entries.

The driver certifies only the FIRST 50 entries of ``queries()``. Round 2
certified the original first 50 (CORRECTNESS_r02.json); round 3 rotated the
never-checked queries in (r02 ∪ r03 covers everything). From round 4 the
policy is changed-since-certified first: every query this round touched must
lead the window, ahead of staleness refreshes. From round 7 the
never-certified tier leads even the changed tier (VERDICT r6 #1 made the
four r6-deferred queries the round's top directive). This pins that policy
so a later refactor can't silently ship changed code outside certification.
"""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.queries import (
    _ANCHOR, _CHANGED_SINCE_CERTIFIED, _DEFERRED_TO_NEXT_WINDOW,
    _NEVER_CERTIFIED, _R02_CERTIFIED, REGISTRY)


def _deferred_now() -> set[str]:
    from ds_ga1004_bigdata_project_spark.queries import (
        _active_deferrals, _latest_certification_rounds)
    return _active_deferrals(_latest_certification_rounds())


def _changed_now() -> tuple[str, ...]:
    from ds_ga1004_bigdata_project_spark.queries import (
        _active_changed, _latest_certification_rounds)
    return _active_changed(_latest_certification_rounds())


def test_never_certified_then_changed_lead_the_window():
    names = list(REGISTRY)
    window = names[:50]
    deferred = _deferred_now()
    front = [n for n in _NEVER_CERTIFIED if n not in deferred] + [
        n for n in _changed_now() if n not in _NEVER_CERTIFIED]
    n = len(front)
    assert front == window[:n], \
        "never-certified + changed queries must occupy the front of the window"
    assert window[n] == _ANCHOR


def test_window_has_cross_round_anchor_and_nothing_lost():
    names = list(REGISTRY)
    assert _ANCHOR in names[:50]  # sanity anchor across rounds
    assert len(names) == len(set(names))
    assert set(_R02_CERTIFIED) <= set(names)
    assert {n for n, _ in _CHANGED_SINCE_CERTIFIED} <= set(names)
    assert set(_NEVER_CERTIFIED) <= set(names)


def test_never_certified_tier_is_exact_and_oracle_backed():
    # VERDICT r8 #1: the tier is artifact-DERIVED at import, so this test
    # recomputes the set independently (raw glob + json, not the package
    # helper) and asserts the import-time derivation agrees — a revert to
    # a static tuple, or a derivation bug, goes red here. The real teeth:
    # every uncertified query entering the window must carry independent
    # value evidence (a DuckDB oracle, or a sha256 snapshot pin for
    # rows-only-by-design ops).
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ever_certified = set(_R02_CERTIFIED)
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            ever_certified |= set(json.load(fh))
    actual_never = {n for n in REGISTRY if n not in ever_certified}
    assert actual_never == set(_NEVER_CERTIFIED), (
        "artifact-derived never-certified set drifted from the import-time "
        f"derivation: missing={actual_never - set(_NEVER_CERTIFIED)}, "
        f"stale={set(_NEVER_CERTIFIED) - actual_never}")
    from .test_snapshot_pins import _PINS
    for name in _NEVER_CERTIFIED:
        assert REGISTRY[name].oracle is not None or name in _PINS, (
            f"{name} enters the window uncertified — it needs an oracle "
            f"or a snapshot pin")


def test_never_certified_derivation_survives_future_artifacts(tmp_path):
    # The r7/r8 recurring failure: a driver CORRECTNESS artifact landing
    # AFTER round close certified the static front tier and went red.
    # Simulate exactly that — a future-round artifact certifying every
    # registry query — against a tmpdir and assert the derivation empties
    # the tier instead of going stale.
    import glob
    import json
    import os
    import shutil

    from ds_ga1004_bigdata_project_spark.queries import (
        _derive_never_certified, _latest_certification_rounds)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        shutil.copy(path, tmp_path / os.path.basename(path))
    fake = {n: {"rows_match": True, "hash_match": True} for n in REGISTRY}
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(fake))

    latest = _latest_certification_rounds(str(tmp_path))
    assert max(latest.values()) == 99
    assert _derive_never_certified(latest) == ()
    # And the SLO arithmetic holds against the simulated future: every
    # query appears in the fake r99 artifact, so none is stale.
    assert not {n for n in REGISTRY if latest.get(n, 0) < 99 - 2}

    # Unreadable-artifact fallback: empty dict -> the static fallback,
    # never "everything is uncertified".
    from ds_ga1004_bigdata_project_spark.queries import (
        _NEVER_CERTIFIED_FALLBACK)
    assert _derive_never_certified({}) == _NEVER_CERTIFIED_FALLBACK


def test_every_query_has_a_certification_round():
    # The union of every driver correctness round certified every existing
    # query (oracle AND rows-only); anything newer must be in the window —
    # no query ever exists without a certification round, past or
    # scheduled. (Round 7 has no deferred tier: the five uncertified
    # queries all fit inside the 50-slot window.)
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
    deferred = _deferred_now()
    for name in names:
        assert (name in ever_certified or name in window
                or name in deferred), \
            f"{name} has no past certification and is outside the window"


def test_deferred_tier_sits_last_and_carries_evidence():
    # Window-full discipline (r6 learning #8, reintroduced r9): deferred
    # queries must never displace a scheduled refresh — they sit at the
    # very END of the registry, carry a DuckDB oracle or a snapshot pin
    # (their local evidence gate: tri-SF parity + driver replica), and
    # the deferral dissolves the moment a newer artifact lands so they
    # auto-lead the next window.
    from ds_ga1004_bigdata_project_spark.queries import _active_deferrals
    deferred = _deferred_now()
    names = list(REGISTRY)
    if deferred:
        tail = names[-len(deferred):]
        assert set(tail) == deferred, \
            f"deferred queries must close the registry order, got {tail}"
    from .test_snapshot_pins import _PINS
    for name in _DEFERRED_TO_NEXT_WINDOW:
        assert REGISTRY[name].oracle is not None or name in _PINS, (
            f"{name} is deferred past the driver window — it needs an "
            f"oracle or a snapshot pin as local evidence")
    # Expiry: a future-round artifact dissolves the deferral entirely.
    assert _active_deferrals({"q01_top_parts": 99}) == set()


def test_rotation_slo_no_stale_certificates():
    # VERDICT r7 #8, recalibrated round 9: the SLO bound is DERIVED from
    # what stalest-first rotation can achieve at the current registry
    # size and steady-state refresh capacity (one full sweep + the
    # landing round, see _rotation_staleness_bound). The r7-era static
    # constant (maxRound − 2) encoded a 146-query cadence and became
    # unsatisfiable-by-construction every time a post-close artifact
    # advanced maxRound — the recurring red-test class VERDICT r8 #1
    # ordered fixed. A failure here now means the rotation GENUINELY
    # stalled (e.g. the import-time recompose stopped running), not that
    # the registry grew.
    from ds_ga1004_bigdata_project_spark.queries import (
        _latest_certification_rounds, _rotation_staleness_bound)

    latest = _latest_certification_rounds()
    if not latest:  # artifacts unavailable — nothing to measure
        return
    max_round = max(latest.values())
    names = list(REGISTRY)
    steady_front = len(set(_changed_now())) + 1  # + anchor
    bound = _rotation_staleness_bound(steady_front, len(names))
    # Staleness is a property of certificates that EXIST: never-certified
    # queries outside the window are the deferred tier, whose scheduling
    # guarantee (in-window or deferred-with-evidence, auto-leading the
    # next window) is pinned by test_every_query_has_a_certification_round
    # and test_deferred_tier_sits_last_and_carries_evidence.
    stale = {n: latest[n] for n in names[50:]
             if n in latest and latest[n] < max_round - bound}
    assert not stale, (
        f"queries outside the window with certificates older than "
        f"r{max_round - bound} (bound={bound}): {stale}")


def test_rotation_slo_survives_post_close_artifact(tmp_path):
    # The exact r7/r8 recurring failure mode, replayed: the driver's
    # CORRECTNESS_r{N}.json lands AFTER round close, maxRound advances by
    # one, and a frozen staleness threshold goes red on a tree that was
    # green at close. Simulate the landing (a future artifact certifying
    # exactly the current first-50 window), recompose the window the way
    # the import-time reorder would, and assert the derived SLO bound
    # stays green.
    import glob
    import json
    import os
    import shutil

    from ds_ga1004_bigdata_project_spark.queries import (
        _derive_never_certified, _latest_certification_rounds,
        _rotation_staleness_bound)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        shutil.copy(path, tmp_path / os.path.basename(path))
    before = _latest_certification_rounds()
    if not before:  # artifacts unavailable — nothing to simulate
        return
    nxt = max(before.values()) + 1
    window_now = list(REGISTRY)[:50]
    fake = {n: {"rows_match": True, "hash_match": True} for n in window_now}
    (tmp_path / f"CORRECTNESS_r{nxt}.json").write_text(json.dumps(fake))

    latest = _latest_certification_rounds(str(tmp_path))
    assert max(latest.values()) == nxt
    # Post-landing, every current in-window never-certified query gets a
    # row; only the deferred tier (outside the window by design) stays
    # uncertified — and it leads the NEXT window, not the stale set.
    assert set(_derive_never_certified(latest)) <= set(
        _DEFERRED_TO_NEXT_WINDOW)
    # Recompose set-level: never-certified (the expired deferrals), then
    # changed + anchor, then stalest.
    from ds_ga1004_bigdata_project_spark.queries import _active_changed
    front = list(_derive_never_certified(latest))
    front += [n for n in _active_changed(latest)
              if n in REGISTRY and n not in front]
    front.append(_ANCHOR)
    rest = sorted((n for n in REGISTRY if n not in set(front)),
                  key=lambda n: latest.get(n, 2))
    next_window = set(front) | set(rest[:50 - len(front)])
    bound = _rotation_staleness_bound(len(front), len(REGISTRY))
    stale = {n: latest.get(n, 2) for n in REGISTRY
             if n not in next_window and latest.get(n, 2) < nxt - bound}
    assert not stale, (
        f"post-close landing of r{nxt} would strand stale certificates "
        f"(bound={bound}): {stale}")


def test_refresh_slots_go_to_stalest_certificates():
    # Middle tier: after the front + anchor, every in-window refresh slot
    # must hold a certificate at least as stale as anything outside the
    # window (VERDICT r6 #4's rotation discipline, now artifact-driven).
    from ds_ga1004_bigdata_project_spark.queries import (
        _latest_certification_rounds)

    latest = _latest_certification_rounds()
    if not latest:  # artifacts unavailable — static fallback, nothing to pin
        return
    names = list(REGISTRY)
    front = set(_NEVER_CERTIFIED) | set(_changed_now()) | {_ANCHOR}
    mid = [n for n in names[:50] if n not in front]
    out = [n for n in names[50:] if n not in front and n not in _deferred_now()]
    if mid and out:
        assert max(latest.get(n, 2) for n in mid) <= \
            min(latest.get(n, 2) for n in out), \
            "a staler certificate sits outside the window than inside it"


def test_changed_tier_self_expires_against_artifacts():
    # VERDICT r9 #4: a changed-tier entry whose certification row is as
    # new as its change round must NOT occupy a window slot — the tier
    # cross-checks itself against _latest_certification_rounds() at
    # import, so a landed driver row vacates the slot with no manual
    # bookkeeping step to forget. The r9 wave (all six certified in r09)
    # is the live fixture: every entry must be expired on this tree.
    from ds_ga1004_bigdata_project_spark.queries import (
        _active_changed, _changed_rounds, _latest_certification_rounds)

    latest = _latest_certification_rounds()
    if not latest:  # artifacts unavailable — expiry has nothing to read
        return
    active = set(_active_changed(latest))
    for name, changed_round in _changed_rounds().items():
        certified = latest.get(name, 0)
        if certified >= changed_round:
            assert name not in active, (
                f"{name} was certified in r{certified} (change shipped "
                f"r{changed_round}) yet still burns a window slot")
        else:
            assert name in active, (
                f"{name} changed in r{changed_round} but newest row is "
                f"r{certified} — it must lead the window until re-certified")
    # Unreadable artifacts keep everything active (re-certify, never
    # silently expire).
    assert set(_active_changed({})) == {n for n, _ in
                                        _CHANGED_SINCE_CERTIFIED}
    # And a future landing expires an entry without code edits.
    assert "q173_prefix_filtered_join" not in _active_changed(
        {"q173_prefix_filtered_join": 99})
    # VERDICT r10 wrong #1: the provenance record is duplicate-SAFE —
    # q173 changed in BOTH r9 and r10 and both entries must survive
    # (the r10 dict literal silently shadowed the r9 row); the newest
    # round governs expiry.
    q173 = [r for n, r in _CHANGED_SINCE_CERTIFIED
            if n == "q173_prefix_filtered_join"]
    assert q173 == [9, 10], "q173's r9+r10 provenance rows must both survive"
    assert _changed_rounds()["q173_prefix_filtered_join"] == 10


def test_rows_only_proof_table_is_exact():
    # VERDICT r9 #8: the rows-only tier is a documented CLOSED set — every
    # oracle-less registry query carries a one-line proof that no
    # SQL-expressible invariant exists, and no proof line goes stale
    # (names an oracle-backed or removed query). A new rows-only query
    # cannot ship without either an oracle or its proof entry.
    from ds_ga1004_bigdata_project_spark.queries import _ROWS_ONLY_PROOFS

    oracle_less = {n for n, e in REGISTRY.items() if e.oracle is None}
    assert set(_ROWS_ONLY_PROOFS) == oracle_less, (
        f"missing proofs: {oracle_less - set(_ROWS_ONLY_PROOFS)}; "
        f"stale proofs: {set(_ROWS_ONLY_PROOFS) - oracle_less}")
    for name, proof in _ROWS_ONLY_PROOFS.items():
        assert len(proof) > 40, f"{name}'s proof line is not a proof"


def test_retired_parity_tier_invariants():
    """Rule-3 scaffolding (COVERAGE.md growth policy): retired queries
    must keep an oracle (rows-only queries can never retire), must not
    shadow a live registry name, and the combined surface must stay at
    or under the documented ceiling + batch headroom."""
    from ds_ga1004_bigdata_project_spark.queries import (
        REGISTRY, RETIRED_PARITY)

    overlap = set(RETIRED_PARITY) & set(REGISTRY)
    assert not overlap, f"retired names shadow live ones: {overlap}"
    no_oracle = [n for n, q in RETIRED_PARITY.items() if q.oracle is None]
    assert not no_oracle, (
        f"rows-only queries can never retire (pins are their only "
        f"value evidence): {no_oracle}")
    assert len(REGISTRY) <= 245, (
        "registry exceeds the growth-policy ceiling — retire per "
        "COVERAGE.md rule 3 instead of growing past 245")
