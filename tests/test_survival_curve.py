"""Hand-computed Kaplan-Meier pin for q222_survival_curve: the KM
conventions (sequenced first-view -> first strictly-later purchase,
administrative censoring at 72 h, deaths-before-censorings at tied
times, terminal deaths==n_risk row) are subtle enough that the oracle
alone — which shares the algebra — cannot catch a convention error made
identically on both sides. This pins the estimator against values
computed by hand."""

from __future__ import annotations

import datetime as dt

from ds_ga1004_bigdata_project_spark.queries import REGISTRY


def _mk_events(spark, tmp_path, rows):
    ddl = ("event_id long, ts timestamp, user_id long, "
           "event_type string, value double, props string")
    full = [(i, ts, uid, typ, 0.0, "{}")
            for i, (ts, uid, typ) in enumerate(rows)]
    d = tmp_path / "sf_km"
    d.mkdir()
    spark.createDataFrame(full, ddl).write.parquet(
        str(d / "events.parquet"))
    return str(d)


def test_km_hand_computed(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)

    def h(hours, minutes=0):
        return t0 + dt.timedelta(hours=hours, minutes=minutes)

    rows = [
        # u1: converts within the first hour (duration floor = 0)
        (h(0), 1, "view"), (h(0, 30), 1, "purchase"),
        # u2, u3: convert at exactly 5h elapsed
        (h(0), 2, "view"), (h(5), 2, "purchase"),
        (h(0), 3, "view"), (h(5), 3, "purchase"),
        # u4: never purchases -> censored at 72
        (h(0), 4, "view"), (h(10), 4, "click"),
        # u5: purchases at 80h -> past the horizon, censored at 72
        (h(0), 5, "view"), (h(80), 5, "purchase"),
        # u6: purchase BEFORE any view, never after -> no qualifying
        #     conversion, censored at 72 (the sequencing rule)
        (h(1), 6, "purchase"), (h(2), 6, "view"),
        # keep the observation window comfortably past the horizon
        (h(200), 1, "error"),
    ]
    sf = _mk_events(spark, tmp_path, rows)
    got = [(r.hours, r.n_at_risk, r.n_deaths, r.survival)
           for r in REGISTRY["q222_survival_curve"].build(spark, sf)
           .collect()]
    # n = 6 users with a first view. Deaths: u1 at 0; u2,u3 at 5.
    # Censored at 72: u4, u5, u6.
    # S(0)  = 1 - 1/6            = 0.8333
    # S(5)  = S(0) * (1 - 2/5)   = 0.5  ->  0.5 exactly
    assert got == [(0, 6, 1, 0.8333), (5, 5, 2, 0.5)], got


def test_km_terminal_all_die_row_is_zero(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0, 1, "view"), (t0 + dt.timedelta(hours=3), 1, "purchase"),
        (t0, 2, "view"), (t0 + dt.timedelta(hours=3), 2, "purchase"),
    ]
    sf = _mk_events(spark, tmp_path, rows)
    got = [(r.hours, r.n_at_risk, r.n_deaths, r.survival)
           for r in REGISTRY["q222_survival_curve"].build(spark, sf)
           .collect()]
    # Both users die at t=3 with nobody censored: the terminal
    # deaths == n_risk row must emit survival 0 (its ln-factor is
    # NULL by construction, never -inf).
    assert got == [(3, 2, 2, 0.0)], got
