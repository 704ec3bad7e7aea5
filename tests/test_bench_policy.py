"""bench-v3 policy pins (BASELINE.md "Bench methodology"): the close-mode
min-merge semantics and the frozen policy constants. These constants are
the methodology version — a change here is a new policy version and a
BASELINE.md row, not a tweak."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and bench)


def test_policy_constants_frozen():
    assert bench.RETIME_UNDER == 8.0
    assert bench.RETIME_OVER_FACTOR == 1.5
    assert bench.BENCH_POLICY == "bench-v3"


def test_merge_min_takes_per_query_minimum():
    acc: dict[str, float] = {}
    bench.merge_min(acc, {"q1": 5.0, "q2": 3.0})
    bench.merge_min(acc, {"q1": 4.2, "q2": 7.0, "q3": 1.0})
    bench.merge_min(acc, {"q1": 6.1, "q2": 2.9})
    assert acc == {"q1": 4.2, "q2": 2.9, "q3": 1.0}


def test_merge_min_failed_pass_is_overridden_by_success():
    acc: dict[str, float] = {}
    bench.merge_min(acc, {"q1": -1.0})
    assert acc == {"q1": -1.0}          # all passes failed so far
    bench.merge_min(acc, {"q1": 4.0})
    assert acc == {"q1": 4.0}           # success overrides failure
    bench.merge_min(acc, {"q1": -1.0})
    assert acc == {"q1": 4.0}           # later failure never regresses
