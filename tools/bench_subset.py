#!/usr/bin/env python
"""Run bench.py's per-query timing for a named subset of queries.

Usage: python tools/bench_subset.py q59_brp_lsh_neighbors q92_auc_native ...
Same methodology as bench.py (noop sink, clearCache between queries, warm
q01 first) so numbers are comparable to BENCH_r{N}.json entries.

Round 14 (VERDICT r13 #8): every emission path is box-readable — the
payload carries the same ``controls``/``box_index`` block bench.py
emits (q01/q06 walls vs the BASELINE.md pins, timed IN THIS RUN after
the warm pass), so mid-round A/B numbers no longer need a manually
quoted control. The q01 warm pass is untimed as before; q01/q06 are
then timed like any subset member. ``box_index`` is None when the SF
is not 0.1 (the pins are sf0.1 walls) — raw controls still print for
same-SF comparison, mirroring bench.py's rule.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 8)
    names = sys.argv[1:]

    from bench import CONTROL_REF, box_controls
    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    from ds_ga1004_bigdata_project_spark.session import get_local_session

    spark = get_local_session(cpus, app_name="engine-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q01_top_parts"].build(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    def timed(name: str) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        try:
            REGISTRY[name].build(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — report, keep benching
            print(f"bench error {name}: {exc}", file=sys.stderr)
            return -1.0

    times: dict[str, float] = {}
    for name in names:
        times[name] = timed(name)
    # Controls timed in THIS run (after the warm pass), whether or not
    # they were in the subset — a subset run's controls must reflect
    # this JVM/box, not a prior artifact.
    ctrl = {name: (times[name] if name in times else timed(name))
            for name in CONTROL_REF}
    is_sf01 = "sf0.1" in sf_dir
    cb = box_controls(ctrl) if is_sf01 else {
        "controls": ctrl, "control_ref": CONTROL_REF, "box_index": None}
    print(json.dumps({"queries": times, "sf_dir": sf_dir, **cb}))
    spark.stop()


if __name__ == "__main__":
    main()
