#!/usr/bin/env python
"""A/B the round-11 bigram-LM fan-out per consumer (VERDICT r11 #2).

The r11 change routed bigram_lm_nll / the q196 explode through
relational.fan_out_small_scan; three of the four consumers' committed
close numbers moved ~2x the WRONG way at sf0.1 and no A/B was recorded.
This tool measures it: each consumer runs with the fan-out live ("on")
and with fan_out_small_scan monkeypatched to identity ("off"), arms
interleaved inside one warm JVM, ROUNDS passes, min per arm reported —
the same noise discipline as bench.py's retime tiers (a real plan cost
is slow in every pass; compile-wall noise is not). Control: q06.

Usage: python tools/bigram_fanout_ab.py [rounds]

ONE-SHOT HISTORICAL RECORD (ADVICE r12): the measurement this tool
exists for was taken at the r11 tree, where text.bigram_lm_nll still
called fan_out_small_scan — the +14/+47/+27% deltas it reported drove
the r12 per-consumer revert. At HEAD the call is GONE from the reverted
consumers, so monkeypatching rel.fan_out_small_scan no longer changes
their plans: a re-run reports ~0% for q146/q157/q182 (both arms are the
reverted plan), and only q196 — which kept the fan-out — still shows a
live delta. Do not read a fresh run as "the fan-out is free"; to re-A/B
the reverted consumers, re-wrap their input at the text.py seam first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONSUMERS = ("q146_bigram_lm_nll", "q157_domain_selection",
             "q182_ccnet_buckets", "q196_bigram_entropy")
CONTROL = "q06_join_chain_revenue"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 8)
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import ds_ga1004_bigdata_project_spark.operators.relational as rel
    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    from ds_ga1004_bigdata_project_spark.session import get_local_session

    fanned = rel.fan_out_small_scan

    spark = get_local_session(cpus, app_name="bigram-fanout-ab")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q01_top_parts"].build(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    def timed(name: str) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        REGISTRY[name].build(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    runs: dict[str, dict[str, list[float]]] = {
        n: {"on": [], "off": []} for n in CONSUMERS}
    controls: list[float] = []
    for r in range(rounds):
        controls.append(timed(CONTROL))
        for name in CONSUMERS:
            # alternate arm order across rounds so neither arm always
            # pays the colder position
            arms = ("on", "off") if r % 2 == 0 else ("off", "on")
            for arm in arms:
                rel.fan_out_small_scan = fanned if arm == "on" \
                    else (lambda df: df)
                try:
                    runs[name][arm].append(timed(name))
                finally:
                    rel.fan_out_small_scan = fanned
    out = {
        "sf_dir": sf_dir, "rounds": rounds,
        "control_q06": controls,
        "per_query": {
            n: {"on_min": min(v["on"]), "off_min": min(v["off"]),
                "on": v["on"], "off": v["off"],
                "delta_pct": round(100 * (min(v["on"]) - min(v["off"]))
                                   / min(v["off"]), 1)}
            for n, v in runs.items()},
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
