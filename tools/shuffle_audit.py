#!/usr/bin/env python
"""Measure per-query shuffle-write and scan-input bytes (VERDICT r8 #8).

Usage: python tools/shuffle_audit.py q153_span_dedup_rewrite q149_... ...

Runs each named registry query at $SPARK_GRAFT_SF_DIR with bench.py's
noop-sink methodology, then attributes Spark-measured stage metrics
(shuffle write bytes, input bytes, shuffle-read spill) to the query via
the monitoring REST API: stage IDs are monotone in submission order, so
every stage first seen after the previous query's snapshot belongs to
the current one. Emits one JSON line per query:

    {"query": ..., "input_bytes": ..., "shuffle_write_bytes": ...,
     "spill_bytes": ..., "shuffle_per_input": ...}

``shuffle_per_input`` is the number the SCALE.md §100× dossier
extrapolates: bytes crossing the wire per byte scanned is
scale-invariant for linear-pass operators, so GB-shuffled-per-input-TB
at 100 TB is this ratio × 1 TB (any super-linear candidate growth shows
up in the 10× stress rows instead).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(ui: str) -> dict[int, dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    out: dict[int, dict] = {}
    for st in json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete")):
        out[st["stageId"]] = st
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 8)
    names = sys.argv[1:]

    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    from ds_ga1004_bigdata_project_spark.session import get_local_session

    spark = get_local_session(cpus, app_name="engine-shuffle-audit",
                              extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print("Spark UI disabled; cannot read stage metrics", file=sys.stderr)
        sys.exit(1)

    REGISTRY["q01_top_parts"].build(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    seen = set(_stages(ui))

    for name in names:
        spark.catalog.clearCache()
        REGISTRY[name].build(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        stages = _stages(ui)
        mine = [st for sid, st in stages.items() if sid not in seen]
        seen = set(stages)
        inp = sum(st.get("inputBytes", 0) for st in mine)
        shw = sum(st.get("shuffleWriteBytes", 0) for st in mine)
        spill = sum(st.get("diskBytesSpilled", 0) for st in mine)
        print(json.dumps({
            "query": name,
            "stages": len(mine),
            "input_bytes": inp,
            "shuffle_write_bytes": shw,
            "spill_bytes": spill,
            "shuffle_per_input": round(shw / inp, 3) if inp else None,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
