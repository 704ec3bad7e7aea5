#!/usr/bin/env python
"""Diagnose the rotating in-suite bench inflation class (VERDICT r9 #3).

q150/q152/q157/q154 swing 3-6× across full-suite bench runs while
isolated runs and the q06 control stay flat. All four live in bench
chunk 1 (q137→q180, one JVM), so the mechanism is cumulative
within-JVM state. This probe replays that exact chunk sequence with the
bench's own methodology (warm battery, clearCache, periodic GC, noop
sink) but with the Spark UI store enabled, and attributes PER-QUERY
task-level metrics via the monitoring REST API:

  wall            — perf_counter around the noop write (bench's number)
  task_sec        — sum of executorRunTime over the query's stages
  cpu_sec         — sum of executorCpuTime (the work that HAD to happen)
  gc_sec          — sum of jvmGcTime
  sched_sec       — sum of (firstTaskLaunchedTime − submissionTime)
  stage_span      — sum of (completionTime − submissionTime)
  driver_sec      — wall − stage_span (broadcast builds, planning,
                    driver-side collects — anything outside stages)

The split identifies the mechanism when an inflated run is caught:
  wall↑ cpu_sec flat task_sec↑          → executor-thread contention/GC
  wall↑ gc_sec↑                          → heap churn
  wall↑ stage_span flat driver_sec↑      → driver-side (broadcast build,
                                           codegen/planning, listener bus)
  wall↑ cpu_sec↑                         → the plan genuinely re-executed
                                           something (cache loss)

Run:  python tools/inflation_probe.py [--chunk 1] [--out FILE]
One JSON line per query; rerun until an inflated sample is caught
(the class rotates — VERDICT r9 saw q150 at 20.7 s roughly one run in
two at suite close).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
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


def _ms(st: dict, a: str, b: str) -> float:
    from datetime import datetime
    try:
        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        ta = datetime.strptime(st[a].replace("GMT", ""), fmt.replace("%Z", ""))
        tb = datetime.strptime(st[b].replace("GMT", ""), fmt.replace("%Z", ""))
        return (tb - ta).total_seconds()
    except Exception:
        return 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--only", nargs="*", default=None,
                    help="run just these queries (isolated baseline with "
                         "the same metric attribution)")
    ap.add_argument("--detail", nargs="*", default=None,
                    help="emit per-stage metric rows for these queries")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 8)

    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    from ds_ga1004_bigdata_project_spark.session import get_local_session

    names = sorted(REGISTRY)
    step = -(-len(names) // 4)
    chunk = args.only or names[args.chunk * step:(args.chunk + 1) * step]

    spark = get_local_session(cpus, app_name="inflation-probe",
                              extra_conf={
                                  "spark.ui.enabled": "true",
                                  # bench trims the status store to keep the
                                  # listener bus cheap; the probe needs every
                                  # stage retained for attribution. This IS a
                                  # deliberate methodology delta — if enabling
                                  # retention alone changes the inflation
                                  # behavior, that's itself the finding.
                                  "spark.ui.retainedStages": "20000",
                                  "spark.ui.retainedJobs": "20000",
                              })
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    # bench.py's warm battery, verbatim shape.
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F
    REGISTRY["q01_top_parts"].build(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    r = spark.range(10_000).withColumn("k", _F.col("id") % 97) \
        .withColumn("s", _F.concat(_F.lit("w"), _F.col("k")))
    warm_plans = [
        r.groupBy("k").agg(_F.sum("id"), _F.countDistinct("s")),
        r.join(r.groupBy("k").count(), "k"),
        r.join(r.withColumnRenamed("id", "id2").hint("merge"), "k"),
        r.withColumn("rn", _F.row_number().over(
            _W.partitionBy("k").orderBy("id"))).filter("rn <= 3"),
        r.orderBy("s").limit(100),
        r.select(_F.explode(_F.split(_F.repeat(_F.col("s"), 3), "w"))),
        r.select(_F.aggregate(_F.sequence(_F.lit(1), _F.lit(20)),
                              _F.lit(0).cast("bigint"),
                              lambda a, x: a + _F.xxhash64(x))),
        r.groupBy("k").agg(_F.sort_array(_F.collect_list("s"))),
    ]
    for p in warm_plans:
        p.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    out_fh = open(args.out, "a") if args.out else sys.stdout
    seen: set[int] = set(_stages(ui))

    # Direct JIT evidence: cumulative HotSpot compilation wall (ms) and
    # code-cache occupancy from the JVM's own MXBeans. If inflated
    # queries coincide with large compile-time deltas — the compiler
    # thread pool still chewing through earlier queries' generated
    # classes — their extra cpu_sec is interpreted/C1 execution of
    # not-yet-C2-compiled codegen, the rotating-by-nature mechanism.
    jmx = spark.sparkContext._jvm.java.lang.management.ManagementFactory

    def _jit_ms() -> int:
        return jmx.getCompilationMXBean().getTotalCompilationTime()

    def _code_cache_mb() -> float:
        used = 0
        it = jmx.getMemoryPoolMXBeans().iterator()
        while it.hasNext():
            pool = it.next()
            if "CodeHeap" in pool.getName() or "Code Cache" in pool.getName():
                used += pool.getUsage().getUsed()
        return round(used / 1e6, 1)
    for i, name in enumerate(chunk):
        spark.catalog.clearCache()
        if i % 8 == 0:
            spark.sparkContext._jvm.System.gc()
        jit0 = _jit_ms()
        t0 = time.perf_counter()
        try:
            REGISTRY[name].build(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception as exc:
            print(f"probe error {name}: {exc}", file=sys.stderr)
            continue
        wall = time.perf_counter() - t0
        now = _stages(ui)
        mine = [st for sid, st in now.items() if sid not in seen]
        seen = set(now)
        rec = {
            "query": name, "wall": round(wall, 2),
            "task_sec": round(sum(s.get("executorRunTime", 0)
                                  for s in mine) / 1e3, 2),
            "cpu_sec": round(sum(s.get("executorCpuTime", 0)
                                 for s in mine) / 1e9, 2),
            "gc_sec": round(sum(s.get("jvmGcTime", 0) for s in mine) / 1e3, 2),
            "sched_sec": round(sum(
                _ms(s, "submissionTime", "firstTaskLaunchedTime")
                for s in mine), 2),
            "stage_span": round(sum(
                _ms(s, "submissionTime", "completionTime")
                for s in mine), 2),
            "n_stages": len(mine),
            "jit_ms": _jit_ms() - jit0,
            "code_cache_mb": _code_cache_mb(),
        }
        rec["driver_sec"] = round(wall - rec["stage_span"], 2)
        print(json.dumps(rec), file=out_fh, flush=True)
        if args.detail and name in args.detail:
            for s in sorted(mine, key=lambda s: s["stageId"]):
                print(json.dumps({
                    "stage": s["stageId"],
                    "name": s.get("name", "")[:80],
                    "tasks": s.get("numCompleteTasks"),
                    "span": round(_ms(s, "submissionTime",
                                      "completionTime"), 2),
                    "task_sec": round(s.get("executorRunTime", 0) / 1e3, 2),
                    "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 2),
                    "gc_sec": round(s.get("jvmGcTime", 0) / 1e3, 2),
                    "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "sw_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                }), file=out_fh, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
