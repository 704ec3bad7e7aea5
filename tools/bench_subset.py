#!/usr/bin/env python
"""Run bench.py's per-query timing for a named subset of queries.

Usage: python tools/bench_subset.py q59_brp_lsh_neighbors q92_auc_native ...
Same methodology as bench.py (noop sink, clearCache between queries, warm
q01 first) so numbers are comparable to BENCH_r{N}.json entries.
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

    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    from ds_ga1004_bigdata_project_spark.session import get_local_session

    spark = get_local_session(cpus, app_name="engine-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q01_top_parts"].build(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    times: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        try:
            REGISTRY[name].build(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            times[name] = -1.0
            print(f"bench error {name}: {exc}", file=sys.stderr)
    print(json.dumps(times))
    spark.stop()


if __name__ == "__main__":
    main()
