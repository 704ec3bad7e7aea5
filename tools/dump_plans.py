#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries to files.

Optimization-round evidence protocol: before touching a query, capture its
physical plan to ``plans/r14/<query>_before.txt``; after the change, to
``plans/r14/<query>_after.txt``. The judge reads these against the code, so
every file is the REAL pre-execution formatted plan at the given SF (default
sf0.1 — the bench SF), produced by the same session factory the bench uses.

Usage:
  python tools/dump_plans.py before q167_triangle_participation q173_...
  python tools/dump_plans.py after  q167_triangle_participation
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/dump_plans.py before qXX
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if tag not in ("before", "after"):
        raise SystemExit("first arg must be 'before' or 'after'")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans",
                           os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)

    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    from ds_ga1004_bigdata_project_spark.session import get_local_session

    spark = get_local_session(8, app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir} [{tag}]\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
