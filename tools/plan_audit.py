#!/usr/bin/env python
"""Static physical-plan audit of EVERY registry builder (the q251 sweep,
made exhaustive and permanent).

Round 14's post-close self-audit found two scale walls hiding inside one
query (q251: an unpartitioned ntile window over the customer grain, and a
global cumulative count over a near-unique revenue domain) — patterns the
fixture hides because 60k rows fit in one partition either way. This tool
runs that sweep over the WHOLE registry so the class can never ship
silently again:

  for each REGISTRY query: build the DataFrame at $ORACLE_SF_DIR
  (default sf0.001), take the pre-execution physical plan string, and
  count the scale-killer signatures —

    single_partition   `Exchange SinglePartition`  — a global sort /
                       unpartitioned window / global limit funneling ALL
                       rows through one task.  Fine over a value-domain
                       or horizon-bounded relation; a 100 TB wall over a
                       row-grain relation.
    cartesian          `CartesianProduct`          — unbounded pair fan-out.
    nested_loop        `BroadcastNestedLoopJoin`   — bounded only if the
                       broadcast side is a frame/constant relation.
    py_row_udf         `BatchEvalPython`           — row-at-a-time Python
                       in the hot path (the engine bans these; Arrow
                       `ArrowEvalPython` / `MapInPandas` etc. are the
                       sanctioned vectorized forms and are NOT flagged).

Streaming-run queries (build() executes a Structured Streaming pipeline
and returns a sink read-back) are audited too, but their returned plan is
the sink scan, not the streaming graph — they are tagged
``plan_not_representative`` so the whitelist test doesn't over-claim.

Adaptive small-path caveat: queries built on ``ranks.global_prefix_sum``/
``global_distribution_ranks`` pick the plain-window path UNDER the size
probe bound, so at audit SF they may show a SinglePartition exchange that
the range-partitioned path replaces above the bound (A/B'd r14, SCALE.md
q251 section). Those sites are whitelisted with exactly that reason in
``tests/test_plan_audit.py`` — the audit records what the fixture plan
does, the whitelist records why it's safe at 100 TB.

Run:  python tools/plan_audit.py [qname ...]        # default: whole registry
Emits one JSON line per query and writes PLAN_AUDIT.json at the repo root
(a {query: {flag: count}} map over flagged queries only, plus run metadata).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIGNATURES = {
    "single_partition": "Exchange SinglePartition",
    "cartesian": "CartesianProduct",
    "nested_loop": "BroadcastNestedLoopJoin",
    "py_row_udf": "BatchEvalPython",
}


def plan_string(df) -> str:
    """Pre-execution physical plan (AQE initial plan) as one string."""
    return df._jdf.queryExecution().executedPlan().toString()


def audit_one(plan: str) -> dict[str, int]:
    return {flag: plan.count(sig) for flag, sig in SIGNATURES.items()
            if plan.count(sig)}


def main() -> None:
    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    from ds_ga1004_bigdata_project_spark.session import get_session

    spark = get_session(app_name="engine-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or list(REGISTRY)
    flagged: dict[str, dict[str, int]] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for name in names:
        q = REGISTRY[name]
        streaming_run = "streaming (real" in q.survey
        try:
            df = q.build(spark, sf_dir)
            flags = audit_one(plan_string(df))
        except Exception:
            errors[name] = traceback.format_exc(limit=3)
            print(json.dumps({"query": name, "error": True}), flush=True)
            continue
        row = {"query": name, **flags}
        if streaming_run:
            row["plan_not_representative"] = True
        if flags:
            flagged[name] = flags
        print(json.dumps(row), flush=True)

    out = {
        "sf_dir": sf_dir,
        "audited": len(names) - len(errors),
        "errors": sorted(errors),
        "flagged": {k: flagged[k] for k in sorted(flagged)},
        "signatures": SIGNATURES,
        "wall_s": round(time.time() - t0, 1),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLAN_AUDIT.json")
    if not sys.argv[1:]:  # full-registry runs own the committed artifact
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(f"wrote {out_path}", file=sys.stderr)
    print(json.dumps({"summary": {k: len([q for q, f in flagged.items()
                                          if k in f])
                                  for k in SIGNATURES},
                      "errors": len(errors),
                      "wall_s": out["wall_s"]}), flush=True)
    for name, tb in errors.items():
        print(f"--- {name}\n{tb}", file=sys.stderr)


if __name__ == "__main__":
    main()
