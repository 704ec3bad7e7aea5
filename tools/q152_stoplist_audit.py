#!/usr/bin/env python
"""Measure q152's `max_doc_freq` stop-list leverage (VERDICT r9 #5).

The §100× dossier names the stop-list passthrough as q152's first
cluster knob but until round 10 it had no measured row. This tool runs
`dedup.leakage_safe_split` over the sf0.1 corpus and the real-shaped 10×
corpus (tools/stress.py's --corpus salted token-bijection construction — constant
dup density, no cross-replica collisions) twice each: cap disengaged
(None) and engaged (--cap, default 12 — sized from the measured shingle
df distribution: every true >=0.6 pair at sf0.1 meets on a shingle with
df <= 10, so cap=12 is provably lossless here), attributing wall time
and Spark stage shuffle-write/input bytes per run via the monitoring
REST API (tools/shuffle_audit.py's stage-id attribution).

It also CERTIFIES the knob, not just times it: for each corpus the
(doc_id, cluster_id, split) relation under the cap is compared
set-equal to the uncapped relation. With the round-10 exact-verify fix
(candidates from pruned postings, intersection over full shingle
arrays) equality holds whenever every true pair shares at least one
sub-cap shingle; any severed pair is printed.

Run:  python tools/q152_stoplist_audit.py [--cap 12] [--sf-dir ...]
Emits one JSON line per (corpus, cap) run plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cap", type=int, default=12)
    ap.add_argument("--boiler", action="store_true",
                    help="prepend a shared 12-token license header to every "
                         "document — the df≈corpus-size regime the stop-list "
                         "exists for (uncapped, every boiler shingle "
                         "contributes n²/2 candidate pairs)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        leakage_safe_split)
    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session(app_name="q152-stoplist-audit",
                              extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    docs = Catalog(spark, args.sf_dir).documents
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    boiler = " ".join(f"lic{i}" for i in range(12)) + " " \
        if args.boiler else ""

    def salted(i: int):
        tag = F.lit(f"r{i}·")
        return docs.select(
            (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"),
            "source",
            F.concat(F.lit(boiler),
                     F.array_join(F.transform(F.split(F.col("text"), r"\s+"),
                                              lambda t: F.concat(tag, t)),
                                  " "))
             .alias("text"))

    tmp = tempfile.mkdtemp(prefix="q152_stoplist_")
    p1, p10 = os.path.join(tmp, "docs1"), os.path.join(tmp, "docs10")
    salted(0).write.mode("overwrite").parquet(p1)
    corpora = [("1x", p1)]
    if not args.boiler:
        # Boiler mode stays 1×: uncapped at 10× would be ~15G candidate
        # rows (12 shingles × 50k²/2) — the blow-up is the point, not a
        # useful measurement.
        big = salted(0)
        for i in range(1, 10):
            big = big.unionByName(salted(i))
        big.write.mode("overwrite").parquet(p10)
        corpora.append(("10x", p10))

    # Warm the JVM off the books (bench methodology).
    spark.read.parquet(p1).count()

    results: dict[tuple[str, str], set] = {}
    for label, path in corpora:
        d = spark.read.parquet(path)
        for cap in (None, args.cap):
            before = set(_stages(ui)) if ui else set()
            caches: list = []
            t0 = time.perf_counter()
            rows = leakage_safe_split(d, max_doc_freq=cap,
                                      caches=caches).collect()
            wall = time.perf_counter() - t0
            for c in caches:
                c.unpersist()
            shuffle = inp = 0
            if ui:
                for sid, st in _stages(ui).items():
                    if sid not in before:
                        shuffle += st.get("shuffleWriteBytes", 0)
                        inp += st.get("inputBytes", 0)
            results[(label, str(cap))] = {
                (r.doc_id, r.cluster_id, r.split) for r in rows}
            print(json.dumps({
                "corpus": label, "cap": cap, "wall_sec": round(wall, 2),
                "shuffle_write_bytes": shuffle, "input_bytes": inp,
                "n_docs": len(rows)}))

    ok = True
    for label, _ in corpora:
        full, capped = results[(label, "None")], results[(label, str(args.cap))]
        severed = sorted(full ^ capped)[:10]
        same = full == capped
        ok &= same
        print(json.dumps({"corpus": label, "cap": args.cap,
                          "split_assignments_identical": same,
                          "diff_sample": [list(map(str, s))
                                          for s in severed]}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
