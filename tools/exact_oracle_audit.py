#!/usr/bin/env python
"""EXACT-value oracle audit under a VANILLA session — the driver's gate,
not the tolerant local ones (round 10).

The driver hashes canonicalized values EXACTLY; the repo's local gates
tolerate float noise (test_oracle_parity: 10 significant digits;
driver_replica: rtol 1e-9). That gap is exactly wide enough to hide a
1-ulp transcendental divergence between Spark and DuckDB (Math.log2 vs
libm log2) — which is a guaranteed driver hash mismatch. This tool
runs EVERY oracle-backed registry query under a vanilla SparkSession
(the driver builds its own, none of the engine's confs) and
string-compares the full sorted result sets bit-for-bit against DuckDB.

A MISMATCH here on a never-certified query is a future driver failure;
fix the query's float discipline (round every transcendental once at
creation — the q146 rule; see q196's round-10 fix). A mismatch on an
already-certified query needs triage (representation vs value).

Run:  python tools/exact_oracle_audit.py [--sf 0.01] [qname ...]
Exit 0 iff every audited query matches exactly.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = args.names or sorted(osql)
    bad = []
    for name in names:
        if name not in osql:
            print(f"skip {name} (rows-only)")
            continue
        try:
            s = sorted(tuple(map(str, r))
                       for r in qs[name](spark, sf_dir).collect())
            d = sorted(tuple(map(str, r))
                       for r in con.execute(osql[name]).fetchall())
        except Exception as exc:
            print(f"ERROR {name}: {str(exc)[:200]}")
            bad.append(name)
            continue
        if s == d:
            print(f"ok   {name} ({len(s)} rows)")
        else:
            bad.append(name)
            so = [x for x in s if x not in d][:2]
            do = [x for x in d if x not in s][:2]
            print(f"MISMATCH {name}\n  S: {so}\n  D: {do}")
    print(f"=== {len(names) - len(bad)} exact / {len(bad)} mismatch ===")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
