"""Reproduce the reference's learning-curve figure at fixture scale
(VERDICT r7 #6 — the protocol's other published artifact, after the sweep).

The reference chose its 50% training-user downsample from an RMSE-vs-fraction
curve (report p.1 §2.2, Fig. 1; ``ALS_model/learning_curve.py:46``): a FIXED
val split, train downsampled over the user-fraction ladder
0.05–0.75 (non-eval users only; eval users' partial histories always kept so
the model has factors for them), RMSE at each point, elbow = the smallest
fraction whose RMSE is within 5% of the full-ladder endpoint. This script
runs the same protocol — same ladder, same split discipline, seeded — on the
fixtures' interactions table via
:func:`ds_ga1004_bigdata_project_spark.ml.protocol.learning_curve_holdout`
and writes ``examples/artifacts/als_learning_curve_<sf>.json``.

Absolute RMSE values are NOT comparable to the reference's (different
corpus: TPC-H-derived implicit feedback vs MSD taste counts); what is
comparable — and what the committed artifact records — is the curve SHAPE
(RMSE non-increasing-to-flat in training fraction) and the elbow-selection
rule applied to it.

Run:  python tools/learning_curve_artifact.py [--sf-dir /root/testdata/sf0.1]
      [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The reference's fraction ladder (learning_curve.py:46).
LADDER = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.75)

#: "Within 5% of the endpoint" — the reference's elbow rule (BASELINE.md:
#: "RMSE within 5% of full set").
ELBOW_TOL = 0.05


def pick_elbow(points: list[tuple[float, dict]]) -> float:
    """Smallest fraction whose RMSE is within ELBOW_TOL of the largest
    fraction's RMSE (the reference's 50%-selection rule)."""
    end_rmse = points[-1][1]["rmse"]
    for frac, m in points:
        if m["rmse"] <= end_rmse * (1 + ELBOW_TOL):
            return frac
    return points[-1][0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--quick", action="store_true",
                    help="two-point ladder smoke run (no artifact overwrite)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.ml import als as A
    from ds_ga1004_bigdata_project_spark.ml import protocol as P
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session()
    cat = Catalog(spark, args.sf_dir)
    inter = A.interactions_from_orders(cat.lineitem, cat.orders)

    ladder = list(LADDER[:2] if args.quick else LADDER)
    # ALS defaults + maxIter=1, the reference's curve configuration
    # (BASELINE.md "ALS defaults, maxIter=1").
    cfg = A.ALSConfig(rank=10, max_iter=1)
    t0 = time.time()
    points = P.learning_curve_holdout(inter, ladder, cfg, k=100, seed=42)
    secs = round(time.time() - t0, 1)
    for frac, m in points:
        print(f"  frac={frac:4.2f} rmse={m['rmse']:.5f} "
              f"MAP={m['map']:.5f} n={m['n']}")

    rmses = [m["rmse"] for _, m in points]
    monotone_to_flat = all(b <= a * (1 + ELBOW_TOL)
                           for a, b in zip(rmses, rmses[1:]))
    elbow = pick_elbow(points)
    artifact = {
        "sf_dir": args.sf_dir, "seed": 42, "als_seed": 123,
        "config": {"rank": cfg.rank, "max_iter": cfg.max_iter,
                   "reg_param": cfg.reg_param, "alpha": cfg.alpha},
        "fraction_ladder": ladder,
        "points": [{"fraction": f, **{k: m[k] for k in
                    ("rmse", "n", "map", "precision_at_k", "ndcg_at_k",
                     "n_users")}} for f, m in points],
        "elbow_rule": f"smallest fraction with RMSE within {ELBOW_TOL:.0%} "
                      "of the 0.75-fraction endpoint (report p.1 §2.2)",
        "elbow_fraction": elbow,
        "rmse_monotone_to_flat": monotone_to_flat,
        "interpretation": (
            "RMSE decreases toward a plateau as training users are added — "
            "the report Fig. 1 shape; the elbow rule reproduces the "
            "reference's downsample selection"
            if monotone_to_flat else
            "RMSE is non-monotone on the synthetic corpus — TPC-H-derived "
            "implicit feedback has far fewer interactions per user than MSD "
            "taste profiles, so small-fraction fits are noise-dominated; "
            "the PROTOCOL (fixed eval split, user-fraction ladder, elbow "
            "rule, seeds) is the reproduced object, not the corpus-"
            "dependent curve"),
        "reference_fig1": {"elbow": 0.5,
                           "note": "MSD corpus — shape comparable, values "
                                   "not"},
        "curve_secs": secs,
    }
    out = args.out
    if out is None and not args.quick:
        sf = os.path.basename(args.sf_dir.rstrip("/"))
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "examples", "artifacts",
            f"als_learning_curve_{sf}.json")
    if out:
        with open(out, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
