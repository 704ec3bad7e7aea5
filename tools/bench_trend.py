#!/usr/bin/env python
"""Diff two bench runs and flag >1.3x per-query movers, with optional
quiet-box reconciliation (VERDICT r6 #8) — so round closes stop
re-litigating the noise floor by hand.

Usage:
    python tools/bench_trend.py                      # last two
                                                     # round_close_bench
                                                     # entries in
                                                     # PROGRESS.jsonl
    python tools/bench_trend.py OLD.json NEW.json    # explicit runs (any
                                                     # file with a
                                                     # {"queries": {...}}
                                                     # dict, e.g.
                                                     # BENCH_LOCAL.json)
    python tools/bench_trend.py --reconcile          # re-time regressed
                                                     # movers in isolation
                                                     # (bench_subset
                                                     # methodology + q06
                                                     # control) and print a
                                                     # real-vs-noise verdict

A mover is REAL if its isolated re-time stays within 30% of the new suite
number; it is SUITE-NOISE if the isolated number reconciles with the old
one (the one-JVM inflation class bench.py's chunking exists to bound).
If the q06 control itself moved >30% from its historical 1.8-2.1 s band,
the box is loaded and no verdict is printed (memory: never trust one run).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 1.3
CONTROL = "q06_join_chain_revenue"
CONTROL_BAND = (1.4, 2.8)  # historical quiet range with margin


def load_close_benches() -> list[dict]:
    out = []
    with open(os.path.join(REPO, "PROGRESS.jsonl")) as fh:
        for line in fh:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if d.get("event") == "round_close_bench" and d.get("queries"):
                out.append(d)
    return out


def load_file(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' dict")
    return d


def canonical_mode() -> None:
    """Committed-vs-disk BENCH_LOCAL.json reconciliation (VERDICT r8 #5).

    The committed file is the builder's quiet-box close; the disk file is
    whatever ran last (typically the driver's post-close overwrite). For
    every query present in both, a >THRESHOLD divergence is re-timed in
    isolation (bench_subset methodology, q06 control) and the isolated
    number picks the canonical side; agreeing queries are canonical on
    both sides by definition. One JSON line is appended to PROGRESS.jsonl
    (event=bench_reconcile) so the close records WHICH number is
    canonical for every query and why."""
    import time as _time

    path = os.path.join(REPO, "BENCH_LOCAL.json")
    proc = subprocess.run(["git", "show", "HEAD:BENCH_LOCAL.json"],
                          capture_output=True, text=True, cwd=REPO)
    if proc.returncode != 0:
        raise SystemExit("no committed BENCH_LOCAL.json at HEAD")
    committed = json.loads(proc.stdout)["queries"]
    disk = load_file(path)["queries"]
    shared = sorted(k for k in committed
                    if k in disk and committed[k] > 0 and disk[k] > 0)
    diverging = [k for k in shared
                 if disk[k] / committed[k] > THRESHOLD
                 or committed[k] / disk[k] > THRESHOLD]
    print(f"# canonical reconciliation: {len(shared)} shared queries, "
          f"{len(diverging)} diverging >{THRESHOLD}x, "
          f"{len(set(committed) ^ set(disk))} one-sided")
    table: dict[str, dict] = {}
    ctrl = None
    if diverging:
        print(f"# isolating {len(diverging)} diverging queries ...")
        sub = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_subset.py"),
             CONTROL, *diverging],
            capture_output=True, text=True, cwd=REPO)
        line = (sub.stdout.strip().splitlines() or [""])[-1]
        try:
            iso = json.loads(line)
        except json.JSONDecodeError:
            raise SystemExit(f"bench_subset failed:\n{sub.stderr[-2000:]}")
        ctrl = iso.get(CONTROL, -1)
        boxed = not (CONTROL_BAND[0] <= ctrl <= CONTROL_BAND[1])
        print(f"control {CONTROL}: {ctrl:.2f}s "
              f"({'LOADED BOX' if boxed else 'ok'})")
        for k in diverging:
            c, d, i = committed[k], disk[k], iso.get(k, -1)
            if i < 0 or boxed:
                side, why = "none", ("loaded box" if i >= 0
                                     else "isolation failed")
            elif abs(i - c) <= abs(i - d):
                side, why = "committed", "isolated re-time sides with it"
            else:
                side, why = "disk", "isolated re-time sides with it"
            table[k] = {"committed": c, "disk": d,
                        "isolated": round(i, 2), "canonical": side}
            print(f"  {k}: committed {c:.2f}s / disk {d:.2f}s / "
                  f"isolated {i:.2f}s -> canonical: {side} ({why})")
    rec = {"event": "bench_reconcile", "ts": int(_time.time()),
           "shared": len(shared), "diverging": len(diverging),
           "agreeing_canonical": "both (within noise threshold)",
           "control": ctrl, "table": table}
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print("# appended bench_reconcile record to PROGRESS.jsonl")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reconcile = "--reconcile" in sys.argv
    if "--canonical" in sys.argv:
        canonical_mode()
        return

    if len(args) == 2:
        old, new = load_file(args[0]), load_file(args[1])
        old_tag, new_tag = args[0], args[1]
    else:
        closes = load_close_benches()
        if len(closes) < 2:
            raise SystemExit("need two round_close_bench entries or two files")
        old, new = closes[-2], closes[-1]
        old_tag = f"r{old.get('round')}#{len(old['queries'])}q"
        new_tag = f"r{new.get('round')}#{len(new['queries'])}q"

    oq, nq = old["queries"], new["queries"]
    shared = sorted(k for k in oq if k in nq and oq[k] > 0 and nq[k] > 0)
    movers = [(k, oq[k], nq[k], nq[k] / oq[k]) for k in shared
              if nq[k] / oq[k] > THRESHOLD or oq[k] / nq[k] > THRESHOLD]
    movers.sort(key=lambda m: -abs(m[3] if m[3] > 1 else 1 / m[3]))

    print(f"# bench trend: {old_tag} -> {new_tag} "
          f"({len(shared)} comparable queries, threshold {THRESHOLD}x)")
    tot_o = sum(oq[k] for k in shared)
    tot_n = sum(nq[k] for k in shared)
    print(f"comparable total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)")
    if not movers:
        print("no movers above threshold")
        return
    for k, o, n, r in movers:
        print(f"  {'REGRESS' if r > 1 else 'improve'} {k}: "
              f"{o:.2f}s -> {n:.2f}s ({r:.2f}x)")

    if not reconcile:
        return
    regressed = [k for k, o, n, r in movers if r > 1]
    if not regressed:
        print("nothing to reconcile (no regressions)")
        return
    print(f"\n# reconciling {len(regressed)} regressions in isolation ...")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_subset.py"),
         CONTROL, *regressed],
        capture_output=True, text=True, cwd=REPO)
    line = (proc.stdout.strip().splitlines() or [""])[-1]
    try:
        iso = json.loads(line)
    except json.JSONDecodeError:
        raise SystemExit(f"bench_subset failed:\n{proc.stderr[-2000:]}")
    ctrl = iso.get(CONTROL, -1)
    boxed = not (CONTROL_BAND[0] <= ctrl <= CONTROL_BAND[1])
    print(f"control {CONTROL}: {ctrl:.2f}s "
          f"({'LOADED BOX — verdicts suppressed' if boxed else 'ok'})")
    for k in regressed:
        i, o, n = iso.get(k, -1), oq[k], nq[k]
        if i < 0:
            verdict = "isolation run failed"
        elif boxed:
            verdict = "no verdict (loaded box)"
        elif i <= o * THRESHOLD:
            verdict = "SUITE-NOISE (isolated reconciles with old)"
        elif i >= n / THRESHOLD:
            verdict = "REAL (isolated confirms new)"
        else:
            verdict = "ambiguous — re-run on a quiet box"
        print(f"  {k}: suite {o:.2f}->{n:.2f}s, isolated {i:.2f}s: {verdict}")


if __name__ == "__main__":
    main()
