"""Scaling-efficiency crossover curve (round-4 verdict directive 6).

Runs the two-parallelism protocol (fresh processes, ray.init(num_cpus=8)
then num_cpus=32, same mult=64 input) at several per-row extraction costs
(GRAFT_HEAVY_REPS in {0, 8, 16, 64} — the model-inference stand-in layers,
~2.4 us/row/layer), REPS times each, so the >=0.8 efficiency claim rests on
a curve (where does efficiency cross 0.8 as per-row cost grows?) instead of
the single heavy_reps=64 operating point.

Usage:  python scripts/scaling_crossover.py [--reps N] [--levels 0,8,16,64]
Appends one JSON line per rep to scripts/scaling_crossover.jsonl and prints
a summary table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "scripts", "scaling_crossover.jsonl")


def run_one(heavy_reps: int) -> dict:
    env = dict(os.environ, GRAFT_HEAVY_REPS=str(heavy_reps))
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout
    rec = json.loads(out.strip().splitlines()[-1])
    rec["heavy_reps"] = heavy_reps
    rec["wall_sec"] = round(time.time() - t0, 1)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", type=str, default="0,8,16,64")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    # interleave levels across reps so host-noise drift spreads evenly
    for rep in range(args.reps):
        for lv in levels:
            rec = run_one(lv)
            rec["rep"] = rep + 1
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)

    rows = [json.loads(line) for line in open(OUT)]
    print("\n| heavy_reps | ~us/row | reps | eff (min/med/max) |")
    print("|---|---|---|---|")
    for lv in sorted({r["heavy_reps"] for r in rows}):
        effs = sorted(r["value"] for r in rows if r["heavy_reps"] == lv)
        med = effs[len(effs) // 2]
        print(f"| {lv} | ~{1 + lv * 2.4:.0f} | {len(effs)} |"
              f" {effs[0]:.3f} / {med:.3f} / {effs[-1]:.3f} |")


if __name__ == "__main__":
    main()
