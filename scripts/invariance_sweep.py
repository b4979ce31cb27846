"""Partition-invariance sweep (round-4 verdict directive 2, family audit).

The float-summation-order parity class fails when the ENGINE's block/batch
layout changes the order of a float reduction whose rounded output sits on
a tie — and the grading driver's layout (different CPU count, different
block splits) need not match any local run's. This sweep empirically
certifies order-independence: every oracle-backed query runs in TWO fresh
Ray processes with hostile layout differences —

    A: num_cpus=8, default target block size
    B: num_cpus=3, target_max_block_size=256 KiB (so map_batches sees
       different batch boundaries and reductions sum in different orders)

— and the canonicalized outputs are hashed byte-exactly (column dtypes +
value bytes). Any query whose hash differs between layouts has an
order-dependent reduction and must move to the exact-integer discipline
(functions/exactsum.py).

Usage: python scripts/invariance_sweep.py [--sf DIR] [--names a,b,...]
Writes scripts/invariance_sweep.json and prints divergent query names.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import pickle
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import hashlib, json, pickle, sys, traceback
import numpy as np
import pandas as pd
import ray

ncpu, blocksz, sf, names_path, out_path = sys.argv[1:6]
ray.init(address="local", num_cpus=int(ncpu), include_dashboard=False,
         logging_level="ERROR")
ctx = ray.data.DataContext.get_current()
ctx.enable_progress_bars = False
if int(blocksz):
    ctx.target_max_block_size = int(blocksz)

sys.path.insert(0, %(repo)r)
import __ray_entry__ as e
from tests.parity import canonicalize, to_pandas

names = json.load(open(names_path))
qs = e.queries()
out = {}
for name in names:
    try:
        df = canonicalize(to_pandas(qs[name](sf)))
        h = hashlib.sha256()
        for c in df.columns:
            h.update(c.encode())
            s = df[c]
            h.update(str(s.dtype).encode())
            if s.dtype == object:
                h.update("\x1f".join("" if v is None else repr(v)
                                     for v in s).encode())
            else:
                h.update(np.ascontiguousarray(s.to_numpy()).tobytes())
        out[name] = h.hexdigest()
    except Exception:
        out[name] = "ERROR: " + traceback.format_exc(limit=1).strip()[-200:]
json.dump(out, open(out_path, "w"))
ray.shutdown()
"""


def run_layout(ncpu: int, blocksz: int, sf: str, names: list[str]) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(names, f)
        names_path = f.name
    out_path = names_path + ".out"
    subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO},
         str(ncpu), str(blocksz), sf, names_path, out_path],
        check=True, cwd=REPO,
    )
    return json.load(open(out_path))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--names", default="")
    ap.add_argument("--bcpus", type=int, default=3,
                    help="layout B CPU count")
    ap.add_argument("--bblock", type=int, default=262144,
                    help="layout B target_max_block_size (bytes); tiny "
                         "blocks maximize batch-boundary hostility but "
                         "cost ~wall-clock — widen for broad sweeps")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import __ray_entry__ as e

    names = (args.names.split(",") if args.names
             else sorted(e.oracle_sql()))
    a = run_layout(8, 0, args.sf, names)
    b = run_layout(args.bcpus, args.bblock, args.sf, names)
    diverged = sorted(
        n for n in names
        if a.get(n) != b.get(n)
        or str(a.get(n, "")).startswith("ERROR")
    )
    report = {
        "sf": args.sf,
        "n_queries": len(names),
        "diverged": diverged,
        "details": {n: {"A": a.get(n), "B": b.get(n)} for n in diverged},
    }
    path = os.path.join(REPO, "scripts", "invariance_sweep.json")
    json.dump(report, open(path, "w"), indent=1)
    print(json.dumps({"checked": len(names), "diverged": diverged}))


if __name__ == "__main__":
    main()
