"""Benchmark driver: headline KG pipeline + per-query timings.

Prints ONE JSON line:
  {"metric": "kg_pipeline_sec", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": <dir>, "num_cpus": N,
   "turns_per_sec": ..., "triples_per_sec": ...}

--scaling: runs the same job in two fresh processes (num_cpus=8 and 32) on the
same input and reports both throughputs plus per-CPU scaling efficiency
(BASELINE.json: efficiency >= 0.8 from N to 4N).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# input replication for the headline pipeline (scaling runs need enough work
# per CPU to amortize fixed stage costs; 1 = the raw sf input)
MULT = int(os.environ.get("GRAFT_BENCH_MULT", "1"))
# 64x input for scaling runs: the measured knee of the efficiency curve —
# below it fixed stage costs drown the signal, above it (128x = 12.8M turns)
# the single box's object store + shared disk saturate and the 32-CPU run
# stalls (see BASELINE.md scaling table); ~4 min total
SCALING_MULT = int(os.environ.get("GRAFT_SCALING_MULT", "64"))
# model-inference stand-in layers per extraction batch (0 = off): moves the
# scaling measurement into the compute-dominated regime a real model-based
# extractor runs in (~6-7 µs/row/layer; see stages/extract._InferenceStandIn)
HEAVY_REPS = int(os.environ.get("GRAFT_HEAVY_REPS", "0"))

# queries timed individually (a representative slice of SURVEY.md §2)
TIMED_QUERIES = [
    "kg_transcripts",
    "kg_edges",
    "kg_triples",
    "kg_entities",
    "kg_conv_stats",
    "kg_hot_entities",
]


def _consume(result) -> int:
    """Stream-consume a query result, returning its row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return sum(
            b.num_rows
            for b in result.iter_batches(batch_size=16384, batch_format="pyarrow")
        )
    if isinstance(result, pa.Table):
        return result.num_rows
    if isinstance(result, pd.DataFrame):
        return len(result)
    raise TypeError(type(result))


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # Finer blocks so shuffle outputs split wide enough for every CPU: the
    # default 128 MiB target left the derived table in ~10 blocks, capping
    # every downstream stage at 10-way parallelism (measured). 16 MiB gives
    # ~64+ blocks at bench scale; on a real cluster, size this so block
    # count >= 2x total cores.
    ctx.target_max_block_size = 16 * 1024 * 1024

    from tcx2graph_jl_ray.pipelines.kg import run_kg_pipeline_from_sf
    import __ray_entry__ as entry_mod

    # warm the OS page cache (untimed) so we measure compute + shuffle
    import pyarrow.parquet as pq

    for t in ["events", "nation", "region"]:
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    from tcx2graph_jl_ray.config import DEFAULT_CONFIG, PipelineConfig

    config = DEFAULT_CONFIG
    if HEAVY_REPS:
        config = PipelineConfig(extract_heavy_reps=HEAVY_REPS)

    out = tempfile.mkdtemp(prefix="kg_bench_")
    t0 = time.perf_counter()
    summary = run_kg_pipeline_from_sf(SF_DIR, out, mult=MULT, config=config)
    headline = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)

    queries = {}
    q = entry_mod.queries()
    for name in TIMED_QUERIES:
        t0 = time.perf_counter()
        _consume(q[name](SF_DIR))
        queries[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "kg_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "mult": MULT,
        "turns": summary["turns"],
        "triples": summary["triples"],
        "turns_per_sec": round(summary["turns"] / headline, 1),
        "triples_per_sec": round(summary["triples"] / headline, 1),
    }
    if HEAVY_REPS:
        result["heavy_reps"] = HEAVY_REPS
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_MULT=str(SCALING_MULT),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)  # 1.0 = linear scaling
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "throughput_8_turns_per_sec": r_lo["turns_per_sec"],
        "throughput_32_turns_per_sec": r_hi["turns_per_sec"],
        "turns": r_hi["turns"],
        "mult": SCALING_MULT,
        "sf": SF_DIR,
    }
    if HEAVY_REPS:
        out["heavy_reps"] = HEAVY_REPS
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
