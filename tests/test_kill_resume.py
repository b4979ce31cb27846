"""Kill/restart resumability (BASELINE.md criterion): a pipeline process
killed mid-write must, on rerun, skip manifested partitions and produce
output identical to an uninterrupted run."""

import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.parquet as pq

_SCRIPT = """
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
ray.data.DataContext.get_current().enable_progress_bars = False
from tcx2graph_jl_ray.pipelines.kg import run_kg_pipeline_from_sf
summary = run_kg_pipeline_from_sf("/root/testdata/sf0.001", {out!r})
print("DONE", summary["triples"])
ray.shutdown()
"""


def _read_triples(out):
    return (
        pq.read_table(os.path.join(out, "triples"))
        .to_pandas()
        .drop(columns=["part"], errors="ignore")
        .sort_values(["conv_id", "turn_idx", "pred", "obj"])
        .reset_index(drop=True)
    )


def test_kill_mid_run_then_resume(tmp_path):
    out_killed = str(tmp_path / "killed")
    out_clean = str(tmp_path / "clean")

    # run 1: kill the process partway through (after staging has had time to
    # start, before the sinks finish)
    p = subprocess.Popen(
        [sys.executable, "-c", _SCRIPT.format(out=out_killed)],
        cwd="/root/repo",
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    time.sleep(12)  # sf0.001 full run ~20s incl. ray startup; this lands mid-flight
    p.send_signal(signal.SIGKILL)
    p.wait()

    # run 2: same out dir — must complete, skipping whatever was manifested
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(out=out_killed)],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "DONE" in r.stdout, r.stdout + r.stderr

    # control: uninterrupted run into a fresh dir
    r2 = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(out=out_clean)],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "DONE" in r2.stdout

    resumed = _read_triples(out_killed)
    control = _read_triples(out_clean)
    pd.testing.assert_frame_equal(resumed, control)
