"""Per-partition checkpoint manifests for resumable Parquet output.

Generalizes the reference's only resume mechanism — the append-only
``processed_files.txt`` skip-list in its weather updater
(examples/updateWeatherNeo4j.jl:244-288) — to partitioned-sink manifests:

- output is hash-partitioned by a key column into ``part=K/`` directories
  (hive layout), never one giant file;
- after a successful write, ``_manifest.json`` records, per partition:
  files, row counts, byte sizes, plus the pipeline config fingerprint and
  input lineage;
- resume = drop rows whose partition is already manifested and clean any
  non-manifested partial directories, so a killed run redoes only the
  missing partitions and retried writes stay idempotent.

The partition hash must be stable across processes (Python's builtin ``hash``
is salted per process); we use ``pandas.util.hash_pandas_object`` with its
fixed default key.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pandas as pd
import pyarrow.parquet as pq
import ray.data

# Ray's write path lazily imports fsspec.implementations.http on every path
# resolution. In this environment that import fails (no aiohttp), Python
# evicts the half-imported module, and CONCURRENT resumable_write calls (the
# pipeline writes sinks from a thread pool) race on the retried import — a
# thread can then see a partially-initialized module and crash with a plain
# ImportError Ray doesn't expect. Pin a stub that deterministically raises
# ModuleNotFoundError (which Ray handles) without re-running the import.
try:  # pragma: no cover - import side effect only
    from fsspec.implementations.http import HTTPFileSystem as _  # noqa: F401
except ModuleNotFoundError:
    import sys as _sys
    import types as _types

    _stub = _types.ModuleType("fsspec.implementations.http")

    def _raise(name):  # PEP 562 module __getattr__
        raise ModuleNotFoundError("No module named 'aiohttp'")

    _stub.__getattr__ = _raise
    _sys.modules.setdefault("fsspec.implementations.http", _stub)
except ImportError:
    pass

MANIFEST_NAME = "_manifest.json"


def partition_of(keys: pd.Series, n_parts: int) -> pd.Series:
    """Stable hash partition id for a key column (vectorized, process-stable)."""
    return (
        pd.util.hash_pandas_object(keys.astype(str), index=False) % n_parts
    ).astype("int64")


def load_manifest(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _scan_partitions(out_dir: str) -> dict[str, dict]:
    """Read parquet footers of every part=K dir -> {part: {files, rows, bytes}}."""
    parts: dict[str, dict] = {}
    for name in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, name)
        if not (name.startswith("part=") and os.path.isdir(full)):
            continue
        files, rows, nbytes = [], 0, 0
        for fn in sorted(os.listdir(full)):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(full, fn)
            rows += pq.ParquetFile(fp).metadata.num_rows
            nbytes += os.path.getsize(fp)
            files.append(fn)
        parts[name.split("=", 1)[1]] = {"files": files, "rows": rows, "bytes": nbytes}
    return parts


def resumable_write(
    ds: ray.data.Dataset,
    out_dir: str,
    key_col: str,
    n_parts: int = 32,
    fingerprint: str = "",
    lineage: dict | None = None,
    max_rows_per_file: int = 1_000_000,
) -> dict:
    """Write ``ds`` hash-partitioned by ``key_col``; skip manifested partitions.

    Returns the manifest. A changed ``fingerprint`` (config/input identity)
    invalidates prior output entirely — a resumed run must be able to prove it
    skips only identical work.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir)
    done: set[str] = set()
    if manifest is not None:
        # resume only when BOTH the config/input fingerprint and the
        # partitioning layout match — a different n_parts re-bins keys, so
        # skipping old partitions would duplicate rows across layouts
        if (
            manifest.get("fingerprint") == fingerprint
            and manifest.get("n_parts") == n_parts
        ):
            done = set(manifest["partitions"])
        else:
            for name in os.listdir(out_dir):  # stale config: rewrite everything
                if name.startswith("part="):
                    shutil.rmtree(os.path.join(out_dir, name))
            manifest = None

    # clean partial (non-manifested) partition dirs from a crashed run
    for name in os.listdir(out_dir):
        if name.startswith("part=") and name.split("=", 1)[1] not in done:
            shutil.rmtree(os.path.join(out_dir, name))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["part"] = partition_of(batch[key_col], n_parts)
        return batch

    todo = ds.map_batches(add_part, batch_format="pandas", batch_size=16384)
    if done:
        done_ids = {int(p) for p in done}

        def drop_done(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[~batch["part"].isin(done_ids)]

        todo = todo.map_batches(drop_done, batch_format="pandas")

    # write_parquet with hive partition_cols: one directory per partition —
    # the resumable unit (and the multi-file layout a 256-node run needs).
    # max_rows_per_file bounds file size even when a hot key concentrates a
    # partition (never one giant file).
    todo.write_parquet(
        out_dir, partition_cols=["part"], max_rows_per_file=max_rows_per_file
    )

    parts = _scan_partitions(out_dir)
    manifest = {
        "fingerprint": fingerprint,
        "key_col": key_col,
        "n_parts": n_parts,
        "lineage": lineage or {},
        "written_at": time.time(),
        "partitions": parts,
        "total_rows": int(sum(p["rows"] for p in parts.values())),
    }
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))  # atomic commit
    return manifest


def write_inspection_summary(out_dir: str, sample_rows: int = 5) -> dict:
    """Inspection sink replacing the reference's viz outputs (S7/S8,
    src/Visualizer.jl): a small JSON summary of every manifested table under
    ``out_dir`` — row counts, partitions, schema, and a few sample rows —
    cheap enough to open by hand. Returns the summary dict."""
    summary: dict = {}
    for name in sorted(os.listdir(out_dir)):
        sub = os.path.join(out_dir, name)
        m = load_manifest(sub) if os.path.isdir(sub) else None
        if m is None:
            continue
        if not m["partitions"]:  # an empty (but manifested) sink
            summary[name] = {
                "total_rows": 0, "n_partitions": 0,
                "fingerprint": m["fingerprint"], "schema": {}, "sample": [],
            }
            continue
        first_part = sorted(m["partitions"])[0]
        first_file = os.path.join(
            sub, f"part={first_part}", m["partitions"][first_part]["files"][0]
        )
        head = pq.read_table(first_file).slice(0, sample_rows)
        summary[name] = {
            "total_rows": m["total_rows"],
            "n_partitions": len(m["partitions"]),
            "fingerprint": m["fingerprint"],
            "schema": {f.name: str(f.type) for f in head.schema},
            "sample": head.to_pylist(),
        }
    path = os.path.join(out_dir, "_inspection.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True, default=str)
    return summary


def write_debug_csv(
    ds: ray.data.Dataset, out_dir: str, single_file: bool = False
) -> str:
    """CSV/debug sink (S6) — the reference dumps inspection CSVs beside its
    main outputs (examples/main.jl:189,227,252). Default layout is a
    directory of part CSVs (the distributed shape); ``single_file`` merges
    them into one ``data.csv`` for hand inspection — only sensible for small
    debug extracts, so it streams block-by-block, never collecting the
    dataset. Returns the path written."""
    if not single_file:
        ds.write_csv(out_dir)
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "data.csv")
    with open(path, "w") as f:
        first = True
        for batch in ds.iter_batches(batch_size=16384, batch_format="pandas"):
            batch.to_csv(f, index=False, header=first)
            first = False
    return path


def read_partitioned(out_dir: str) -> ray.data.Dataset:
    """Read back a resumable_write output (drops the synthetic part column)."""
    ds = ray.data.read_parquet(out_dir)
    return ds.drop_columns(["part"]) if "part" in ds.schema().names else ds
