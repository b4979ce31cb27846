"""Events-analytics pipeline: the third end-to-end flow next to the KG and
corpus pipelines — the raw event log in, a dashboard-ready analytics mart
out. Mirrors the reference's analyze-then-export lifecycle
(examples/main.jl: load -> aggregate -> sinks) over the events table.

Stage graph (events read ONCE, shared by every consumer):

    read_parquet(events) -> materialize
      +-> sessionize            -> mart/sessions      (resumable, by user)
      +-> user_value_anomalies  -> mart/anomalies     (resumable, by user)
      +-> user_growth           -> mart/growth        (day-bounded)
      +-> retention_cohorts     -> mart/retention
      +-> first_touch_attribution -> mart/attribution
      +-> interarrival_stats    -> mart/interarrival
      +-> power_users           -> mart/power_users
      +-> busy_minutes          -> mart/busy_minutes

The two row-scale tables (sessions, anomalies) go through the
hash-partitioned ``resumable_write`` manifest sink (a failed run skips
finished partitions on resume); the dimension-bounded summaries write as
single parquet files — their row counts are bounded by days / cohorts /
types / k, never by the event count.
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import ray
import ray.data

from tcx2graph_jl_ray.state.manifest import resumable_write


def _write_small(result, path: str) -> int:
    """Write a dimension-bounded summary (Dataset or pandas) as one parquet
    file; returns the row count."""
    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    result.to_parquet(path, index=False)
    return len(result)


def run_analytics_pipeline(
    sf_dir: str,
    out_dir: str,
    n_parts: int = 16,
    lineage: dict | None = None,
) -> dict:
    """events.parquet -> analytics mart under ``out_dir``. Returns a metrics
    summary (rows per table)."""
    from tcx2graph_jl_ray.stages.window import (
        busy_minutes,
        first_touch_attribution,
        interarrival_stats,
        power_users,
        retention_cohorts,
        sessionize,
        user_growth,
        user_value_anomalies,
    )

    lineage = dict(lineage or {})
    fp = hashlib.sha256(
        json.dumps({"lineage": lineage, "sf_dir": sf_dir},
                   sort_keys=True).encode()
    ).hexdigest()[:16]

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet").materialize()
    os.makedirs(out_dir, exist_ok=True)

    rows: dict[str, int] = {}

    # row-scale tables: manifest-gated partitioned sinks (resume skips
    # finished partitions; the fingerprint invalidates on input change)
    m_sess = resumable_write(
        sessionize(events), os.path.join(out_dir, "sessions"), "user_id",
        n_parts, fp, lineage,
    )
    rows["sessions"] = int(m_sess["total_rows"])
    m_anom = resumable_write(
        user_value_anomalies(events), os.path.join(out_dir, "anomalies"),
        "user_id", n_parts, fp, lineage,
    )
    rows["anomalies"] = int(m_anom["total_rows"])

    # dimension-bounded summaries: one file each
    rows["growth"] = _write_small(
        user_growth(events), os.path.join(out_dir, "growth.parquet")
    )
    rows["retention"] = _write_small(
        retention_cohorts(events), os.path.join(out_dir, "retention.parquet")
    )
    rows["attribution"] = _write_small(
        first_touch_attribution(events),
        os.path.join(out_dir, "attribution.parquet"),
    )
    rows["interarrival"] = _write_small(
        interarrival_stats(events),
        os.path.join(out_dir, "interarrival.parquet"),
    )
    rows["power_users"] = _write_small(
        power_users(events), os.path.join(out_dir, "power_users.parquet")
    )
    rows["busy_minutes"] = _write_small(
        busy_minutes(events), os.path.join(out_dir, "busy_minutes.parquet")
    )

    return {"fingerprint": fp, "out_dir": out_dir, "rows": rows}
