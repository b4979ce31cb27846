"""Stream-shaped operators over the events log: sessionization and tumbling
windows.

Ray Data has no event-time windowing; the reference has none either (§2.8 —
its only windowed computation is per-file ordered pairing, e.g. the transition
builder src/DataPreprocessing.jl:330-397 with its ``max_gap_s`` filter, which
is exactly a session boundary rule). We treat the events table as an ordered,
keyed log: partition by ``user_id``, order by ``(ts, event_id)`` inside the
group, and window with vectorized pandas. Ordering assumption: complete
per-key groups (guaranteed by the groupby shuffle), ties broken by event_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def sessionize(events: ray.data.Dataset, gap_s: float = 1800.0) -> ray.data.Dataset:
    """Session summaries per user: a new session starts when the gap since the
    previous event exceeds ``gap_s``. Output: user_id, session_idx, n_events,
    first_ts, last_ts."""

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # vectorized over all users in the hash bucket: sort by (user, ts),
        # session boundary = first row of a user OR gap > threshold
        g = bucket.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        gaps = g["ts"].diff().dt.total_seconds()
        new_user = g["user_id"] != g["user_id"].shift()
        boundary = (~new_user) & (gaps > gap_s)
        session = boundary.groupby(g["user_id"], sort=False).cumsum().astype("int64")
        agg = (
            g.assign(session_idx=session)
            .groupby(["user_id", "session_idx"], sort=False)
            .agg(n_events=("event_id", "size"), first_ts=("ts", "min"),
                 last_ts=("ts", "max"))
            .reset_index()
        )
        agg["user_id"] = agg["user_id"].astype("int64")
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    return bucketed_group_apply(
        events.select_columns(["user_id", "event_id", "ts"]), ["user_id"], per_bucket
    )


SESSIONIZE_SQL_TEMPLATE = """
WITH w AS (
  SELECT user_id, event_id, ts,
    CASE WHEN date_diff('second',
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
         > {gap_s}
    THEN 1 ELSE 0 END AS boundary
  FROM events
),
s AS (
  SELECT user_id, ts,
    SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM w
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM s GROUP BY user_id, session_idx
"""


def tumbling_counts(events: ray.data.Dataset) -> ray.data.Dataset:
    """Hourly tumbling-window aggregate per event_type — combiner pattern:
    per-batch partial (type, hour) sums, then one small groupby.
    Output: event_type, window_start, n, sum_value (rounded to cents)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["ts"].dt.floor("h")
        g = pd.DataFrame(
            {"event_type": batch["event_type"], "window_start": w,
             "value": batch["value"]}
        ).groupby(["event_type", "window_start"], sort=False)
        agg = g.agg(n=("value", "size"), sum_value=("value", "sum"))
        return agg.reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "window_start": [g["window_start"].iloc[0]],
                "n": pd.array([int(g["n"].sum())], dtype="int64"),
                "sum_value": [round(float(g["sum_value"].sum()), 2)],
            }
        )

    return (
        events.select_columns(["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pandas", batch_size=16384)
        .groupby(["event_type", "window_start"])
        .map_groups(final, batch_format="pandas")
    )


TUMBLING_SQL = """
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def sliding_counts(events: ray.data.Dataset, width_hours: int = 2) -> ray.data.Dataset:
    """Sliding window aggregate: per event_type, a window starting at every
    hour covering the next ``width_hours`` hours. Composed from the tumbling
    partials (each hourly bucket feeds ``width_hours`` overlapping windows —
    a flat_map of partials, then the same bucketed merge; no event is read
    twice). Output: event_type, window_start, n, sum_value."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hour = batch["ts"].dt.floor("h")
        g = pd.DataFrame(
            {"event_type": batch["event_type"], "hour": hour, "value": batch["value"]}
        ).groupby(["event_type", "hour"], sort=False)
        agg = g.agg(n=("value", "size"), sum_value=("value", "sum")).reset_index()
        # fan each hourly partial out to every sliding window containing it
        reps = []
        for k in range(width_hours):
            r = agg.copy()
            r["window_start"] = r["hour"] - pd.to_timedelta(k, unit="h")
            reps.append(r.drop(columns=["hour"]))
        return pd.concat(reps, ignore_index=True)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["event_type", "window_start"], sort=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        g["sum_value"] = g["sum_value"].map(lambda v: round(float(v), 2))
        return g

    partials = events.select_columns(["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=16384
    )
    return bucketed_group_apply(partials, ["event_type", "window_start"], merge)


SLIDING_SQL_TEMPLATE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n, SUM(value) AS sv
  FROM events GROUP BY 1, 2
),
fanned AS (
  SELECT event_type,
         hour - INTERVAL (k) HOUR AS window_start,
         n, sv
  FROM hourly, (SELECT UNNEST(range({width_hours})) AS k)
)
SELECT event_type, window_start,
       CAST(SUM(n) AS BIGINT) AS n,
       ROUND(SUM(sv), 2) AS sum_value
FROM fanned GROUP BY event_type, window_start
"""


def top_event_per_user(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-group argmax (grouped top-1): each user's highest-value event,
    ties broken by lower event_id — the grouped top-k window pattern.
    Combiner-style: per-batch argmax partials, bucketed final argmax.
    Output: user_id, event_id, event_type, value."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["value", "event_id"], ascending=[False, True],
                           kind="mergesort")
        return d.drop_duplicates("user_id", keep="first")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return argmax(batch)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        out = argmax(bucket)
        out = out.copy()
        out["user_id"] = out["user_id"].astype("int64")
        out["event_id"] = out["event_id"].astype("int64")
        return out[["user_id", "event_id", "event_type", "value"]]

    partials = events.select_columns(
        ["user_id", "event_id", "event_type", "value"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_apply(partials, ["user_id"], merge)


TOP_EVENT_SQL = """
WITH r AS (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       event_type, value
FROM r WHERE rn = 1
"""


def flatten_props(events: ray.data.Dataset) -> ray.data.Dataset:
    """Flatten the JSON ``props`` string column into typed columns — the
    semi-structured loader (json_to_dataframe, src/DataPreprocessing.jl:28-81)
    as a vectorized map. Output: event_id, user_id, event_type, k:int32."""

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["props"].str.extract(r'"k": (\d+)', expand=False)
        # dirty-input contract: a props string without a k match must yield
        # NULL (like the oracle's TRY_CAST), not crash the int cast; keep the
        # plain int32 dtype on clean batches so the schema is unchanged there
        kk = pd.to_numeric(k, errors="coerce")
        kcol = kk.astype("Int32") if kk.isna().any() else kk.astype("int32")
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "user_id": batch["user_id"].astype("int64"),
                "event_type": batch["event_type"],
                "k": kcol,
            }
        )

    return events.select_columns(
        ["event_id", "user_id", "event_type", "props"]
    ).map_batches(parse, batch_format="pandas", batch_size=65536)


FLATTEN_PROPS_SQL = r"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       event_type,
       TRY_CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS INTEGER) AS k
FROM events
"""
