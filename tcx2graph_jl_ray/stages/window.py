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
    Value sums run in exact integer cents (events.value is 2-dp —
    ``functions/money.py`` discipline), so summation order can't move a
    cent. A hot window (one (type, hour) with most of the traffic) is
    whale-split by the salted two-level reduce.
    Output: event_type, window_start, n, sum_value (exact cents)."""
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["ts"].dt.floor("h")
        g = pd.DataFrame(
            {"event_type": batch["event_type"], "window_start": w,
             "value_c": cents_i64(batch["value"])}
        ).groupby(["event_type", "window_start"], sort=False)
        agg = g.agg(n=("value_c", "size"), value_c=("value_c", "sum"))
        return agg.reset_index()

    def re_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["event_type", "window_start"], sort=False).agg(
            n=("n", "sum"), value_c=("value_c", "sum")
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = re_sum(bucket)
        g["sum_value"] = g["value_c"].to_numpy(dtype="int64") / 100.0
        return g.drop(columns=["value_c"])

    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    # (type, hour) cardinality grows with the corpus timespan — bucketed
    # merge, not one Ray group per window; salted so a single hot window
    # never lands whole in one task
    return salted_group_apply(
        events.select_columns(["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pandas", batch_size=16384
        ),
        ["event_type", "window_start"],
        partial_fn=re_sum,
        merge_fn=merge,
    )


TUMBLING_SQL = """
SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def sliding_counts(events: ray.data.Dataset, width_hours: int = 2) -> ray.data.Dataset:
    """Sliding window aggregate: per event_type, a window starting at every
    hour covering the next ``width_hours`` hours. Composed from the tumbling
    partials (each hourly bucket feeds ``width_hours`` overlapping windows —
    a flat_map of partials, then the same salted merge; no event is read
    twice). Value sums in exact integer cents (``functions/money.py``).
    Output: event_type, window_start, n, sum_value."""
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hour = batch["ts"].dt.floor("h")
        g = pd.DataFrame(
            {"event_type": batch["event_type"], "hour": hour,
             "value_c": cents_i64(batch["value"])}
        ).groupby(["event_type", "hour"], sort=False)
        agg = g.agg(n=("value_c", "size"), value_c=("value_c", "sum")).reset_index()
        # fan each hourly partial out to every sliding window containing it
        reps = []
        for k in range(width_hours):
            r = agg.copy()
            # stay in [us]: a raw ns Timedelta would promote the column to
            # datetime64[ns], an encoding mismatch vs the oracle's
            # fetchdf [us] output (driver-hash hazard class)
            r["window_start"] = (
                r["hour"] - pd.to_timedelta(k, unit="h")
            ).astype("datetime64[us]")
            reps.append(r.drop(columns=["hour"]))
        return pd.concat(reps, ignore_index=True)

    def re_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["event_type", "window_start"], sort=False).agg(
            n=("n", "sum"), value_c=("value_c", "sum")
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = re_sum(bucket)
        g["sum_value"] = g["value_c"].to_numpy(dtype="int64") / 100.0
        return g.drop(columns=["value_c"])

    partials = events.select_columns(["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=16384
    )
    return salted_group_apply(
        partials, ["event_type", "window_start"],
        partial_fn=re_sum, merge_fn=merge,
    )


SLIDING_SQL_TEMPLATE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sv_c
  FROM events GROUP BY 1, 2
),
fanned AS (
  SELECT event_type,
         hour - INTERVAL (k) HOUR AS window_start,
         n, sv_c
  FROM hourly, (SELECT UNNEST(range({width_hours})) AS k)
)
SELECT event_type, window_start,
       CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(sv_c) AS DOUBLE) / 100.0 AS sum_value
FROM fanned GROUP BY event_type, window_start
"""


def top_event_per_user(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-group argmax (grouped top-1): each user's highest-value event,
    ties broken by lower event_id — the grouped top-k window pattern.
    Combiner-style: per-batch argmax partials, salted two-level final argmax
    (argmax is associative with the total (value desc, event_id) order, so a
    whale user's partial rows split safely across salt tasks).
    Output: user_id, event_id, event_type, value."""
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

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
    return salted_group_apply(
        partials, ["user_id"], partial_fn=argmax, merge_fn=merge
    )


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


# --- as-of join ---------------------------------------------------------------

def asof_join_events(
    events: ray.data.Dataset,
    left_type: str = "purchase",
    right_type: str = "click",
    whale_budget: int | None = 5_000_000,
    slice_days: int = 30,
) -> ray.data.Dataset:
    """Per-user as-of join — an operator Ray Data lacks natively (the
    reference's nearest-predecessor lookup shape: each point takes the
    closest preceding observation, src/TCXParser.jl:236-262): each
    ``left_type`` event is matched to the most recent ``right_type`` event of
    the SAME user at-or-before its timestamp (ties on ts -> highest
    event_id). One keyed shuffle on user_id; inside each bucket a single
    ``pandas.merge_asof`` (by=user_id) covers every user vectorized.

    WHALE SWITCH: a user whose history exceeds a worker can't land in one
    bucket, so when the max per-user row count (one cheap combiner-style
    counting pass) exceeds ``whale_budget``, the job reroutes to the
    time-sliced boundary-carry variant (``_asof_join_sliced`` — the
    chunked-prefix-sum pattern of stages/graph.py::cumulative_tokens_chunked
    applied to an order-dependent join): rows shuffle by (user, time-slice)
    and each slice additionally receives ONE carried right-row — the best
    (ts, event_id) right event from all earlier slices — making every
    per-task group bounded by the user's densest slice + 1 while producing
    byte-identical output. ``whale_budget=None`` skips the counting pass.
    Output: event_id, ts, user_id, matched_event_id (nullable float64),
    matched_ts (nullable)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    src = events.select_columns(["event_id", "ts", "user_id", "event_type"])

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["event_type"].isin([left_type, right_type])]

    if whale_budget is not None:
        if _max_user_rows(src.map_batches(
            keep, batch_format="pandas", batch_size=16384
        )) > whale_budget:
            return _asof_join_sliced(
                src.map_batches(keep, batch_format="pandas",
                                batch_size=16384),
                left_type, right_type, slice_days,
            )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        left = bucket[bucket["event_type"] == left_type].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        right = bucket[bucket["event_type"] == right_type].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        if not len(left):
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "ts": pd.Series([], dtype="datetime64[us]"),
                 "user_id": pd.Series([], dtype="int64"),
                 "matched_event_id": pd.Series([], dtype="float64"),
                 "matched_ts": pd.Series([], dtype="datetime64[us]")}
            )
        m = pd.merge_asof(
            left[["ts", "event_id", "user_id"]],
            right[["ts", "event_id", "user_id"]].rename(
                columns={"event_id": "matched_event_id", "ts": "matched_ts"}
            ),
            left_on="ts",
            right_on="matched_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "ts": m["ts"],
                "user_id": m["user_id"].astype("int64"),
                # float64+NaN, NOT pandas nullable Int64: the DuckDB oracle's
                # fetchdf() encodes a nullable BIGINT as float64+NaN, and the
                # driver's value hash canonicalizes the two null encodings
                # differently even when values are equal (r4's only red row).
                "matched_event_id": m["matched_event_id"].astype("float64"),
                "matched_ts": m["matched_ts"],
            }
        )

    return bucketed_group_apply(
        src.map_batches(keep, batch_format="pandas", batch_size=16384),
        ["user_id"],
        per_bucket,
    )


def _max_user_rows(kept: ray.data.Dataset) -> int:
    """Max per-user row count — the whale detector. Combiner-shaped: one
    count row per (user, batch) shuffles, never event rows."""
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("user_id", sort=False).size()
        return pd.DataFrame({"user_id": s.index, "c": s.to_numpy("int64")})

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("user_id", sort=False)["c"].sum()
        return pd.DataFrame({"user_id": s.index, "c": s.to_numpy("int64")})

    counts = salted_group_apply(
        kept.select_columns(["user_id"]), ["user_id"],
        partial_fn=partial, merge_fn=merge,
    )
    mx = counts.max("c")
    return int(mx) if mx is not None else 0


_US_PER_DAY = 86_400_000_000


def _asof_join_sliced(
    kept: ray.data.Dataset,
    left_type: str,
    right_type: str,
    slice_days: int,
) -> ray.data.Dataset:
    """Time-sliced boundary-carry as-of join (the whale path).

    (1) Per (user, slice): reduce the slice's right rows to their best
        (ts, event_id) — combiner-shaped, one row per (user, slice, batch);
        slices with only left rows still emit a presence row so the carry
        covers them.
    (2) Per user over SLICE-level rows (bounded by time-range/slice_days,
        not by event count): a running prefix-best gives each slice the
        latest right event strictly BEFORE its start — the boundary carry.
    (3) Raw rows shuffle by (user, slice); each group appends its carried
        right-row (it is a real right event, so ``merge_asof`` needs no
        special casing: its ts precedes every in-slice ts) and runs the
        same vectorized per-bucket join as the direct path.

    Per-task rows are bounded by the user's densest single slice + 1
    (pick ``slice_days`` below the whale's density), and the output is
    byte-identical to the direct path (planted-whale tested)."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply, salted_group_apply,
    )

    def tag_slice(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["slice"] = (
            batch["ts"].astype("datetime64[us]").astype("int64")
            // (slice_days * _US_PER_DAY)
        ).astype("int64")
        return batch

    sliced = kept.map_batches(tag_slice, batch_format="pandas",
                              batch_size=16384)

    # (1) per-(user, slice) best right row + presence
    def best_partial(batch: pd.DataFrame) -> pd.DataFrame:
        r = batch[batch["event_type"] == right_type]
        best = (
            r.sort_values(["ts", "event_id"], kind="mergesort")
            .groupby(["user_id", "slice"], sort=False)
            .tail(1)[["user_id", "slice", "ts", "event_id"]]
            .rename(columns={"ts": "r_ts", "event_id": "r_eid"})
        )
        # presence rows for slices having ONLY left rows (carry must cover
        # them); r_eid=-1 marks "no right event in this slice"
        pres = batch[["user_id", "slice"]].drop_duplicates()
        pres = pres.merge(best[["user_id", "slice"]], how="left",
                          indicator=True, on=["user_id", "slice"])
        pres = pres[pres["_merge"] == "left_only"][["user_id", "slice"]]
        pres["r_ts"] = pd.Series(pd.NaT, index=pres.index,
                                 dtype="datetime64[us]")
        pres["r_eid"] = np.int64(-1)
        out = pd.concat([best, pres], ignore_index=True)
        out["r_eid"] = out["r_eid"].astype("int64")
        return out

    def best_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.sort_values(["r_ts", "r_eid"], kind="mergesort",
                               na_position="first")
            .groupby(["user_id", "slice"], sort=False)
            .tail(1)
        )
        return out[["user_id", "slice", "r_ts", "r_eid"]]

    slice_best = salted_group_apply(
        sliced.select_columns(["user_id", "slice", "ts", "event_id",
                               "event_type"]),
        ["user_id", "slice"],
        partial_fn=best_partial, merge_fn=best_merge,
    )

    # (2) per-user prefix-best -> boundary row per slice (slice-level rows)
    def carry(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in bucket.groupby("user_id", sort=False):
            g = g.sort_values("slice", kind="mergesort")
            b_ts, b_eid = pd.NaT, -1
            for r in g.itertuples(index=False):
                if b_eid >= 0:
                    rows.append((uid, r.slice, b_ts, b_eid))
                if r.r_eid >= 0 and (
                    b_eid < 0 or (r.r_ts, r.r_eid) > (b_ts, b_eid)
                ):
                    b_ts, b_eid = r.r_ts, r.r_eid
        return pd.DataFrame(
            rows, columns=["user_id", "slice", "ts", "event_id"]
        ).astype({"user_id": "int64", "slice": "int64",
                  "event_id": "int64"})

    boundaries = bucketed_group_apply(slice_best, ["user_id"], carry)

    def as_right(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["ts"] = batch["ts"].astype("datetime64[us]")
        batch["event_type"] = right_type
        return batch[["event_id", "ts", "user_id", "event_type", "slice"]]

    carried = boundaries.map_batches(as_right, batch_format="pandas")

    # (3) per-(user, slice) vectorized asof join, boundary row included
    def per_group(bucket: pd.DataFrame) -> pd.DataFrame:
        left = bucket[bucket["event_type"] == left_type].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        right = bucket[bucket["event_type"] == right_type].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        if not len(left):
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "ts": pd.Series([], dtype="datetime64[us]"),
                 "user_id": pd.Series([], dtype="int64"),
                 "matched_event_id": pd.Series([], dtype="float64"),
                 "matched_ts": pd.Series([], dtype="datetime64[us]")}
            )
        m = pd.merge_asof(
            left[["ts", "event_id", "user_id"]],
            right[["ts", "event_id", "user_id"]].rename(
                columns={"event_id": "matched_event_id", "ts": "matched_ts"}
            ),
            left_on="ts", right_on="matched_ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "ts": m["ts"],
            "user_id": m["user_id"].astype("int64"),
            "matched_event_id": m["matched_event_id"].astype("float64"),
            "matched_ts": m["matched_ts"],
        })

    return bucketed_group_apply(
        sliced.union(carried), ["user_id", "slice"], per_group,
    )


ASOF_JOIN_SQL_TEMPLATE = """
SELECT p.event_id AS event_id, p.ts AS ts,
       CAST(p.user_id AS BIGINT) AS user_id,
       c.event_id AS matched_event_id, c.ts AS matched_ts
FROM (SELECT * FROM events WHERE event_type = '{left_type}') p
LEFT JOIN LATERAL (
  SELECT e.event_id, e.ts
  FROM events e
  WHERE e.event_type = '{right_type}'
    AND e.user_id = p.user_id AND e.ts <= p.ts
  ORDER BY e.ts DESC, e.event_id DESC
  LIMIT 1
) c ON TRUE
"""


# --- range (interval) join ----------------------------------------------------

def range_join_counts(
    events: ray.data.Dataset,
    left_type: str = "signup",
    right_type: str = "error",
    window_s: int = 600,
) -> ray.data.Dataset:
    """Cross-user interval join — for each ``left_type`` event, the count of
    ``right_type`` events (any user) with ts in [left.ts, left.ts +
    window_s). Blocking: time is cut into buckets of exactly ``window_s``
    seconds — the quantized-key blocking of the reference's weather-grid
    equi-join (0.25-degree/hour cells, src/TCXParser.jl:272-279) applied to
    an interval predicate — so a right event's matches come only from its
    own or the previous bucket; each left event is REPLICATED to the (<=2) buckets its
    window overlaps, and each (left, right) pair is counted exactly once —
    in the RIGHT event's bucket. In-bucket counting is one
    ``np.searchsorted`` per side. Partial counts (including zeros, so
    match-less lefts survive) then sum per left event.
    Output: event_id, n_matches."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    w_us = np.int64(window_s) * 1_000_000

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["event_type"].isin([left_type, right_type])]
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64")
        is_left = (batch["event_type"] == left_type).to_numpy()
        base = pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "ts_us": ts_us,
                "bucket_id": ts_us // w_us,
                "side": np.where(is_left, "L", "R"),
            }
        )
        # replicate each left event into the next bucket too (its window may
        # cross one boundary: window width == bucket width)
        rep = base[is_left].copy()
        rep["bucket_id"] = rep["bucket_id"] + 1
        return pd.concat([base, rep], ignore_index=True)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in bucket.groupby("bucket_id", sort=False):
            left = g[g["side"] == "L"]
            if not len(left):
                continue
            right_ts = np.sort(
                g.loc[g["side"] == "R", "ts_us"].to_numpy(dtype="int64")
            )
            lo = np.searchsorted(right_ts, left["ts_us"].to_numpy(), "left")
            hi = np.searchsorted(
                right_ts, left["ts_us"].to_numpy() + w_us, "left"
            )
            out.append(
                pd.DataFrame(
                    {
                        "event_id": left["event_id"].astype("int64"),
                        "n": (hi - lo).astype("int64"),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        return pd.concat(out, ignore_index=True)

    def sum_per_left(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("event_id", sort=False)["n"].sum()
        return pd.DataFrame(
            {
                "event_id": s.index.astype("int64"),
                "n_matches": s.astype("int64").to_numpy(),
            }
        )

    partials = bucketed_group_apply(
        events.select_columns(["event_id", "ts", "event_type"]).map_batches(
            tag, batch_format="pandas", batch_size=16384
        ),
        ["bucket_id"],
        per_bucket,
    )
    return bucketed_group_apply(partials, ["event_id"], sum_per_left)


RANGE_JOIN_SQL_TEMPLATE = """
SELECT s.event_id AS event_id,
       CAST(COUNT(e.event_id) AS BIGINT) AS n_matches
FROM (SELECT * FROM events WHERE event_type = '{left_type}') s
LEFT JOIN (SELECT * FROM events WHERE event_type = '{right_type}') e
  ON e.ts >= s.ts AND e.ts < s.ts + INTERVAL {window_s} SECOND
GROUP BY s.event_id
"""


def retention_cohorts(events: ray.data.Dataset, n_buckets: int = 64) -> ray.data.Dataset:
    """Cohort retention matrix: users are cohorted by their FIRST active day;
    each (cohort_day, day_offset) cell counts how many of that cohort were
    active again ``day_offset`` days later — the product-analytics rollup a
    training-data pipeline runs over interaction logs.

    Shape: per-user first day = per-batch partial MIN + bucketed reduce on
    user_id (combiner — no global sort); distinct (user, day) activity the
    same way; the cohort day rejoins activity through the co-partitioned
    ``hash_join`` on user_id; the final cell count is a partial-count
    combiner over (cohort_day, day_offset). Four keyed exchanges total,
    nothing driver-side.

    Output: cohort_day ('YYYY-MM-DD'), day_offset:int64, n_users:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def partial_days(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "day": pd.to_datetime(batch["ts"]).dt.normalize(),
            }
        ).drop_duplicates()

    def dedup_days(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(["user_id", "day"])

    activity = bucketed_group_apply(
        events.select_columns(["user_id", "ts"]).map_batches(
            partial_days, batch_format="pandas", batch_size=65536
        ),
        ["user_id"],
        dedup_days,
        n_buckets=n_buckets,
    )

    def first_day(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("user_id", sort=False)["day"].min()
        return pd.DataFrame({"user_id": g.index, "cohort_day": g.to_numpy()})

    cohorts = bucketed_group_apply(
        activity, ["user_id"], first_day, n_buckets=n_buckets
    )

    joined = hash_join(activity, cohorts, on="user_id", n_buckets=n_buckets)

    def partial_cells(batch: pd.DataFrame) -> pd.DataFrame:
        off = (
            (batch["day"] - batch["cohort_day"]).dt.days.astype("int64")
        )
        g = (
            pd.DataFrame(
                {
                    "cohort_day": batch["cohort_day"].dt.strftime("%Y-%m-%d"),
                    "day_offset": off,
                }
            )
            .groupby(["cohort_day", "day_offset"], sort=False)
            .size()
            .reset_index(name="n_part")
        )
        return g

    def sum_cells(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["cohort_day", "day_offset"], sort=False)["n_part"]
            .sum()
            .reset_index(name="n_users")
        )
        g["n_users"] = g["n_users"].astype("int64")
        return g

    return bucketed_group_apply(
        joined.map_batches(partial_cells, batch_format="pandas"),
        ["cohort_day", "day_offset"],
        sum_cells,
        n_buckets=n_buckets,
    )


RETENTION_SQL = """
WITH a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
c AS (
  SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN c ON c.user_id = a.user_id
GROUP BY c.cohort_day, a.day - c.cohort_day
"""


def event_type_trend(events: ray.data.Dataset, n_buckets: int = 16) -> ray.data.Dataset:
    """Per-event-type activity trend: least-squares slope/intercept of the
    DAILY EVENT COUNT against the day offset since 2024-01-01 — grouped
    regression as a distributed sufficient-statistics reduce (n, Σx, Σy,
    Σxy, Σx² per group are exact BIGINT sums, so the combiner is
    order-insensitive and the final float formula is bit-deterministic,
    unlike summing raw doubles).

    Types observed on a single day have an undefined slope and are
    excluded on both engine and oracle sides.

    Output: event_type, n_days:int64, slope:float64, intercept:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    epoch = pd.Timestamp("2024-01-01")

    def partial_daily(batch: pd.DataFrame) -> pd.DataFrame:
        x = (pd.to_datetime(batch["ts"]).dt.normalize() - epoch).dt.days
        g = (
            pd.DataFrame({"event_type": batch["event_type"], "x": x})
            .groupby(["event_type", "x"], sort=False)
            .size()
            .reset_index(name="y_part")
        )
        return g

    def sum_daily(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["event_type", "x"], sort=False)["y_part"]
            .sum()
            .reset_index(name="y")
        )
        return g

    daily = bucketed_group_apply(
        events.select_columns(["event_type", "ts"]).map_batches(
            partial_daily, batch_format="pandas", batch_size=65536
        ),
        ["event_type", "x"],
        sum_daily,
        n_buckets=n_buckets,
    )

    def fit(bucket: pd.DataFrame) -> pd.DataFrame:
        x = bucket["x"].astype("int64")
        y = bucket["y"].astype("int64")
        g = bucket.assign(
            n=1, sx=x, sy=y, sxy=x * y, sxx=x * x
        ).groupby("event_type", sort=False)[["n", "sx", "sy", "sxy", "sxx"]].sum()
        g = g[g["n"] >= 2]
        n = g["n"].astype("float64")
        det = n * g["sxx"] - g["sx"] * g["sx"]
        slope = (n * g["sxy"] - g["sx"] * g["sy"]) / det
        intercept = (g["sy"] - slope * g["sx"]) / n
        return pd.DataFrame(
            {
                "event_type": g.index,
                "n_days": g["n"].astype("int64").to_numpy(),
                "slope": slope.to_numpy(),
                "intercept": intercept.to_numpy(),
            }
        )

    return bucketed_group_apply(daily, ["event_type"], fit, n_buckets=n_buckets)


TYPE_TREND_SQL = """
WITH d AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM d GROUP BY event_type
)
SELECT event_type, n AS n_days,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope,
       (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM s WHERE n >= 2
"""


def sliding_distinct_users(
    events: ray.data.Dataset, width_hours: int = 2, n_buckets: int = 64
) -> ray.data.Dataset:
    """Sliding-window COUNT DISTINCT users — the aggregate that canNOT be
    composed from per-window partial counts (distinct doesn't sum), so the
    distributed shape is: per-batch distinct (user, hour) -> bucketed
    (user, hour) dedup -> fan each row to the ``width_hours`` windows
    containing it -> bucketed (window, user) dedup emitting per-bucket
    partial counts -> tiny final sum per window. Every stage is keyed on
    (window, user), so one window's user set never sits in a single task.

    Output: window_start, n_users:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial_uh(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype("int64"),
                "hour": batch["ts"].dt.floor("h"),
            }
        ).drop_duplicates()

    def dedup_uh(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(["user_id", "hour"])

    uh = bucketed_group_apply(
        events.select_columns(["user_id", "ts"]).map_batches(
            partial_uh, batch_format="pandas", batch_size=65536
        ),
        ["user_id", "hour"],
        dedup_uh,
        n_buckets=n_buckets,
    )

    def fan(batch: pd.DataFrame) -> pd.DataFrame:
        reps = []
        for k in range(width_hours):
            r = batch[["user_id"]].copy()
            # [us], matching the oracle's fetchdf encoding (see sliding)
            r["window_start"] = (
                batch["hour"] - pd.to_timedelta(k, unit="h")
            ).astype("datetime64[us]")
            reps.append(r)
        return pd.concat(reps, ignore_index=True)

    def count_part(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates(["window_start", "user_id"])
        g = d.groupby("window_start", sort=False).size().reset_index(name="n_part")
        return g

    parts = bucketed_group_apply(
        uh.map_batches(fan, batch_format="pandas"),
        ["window_start", "user_id"],
        count_part,
        n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("window_start", sort=False)["n_part"].sum()
        return pd.DataFrame(
            {"window_start": g.index, "n_users": g.astype("int64").to_numpy()}
        )

    return bucketed_group_apply(parts, ["window_start"], final, n_buckets=n_buckets)


SLIDING_USERS_SQL_TEMPLATE = """
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour FROM events
),
w AS (
  SELECT DISTINCT user_id, hour - k.k * INTERVAL 1 HOUR AS window_start
  FROM uh CROSS JOIN (SELECT unnest(generate_series(0, {width_hours} - 1)) AS k) k
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_users
FROM w GROUP BY window_start
"""


def conversion_funnel(
    events: ray.data.Dataset,
    first_type: str = "signup",
    then_type: str = "purchase",
    within_hours: int = 24,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Two-step funnel: of the users whose event stream contains
    ``first_type``, how many performed ``then_type`` within
    ``within_hours`` of their FIRST ``first_type``. The per-user decision
    runs vectorized inside user buckets (one keyed exchange); only the
    3-integer partial survives to the driver-side total.

    Output: one row — n_first, n_converted (int64), conversion_rate
    (float64, exact ratio of the two exact counts).
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        f = bucket[bucket["event_type"] == first_type]
        first = f.groupby("user_id", sort=False)["ts"].min()
        if not len(first):
            return pd.DataFrame(
                {
                    "n_first_part": pd.array([], dtype="int64"),
                    "n_conv_part": pd.array([], dtype="int64"),
                }
            )
        t = bucket[bucket["event_type"] == then_type].merge(
            first.rename("t0"), left_on="user_id", right_index=True
        )
        dt = t["ts"] - t["t0"]
        ok = t.loc[
            (dt > pd.Timedelta(0))
            & (dt <= pd.Timedelta(hours=within_hours)),
            "user_id",
        ].nunique()
        return pd.DataFrame(
            {
                "n_first_part": pd.array([len(first)], dtype="int64"),
                "n_conv_part": pd.array([int(ok)], dtype="int64"),
            }
        )

    parts = bucketed_group_apply(
        events.select_columns(["user_id", "event_type", "ts"]),
        ["user_id"],
        per_user,
        n_buckets=n_buckets,
    )

    def total(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_first_part": pd.array(
                    [int(batch["n_first_part"].sum())], dtype="int64"
                ),
                "n_conv_part": pd.array(
                    [int(batch["n_conv_part"].sum())], dtype="int64"
                ),
            }
        )

    agg = parts.map_batches(total, batch_format="pandas").to_pandas()
    n_first = int(agg["n_first_part"].sum())
    n_conv = int(agg["n_conv_part"].sum())
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "n_first": pd.array([n_first], dtype="int64"),
                "n_converted": pd.array([n_conv], dtype="int64"),
                "conversion_rate": [n_conv / n_first if n_first else 0.0],
            }
        )
    )


FUNNEL_SQL_TEMPLATE = """
WITH f AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = '{first_type}' GROUP BY user_id
),
c AS (
  SELECT DISTINCT f.user_id
  FROM f JOIN events e ON e.user_id = f.user_id
  WHERE e.event_type = '{then_type}'
    AND e.ts > f.t0 AND e.ts <= f.t0 + {within_hours} * INTERVAL 1 HOUR
)
SELECT CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS n_first,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_converted,
       CASE WHEN (SELECT COUNT(*) FROM f) = 0 THEN 0.0
            ELSE CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / (SELECT COUNT(*) FROM f) END AS conversion_rate
"""


def rank_topk_per_user(events: ray.data.Dataset, k: int = 3) -> ray.data.Dataset:
    """Grouped top-k with rank and gap-to-previous — the full window-function
    trio (ROW_NUMBER + LAG) over per-user value order, generalizing
    ``top_event_per_user`` from top-1 to ranked top-k. Order: value DESC,
    event_id ASC (unique tiebreak). ``gap`` = previous rank's value − this
    value (NULL at rank 1), computed from raw values so it is float-exact.

    Combiner shape: each batch keeps at most k rows per user (a user's
    global top-k is a subset of the union of its per-batch top-k), the
    bucketed final re-ranks inside one vectorized pandas groupby — the
    shuffle moves ≤ k rows per user, never the event stream.

    Output: user_id, rank:int64, event_id, event_type, value, gap.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["value", "event_id"], ascending=[False, True],
                           kind="mergesort")
        return d.groupby("user_id", sort=False).head(k)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        d = topk(bucket).copy()
        g = d.groupby("user_id", sort=False)
        d["rank"] = g.cumcount().to_numpy() + 1
        d["gap"] = g["value"].shift(1) - d["value"]
        d["user_id"] = d["user_id"].astype("int64")
        d["event_id"] = d["event_id"].astype("int64")
        d["rank"] = d["rank"].astype("int64")
        return d[["user_id", "rank", "event_id", "event_type", "value", "gap"]]

    partials = events.select_columns(
        ["user_id", "event_id", "event_type", "value"]
    ).map_batches(topk, batch_format="pandas", batch_size=65536)
    return bucketed_group_apply(partials, ["user_id"], final)


RANK_TOPK_SQL_TEMPLATE = """
WITH r AS (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn,
         LAG(value) OVER (PARTITION BY user_id
                          ORDER BY value DESC, event_id) - value AS gap
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(rn AS BIGINT) AS rank,
       CAST(event_id AS BIGINT) AS event_id,
       event_type, value, gap
FROM r WHERE rn <= {k}
"""


def value_histogram(
    events: ray.data.Dataset, bin_width: float = 25.0
) -> ray.data.Dataset:
    """Fixed-width histogram of event values per type — the quantized-cell
    counting of the reference's coverage grid (src/GraphUtils.jl:18-103:
    quantize to a cell, count distinct/total per cell) on the value axis.
    Bin = floor(value/width); both sides compute the same IEEE double
    division so the edge assignment is bit-identical. NULL values drop.

    Combiner shape: per-batch (type, bin) partial counts, bucketed final
    sum — the shuffle moves one row per non-empty bin per batch.

    Output: event_type, bin:int64, n:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["value"].notna()]
        bins = np.floor(
            b["value"].to_numpy(dtype="float64") / bin_width
        ).astype("int64")
        s = (
            pd.DataFrame({"event_type": b["event_type"], "bin": bins})
            .groupby(["event_type", "bin"], sort=False)
            .size()
        )
        out = s.reset_index()
        out.columns = ["event_type", "bin", "n_part"]
        return out

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby(["event_type", "bin"], sort=False)["n_part"].sum()
        out = s.reset_index()
        out.columns = ["event_type", "bin", "n"]
        out["bin"] = out["bin"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    partials = events.select_columns(["event_type", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    return bucketed_group_apply(partials, ["event_type", "bin"], final, n_buckets=16)


VALUE_HISTOGRAM_SQL_TEMPLATE = """
SELECT event_type,
       CAST(FLOOR(value / {bin_width}) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL
GROUP BY event_type, FLOOR(value / {bin_width})
"""


def top_type_per_user(events: ray.data.Dataset) -> ray.data.Dataset:
    """Grouped MODE: each user's most frequent event type (ties to the
    lexicographically smaller type) — the categorical impute statistic of
    the reference's cleaning pass (mode per file, src/DataPreprocessing.jl:
    116-135) as a first-class distributed operator. Fully decomposable:
    per-batch (user, type) partial counts combine in user buckets, then a
    vectorized in-bucket argmax — the shuffle moves one row per (user, type)
    per batch, never events.

    Output: user_id, top_type, n:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby(["user_id", "event_type"], sort=False).size()
        out = s.reset_index()
        out.columns = ["user_id", "event_type", "n_part"]
        return out

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        c = (
            bucket.groupby(["user_id", "event_type"], sort=False)["n_part"]
            .sum()
            .reset_index(name="n")
        )
        c = c.sort_values(
            ["n", "event_type"], ascending=[False, True], kind="mergesort"
        )
        best = c.drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": best["user_id"].astype("int64"),
                "top_type": best["event_type"],
                "n": best["n"].astype("int64"),
            }
        )

    partials = events.select_columns(["user_id", "event_type"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    return bucketed_group_apply(partials, ["user_id"], final)


TOP_TYPE_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       event_type AS top_type,
       CAST(n AS BIGINT) AS n
FROM r WHERE rn = 1
"""


def event_markov(events: ray.data.Dataset, n_buckets: int = 64) -> ray.data.Dataset:
    """First-order Markov transition table over per-user event streams:
    counts and probabilities of event_type -> next event_type — the event-
    stream analogue of the KG's entity-transition builder (A12,
    src/DataPreprocessing.jl:330-397: per-ride sort by start_time, pair
    consecutive runs), aggregated to the type×type behavior matrix used for
    next-action modeling. Consecutive = next event of the SAME user by
    (ts, event_id) order.

    Shape: user streams co-locate whole in user buckets (one keyed shuffle),
    pairs form by vectorized in-group shift; per-batch (from, to) partial
    counts reduce in a tiny second shuffle; probabilities divide by
    hash-joined per-from marginals — the PMI-edge pattern, no marginal
    broadcast. p rounds to 6 decimals (single division of exact integers;
    rounding only normalizes the float print path).

    Output: from_type, to_type, n:int64, p:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def pairs_per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = d.groupby("user_id", sort=False)["event_type"].shift(-1)
        keep = nxt.notna()
        p = pd.DataFrame(
            {"from_type": d["event_type"][keep], "to_type": nxt[keep]}
        )
        s = p.groupby(["from_type", "to_type"], sort=False).size()
        out = s.reset_index()
        out.columns = ["from_type", "to_type", "n_part"]
        return out

    pairs = bucketed_group_apply(
        events.select_columns(["user_id", "event_type", "ts", "event_id"]),
        ["user_id"],
        pairs_per_user,
        n_buckets=n_buckets,
    )

    def sum_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby(["from_type", "to_type"], sort=False)["n_part"].sum()
        out = s.reset_index()
        out.columns = ["from_type", "to_type", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    counts = bucketed_group_apply(
        pairs, ["from_type", "to_type"], sum_pairs, n_buckets=16
    )

    def partial_marg(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("from_type", sort=False)["n"].sum()
        return pd.DataFrame({"from_type": s.index, "m_part": s.to_numpy()})

    def sum_marg(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("from_type", sort=False)["m_part"].sum()
        return pd.DataFrame(
            {"from_type": s.index, "m": s.astype("int64").to_numpy()}
        )

    marg = bucketed_group_apply(
        counts.map_batches(partial_marg, batch_format="pandas"),
        ["from_type"],
        sum_marg,
        n_buckets=8,
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["from_type", "to_type", "n"]].copy()
        out["n"] = out["n"].astype("int64")
        out["p"] = (
            batch["n"].to_numpy(dtype="float64")
            / batch["m"].to_numpy(dtype="float64")
        ).round(6)
        return out

    return hash_join(counts, marg, on="from_type", n_buckets=8).map_batches(
        score, batch_format="pandas"
    )


EVENT_MARKOV_SQL = """
WITH s AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM c
"""


def never_converted(
    events: ray.data.Dataset,
    first_type: str = "signup",
    then_type: str = "purchase",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """ANTI join at (user, day) grain: days on which a user had ≥1
    ``first_type`` event but ZERO same-day ``then_type`` events — the
    NOT-EXISTS complement of ``conversion_funnel`` (J6's anti-check shape,
    src/OverlappingSegmentsUtils.jl:229-240: accept a candidate only if
    nothing on the other side matches), materialized row-level.

    Shape: each side reduces to distinct (user, day) rows + counts per
    batch (combiner), then the co-partitioned ``hash_join`` LEFT-joins the
    ``then`` side on; survivors are the null-side rows. Neither side
    broadcasts; the shuffle moves one row per (user, day, batch).

    Output: user_id, day ('YYYY-MM-DD'), n_first:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def partial(kind: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.loc[batch["event_type"] == kind]
            day = pd.to_datetime(b["ts"]).dt.strftime("%Y-%m-%d")
            s = (
                pd.DataFrame({"user_id": b["user_id"], "day": day})
                .groupby(["user_id", "day"], sort=False)
                .size()
            )
            out = s.reset_index()
            out.columns = ["user_id", "day", "n_part"]
            return out

        return fn

    def reduce_counts(out_col: str):
        def fn(bucket: pd.DataFrame) -> pd.DataFrame:
            s = bucket.groupby(["user_id", "day"], sort=False)["n_part"].sum()
            out = s.reset_index()
            out.columns = ["user_id", "day", out_col]
            out[out_col] = out[out_col].astype("int64")
            return out

        return fn

    src = events.select_columns(["user_id", "event_type", "ts"])
    firsts = bucketed_group_apply(
        src.map_batches(partial(first_type), batch_format="pandas"),
        ["user_id", "day"],
        reduce_counts("n_first"),
        n_buckets=n_buckets,
    )
    thens = bucketed_group_apply(
        src.map_batches(partial(then_type), batch_format="pandas"),
        ["user_id", "day"],
        reduce_counts("n_then"),
        n_buckets=n_buckets,
    )
    joined = hash_join(
        firsts, thens, on=["user_id", "day"], how="left", n_buckets=n_buckets
    )

    def anti(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["n_then"].isna()]
        return pd.DataFrame(
            {
                "user_id": keep["user_id"].astype("int64"),
                "day": keep["day"],
                "n_first": keep["n_first"].astype("int64"),
            }
        )

    return joined.map_batches(anti, batch_format="pandas")


NEVER_CONVERTED_SQL_TEMPLATE = """
SELECT CAST(e.user_id AS BIGINT) AS user_id,
       strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_first
FROM events e
WHERE e.event_type = '{first_type}'
  AND NOT EXISTS (SELECT 1 FROM events p
                  WHERE p.user_id = e.user_id
                    AND CAST(p.ts AS DATE) = CAST(e.ts AS DATE)
                    AND p.event_type = '{then_type}')
GROUP BY e.user_id, CAST(e.ts AS DATE)
"""


def activity_islands(events: ray.data.Dataset, n_buckets: int = 64) -> ray.data.Dataset:
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE active days
    — the classic streak/retention primitive (and the canonical SQL
    island pattern: day − ROW_NUMBER() as the run key). Temporal cousin of
    the reference's run-range materialization (contiguous index ranges per
    ride, src/SegmentRuns.jl:21-38).

    Shape: per-batch distinct (user, day) rows (combiner — the shuffle
    moves active days, not events); islands form inside user buckets with a
    vectorized day-diff/cumsum per user — no per-row Python, no window
    shuffle.

    Output: user_id, start_day, end_day ('YYYY-MM-DD'), n_days:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def distinct_days(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "day": pd.to_datetime(batch["ts"]).dt.normalize(),
            }
        ).drop_duplicates()
        return d

    def islands(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        same_user = d["user_id"].eq(d["user_id"].shift())
        gap = d["day"].diff().dt.days.ne(1)
        new_island = (~same_user) | gap
        d = d.assign(island=new_island.cumsum())
        g = d.groupby(["user_id", "island"], sort=False)["day"].agg(
            ["min", "max", "size"]
        )
        out = g.reset_index()
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "start_day": out["min"].dt.strftime("%Y-%m-%d"),
                "end_day": out["max"].dt.strftime("%Y-%m-%d"),
                "n_days": out["size"].astype("int64"),
            }
        )

    rows = events.select_columns(["user_id", "ts"]).map_batches(
        distinct_days, batch_format="pandas", batch_size=65536
    )
    return bucketed_group_apply(rows, ["user_id"], islands, n_buckets=n_buckets)


ACTIVITY_ISLANDS_SQL = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
r AS (
  SELECT user_id, day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d
),
g AS (SELECT user_id, day, day - CAST(rn AS INTEGER) AS grp FROM r)
SELECT CAST(user_id AS BIGINT) AS user_id,
       strftime(MIN(day), '%Y-%m-%d') AS start_day,
       strftime(MAX(day), '%Y-%m-%d') AS end_day,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM g GROUP BY user_id, grp
"""


def daily_type_pivot(events: ray.data.Dataset, n_buckets: int = 16) -> ray.data.Dataset:
    """PIVOT to wide form: one row per day, one int64 column per event type
    (click/error/purchase/signup/view — the fixed event vocabulary), the
    report/feature-matrix layout downstream ML consumes. Conditional
    aggregation, not a reshape shuffle: per-batch (day, type) partial counts
    reduce in day buckets, then the tiny per-day frame pivots vectorized.

    Output: day ('YYYY-MM-DD'), click, error, purchase, signup, view (int64).
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    types = ["click", "error", "purchase", "signup", "view"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m-%d")
        s = (
            pd.DataFrame({"day": day, "event_type": batch["event_type"]})
            .groupby(["day", "event_type"], sort=False)
            .size()
        )
        out = s.reset_index()
        out.columns = ["day", "event_type", "n_part"]
        return out

    def pivot(bucket: pd.DataFrame) -> pd.DataFrame:
        c = (
            bucket.groupby(["day", "event_type"], sort=False)["n_part"]
            .sum()
            .unstack(fill_value=0)
        )
        c = c.reindex(columns=types, fill_value=0).reset_index()
        c.columns.name = None  # unstack leaves the axis named 'event_type'
        for t in types:
            c[t] = c[t].astype("int64")
        return c[["day"] + types]

    partials = events.select_columns(["event_type", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    return bucketed_group_apply(partials, ["day"], pivot, n_buckets=n_buckets)


DAILY_PIVOT_SQL = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
FROM events
GROUP BY CAST(ts AS DATE)
"""


def rolling_daily_avg(
    events: ray.data.Dataset, window_days: int = 3, n_buckets: int = 8
) -> ray.data.Dataset:
    """Rolling window FRAME: per event type, the ``window_days``-day moving
    average of daily counts (frame = this day and the window−1 PRECEDING
    CALENDAR days — absent days count 0, the time-series convention, not
    the row-frame one). Daily counts are tiny after the combiner (days ×
    types); the rolling pass is a vectorized in-bucket scan per type.
    avg = integer window sum / window_days in both engines — one exact
    division, no rounding needed.

    Output: event_type, day ('YYYY-MM-DD'), n:int64, avg_n:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(batch["ts"]).dt.normalize()
        s = (
            pd.DataFrame({"event_type": batch["event_type"], "day": day})
            .groupby(["event_type", "day"], sort=False)
            .size()
        )
        out = s.reset_index()
        out.columns = ["event_type", "day", "n_part"]
        return out

    def roll(bucket: pd.DataFrame) -> pd.DataFrame:
        c = (
            bucket.groupby(["event_type", "day"], sort=False)["n_part"]
            .sum()
            .reset_index(name="n")
        )
        outs = []
        for etype, g in c.groupby("event_type", sort=False):
            g = g.sort_values("day", kind="mergesort").set_index("day")
            # calendar-frame sum: reindex to the full day range, roll, then
            # keep only observed days (absent days contribute 0 but emit no row)
            full = g["n"].reindex(
                pd.date_range(g.index.min(), g.index.max(), freq="D"),
                fill_value=0,
            )
            win = full.rolling(window=window_days, min_periods=1).sum()
            keep = win.loc[g.index]
            outs.append(
                pd.DataFrame(
                    {
                        "event_type": etype,
                        "day": g.index.strftime("%Y-%m-%d"),
                        "n": g["n"].astype("int64").to_numpy(),
                        "avg_n": keep.to_numpy(dtype="float64") / window_days,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    partials = events.select_columns(["event_type", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    return bucketed_group_apply(partials, ["event_type"], roll, n_buckets=n_buckets)


ROLLING_AVG_SQL_TEMPLATE = """
WITH c AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT a.event_type,
       strftime(a.day, '%Y-%m-%d') AS day,
       CAST(a.n AS BIGINT) AS n,
       CAST((SELECT COALESCE(SUM(b.n), 0) FROM c b
             WHERE b.event_type = a.event_type
               AND b.day BETWEEN a.day - {span} AND a.day) AS DOUBLE)
         / {window_days} AS avg_n
FROM c a
"""


def session_stats(
    events: ray.data.Dataset,
    gap_s: float = 1800.0,
    collect_budget: int = 65536,
) -> ray.data.Dataset:
    """Corpus-level session DISTRIBUTION: total sessions/events and exact
    median + p95 session duration — the composed second level over
    ``sessionize`` (two stacked windows: gap boundaries, then distribution
    over the session table).

    The session table is one row per session — which is NOT bounded (it
    scales with users × time), so the quantiles never collect it: they run
    through ``exact_global_quantiles`` (histogram-refinement rank selection,
    functions/quantile.py), whose driver footprint is capped at
    ``collect_budget`` + bin counts regardless of session count, and whose
    result is the exact linearly-interpolated order statistic (identical to
    DuckDB QUANTILE_CONT). n_sessions / n_events come from the same
    streaming aggregate pass.

    Output: n_sessions:int64, n_events:int64, median_duration_s:float64,
    p95_duration_s:float64 (linear interpolation, rounded to 6).
    """
    from ray.data.aggregate import Sum

    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    sess = sessionize(events, gap_s).materialize()

    def to_dur(df: pd.DataFrame) -> pd.DataFrame:
        dur = (
            pd.to_datetime(df["last_ts"]) - pd.to_datetime(df["first_ts"])
        ).dt.total_seconds()
        return pd.DataFrame(
            {"dur_s": dur.to_numpy(dtype="float64"),
             "n_events": df["n_events"].to_numpy()}
        )

    dur_ds = sess.map_batches(to_dur, batch_format="pandas").materialize()
    n_events = int(dur_ds.aggregate(Sum("n_events"))["sum(n_events)"])
    n_sessions, quants = exact_global_quantiles(
        dur_ds, "dur_s", [0.5, 0.95], collect_budget=collect_budget
    )
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "n_sessions": pd.array([n_sessions], dtype="int64"),
                "n_events": pd.array([n_events], dtype="int64"),
                "median_duration_s": [float(np.round(quants[0.5], 6))],
                "p95_duration_s": [float(np.round(quants[0.95], 6))],
            }
        )
    )


SESSION_STATS_SQL_TEMPLATE = """
WITH sess AS ({sessionize}),
d AS (
  SELECT n_events,
         CAST(date_diff('microsecond', first_ts, last_ts) AS DOUBLE)
           / 1000000 AS dur_s
  FROM sess
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       ROUND(MEDIAN(dur_s), 6) AS median_duration_s,
       ROUND(QUANTILE_CONT(dur_s, 0.95), 6) AS p95_duration_s
FROM d
"""


def hourly_profile(events: ray.data.Dataset, n_buckets: int = 8) -> ray.data.Dataset:
    """Seasonality profile: average events per hour-of-day per type — total
    count in that clock hour divided by the number of distinct DAYS the
    corpus spans (one integer division; the denominator is a corpus-level
    scalar, so the profile is comparable across hours). The clock-folding
    aggregate behind load forecasting.

    Output: event_type, hour:int64 (0-23), n:int64, per_day:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(batch["ts"])
        d = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "hour": ts.dt.hour.astype("int64"),
                "day": ts.dt.strftime("%Y-%m-%d"),
            }
        )
        s = d.groupby(["event_type", "hour"], sort=False).size()
        out = s.reset_index()
        out.columns = ["event_type", "hour", "n_part"]
        days = pd.DataFrame({"event_type": "\x00days", "hour": -1,
                             "n_part": 0, "day": d["day"].unique()})
        return pd.concat(
            [out.assign(day=""), days], ignore_index=True
        )

    parts = events.select_columns(["event_type", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    ).materialize()  # two consumers: the day count and the hour counts

    # corpus-distinct days: a tiny bounded aggregate (calendar-bounded);
    # vectorized batch filter, not a per-row predicate
    days_rows = parts.map_batches(
        lambda b: b.loc[b["hour"] == -1, ["day"]], batch_format="pandas"
    )
    n_days = len(set(days_rows.to_pandas()["day"]))

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket[bucket["hour"] >= 0]
        s = b.groupby(["event_type", "hour"], sort=False)["n_part"].sum()
        out = s.reset_index()
        out.columns = ["event_type", "hour", "n"]
        out["hour"] = out["hour"].astype("int64")
        out["n"] = out["n"].astype("int64")
        out["per_day"] = (out["n"] / n_days).round(6)
        return out

    return bucketed_group_apply(
        parts, ["event_type", "hour"], final, n_buckets=n_buckets
    )


HOURLY_PROFILE_SQL = """
WITH nd AS (SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days FROM events)
SELECT event_type,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(nd.n_days), 6) AS per_day
FROM events, nd
GROUP BY event_type, EXTRACT(hour FROM ts)
"""


def value_quantiles(
    events: ray.data.Dataset,
    qs: tuple = (0.5, 0.9, 0.99),
    collect_budget: int = 65536,
) -> ray.data.Dataset:
    """Exact global quantiles of the event value column — the direct query
    surface of ``exact_global_quantiles`` (functions/quantile.py): the value
    stream scales with the corpus, the driver footprint does not
    (histogram-refinement rank selection under ``collect_budget``). Linear
    interpolation, identical to DuckDB QUANTILE_CONT, rounded to 6.

    Output: one row — p50, p90, p99 (float64).
    """
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    vals = events.select_columns(["value"]).map_batches(
        lambda b: pd.DataFrame(
            {"value": b["value"].dropna().to_numpy(dtype="float64")}
        ),
        batch_format="pandas",
    ).materialize()
    _, got = exact_global_quantiles(
        vals, "value", list(qs), collect_budget=collect_budget
    )
    return ray.data.from_pandas(
        pd.DataFrame(
            {f"p{int(q * 100)}": [float(np.round(got[q], 6))] for q in qs}
        )
    )


VALUE_QUANTILES_SQL = """
SELECT ROUND(QUANTILE_CONT(value, 0.5), 6) AS p50,
       ROUND(QUANTILE_CONT(value, 0.9), 6) AS p90,
       ROUND(QUANTILE_CONT(value, 0.99), 6) AS p99
FROM events WHERE value IS NOT NULL
"""


def corr_value_hour(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Per-type Pearson correlation between event value and hour-of-day —
    the grouped bivariate statistic (does this event type's value follow a
    daily cycle?), computed the `events_type_trend` way: EXACT integer
    sufficient statistics, one double expression at the very end.

    Determinism discipline: value is 2-dp exact so x = cents(value) is
    int64; y = hour is int64; each batch folds to per-type partial sums of
    (n, Σx, Σy, Σxy, Σx², Σy²) — int64-safe per batch — and the final
    merge sums them as PYTHON ints (arbitrary precision; the oracle's
    SUM(BIGINT) is HUGEINT for the same reason), so the six totals are
    bit-identical to the oracle under any batch layout. The correlation is
    then ONE shared double expression (cast, multiply, sqrt, divide,
    round 6) on both sides. Zero-variance groups drop (the oracle's
    WHERE den > 0).

    Output: event_type, n:int64, corr_value_hour:float64.
    """
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"].notna() & b["ts"].notna()]
        if not len(b):
            return pd.DataFrame(
                {
                    "event_type": pd.array([], dtype="string"),
                    **{
                        c: pd.array([], dtype="int64")
                        for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")
                    },
                }
            )
        x = cents_i64(b["value"])
        y = b["ts"].dt.hour.to_numpy(dtype="int64")
        d = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(),
                "n": np.ones(len(b), dtype="int64"),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sx2": x * x,
                "sy2": y * y,
            }
        )
        return d.groupby("event_type", sort=False).sum().reset_index()

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in bucket.groupby("event_type", sort=False):
            # Python ints: exact at any scale (oracle side is HUGEINT)
            n = sum(int(v) for v in g["n"])
            sx = sum(int(v) for v in g["sx"])
            sy = sum(int(v) for v in g["sy"])
            sxy = sum(int(v) for v in g["sxy"])
            sx2 = sum(int(v) for v in g["sx2"])
            sy2 = sum(int(v) for v in g["sy2"])
            dx = n * sx2 - sx * sx
            dy = n * sy2 - sy * sy
            if dx <= 0 or dy <= 0:
                continue
            corr = float(n * sxy - sx * sy) / math.sqrt(float(dx) * float(dy))
            rows.append((et, n, float(np.round(corr, 6))))
        return pd.DataFrame(
            rows, columns=["event_type", "n", "corr_value_hour"]
        ).astype({"n": "int64", "corr_value_hour": "float64"})

    return bucketed_group_apply(
        events.select_columns(["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["event_type"],
        final,
        n_buckets=n_buckets,
    )


CORR_VALUE_HOUR_SQL = """
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sx,
         SUM(CAST(date_part('hour', ts) AS BIGINT)) AS sy,
         SUM(CAST(ROUND(value * 100) AS BIGINT)
             * CAST(date_part('hour', ts) AS BIGINT)) AS sxy,
         SUM(CAST(ROUND(value * 100) AS BIGINT)
             * CAST(ROUND(value * 100) AS BIGINT)) AS sx2,
         SUM(CAST(date_part('hour', ts) AS BIGINT)
             * CAST(date_part('hour', ts) AS BIGINT)) AS sy2
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY event_type
)
SELECT event_type,
       n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6)
         AS corr_value_hour
FROM s
WHERE (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
"""


def user_value_trend(
    events: ray.data.Dataset, min_n: int = 2, n_buckets: int = 16
) -> ray.data.Dataset:
    """Per-user OLS trend of event value over time (is this user's spend
    rising or falling?) — grouped least-squares as EXACT integer sufficient
    statistics, the ``corr_value_hour`` discipline extended to two
    regression coefficients.

    x = hour-boundary count since 2020-01-01 (DuckDB ``date_diff('hour',
    ...)`` semantics: hour-truncated difference — int64, and small enough
    that per-batch int64 partial sums of x² cannot overflow at any batch
    size); y = cents(value). Each batch folds per-user (n, Σx, Σy, Σxy,
    Σx²); merge sums as Python ints (oracle HUGEINT). Closed forms, each ONE
    double expression rounded to 6 on both sides:

        slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)      [cents per hour]
        intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)    [cents at the anchor]

    Zero-time-variance users drop (oracle WHERE den > 0).
    Output: user_id, n:int64, slope:float64, intercept:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    anchor = pd.Timestamp("2020-01-01")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"].notna() & b["ts"].notna()]
        if not len(b):
            return pd.DataFrame(
                {
                    "user_id": pd.array([], dtype="int64"),
                    **{
                        c: pd.array([], dtype="int64")
                        for c in ("n", "sx", "sy", "sxy", "sx2")
                    },
                }
            )
        x = ((b["ts"].dt.floor("h") - anchor) // pd.Timedelta(hours=1)).to_numpy(
            dtype="int64"
        )
        y = cents_i64(b["value"])
        d = pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64").to_numpy(),
                "n": np.ones(len(b), dtype="int64"),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sx2": x * x,
            }
        )
        return d.groupby("user_id", sort=False).sum().reset_index()

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in bucket.groupby("user_id", sort=False):
            n = sum(int(v) for v in g["n"])
            sx = sum(int(v) for v in g["sx"])
            sy = sum(int(v) for v in g["sy"])
            sxy = sum(int(v) for v in g["sxy"])
            sx2 = sum(int(v) for v in g["sx2"])
            den = n * sx2 - sx * sx
            if n < min_n or den <= 0:
                continue
            slope = float(n * sxy - sx * sy) / float(den)
            intercept = float(sy * sx2 - sx * sxy) / float(den)
            rows.append(
                (int(uid), n, float(np.round(slope, 6)),
                 float(np.round(intercept, 6)))
            )
        return pd.DataFrame(
            rows, columns=["user_id", "n", "slope", "intercept"]
        ).astype({"user_id": "int64", "n": "int64",
                  "slope": "float64", "intercept": "float64"})

    return bucketed_group_apply(
        events.select_columns(["user_id", "ts", "value"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["user_id"],
        final,
        n_buckets=n_buckets,
    )


USER_VALUE_TREND_SQL_TEMPLATE = """
WITH s AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(date_diff('hour', TIMESTAMP '2020-01-01', ts) AS BIGINT)) AS sx,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sy,
         SUM(CAST(date_diff('hour', TIMESTAMP '2020-01-01', ts) AS BIGINT)
             * CAST(ROUND(value * 100) AS BIGINT)) AS sxy,
         SUM(CAST(date_diff('hour', TIMESTAMP '2020-01-01', ts) AS BIGINT)
             * CAST(date_diff('hour', TIMESTAMP '2020-01-01', ts) AS BIGINT)) AS sx2
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS slope,
       ROUND(CAST(sy * sx2 - sx * sxy AS DOUBLE)
             / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS intercept
FROM s
WHERE n >= {min_n} AND (n * sx2 - sx * sx) > 0
"""


def value_band_join(
    events: ray.data.Dataset, eps: float = 0.02, n_buckets: int = 64
) -> ray.data.Dataset:
    """Band self-join with NO equi-key on the band axis: all pairs of
    same-type events whose values differ by at most ``eps`` — the 1-D
    interval analogue of the bbox semi-join (J5), and the join family's
    missing member next to asof/range/equi/similarity (a band join has no
    natural hash key, so the partition IS the algorithm).

    Tiling shape: values go to exact integer cents (the money discipline —
    the band test is |Δcents| <= round(eps·100), no float boundary
    ambiguity); the cent axis is tiled into eps-wide cells, every row lands
    in its native cell plus a GHOST copy in the next cell up. Any qualifying
    pair then co-locates in exactly one (event_type, cell) bucket under the
    not-both-ghost rule: same-cell pairs emit where both are native,
    adjacent-cell pairs in the upper cell (ghost lower + native upper). Per
    bucket the pairs come from one sort + ``searchsorted`` window sweep —
    vectorized, output-bounded, no all-pairs anywhere.

    Output: event_type, a, b (event_ids, a < b), diff_cents:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    ceps = int(round(eps * 100))
    if ceps < 1:
        raise ValueError("eps must be at least one cent")

    def tiled(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["value"].notna()]
        c = cents_i64(b["value"])
        cell = c // ceps
        base = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(),
                "event_id": b["event_id"].astype("int64").to_numpy(),
                "c": c,
                "cell": cell,
                "ghost": np.zeros(len(b), dtype="int64"),
            }
        )
        gh = base.copy()
        gh["cell"] = gh["cell"] + 1
        gh["ghost"] = 1
        return pd.concat([base, gh], ignore_index=True)

    EMPTY = pd.DataFrame(
        {"event_type": pd.Series([], dtype="object"),
         "a": pd.Series([], dtype="int64"),
         "b": pd.Series([], dtype="int64"),
         "diff_cents": pd.Series([], dtype="int64")}
    )

    def pairs_in_cell(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (et, _), g in bucket.groupby(["event_type", "cell"], sort=False):
            n = len(g)
            if n < 2:
                continue
            g = g.sort_values(["c", "event_id"], kind="mergesort")
            c = g["c"].to_numpy()
            ids = g["event_id"].to_numpy()
            ghost = g["ghost"].to_numpy()
            hi = np.searchsorted(c, c + ceps, side="right")
            starts = np.arange(n)
            counts = hi - starts - 1
            total = int(counts.sum())
            if total == 0:
                continue
            ii = np.repeat(starts, counts)
            offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
            jj = np.arange(total) - np.repeat(offs, counts) + ii + 1
            keep = ~(ghost[ii].astype(bool) & ghost[jj].astype(bool))
            ii, jj = ii[keep], jj[keep]
            if not len(ii):
                continue
            a = np.minimum(ids[ii], ids[jj])
            bb = np.maximum(ids[ii], ids[jj])
            out.append(
                pd.DataFrame(
                    {"event_type": et, "a": a, "b": bb,
                     "diff_cents": np.abs(c[ii] - c[jj]).astype("int64")}
                )
            )
        return pd.concat(out, ignore_index=True) if out else EMPTY

    import pyarrow as pa

    from tcx2graph_jl_ray.functions.arrowutil import with_schema

    out = bucketed_group_apply(
        events.select_columns(["event_id", "event_type", "value"]).map_batches(
            tiled, batch_format="pandas", batch_size=65536
        ),
        ["event_type", "cell"],
        pairs_in_cell,
        n_buckets=n_buckets,
    )
    return with_schema(
        out,
        [("event_type", pa.string()), ("a", pa.int64()),
         ("b", pa.int64()), ("diff_cents", pa.int64())],
    )


VALUE_BAND_JOIN_SQL_TEMPLATE = """
WITH v AS (
  SELECT event_id, event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
)
SELECT a.event_type AS event_type,
       CAST(a.event_id AS BIGINT) AS a,
       CAST(b.event_id AS BIGINT) AS b,
       CAST(abs(a.c - b.c) AS BIGINT) AS diff_cents
FROM v a JOIN v b
  ON a.event_type = b.event_type
 AND a.event_id < b.event_id
 AND abs(a.c - b.c) <= {ceps}
"""


def event_type_trigrams(
    events: ray.data.Dataset, min_n: int = 2, n_buckets: int = 64
) -> ray.data.Dataset:
    """Second-order sequence mining over per-user event streams: counts of
    every (t1 -> t2 -> t3) CONSECUTIVE event-type trigram with support >=
    ``min_n`` — one order up from ``event_markov``'s transition matrix (the
    motif table for next-action models; support-thresholded instead of
    top-k so no tie ambiguity enters the oracle).

    Same two-shuffle shape as the markov table: user streams co-locate
    whole in user buckets, trigrams form by a double vectorized in-group
    shift, per-batch partial counts reduce in a tiny type³-bounded second
    shuffle. Output: t1, t2, t3, n:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def tris_per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = d.groupby("user_id", sort=False)["event_type"]
        n1 = g.shift(-1)
        n2 = g.shift(-2)
        keep = n2.notna()
        p = pd.DataFrame(
            {"t1": d["event_type"][keep], "t2": n1[keep], "t3": n2[keep]}
        )
        s = p.groupby(["t1", "t2", "t3"], sort=False).size()
        out = s.reset_index()
        out.columns = ["t1", "t2", "t3", "n_part"]
        return out

    tris = bucketed_group_apply(
        events.select_columns(["user_id", "event_type", "ts", "event_id"]),
        ["user_id"],
        tris_per_user,
        n_buckets=n_buckets,
    )

    def sum_tris(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby(["t1", "t2", "t3"], sort=False)["n_part"].sum()
        out = s.reset_index()
        out.columns = ["t1", "t2", "t3", "n"]
        out = out[out["n"] >= min_n]
        out["n"] = out["n"].astype("int64")
        return out

    import pyarrow as pa

    from tcx2graph_jl_ray.functions.arrowutil import with_schema

    counts = bucketed_group_apply(tris, ["t1", "t2", "t3"], sum_tris, n_buckets=16)
    return with_schema(
        counts,
        [("t1", pa.string()), ("t2", pa.string()), ("t3", pa.string()),
         ("n", pa.int64())],
    )


EVENT_TYPE_TRIGRAMS_SQL_TEMPLATE = """
WITH seq AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM seq
WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
HAVING COUNT(*) >= {min_n}
"""


def user_growth(events: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """Daily user-growth curve — new users (first-ever activity day),
    active users, and the cumulative distinct-user count per day: the
    growth dashboard every event log feeds, and the per-key-first-seen
    pattern (min over a keyed stream) the reference's per-file property
    scan implies (src/DataPreprocessing.jl:330-397 orders per key the same
    way).

    Scale shape: one keyed shuffle. Per-batch (user, day) dedup shrinks the
    stream before the user_id-bucketed global dedup; the same bucket apply
    tags each distinct (user, day) row with is-first (day == per-user min).
    Per-day counts reduce through a second tiny shuffle (day cardinality is
    time-range-bounded), and only the per-day frame — bounded by the number
    of distinct days, never by users or events — reaches the driver for the
    cumulative sum. Output: day (str), new_users, active_users, cum_users
    (all int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial_dedup(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"user_id": batch["user_id"],
             "day": pd.to_datetime(batch["ts"]).dt.floor("D")}
        )
        return d.drop_duplicates()

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()
        first = d.groupby("user_id", sort=False)["day"].transform("min")
        return pd.DataFrame(
            {"day": d["day"],
             "is_first": (d["day"] == first).astype("int64")}
        )

    per_day_rows = bucketed_group_apply(
        events.select_columns(["user_id", "ts"]).map_batches(
            partial_dedup, batch_format="pandas", batch_size=65536
        ),
        ["user_id"],
        per_user,
        n_buckets=n_buckets,
    )

    def sum_day(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("day", sort=False).agg(
            new_users=("is_first", "sum"), active_users=("is_first", "size")
        ).reset_index()
        return g

    per_day = bucketed_group_apply(
        per_day_rows, ["day"], sum_day, n_buckets=8
    ).to_pandas()
    # driver frame is DAY-cardinality-bounded (a 100-year log is ~37k rows),
    # the documented dimension-bounded-cumsum fallback (rel_part_pareto)
    if not len(per_day):
        # typed empty PANDAS frame (house pattern, heavy_hitter_words):
        # an empty Dataset loses its schema at to_pandas()
        return pd.DataFrame({
            "day": pd.Series([], dtype="object"),
            "new_users": pd.Series([], dtype="int64"),
            "active_users": pd.Series([], dtype="int64"),
            "cum_users": pd.Series([], dtype="int64"),
        })
    per_day = per_day.sort_values("day", kind="mergesort").reset_index(drop=True)
    out = pd.DataFrame({
        "day": pd.to_datetime(per_day["day"]).dt.strftime("%Y-%m-%d"),
        "new_users": per_day["new_users"].astype("int64"),
        "active_users": per_day["active_users"].astype("int64"),
        "cum_users": per_day["new_users"].astype("int64").cumsum(),
    })
    return ray.data.from_pandas(out)


USER_GROWTH_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
fd AS (SELECT user_id, MIN(day) AS day FROM ud GROUP BY user_id),
nu AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM fd GROUP BY day),
au AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS active_users
       FROM ud GROUP BY day)
SELECT strftime(au.day, '%Y-%m-%d') AS day,
       CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
       au.active_users,
       CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY au.day)
            AS BIGINT) AS cum_users
FROM au LEFT JOIN nu ON nu.day = au.day
"""


def first_touch_attribution(
    events: ray.data.Dataset,
    conversion_type: str = "purchase",
    lookback_days: int = 7,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """First-touch conversion attribution: every ``conversion_type`` event is
    credited to the event type of the FIRST event inside its user's
    ``lookback_days`` window (ts >= conversion_ts - lookback, strictly
    earlier in (ts, event_id) stream order), or to ``'direct'`` when the
    window holds nothing before the conversion — the marketing-attribution
    aggregate every event log grows.

    Scale shape: one user-keyed shuffle; inside each bucket the window start
    is resolved with a vectorized ``merge_asof`` (last event strictly before
    ts - lookback, +1 = first in window) against per-user sequence numbers —
    no per-purchase scan. Conversion value sums in exact integer cents
    (functions/money.py; nulls count 0). Output: first_touch,
    n_conversions:int64, value:money(2dp)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import (
        cents_i64,
        money_from_cents,
        )

    look = pd.Timedelta(days=lookback_days)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        d["seq"] = d.groupby("user_id", sort=False).cumcount()
        p = d[d["event_type"] == conversion_type]
        if not len(p):
            return pd.DataFrame({
                "first_touch": pd.Series([], dtype="object"),
                "n_part": pd.Series([], dtype="int64"),
                "cents_part": pd.Series([], dtype="int64"),
            })
        # asof keys as int64 microseconds: pandas requires identical units
        # and the inputs arrive as us (parquet) or ns (from_pandas) depending
        # on the caller
        ts_us = pd.to_datetime(d["ts"]).astype("datetime64[us]").astype("int64")
        look_us = look.value // 1000
        probe = pd.DataFrame({
            "user_id": p["user_id"], "t0": ts_us[p.index] - look_us,
            "pseq": p["seq"],
            "cents": cents_i64(p["value"].fillna(0.0)),
        }).sort_values("t0", kind="mergesort")
        base = pd.DataFrame({
            "user_id": d["user_id"], "ts": ts_us, "prev_seq": d["seq"],
        }).sort_values("ts", kind="mergesort")
        hit = pd.merge_asof(
            probe, base,
            left_on="t0", right_on="ts", by="user_id",
            allow_exact_matches=False, direction="backward",
        )
        first_seq = (hit["prev_seq"].fillna(-1) + 1).astype("int64")
        att = pd.DataFrame({
            "user_id": hit["user_id"], "seq": first_seq,
            "pseq": hit["pseq"], "cents": hit["cents"],
        }).merge(
            d[["user_id", "seq", "event_type"]], on=["user_id", "seq"],
            how="left",
        )
        touch = att["event_type"].where(att["seq"] < att["pseq"], "direct")
        g = pd.DataFrame({"first_touch": touch, "cents": att["cents"]}).groupby(
            "first_touch", sort=False
        ).agg(n_part=("cents", "size"), cents_part=("cents", "sum"))
        g = g.reset_index()
        g["n_part"] = g["n_part"].astype("int64")
        g["cents_part"] = g["cents_part"].astype("int64")
        return g

    parts = bucketed_group_apply(
        events.select_columns(["user_id", "event_id", "ts", "event_type",
                               "value"]),
        ["user_id"],
        per_bucket,
        n_buckets=n_buckets,
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("first_touch", sort=False).agg(
            n_conversions=("n_part", "sum"), cents=("cents_part", "sum")
        ).reset_index()
        return pd.DataFrame({
            "first_touch": g["first_touch"],
            "n_conversions": g["n_conversions"].astype("int64"),
            "value": [money_from_cents(c) for c in g["cents"]],
        })

    return bucketed_group_apply(parts, ["first_touch"], merge, n_buckets=4)


def first_touch_attribution_sql(
    conversion_type: str = "purchase", lookback_days: int = 7
) -> str:
    """DuckDB oracle for ``first_touch_attribution``: per-user sequence
    numbers, window start = count of events strictly before
    ts - lookback (DuckDB flattens the correlated COUNT into a join),
    credit = event at that sequence or 'direct'."""
    from tcx2graph_jl_ray.functions.money import (
        sql_cents,
        sql_money_from_cents_sum,
    )

    money = sql_money_from_cents_sum(sql_cents("COALESCE(f.value, 0)"))
    return f"""
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS seq
  FROM events
),
p AS (SELECT user_id, ts, seq, value FROM e
      WHERE event_type = '{conversion_type}'),
fs AS (
  SELECT p.user_id, p.seq AS pseq, p.value,
         (SELECT COUNT(*) FROM e e2
          WHERE e2.user_id = p.user_id
            AND e2.ts < p.ts - INTERVAL {lookback_days} DAY) AS first_seq
  FROM p
)
SELECT
  CASE WHEN f.first_seq < f.pseq THEN t.event_type ELSE 'direct' END
    AS first_touch,
  CAST(COUNT(*) AS BIGINT) AS n_conversions,
  {money} AS value
FROM fs f
LEFT JOIN e t ON t.user_id = f.user_id AND t.seq = f.first_seq
GROUP BY 1
"""


def user_value_anomalies(
    events: ray.data.Dataset,
    z: float = 3.0,
    min_n: int = 5,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-user z-score anomaly flags: events whose value deviates from the
    user's own mean by more than ``z`` standard deviations (population),
    among users with at least ``min_n`` valued events — the personalized
    outlier gate of a fraud/telemetry pipeline, vs the global MAD gate of
    ``events_mad_outliers``.

    Exactness discipline (the ``events_corr_value_hour`` pattern): per-user
    sufficient statistics (n, sum, sum-of-squares) in exact integer cents;
    the widening composite n*s2 - s1^2 in unbounded Python ints (== the
    oracle's HUGEINT); the final test is ONE shared double expression —
    diff^2 > z^2 * n * nvar with diff = c*n - s1 exact in int64 — so both
    sides evaluate the identical IEEE tree. Bounds: |cents|*n and n*c^2
    must fit int64 (any 2-dp money column and per-user streams < 2^40 rows
    do). One user-keyed shuffle, per-row work fully vectorized.
    Output: user_id, event_id, value, n_user."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    z2 = float(z) * float(z)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket[bucket["value"].notna()]
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "event_id": pd.Series([], dtype="int64"),
            "value": pd.Series([], dtype="float64"),
            "n_user": pd.Series([], dtype="int64"),
        })
        if not len(d):
            return empty
        c = cents_i64(d["value"])
        df = pd.DataFrame({
            "user_id": d["user_id"].astype("int64"),
            "event_id": d["event_id"].astype("int64"),
            "value": d["value"].astype("float64"),
            "c": c,
        })
        df["c2"] = df["c"] * df["c"]
        agg = df.groupby("user_id", sort=False).agg(
            n=("c", "size"), s1=("c", "sum"), s2=("c2", "sum")
        )
        agg = agg[agg["n"] >= min_n]
        if not len(agg):
            return empty
        # widening composite in unbounded Python ints (oracle: HUGEINT)
        nvar = (
            agg["n"].astype(object) * agg["s2"].astype(object)
            - agg["s1"].astype(object) * agg["s1"].astype(object)
        )
        # (v - s1/n)^2 > z^2 * (n*s2 - s1^2)/n^2  <=>  (v*n - s1)^2 > z^2*nvar
        agg["rhs"] = z2 * nvar.astype("float64")
        m = df.merge(
            agg[["n", "s1", "rhs"]], left_on="user_id", right_index=True,
            how="inner",
        )
        diff = (m["c"] * m["n"] - m["s1"]).astype("float64")
        keep = (diff * diff) > m["rhs"]
        out = m.loc[keep, ["user_id", "event_id", "value"]].copy()
        out["n_user"] = m.loc[keep, "n"].astype("int64")
        return out.reset_index(drop=True)

    return bucketed_group_apply(
        events.select_columns(["user_id", "event_id", "value"]),
        ["user_id"],
        per_bucket,
        n_buckets=n_buckets,
    )


USER_VALUE_ANOMALIES_SQL_TEMPLATE = """
WITH v AS (
  SELECT user_id, event_id, value,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(c) AS s1, SUM(c * c) AS s2
  FROM v GROUP BY user_id
),
t AS (
  SELECT user_id, n, s1,
         CAST(CAST(n AS HUGEINT) * CAST(s2 AS HUGEINT)
              - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) AS DOUBLE)
           AS nvard
  FROM s
)
SELECT v.user_id, v.event_id, v.value, t.n AS n_user
FROM v JOIN t USING (user_id)
WHERE t.n >= {min_n}
  AND CAST(v.c * t.n - t.s1 AS DOUBLE)
      * CAST(v.c * t.n - t.s1 AS DOUBLE)
      > {z2} * t.nvard
"""


def power_users(
    events: ray.data.Dataset, q: float = 0.99, n_buckets: int = 32
) -> ray.data.Dataset:
    """Users above the exact global ``q``-quantile of per-user event counts
    — the "power user" cut every engagement dashboard draws, and a
    production consumer of ``functions/quantile.exact_global_quantiles``
    (bounded driver memory at ANY user cardinality; the per-user counts
    never collect).

    Shape: per-batch partial counts -> bucketed per-user sum (combiner) ->
    one histogram-refinement quantile over the counts Dataset ->
    broadcast-threshold filter. Threshold is QUANTILE_CONT-identical, so
    the >= comparison matches the oracle bit-for-bit. Output: user_id,
    n_events, threshold (rounded 6)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("user_id", sort=False).size()
        return pd.DataFrame({"user_id": s.index.astype("int64"),
                             "n_part": s.to_numpy().astype("int64")})

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("user_id", sort=False)["n_part"].sum()
        return pd.DataFrame({"user_id": s.index.astype("int64"),
                             "n_events": s.to_numpy().astype("int64")})

    counts = bucketed_group_apply(
        events.select_columns(["user_id"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["user_id"],
        per_user,
        n_buckets=n_buckets,
    ).materialize()

    n, quants = exact_global_quantiles(counts, "n_events", [q])
    if n == 0:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "threshold": pd.Series([], dtype="float64"),
        })
    thr = quants[q]
    thr_r = float(np.round(thr, 6))

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["n_events"].to_numpy(dtype="float64") >= thr
        out = batch[k].copy()
        out["threshold"] = thr_r
        return out

    return counts.map_batches(flag, batch_format="pandas", batch_size=65536)


POWER_USERS_SQL_TEMPLATE = """
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
t AS (SELECT QUANTILE_CONT(n_events, {q}) AS thr FROM c)
SELECT c.user_id, c.n_events, ROUND(t.thr, 6) AS threshold
FROM c, t
WHERE CAST(c.n_events AS DOUBLE) >= t.thr
"""


def interarrival_stats(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-event-type cadence: statistics of the gap between consecutive
    events of the same type BY THE SAME USER — count, min, max, and
    half-up-rounded mean inter-arrival, all in exact integer microseconds
    (no float ever enters; the ``rel_cohort_ltv`` half-up discipline).

    Scale shape: one user-keyed shuffle; gaps come from a vectorized
    in-group shift over (user, type) streams; per-type partials (n, sum,
    min, max — all order-free) reduce through a tiny type-bounded second
    shuffle. Output: event_type, n_gaps, min_gap_us, max_gap_us,
    avg_gap_us (all int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        )
        us = pd.to_datetime(d["ts"]).astype("datetime64[us]").astype("int64")
        prev = us.groupby(
            [d["user_id"], d["event_type"]], sort=False
        ).shift()
        gap = us - prev
        k = gap.notna()
        if not k.any():
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "mn": pd.Series([], dtype="int64"),
                "mx": pd.Series([], dtype="int64"),
            })
        g = pd.DataFrame({
            "event_type": d["event_type"][k],
            "gap": gap[k].astype("int64"),
        }).groupby("event_type", sort=False)["gap"].agg(
            ["size", "sum", "min", "max"]
        )
        return pd.DataFrame({
            "event_type": g.index,
            "n": g["size"].astype("int64").to_numpy(),
            "s": g["sum"].astype("int64").to_numpy(),
            "mn": g["min"].astype("int64").to_numpy(),
            "mx": g["max"].astype("int64").to_numpy(),
        })

    parts = bucketed_group_apply(
        events.select_columns(["user_id", "event_id", "ts", "event_type"]),
        ["user_id"],
        per_bucket,
        n_buckets=n_buckets,
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False).agg(
            n_gaps=("n", "sum"), s=("s", "sum"),
            min_gap_us=("mn", "min"), max_gap_us=("mx", "max"),
        ).reset_index()
        n = g["n_gaps"].astype("int64")
        s = g["s"].astype("int64")
        return pd.DataFrame({
            "event_type": g["event_type"],
            "n_gaps": n,
            "min_gap_us": g["min_gap_us"].astype("int64"),
            "max_gap_us": g["max_gap_us"].astype("int64"),
            "avg_gap_us": (2 * s + n) // (2 * n),
        })

    return bucketed_group_apply(parts, ["event_type"], merge, n_buckets=4)


INTERARRIVAL_SQL = """
WITH seq AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         )) AS gap
  FROM events
)
SELECT event_type,
       CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       CAST(MIN(gap) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us,
       CAST((2 * SUM(gap) + COUNT(gap)) // (2 * COUNT(gap)) AS BIGINT)
         AS avg_gap_us
FROM seq WHERE gap IS NOT NULL
GROUP BY event_type
"""


def busy_minutes(
    events: ray.data.Dataset, k: int = 20, n_buckets: int = 16
) -> ray.data.Dataset:
    """The ``k`` busiest wall-clock minutes of the event log with
    deterministic ties (count desc, minute asc) — the incident-triage
    cut ("what minute melted?") over any telemetry stream.

    Combiner shape: per-batch minute partial counts, bucketed exact sums,
    per-bucket LOCAL head-k (at most k rows per bucket survive), one tiny
    driver merge of n_buckets*k rows. Output: minute (str
    'YYYY-MM-DD HH:MM'), n_events, rank (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = pd.to_datetime(batch["ts"]).dt.floor("min")
        s = m.groupby(m, sort=False).size()
        return pd.DataFrame({"minute": s.index,
                             "n_part": s.to_numpy().astype("int64")})

    def per_minute(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("minute", sort=False)["n_part"].sum().reset_index(
            name="n_events"
        )
        # local head-k: only candidates for the global top-k leave the task
        g = g.sort_values(["n_events", "minute"], ascending=[False, True],
                          kind="mergesort").head(k)
        g["n_events"] = g["n_events"].astype("int64")
        return g

    cands = bucketed_group_apply(
        events.select_columns(["ts"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["minute"],
        per_minute,
        n_buckets=n_buckets,
    ).to_pandas()  # <= n_buckets * k rows: the bounded driver merge
    if not len(cands):
        return pd.DataFrame({
            "minute": pd.Series([], dtype="object"),
            "n_events": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64"),
        })
    top = cands.sort_values(
        ["n_events", "minute"], ascending=[False, True], kind="mergesort"
    ).head(k).reset_index(drop=True)
    return ray.data.from_pandas(pd.DataFrame({
        "minute": pd.to_datetime(top["minute"]).dt.strftime("%Y-%m-%d %H:%M"),
        "n_events": top["n_events"].astype("int64"),
        "rank": pd.array(range(1, len(top) + 1), dtype="int64"),
    }))


BUSY_MINUTES_SQL_TEMPLATE = """
WITH m AS (
  SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
r AS (
  SELECT minute, n_events,
         ROW_NUMBER() OVER (ORDER BY n_events DESC, minute) AS rank
  FROM m
)
SELECT minute, n_events, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def monthly_type_mix(
    events: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """Monthly event-type mix: counts and within-month share per type —
    the composition time-series (is the error share creeping up?) next to
    ``events_type_trend``'s absolute counts. Share is one division of
    exact ints, rounded 6; per-batch (month, type) partials keep the
    exchange month*type-bounded. Output: month, event_type, n_events,
    share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m")
        g = pd.DataFrame({"month": m, "event_type": batch["event_type"]})\
            .groupby(["month", "event_type"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    def per_month(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["month", "event_type"], sort=False)["n"].sum()\
            .reset_index(name="n_events")
        tot = g.groupby("month", sort=False)["n_events"].transform("sum")
        return pd.DataFrame({
            "month": g["month"],
            "event_type": g["event_type"],
            "n_events": g["n_events"].astype("int64"),
            "share": np.round(
                g["n_events"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    parts = events.select_columns(["ts", "event_type"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    # month buckets hold every type row of a month, so the within-month
    # total is local to the apply
    return bucketed_group_apply(
        parts, ["month"], per_month, n_buckets=n_buckets
    )


MONTHLY_TYPE_MIX_SQL = """
WITH c AS (
  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
         event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT month, event_type, n_events,
       ROUND(CAST(n_events AS DOUBLE)
             / CAST(SUM(n_events) OVER (PARTITION BY month) AS DOUBLE), 6)
         AS share
FROM c
"""


def session_overlap_join(
    events: ray.data.Dataset,
    gap_s: float = 1800.0,
    cell_s: int = 3600,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """INTERVAL self-join over the session table: all pairs of sessions
    from DIFFERENT users whose [first_ts, last_ts] spans intersect — who
    was on concurrently — the join family's interval member next to
    asof / range / band (an interval has no equi-key; the partition is the
    algorithm, ``events_value_band_join``'s discipline on the time axis).

    Tiling shape: the time axis splits into ``cell_s``-second cells; every
    session replicates into EACH cell its span touches; an overlapping
    pair co-locates in every shared cell and is emitted EXACTLY ONCE by
    the canonical-cell rule (only in the cell holding the later start —
    the overlap's first instant lives in exactly one cell). Inside a cell
    the pairs come from one sort-by-start + ``searchsorted`` window sweep
    (overlap for j after i in start order is exactly start_j <= last_i) —
    output-bounded, no all-pairs. Microsecond integers throughout. Output:
    user_a, session_a, user_b, session_b (user_a < user_b),
    overlap_us:int64."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    cell_us = int(cell_s) * 1_000_000
    sessions = sessionize(events, gap_s=gap_s)

    def tiled(batch: pd.DataFrame) -> pd.DataFrame:
        f = pd.to_datetime(batch["first_ts"]).astype("datetime64[us]")\
            .astype("int64").to_numpy()
        l = pd.to_datetime(batch["last_ts"]).astype("datetime64[us]")\
            .astype("int64").to_numpy()
        c0 = f // cell_us
        c1 = l // cell_us
        reps = (c1 - c0 + 1).astype("int64")
        idx = np.repeat(np.arange(len(batch)), reps)
        offs = np.zeros(len(batch), dtype="int64")
        np.cumsum(reps[:-1], out=offs[1:])
        cell = (np.arange(reps.sum()) - np.repeat(offs, reps)
                + np.repeat(c0, reps))
        return pd.DataFrame({
            "cell": cell,
            "user_id": batch["user_id"].astype("int64").to_numpy()[idx],
            "session_idx": batch["session_idx"].astype("int64")
            .to_numpy()[idx],
            "f": f[idx],
            "l": l[idx],
        })

    def per_cell(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_a": pd.Series([], dtype="int64"),
            "session_a": pd.Series([], dtype="int64"),
            "user_b": pd.Series([], dtype="int64"),
            "session_b": pd.Series([], dtype="int64"),
            "overlap_us": pd.Series([], dtype="int64"),
        })
        out = [empty]
        for cell, g in bucket.groupby("cell", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(["f", "user_id", "session_idx"],
                              kind="mergesort")
            f = g["f"].to_numpy()
            l = g["l"].to_numpy()
            u = g["user_id"].to_numpy()
            s = g["session_idx"].to_numpy()
            hi = np.searchsorted(f, l, side="right")
            lo = np.arange(len(g)) + 1
            counts = np.maximum(hi - lo, 0)
            if not counts.sum():
                continue
            offs = np.zeros(len(g), dtype="int64")
            np.cumsum(counts[:-1], out=offs[1:])
            i = np.repeat(np.arange(len(g)), counts)
            j = (np.arange(counts.sum()) - np.repeat(offs, counts)
                 + np.repeat(lo, counts))
            # canonical cell: emit only where the LATER start falls here;
            # cross-user only
            keep = (f[j] // cell_us == cell) & (u[i] != u[j])
            i, j = i[keep], j[keep]
            if not len(i):
                continue
            swap = u[i] > u[j]
            ua = np.where(swap, u[j], u[i])
            ub = np.where(swap, u[i], u[j])
            sa = np.where(swap, s[j], s[i])
            sb = np.where(swap, s[i], s[j])
            out.append(pd.DataFrame({
                "user_a": ua, "session_a": sa,
                "user_b": ub, "session_b": sb,
                "overlap_us": np.minimum(l[i], l[j]) - f[j],
            }))
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(
        sessions.map_batches(tiled, batch_format="pandas", batch_size=65536),
        ["cell"],
        per_cell,
        n_buckets=n_buckets,
    )


SESSION_OVERLAP_SQL_TEMPLATE = """
WITH s AS MATERIALIZED ({sessions})
SELECT a.user_id AS user_a,
       a.session_idx AS session_a,
       b.user_id AS user_b,
       b.session_idx AS session_b,
       epoch_us(least(a.last_ts, b.last_ts))
         - epoch_us(greatest(a.first_ts, b.first_ts)) AS overlap_us
FROM s a JOIN s b
  ON a.user_id < b.user_id
 AND a.first_ts <= b.last_ts
 AND b.first_ts <= a.last_ts
"""


def type_affinity(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Event-type affinity: for every pair of types, how many users did
    BOTH, with lift against independence — the bipartite user-type
    projection (the ``rel_basket_lift`` shape with users as baskets), i.e.
    "users who error also purchase?".

    All-integer counts; lift = one division of exact int64 products,
    rounded 6. Distinct (user, type) pairs reduce through a user-keyed
    dedup; per-user type sets are type-bounded, so the pair explosion
    inside the bucket apply is |types|^2-bounded per user. Output: type_a,
    type_b (a < b), n_both, n_a, n_b, lift."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    ut = bucketed_group_apply(
        events.select_columns(["user_id", "event_type"]).map_batches(
            lambda b: b.drop_duplicates(), batch_format="pandas",
            batch_size=65536,
        ),
        ["user_id"],
        lambda b: b.drop_duplicates(),
        n_buckets=n_buckets,
    ).materialize()

    def pair_partial(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["user_id", "event_type"], kind="mergesort")
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        g = m.groupby(["event_type_x", "event_type_y"], sort=False).size()
        out = g.reset_index(name="n")
        out.columns = ["type_a", "type_b", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    pair_counts = bucketed_group_apply(
        ut, ["user_id"], pair_partial, n_buckets=n_buckets
    )

    def type_partial(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("event_type", sort=False).size()
        return pd.DataFrame({"event_type": s.index,
                             "n_t": s.to_numpy().astype("int64")})

    tc = bucketed_group_apply(
        ut.select_columns(["event_type"]), ["event_type"], type_partial,
        n_buckets=4,
    ).to_pandas()  # type-bounded small side
    n_users = int(
        bucketed_group_apply(
            ut.select_columns(["user_id"]), ["user_id"],
            lambda b: b.drop_duplicates(), n_buckets=n_buckets,
        ).count()
    )
    t_counts = ray.put(dict(zip(tc["event_type"], tc["n_t"])))

    class _Lift:
        def __init__(self, ref, n):
            self.t = ray.get(ref)
            self.n = np.int64(n)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            g = batch.groupby(["type_a", "type_b"], sort=False)["n"].sum()\
                .reset_index(name="n_both")
            na = g["type_a"].map(self.t).to_numpy(dtype="int64")
            nb = g["type_b"].map(self.t).to_numpy(dtype="int64")
            nboth = g["n_both"].astype("int64").to_numpy()
            return pd.DataFrame({
                "type_a": g["type_a"], "type_b": g["type_b"],
                "n_both": nboth, "n_a": na, "n_b": nb,
                "lift": np.round(
                    (nboth * self.n).astype("float64")
                    / (na * nb).astype("float64"), 6
                ),
            })

    return bucketed_group_apply(
        pair_counts, ["type_a", "type_b"],
        lambda b: b.groupby(["type_a", "type_b"], sort=False)["n"].sum()
        .reset_index(),
        n_buckets=4,
    ).map_batches(
        _Lift, fn_constructor_args=(t_counts, n_users),
        batch_format="pandas", concurrency=(1, 2),
    )


TYPE_AFFINITY_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
       FROM ut GROUP BY event_type),
nn AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM ut),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both, ta.n_t AS n_a, tb.n_t AS n_b,
       ROUND(CAST(p.n_both * nn.n AS DOUBLE)
             / CAST(ta.n_t * tb.n_t AS DOUBLE), 6) AS lift
FROM p
JOIN tc ta ON ta.event_type = p.type_a
JOIN tc tb ON tb.event_type = p.type_b
CROSS JOIN nn
"""


def daily_autocorr(
    events: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """Lag-1 autocorrelation of each event type's DAILY count series — the
    trend-memory diagnostic (is today's error volume predicted by
    yesterday's?) in the exact-integer Pearson discipline of
    ``events_corr_value_hour``: the (x_t, x_{t+1}) pairs over consecutive
    calendar days are all-integer, the six sufficient statistics stay
    exact, and the final correlation is ONE shared double expression
    rounded 6. Days with zero events count as 0 (the series is dense over
    the [min_day, max_day] span per type).

    The per-(type, day) reduce is time-bounded, so the series assembles in
    a type-keyed apply (a 100-year log is ~37k points per type — the
    ``rel_part_pareto`` dimension-bounded discipline). Zero-variance
    series drop on both sides. Output: event_type, n_days, autocorr."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.to_datetime(batch["ts"]).dt.floor("D")
        g = pd.DataFrame({"event_type": batch["event_type"], "day": d})\
            .groupby(["event_type", "day"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    per_day = bucketed_group_apply(
        events.select_columns(["ts", "event_type"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["event_type", "day"],
        lambda b: b.groupby(["event_type", "day"], sort=False)["n"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    )

    def per_type(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype="object"),
            "n_days": pd.Series([], dtype="int64"),
            "autocorr": pd.Series([], dtype="float64"),
        })
        out = [empty]
        for t, g in bucket.groupby("event_type", sort=False):
            g = g.sort_values("day", kind="mergesort")
            days = g["day"].to_numpy()
            span = pd.date_range(days[0], days[-1], freq="D")
            series = pd.Series(0, index=span, dtype="int64")
            series.loc[g["day"]] = g["n"].to_numpy()
            x = series.to_numpy()
            if len(x) < 2:
                continue
            a, b = x[:-1].astype(object), x[1:].astype(object)
            n = len(a)
            sx, sy = sum(a), sum(b)
            sxy = sum(a * b)
            sx2, sy2 = sum(a * a), sum(b * b)
            vx = n * sx2 - sx * sx
            vy = n * sy2 - sy * sy
            if vx <= 0 or vy <= 0:
                continue
            corr = float(n * sxy - sx * sy) / float(
                np.sqrt(float(vx) * float(vy))
            )
            out.append(pd.DataFrame({
                "event_type": [t],
                "n_days": np.array([len(x)], dtype="int64"),
                "autocorr": [np.round(corr, 6)],
            }))
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(
        per_day, ["event_type"], per_type, n_buckets=4
    )


DAILY_AUTOCORR_SQL = """
WITH c AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM c
  GROUP BY event_type
),
cal AS (
  SELECT unnest(CAST(generate_series(
           (SELECT MIN(CAST(ts AS DATE)) FROM events),
           (SELECT MAX(CAST(ts AS DATE)) FROM events),
           INTERVAL 1 DAY) AS DATE[])) AS day
),
dense AS (
  SELECT s.event_type, cal.day, COALESCE(c.n, 0) AS n
  FROM spans s
  JOIN cal ON cal.day BETWEEN s.d0 AND s.d1
  LEFT JOIN c ON c.event_type = s.event_type AND c.day = cal.day
),
pairs AS (
  SELECT event_type, n AS x,
         LEAD(n) OVER (PARTITION BY event_type ORDER BY day) AS y
  FROM dense
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM pairs WHERE y IS NOT NULL
  GROUP BY event_type
)
SELECT event_type,
       CAST(n + 1 AS BIGINT) AS n_days,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6) AS autocorr
FROM s
WHERE (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
"""


def user_lifetimes(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-user lifetime profile: first/last active day, span in days,
    distinct active days, and total events — the user dimension table the
    growth curve (``events_user_growth``) aggregates away. All-integer /
    date-string output; one user-keyed shuffle over per-batch
    (user, day) partials. Output: user_id, first_day, last_day, span_days,
    active_days, n_events."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "day": pd.to_datetime(batch["ts"]).dt.floor("D"),
        })
        g = d.groupby(["user_id", "day"], sort=False).size().reset_index(
            name="n"
        )
        g["n"] = g["n"].astype("int64")
        return g

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.groupby(["user_id", "day"], sort=False)["n"].sum()\
            .reset_index()
        g = d.groupby("user_id", sort=False).agg(
            first=("day", "min"), last=("day", "max"),
            active_days=("day", "size"), n_events=("n", "sum"),
        )
        return pd.DataFrame({
            "user_id": g.index.astype("int64"),
            "first_day": g["first"].dt.strftime("%Y-%m-%d"),
            "last_day": g["last"].dt.strftime("%Y-%m-%d"),
            "span_days": ((g["last"] - g["first"]).dt.days + 1)
            .astype("int64"),
            "active_days": g["active_days"].astype("int64"),
            "n_events": g["n_events"].astype("int64"),
        })

    return bucketed_group_apply(
        events.select_columns(["user_id", "ts"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["user_id"],
        per_user,
        n_buckets=n_buckets,
    )


USER_LIFETIMES_SQL = """
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       strftime(MIN(day), '%Y-%m-%d') AS first_day,
       strftime(MAX(day), '%Y-%m-%d') AS last_day,
       CAST(date_diff('day', MIN(day), MAX(day)) + 1 AS BIGINT)
         AS span_days,
       CAST(COUNT(*) AS BIGINT) AS active_days,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM d GROUP BY user_id
"""


def stickiness(
    events: ray.data.Dataset, window_days: int = 7, n_buckets: int = 32
) -> ray.data.Dataset:
    """Engagement stickiness: per active day, DAU / trailing-``window_days``
    active users — the DAU/WAU ratio every growth team tracks. COUNT
    DISTINCT over sliding windows cannot compose from partials
    (``sliding_distinct_users``' lesson at day scale): distinct (user, day)
    rows fan to the ``window_days`` windows ENDING at each later day, the
    (window, user) dedup is keyed so no window's user set sits in one
    task, and only the day-bounded (day, dau, wau) frame reaches the
    driver for the ratio (one division, rounded 6). Output: day, n_dau,
    n_wau, stickiness."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial_ud(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "day": pd.to_datetime(batch["ts"]).dt.floor("D"),
        }).drop_duplicates()

    ud = bucketed_group_apply(
        events.select_columns(["user_id", "ts"]).map_batches(
            partial_ud, batch_format="pandas", batch_size=65536
        ),
        ["user_id", "day"],
        lambda b: b.drop_duplicates(["user_id", "day"]),
        n_buckets=n_buckets,
    ).materialize()

    def dau_count(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("day", sort=False).size()
        return pd.DataFrame({"day": s.index,
                             "n_dau": s.to_numpy().astype("int64")})

    dau = bucketed_group_apply(ud, ["day"], dau_count, n_buckets=8)\
        .to_pandas()  # day-bounded

    def fan(batch: pd.DataFrame) -> pd.DataFrame:
        reps = []
        for k in range(window_days):
            r = batch[["user_id"]].copy()
            r["win_end"] = batch["day"] + pd.to_timedelta(k, unit="D")
            reps.append(r)
        return pd.concat(reps, ignore_index=True)

    def wau_partial(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates(["win_end", "user_id"])
        s = d.groupby("win_end", sort=False).size()
        return pd.DataFrame({"win_end": s.index,
                             "n_part": s.to_numpy().astype("int64")})

    wau = bucketed_group_apply(
        ud.map_batches(fan, batch_format="pandas", batch_size=65536),
        ["win_end", "user_id"],
        wau_partial,
        n_buckets=n_buckets,
    )

    def wau_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("win_end", sort=False)["n_part"].sum()
        return pd.DataFrame({"win_end": g.index,
                             "n_wau": g.to_numpy().astype("int64")})

    wau = bucketed_group_apply(wau, ["win_end"], wau_sum, n_buckets=8)\
        .to_pandas()  # day-bounded

    m = dau.merge(wau.rename(columns={"win_end": "day"}), on="day",
                  how="inner")
    if not len(m):
        return pd.DataFrame({
            "day": pd.Series([], dtype="object"),
            "n_dau": pd.Series([], dtype="int64"),
            "n_wau": pd.Series([], dtype="int64"),
            "stickiness": pd.Series([], dtype="float64"),
        })
    m = m.sort_values("day", kind="mergesort").reset_index(drop=True)
    return ray.data.from_pandas(pd.DataFrame({
        "day": pd.to_datetime(m["day"]).dt.strftime("%Y-%m-%d"),
        "n_dau": m["n_dau"].astype("int64"),
        "n_wau": m["n_wau"].astype("int64"),
        "stickiness": np.round(
            m["n_dau"].to_numpy(dtype="float64")
            / m["n_wau"].to_numpy(dtype="float64"), 6
        ),
    }))


STICKINESS_SQL_TEMPLATE = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_dau FROM ud GROUP BY day),
wau AS (
  SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_wau
  FROM (SELECT DISTINCT day FROM ud) d
  JOIN ud u ON u.day BETWEEN d.day - INTERVAL {w1} DAY AND d.day
  GROUP BY d.day
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.n_dau, wau.n_wau,
       ROUND(CAST(dau.n_dau AS DOUBLE) / CAST(wau.n_wau AS DOUBLE), 6)
         AS stickiness
FROM dau JOIN wau ON wau.day = dau.day
"""


def hourly_entropy(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Per-type Shannon entropy of the hour-of-day distribution plus the
    peak hour — round-the-clock uniform traffic scores ~log2(24),
    single-spike bots score ~0 (the ``text_char_entropy`` discipline over
    the time axis; 24 summands, rounded 6, and the ``+ 0.0`` fold kills
    IEEE -0.0 before the driver hash). Peak ties break to the earliest
    hour. Output: event_type, n_events, peak_hour, hour_entropy."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.to_datetime(batch["ts"]).dt.hour.astype("int64")
        g = pd.DataFrame({"event_type": batch["event_type"], "h": h})\
            .groupby(["event_type", "h"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    per_hour = bucketed_group_apply(
        events.select_columns(["ts", "event_type"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["event_type", "h"],
        lambda b: b.groupby(["event_type", "h"], sort=False)["n"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    )

    def per_type(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in bucket.groupby("event_type", sort=False):
            n = g["n"].to_numpy(dtype="int64")
            nt = n.sum()
            p = n.astype("float64") / float(nt)
            ent = 0.0 - float((p * np.log2(p)).sum()) + 0.0
            peak = g.sort_values(["n", "h"], ascending=[False, True],
                                 kind="mergesort").iloc[0]["h"]
            rows.append((t, int(nt), int(peak), np.round(ent, 6) + 0.0))
        if not rows:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "n_events": pd.Series([], dtype="int64"),
                "peak_hour": pd.Series([], dtype="int64"),
                "hour_entropy": pd.Series([], dtype="float64"),
            })
        return pd.DataFrame(rows, columns=[
            "event_type", "n_events", "peak_hour", "hour_entropy"
        ]).astype({"n_events": "int64", "peak_hour": "int64"})

    return bucketed_group_apply(per_hour, ["event_type"], per_type,
                                n_buckets=4)


HOURLY_ENTROPY_SQL = """
WITH c AS (
  SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS h,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(n) AS nt FROM c GROUP BY event_type),
pk AS (
  SELECT event_type, h AS peak_hour
  FROM (SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, h) AS r
        FROM c)
  WHERE r = 1
)
SELECT c.event_type,
       CAST(tot.nt AS BIGINT) AS n_events,
       pk.peak_hour,
       ROUND(0.0 - SUM((c.n / tot.nt) * log2(c.n / tot.nt)), 6) + 0.0
         AS hour_entropy
FROM c
JOIN tot ON tot.event_type = c.event_type
JOIN pk ON pk.event_type = c.event_type
GROUP BY c.event_type, tot.nt, pk.peak_hour
"""


def value_by_type(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Per-type value totals and share of the corpus total — exact integer
    cents throughout (functions/money.py), the share as one division of
    the two exact cent sums, rounded 6. Per-batch partials bound the
    exchange to type cardinality; the type-bounded frame computes the
    share against its own total. Output: event_type, n_valued, value_sum,
    share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64, money_from_cents

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["value"].notna()]
        if not len(d):
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64"),
            })
        g = pd.DataFrame({
            "event_type": d["event_type"], "c": cents_i64(d["value"]),
        }).groupby("event_type", sort=False)["c"].agg(["size", "sum"])
        return pd.DataFrame({
            "event_type": g.index,
            "n": g["size"].astype("int64").to_numpy(),
            "c": g["sum"].astype("int64").to_numpy(),
        })

    parts = events.select_columns(["event_type", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False).agg(
            n_valued=("n", "sum"), c=("c", "sum")
        ).reset_index()
        tot = int(g["c"].sum())
        return pd.DataFrame({
            "event_type": g["event_type"],
            "n_valued": g["n_valued"].astype("int64"),
            "value_sum": [money_from_cents(c) for c in g["c"]],
            "share": np.round(
                g["c"].to_numpy(dtype="float64") / float(tot), 6
            ),
        })

    # ONE partition on purpose: the share needs the global total and the
    # partial frame is type-bounded (one row per (batch, type))
    return parts.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


VALUE_BY_TYPE_SQL = """
WITH s AS (
  SELECT event_type,
         CAST(COUNT(value) AS BIGINT) AS n_valued,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n_valued,
       CAST(c AS DOUBLE) / 100.0 AS value_sum,
       ROUND(CAST(c AS DOUBLE) / CAST((SELECT SUM(c) FROM s) AS DOUBLE), 6)
         AS share
FROM s
"""


def user_gini(events: ray.data.Dataset, n_buckets: int = 16) -> ray.data.Dataset:
    """Gini coefficient of per-user event-count inequality — the corpus
    concentration scalar a curation pipeline watches (a whale-dominated
    corpus over-trains on few contributors). Fully exact until the final
    division: per-user counts reduce in user buckets (combiner), the tiny
    count-of-counts reduces again (one row per distinct count value per
    bucket — value-domain bounded), and the driver computes the rank sum
    S = sum_i i*x_i over the SORTED multiset from (count, multiplicity)
    runs in arbitrary-precision Python ints:
    value c with multiplicity m starting at rank r contributes
    c * (m*r + m*(m-1)/2). Gini = 2*S/(n*T) - (n+1)/n, one double
    expression mirrored in the oracle, rounded 6.

    Output (one row): n_users, total_events, gini."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("user_id", sort=False).size()
        return pd.DataFrame({"user_id": s.index.astype("int64"),
                             "c_part": s.to_numpy().astype("int64")})

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("user_id", sort=False)["c_part"].sum()
        h = s.value_counts()
        return pd.DataFrame({"c": h.index.astype("int64"),
                             "m_part": h.to_numpy().astype("int64")})

    def hist(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("c", sort=False)["m_part"].sum()
        return pd.DataFrame({"c": s.index.astype("int64"),
                             "m": s.astype("int64").to_numpy()})

    per = bucketed_group_apply(
        events.select_columns(["user_id"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["user_id"], per_user, n_buckets=n_buckets,
    )
    cc = bucketed_group_apply(per, ["c"], hist, n_buckets=4).to_pandas()
    # driver side: one row per DISTINCT per-user count value (value-domain
    # bounded, the order_size_distribution contract)
    cc = cc.sort_values("c")
    n = 0
    t = 0
    s_rank = 0
    r = 1
    for c, m in zip(cc["c"].tolist(), cc["m"].tolist()):
        s_rank += c * (m * r + m * (m - 1) // 2)
        r += m
        n += m
        t += c * m
    gini = round(
        2.0 * float(s_rank) / (float(n) * float(t))
        - float(n + 1) / float(n), 6
    ) if n else float("nan")
    return ray.data.from_pandas(pd.DataFrame({
        "n_users": pd.array([n], dtype="int64"),
        "total_events": pd.array([t], dtype="int64"),
        "gini": [gini],
    }))


USER_GINI_SQL = """
WITH u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
),
r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, user_id) AS rn FROM u
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS t,
         SUM(rn * c) AS s_rank
  FROM r
)
SELECT n AS n_users, t AS total_events,
       ROUND(2.0 * CAST(s_rank AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
FROM s
"""


def user_burstiness(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-user burstiness of the event stream — Goh & Barabási's
    B = (σ−μ)/(σ+μ) over inter-arrival gaps (−1 = metronome, 0 = Poisson,
    →1 = extreme bursts), the temporal-pattern classifier next to
    ``interarrival_stats``'s per-type cadence.

    Exactness discipline (``corr_value_hour``): gaps are exact integer
    SECONDS (per-event epoch-second truncation, so σ's sufficient
    statistic Σg² is int64-safe for any corpus spanning < ~96 years —
    Σg² ≤ (Σg)² ≤ span²; microseconds would wrap); per-user (n, S1, S2)
    fold inside the one user-keyed shuffle, composites n·S2−S1² in
    PYTHON ints (HUGEINT-equal), and B = one shared double expression
    (sqrt(D)−S1)/(sqrt(D)+S1) — n cancels — rounded 6. Users with < 2
    gaps or an all-zero gap sum drop (stated contract, oracle HAVING).
    Output: user_id, n_gaps, mean_gap_s, burstiness."""
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["user_id", "ts", "event_id"],
                               kind="mergesort")
        es = (
            pd.to_datetime(d["ts"]).astype("datetime64[us]").astype("int64")
            // 1_000_000
        )
        gap = es - es.groupby(d["user_id"], sort=False).shift()
        k = gap.notna()
        g = pd.DataFrame({
            "user_id": d["user_id"][k].astype("int64"),
            "gap": gap[k].astype("int64"),
        })
        rows = []
        for uid, gg in g.groupby("user_id", sort=False):
            gaps = gg["gap"].to_numpy()
            n = len(gaps)
            s1 = int(gaps.sum())
            s2 = int((gaps * gaps).sum())
            if n < 2 or s1 <= 0:
                continue
            dd = n * s2 - s1 * s1  # Python int, HUGEINT-equal
            sq = math.sqrt(float(dd))
            rows.append((
                uid,
                np.int64(n),
                np.round(s1 / n, 6),
                np.round((sq - float(s1)) / (sq + float(s1)), 6),
            ))
        return pd.DataFrame(
            rows, columns=["user_id", "n_gaps", "mean_gap_s", "burstiness"]
        ).astype({
            "user_id": "int64", "n_gaps": "int64",
            "mean_gap_s": "float64", "burstiness": "float64",
        })

    return bucketed_group_apply(
        events.select_columns(["user_id", "event_id", "ts"]),
        ["user_id"],
        per_bucket,
        n_buckets=n_buckets,
    )


USER_BURSTINESS_SQL = """
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
g AS (
  SELECT user_id,
         es - LAG(es) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS gap
  FROM e
),
s AS (
  SELECT user_id, COUNT(gap) AS n, SUM(gap) AS s1, SUM(gap * gap) AS s2
  FROM g WHERE gap IS NOT NULL
  GROUP BY user_id
  HAVING COUNT(gap) >= 2 AND SUM(gap) > 0
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n AS BIGINT) AS n_gaps,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_s,
       ROUND((SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)) - CAST(s1 AS DOUBLE))
             / (SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)) + CAST(s1 AS DOUBLE)),
             6) AS burstiness
FROM s
"""


def user_type_entropy(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-user Shannon entropy of the event-type mix plus the dominant
    type — the specialization gauge (a one-trick bot scores 0, a uniform
    all-types user ~log2(k)); the ``hourly_entropy`` discipline pivoted
    from the time axis to the user axis. Dominant-type ties break to the
    lexicographically smallest type on both sides. Entropy summands are
    bounded by the type cardinality, rounded 6, ``+ 0.0`` -0.0 fold.
    Output: user_id, n_events, n_types, top_type, type_entropy."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["user_id", "event_type"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = events.select_columns(["user_id", "event_type"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        c = bucket.groupby(["user_id", "event_type"], sort=False)["n"].sum()\
            .reset_index()
        rows = []
        for uid, g in c.groupby("user_id", sort=False):
            n = g["n"].to_numpy(dtype="int64")
            nt = n.sum()
            p = n.astype("float64") / float(nt)
            ent = 0.0 - float((p * np.log2(p)).sum()) + 0.0
            top = g.sort_values(["n", "event_type"],
                                ascending=[False, True],
                                kind="mergesort").iloc[0]["event_type"]
            rows.append((int(uid), int(nt), len(g), top,
                         np.round(ent, 6) + 0.0))
        if not rows:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "n_types": pd.Series([], dtype="int64"),
                "top_type": pd.Series([], dtype="object"),
                "type_entropy": pd.Series([], dtype="float64"),
            })
        return pd.DataFrame(rows, columns=[
            "user_id", "n_events", "n_types", "top_type", "type_entropy"
        ]).astype({
            "user_id": "int64", "n_events": "int64", "n_types": "int64",
        })

    return bucketed_group_apply(parts, ["user_id"], per_user,
                                n_buckets=n_buckets)


USER_TYPE_ENTROPY_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
),
t AS (SELECT user_id, SUM(n) AS nt, COUNT(*) AS k FROM c GROUP BY 1),
r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
  FROM c
)
SELECT CAST(c.user_id AS BIGINT) AS user_id,
       CAST(ANY_VALUE(t.nt) AS BIGINT) AS n_events,
       CAST(ANY_VALUE(t.k) AS BIGINT) AS n_types,
       ANY_VALUE(r.event_type) AS top_type,
       ROUND(0.0 - SUM((c.n / t.nt) * log2(c.n / t.nt)), 6) + 0.0
         AS type_entropy
FROM c
JOIN t ON t.user_id = c.user_id
JOIN r ON r.user_id = c.user_id AND r.rk = 1
GROUP BY c.user_id
"""


def transition_entropy(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-from-type PREDICTABILITY of the next event: Shannon entropy of
    the Markov next-type row (0 = the next event is fully determined,
    ~log2(k) = anything can follow) plus the most likely successor — the
    one-number summary a journey designer reads off ``event_markov``'s
    full matrix. Consecutive pairs come from the same per-user ordered
    stream as ``event_markov``; entropy summands are bounded by the type
    cardinality, rounded 6, ``+ 0.0`` -0.0 fold; top-successor ties break
    lexicographic. Output: from_type, n_pairs, top_next, next_entropy."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["user_id", "ts", "event_id"],
                               kind="mergesort")
        nxt = d.groupby(d["user_id"], sort=False)["event_type"].shift(-1)
        k = nxt.notna()
        g = pd.DataFrame({
            "from_type": d["event_type"][k],
            "to_type": nxt[k],
        }).groupby(["from_type", "to_type"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    pair_counts = bucketed_group_apply(
        events.select_columns(["user_id", "event_id", "ts", "event_type"]),
        ["user_id"],
        pairs_in_bucket,
        n_buckets=n_buckets,
    )

    def per_from(bucket: pd.DataFrame) -> pd.DataFrame:
        c = bucket.groupby(["from_type", "to_type"], sort=False)["n"].sum()\
            .reset_index()
        rows = []
        for ft, g in c.groupby("from_type", sort=False):
            n = g["n"].to_numpy(dtype="int64")
            nt = n.sum()
            p = n.astype("float64") / float(nt)
            ent = 0.0 - float((p * np.log2(p)).sum()) + 0.0
            top = g.sort_values(["n", "to_type"], ascending=[False, True],
                                kind="mergesort").iloc[0]["to_type"]
            rows.append((ft, int(nt), top, np.round(ent, 6) + 0.0))
        if not rows:
            return pd.DataFrame({
                "from_type": pd.Series([], dtype="object"),
                "n_pairs": pd.Series([], dtype="int64"),
                "top_next": pd.Series([], dtype="object"),
                "next_entropy": pd.Series([], dtype="float64"),
            })
        return pd.DataFrame(rows, columns=[
            "from_type", "n_pairs", "top_next", "next_entropy"
        ]).astype({"n_pairs": "int64"})

    return bucketed_group_apply(pair_counts, ["from_type"], per_from,
                                n_buckets=4)


TRANSITION_ENTROPY_SQL = """
WITH s AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM s WHERE to_type IS NOT NULL GROUP BY from_type, to_type
),
t AS (SELECT from_type, SUM(n) AS nt FROM c GROUP BY from_type),
r AS (
  SELECT from_type, to_type,
         ROW_NUMBER() OVER (
           PARTITION BY from_type ORDER BY n DESC, to_type) AS rk
  FROM c
)
SELECT c.from_type,
       CAST(ANY_VALUE(t.nt) AS BIGINT) AS n_pairs,
       ANY_VALUE(r.to_type) AS top_next,
       ROUND(0.0 - SUM((c.n / t.nt) * log2(c.n / t.nt)), 6) + 0.0
         AS next_entropy
FROM c
JOIN t ON t.from_type = c.from_type
JOIN r ON r.from_type = c.from_type AND r.rk = 1
GROUP BY c.from_type
"""


def value_benford(events: ray.data.Dataset) -> ray.data.Dataset:
    """First-digit Benford profile of the event value column — the
    data-forensics screen (organic monetary values track
    log10(1 + 1/d); flat or spiked leading digits flag synthetic or
    capped data). Digit comes from the EXACT cents integer (never float
    formatting); zero/negative/null values drop (stated contract). The
    observed share is one division of exact ints and the expected share
    one libm call, both rounded 6. One combiner pass + a 9-row reduce.
    Output: digit, n_values, share, benford_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"]
        k = v.notna()
        cents = cents_i64(v[k])
        cents = cents[cents > 0]
        if not len(cents):
            return pd.DataFrame({
                "digit": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            })
        first = pd.Series(cents).astype(str).str[0].astype("int64")
        g = first.groupby(first, sort=False).size()
        return pd.DataFrame({
            "digit": g.index.astype("int64"),
            "n": g.to_numpy().astype("int64"),
        })

    parts = events.select_columns(["value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("digit", sort=False)["n"].sum().reset_index()
        tot = float(g["n"].sum())
        d = g["digit"].astype("int64").to_numpy()
        return pd.DataFrame({
            "digit": d,
            "n_values": g["n"].astype("int64"),
            "share": np.round(g["n"].to_numpy(dtype="float64") / tot, 6),
            "benford_share": np.round(np.log10(1.0 + 1.0 / d), 6),
        })

    # 9 possible digits -> single-bucket final reduce (needs the global
    # total for the share)
    keyed = parts.map_batches(
        lambda b: b.assign(k=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["k"], lambda b: merge(b.drop(columns=["k"])), n_buckets=1
    )


VALUE_BENFORD_SQL = """
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND ROUND(value * 100) > 0
),
c AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         COUNT(*) AS n
  FROM v GROUP BY 1
)
SELECT digit, CAST(n AS BIGINT) AS n_values,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share,
       ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_share
FROM c
"""


def conversion_lag(
    events: ray.data.Dataset,
    first_type: str = "signup",
    then_type: str = "purchase",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Signup-to-purchase CONVERSION LAG summary: across users whose first
    ``first_type`` precedes (or ties) some ``then_type``, the
    time-to-convert distribution — n_signup_users, n_converted,
    conversion_rate, min/max/half-up-mean lag in exact whole SECONDS (the
    ``user_burstiness`` epoch-second truncation; one row). Per-user first
    timestamps are min-reductions inside one user-keyed shuffle; the
    summary fold is a combiner (min/max/sum/count partials). Rate and
    mean are the house one-division / half-up-integer rules.
    Output: n_signup_users, n_converted, conversion_rate, min_lag_s,
    max_lag_s, avg_lag_s."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        es = (
            pd.to_datetime(bucket["ts"]).astype("datetime64[us]")
            .astype("int64") // 1_000_000
        )
        d = pd.DataFrame({
            "user_id": bucket["user_id"].astype("int64"),
            "es": es,
            "t": bucket["event_type"],
        })
        s = d[d["t"] == first_type].groupby("user_id", sort=False)["es"]\
            .min()
        if not len(s):
            return pd.DataFrame({
                "n_signup": pd.Series([], dtype="int64"),
                "n_conv": pd.Series([], dtype="int64"),
                "mn": pd.Series([], dtype="int64"),
                "mx": pd.Series([], dtype="int64"),
                "sm": pd.Series([], dtype="int64"),
            })
        p = d[d["t"] == then_type].merge(
            s.rename("s0"), left_on="user_id", right_index=True
        )
        p = p[p["es"] >= p["s0"]]
        lag = (p["es"] - p["s0"]).groupby(p["user_id"], sort=False).min()
        if len(lag):
            out = (len(s), len(lag), int(lag.min()), int(lag.max()),
                   int(lag.sum()))
        else:
            # no converter in this bucket: poison min with int64 max so the
            # final min-merge ignores it (n_conv 0 guards the read-out)
            out = (len(s), 0, np.iinfo("int64").max, np.int64(-1), 0)
        return pd.DataFrame([out],
                            columns=["n_signup", "n_conv", "mn", "mx", "sm"])

    parts = bucketed_group_apply(
        events.select_columns(["user_id", "ts", "event_type"]),
        ["user_id"],
        per_user,
        n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        ns = int(bucket["n_signup"].sum())
        nc = int(bucket["n_conv"].sum())
        if nc:
            mn = int(bucket["mn"].min())
            mx = int(bucket["mx"].max())
            sm = int(bucket["sm"].sum())
            avg = (2 * sm + nc) // (2 * nc)
        else:
            mn = mx = avg = 0
        return pd.DataFrame({
            "n_signup_users": [np.int64(ns)],
            "n_converted": [np.int64(nc)],
            "conversion_rate": [np.round(nc / ns, 6) if ns else 0.0],
            "min_lag_s": [np.int64(mn)],
            "max_lag_s": [np.int64(mx)],
            "avg_lag_s": [np.int64(avg)],
        })

    keyed = parts.map_batches(
        lambda b: b.assign(kk=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["kk"], lambda b: final(b.drop(columns=["kk"])), n_buckets=1
    )


def conversion_lag_sql(first_type: str = "signup",
                       then_type: str = "purchase") -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
s AS (
  SELECT user_id, MIN(es) AS s0 FROM e
  WHERE event_type = '{first_type}' GROUP BY user_id
),
lag AS (
  SELECT s.user_id, MIN(e.es - s.s0) AS lag
  FROM s JOIN e ON e.user_id = s.user_id
  WHERE e.event_type = '{then_type}' AND e.es >= s.s0
  GROUP BY s.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_signup_users,
       CAST(COUNT(lag.user_id) AS BIGINT) AS n_converted,
       ROUND(CAST(COUNT(lag.user_id) AS DOUBLE)
             / (SELECT COUNT(*) FROM s), 6) AS conversion_rate,
       CAST(COALESCE(MIN(lag), 0) AS BIGINT) AS min_lag_s,
       CAST(COALESCE(MAX(lag), 0) AS BIGINT) AS max_lag_s,
       CAST(COALESCE((2 * SUM(lag) + COUNT(*)) // (2 * COUNT(*)), 0)
            AS BIGINT) AS avg_lag_s
FROM lag
"""


def dow_profile(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Per-type day-of-week seasonality: counts and within-type share per
    ISO weekday (1 = Monday .. 7 = Sunday) — the weekly cycle companion to
    ``hourly_profile``'s daily cycle (batch jobs spike Mondays, organic
    traffic sags weekends; a flat row is a bot). pandas ``dayofweek``
    (Mon=0) + 1 equals DuckDB ``isodow`` exactly. Counts exact; share one
    division, rounded 6. Output: event_type, dow, n_events, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        dow = (
            pd.to_datetime(batch["ts"]).dt.dayofweek + 1
        ).astype("int64")
        g = pd.DataFrame({"event_type": batch["event_type"], "dow": dow})\
            .groupby(["event_type", "dow"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = events.select_columns(["ts", "event_type"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["event_type", "dow"], sort=False)["n"].sum()\
            .reset_index()
        tot = g.groupby("event_type", sort=False)["n"].transform("sum")
        return pd.DataFrame({
            "event_type": g["event_type"],
            "dow": g["dow"].astype("int64"),
            "n_events": g["n"].astype("int64"),
            "share": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["event_type"], merge,
                                n_buckets=n_buckets)


DOW_PROFILE_SQL = """
WITH c AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow, COUNT(*) AS n
  FROM events GROUP BY event_type, isodow(ts)
)
SELECT event_type, dow, CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type), 6)
         AS share
FROM c
"""


def zscore_days(
    events: ray.data.Dataset, z_cut: float = 2.0, n_buckets: int = 8
) -> ray.data.Dataset:
    """Global daily-volume anomaly days: days whose event count sits more
    than ``z_cut`` population standard deviations from the all-days mean —
    the corpus-level outage/spike detector next to the per-user
    ``user_value_anomalies``. Day counts reduce exactly (combiner); the
    mean/variance come from EXACT integer sufficient statistics over the
    day-count table (n, Σc, Σc² — Python-int composites, HUGEINT-equal),
    and the z comparison is ONE shared double expression both sides
    ((n·c − Σc)² > z²·n·(n·Σc² − Σc²tot) in exact ints... kept as the
    literal double form (c − μ)² · n² > z² · n · D to stay readable —
    both sides compute it identically). Output: day ('YYYY-MM-DD'),
    n_events, z (round 6)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m-%d")
        s = day.groupby(day, sort=False).size()
        return pd.DataFrame({
            "day": s.index,
            "n": s.to_numpy().astype("int64"),
        })

    day_counts = bucketed_group_apply(
        events.select_columns(["ts"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["day"],
        lambda b: b.groupby("day", sort=False)["n"].sum().reset_index(),
        n_buckets=n_buckets,
    ).materialize()  # consumed by the stats fold AND the z filter

    # day-bounded scalars: exact Python-int sufficient statistics
    parts = day_counts.map_batches(
        lambda b: pd.DataFrame({
            "k": [np.int64(len(b))],
            "s1": [np.int64(b["n"].sum())],
            "s2": [np.int64((b["n"].astype("int64") ** 2).sum())],
        }),
        batch_format="pandas",
    ).to_pandas()
    k = int(parts["k"].sum())
    s1 = sum(int(x) for x in parts["s1"])
    s2 = sum(int(x) for x in parts["s2"])
    if k < 2:
        return ray.data.from_pandas(pd.DataFrame({
            "day": pd.Series([], dtype="object"),
            "n_events": pd.Series([], dtype="int64"),
            "z": pd.Series([], dtype="float64"),
        }))
    d_comp = k * s2 - s1 * s1  # n·variance·n, exact

    import math
    mu = s1 / k
    sd = math.sqrt(float(d_comp)) / k
    zc = float(z_cut)

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["n"].astype("int64").to_numpy()
        z = (c - mu) / sd
        keep = np.abs(z) > zc
        return pd.DataFrame({
            "day": batch["day"].to_numpy()[keep],
            "n_events": c[keep],
            "z": np.round(z[keep], 6),
        })

    return day_counts.map_batches(flag, batch_format="pandas",
                                  batch_size=65536)


ZSCORE_DAYS_SQL_TEMPLATE = """
WITH c AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
s AS (
  SELECT COUNT(*) AS k, SUM(n) AS s1, SUM(n * n) AS s2 FROM c
)
SELECT c.day, CAST(c.n AS BIGINT) AS n_events,
       ROUND((c.n - CAST(s.s1 AS DOUBLE) / s.k)
             / (SQRT(CAST(s.k * s.s2 - s.s1 * s.s1 AS DOUBLE)) / s.k), 6)
         AS z
FROM c, s
WHERE ABS((c.n - CAST(s.s1 AS DOUBLE) / s.k)
          / (SQRT(CAST(s.k * s.s2 - s.s1 * s.s1 AS DOUBLE)) / s.k))
      > {z_cut}
"""


def dow_hour_matrix(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Weekday × hour traffic CALENDAR HEATMAP: event count and exact-cent
    value total per (isodow, hour) cell — the cross product of
    ``dow_profile``'s weekly cycle and ``hourly_profile``'s daily cycle
    (capacity planners read the peak cell; the weekend-night cell is the
    bot-traffic tell). 168 cells max — a bounded rollup; counts and cents
    reduce exactly (``cents_i64`` — value is 2-dp by corpus contract), the
    cell share is one division rounded 6. pandas ``dayofweek`` (Mon=0) + 1
    == DuckDB ``isodow``. Output: dow, hour, n_events, value_sum, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import (
        cents_i64,
        money_from_cents,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(batch["ts"])
        g = pd.DataFrame({
            "dow": (ts.dt.dayofweek + 1).astype("int64"),
            "hour": ts.dt.hour.astype("int64"),
            "n": np.int64(1),
            "cents": cents_i64(batch["value"]),
        }).groupby(["dow", "hour"], sort=False).sum().reset_index()
        return g

    parts = events.select_columns(["ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["dow", "hour"], sort=False).sum().reset_index()
        n_tot = int(g["n"].sum())
        return pd.DataFrame({
            "dow": g["dow"].astype("int64"),
            "hour": g["hour"].astype("int64"),
            "n_events": g["n"].astype("int64"),
            "value_sum": [money_from_cents(c) for c in g["cents"]],
            "share": np.round(
                g["n"].to_numpy(dtype="float64") / float(n_tot), 6
            ),
        })

    # ONE bucket: the share denominator is the global count and the cell
    # space is <= 168 rows — partials are already cell-level combiners, so
    # the single merge task sees at most (tasks × 168) tiny rows.
    return bucketed_group_apply(parts, ["dow"], merge, n_buckets=1)


DOW_HOUR_MATRIX_SQL = """
WITH c AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hour,
         COUNT(*) AS n,
         SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT dow, hour, CAST(n AS BIGINT) AS n_events,
       CAST(cents AS DOUBLE) / 100.0 AS value_sum,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6) AS share
FROM c
"""


def cusum_days(
    events: ray.data.Dataset,
    lam_num: int = 1,
    lam_den: int = 20,
    n_buckets: int = 8,
) -> ray.data.Dataset:
    """One-sided CUSUM drift detector over the daily event-count series —
    the change-point companion to ``zscore_days`` (z flags single spikes;
    CUSUM accumulates small sustained upward drift that no single day
    trips). Exact integers throughout: with n_tot = Σc and n_days = #days,
    the statistic is scaled by n_days so the mean needs no division —
    S_i = max(0, S_{i-1} + (c_i·n_days − n_tot)) — and the alarm fires when
    S_i exceeds λ·n_tot·n_days (λ = lam_num/lam_den, cross-multiplied:
    lam_den·S_i > lam_num·n_tot·n_days). Day counts reduce through the
    bucketed combiner; ONLY the per-day frame — bounded by the calendar
    span, the documented ``zscore_days``/Pareto driver bound — collects for
    the inherently sequential scan (a recursive order-dependent recurrence;
    Page 1954 — public). S stays under n_tot·n_days ≈ 4e12 at 1e9 rows ×
    10 years — int64-safe; the driver scan runs in Python ints regardless.
    Output: day, n_events, cusum_scaled, alarm (0/1)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m-%d")
        s = day.groupby(day, sort=False).size()
        return pd.DataFrame({
            "day": s.index,
            "n": s.to_numpy().astype("int64"),
        })

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("day", sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    per_day = bucketed_group_apply(
        events.select_columns(["ts"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["day"],
        merge,
        n_buckets=n_buckets,
    ).to_pandas()  # bounded by calendar span (documented driver bound)

    per_day = per_day.sort_values("day").reset_index(drop=True)
    counts = [int(x) for x in per_day["n"]]
    n_tot, n_days = sum(counts), len(counts)
    thresh = lam_num * n_tot * n_days
    s, cus, alarm = 0, [], []
    for c in counts:
        s = max(0, s + c * n_days - n_tot)
        cus.append(s)
        alarm.append(1 if lam_den * s > thresh else 0)
    out = pd.DataFrame({
        "day": per_day["day"],
        "n_events": per_day["n"].astype("int64"),
        "cusum_scaled": pd.Series(cus, dtype="int64"),
        "alarm": pd.Series(alarm, dtype="int64"),
    })
    return ray.data.from_pandas(out)


CUSUM_DAYS_SQL_TEMPLATE = """
WITH RECURSIVE dc AS MATERIALIZED (
  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
tot AS (SELECT SUM(c) AS nt, COUNT(*) AS nd FROM dc),
o AS (SELECT day, c, ROW_NUMBER() OVER (ORDER BY day) AS i FROM dc),
s(i, day, c, t) AS (
  SELECT o.i, o.day, o.c,
         GREATEST(CAST(0 AS HUGEINT), o.c * tot.nd - tot.nt)
  FROM o, tot WHERE o.i = 1
  UNION ALL
  SELECT o.i, o.day, o.c,
         GREATEST(CAST(0 AS HUGEINT), s.t + o.c * tot.nd - tot.nt)
  FROM s JOIN o ON o.i = s.i + 1, tot
)
SELECT s.day, CAST(s.c AS BIGINT) AS n_events,
       CAST(s.t AS BIGINT) AS cusum_scaled,
       CAST(CASE WHEN {lam_den} * s.t > {lam_num} * tot.nt * tot.nd
                 THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM s, tot
"""


def value_by_dow(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Event VALUE by ISO weekday: count, exact-cent total and HALF-UP cent
    mean per dow — the revenue-weighted companion to ``dow_profile``'s
    count-only cycle (weekend rows can be few but fat; a mean that moves
    against count is a mix shift, not a volume shift). Cents reduce exactly
    (``cents_i64``); the mean is the house half-up integer division
    (2s + n) // (2n) in cents — never a float divide that could land on a
    representability boundary. Output: dow, n_events, value_sum,
    value_avg."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "dow": (pd.to_datetime(batch["ts"]).dt.dayofweek + 1)
            .astype("int64"),
            "n": np.int64(1),
            "cents": cents_i64(batch["value"]),
        })
        return d.groupby("dow", sort=False).sum().reset_index()

    parts = events.select_columns(["ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("dow", sort=False).sum().reset_index()
        rows = []
        for _, r in g.iterrows():
            n, s = int(r["n"]), int(r["cents"])  # Python ints: exact
            avg_c = (2 * s + n) // (2 * n)       # half-up cents
            rows.append((int(r["dow"]), n, s / 100.0, avg_c / 100.0))
        return pd.DataFrame(
            rows, columns=["dow", "n_events", "value_sum", "value_avg"]
        ).astype({"dow": "int64", "n_events": "int64"})

    return bucketed_group_apply(parts, ["dow"], merge, n_buckets=n_buckets)


VALUE_BY_DOW_SQL = """
WITH s AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS dow, COUNT(*) AS n,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
)
SELECT dow, CAST(n AS BIGINT) AS n_events,
       CAST(cents AS DOUBLE) / 100.0 AS value_sum,
       CAST((2 * cents + n) // (2 * n) AS DOUBLE) / 100.0 AS value_avg
FROM s
"""


def round_value_bias(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """ROUND-NUMBER bias per event type: the share of values landing on
    whole dollars (cents % 100 == 0) and on whole ten-cent marks — human
    hands type round numbers, organic measurements don't, so a type whose
    round-dollar share dwarfs the ~1% base rate is manual entry or fraud
    pressure (the digit-psychology companion to ``value_benford``'s
    leading-digit test). cents are exact (2-dp contract); counts pure-int
    combiners; shares one division each, rounded 6. Output: event_type,
    n_events, n_round_dollar, dollar_share, n_round_dime, dime_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = cents_i64(batch["value"])
        d = pd.DataFrame({
            "event_type": batch["event_type"],
            "n": np.int64(1),
            "nd": (c % 100 == 0).astype("int64"),
            "nt": (c % 10 == 0).astype("int64"),
        })
        return d.groupby("event_type", sort=False).sum().reset_index()

    parts = events.select_columns(["event_type", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False).sum().reset_index()
        n = g["n"].to_numpy(dtype="float64")
        return pd.DataFrame({
            "event_type": g["event_type"],
            "n_events": g["n"].astype("int64"),
            "n_round_dollar": g["nd"].astype("int64"),
            "dollar_share": np.round(
                g["nd"].to_numpy(dtype="float64") / n, 6),
            "n_round_dime": g["nt"].astype("int64"),
            "dime_share": np.round(
                g["nt"].to_numpy(dtype="float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["event_type"], merge,
                                n_buckets=n_buckets)


ROUND_VALUE_BIAS_SQL = """
WITH c AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (cents % 100 = 0) AS BIGINT)
         AS n_round_dollar,
       ROUND(CAST(COUNT(*) FILTER (cents % 100 = 0) AS DOUBLE)
             / COUNT(*), 6) AS dollar_share,
       CAST(COUNT(*) FILTER (cents % 10 = 0) AS BIGINT) AS n_round_dime,
       ROUND(CAST(COUNT(*) FILTER (cents % 10 = 0) AS DOUBLE)
             / COUNT(*), 6) AS dime_share
FROM c GROUP BY event_type
"""


def gap_hist(events: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """Per-type INTER-ARRIVAL HISTOGRAM: log2-binned distribution of the
    gap (whole seconds) between consecutive same-type events of the SAME
    user — the full cadence spectrum behind ``interarrival_stats``' four
    summary numbers (bimodality here is the bot tell: machine retries pile
    in the second-scale bins while humans sit at minutes+). Gaps come from
    the same (user, type)-keyed in-group shift, floored to exact integer
    seconds (µs // 1_000_000); zero-second gaps land in their own bin -1.
    Pure-int combiner rollup; share one division rounded 6. Output:
    event_type, bin, min_gap_s, n_gaps, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["user_id", "event_type", "ts", "event_id"])
        us = d["ts"].astype("datetime64[us]").astype("int64")
        same = (
            (d["user_id"] == d["user_id"].shift())
            & (d["event_type"] == d["event_type"].shift())
        ).to_numpy()
        gap_s = (us.to_numpy() - np.roll(us.to_numpy(), 1)) // 1_000_000
        g = pd.DataFrame({
            "event_type": d["event_type"].to_numpy()[same],
            "gs": gap_s[same],
        })
        g["bin"] = [
            int(x).bit_length() - 1 if x > 0 else -1 for x in g["gs"]
        ]
        out = g.groupby(["event_type", "bin"], sort=False).size()\
            .reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        out["bin"] = out["bin"].astype("int64")
        return out

    parts = bucketed_group_apply(
        events.select_columns(["user_id", "event_type", "ts", "event_id"]),
        ["user_id"],
        per_user,
        n_buckets=n_buckets,
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["event_type", "bin"], sort=False)["n"].sum()\
            .reset_index()
        tot = g.groupby("event_type", sort=False)["n"].transform("sum")
        b = g["bin"].to_numpy()
        return pd.DataFrame({
            "event_type": g["event_type"],
            "bin": g["bin"].astype("int64"),
            "min_gap_s": np.where(b < 0, np.int64(0),
                                  np.int64(1) << np.maximum(b, 0))
            .astype("int64"),
            "n_gaps": g["n"].astype("int64"),
            "share": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["event_type"], merge, n_buckets=4)


GAP_HIST_SQL = """
WITH g AS (
  SELECT event_type,
         date_diff('microsecond',
                   LAG(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id),
                   ts) // 1000000 AS gs
  FROM events
),
b AS (
  SELECT event_type,
         CASE WHEN gs > 0 THEN CAST(floor(log2(gs)) AS BIGINT)
              ELSE -1 END AS bin
  FROM g WHERE gs IS NOT NULL
),
c AS (SELECT event_type, bin, COUNT(*) AS n FROM b GROUP BY 1, 2)
SELECT event_type, bin,
       CAST(CASE WHEN bin < 0 THEN 0
                 ELSE POWER(2, bin) END AS BIGINT) AS min_gap_s,
       CAST(n AS BIGINT) AS n_gaps,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type), 6)
         AS share
FROM c
"""


def user_activity_hist(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """USER ACTIVITY spectrum: log2 histogram of events-per-user — the
    one-screen answer to "is traffic a long tail of lurkers or a few
    whales?" that sizes every per-user shuffle downstream (the tail bin IS
    the whale-key exposure ``salted_group_apply`` exists for). Per-user
    counts reduce user-bucketed; the count-of-counts fold and event-mass
    column are exact ints; share one division rounded 6. Output: bin,
    min_events, n_users, n_events, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["user_id"].groupby(batch["user_id"], sort=False).size()
        return pd.DataFrame({
            "user_id": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    parts = events.select_columns(["user_id"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("user_id", sort=False)["n"].sum()
        c = g.to_numpy(dtype="int64")
        bins = np.array([int(x).bit_length() - 1 for x in c], dtype="int64")
        d = pd.DataFrame({
            "bin": bins,
            "n_users": np.int64(1),
            "n_events": c,
        })
        return d.groupby("bin", sort=False).sum().reset_index()

    mid = bucketed_group_apply(parts, ["user_id"], per_user,
                               n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False).sum().reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        tot = float(g["n_users"].sum())
        return pd.DataFrame({
            "bin": g["bin"],
            "min_events": (np.int64(1) << g["bin"].to_numpy())
            .astype("int64"),
            "n_users": g["n_users"],
            "n_events": g["n_events"],
            "share": np.round(
                g["n_users"].to_numpy(dtype="float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["bin"], merge, n_buckets=1)


USER_ACTIVITY_HIST_SQL = """
WITH u AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
b AS (SELECT CAST(floor(log2(c)) AS BIGINT) AS bin, c FROM u)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_events,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(c) AS BIGINT) AS n_events,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6) AS share
FROM b GROUP BY bin
"""


def value_median_by_type(
    events: ray.data.Dataset,
    qs: tuple = (0.5, 0.9),
    collect_budget: int = 65536,
) -> ray.data.Dataset:
    """Per-TYPE exact value quantiles — ``value_quantiles``' grouped form
    (which type's spend distribution is heavy-tailed, not just the global
    mix). The event-type set is enum-bounded, so the op collects the
    distinct types (tiny driver frame) and runs one histogram-refinement
    descent (functions/quantile.py — bounded driver memory at any corpus
    size) per type over the filtered stream: |types| × O(log) scans of one
    pre-filtered, materialized two-column projection. If the type set ever
    grew unbounded, the documented fusion is a grouped descent sharing one
    _hist_counts pass per refinement round. Interpolation is
    QUANTILE_CONT-identical; np.round 6. Output: event_type, n_valued,
    p50, p90."""
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["value"].notna()]
        return pd.DataFrame({
            "event_type": d["event_type"], "value": d["value"],
        })

    # materialize: consumed once for the type list then |types| times by
    # the descents — without it the upstream read re-executes per consumer
    base = events.map_batches(
        keep, batch_format="pandas", batch_size=65536
    ).materialize()

    types = sorted(
        base.map_batches(
            lambda b: pd.DataFrame({"t": b["event_type"].unique()}),
            batch_format="pandas",
        ).to_pandas()["t"].unique()
    )

    rows = []
    for t in types:
        sub = base.map_batches(
            lambda b, t=t: pd.DataFrame(
                {"value": b.loc[b["event_type"] == t, "value"]}
            ),
            batch_format="pandas", batch_size=65536,
        )
        n, qv = exact_global_quantiles(
            sub, "value", list(qs), collect_budget
        )
        rows.append(
            (t, n) + tuple(float(np.round(qv[q], 6)) for q in qs)
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "n_valued"]
        + [f"p{int(q * 100)}" for q in qs]
    )
    out["n_valued"] = out["n_valued"].astype("int64")
    return ray.data.from_pandas(out)


VALUE_MEDIAN_BY_TYPE_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_valued,
       ROUND(QUANTILE_CONT(value, 0.5), 6) AS p50,
       ROUND(QUANTILE_CONT(value, 0.9), 6) AS p90
FROM events WHERE value IS NOT NULL GROUP BY event_type
"""


def active_days_hist(
    events: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """Distinct ACTIVE DAYS per user, rolled into a corpus histogram —
    the calendar-habit companion to ``user_activity_hist``'s raw event
    counts (100 events in one day and 100 days of one event are different
    users). (user, day) dedups exactly per batch then once more in the
    user-bucketed reduce; the day count per user is order-free; the final
    count-of-counts exchange is bounded by the distinct day-count values.
    Output: n_days, n_users, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "day": pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m-%d"),
        })
        return d.drop_duplicates()

    parts = events.select_columns(["user_id", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("user_id", sort=False)["day"].nunique()
        s = g.groupby(g, sort=False).size()
        return pd.DataFrame({
            "n_days": s.index.to_numpy().astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["user_id"], per_user,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("n_days", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "n_days": g.index.to_numpy().astype("int64"),
            "n_users": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["n_days"], final, n_buckets=1)


ACTIVE_DAYS_HIST_SQL = """
WITH u AS (
  SELECT user_id, COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days
  FROM events GROUP BY user_id
),
h AS (SELECT n_days, COUNT(*) AS n FROM u GROUP BY n_days)
SELECT CAST(n_days AS BIGINT) AS n_days, CAST(n AS BIGINT) AS n_users,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""


def night_share_hist(
    events: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """NIGHT-OWL segmentation: per user, the share of events landing in
    the night hours (before 06:00 or from 22:00), binned into ten
    pure-integer deciles and rolled into a user histogram — the
    behavioural-mix companion to ``dow_profile``'s corpus clock (a bot
    farm shows up as a spike at decile 9). Per-user (night, total)
    counts are order-free sums; the bin is ``min(10*night // total, 9)``
    (never a float ratio); the count-of-counts fold bounds the final
    exchange to ten rows. Output: bin, lo, n_users, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.to_datetime(batch["ts"]).dt.hour
        night = ((h < 6) | (h >= 22)).astype("int64")
        g = night.groupby(batch["user_id"], sort=False)\
            .agg(["size", "sum"])
        return pd.DataFrame({
            "user_id": g.index.astype("int64"),
            "n": g["size"].to_numpy().astype("int64"),
            "night": g["sum"].to_numpy().astype("int64"),
        })

    parts = events.select_columns(["user_id", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("user_id", sort=False)[["n", "night"]].sum()
        b = np.minimum(
            10 * g["night"].to_numpy(dtype="int64")
            // g["n"].to_numpy(dtype="int64"),
            9,
        )
        s = pd.Series(b).groupby(b).size()
        return pd.DataFrame({
            "bin": s.index.to_numpy().astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["user_id"], per_user,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "bin": g.index.to_numpy().astype("int64"),
            "lo": np.round(g.index.to_numpy().astype("float64") / 10.0, 1),
            "n_users": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["bin"], final, n_buckets=1)


NIGHT_SHARE_HIST_SQL = """
WITH u AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(CASE WHEN date_part('hour', ts) < 6
                    OR date_part('hour', ts) >= 22
                  THEN 1 ELSE 0 END) AS night
  FROM events GROUP BY user_id
),
h AS (
  SELECT LEAST(10 * night // n, 9) AS bin, COUNT(*) AS nu
  FROM u GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin, ROUND(bin / 10.0, 1) AS lo,
       CAST(nu AS BIGINT) AS n_users,
       ROUND(CAST(nu AS DOUBLE) / SUM(CAST(nu AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""


def null_share_by_type(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """VALUE-missingness by event type — ``clean_missing_stats``' global
    column percentages sliced along the one axis that explains them (a
    type whose value is 100% null is a schema contract, not dirt; a type
    drifting from 0% to 30% is an upstream bug). Per-batch (type,
    nulls, rows) partials bound the exchange to type cardinality; the
    share is one double division rounded 6.
    Output: event_type, n_events, n_null_value, null_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        isnull = batch["value"].isna().astype("int64")
        g = isnull.groupby(batch["event_type"], sort=False)\
            .agg(["size", "sum"])
        return pd.DataFrame({
            "event_type": g.index,
            "n": g["size"].to_numpy().astype("int64"),
            "z": g["sum"].to_numpy().astype("int64"),
        })

    parts = events.select_columns(["event_type", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False)[["n", "z"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        z = g["z"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "event_type": g.index,
            "n_events": n,
            "n_null_value": z,
            "null_share": np.round(z.astype("float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["event_type"], final,
                                n_buckets=1)


NULL_SHARE_BY_TYPE_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_value,
       ROUND(CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS null_share
FROM events GROUP BY event_type
"""


def type_dow_matrix(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Event-type × ISO-WEEKDAY calendar matrix: counts plus each cell's
    share WITHIN its type — ``dow_profile``'s clock split by type (a type
    that only fires on weekdays is a business process; one flat across
    the week is organic traffic). Per-batch (type, dow) partials bound
    the exchange to |types| × 7; the within-type share divides two exact
    ints, rounded 6. Output: event_type, dow, n_events, share_in_type."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        dow = pd.to_datetime(batch["ts"]).dt.dayofweek.astype("int64") + 1
        g = pd.DataFrame({
            "event_type": batch["event_type"], "dow": dow,
        }).groupby(["event_type", "dow"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = events.select_columns(["event_type", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["event_type", "dow"], sort=False)["n"].sum()\
            .reset_index()
        tot = g.groupby("event_type", sort=False)["n"].transform("sum")
        return pd.DataFrame({
            "event_type": g["event_type"],
            "dow": g["dow"].astype("int64"),
            "n_events": g["n"].astype("int64"),
            "share_in_type": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6),
        })

    # ONE bucket: the within-type denominator needs every dow of a type;
    # |types| x 7 rows is constant-size
    return bucketed_group_apply(parts, ["event_type"], final, n_buckets=1)


TYPE_DOW_MATRIX_SQL = """
WITH c AS (
  SELECT event_type, isodow(ts) AS dow, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type), 6)
         AS share_in_type
FROM c
"""


def value_by_activity_band(
    events: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """VALUE share by user-activity band: bucket users into the
    ``user_activity_hist`` log2 event-count bands and report each band's
    share of users AND of total event value — the two-axis inequality
    view (power users being 1% of accounts but 40% of value is the
    number that decides every sampling and rate-limit policy). Per-user
    (count, cents) pairs reduce user-bucketed; band partials bound the
    final exchange; the shares divide exact ints, rounded 6.
    Output: bin, min_events, n_users, value_sum, user_share,
    value_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.where(batch["value"].notna(),
                         cents_i64(batch["value"].fillna(0.0)),
                         np.int64(0))
        g = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64"),
            "n": np.int64(1),
            "cents": cents,
        }).groupby("user_id", sort=False).sum().astype("int64")\
            .reset_index()
        return g

    parts = events.select_columns(["user_id", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("user_id", sort=False)[["n", "cents"]].sum()
        c = g["n"].to_numpy(dtype="int64")
        bins = np.array([int(x).bit_length() - 1 for x in c],
                        dtype="int64")
        d = pd.DataFrame({
            "bin": bins, "n_users": np.int64(1),
            "cents": g["cents"].to_numpy(dtype="int64"),
        })
        return d.groupby("bin", sort=False).sum().reset_index()\
            .astype("int64")

    mid = bucketed_group_apply(parts, ["user_id"], per_user,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)[["n_users", "cents"]].sum()
        nu = g["n_users"].to_numpy(dtype="int64")
        cents = g["cents"].to_numpy(dtype="int64")
        tu = float(nu.sum())
        tc = float(cents.sum())
        b = g.index.to_numpy().astype("int64")
        return pd.DataFrame({
            "bin": b,
            "min_events": (np.int64(1) << b).astype("int64"),
            "n_users": nu,
            "value_sum": cents.astype("float64") / 100.0,
            "user_share": np.round(nu.astype("float64") / tu, 6),
            "value_share": np.round(cents.astype("float64") / tc, 6),
        })

    return bucketed_group_apply(mid, ["bin"], final, n_buckets=1)


VALUE_BY_ACTIVITY_BAND_SQL = """
WITH u AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(CASE WHEN value IS NOT NULL
                  THEN CAST(ROUND(value * 100) AS BIGINT)
                  ELSE 0 END) AS cents
  FROM events GROUP BY user_id
),
b AS (
  SELECT CAST(floor(log2(n)) AS BIGINT) AS bin,
         COUNT(*) AS nu, SUM(cents) AS cents
  FROM u GROUP BY 1
)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_events,
       CAST(nu AS BIGINT) AS n_users,
       CAST(cents AS DOUBLE) / 100.0 AS value_sum,
       ROUND(CAST(nu AS DOUBLE) / SUM(CAST(nu AS DOUBLE)) OVER (), 6)
         AS user_share,
       ROUND(CAST(cents AS DOUBLE)
             / SUM(CAST(cents AS DOUBLE)) OVER (), 6) AS value_share
FROM b
"""


def session_count_sensitivity(
    events: ray.data.Dataset,
    gaps_s: tuple = (900, 1800, 3600),
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """Session-count SENSITIVITY to the gap threshold: total session
    count at several inactivity cutoffs — the calibration table behind
    ``sessionize``'s single ``gap_s`` (if the count swings wildly
    between 15 and 60 minutes the threshold is load-bearing and needs a
    product decision, not a default). User streams co-locate whole in
    user buckets (the sessionize shuffle, run ONCE for all thresholds);
    per bucket each threshold counts boundaries vectorized over the same
    sorted frame; three-row exchange. n_sessions(g) = n_users +
    #(within-user gaps > g). Output: gap_s, n_users, n_sessions."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "ts", "event_id"],
                               kind="mergesort")
        gaps = g["ts"].diff().dt.total_seconds()
        same_user = (g["user_id"] == g["user_id"].shift()).to_numpy()
        nu = int(g["user_id"].nunique())
        rows = []
        for gs in gaps_s:
            nb = int((same_user & (gaps.to_numpy() > gs)).sum())
            rows.append((int(gs), nu, nu + nb))
        return pd.DataFrame(rows, columns=[
            "gap_s", "n_users", "n_sessions"
        ]).astype("int64")

    mid = bucketed_group_apply(
        events.select_columns(["user_id", "ts", "event_id"]),
        ["user_id"], per_bucket, n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("gap_s", sort=False)[
            ["n_users", "n_sessions"]
        ].sum()
        return pd.DataFrame({
            "gap_s": g.index.to_numpy().astype("int64"),
            "n_users": g["n_users"].to_numpy(dtype="int64"),
            "n_sessions": g["n_sessions"].to_numpy(dtype="int64"),
        })

    return bucketed_group_apply(mid, ["gap_s"], final, n_buckets=1)


def session_count_sensitivity_sql(gaps_s: tuple = (900, 1800, 3600)) -> str:
    legs = []
    for gs in gaps_s:
        legs.append(f"""
SELECT {gs} AS gap_s,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT user_id)
            + SUM(CASE WHEN prev_ts IS NOT NULL
                        AND date_diff('microsecond', prev_ts, ts)
                            > CAST({gs} AS BIGINT) * 1000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM g""")
    return (
        """
WITH g AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
)"""
        + "\nUNION ALL".join(legs)
    )


def last_seen_hist(
    events: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """CHURN cohorts: users by the month they were LAST seen —
    ``user_growth``'s mirror image (first-seen says acquisition,
    last-seen says attrition; the rightmost bar is the active base,
    every earlier bar is churn). Per-user max-month partials reduce
    user-bucketed (order-free max over 'YYYY-MM' strings ==
    chronological); the monthly rollup is month-bounded; the share is
    one double division rounded 6. Output: month, n_users_last_seen,
    share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m")
        g = m.groupby(batch["user_id"], sort=False).max()
        return pd.DataFrame({
            "user_id": g.index.astype("int64"),
            "month": g.to_numpy(),
        })

    parts = events.select_columns(["user_id", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("user_id", sort=False)["month"].max()
        s = g.groupby(g, sort=False).size()
        return pd.DataFrame({
            "month": s.index,
            "n": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["user_id"], per_user,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("month", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "month": g.index,
            "n_users_last_seen": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["month"], final, n_buckets=1)


LAST_SEEN_HIST_SQL = """
WITH u AS (
  SELECT user_id, MAX(strftime(ts, '%Y-%m')) AS month
  FROM events GROUP BY user_id
),
h AS (SELECT month, COUNT(*) AS n FROM u GROUP BY month)
SELECT month, CAST(n AS BIGINT) AS n_users_last_seen,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""


def value_sign_audit(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """VALUE-sign audit by type: zero, negative and positive counts of
    the value column — the unit-mixup detector next to
    ``round_value_bias`` (refund types legitimately go negative;
    a page-view type doing so is a sign error upstream). Exact integer
    cents classification per batch; type-bounded exchange; shares round
    6. Output: event_type, n_valued, n_zero, n_negative, neg_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["value"].notna()]
        cents = cents_i64(d["value"])
        g = pd.DataFrame({
            "event_type": d["event_type"],
            "n": np.int64(1),
            "z": (cents == 0).astype("int64"),
            "neg": (cents < 0).astype("int64"),
        }).groupby("event_type", sort=False).sum().reset_index()
        return g.astype({"n": "int64", "z": "int64", "neg": "int64"})

    parts = events.select_columns(["event_type", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False)[["n", "z", "neg"]]\
            .sum()
        n = g["n"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "event_type": g.index,
            "n_valued": n,
            "n_zero": g["z"].to_numpy(dtype="int64"),
            "n_negative": g["neg"].to_numpy(dtype="int64"),
            "neg_share": np.round(
                g["neg"].to_numpy(dtype="float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["event_type"], final,
                                n_buckets=1)


VALUE_SIGN_AUDIT_SQL = """
WITH d AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CASE WHEN cents = 0 THEN 1 ELSE 0 END) AS z,
         SUM(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS neg
  FROM d GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_valued,
       CAST(z AS BIGINT) AS n_zero, CAST(neg AS BIGINT) AS n_negative,
       ROUND(CAST(neg AS DOUBLE) / n, 6) AS neg_share
FROM s
"""


def type_first_seen(
    events: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Schema-evolution ledger: each event type's FIRST and LAST active
    month plus its lifetime event count — the one table that says which
    types are legacy (last seen long ago), which are new (first seen
    recently), and which never stopped. Per-batch (type, min, max,
    count) partials bound the exchange to type cardinality; month
    strings min/max order-free == chronological.
    Output: event_type, first_month, last_month, n_events."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m")
        g = m.groupby(batch["event_type"], sort=False)\
            .agg(["min", "max", "size"])
        return pd.DataFrame({
            "event_type": g.index,
            "first_month": g["min"].to_numpy(),
            "last_month": g["max"].to_numpy(),
            "n": g["size"].to_numpy().astype("int64"),
        })

    parts = events.select_columns(["event_type", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False).agg(
            first_month=("first_month", "min"),
            last_month=("last_month", "max"),
            n=("n", "sum"),
        )
        return pd.DataFrame({
            "event_type": g.index.to_numpy(),
            "first_month": g["first_month"].to_numpy(),
            "last_month": g["last_month"].to_numpy(),
            "n_events": g["n"].to_numpy().astype("int64"),
        })

    return bucketed_group_apply(parts, ["event_type"], final,
                                n_buckets=1)


TYPE_FIRST_SEEN_SQL = """
SELECT event_type,
       MIN(strftime(ts, '%Y-%m')) AS first_month,
       MAX(strftime(ts, '%Y-%m')) AS last_month,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


def late_arrivals(events: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """Per-type LATE-EVENT accounting — the watermarking question a
    streaming ingest asks of a batch corpus: how many events arrive AFTER a
    later-timestamped event of the same user has already been seen, and by
    how much. Arrival order is the md5 digest order of event_id — the
    deterministic stand-in for object-store listing order of an unsorted
    ingest (the testdata is fully time-sorted by event_id, so replay order
    itself would make every lateness 0; digest order models the shuffled
    discovery a real backfill sees). The reference is purely batch (SURVEY
    §2.8: no windows/watermarks); this is the out-of-order profile that
    sizes the allowed-lateness window a streaming re-run would need.

    Shape: one user-keyed shuffle; in-group sort by arrival digest,
    SEGMENTED per-user running-max of ts, late = ts strictly below the
    PRIOR running max; per-(bucket, type) int partials, one tiny per-type
    final sum. Lateness is exact int64 epoch-µs (prev_running_max − ts).
    Output: event_type, n_events, n_late, late_share, max_lateness_us."""
    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_user(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.assign(
            hx=np.asarray(
                md5_hex(bucket["event_id"].astype("int64").astype(str)
                        .to_numpy()),
                dtype="U32",
            )
        ).sort_values(["user_id", "hx"], kind="mergesort")
        us = pd.to_datetime(d["ts"]).astype("datetime64[us]")\
            .astype("int64")
        # per-user running max (cummax is segmented by the groupby — a flat
        # np.maximum.accumulate would carry one user's max into the next)
        run = us.groupby(d["user_id"].to_numpy(), sort=False).cummax()\
            .to_numpy()
        us = us.to_numpy()
        uid = d["user_id"].to_numpy()
        prev = np.empty_like(run)
        prev[1:] = run[:-1]
        prev[0] = np.iinfo("int64").min
        starts = np.empty(len(d), dtype=bool)
        starts[0] = True
        starts[1:] = uid[1:] != uid[:-1]
        prev[starts] = np.iinfo("int64").min
        late = us < prev
        lateness = np.where(late, prev - us, 0)
        g = pd.DataFrame({
            "event_type": d["event_type"].to_numpy(),
            "n": np.int64(1),
            "n_late": late.astype("int64"),
            "lat": lateness.astype("int64"),
        }).groupby("event_type", sort=False).agg(
            n=("n", "sum"), n_late=("n_late", "sum"), lat=("lat", "max")
        ).reset_index()
        for c in ("n", "n_late", "lat"):
            g[c] = g[c].astype("int64")
        return g

    parts = bucketed_group_apply(
        events.select_columns(["event_id", "user_id", "ts", "event_type"]),
        ["user_id"], per_user, n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False).agg(
            n=("n", "sum"), n_late=("n_late", "sum"), lat=("lat", "max")
        )
        n = g["n"].astype("int64").to_numpy()
        nl = g["n_late"].astype("int64").to_numpy()
        return pd.DataFrame({
            "event_type": g.index.to_numpy(),
            "n_events": n,
            "n_late": nl,
            "late_share": np.round(
                nl.astype("float64") / n.astype("float64"), 6
            ),
            "max_lateness_us": g["lat"].astype("int64").to_numpy(),
        })

    return bucketed_group_apply(parts, ["event_type"], final, n_buckets=1)


LATE_ARRIVALS_SQL = """
WITH w AS (
  SELECT event_type, ts,
         MAX(ts) OVER (
           PARTITION BY user_id
           ORDER BY md5(CAST(event_id AS VARCHAR))
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_max
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN ts < prev_max THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       ROUND(
         CAST(SUM(CASE WHEN ts < prev_max THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE), 6
       ) AS late_share,
       CAST(COALESCE(MAX(CASE WHEN ts < prev_max
                    THEN epoch_us(prev_max) - epoch_us(ts) END), 0)
            AS BIGINT) AS max_lateness_us
FROM w GROUP BY event_type
"""


def k_anonymity_audit(
    events: ray.data.Dataset,
    ks: tuple[int, ...] = (2, 5, 10),
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """k-ANONYMITY audit over the quasi-identifier (event_type, weekday,
    hour-of-day): for each k, how many QI equivalence classes have fewer
    than k rows and how many rows sit in them — the re-identification
    exposure the PII scrub (`text_pii_scrub`) does not measure (a scrubbed
    row can still be singled out by its attribute combination).

    Shape: per-batch (QI -> count) partials, one QI-keyed exact count
    reduce, then class sizes cross k thresholds in one tiny final pass
    (class count is bounded by |types| x 7 x 24). Output per k: k,
    n_classes, n_classes_below, n_rows_below, rows_below_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(batch["ts"])
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "dow": t.dt.isocalendar().day.astype("int64").to_numpy(),
            "hour": t.dt.hour.astype("int64").to_numpy(),
        }).groupby(["event_type", "dow", "hour"], sort=False).size()\
            .reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    parts = events.select_columns(["event_type", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    sizes = bucketed_group_apply(
        parts, ["event_type", "dow", "hour"],
        lambda b: b.groupby(["event_type", "dow", "hour"], sort=False)["n"]
        .sum().reset_index(),
        n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        n = bucket["n"].astype("int64").to_numpy()
        total = np.int64(n.sum())
        rows = []
        for k in ks:
            below = n < k
            rows.append({
                "k": np.int64(k),
                "n_classes": np.int64(len(n)),
                "n_classes_below": np.int64(below.sum()),
                "n_rows_below": np.int64(n[below].sum()),
                "rows_below_share": np.round(
                    float(n[below].sum()) / float(total), 6
                ),
            })
        return pd.DataFrame(rows)

    keyed = sizes.map_batches(
        lambda b: b.assign(g=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["g"], lambda b: final(b.drop(columns=["g"])), n_buckets=1
    )


K_ANONYMITY_SQL_TEMPLATE = """
WITH q AS (
  SELECT event_type, isodow(ts) AS dow, hour(ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_classes FROM q),
ks AS (SELECT CAST(unnest([{ks}]) AS BIGINT) AS k)
SELECT ks.k,
       t.n_classes,
       CAST(SUM(CASE WHEN q.n < ks.k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_below,
       CAST(SUM(CASE WHEN q.n < ks.k THEN q.n ELSE 0 END) AS BIGINT)
         AS n_rows_below,
       ROUND(
         CAST(SUM(CASE WHEN q.n < ks.k THEN q.n ELSE 0 END) AS DOUBLE)
         / CAST(t.total AS DOUBLE), 6
       ) AS rows_below_share
FROM ks, q, t
GROUP BY ks.k, t.n_classes, t.total
"""


def latest_state(events: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """CDC UPSERT COMPACTION: per (user_id, event_type) key, the latest
    event's payload under (ts, event_id) ordering — the materialized
    "current state" view a lakehouse table produces when an append-only
    change log is compacted by primary key (the reference's only state
    evolution is file-level replay; this is its keyed-upsert analogue).

    Pure argmax carry-through — no arithmetic touches ``value``, so floats
    pass through bit-exact. Shape: per-batch per-key argmax combiner (at
    most one row per (batch, key) enters the shuffle), one key-bucketed
    final argmax. Output: user_id, event_type, last_event_id, last_ts_us,
    last_value."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def reduce_keys(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch.sort_values(["user_id", "event_type", "us", "event_id"],
                              kind="mergesort")
        return d.groupby(["user_id", "event_type"], sort=False).tail(1)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64").to_numpy(),
            "event_type": batch["event_type"].to_numpy(),
            "event_id": batch["event_id"].astype("int64").to_numpy(),
            "us": pd.to_datetime(batch["ts"]).astype("datetime64[us]")
            .astype("int64").to_numpy(),
            "value": batch["value"].to_numpy(),
        })
        return reduce_keys(d)

    parts = events.select_columns(
        ["user_id", "event_type", "event_id", "ts", "value"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        d = reduce_keys(bucket)
        return pd.DataFrame({
            "user_id": d["user_id"].astype("int64").to_numpy(),
            "event_type": d["event_type"].to_numpy(),
            "last_event_id": d["event_id"].astype("int64").to_numpy(),
            "last_ts_us": d["us"].astype("int64").to_numpy(),
            "last_value": d["value"].to_numpy(),
        })

    return bucketed_group_apply(
        parts, ["user_id", "event_type"], final, n_buckets=n_buckets
    )


LATEST_STATE_SQL = """
SELECT user_id, event_type, event_id AS last_event_id,
       epoch_us(ts) AS last_ts_us, value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
  ) AS rn
  FROM events
) WHERE rn = 1
"""


def ingest_idempotency(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """INGEST IDEMPOTENCY audit over the natural key (user_id, event_type,
    ts): how many natural keys exist, how many collide, how many rows an
    exactly-once re-delivery dedup would drop, and the worst multiplicity
    — the pre-flight question for an at-least-once pipeline whose surrogate
    ``event_id`` is assigned AT ingest (so surrogate uniqueness proves
    nothing about redelivery; `rel_pk_audit` covers the surrogate side).

    Shape: per-batch natural-key count partials, one key-bucketed exact
    reduce folded to int scalar partials, one final sum. Output one row:
    n_rows, n_keys, n_dup_keys, n_dup_rows, max_multiplicity."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64").to_numpy(),
            "event_type": batch["event_type"].to_numpy(),
            "us": pd.to_datetime(batch["ts"]).astype("datetime64[us]")
            .astype("int64").to_numpy(),
        })
        g = d.groupby(["user_id", "event_type", "us"], sort=False).size()\
            .reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    parts = events.select_columns(["user_id", "event_type", "ts"])\
        .map_batches(partial, batch_format="pandas", batch_size=65536)

    def fold_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        n = bucket.groupby(["user_id", "event_type", "us"], sort=False)["n"]\
            .sum().astype("int64").to_numpy()
        return pd.DataFrame({
            "n_rows": [np.int64(n.sum())],
            "n_keys": [np.int64(len(n))],
            "n_dup_keys": [np.int64((n > 1).sum())],
            "n_dup_rows": [np.int64((n[n > 1] - 1).sum())],
            "max_multiplicity": [np.int64(n.max() if len(n) else 0)],
        })

    scalar_parts = bucketed_group_apply(
        parts, ["user_id", "event_type", "us"], fold_bucket,
        n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.sum()
        return pd.DataFrame({
            "n_rows": [np.int64(s["n_rows"])],
            "n_keys": [np.int64(s["n_keys"])],
            "n_dup_keys": [np.int64(s["n_dup_keys"])],
            "n_dup_rows": [np.int64(s["n_dup_rows"])],
            "max_multiplicity": [np.int64(bucket["max_multiplicity"].max())],
        })

    keyed = scalar_parts.map_batches(
        lambda b: b.assign(g=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["g"], lambda b: final(b.drop(columns=["g"])), n_buckets=1
    )


INGEST_IDEMPOTENCY_SQL = """
WITH k AS (
  SELECT user_id, event_type, ts, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
       CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
         AS n_dup_rows,
       CAST(MAX(n) AS BIGINT) AS max_multiplicity
FROM k
"""


def l_diversity_audit(
    events: ray.data.Dataset,
    ls: tuple[int, ...] = (2, 3, 5),
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """l-DIVERSITY audit — the companion to ``k_anonymity_audit``: a QI
    class can be large (k-anonymous) yet still leak if every row in it
    belongs to the SAME sensitive subject. Sensitive attribute = user_id;
    QI = (event_type, weekday, hour-of-day). For each l, how many classes
    have fewer than l distinct users and how many rows sit in them.

    Shape: per-batch distinct (QI, user) partials with row counts, one
    QI+user-keyed exact reduce, per-class diversity in a second bounded
    reduce (classes ≤ |types| x 7 x 24), thresholds in one tiny final
    pass. Output per l: l, n_classes, n_classes_below, n_rows_below,
    rows_below_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(batch["ts"])
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "dow": t.dt.isocalendar().day.astype("int64").to_numpy(),
            "hour": t.dt.hour.astype("int64").to_numpy(),
            "user_id": batch["user_id"].astype("int64").to_numpy(),
        }).groupby(["event_type", "dow", "hour", "user_id"], sort=False)\
            .size().reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    parts = events.select_columns(["event_type", "ts", "user_id"])\
        .map_batches(partial, batch_format="pandas", batch_size=65536)

    per_pair = bucketed_group_apply(
        parts, ["event_type", "dow", "hour", "user_id"],
        lambda b: b.groupby(["event_type", "dow", "hour", "user_id"],
                            sort=False)["n"].sum().reset_index(),
        n_buckets=n_buckets,
    )

    def per_class(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["event_type", "dow", "hour"], sort=False).agg(
            div=("user_id", "size"), n=("n", "sum")
        ).reset_index()
        g["div"] = g["div"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return g[["div", "n"]]

    classes = bucketed_group_apply(
        per_pair, ["event_type", "dow", "hour"], per_class,
        n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        div = bucket["div"].astype("int64").to_numpy()
        n = bucket["n"].astype("int64").to_numpy()
        total = np.int64(n.sum())
        rows = []
        for lv in ls:
            below = div < lv
            rows.append({
                "l": np.int64(lv),
                "n_classes": np.int64(len(div)),
                "n_classes_below": np.int64(below.sum()),
                "n_rows_below": np.int64(n[below].sum()),
                "rows_below_share": np.round(
                    float(n[below].sum()) / float(total), 6
                ),
            })
        return pd.DataFrame(rows)

    keyed = classes.map_batches(
        lambda b: b.assign(g=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["g"], lambda b: final(b.drop(columns=["g"])), n_buckets=1
    )


L_DIVERSITY_SQL_TEMPLATE = """
WITH q AS (
  SELECT event_type, isodow(ts) AS dow, hour(ts) AS hour,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS div,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_classes FROM q),
ls AS (SELECT CAST(unnest([{ls}]) AS BIGINT) AS l)
SELECT ls.l,
       t.n_classes,
       CAST(SUM(CASE WHEN q.div < ls.l THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_below,
       CAST(SUM(CASE WHEN q.div < ls.l THEN q.n ELSE 0 END) AS BIGINT)
         AS n_rows_below,
       ROUND(
         CAST(SUM(CASE WHEN q.div < ls.l THEN q.n ELSE 0 END) AS DOUBLE)
         / CAST(t.total AS DOUBLE), 6
       ) AS rows_below_share
FROM ls, q, t
GROUP BY ls.l, t.n_classes, t.total
"""


def deletion_impact(
    events: ray.data.Dataset, hex_max: str = "0f", n_buckets: int = 32
) -> ray.data.Dataset:
    """RIGHT-TO-BE-FORGOTTEN sweep planner: if the deterministic cohort of
    users whose md5(user_id) starts at or below ``hex_max`` (≈ (cut+1)/256
    of users) requested deletion, what does each event_type lose — the
    per-partition impact estimate a compliance compaction job is sized
    from (the privacy family's third leg after the k-anonymity /
    l-diversity audits). Output per type: n_rows, n_flagged_rows,
    flagged_share, n_flagged_users."""
    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    cut_val = int(hex_max, 16)
    if not 0 <= cut_val <= 0xFF:
        raise ValueError(f"hex_max must be one byte (00..ff), got {hex_max!r}")
    hex_cut = format(cut_val, "02x")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch["user_id"].astype("int64")
        p2 = np.asarray(md5_hex(uid.astype(str).to_numpy()),
                        dtype="U32").astype("U2")
        flag = p2 <= hex_cut
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "user_id": np.where(flag, uid.to_numpy(), np.int64(-1)),
            "n": np.int64(1),
            "n_flag": flag.astype("int64"),
        }).groupby(["event_type", "user_id"], sort=False).agg(
            n=("n", "sum"), n_flag=("n_flag", "sum")
        ).reset_index()
        for c in ("n", "n_flag"):
            g[c] = g[c].astype("int64")
        return g

    parts = events.select_columns(["event_type", "user_id"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    # one (type, user)-keyed exact reduce: each key's partials land whole,
    # so downstream row-counting per type equals distinct-user counting
    folded = bucketed_group_apply(
        parts, ["event_type", "user_id"],
        lambda b: b.groupby(["event_type", "user_id"], sort=False)
        .agg(n=("n", "sum"), n_flag=("n_flag", "sum")).reset_index(),
        n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False).agg(
            n=("n", "sum"), n_flag=("n_flag", "sum"),
            users=("user_id", lambda u: np.int64((u.to_numpy() >= 0).sum())),
        )
        n = g["n"].astype("int64").to_numpy()
        nf = g["n_flag"].astype("int64").to_numpy()
        return pd.DataFrame({
            "event_type": g.index.to_numpy(),
            "n_rows": n,
            "n_flagged_rows": nf,
            "flagged_share": np.round(
                nf.astype("float64") / n.astype("float64"), 6
            ),
            "n_flagged_users": g["users"].astype("int64").to_numpy(),
        })

    return bucketed_group_apply(folded, ["event_type"], final, n_buckets=1)


DELETION_IMPACT_SQL_TEMPLATE = """
WITH f AS (
  SELECT event_type, user_id,
         substring(md5(CAST(user_id AS VARCHAR)), 1, 2) <= '{hex_max}'
           AS flag
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged_rows,
       ROUND(CAST(SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS flagged_share,
       CAST(COUNT(DISTINCT CASE WHEN flag THEN user_id END) AS BIGINT)
         AS n_flagged_users
FROM f GROUP BY event_type
"""


def value_cusum(events: ray.data.Dataset, n_buckets: int = 8) -> ray.data.Dataset:
    """CUSUM drift detector over the daily value stream, per event type —
    the page-one monitoring primitive: S_d = max(0, S_{d-1} + (x_d − μ))
    flags sustained upward drift long before a single-day threshold
    would. ALL-INTEGER: x_d is the exact daily cents total, μ the
    floor-divided per-type mean (totals are positive on this corpus, so
    Python floor // and SQL's truncating // agree), so every S_d is a
    bit-exact int64 on engine and oracle alike. Days are the OBSERVED
    per-type days in ascending order (gap days contribute no term —
    stated contract).

    Shape: per-batch (type, day) cents partials, one keyed exact reduce,
    then a DAY-BOUNDED driver recurrence (the sequential dependency is
    irreducible, but its domain is the calendar, not the corpus).
    Output per type: event_type, n_days, mean_cents, peak_cusum_cents,
    peak_day, n_pos_days."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(batch["ts"])
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "day": t.dt.strftime("%Y-%m-%d").to_numpy(),
            "c": cents_i64(batch["value"].to_numpy()),
        }).groupby(["event_type", "day"], sort=False)["c"].sum()\
            .reset_index()
        g["c"] = g["c"].astype("int64")
        return g

    per_day = bucketed_group_apply(
        events.select_columns(["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["event_type", "day"],
        lambda b: b.groupby(["event_type", "day"], sort=False)["c"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    ).to_pandas()  # day-bounded: |types| x calendar days

    rows = []
    for et, g in per_day.groupby("event_type", sort=True):
        g = g.sort_values("day", kind="mergesort")
        xs = [int(v) for v in g["c"]]
        days = list(g["day"])
        mean_c = sum(xs) // len(xs)
        s = 0
        peak, peak_day, n_pos = 0, days[0], 0
        for d, x in zip(days, xs):
            s = max(0, s + (x - mean_c))
            if s > 0:
                n_pos += 1
            if s > peak:
                peak, peak_day = s, d
        rows.append({
            "event_type": et,
            "n_days": np.int64(len(xs)),
            "mean_cents": np.int64(mean_c),
            "peak_cusum_cents": np.int64(peak),
            "peak_day": peak_day,
            "n_pos_days": np.int64(n_pos),
        })
    return ray.data.from_pandas(pd.DataFrame(rows))


VALUE_CUSUM_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, day, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM d
),
m AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
           AS mean_c,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM d GROUP BY 1
),
c(event_type, rn, day, s) AS (
  SELECT r.event_type, r.rn, r.day,
         GREATEST(CAST(0 AS BIGINT), r.x - m.mean_c)
  FROM r JOIN m USING (event_type) WHERE r.rn = 1
  UNION ALL
  SELECT r.event_type, r.rn, r.day,
         GREATEST(CAST(0 AS BIGINT), c.s + r.x - m.mean_c)
  FROM c
  JOIN r ON r.event_type = c.event_type AND r.rn = c.rn + 1
  JOIN m ON m.event_type = c.event_type
),
agg AS (
  SELECT event_type, MAX(s) AS peak,
         CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos_days
  FROM c GROUP BY 1
)
SELECT m.event_type, m.nd AS n_days, m.mean_c AS mean_cents,
       CAST(agg.peak AS BIGINT) AS peak_cusum_cents,
       COALESCE(
         (SELECT MIN(c.day) FROM c
          WHERE c.event_type = m.event_type AND c.s = agg.peak
            AND agg.peak > 0),
         (SELECT MIN(day) FROM d WHERE d.event_type = m.event_type)
       ) AS peak_day,
       agg.n_pos_days
FROM m JOIN agg ON agg.event_type = m.event_type
"""


def value_changepoint(events: ray.data.Dataset, n_buckets: int = 8) -> ray.data.Dataset:
    """Single CHANGEPOINT detector per event type — binary segmentation's
    first split over the daily value series: the day boundary that best
    separates the stream into two level regimes. ALL-INTEGER scoring: for
    a split after day k (of n), score = |S_k·(n−k) − (S_n−S_k)·k| — the
    cross-multiplied mean difference, exact in Python ints (and HUGEINT
    in the oracle's window cumsum), no float mean ever formed. Ties break
    to the earliest day. Types with fewer than 2 observed days emit
    nothing (no split exists).

    Shape: the ``value_cusum`` per-(type, day) exact cents reduce, then a
    DAY-BOUNDED driver scan (prefix sums over the calendar, not the
    corpus). Output per type: event_type, n_days, split_day (last day of
    the left regime), score."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(batch["ts"])
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "day": t.dt.strftime("%Y-%m-%d").to_numpy(),
            "c": cents_i64(batch["value"].to_numpy()),
        }).groupby(["event_type", "day"], sort=False)["c"].sum()\
            .reset_index()
        g["c"] = g["c"].astype("int64")
        return g

    per_day = bucketed_group_apply(
        events.select_columns(["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["event_type", "day"],
        lambda b: b.groupby(["event_type", "day"], sort=False)["c"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    ).to_pandas()  # day-bounded

    rows = []
    for et, g in per_day.groupby("event_type", sort=True):
        g = g.sort_values("day", kind="mergesort")
        xs = [int(v) for v in g["c"]]
        days = list(g["day"])
        n = len(xs)
        if n < 2:
            continue
        total = sum(xs)
        best_score, best_day = -1, None
        s = 0
        for k in range(1, n):  # split AFTER position k (1-based)
            s += xs[k - 1]
            score = abs(s * (n - k) - (total - s) * k)
            if score > best_score:
                best_score, best_day = score, days[k - 1]
        rows.append({
            "event_type": et,
            "n_days": np.int64(n),
            "split_day": best_day,
            "score": np.int64(best_score),
        })
    return ray.data.from_pandas(pd.DataFrame(rows))


VALUE_CHANGEPOINT_SQL = """
WITH d AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT event_type, day,
         SUM(x) OVER (PARTITION BY event_type ORDER BY day) AS sl,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k
  FROM d
),
t AS (
  SELECT event_type, SUM(x) AS st, CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY 1
),
s AS (
  SELECT c.event_type, c.day, t.n,
         ABS(c.sl * (t.n - c.k) - (t.st - c.sl) * c.k) AS score
  FROM c JOIN t USING (event_type)
  WHERE c.k < t.n
)
SELECT event_type, n AS n_days, day AS split_day,
       CAST(score AS BIGINT) AS score
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY score DESC, day ASC
  ) AS rn
  FROM s
) WHERE rn = 1
"""


def benford_audit(events: ray.data.Dataset, n_buckets: int = 8) -> ray.data.Dataset:
    """BENFORD first-digit forensic audit of the value stream — the
    fabricated-data smell test: naturally-grown monetary values follow
    P(d) = log10(1 + 1/d); synthetic, capped or hand-entered feeds do
    not. Digit = first character of the exact integer cents (values are
    positive on this corpus; zero-cent rows would have no leading digit
    and are excluded on both sides). Output per digit 1..9: digit, n,
    share, benford_p, excess (share − benford_p) — each float one shared
    double expression rounded 6."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = cents_i64(batch["value"].to_numpy())
        c = c[c > 0]
        d = np.array([int(str(v)[0]) for v in c], dtype="int64")
        g = pd.DataFrame({"digit": d, "n": np.int64(1)})\
            .groupby("digit", sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    parts = events.select_columns(["value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("digit", sort=False)["n"].sum().astype("int64")
        n = g.to_numpy()
        dig = g.index.to_numpy().astype("int64")
        total = float(n.sum())
        share = np.round(n.astype("float64") / total, 6)
        bp = np.round(np.log10(1.0 + 1.0 / dig.astype("float64")), 6)
        return pd.DataFrame({
            "digit": dig,
            "n": n,
            "share": share,
            "benford_p": bp,
            "excess": np.round(share - bp, 6),
        })

    keyed = parts.map_batches(
        lambda b: b.assign(g=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["g"], lambda b: final(b.drop(columns=["g"])), n_buckets=1
    )


BENFORD_SQL = """
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
d AS (
  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE cents > 0
),
g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6)
         AS share,
       ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p,
       ROUND(ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6)
             - ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6), 6)
         AS excess
FROM g
"""


def ab_readout(events: ray.data.Dataset, n_buckets: int = 16) -> ray.data.Dataset:
    """A/B EXPERIMENT readout with deterministic hash assignment — the
    experimentation primitive: users split 50/50 by the first hex char of
    md5(user_id) (0-7 -> A, 8-f -> B; the assignment every service
    computes identically with no coordination), then per event type the
    per-arm event counts, distinct users, exact cents totals and the
    per-event mean difference. Integer sums throughout; the mean diff is
    one shared double expression (two exact-int divisions, subtract,
    round 6). Output per type: n_a, n_b, users_a, users_b, cents_a,
    cents_b, mean_diff_cents."""
    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch["user_id"].astype("int64")
        h1 = np.asarray(md5_hex(uid.astype(str).to_numpy()),
                        dtype="U32").astype("U1")
        arm_a = h1 <= "7"
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "user_id": uid.to_numpy(),
            "arm_a": arm_a.astype("int64"),
            "n": np.int64(1),
            "c": cents_i64(batch["value"].to_numpy()),
        }).groupby(["event_type", "user_id", "arm_a"], sort=False).agg(
            n=("n", "sum"), c=("c", "sum")
        ).reset_index()
        for col in ("n", "c", "arm_a"):
            g[col] = g[col].astype("int64")
        return g

    parts = events.select_columns(
        ["event_type", "user_id", "value"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)

    folded = bucketed_group_apply(
        parts, ["event_type", "user_id"],
        lambda b: b.groupby(["event_type", "user_id", "arm_a"], sort=False)
        .agg(n=("n", "sum"), c=("c", "sum")).reset_index(),
        n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        a = bucket[bucket["arm_a"] == 1]
        b = bucket[bucket["arm_a"] == 0]
        ga = a.groupby("event_type", sort=False).agg(
            n_a=("n", "sum"), users_a=("user_id", "size"),
            cents_a=("c", "sum"))
        gb = b.groupby("event_type", sort=False).agg(
            n_b=("n", "sum"), users_b=("user_id", "size"),
            cents_b=("c", "sum"))
        g = ga.join(gb, how="outer").fillna(0)
        for col in g.columns:
            g[col] = g[col].astype("int64")
        na = g["n_a"].to_numpy(dtype="float64")
        nb = g["n_b"].to_numpy(dtype="float64")
        ca = g["cents_a"].to_numpy(dtype="float64")
        cb = g["cents_b"].to_numpy(dtype="float64")
        return pd.DataFrame({
            "event_type": g.index.to_numpy(),
            "n_a": g["n_a"].to_numpy(), "n_b": g["n_b"].to_numpy(),
            "users_a": g["users_a"].to_numpy(),
            "users_b": g["users_b"].to_numpy(),
            "cents_a": g["cents_a"].to_numpy(),
            "cents_b": g["cents_b"].to_numpy(),
            "mean_diff_cents": np.round(ca / na - cb / nb, 6),
        })

    return bucketed_group_apply(folded, ["event_type"], final, n_buckets=1)


AB_READOUT_SQL = """
WITH f AS (
  SELECT event_type, user_id,
         substring(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7' AS arm_a,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
       CAST(COUNT(DISTINCT CASE WHEN arm_a THEN user_id END) AS BIGINT)
         AS users_a,
       CAST(COUNT(DISTINCT CASE WHEN NOT arm_a THEN user_id END) AS BIGINT)
         AS users_b,
       CAST(SUM(CASE WHEN arm_a THEN c ELSE 0 END) AS BIGINT) AS cents_a,
       CAST(SUM(CASE WHEN arm_a THEN 0 ELSE c END) AS BIGINT) AS cents_b,
       ROUND(
         CAST(SUM(CASE WHEN arm_a THEN c ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS DOUBLE)
         - CAST(SUM(CASE WHEN arm_a THEN 0 ELSE c END) AS DOUBLE)
         / CAST(SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS DOUBLE), 6
       ) AS mean_diff_cents
FROM f GROUP BY event_type
"""


def scd2_history(events: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """SCD TYPE-2 dimension history: per user, the run-length-compressed
    history of the ``event_type`` "state" under (ts, event_id) ordering —
    each row one validity interval [valid_from_us, valid_to_us) with the
    open (current) run marked. This is the dimension-table build a warehouse
    runs over a change log, and the type-2 companion of ``latest_state``
    (which is the type-1 "current row only" compaction). The reference's
    per-file ordered-trackpoint invariant (src/TCXReader.jl ordered parse) is
    the same per-key total order this relies on.

    All-integer output except none — timestamps are exact epoch-µs int64;
    no float arithmetic anywhere. ``valid_to_us`` is -1 on the open run (the
    driver hash is NULL-free). Shape: one hash-bucketed shuffle on user_id;
    inside a bucket the run compression is fully vectorized (shift-compare
    boundaries + cumsum run ids) across all users at once. Per-user history
    lands in one task — the standard per-key window discipline used by
    ``sessionize``/``latest_state``; a whale user bounds the task at its own
    history length, not the corpus.

    Output: user_id, run_idx (1-based int64), state, valid_from_us,
    valid_to_us (int64, -1 = current), n_events, is_current (int64 0/1)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].astype("int64").to_numpy(),
            "state": batch["event_type"].to_numpy(),
            "us": pd.to_datetime(batch["ts"]).astype("datetime64[us]")
            .astype("int64").to_numpy(),
            "event_id": batch["event_id"].astype("int64").to_numpy(),
        })

    parts = events.select_columns(
        ["user_id", "event_type", "ts", "event_id"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        st = g["state"].to_numpy()
        us = g["us"].to_numpy()
        # run boundary = new user OR state change (vectorized shift-compare)
        new_run = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_run[1:] = (uid[1:] != uid[:-1]) | (st[1:] != st[:-1])
        starts = np.flatnonzero(new_run)
        n_events = np.diff(np.append(starts, len(g))).astype("int64")
        r_uid = uid[starts]
        r_state = st[starts]
        r_from = us[starts].astype("int64")
        # run_idx: 1-based position of the run within its user
        user_run_start = np.ones(len(starts), dtype=bool)
        if len(starts) > 1:
            user_run_start[1:] = r_uid[1:] != r_uid[:-1]
        base = np.maximum.accumulate(
            np.where(user_run_start, np.arange(len(starts)), 0)
        )
        run_idx = (np.arange(len(starts)) - base + 1).astype("int64")
        # valid_to = next run's valid_from within the same user, else -1
        r_to = np.full(len(starts), -1, dtype="int64")
        if len(starts) > 1:
            same_user = r_uid[:-1] == r_uid[1:]
            r_to[:-1] = np.where(same_user, r_from[1:], -1)
        is_current = (r_to == -1).astype("int64")
        return pd.DataFrame({
            "user_id": r_uid.astype("int64"),
            "run_idx": run_idx,
            "state": r_state,
            "valid_from_us": r_from,
            "valid_to_us": r_to,
            "n_events": n_events,
            "is_current": is_current,
        })

    return bucketed_group_apply(parts, ["user_id"], per_bucket,
                                n_buckets=n_buckets)


SCD2_HISTORY_SQL = """
WITH ev AS (
  SELECT user_id, event_type AS state, epoch_us(ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn_s
  FROM events
),
runs AS (
  SELECT user_id, state, MIN(us) AS valid_from_us,
         CAST(COUNT(*) AS BIGINT) AS n_events, MIN(rn) AS first_rn
  FROM (SELECT *, rn - rn_s AS island FROM ev)
  GROUP BY user_id, state, island
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY first_rn)
            AS BIGINT) AS run_idx,
       state,
       valid_from_us,
       COALESCE(LEAD(valid_from_us) OVER (PARTITION BY user_id
                                          ORDER BY first_rn), -1)
         AS valid_to_us,
       n_events,
       CAST(CASE WHEN LEAD(valid_from_us) OVER (PARTITION BY user_id
                                                ORDER BY first_rn) IS NULL
            THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM runs
"""


def throttle_dedup(
    events: ray.data.Dataset,
    window_us: int = 86_400_000_000,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """RATE-LIMIT (throttle) dedup accounting: per (user_id, event_type)
    stream in (ts, event_id) order, an event is KEPT iff it is the first of
    its key or its timestamp is >= the last KEPT timestamp + ``window_us``
    — the at-most-one-per-window suppression an alerting/notification
    pipeline applies. This is genuinely sequential per key (kept-set depends
    on the kept-set so far — NOT expressible as a plain window function,
    unlike gap sessionization), i.e. the keyed-state-machine semantics a
    streaming engine runs; here keys are hash-bucketed so every key's state
    machine runs once, buckets in parallel.

    Per-key scan is a searchsorted JUMP loop: each iteration binary-searches
    the next event at >= last_kept + W, so iterations = kept events (<< rows
    when the throttle is actually suppressing), not a per-row Python loop.

    Output per event_type: n_events, n_kept, n_dropped (all int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].astype("int64").to_numpy(),
            "event_type": batch["event_type"].to_numpy(),
            "us": pd.to_datetime(batch["ts"]).astype("datetime64[us]")
            .astype("int64").to_numpy(),
            "event_id": batch["event_id"].astype("int64").to_numpy(),
        })

    parts = events.select_columns(
        ["user_id", "event_type", "ts", "event_id"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(
            ["user_id", "event_type", "us", "event_id"], kind="mergesort"
        )
        us = g["us"].to_numpy()
        key_change = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            uid = g["user_id"].to_numpy()
            et = g["event_type"].to_numpy()
            key_change[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        bounds = np.append(np.flatnonzero(key_change), len(g))
        kept_per_group = np.zeros(len(bounds) - 1, dtype="int64")
        n_per_group = np.diff(bounds).astype("int64")
        for gi in range(len(bounds) - 1):
            lo, hi = bounds[gi], bounds[gi + 1]
            seg = us[lo:hi]
            i, kept = 0, 0
            while i < len(seg):
                kept += 1
                # jump to the first event past the suppression window
                i = int(np.searchsorted(seg, seg[i] + window_us, side="left"))
            kept_per_group[gi] = kept
        # fold to per-type partials inside the bucket (one row per type)
        types = g["event_type"].to_numpy()[bounds[:-1]]
        out = pd.DataFrame({
            "event_type": types,
            "n_events": n_per_group,
            "n_kept": kept_per_group,
        })
        f = out.groupby("event_type", sort=False).sum().reset_index()
        f["n_events"] = f["n_events"].astype("int64")
        f["n_kept"] = f["n_kept"].astype("int64")
        return f

    per_type_parts = bucketed_group_apply(
        parts, ["user_id", "event_type"], per_bucket, n_buckets=n_buckets
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        f = bucket.groupby("event_type", sort=False)[
            ["n_events", "n_kept"]
        ].sum().reset_index()
        return pd.DataFrame({
            "event_type": f["event_type"].to_numpy(),
            "n_events": f["n_events"].astype("int64").to_numpy(),
            "n_kept": f["n_kept"].astype("int64").to_numpy(),
            "n_dropped": (f["n_events"] - f["n_kept"])
            .astype("int64").to_numpy(),
        })

    return bucketed_group_apply(
        per_type_parts, ["event_type"], final, n_buckets=8
    )


def throttle_dedup_sql(window_us: int = 86_400_000_000) -> str:
    # linear recursion: one state-machine step per (user, type, rn) row,
    # advancing all keys in lockstep; iterations = max per-key row count
    return f"""
WITH RECURSIVE ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
),
scan AS (
  SELECT user_id, event_type, rn, us AS last_kept_us, TRUE AS kept
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.event_type, e.rn,
         CASE WHEN e.us >= s.last_kept_us + {window_us}
              THEN e.us ELSE s.last_kept_us END,
         e.us >= s.last_kept_us + {window_us}
  FROM scan s
  JOIN ev e ON e.user_id = s.user_id AND e.event_type = s.event_type
           AND e.rn = s.rn + 1
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM scan GROUP BY event_type
"""


def forward_fill_daily(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """LOCF CALENDARIZATION: per user, the dense daily grid from the user's
    first to last active day, each day carrying the value of the user's
    last event on-or-before that day (last-observation-carried-forward) and
    an observed flag — the gap-free daily feature table a training pipeline
    materializes from a sparse event log. ``value`` floats are CARRIED, never
    summed, so they pass through bit-exact.

    Shape: one hash-bucketed shuffle on user_id; inside a bucket the grid is
    built vectorized across all users (ragged-arange via repeat + cumsum
    offsets) and the fill is one np.maximum.accumulate over last-observed
    indices (each user's first grid day is observed by construction, so the
    accumulate cannot bleed across users). Grid rows are bounded by
    users x calendar-span, not by event count.

    Output: user_id, day ('%Y-%m-%d'), value (float64), observed (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    US_PER_DAY = 86_400_000_000

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        d = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64").to_numpy(),
            "day_i": us // US_PER_DAY,
            "us": us,
            "event_id": batch["event_id"].astype("int64").to_numpy(),
            "value": batch["value"].to_numpy(),
        })
        # per-batch combiner: last event per (user, day) by (us, event_id)
        d = d.sort_values(["user_id", "day_i", "us", "event_id"],
                          kind="mergesort")
        return d.groupby(["user_id", "day_i"], sort=False).tail(1)

    parts = events.select_columns(
        ["user_id", "ts", "event_id", "value"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["user_id", "day_i", "us", "event_id"],
                               kind="mergesort")
        d = d.groupby(["user_id", "day_i"], sort=False).tail(1)
        uid = d["user_id"].to_numpy()
        day = d["day_i"].to_numpy()
        val = d["value"].to_numpy()
        # per-user span (d is sorted by user, day)
        first = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            first[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(d)) - 1
        u_users = uid[starts]
        d0 = day[starts]
        d1 = day[ends]
        spans = (d1 - d0 + 1).astype("int64")
        n = int(spans.sum())
        # ragged arange: grid day index for every (user, day) cell
        grid_user = np.repeat(u_users, spans)
        offs = np.arange(n, dtype="int64") - np.repeat(
            np.cumsum(spans) - spans, spans
        )
        grid_day = np.repeat(d0, spans) + offs
        # scatter observed daily values into the grid
        grid_pos = np.repeat(np.cumsum(spans) - spans, np.diff(
            np.append(starts, len(d))
        )) + (day - np.repeat(d0, np.diff(np.append(starts, len(d)))))
        obs_idx = np.full(n, -1, dtype="int64")
        obs_idx[grid_pos] = np.arange(len(d))
        observed = (obs_idx >= 0).astype("int64")
        # LOCF: first cell of every user is observed by construction
        fill_src = np.maximum.accumulate(obs_idx)
        filled = val[fill_src]
        days = pd.to_datetime(grid_day * US_PER_DAY, unit="us")
        return pd.DataFrame({
            "user_id": grid_user.astype("int64"),
            "day": days.strftime("%Y-%m-%d"),
            "value": filled.astype("float64"),
            "observed": observed,
        })

    return bucketed_group_apply(parts, ["user_id"], per_bucket,
                                n_buckets=n_buckets)


FORWARD_FILL_DAILY_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
daily AS (SELECT user_id, day, value FROM ev WHERE rn = 1),
span AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
),
grid AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT g.user_id,
       strftime(g.day, '%Y-%m-%d') AS day,
       LAST_VALUE(d.value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value,
       CAST(CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS observed
FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
"""


def dp_released_counts(events: ray.data.Dataset) -> ray.data.Dataset:
    """DIFFERENTIAL-PRIVACY release of per-type event counts under the
    GEOMETRIC MECHANISM (the discrete Laplace; Ghosh-Roughgarden-Sundararajan
    2009, "Universally utility-maximizing privacy mechanisms") with
    alpha = 1/2 (epsilon = ln 2): P(Z = z) proportional to 2^-|z|. With
    alpha = 1/2 every inverse-CDF boundary is a DYADIC RATIONAL over 3
    (P(Z=0) = 1/3, tails 2^-n/3), so the noise draw is EXACT INTEGER
    arithmetic on a 64-bit md5-derived uniform — no float log anywhere, and
    the deterministic draw is reproducible bit-for-bit by the SQL oracle
    (the production swap-in is one line: a real RNG for the md5 uniform).

    Inverse CDF on V = 3*U64, U64 uniform on [0, 2^64):
      Z = 0      iff 2^64 <= V < 2^65                      (mass 1/3)
      Z = -n     iff 2^(64-n) <= V < 2^(65-n), n >= 1      (mass 2^-n/6... )
      Z = +n     iff 2^(64-n) <= W < 2^(65-n), W = 3*2^64 - 1 - V
    clamped to |Z| <= 64 (the U64 resolution floor).

    Counts are distributed exact partial sums; the mechanism itself runs on
    the driver over the RELEASED CELLS only (one per event_type — O(cells),
    never O(rows)). Output: event_type, n_true, noise, n_noisy (int64;
    n_noisy may be negative — a DP release does not clamp, clamping burns
    budget)."""
    import hashlib

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("event_type", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    parts = events.select_columns(["event_type"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def fold(bucket: pd.DataFrame) -> pd.DataFrame:
        f = bucket.groupby("event_type", sort=False)["n"].sum().reset_index()
        f["n"] = f["n"].astype("int64")
        return f

    counts = bucketed_group_apply(parts, ["event_type"], fold, n_buckets=8)

    def geometric_noise(key: str) -> int:
        u64 = int(hashlib.md5(f"dp:{key}".encode()).hexdigest()[:16], 16)
        v = 3 * u64
        if (1 << 64) <= v < (1 << 65):
            return 0
        if v < (1 << 64):
            return -(65 - v.bit_length()) if v else -64
        w = 3 * (1 << 64) - 1 - v
        return (65 - w.bit_length()) if w else 64

    # released cells are the per-type counts — dimension-bounded (n_types),
    # so the mechanism is a driver-side map over the tiny collected table
    df = counts.to_pandas()
    noise = np.array(
        [geometric_noise(t) for t in df["event_type"]], dtype="int64"
    )
    out = pd.DataFrame({
        "event_type": df["event_type"].to_numpy(),
        "n_true": df["n"].astype("int64").to_numpy(),
        "noise": noise,
        "n_noisy": df["n"].astype("int64").to_numpy() + noise,
    })
    return ray.data.from_pandas(out)


DP_RELEASED_COUNTS_SQL = """
WITH RECURSIVE pw16(i, p) AS (
  SELECT 1, 1::HUGEINT UNION ALL SELECT i + 1, p * 16 FROM pw16 WHERE i < 16
),
pw2(n, p) AS (
  SELECT 0, 1::HUGEINT UNION ALL SELECT n + 1, p * 2 FROM pw2 WHERE n < 66
),
cnt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM events GROUP BY event_type
),
u AS (
  SELECT event_type, n_true,
         (SELECT SUM(
            (strpos('0123456789abcdef',
                    substring(md5('dp:' || event_type),
                              CAST(17 - i AS INT), 1)) - 1)::HUGEINT * p)
          FROM pw16) AS u64
  FROM cnt
),
v AS (
  SELECT event_type, n_true, 3::HUGEINT * u64 AS vv,
         (SELECT p FROM pw2 WHERE n = 64) AS p64,
         (SELECT p FROM pw2 WHERE n = 65) AS p65
  FROM u
),
z AS (
  SELECT event_type, n_true,
         CASE
           WHEN vv >= p64 AND vv < p65 THEN 0
           WHEN vv < p64 THEN
             -COALESCE((SELECT 64 - n FROM pw2
                        WHERE p <= vv AND 2 * p > vv), 64)
           ELSE
             COALESCE((SELECT 64 - n FROM pw2
                       WHERE p <= (3 * p64 - 1 - vv)
                         AND 2 * p > (3 * p64 - 1 - vv)), 64)
         END AS noise
  FROM v
)
SELECT event_type, n_true, CAST(noise AS BIGINT) AS noise,
       CAST(n_true + noise AS BIGINT) AS n_noisy
FROM z
"""


def rolling_median_daily(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """7-DAY ROLLING MEDIAN of per-user daily spend — the windowed-percentile
    smoother a monitoring pipeline runs where a rolling MEAN would be yanked
    by one whale purchase. Calendar RANGE semantics (days with no events are
    absent, the window is [day-6, day] by date, not by row).

    Exactness: daily totals are exact integer cents; the median of <= 7
    exact-cent doubles is (a+b)/2 over integers < 2^53 — every intermediate
    is exactly representable, so numpy's nanmedian and the oracle's
    interpolated quantile produce the identical double, and the final /100.0
    is the same single operation on both sides.

    Shape: per-batch (user, day) cent partials, one user-bucketed shuffle;
    inside a bucket the calendar window is materialized VECTORIZED as 7
    self-merges on (user, day - k) — no per-row loop — and reduced by one
    np.nanmedian over the padded (rows, 7) matrix.

    Output: user_id, day ('%Y-%m-%d'), med7_value (float64),
    n_in_window (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    US_PER_DAY = 86_400_000_000

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        d = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64").to_numpy(),
            "day_i": us // US_PER_DAY,
            "c": cents_i64(batch["value"].to_numpy()),
        })
        g = d.groupby(["user_id", "day_i"], sort=False)["c"].sum()
        return g.astype("int64").reset_index()

    parts = events.select_columns(["user_id", "ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.groupby(["user_id", "day_i"], sort=False)["c"].sum() \
            .astype("int64").reset_index() \
            .sort_values(["user_id", "day_i"], kind="mergesort") \
            .reset_index(drop=True)
        cols = [d["c"].to_numpy(dtype="float64")]
        for k in range(1, 7):
            shifted = d[["user_id", "day_i", "c"]].copy()
            shifted["day_i"] = shifted["day_i"] + k
            m = d[["user_id", "day_i"]].merge(
                shifted, on=["user_id", "day_i"], how="left"
            )
            cols.append(m["c"].to_numpy(dtype="float64"))
        mat = np.column_stack(cols)
        med_c = np.nanmedian(mat, axis=1)
        n_win = (~np.isnan(mat)).sum(axis=1).astype("int64")
        days = pd.to_datetime(d["day_i"].to_numpy() * US_PER_DAY, unit="us")
        return pd.DataFrame({
            "user_id": d["user_id"].to_numpy(),
            "day": days.strftime("%Y-%m-%d"),
            "med7_value": med_c / 100.0,
            "n_in_window": n_win,
        })

    return bucketed_group_apply(parts, ["user_id"], per_bucket,
                                n_buckets=n_buckets)


ROLLING_MEDIAN_DAILY_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY user_id, CAST(ts AS DATE)
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       median(CAST(c AS DOUBLE)) OVER w / 100.0 AS med7_value,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
"""


def user_day_jaccard(
    events: ray.data.Dataset, tau: float = 0.85, n_buckets: int = 32
) -> ray.data.Dataset:
    """BEHAVIORAL-COHORT set-similarity join: pairs of users whose ACTIVE-DAY
    sets have Jaccard >= tau — the same exact inverted-index + verify shape
    as the text n-gram join (``dedup.ngram_jaccard_join``) transplanted to a
    non-text domain (co-activity discovery). Exact, not MinHashed: the
    posting list key is the day, so a globally hot day is the declared skew
    limit (the banded-LSH suite is the approximate fallback regime at
    web scale — same trade documented on the text side).

    All counts are exact integers; the only float is the final
    co / (|A| + |B| - co) division, computed by the identical expression on
    both sides and rounded to 6 before the >= tau filter (so the filter
    boundary cannot diverge).

    Output: user_a, user_b (int64, a < b), co_days, days_a, days_b (int64),
    jaccard (float64, round 6)."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )
    from tcx2graph_jl_ray.functions.join import hash_join

    US_PER_DAY = 86_400_000_000

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        d = pd.DataFrame({
            "user_id": batch["user_id"].astype("int64").to_numpy(),
            "day_i": us // US_PER_DAY,
        })
        return d.drop_duplicates()

    parts = events.select_columns(["user_id", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def distinct_ud(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates()

    days = bucketed_group_apply(
        parts, ["user_id", "day_i"], distinct_ud, n_buckets=n_buckets
    ).materialize()

    # per-user set sizes (order-free count: salted, whale-safe)
    sizes = salted_group_apply(
        days, ["user_id"],
        partial_fn=lambda b: b.groupby("user_id", sort=False).size()
        .astype("int64").reset_index(name="n"),
        merge_fn=lambda b: b.groupby("user_id", sort=False)["n"].sum()
        .astype("int64").reset_index(),
    )

    # inverted index: day -> co-active user pairs (a < b), vectorized triu
    # per day group inside the bucket
    def day_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in bucket.groupby("day_i", sort=False):
            u = np.sort(grp["user_id"].to_numpy())
            if len(u) < 2:
                continue
            ia, ib = np.triu_indices(len(u), k=1)
            out_a.append(u[ia])
            out_b.append(u[ib])
        if not out_a:
            return pd.DataFrame({
                "user_a": pd.Series(dtype="int64"),
                "user_b": pd.Series(dtype="int64"),
            })
        return pd.DataFrame({
            "user_a": np.concatenate(out_a),
            "user_b": np.concatenate(out_b),
        })

    pairs = bucketed_group_apply(days, ["day_i"], day_pairs,
                                 n_buckets=n_buckets)

    co = salted_group_apply(
        pairs, ["user_a", "user_b"],
        partial_fn=lambda b: b.groupby(["user_a", "user_b"], sort=False)
        .size().astype("int64").reset_index(name="co_days"),
        merge_fn=lambda b: b.groupby(["user_a", "user_b"], sort=False)
        ["co_days"].sum().astype("int64").reset_index(),
    )

    sz_a = sizes.map_batches(
        lambda b: b.rename(columns={"user_id": "user_a", "n": "days_a"}),
        batch_format="pandas",
    )
    sz_b = sizes.map_batches(
        lambda b: b.rename(columns={"user_id": "user_b", "n": "days_b"}),
        batch_format="pandas",
    )
    j = hash_join(co, sz_a, on="user_a", n_buckets=n_buckets)
    j = hash_join(j, sz_b, on="user_b", n_buckets=n_buckets)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        co_n = batch["co_days"].to_numpy(dtype="int64")
        na = batch["days_a"].to_numpy(dtype="int64")
        nb = batch["days_b"].to_numpy(dtype="int64")
        jac = np.round(
            co_n.astype("float64") / (na + nb - co_n).astype("float64"), 6
        )
        out = pd.DataFrame({
            "user_a": batch["user_a"].astype("int64").to_numpy(),
            "user_b": batch["user_b"].astype("int64").to_numpy(),
            "co_days": co_n,
            "days_a": na,
            "days_b": nb,
            "jaccard": jac,
        })
        return out[jac >= tau]

    return j.map_batches(score, batch_format="pandas")


def user_day_jaccard_sql(tau: float = 0.85) -> str:
    return f"""
WITH ds AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
sz AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM ds GROUP BY user_id),
co AS (
  SELECT a.user_id AS ua, b.user_id AS ub, CAST(COUNT(*) AS BIGINT) AS co
  FROM ds a JOIN ds b ON a.day = b.day AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
)
SELECT ua AS user_a, ub AS user_b, co AS co_days,
       sa.n AS days_a, sb.n AS days_b,
       ROUND(CAST(co AS DOUBLE) / CAST(sa.n + sb.n - co AS DOUBLE), 6)
         AS jaccard
FROM co
JOIN sz sa ON sa.user_id = ua
JOIN sz sb ON sb.user_id = ub
WHERE ROUND(CAST(co AS DOUBLE) / CAST(sa.n + sb.n - co AS DOUBLE), 6)
      >= {tau}
"""


def theil_sen_daily(
    events: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """THEIL-SEN robust trend of per-type daily spend: the LOWER MEDIAN of
    all pairwise slopes (c_j - c_i)/(d_j - d_i) over the type's daily
    exact-cent totals — the estimator that shrugs off the outlier days that
    yank an OLS slope (``events_type_trend``'s least-squares line is the
    fragile counterpart). Lower median = the rank ceil(n/2) ELEMENT, a pure
    selection: no interpolation arithmetic, so the chosen double is one
    exact division identical on both sides.

    Shape: distributed exact-cent daily partials, one type-bucketed apply;
    the pairwise slope set is vectorized triu over the type's daily series
    and is CALENDAR-BOUNDED (D days -> D(D-1)/2 pairs, independent of row
    count — the corpus can grow 1000x and D stays the date span).

    Output: event_type, n_days, n_pairs (int64),
    slope_cents_per_day (float64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    US_PER_DAY = 86_400_000_000

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        d = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "day_i": us // US_PER_DAY,
            "c": cents_i64(batch["value"].to_numpy()),
        })
        g = d.groupby(["event_type", "day_i"], sort=False)["c"].sum()
        return g.astype("int64").reset_index()

    parts = events.select_columns(["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.groupby(["event_type", "day_i"], sort=False)["c"].sum() \
            .astype("int64").reset_index()
        rows = []
        for et, grp in d.groupby("event_type", sort=False):
            g = grp.sort_values("day_i", kind="mergesort")
            day = g["day_i"].to_numpy(dtype="int64")
            c = g["c"].to_numpy(dtype="int64")
            if len(day) < 2:
                continue
            ia, ib = np.triu_indices(len(day), k=1)
            slopes = (c[ib] - c[ia]).astype("float64") \
                / (day[ib] - day[ia]).astype("float64")
            n = len(slopes)
            # lower median: 0-based rank (n-1)//2 of the sorted slopes
            k = (n - 1) // 2
            med = np.partition(slopes, k)[k]
            rows.append((et, np.int64(len(day)), np.int64(n), float(med)))
        return pd.DataFrame(
            rows,
            columns=["event_type", "n_days", "n_pairs",
                     "slope_cents_per_day"],
        ).astype({"n_days": "int64", "n_pairs": "int64",
                  "slope_cents_per_day": "float64"})

    return bucketed_group_apply(parts, ["event_type"], per_bucket,
                                n_buckets=n_buckets)


THEIL_SEN_DAILY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
p AS (
  SELECT a.event_type,
         CAST(b.c - a.c AS DOUBLE)
           / CAST(datediff('day', a.day, b.day) AS DOUBLE) AS slope
  FROM daily a
  JOIN daily b ON a.event_type = b.event_type AND a.day < b.day
),
r AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM p
),
nd AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
)
SELECT r.event_type, nd.n_days, CAST(r.n AS BIGINT) AS n_pairs,
       r.slope AS slope_cents_per_day
FROM r JOIN nd ON nd.event_type = r.event_type
WHERE r.rn = (r.n + 1) // 2
"""


# candidate functional dependencies profiled by fd_profile / FD_PROFILE_SQL;
# both sides derive the SAME columns: day '%Y-%m-%d', month '%Y-%m',
# dow = isodow (Mon=1), hour 0-23, event_type, user = user_id as text
FD_CANDIDATES = (
    ("day", "month"),     # holds: a date fixes its month
    ("day", "dow"),       # holds: a date fixes its weekday
    ("month", "day"),     # fails: months contain many days
    ("dow", "day"),       # fails
    ("hour", "dow"),      # fails
    ("user", "event_type"),  # fails unless every user is single-typed
    ("event_type", "dow"),   # fails
)


def fd_profile(events: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """FUNCTIONAL-DEPENDENCY data profiling: for each candidate lhs -> rhs
    in ``FD_CANDIDATES``, does every lhs value map to exactly one rhs value?
    Emits the violation profile a schema-discovery / data-quality tool
    reports (``kg_fact_conflicts`` is the KG-specific instance of the same
    question for (subj, pred) -> obj; this is the generic relational form).

    One pass: the candidate set is MELTED into (fd, lhs_val, rhs_val) rows
    (a constant x7 row multiplication), distinct-reduced, then the rhs
    cardinality per (fd, lhs) folds to per-fd scalars — one shuffle chain
    for all candidates instead of one pipeline each. All integer.

    Output per candidate: fd, n_lhs, n_lhs_violating, max_rhs_per_lhs
    (int64), holds (int64 0/1)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(batch["ts"])
        cols = {
            "day": ts.dt.strftime("%Y-%m-%d").to_numpy(),
            "month": ts.dt.strftime("%Y-%m").to_numpy(),
            "dow": (ts.dt.dayofweek + 1).astype(str).to_numpy(),
            "hour": ts.dt.hour.astype(str).to_numpy(),
            "user": batch["user_id"].astype("int64").astype(str).to_numpy(),
            "event_type": batch["event_type"].astype(str).to_numpy(),
        }
        frames = []
        for lhs, rhs in FD_CANDIDATES:
            frames.append(pd.DataFrame({
                "fd": f"{lhs}->{rhs}",
                "lhs_val": cols[lhs],
                "rhs_val": cols[rhs],
            }).drop_duplicates())
        return pd.concat(frames, ignore_index=True)

    pairs = events.select_columns(["ts", "user_id", "event_type"]) \
        .map_batches(melt, batch_format="pandas", batch_size=65536)

    def distinct_fold(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()
        g = d.groupby(["fd", "lhs_val"], sort=False)["rhs_val"].nunique()
        g = g.astype("int64").reset_index(name="n_rhs")
        return g

    per_lhs = bucketed_group_apply(
        pairs, ["fd", "lhs_val"], distinct_fold, n_buckets=n_buckets
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for fd, g in bucket.groupby("fd", sort=False):
            n = g["n_rhs"].to_numpy(dtype="int64")
            viol = int((n > 1).sum())
            rows.append((fd, np.int64(len(n)), np.int64(viol),
                         np.int64(n.max()), np.int64(1 if viol == 0 else 0)))
        return pd.DataFrame(
            rows,
            columns=["fd", "n_lhs", "n_lhs_violating", "max_rhs_per_lhs",
                     "holds"],
        )

    return bucketed_group_apply(per_lhs, ["fd"], final, n_buckets=4)


def _fd_sql_col(name: str) -> str:
    return {
        "day": "strftime(CAST(ts AS DATE), '%Y-%m-%d')",
        "month": "strftime(CAST(ts AS DATE), '%Y-%m')",
        "dow": "CAST(isodow(ts) AS VARCHAR)",
        "hour": "CAST(hour(ts) AS VARCHAR)",
        "user": "CAST(user_id AS VARCHAR)",
        "event_type": "CAST(event_type AS VARCHAR)",
    }[name]


def fd_profile_sql() -> str:
    selects = [
        f"SELECT '{lhs}->{rhs}' AS fd, {_fd_sql_col(lhs)} AS lhs_val, "
        f"{_fd_sql_col(rhs)} AS rhs_val FROM events"
        for lhs, rhs in FD_CANDIDATES
    ]
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH pairs AS (
{union}
),
d AS (SELECT DISTINCT fd, lhs_val, rhs_val FROM pairs),
per_lhs AS (
  SELECT fd, lhs_val, CAST(COUNT(*) AS BIGINT) AS n_rhs
  FROM d GROUP BY fd, lhs_val
)
SELECT fd,
       CAST(COUNT(*) AS BIGINT) AS n_lhs,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lhs_violating,
       CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_lhs,
       CAST(CASE WHEN SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM per_lhs GROUP BY fd
"""


def kmv_distinct_users(
    events: ray.data.Dataset, k: int = 32, n_buckets: int = 16
) -> ray.data.Dataset:
    """K-MINIMUM-VALUES distinct-count sketch (Bar-Yossef et al. 2002) over
    user_id, WITH an exact-equality oracle: the estimate (k-1) * 2^64 / v_k
    (v_k = k-th smallest 64-bit md5 hash over the distinct keys) is fully
    DETERMINISTIC given the hash, so unlike the HLL consumer
    (``text_vocab_approx``, rows-only) this sketch query is value-hash
    verified end to end. The exact distinct count rides along as the audit
    column (disjoint per-bucket partials, added exactly).

    Shape: per-batch local user dedup, one user-bucketed exact dedup that
    emits each bucket's LOCAL bottom-k (tagged with the bucket's distinct
    partial), then a driver-side merge over <= n_buckets * k rows — a k-row
    exchange, never a corpus materialization. 64-bit hash order is kept
    exact by carrying (hi, lo) int64 halves (no uint64/double rounding).

    Output one row: k, n_exact (int64), est (float64),
    rel_err (float64, round 6)."""
    import hashlib

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": pd.unique(batch["user_id"].astype("int64")),
        })

    parts = events.select_columns(["user_id"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def bucket_bottom_k(bucket: pd.DataFrame) -> pd.DataFrame:
        uids = pd.unique(bucket["user_id"].astype("int64"))
        hv = sorted(
            int(hashlib.md5(f"u:{int(u)}".encode()).hexdigest()[:16], 16)
            for u in uids
        )[: max(int(k), 1)]
        # tag rows with the bucket's own distinct partial and an id unique
        # to the bucket (its smallest user) so the driver sums each bucket
        # exactly once
        return pd.DataFrame({
            "bucket_id": np.int64(int(uids.min())),
            "hi": np.array([v >> 32 for v in hv], dtype="int64"),
            "lo": np.array([v & 0xFFFFFFFF for v in hv], dtype="int64"),
            "n_part": np.int64(len(uids)),
        })

    bottoms = bucketed_group_apply(
        parts, ["user_id"], bucket_bottom_k, n_buckets=n_buckets
    ).to_pandas()  # <= n_buckets * k rows

    n_exact = int(
        bottoms.groupby("bucket_id", sort=False)["n_part"].first().sum()
    )
    top = bottoms.sort_values(["hi", "lo"], kind="mergesort").head(int(k))
    vk = (int(top["hi"].iloc[-1]) << 32) | int(top["lo"].iloc[-1])
    est = (int(k) - 1) * 2.0 ** 64 / float(vk)
    return ray.data.from_pandas(pd.DataFrame({
        "k": [np.int64(k)],
        "n_exact": [np.int64(n_exact)],
        "est": [float(est)],
        "rel_err": [float(np.round(abs(est - n_exact) / n_exact, 6))],
    }))


def kmv_distinct_users_sql(k: int = 32) -> str:
    return f"""
WITH RECURSIVE pw16(i, p) AS (
  SELECT 1, 1::HUGEINT UNION ALL SELECT i + 1, p * 16 FROM pw16 WHERE i < 16
),
du AS (SELECT DISTINCT user_id FROM events),
h AS (
  SELECT (SELECT SUM(
            (strpos('0123456789abcdef',
                    substring(md5('u:' || CAST(user_id AS VARCHAR)),
                              CAST(17 - i AS INT), 1)) - 1)::HUGEINT * p)
          FROM pw16) AS u64
  FROM du
),
bot AS (SELECT u64 FROM h ORDER BY u64 LIMIT {k}),
vk AS (SELECT MAX(u64) AS v FROM bot),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM du)
SELECT CAST({k} AS BIGINT) AS k,
       n.c AS n_exact,
       ({k} - 1) * power(2.0, 64) / CAST(vk.v AS DOUBLE) AS est,
       ROUND(ABS(({k} - 1) * power(2.0, 64) / CAST(vk.v AS DOUBLE)
                 - CAST(n.c AS DOUBLE)) / CAST(n.c AS DOUBLE), 6)
         AS rel_err
FROM vk, n
"""


def forecast_backtest(
    events: ray.data.Dataset, lags: tuple = (1, 7), n_buckets: int = 8
) -> ray.data.Dataset:
    """NAIVE-FORECAST BACKTEST: per event type, the mean absolute error of
    the persistence forecast (predict today's spend = spend ``lag`` days
    ago) at lag 1 (yesterday) and lag 7 (seasonal-naive, same weekday last
    week) — the baseline error floor any real forecaster must beat, and the
    first number a forecasting pipeline's offline eval produces. Only days
    where BOTH actual and lagged values exist are scored (inner self-join;
    no imputation).

    Exact: daily totals are integer cents, errors are integer cents, MAE is
    one int/int division rounded 6 — identical on both sides. Per-type
    series live in one bucket (calendar-bounded, like
    ``rolling_median_daily``); the lag alignment is a vectorized self-merge,
    not a per-row loop. Output: event_type, lag_days, n_scored (int64),
    mae_cents (float64 round 6)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    US_PER_DAY = 86_400_000_000

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "day_i": us // US_PER_DAY,
            "c": cents_i64(batch["value"].to_numpy()),
        }).groupby(["event_type", "day_i"], sort=False)["c"].sum()
        return g.astype("int64").reset_index()

    parts = events.select_columns(["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.groupby(["event_type", "day_i"], sort=False)["c"].sum() \
            .astype("int64").reset_index()
        out = []
        for lag in lags:
            lagged = d.rename(columns={"c": "c_lag"}).copy()
            lagged["day_i"] = lagged["day_i"] + int(lag)
            m = d.merge(lagged, on=["event_type", "day_i"], how="inner")
            if not len(m):
                continue
            err = np.abs(m["c"].to_numpy(dtype="int64")
                         - m["c_lag"].to_numpy(dtype="int64"))
            g = pd.DataFrame({
                "event_type": m["event_type"].to_numpy(),
                "err": err,
            }).groupby("event_type", sort=False)["err"] \
                .agg(["sum", "count"]).reset_index()
            out.append(pd.DataFrame({
                "event_type": g["event_type"].to_numpy(),
                "lag_days": np.int64(lag),
                "n_scored": g["count"].astype("int64").to_numpy(),
                "mae_cents": np.round(
                    g["sum"].astype("int64").to_numpy(dtype="float64")
                    / g["count"].astype("int64").to_numpy(dtype="float64"),
                    6,
                ),
            }))
        if not out:
            return pd.DataFrame({
                "event_type": pd.Series(dtype="object"),
                "lag_days": pd.Series(dtype="int64"),
                "n_scored": pd.Series(dtype="int64"),
                "mae_cents": pd.Series(dtype="float64"),
            })
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(parts, ["event_type"], per_bucket,
                                n_buckets=n_buckets)


FORECAST_BACKTEST_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_i,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
),
l AS (
  SELECT a.event_type, 1 AS lag_days, ABS(a.c - b.c) AS err
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.day_i = a.day_i - 1
  UNION ALL
  SELECT a.event_type, 7 AS lag_days, ABS(a.c - b.c) AS err
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.day_i = a.day_i - 7
)
SELECT event_type, CAST(lag_days AS BIGINT) AS lag_days,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       ROUND(CAST(SUM(err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mae_cents
FROM l GROUP BY event_type, lag_days
"""


def dynamic_threshold_alerts(
    events: ray.data.Dataset,
    lookback_days: int = 28,
    min_prior: int = 8,
    q: float = 0.95,
    n_buckets: int = 8,
) -> ray.data.Dataset:
    """DYNAMIC-THRESHOLD anomaly alerts: days whose per-type spend exceeds
    the empirical p95 of that type's own TRAILING window (the prior
    ``lookback_days`` calendar days, current day excluded) — the
    self-calibrating alert rule a monitoring system uses instead of a fixed
    threshold (``events_zscore_days`` is the global-stats cousin; this one
    adapts as the level drifts, and needs >= ``min_prior`` observed prior
    days before it may fire).

    The threshold is the TYPE-1 EMPIRICAL QUANTILE — the ceil(q*n)-th
    smallest prior value, a pure SELECTION on exact integer cents: no
    interpolation arithmetic at all (DuckDB's WINDOWED quantile_cont lerps
    1 ulp differently from its aggregate form — measured — so an
    interpolated threshold cannot be oracle-exact; a selected order
    statistic trivially is). Both sides compute k = CEIL(q * n) with the
    identical double product, so the rank cannot diverge either. Per-type
    day loop is CALENDAR-BOUNDED.

    Output: event_type, day ('%Y-%m-%d'), value_cents, thr_cents,
    n_prior (all int64 except day)."""
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    US_PER_DAY = 86_400_000_000

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "day_i": us // US_PER_DAY,
            "c": cents_i64(batch["value"].to_numpy()),
        }).groupby(["event_type", "day_i"], sort=False)["c"].sum()
        return g.astype("int64").reset_index()

    parts = events.select_columns(["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.groupby(["event_type", "day_i"], sort=False)["c"].sum() \
            .astype("int64").reset_index()
        rows = []
        for et, grp in d.groupby("event_type", sort=False):
            g = grp.sort_values("day_i", kind="mergesort")
            day = g["day_i"].to_numpy(dtype="int64")
            c = g["c"].to_numpy(dtype="int64")
            for i in range(len(day)):
                lo = int(np.searchsorted(day, day[i] - lookback_days,
                                         side="left"))
                n_prior = i - lo  # days unique & sorted: [lo, i) = window
                if n_prior < min_prior:
                    continue
                k = int(math.ceil(q * n_prior))
                thr = int(np.sort(c[lo:i])[k - 1])
                if int(c[i]) > thr:
                    rows.append((et, int(day[i]), int(c[i]), thr,
                                 int(n_prior)))
        out = pd.DataFrame(
            rows, columns=["event_type", "day_i", "value_cents",
                           "thr_cents", "n_prior"]
        )
        days = pd.to_datetime(
            out["day_i"].to_numpy(dtype="int64") * US_PER_DAY, unit="us"
        )
        return pd.DataFrame({
            "event_type": out["event_type"].to_numpy(),
            "day": days.strftime("%Y-%m-%d"),
            "value_cents": out["value_cents"].astype("int64").to_numpy(),
            "thr_cents": out["thr_cents"].astype("int64").to_numpy(),
            "n_prior": out["n_prior"].astype("int64").to_numpy(),
        })

    return bucketed_group_apply(parts, ["event_type"], per_bucket,
                                n_buckets=n_buckets)


def dynamic_threshold_alerts_sql(
    lookback_days: int = 28, min_prior: int = 8, q: float = 0.95
) -> str:
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_i,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
),
win AS (
  SELECT a.event_type, a.day_i, a.c AS c_now, b.c AS c_prior,
         ROW_NUMBER() OVER (PARTITION BY a.event_type, a.day_i
                            ORDER BY b.c, b.day_i) AS rn,
         COUNT(*) OVER (PARTITION BY a.event_type, a.day_i) AS n_prior
  FROM daily a
  JOIN daily b
    ON b.event_type = a.event_type
   AND b.day_i BETWEEN a.day_i - {lookback_days} AND a.day_i - 1
),
thr AS (
  SELECT event_type, day_i, c_now, c_prior AS thr_c, n_prior
  FROM win
  WHERE n_prior >= {min_prior} AND rn = CAST(CEIL({q} * n_prior) AS BIGINT)
)
SELECT event_type,
       strftime(CAST(to_timestamp(day_i * 86400) AS DATE), '%Y-%m-%d')
         AS day,
       CAST(c_now AS BIGINT) AS value_cents,
       CAST(thr_c AS BIGINT) AS thr_cents,
       CAST(n_prior AS BIGINT) AS n_prior
FROM thr
WHERE c_now > thr_c
"""


def max_drawdown_daily(
    events: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """MAX DRAWDOWN of the per-type daily-spend series: the largest
    peak-to-trough decline MAX over days d of (running-max before-or-at d
    minus spend at d) — the risk metric a revenue-monitoring dashboard
    tracks (a big drawdown = demand collapsed from its local peak; the
    CUSUM/changepoint pair detects level shifts, this measures worst-case
    decline depth). All integer cents; tie-break: the EARLIEST trough day
    achieving the max drawdown, and the EARLIEST peak day carrying the
    running max at that trough.

    Shape: exact-cent daily partials, one type-bucketed fold; running max
    and argmax are one vectorized np.maximum.accumulate per type over the
    CALENDAR-BOUNDED daily series. Output: event_type,
    max_drawdown_cents (int64), peak_day, trough_day ('%Y-%m-%d'),
    peak_cents, trough_cents (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    US_PER_DAY = 86_400_000_000

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "day_i": us // US_PER_DAY,
            "c": cents_i64(batch["value"].to_numpy()),
        }).groupby(["event_type", "day_i"], sort=False)["c"].sum()
        return g.astype("int64").reset_index()

    parts = events.select_columns(["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def fmt_day(day_i: int) -> str:
        return pd.Timestamp(int(day_i) * US_PER_DAY, unit="us") \
            .strftime("%Y-%m-%d")

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.groupby(["event_type", "day_i"], sort=False)["c"].sum() \
            .astype("int64").reset_index()
        rows = []
        for et, grp in d.groupby("event_type", sort=False):
            g = grp.sort_values("day_i", kind="mergesort")
            day = g["day_i"].to_numpy(dtype="int64")
            c = g["c"].to_numpy(dtype="int64")
            rm = np.maximum.accumulate(c)
            dd = rm - c
            mdd = int(dd.max())
            ti = int(np.flatnonzero(dd == mdd)[0])  # earliest trough
            # earliest peak day carrying the running max at the trough
            pi = int(np.flatnonzero(c[: ti + 1] == rm[ti])[0])
            rows.append((et, np.int64(mdd), fmt_day(day[pi]),
                         fmt_day(day[ti]), np.int64(int(rm[ti])),
                         np.int64(int(c[ti]))))
        return pd.DataFrame(
            rows,
            columns=["event_type", "max_drawdown_cents", "peak_day",
                     "trough_day", "peak_cents", "trough_cents"],
        )

    return bucketed_group_apply(parts, ["event_type"], per_bucket,
                                n_buckets=n_buckets)


MAX_DRAWDOWN_DAILY_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_i,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
),
w AS (
  SELECT event_type, day_i, c,
         MAX(c) OVER (PARTITION BY event_type ORDER BY day_i) AS rm
  FROM daily
),
m AS (
  SELECT event_type, MAX(rm - c) AS mdd FROM w GROUP BY event_type
),
trough AS (
  SELECT w.event_type, m.mdd, MIN(w.day_i) AS t_day
  FROM w JOIN m ON m.event_type = w.event_type AND w.rm - w.c = m.mdd
  GROUP BY w.event_type, m.mdd
),
tvals AS (
  SELECT t.event_type, t.mdd, t.t_day, w.rm AS peak_c, w.c AS trough_c
  FROM trough t
  JOIN w ON w.event_type = t.event_type AND w.day_i = t.t_day
),
peak AS (
  SELECT tv.event_type, MIN(w.day_i) AS p_day
  FROM tvals tv
  JOIN w ON w.event_type = tv.event_type AND w.day_i <= tv.t_day
        AND w.c = tv.peak_c
  GROUP BY tv.event_type
)
SELECT tv.event_type,
       CAST(tv.mdd AS BIGINT) AS max_drawdown_cents,
       strftime(CAST(to_timestamp(p.p_day * 86400) AS DATE), '%Y-%m-%d')
         AS peak_day,
       strftime(CAST(to_timestamp(tv.t_day * 86400) AS DATE), '%Y-%m-%d')
         AS trough_day,
       CAST(tv.peak_c AS BIGINT) AS peak_cents,
       CAST(tv.trough_c AS BIGINT) AS trough_cents
FROM tvals tv JOIN peak p ON p.event_type = tv.event_type
"""


def time_weighted_value(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """TIME-WEIGHTED AVERAGE value per user — the metering/billing
    aggregate: the user's ``value`` is a step signal (held constant from
    each event until the next), and the TWA is the exact Riemann integral
    over [first_ts, last_ts] divided by the span. A plain AVG over events
    oversamples bursty periods; TWA is what a usage-based bill or a
    time-series downsampler actually wants.

    Exactness: the integral is SUM(value_cents * hold_us) in integers
    (cents x microseconds; bounded by span x max-cents — int64-safe at the
    tested scales, the documented 128-bit upgrade point at corpus scale),
    and the TWA is ONE division of exact integers rounded 6, identical on
    both sides. Users with a single event have an empty span and are
    excluded (no interval to integrate). Ordering ties break by event_id.

    Shape: per-user bucketed apply; hold intervals via one vectorized
    shift inside the bucket. Output: user_id, n_events, span_us,
    integral_cents_us (int64), twa_value (float64 round 6)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        return pd.DataFrame({
            "user_id": batch["user_id"].astype("int64").to_numpy(),
            "us": us,
            "event_id": batch["event_id"].astype("int64").to_numpy(),
            "c": cents_i64(batch["value"].to_numpy()),
        })

    parts = events.select_columns(
        ["user_id", "ts", "event_id", "value"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["user_id", "us", "event_id"],
                               kind="mergesort")
        uid = g["user_id"].to_numpy(dtype="int64")
        us = g["us"].to_numpy(dtype="int64")
        c = g["c"].to_numpy(dtype="int64")
        same_next = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same_next[:-1] = uid[:-1] == uid[1:]
        hold = np.zeros(len(g), dtype="int64")
        if len(g) > 1:
            hold[:-1] = np.where(same_next[:-1], us[1:] - us[:-1], 0)
        seg = pd.DataFrame({
            "user_id": uid,
            "n": np.int64(1),
            "span": hold,
            "integral": c * hold,
        }).groupby("user_id", sort=False).sum().reset_index()
        seg = seg[seg["span"] > 0]
        twa = np.round(
            seg["integral"].astype("int64").to_numpy(dtype="float64")
            / seg["span"].astype("int64").to_numpy(dtype="float64")
            / 100.0, 6
        )
        return pd.DataFrame({
            "user_id": seg["user_id"].astype("int64").to_numpy(),
            "n_events": seg["n"].astype("int64").to_numpy(),
            "span_us": seg["span"].astype("int64").to_numpy(),
            "integral_cents_us": seg["integral"].astype("int64").to_numpy(),
            "twa_value": twa,
        })

    return bucketed_group_apply(parts, ["user_id"], per_bucket,
                                n_buckets=n_buckets)


TIME_WEIGHTED_VALUE_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS c,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_us
  FROM events
),
seg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(COALESCE(next_us - us, 0)) AS BIGINT) AS span_us,
         CAST(SUM(CASE WHEN next_us IS NOT NULL
                       THEN c * (next_us - us) ELSE 0 END) AS BIGINT)
           AS integral_cents_us
  FROM ev GROUP BY user_id
)
SELECT user_id, n_events, span_us, integral_cents_us,
       ROUND(CAST(integral_cents_us AS DOUBLE) / CAST(span_us AS DOUBLE)
             / 100.0, 6) AS twa_value
FROM seg WHERE span_us > 0
"""


def trimmed_mean_value(
    events: ray.data.Dataset, trim: float = 0.1, n_buckets: int = 8
) -> ray.data.Dataset:
    """TWO-SIDED TRIMMED MEAN of per-type event values — the robust center
    that simply DROPS the top and bottom ``trim`` fraction (ranks 1..t and
    n-t+1..n with t = floor(trim*n)) before averaging, complementing
    ``clean_winsorize`` (which clamps instead of dropping). Selection +
    integer sum: the kept values are exact cents chosen by rank, their sum
    is int64, and the mean is ONE division rounded 6 — no float quantile
    arithmetic anywhere. t is floor(trim*n) with the identical double
    product on both sides.

    Per-type value vectors are sorted inside one type bucket (values,
    not days — the one per-type O(rows) sort this family accepts, the
    same bound as the exact-quantile machinery). Output: event_type, n,
    n_trimmed_each_side (int64), trimmed_mean (float64 round 6)."""
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "c": cents_i64(batch["value"].to_numpy()),
        })

    parts = events.select_columns(["event_type", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in bucket.groupby("event_type", sort=False):
            c = np.sort(g["c"].to_numpy(dtype="int64"))
            n = len(c)
            t = int(math.floor(trim * n))
            kept = c[t:n - t] if n - 2 * t > 0 else c[0:0]
            if not len(kept):
                continue
            s = int(kept.sum())
            rows.append((
                et, np.int64(n), np.int64(t),
                float(np.round(s / len(kept) / 100.0, 6)),
            ))
        return pd.DataFrame(
            rows,
            columns=["event_type", "n", "n_trimmed_each_side",
                     "trimmed_mean"],
        ).astype({"n": "int64", "n_trimmed_each_side": "int64",
                  "trimmed_mean": "float64"})

    return bucketed_group_apply(parts, ["event_type"], per_bucket,
                                n_buckets=n_buckets)


def trimmed_mean_value_sql(trim: float = 0.1) -> str:
    return f"""
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value,
                            event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
t AS (
  SELECT event_type, c, n,
         CAST(FLOOR({trim} * n) AS BIGINT) AS tt
  FROM v WHERE rn > FLOOR({trim} * n) AND rn <= n - FLOOR({trim} * n)
)
SELECT event_type,
       CAST(ANY_VALUE(n) AS BIGINT) AS n,
       CAST(ANY_VALUE(tt) AS BIGINT) AS n_trimmed_each_side,
       ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0, 6)
         AS trimmed_mean
FROM t GROUP BY event_type
"""


def ab_srm_check(events: ray.data.Dataset, n_buckets: int = 8) -> ray.data.Dataset:
    """SAMPLE-RATIO MISMATCH check for the deterministic 50/50 A/B
    assignment of ``events_ab_readout``: per event type, are the arm sizes
    consistent with the intended split, or did the bucketing leak bias
    (THE standard experimentation-QA gate — a mismatched ratio invalidates
    the readout before any metric is looked at)? The z² statistic
    (na - nb)^2 / n is reported, and the flag is decided in PURE INTEGERS:
    srm_flag = 1 iff (na - nb)^2 > 9 * n (|z| > 3).

    Output: event_type, n_a, n_b (int64), z2 (float64 round 6),
    srm_flag (int64)."""
    import hashlib  # noqa: F401  (assignment mirrors ab_readout's md5 arm)

    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.asarray(
            md5_hex(batch["user_id"].astype("int64").astype(str)
                    .to_numpy()),
            dtype="U32",
        ).astype("U1")
        arm_a = h <= "7"
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "a": arm_a.astype("int64"),
            "b": (~arm_a).astype("int64"),
        }).groupby("event_type", sort=False)[["a", "b"]].sum()
        return g.astype("int64").reset_index()

    parts = events.select_columns(["event_type", "user_id"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def fold(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False)[["a", "b"]].sum() \
            .astype("int64").reset_index()
        na = g["a"].to_numpy(dtype="int64")
        nb = g["b"].to_numpy(dtype="int64")
        d2 = (na - nb) ** 2
        n = na + nb
        return pd.DataFrame({
            "event_type": g["event_type"].to_numpy(),
            "n_a": na,
            "n_b": nb,
            "z2": np.round(d2.astype("float64") / n.astype("float64"), 6),
            "srm_flag": (d2 > 9 * n).astype("int64"),
        })

    return bucketed_group_apply(parts, ["event_type"], fold,
                                n_buckets=n_buckets)


AB_SRM_CHECK_SQL = """
WITH f AS (
  SELECT event_type,
         substring(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7' AS arm_a
  FROM events
),
g AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM f GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE), 6) AS z2,
       CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) > 9 * (n_a + n_b)
            THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM g
"""


def dow_chi2(events: ray.data.Dataset, n_buckets: int = 8) -> ray.data.Dataset:
    """WEEKDAY-UNIFORMITY goodness of fit: per event type, the chi-square
    statistic of the seven day-of-week counts against a uniform split —
    is traffic flat across the week (bot smell) or does it breathe
    (``events_dow_profile`` shows the shape; this is the single-number
    test on it)? Against E = N/7 the statistic reduces to
    chi2 = (7 * sum(o_d^2) - N^2) / N — an EXACT INTEGER numerator over N,
    emitted as the audit column, with the float one division rounded 6.
    df = 6 always (all seven weekdays occur or count 0).

    Output: event_type, n (int64), chi2_num (int64), chi2 (float64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        dow = (pd.to_datetime(batch["ts"]).dt.dayofweek + 1) \
            .astype("int64").to_numpy()
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "dow": dow,
        }).groupby(["event_type", "dow"], sort=False).size() \
            .astype("int64").reset_index(name="o")
        return g

    parts = events.select_columns(["event_type", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def fold(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.groupby(["event_type", "dow"], sort=False)["o"].sum() \
            .astype("int64").reset_index()
        rows = []
        for et, g in d.groupby("event_type", sort=False):
            o = g["o"].to_numpy(dtype="int64")
            n = int(o.sum())
            num = int(7 * int((o * o).sum()) - n * n)
            rows.append((et, np.int64(n), np.int64(num),
                         float(np.round(num / n, 6))))
        return pd.DataFrame(
            rows, columns=["event_type", "n", "chi2_num", "chi2"]
        ).astype({"n": "int64", "chi2_num": "int64", "chi2": "float64"})

    return bucketed_group_apply(parts, ["event_type"], fold,
                                n_buckets=n_buckets)


DOW_CHI2_SQL = """
WITH d AS (
  SELECT event_type, isodow(ts) AS dow, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, isodow(ts)
),
s AS (
  SELECT event_type,
         CAST(SUM(o) AS BIGINT) AS n,
         CAST(7 * SUM(o * o) - SUM(o) * SUM(o) AS BIGINT) AS chi2_num
  FROM d GROUP BY event_type
)
SELECT event_type, n, chi2_num,
       ROUND(CAST(chi2_num AS DOUBLE) / CAST(n AS DOUBLE), 6) AS chi2
FROM s
"""


def peak_concurrency(
    events: ray.data.Dataset, gap_s: float = 1800.0, n_buckets: int = 32
) -> ray.data.Dataset:
    """PEAK SESSION CONCURRENCY: the maximum number of simultaneously
    active sessions (gap-``gap_s`` sessionization, closed intervals
    [first_ts, last_ts]) and the earliest microsecond it is reached — the
    capacity-sizing number a serving fleet is provisioned against
    (``rel_transit_backlog`` is the same sweep-line on order intervals;
    this composes it with the sessionizer).

    Exact sweep-line in two phases (the ``pack_sequences`` offset
    discipline): +1/-1 deltas at interval boundaries bucket by DAY; each
    day task sorts only its own boundaries and reports (total delta,
    within-day running max, earliest argmax us); the driver folds a
    DAY-BOUNDED exclusive prefix — concurrency only changes at boundary
    events, so sampling at deltas is exact. All integer.

    Output one row: n_sessions, peak_concurrency (int64),
    peak_at_us (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    US_PER_DAY = 86_400_000_000

    sess = sessionize(events, gap_s=gap_s)

    def deltas(batch: pd.DataFrame) -> pd.DataFrame:
        f = pd.to_datetime(batch["first_ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        l = pd.to_datetime(batch["last_ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        us = np.concatenate([f, l + 1])
        dl = np.concatenate([
            np.ones(len(f), dtype="int64"),
            np.full(len(l), -1, dtype="int64"),
        ])
        d = pd.DataFrame({"day": us // US_PER_DAY, "us": us, "dl": dl})
        g = d.groupby(["day", "us"], sort=False)["dl"].sum()
        out = g.astype("int64").reset_index()
        out["n_sess"] = np.int64(0)
        # session count partial rides along (one per first-boundary row set)
        out.loc[out.index[:1], "n_sess"] = np.int64(len(f))
        return out

    parts = sess.map_batches(deltas, batch_format="pandas",
                             batch_size=65536)

    def per_day(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["day", "us"], sort=False) \
            .agg(dl=("dl", "sum"), n_sess=("n_sess", "sum")).reset_index()
        rows = []
        for day, dgrp in g.groupby("day", sort=False):
            dg = dgrp.sort_values("us", kind="mergesort")
            cum = dg["dl"].astype("int64").to_numpy().cumsum()
            mx = int(cum.max())
            at = int(dg["us"].to_numpy()[int(np.flatnonzero(cum == mx)[0])])
            rows.append((int(day), int(cum[-1]), mx, at,
                         int(dg["n_sess"].sum())))
        return pd.DataFrame(
            rows,
            columns=["day", "total_dl", "rel_max", "rel_argmax_us",
                     "n_sess"],
        ).astype("int64")

    day_parts = bucketed_group_apply(parts, ["day"], per_day,
                                     n_buckets=n_buckets).to_pandas()
    # driver fold: DAY-bounded exclusive prefix over sorted days
    d = day_parts.sort_values("day").reset_index(drop=True)
    prefix_excl = np.concatenate([
        [0], d["total_dl"].to_numpy(dtype="int64").cumsum()[:-1]
    ])
    glob = prefix_excl + d["rel_max"].to_numpy(dtype="int64")
    pk = int(glob.max()) if len(glob) else 0
    first = int(np.flatnonzero(glob == pk)[0]) if len(glob) else 0
    return ray.data.from_pandas(pd.DataFrame({
        "n_sessions": [np.int64(int(d["n_sess"].sum()) if len(d) else 0)],
        "peak_concurrency": [np.int64(pk)],
        "peak_at_us": [np.int64(
            int(d["rel_argmax_us"].iloc[first]) if len(d) else 0
        )],
    }))


def peak_concurrency_sql(gap_s: float = 1800.0) -> str:
    sess = SESSIONIZE_SQL_TEMPLATE.format(gap_s=gap_s)
    return f"""
WITH sess AS MATERIALIZED ({sess}),
d AS (
  SELECT epoch_us(first_ts) AS us, 1 AS dl FROM sess
  UNION ALL
  SELECT epoch_us(last_ts) + 1, -1 FROM sess
),
g AS (SELECT us, SUM(dl) AS dl FROM d GROUP BY us),
c AS (SELECT us, SUM(dl) OVER (ORDER BY us) AS conc FROM g),
m AS (SELECT MAX(conc) AS pk FROM c)
SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
       CAST(m.pk AS BIGINT) AS peak_concurrency,
       CAST((SELECT MIN(us) FROM c WHERE conc = m.pk) AS BIGINT)
         AS peak_at_us
FROM m
"""
