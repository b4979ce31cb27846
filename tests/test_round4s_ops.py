"""Planted tests for the round-4s operator batch (SCD type-2 state
history, rate-limit throttle dedup, LOCF daily forward fill)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _events(rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts_us", "user_id", "event_type", "value"]
    )
    return pd.DataFrame({
        "event_id": df["event_id"].astype("int64"),
        "ts": pd.to_datetime(df["ts_us"], unit="us"),
        "user_id": df["user_id"].astype("int64"),
        "event_type": df["event_type"],
        "value": df["value"].astype("float64"),
    })


def test_scd2_history_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import scd2_history

    US = 1_000_000
    # user 1: a a b a  (3 runs); user 2: b (1 open run)
    df = _events([
        (0, 10 * US, 1, "a", 1.0),
        (1, 20 * US, 1, "a", 2.0),
        (2, 30 * US, 1, "b", 3.0),
        (3, 40 * US, 1, "a", 4.0),
        (4, 15 * US, 2, "b", 5.0),
    ])
    got = (
        scd2_history(ray.data.from_pandas(df).repartition(3), n_buckets=4)
        .to_pandas()
        .sort_values(["user_id", "run_idx"])
        .reset_index(drop=True)
    )
    assert list(got["user_id"]) == [1, 1, 1, 2]
    assert list(got["run_idx"]) == [1, 2, 3, 1]
    assert list(got["state"]) == ["a", "b", "a", "b"]
    assert list(got["valid_from_us"]) == [10 * US, 30 * US, 40 * US, 15 * US]
    assert list(got["valid_to_us"]) == [30 * US, 40 * US, -1, -1]
    assert list(got["n_events"]) == [2, 1, 1, 1]
    assert list(got["is_current"]) == [0, 0, 1, 1]
    for c in ("user_id", "run_idx", "valid_from_us", "valid_to_us",
              "n_events", "is_current"):
        assert got[c].dtype == np.int64


def test_throttle_dedup_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import throttle_dedup

    US = 1_000_000
    W = 10 * US
    # user 1 type x at t=0,5,9,10,25: kept 0,10,25 -> 3 kept, 2 dropped
    # (t=5 and t=9 are inside the window of the KEPT t=0, and t=10 resets
    # the window, which plain gap-sessionization would get wrong)
    # user 2 type x at t=0: kept
    # user 1 type y at t=0, 9: kept 0, dropped 9
    df = _events([
        (0, 0 * US, 1, "x", 0.0),
        (1, 5 * US, 1, "x", 0.0),
        (2, 9 * US, 1, "x", 0.0),
        (3, 10 * US, 1, "x", 0.0),
        (4, 25 * US, 1, "x", 0.0),
        (5, 0 * US, 2, "x", 0.0),
        (6, 0 * US, 1, "y", 0.0),
        (7, 9 * US, 1, "y", 0.0),
    ])
    got = (
        throttle_dedup(
            ray.data.from_pandas(df).repartition(4), window_us=W, n_buckets=4
        )
        .to_pandas()
        .set_index("event_type")
    )
    assert got.loc["x", "n_events"] == 6
    assert got.loc["x", "n_kept"] == 4          # 3 (user 1) + 1 (user 2)
    assert got.loc["x", "n_dropped"] == 2
    assert got.loc["y", "n_kept"] == 1
    assert got.loc["y", "n_dropped"] == 1
    for c in ("n_events", "n_kept", "n_dropped"):
        assert got[c].dtype == np.int64


def test_forward_fill_daily_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import forward_fill_daily

    DAY = 86_400_000_000
    # user 1 active on days 0, 3 (two events on day 3 — later one wins),
    # so the grid is days 0..3 with days 1,2 filled from day 0
    # user 2 active on day 5 only -> single-day grid
    df = _events([
        (0, 0 * DAY + 7, 1, "a", 1.5),
        (1, 3 * DAY + 5, 1, "a", 2.5),
        (2, 3 * DAY + 9, 1, "a", 3.5),
        (3, 5 * DAY + 1, 2, "a", 9.0),
    ])
    got = (
        forward_fill_daily(
            ray.data.from_pandas(df).repartition(3), n_buckets=4
        )
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    u1 = got[got["user_id"] == 1]
    assert list(u1["day"]) == [
        "1970-01-01", "1970-01-02", "1970-01-03", "1970-01-04"
    ]
    assert list(u1["value"]) == [1.5, 1.5, 1.5, 3.5]
    assert list(u1["observed"]) == [1, 0, 0, 1]
    u2 = got[got["user_id"] == 2]
    assert list(u2["day"]) == ["1970-01-06"]
    assert list(u2["value"]) == [9.0]
    assert list(u2["observed"]) == [1]
    assert got["observed"].dtype == np.int64
    assert got["value"].dtype == np.float64
