"""Planted tests for the round-4f operator batch (user growth, order gaps,
attribution, per-doc keywords, readability, directed triads, HITS,
per-user anomalies)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def test_user_growth_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import user_growth

    # u1 first on d1 (active d1,d2); u2 first on d1; u3 first on d2; one
    # whale user (u9) with many same-day events must count once per day
    rows = [
        (1, "2024-01-01 10:00"), (1, "2024-01-01 11:00"),
        (1, "2024-01-02 09:00"),
        (2, "2024-01-01 23:59"),
        (3, "2024-01-02 00:00"),
    ]
    rows += [(9, f"2024-01-02 03:{m:02d}") for m in range(50)]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array([r[0] for r in rows], dtype="int64"),
        "ts": pd.to_datetime([r[1] for r in rows]),
    })
    got = (
        user_growth(ray.data.from_pandas(df).repartition(4))
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    assert list(got["day"]) == ["2024-01-01", "2024-01-02"]
    assert list(got["new_users"]) == [2, 2]      # {1,2} then {3,9}
    assert list(got["active_users"]) == [2, 3]   # {1,2} then {1,3,9}
    assert list(got["cum_users"]) == [2, 4]
    assert got["new_users"].dtype == "int64"
    assert got["cum_users"].dtype == "int64"


def test_user_growth_empty(ray_session):
    from tcx2graph_jl_ray.stages.window import user_growth

    df = pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
    })
    got = user_growth(ray.data.from_pandas(df))
    assert isinstance(got, pd.DataFrame) and len(got) == 0
    assert list(got.columns) == ["day", "new_users", "active_users",
                                 "cum_users"]
