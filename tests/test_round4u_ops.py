"""Planted tests for the round-4u operator batch (Theil-Sen robust daily
trend, functional-dependency profiler, KMV distinct sketch)."""

from __future__ import annotations

import hashlib

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


def test_theil_sen_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import theil_sen_daily

    DAY = 86_400_000_000
    # type a: daily cents 100, 200, 300, 10000 on days 0..3
    # pairwise slopes (cents/day): 100, 100, 100 (consecutive pairs of the
    # linear part), 4950, 4900, 9700 -> sorted [100,100,100,4900,4950,9700]
    # lower median (rank 3 of 6) = 100: the whale day does not move it
    df = _events([
        (0, 0 * DAY, 1, "a", 1.00),
        (1, 1 * DAY, 1, "a", 2.00),
        (2, 2 * DAY, 1, "a", 3.00),
        (3, 3 * DAY, 1, "a", 100.00),
        (4, 0 * DAY, 1, "b", 5.00),  # single day -> no pairs -> excluded
    ])
    got = theil_sen_daily(
        ray.data.from_pandas(df).repartition(3), n_buckets=4
    ).to_pandas().set_index("event_type")
    assert list(got.index) == ["a"]
    assert got.loc["a", "n_days"] == 4
    assert got.loc["a", "n_pairs"] == 6
    assert got.loc["a", "slope_cents_per_day"] == 100.0
    # OLS on the same series would be yanked far above 100 by the outlier
    assert got["slope_cents_per_day"].dtype == np.float64


def test_fd_profile_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import FD_CANDIDATES, fd_profile

    DAY = 86_400_000_000
    # two days, two users; user 1 has two event types (violates
    # user->event_type); each day maps to one month and one dow (holds)
    df = _events([
        (0, 0 * DAY, 1, "a", 0.0),
        (1, 0 * DAY + 5, 1, "b", 0.0),
        (2, 1 * DAY, 2, "a", 0.0),
    ])
    got = fd_profile(
        ray.data.from_pandas(df).repartition(2), n_buckets=4
    ).to_pandas().set_index("fd")
    assert len(got) == len(FD_CANDIDATES)
    assert got.loc["day->month", "holds"] == 1
    assert got.loc["day->dow", "holds"] == 1
    assert got.loc["user->event_type", "holds"] == 0
    assert got.loc["user->event_type", "n_lhs"] == 2
    assert got.loc["user->event_type", "n_lhs_violating"] == 1
    assert got.loc["user->event_type", "max_rhs_per_lhs"] == 2
    for c in ("n_lhs", "n_lhs_violating", "max_rhs_per_lhs", "holds"):
        assert got[c].dtype == np.int64


def test_kmv_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import kmv_distinct_users

    # 200 distinct users, k=16; reference estimate recomputed independently
    rows = [(i, i * 1_000_000, i % 200, "a", 0.0) for i in range(600)]
    df = _events(rows)
    k = 16
    got = kmv_distinct_users(
        ray.data.from_pandas(df).repartition(4), k=k, n_buckets=4
    ).to_pandas().iloc[0]
    assert got["n_exact"] == 200
    hv = sorted(
        int(hashlib.md5(f"u:{u}".encode()).hexdigest()[:16], 16)
        for u in range(200)
    )
    want_est = (k - 1) * 2.0 ** 64 / float(hv[k - 1])
    assert got["est"] == want_est
    assert got["rel_err"] == np.round(abs(want_est - 200) / 200, 6)
    # a KMV estimate at k=16 should land within ~60% of truth even on a
    # tiny key space (sanity bound, not the exactness claim above)
    assert 0.4 * 200 < got["est"] < 2.5 * 200
