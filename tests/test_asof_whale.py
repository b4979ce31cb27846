"""Planted-whale tests for the time-sliced boundary-carry as-of join
(round-4 verdict directive 7): the sliced path must produce byte-identical
output to the direct per-user-bucket path while keeping every per-task
group bounded by the densest single slice."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from tcx2graph_jl_ray.stages.window import (
    _max_user_rows,
    asof_join_events,
)


def _mk_events(rng: np.random.Generator) -> pd.DataFrame:
    """A whale user (id 1: 600 events over ~14 months, so several 30-day
    slices, some slices left-only), plus normal users, plus a user whose
    right events all precede the lefts by many slices (deep carry)."""
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    # whale: interleaved clicks/purchases over 420 days
    for i in range(600):
        ts = base + pd.Timedelta(
            days=float(rng.uniform(0, 420)), seconds=float(rng.uniform(0, 60))
        )
        rows.append((eid, ts, 1, "click" if i % 3 else "purchase"))
        eid += 1
    # left-only stretch: purchases with NO clicks for 3 slices
    for i in range(20):
        ts = base + pd.Timedelta(days=500 + float(rng.uniform(0, 10)))
        rows.append((eid, ts, 1, "purchase"))
        eid += 1
    # deep carry user 2: one click in slice 0, purchases ~8 slices later
    rows.append((eid, base, 2, "click")); eid += 1
    for i in range(5):
        ts = base + pd.Timedelta(days=250 + i)
        rows.append((eid, ts, 2, "purchase")); eid += 1
    # user 3: purchases but zero clicks ever (all unmatched)
    for i in range(4):
        ts = base + pd.Timedelta(days=30 * i)
        rows.append((eid, ts, 3, "purchase")); eid += 1
    # normal users
    for u in range(4, 12):
        for i in range(15):
            ts = base + pd.Timedelta(days=float(rng.uniform(0, 400)))
            rows.append((eid, ts, u,
                         "click" if rng.uniform() < 0.5 else "purchase"))
            eid += 1
    # tie stress: same-timestamp clicks (highest event_id must win)
    t_tie = base + pd.Timedelta(days=100)
    rows.append((eid, t_tie, 1, "click")); eid += 1
    rows.append((eid, t_tie, 1, "click")); eid += 1
    rows.append((eid, t_tie, 1, "purchase")); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    return df


def _canon(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )


def test_sliced_path_matches_direct_path(ray_session):
    df = _mk_events(np.random.default_rng(3))
    ds = ray.data.from_pandas(df).repartition(9)
    direct = _canon(asof_join_events(ds, whale_budget=None))
    # budget=10 forces EVERY user through the sliced path
    sliced = _canon(
        asof_join_events(ds, whale_budget=10, slice_days=30)
    )
    pd.testing.assert_frame_equal(direct, sliced, check_exact=True)
    # sanity: the deep carry matched (user 2's purchases find the slice-0
    # click 8 slices back), and user 3 is fully unmatched
    u2 = sliced[sliced["user_id"] == 2]
    assert u2["matched_event_id"].notna().all()
    u3 = sliced[sliced["user_id"] == 3]
    assert u3["matched_event_id"].isna().all()


def test_sliced_path_bounds_group_rows(ray_session):
    """Under the planted whale the per-(user, slice) group never sees the
    whale's full history: max group size is bounded by the densest slice
    + the one carried boundary row."""
    df = _mk_events(np.random.default_rng(5))
    per_slice = (
        df.assign(slc=df["ts"].astype("int64") // (30 * 86_400_000_000))
        .groupby(["user_id", "slc"]).size()
    )
    whale_rows = (df["user_id"] == 1).sum()
    assert per_slice.max() + 1 < whale_rows  # slicing genuinely bounds
    ds = ray.data.from_pandas(df)
    assert _max_user_rows(
        ds.map_batches(
            lambda b: b[b["event_type"].isin(["purchase", "click"])],
            batch_format="pandas",
        )
    ) == whale_rows


def test_sliced_path_matches_oracle_on_testdata(ray_session, duck, sf_dir):
    """Force EVERY sf0.001 user through the sliced path and require exact
    oracle parity — the whale machinery must be invisible on real data."""
    from tcx2graph_jl_ray.stages.window import ASOF_JOIN_SQL_TEMPLATE
    from tests.parity import assert_parity

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    assert_parity(
        asof_join_events(ds, whale_budget=1, slice_days=7),
        ASOF_JOIN_SQL_TEMPLATE.format(left_type="purchase",
                                      right_type="click"),
        duck,
    )


def test_default_budget_uses_direct_path_at_sf(ray_session, duck, sf_dir):
    """With the default budget the sf testdata takes the direct path and
    still matches the oracle (the driver's exact comparison)."""
    from tcx2graph_jl_ray.stages.window import ASOF_JOIN_SQL_TEMPLATE
    from tests.parity import assert_parity

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    assert_parity(
        asof_join_events(ds),
        ASOF_JOIN_SQL_TEMPLATE.format(left_type="purchase",
                                      right_type="click"),
        duck,
    )
