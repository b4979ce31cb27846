"""Planted tests for the round-4v operator batch (dyadic decayed hotness,
naive-forecast backtest, split KS drift check)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def test_decayed_hotness_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import decayed_hotness

    DAY = 86_400_000_000
    # entity e1: 2 mentions on the max day (w=0, weight 1) and 3 mentions
    # 14 days earlier (w=2, weight 1/4); e2: 1 mention 8 days back (w=1)
    mentions = pd.DataFrame({
        "conv_id": ["A", "A", "B"],
        "turn_idx": pd.array([0, 1, 0], dtype="int32"),
        "entity_id": ["e1", "e1", "e2"],
        "n_occurrences": pd.array([2, 3, 1], dtype="int64"),
    })
    transcripts = pd.DataFrame({
        "conv_id": ["A", "A", "B"],
        "turn_idx": pd.array([0, 1, 0], dtype="int32"),
        "ts": pd.to_datetime([14 * DAY, 0, 6 * DAY], unit="us"),
    })
    got = decayed_hotness(
        ray.data.from_pandas(mentions),
        ray.data.from_pandas(transcripts),
        n_buckets=4,
    ).to_pandas().set_index("entity_id")
    # max day = 14; e1: 2*2^16 (w=0) + 3*2^14 (w=2); e2: 1*2^15 (w=1)
    assert got.loc["e1", "n_mentions"] == 5
    assert got.loc["e1", "decayed_s16"] == 2 * 65536 + 3 * 16384
    assert got.loc["e1", "decayed"] == 2.0 + 0.75
    assert got.loc["e2", "decayed_s16"] == 32768
    assert got.loc["e2", "decayed"] == 0.5
    assert got["decayed_s16"].dtype == np.int64
    # recency wins: e1 today-heavy outranks a bigger stale count
    assert got.loc["e1", "decayed"] > got.loc["e2", "decayed"]


def test_forecast_backtest_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import forecast_backtest

    DAY = 86_400_000_000
    # type a daily cents: day0=100, day1=200, day7=1000, day8=500
    # lag1 scores day1 (|200-100|=100) and day8 (|500-1000|=500) -> MAE 300
    # lag7 scores day7 (|1000-100|=900) and day8 (|500-200|=300) -> MAE 600
    rows = [
        (0, 0 * DAY, 1, "a", 1.00),
        (1, 1 * DAY, 1, "a", 2.00),
        (2, 7 * DAY, 1, "a", 10.00),
        (3, 8 * DAY, 1, "a", 5.00),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                     "event_type", "value"])
    df = pd.DataFrame({
        "event_id": df["event_id"].astype("int64"),
        "ts": pd.to_datetime(df["ts_us"], unit="us"),
        "user_id": df["user_id"].astype("int64"),
        "event_type": df["event_type"],
        "value": df["value"].astype("float64"),
    })
    got = forecast_backtest(
        ray.data.from_pandas(df).repartition(3), n_buckets=4
    ).to_pandas().set_index("lag_days")
    assert got.loc[1, "n_scored"] == 2
    assert got.loc[1, "mae_cents"] == 300.0
    assert got.loc[7, "n_scored"] == 2
    assert got.loc[7, "mae_cents"] == 600.0
    assert got["n_scored"].dtype == np.int64


def test_split_ks_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import split_ks

    # identical length distributions inside each split bucket would give
    # KS 0; engineer ids so train gets lengths {10}, val gets {20}:
    # brute-force ids by split to control membership
    import hashlib

    train_ids, val_ids = [], []
    i = 0
    while len(train_ids) < 4 or len(val_ids) < 4:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)
        if b <= 0xCB and len(train_ids) < 4:
            train_ids.append(i)
        elif 0xCB < b <= 0xE5 and len(val_ids) < 4:
            val_ids.append(i)
        i += 1
    docs = pd.DataFrame({
        "doc_id": np.array(train_ids + val_ids, dtype="int64"),
        "n_chars": np.array([10] * 4 + [20] * 4, dtype="int64"),
        "text": ["x"] * 8,
        "lang": ["en"] * 8,
        "source": ["s"] * 8,
    })
    got = split_ks(
        ray.data.from_pandas(docs).repartition(3), n_buckets=4
    ).to_pandas().iloc[0]
    # disjoint supports -> KS = 1 at the boundary between 10 and 20
    assert got["n_train"] == 4 and got["n_val"] == 4
    assert got["ks_num"] == 16 and got["ks_den"] == 16
    assert got["ks"] == 1.0

    # same distribution in both splits -> KS 0
    docs2 = docs.copy()
    docs2["n_chars"] = np.array([10, 20, 10, 20] * 2, dtype="int64")
    got2 = split_ks(ray.data.from_pandas(docs2), n_buckets=4) \
        .to_pandas().iloc[0]
    assert got2["ks"] == 0.0
