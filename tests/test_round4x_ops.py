"""Planted tests for the round-4x operator batch (max drawdown, metric
rank agreement)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def test_max_drawdown_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import max_drawdown_daily

    DAY = 86_400_000_000
    # daily cents: 100, 500, 200, 100, 400 -> running max 100,500,500,500,500
    # drawdowns 0, 0, 300, 400, 100 -> mdd 400, trough day 3, peak day 1
    vals = [1.00, 5.00, 2.00, 1.00, 4.00]
    rows = [(i, i * DAY, 1, "a", v) for i, v in enumerate(vals)]
    df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                     "event_type", "value"])
    df = pd.DataFrame({
        "event_id": df["event_id"].astype("int64"),
        "ts": pd.to_datetime(df["ts_us"], unit="us"),
        "user_id": df["user_id"].astype("int64"),
        "event_type": df["event_type"],
        "value": df["value"].astype("float64"),
    })
    got = max_drawdown_daily(
        ray.data.from_pandas(df).repartition(3), n_buckets=4
    ).to_pandas().iloc[0]
    assert got["max_drawdown_cents"] == 400
    assert got["peak_day"] == "1970-01-02"
    assert got["trough_day"] == "1970-01-04"
    assert got["peak_cents"] == 500
    assert got["trough_cents"] == 100


def test_max_drawdown_tie_break(ray_session):
    from tcx2graph_jl_ray.stages.window import max_drawdown_daily

    DAY = 86_400_000_000
    # two troughs at the same depth (days 2 and 4): earliest wins; two peak
    # days carrying the same running max (days 0 and 3): earliest wins
    vals = [5.00, 5.00, 2.00, 5.00, 2.00]
    rows = [(i, i * DAY, 1, "a", v) for i, v in enumerate(vals)]
    df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                     "event_type", "value"])
    df = pd.DataFrame({
        "event_id": df["event_id"].astype("int64"),
        "ts": pd.to_datetime(df["ts_us"], unit="us"),
        "user_id": df["user_id"].astype("int64"),
        "event_type": df["event_type"],
        "value": df["value"].astype("float64"),
    })
    got = max_drawdown_daily(ray.data.from_pandas(df), n_buckets=4) \
        .to_pandas().iloc[0]
    assert got["max_drawdown_cents"] == 300
    assert got["trough_day"] == "1970-01-03"
    assert got["peak_day"] == "1970-01-01"


def test_metric_rank_agreement_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.ann import metric_rank_agreement

    # query 0 = unit x; corpus: long vector far off-axis beats short
    # on-axis vector under dot but not under cosine
    emb = pd.DataFrame({
        "vec_id": np.arange(4, dtype="int64"),
        "embedding": [
            [1.0, 0.0],        # the query itself
            [0.9, 0.1],        # high cosine, small dot (norm ~0.9)
            [5.0, 5.0],        # cosine 0.707, dot 5.0 -> wins under dot
            [0.0, 1.0],        # orthogonal
        ],
        "label": np.zeros(4, dtype="int64"),
    })
    emb.to_parquet(tmp_path / "embeddings.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))
    got = metric_rank_agreement(ds, str(tmp_path), n_queries=1, k=3) \
        .to_pandas().iloc[0]
    # cosine top3: 0 (1.0), 1 (~0.994), 2 (0.707)
    # dot    top3: 2 (10.0), 0 (1.0), 1 (0.9)
    # overlap = {0,1,2} = 3; footrule = |1-2| + |2-3| + |3-1| = 4
    assert got["query_id"] == 0
    assert got["n_overlap"] == 3
    assert got["footrule"] == 4
