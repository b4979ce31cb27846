"""Planted tests for the round-4ab batch (co-burst pairs, SQ8 rank
agreement)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def test_coburst_pairs_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import coburst_pairs

    bursts = pd.DataFrame({
        "entity_id": ["e1", "e2", "e3", "e1", "e2", "e9"],
        "day": ["2024-01-01", "2024-01-01", "2024-01-01",
                "2024-01-05", "2024-01-05", "2024-01-09"],
        "n_mentions": pd.array([5, 7, 3, 9, 2, 4], dtype="int64"),
    })
    got = coburst_pairs(
        ray.data.from_pandas(bursts).repartition(3), n_buckets=4
    ).to_pandas().sort_values(["entity_a", "entity_b"]).reset_index(drop=True)
    # day1 pairs: (e1,e2) (e1,e3) (e2,e3); day5 adds another (e1,e2)
    assert list(map(tuple, got[["entity_a", "entity_b"]].to_numpy())) == [
        ("e1", "e2"), ("e1", "e3"), ("e2", "e3")
    ]
    assert list(got["n_shared_days"]) == [2, 1, 1]
    assert got["n_shared_days"].dtype == np.int64


def test_sq8_rank_agreement_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.ann import sq8_rank_agreement

    # a corpus where SQ8 is LOSSLESS: every dim has exactly two distinct
    # values (vmin and vmax quantize to steps 0 and 255 exactly), so the
    # dequantized corpus equals the float corpus and agreement is perfect
    rs = [
        [0.0, 1.0], [1.0, 0.0], [0.0, 0.0], [1.0, 1.0],
    ]
    emb = pd.DataFrame({
        "vec_id": np.arange(4, dtype="int64"),
        "embedding": [[float(a), float(b)] for a, b in rs],
        "label": np.zeros(4, dtype="int64"),
    })
    emb.to_parquet(tmp_path / "embeddings.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))
    got = sq8_rank_agreement(ds, str(tmp_path), n_queries=2, k=3) \
        .to_pandas().sort_values("query_id").reset_index(drop=True)
    assert len(got) == 2
    assert (got["n_overlap"] == 3).all()
    assert (got["footrule"] == 0).all()
    assert (got["recall"] == 1.0).all()
    for c in ("n_overlap", "footrule"):
        assert got[c].dtype == np.int64


def test_time_weighted_value_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import time_weighted_value

    US = 1_000_000
    # user 1: value 1.00 held 10 s, then 3.00 held 30 s ->
    #   integral = 100*10e6 + 300*30e6 cents-us; span 40e6
    #   TWA = (1e9 + 9e9)/40e6/100 = 2.50
    # user 2: single event -> excluded (no span)
    df = pd.DataFrame({
        "event_id": np.array([0, 1, 2, 3], dtype="int64"),
        "ts": pd.to_datetime([0, 10 * US, 40 * US, 5 * US], unit="us"),
        "user_id": np.array([1, 1, 1, 2], dtype="int64"),
        "event_type": ["a"] * 4,
        "value": np.array([1.00, 3.00, 9.99, 7.00], dtype="float64"),
    })
    got = time_weighted_value(
        ray.data.from_pandas(df).repartition(3), n_buckets=4
    ).to_pandas().set_index("user_id")
    assert list(got.index) == [1]
    assert got.loc[1, "n_events"] == 3
    assert got.loc[1, "span_us"] == 40 * US
    assert got.loc[1, "integral_cents_us"] == 100 * 10 * US + 300 * 30 * US
    assert got.loc[1, "twa_value"] == 2.5
