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
