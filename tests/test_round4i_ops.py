"""Planted tests for the round-4i operator batch (LSH recall harness,
per-dimension embedding stats, centroid distance matrix)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _write_emb(tmp_path, vecs, labels):
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))


def test_dim_stats_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.ann import embedding_dim_stats

    emb = _write_emb(
        tmp_path, [[1.0, 2.0], [3.0, 6.0], [5.0, 10.0]], [0, 0, 1]
    )
    out = (
        embedding_dim_stats(emb.repartition(3))
        .to_pandas()
        .set_index("dim")
        .sort_index()
    )
    assert list(out.index) == [1, 2]
    assert out.loc[1, "vmin"] == 1.0 and out.loc[1, "vmax"] == 5.0
    assert out.loc[2, "vmin"] == 2.0 and out.loc[2, "vmax"] == 10.0
    assert out.loc[1, "mean"] == 3.0 and out.loc[2, "mean"] == 6.0
    assert (out["n_vecs"] == 3).all()


def test_centroid_dists_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.ann import centroid_distances

    # label 0 centroid (1, 0); label 1 centroid (4, 4) -> L2 dist 5
    emb = _write_emb(
        tmp_path, [[0.0, 0.0], [2.0, 0.0], [4.0, 4.0]], [0, 0, 1]
    )
    out = centroid_distances(emb).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["label_a"], r["label_b"]) == (0, 1)
    assert r["dist"] == 5.0


def test_lsh_recall_semantics(ray_session, sf_dir):
    """recall must equal |lsh top-k ∩ brute top-k| / k per query, with the
    exact list as the base (all queries emit)."""
    from tcx2graph_jl_ray.stages.ann import (
        ann_brute_topk,
        ann_lsh_topk,
        ann_recall_eval,
    )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    nq, k = 4, 5
    got = (
        ann_recall_eval(emb, sf_dir, nq, k, index="lsh")
        .to_pandas()
        .set_index("query_id")
        .sort_index()
    )
    assert list(got.index) == list(range(nq))
    brute = ann_brute_topk(emb, sf_dir, nq, k).to_pandas()
    lsh = ann_lsh_topk(emb, sf_dir, nq, k).to_pandas()
    for qid in range(nq):
        b = set(brute.loc[brute["query_id"] == qid, "vec_id"])
        a = set(lsh.loc[lsh["query_id"] == qid, "vec_id"])
        hits = len(b & a)
        assert got.loc[qid, "n_hits"] == hits
        assert got.loc[qid, "recall"] == np.round(hits / k, 6)
