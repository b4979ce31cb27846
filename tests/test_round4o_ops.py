"""Planted tests for the round-4o operator batch (temporal triple
validity intervals, exact-k global bottom-k sample, chunk-level payload
dedup)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data


def test_triple_intervals_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import triple_intervals

    # fact F1 asserted twice in conv A (t=10s, 30s) and once in conv B
    # (t=20s); fact F2 once in conv A (t=40s)
    triples = pd.DataFrame({
        "conv_id": ["A", "A", "B", "A"],
        "turn_idx": pd.array([0, 2, 1, 3], dtype="int32"),
        "subj": ["s1", "s1", "s1", "s2"],
        "pred": ["p", "p", "p", "p"],
        "obj": ["o1", "o1", "o1", "o2"],
    })
    transcripts = pd.DataFrame({
        "conv_id": ["A", "A", "A", "A", "B", "B"],
        "turn_idx": pd.array([0, 1, 2, 3, 0, 1], dtype="int32"),
        "ts": pd.to_datetime(
            [10_000_000, 15_000_000, 30_000_000, 40_000_000,
             5_000_000, 20_000_000],
            unit="us",
        ),
    })
    got = (
        triple_intervals(
            ray.data.from_pandas(triples),
            ray.data.from_pandas(transcripts),
            n_buckets=4,
        )
        .to_pandas()
        .set_index(["subj", "obj"])
        .sort_index()
    )
    f1 = got.loc[("s1", "o1")]
    assert f1["first_us"] == 10_000_000
    assert f1["last_us"] == 30_000_000
    assert f1["span_us"] == 20_000_000
    assert f1["n_mentions"] == 3
    assert f1["n_convs"] == 2
    f2 = got.loc[("s2", "o2")]
    assert f2["span_us"] == 0
    assert f2["n_mentions"] == 1
    assert f2["n_convs"] == 1
    # all-int64 output (the driver hash is bit-stable)
    for c in ("first_us", "last_us", "span_us", "n_mentions", "n_convs"):
        assert got[c].dtype == np.int64


def test_bottomk_sample_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import bottomk_sample

    docs = pd.DataFrame({
        "doc_id": np.arange(100, dtype="int64"),
        "source": ["s%d" % (i % 3) for i in range(100)],
        "text": ["body %d" % i for i in range(100)],
    })
    # null-text rows must not be sampled (documents-boundary contract)
    docs.loc[7, "text"] = None
    k = 10
    got = bottomk_sample(ray.data.from_pandas(docs), k=k).to_pandas()
    assert list(got["sample_rank"]) == list(range(1, k + 1))

    want = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i)
        for i in range(100)
        if i != 7
    )[:k]
    assert list(got["doc_id"]) == [i for _, i in want]
    # stable across block layouts: 1-row blocks give the identical sample
    got2 = bottomk_sample(
        ray.data.from_pandas(docs).repartition(20), k=k
    ).to_pandas()
    pd.testing.assert_frame_equal(got, got2)


def test_chunk_dedup_planted(ray_session):
    from tcx2graph_jl_ray.stages.multimodal import chunk_dedup_stats

    # chunk_chars=4: doc0 = AAAA|BBBB, doc1 = AAAA|CC -> chunks
    # {AAAA: 2, BBBB: 1, CC: 1}; doc2 is empty (0 chunks, still a payload)
    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2], dtype="int64"),
        "text": ["AAAABBBB", "AAAACC", ""],
        "source": ["x", "x", "x"],
    })
    got = chunk_dedup_stats(
        ray.data.from_pandas(docs), chunk_chars=4
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["n_payloads"] == 3
    assert r["n_chunks"] == 4
    assert r["n_unique_chunks"] == 3
    assert r["n_dup_chunks"] == 1
    assert r["bytes_total"] == 14  # 4+4 + 4+2
    assert r["bytes_unique"] == 10  # AAAA + BBBB + CC
    assert r["dedup_ratio"] == np.round(10 / 14, 6)
