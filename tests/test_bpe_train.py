"""Planted tests for BPE tokenizer training: hand-computed merges on the
classic tiny corpus, determinism across block layouts, and the exact
token-conservation invariant linking train and compression."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _docs(texts):
    return pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": np.array([len(t or "") for t in texts], dtype="int64"),
    })


def test_bpe_hand_computed(ray_session):
    from tcx2graph_jl_ray.stages.text import bpe_train

    # corpus: "aaab" x3, "aab" x1 (as repeated words in docs)
    # round 1 pairs: (a,a): 3*2+1 = 7; (a,b): 4; (b,</w>): 4 -> merge (a,a) 7
    # round 2 seqs: aaab -> (aa,a,b,</w>) x3, aab -> (aa,b,</w>)
    #   pairs: (aa,a):3, (a,b):3, (aa,b):1, (b,</w>):4 -> merge (b,</w>) 4
    # round 3: (aa,a):3, (a,b</w>):3, (aa,b</w>):1 -> tie 3 vs 3 ->
    #   lexicographically smallest pair: ('a','b</w>') < ('aa','a')
    got = bpe_train(
        ray.data.from_pandas(_docs(["aaab aaab", "aaab aab"])).repartition(2),
        n_merges=3,
    ).to_pandas()
    assert list(got["left"]) == ["a", "b", "a"]
    assert list(got["right"]) == ["a", "</w>", "b</w>"]
    assert list(got["pair_count"]) == [7, 4, 3]
    assert list(got["rank"]) == [1, 2, 3]
    assert got["pair_count"].dtype == np.int64


def test_bpe_stops_when_no_repeats(ray_session):
    from tcx2graph_jl_ray.stages.text import bpe_train

    # every pair unique -> no merge has count >= 2 beyond the shared </w>
    got = bpe_train(
        ray.data.from_pandas(_docs(["ab cd"])), n_merges=10
    ).to_pandas()
    # (b,</w>) and (d,</w>) each count 1; nothing reaches 2 -> no merges
    assert len(got) == 0


def test_bpe_block_layout_invariance(ray_session):
    from tcx2graph_jl_ray.stages.text import bpe_train

    texts = ["the cat sat", "the cat", "sat on the mat", "the the the"]
    a = bpe_train(ray.data.from_pandas(_docs(texts)), n_merges=8).to_pandas()
    b = bpe_train(
        ray.data.from_pandas(_docs(texts)).repartition(7), n_merges=8
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_bpe_token_conservation(ray_session):
    from tcx2graph_jl_ray.stages.text import bpe_compression, bpe_train

    texts = ["the cat sat on the mat", "the cat ate", "mat cat the"]
    ds = ray.data.from_pandas(_docs(texts))
    merges = bpe_train(ds, n_merges=8).to_pandas()
    comp = bpe_compression(ds, n_merges=8).to_pandas().iloc[0]
    # every merge application removes exactly one token per counted
    # occurrence, so the train-time counts must reconcile the totals
    assert comp["tokens_after"] == (
        comp["tokens_before"] - merges["pair_count"].sum()
    )
    assert comp["n_merges"] == len(merges)
    assert 0 < comp["compression"] < 1
