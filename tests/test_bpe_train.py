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


def test_bpe_oracle_matches_engine_on_adversarial_corpus(ray_session):
    """The round-5 unrolled-CTE oracle (text.bpe_train_sql) must reproduce
    the engine's greedy left-to-right merge application on the cases where
    a naive SQL formulation diverges: overlapping self-merges (aaaa),
    tie-broken pair choices, merged symbols that share prefixes with later
    pairs, and multi-space/case folding. Also checks the compression
    oracle and the token-conservation invariant end-to-end."""
    import duckdb
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.text import (
        bpe_compression,
        bpe_compression_sql,
        bpe_train,
        bpe_train_sql,
    )
    from tests.parity import assert_parity

    docs = pd.DataFrame({
        "doc_id": pd.array(range(8), dtype="int64"),
        "source": ["t"] * 8,
        "lang": ["en"] * 8,
        "text": [
            "aaaa aaaa aaa aa",            # overlapping self-merge chains
            "abab abab ababab",            # alternating pair, merged 'ab'
            "AAAB aab ab  ab",             # case fold + double space
            "xy xy xz xz",                 # exact tie on count: (x,y) vs (x,z)
            "banana bandana banana",       # shared-prefix merged symbols
            "q",                           # single-char word (seq len 2)
            "zz zz zz zz zz zz",           # dominant pair
            None,                          # null text drops
        ],
    })
    ds = ray.data.from_pandas(docs)

    con = duckdb.connect()
    con.register("documents_pd", docs)
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")

    for n_merges in (1, 4, 16, 40):  # 40 > available merges: stop rule
        assert_parity(bpe_train(ds, n_merges), bpe_train_sql(n_merges), con)
        assert_parity(
            bpe_compression(ds, n_merges), bpe_compression_sql(n_merges), con
        )

    # conservation under OVERLAPS: pair_count counts overlapping
    # occurrences ("aaaa" counts (a,a) three times) but greedy application
    # merges only non-overlapping ones, so strict equality — which holds
    # on the natural-text sf corpus (test_bpe_token_conservation) — relaxes
    # to an inequality here
    tr = bpe_train(ds, 16).to_pandas()
    comp = bpe_compression(ds, 16).to_pandas()
    before = int(comp["tokens_before"].iloc[0])
    after = int(comp["tokens_after"].iloc[0])
    assert before - int(tr["pair_count"].sum()) <= after < before
