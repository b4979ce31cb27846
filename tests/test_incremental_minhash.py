"""Planted tests for incremental MinHash-LSH dedup — the band-keyed
instantiation of the count-maintenance discipline (see
test_incremental_er.py for the token-keyed cases)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from tcx2graph_jl_ray.config import PipelineConfig


def _docs(texts, start_id=0):
    return pd.DataFrame({
        "doc_id": np.arange(start_id, start_id + len(texts), dtype="int64"),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": np.array([len(t or "") for t in texts], dtype="int64"),
    })


def _batch_pairs(df, config):
    from tcx2graph_jl_ray.stages.dedup import neardup_minhash_pairs

    got = neardup_minhash_pairs(ray.data.from_pandas(df), config).to_pandas()
    if len(got) == 0:  # Ray drops empty blocks: column-less empty frame
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return got.astype({"a": "int64", "b": "int64"}) \
        .sort_values(["a", "b"]).reset_index(drop=True)


def _inc_pairs(df_a, df_b, config):
    from tcx2graph_jl_ray.stages.incremental import (
        minhash_delta,
        minhash_init,
        minhash_pairs_from_state,
    )

    all_df = pd.concat([df_a, df_b], ignore_index=True)
    st = minhash_init(ray.data.from_pandas(df_a), config)
    st = minhash_delta(
        st, ray.data.from_pandas(df_b), ray.data.from_pandas(all_df), config
    )
    return minhash_pairs_from_state(st)


def test_minhash_incremental_matches_batch(ray_session):
    cfg = PipelineConfig(small_graph_threshold=1000)
    base = "the quick brown fox jumps over the lazy dog near the old river"
    texts_a = [base, base + " tonight", "completely different words here ok"]
    texts_b = [base + " again", "another unrelated document entirely now"]
    a, b = _docs(texts_a), _docs(texts_b, start_id=100)
    got = _inc_pairs(a, b, cfg)
    want = _batch_pairs(pd.concat([a, b], ignore_index=True), cfg)
    pd.testing.assert_frame_equal(got[["a", "b"]], want[["a", "b"]])
    # the delta must discover at least one CROSS-shard near-dup pair
    assert ((got["a"] < 100) & (got["b"] >= 100)).any()


def test_minhash_incremental_band_cap_crossing(ray_session):
    # identical docs share every band; cap 3 means a 4th copy (arriving in
    # the delta) kills all of that band's pairs exactly as batch does
    cfg = PipelineConfig(max_block_size=3, small_graph_threshold=1000)
    dup = "same exact text repeated across many documents for banding"
    a = _docs([dup, dup, dup])
    b = _docs([dup], start_id=100)
    got = _inc_pairs(a, b, cfg)
    want = _batch_pairs(pd.concat([a, b], ignore_index=True), cfg)
    pd.testing.assert_frame_equal(got[["a", "b"]], want[["a", "b"]])
    assert len(want) == 0  # the cap really fired in batch mode too


def test_minhash_incremental_empty_delta(ray_session):
    cfg = PipelineConfig(small_graph_threshold=1000)
    a = _docs(["one document alone with several words inside it"])
    b = _docs([], start_id=100)
    got = _inc_pairs(a, b, cfg)
    assert len(got) == 0
