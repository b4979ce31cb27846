"""Planted tests for incremental entity canonicalization — specifically
the cases where a naive flat-pair-set maintenance diverges from batch:
(1) a token block crossing the hot cap when new surfaces arrive (its old
pairs must die), and (2) a pair contributed by BOTH a dirty and a
non-dirty token (it must survive the dirty token's block crossing)."""

from __future__ import annotations

import pandas as pd
import ray.data

from tcx2graph_jl_ray.config import PipelineConfig


def _mentions(norms, conv="c0"):
    return pd.DataFrame({
        "conv_id": [conv] * len(norms),
        "turn_idx": pd.array(range(len(norms)), dtype="int32"),
        "norm": norms,
        "n_occurrences": pd.array([1] * len(norms), dtype="int64"),
    })


def _batch_entities(mentions_df, config):
    from tcx2graph_jl_ray.stages.canonicalize import canonicalize

    ents, _ = canonicalize(ray.data.from_pandas(mentions_df), config)
    return ents.sort_values("entity_id").reset_index(drop=True)


def _inc_entities(df_a, df_b, config):
    from tcx2graph_jl_ray.stages.incremental import (
        canonicalize_delta,
        canonicalize_init,
        entities_from_state,
    )

    st = canonicalize_init(ray.data.from_pandas(df_a), config)
    st = canonicalize_delta(st, ray.data.from_pandas(df_b), config)
    return (
        entities_from_state(st, config)
        .sort_values("entity_id").reset_index(drop=True)
    )


def _assert_same(df_a, df_b, config):
    got = _inc_entities(df_a, df_b, config)
    want = _batch_entities(pd.concat([df_a, df_b], ignore_index=True), config)
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, check_exact=True
    )
    return got


def test_incremental_cap_crossing(ray_session):
    # cap 3: token 'alpha' links three surfaces in shard A (block size 3,
    # qualifies -> pairs merge them); shard B adds a fourth 'alpha' surface
    # -> block size 4 > cap -> batch drops ALL alpha pairs. The incremental
    # fold must drop them too (a flat stored pair set would keep them).
    cfg = PipelineConfig(max_block_size=3, small_graph_threshold=1000)
    a = _mentions(["alpha one", "alpha two", "alpha three"])
    b = _mentions(["alpha four"], conv="c1")
    got = _assert_same(a, b, cfg)
    # with the block dead, nothing merges: every surface is its own entity
    assert len(got) == 4
    assert (got["n_surfaces"] == 1).all()


def test_incremental_pair_survives_via_second_token(ray_session):
    # 'alpha beta', 'alpha beta x': pair contributed by BOTH 'alpha' and
    # 'beta'. Shard B floods 'alpha' over the cap; the pair must survive
    # through 'beta' (count drops 2 -> 1, not to 0) and the two surfaces
    # stay merged, exactly as batch.
    cfg = PipelineConfig(max_block_size=3, small_graph_threshold=1000)
    a = _mentions(["alpha beta", "alpha beta x"])
    b = _mentions(["alpha y", "alpha z"], conv="c1")
    got = _assert_same(a, b, cfg)
    merged = got[got["n_surfaces"] == 2]
    assert len(merged) == 1
    assert merged.iloc[0]["entity_id"] == "alpha beta"


def test_incremental_new_block_qualifies(ray_session):
    # shard B shrinks nothing but CREATES a new qualifying block: 'gamma'
    # appears once in A (block size 1, no pairs) and B brings a second
    # 'gamma' surface -> the two must merge after the delta.
    cfg = PipelineConfig(max_block_size=8, small_graph_threshold=1000)
    a = _mentions(["gamma one two", "unrelated thing"])
    b = _mentions(["gamma one two three"], conv="c1")
    got = _assert_same(a, b, cfg)
    assert (got["n_surfaces"] == 2).sum() == 1


def test_incremental_reobserved_surface_changes_stats_only(ray_session):
    # B re-observes an A surface: stats must add, blocking must not churn
    cfg = PipelineConfig(max_block_size=8, small_graph_threshold=1000)
    a = _mentions(["delta one", "delta two"])
    b = _mentions(["delta one"], conv="c1")
    got = _assert_same(a, b, cfg)
    assert int(got["n_mentions"].sum()) == 3


def test_incremental_matches_batch_on_extractor_output(ray_session):
    # end-to-end on the real extractor stream at smoke scale
    import __ray_entry__ as e
    from tcx2graph_jl_ray.stages.incremental import entities_incremental
    from tests.parity import to_pandas

    sf = "/root/testdata/sf0.001"
    got = entities_incremental(e._mentions(sf)) \
        .sort_values("entity_id").reset_index(drop=True)
    want = to_pandas(e.queries()["kg_entities"](sf)) \
        .sort_values("entity_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, check_exact=True
    )
