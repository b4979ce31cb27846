"""Canonicalization: planted alias groups must be exactly recovered
(blocking -> containment verify -> distributed min-label components)."""

import pandas as pd
import ray.data

from tcx2graph_jl_ray.config import PipelineConfig
from tcx2graph_jl_ray.sources.transcripts import TRANSCRIPTS_SQL, derive_transcripts
from tcx2graph_jl_ray.stages.canonicalize import (
    CANONICAL_TRIPLES_SQL_TEMPLATE,
    ENTITIES_SQL_TEMPLATE,
    candidate_pairs,
    canonicalize,
    connected_components,
    distinct_surfaces,
    rewrite_triples,
    verify_pairs,
)
from tcx2graph_jl_ray.stages.extract import (
    MENTIONS_SQL_TEMPLATE,
    TRIPLES_SQL_TEMPLATE,
    extract_mentions,
    extract_triples,
)
from tests.parity import assert_parity, to_pandas

_MENTIONS_SQL = MENTIONS_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL)
_TRIPLES_SQL = TRIPLES_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL)


def test_entities_match_oracle(ray_session, duck, sf_dir):
    mentions = extract_mentions(derive_transcripts(sf_dir))
    entities, _ = canonicalize(mentions)
    assert_parity(entities, ENTITIES_SQL_TEMPLATE.format(mentions=_MENTIONS_SQL), duck)


def test_entities_match_oracle_distributed_cc(ray_session, duck, sf_dir):
    """Force the distributed min-label-propagation path (the 100TB path) and
    require the identical oracle-exact result."""
    cfg = PipelineConfig(small_graph_threshold=0)
    mentions = extract_mentions(derive_transcripts(sf_dir))
    entities, _ = canonicalize(mentions, cfg)
    assert_parity(entities, ENTITIES_SQL_TEMPLATE.format(mentions=_MENTIONS_SQL), duck)


def test_entities_match_oracle_join_path(ray_session, duck, sf_dir):
    """Force BOTH the distributed CC path and the large-map join path
    (broadcast_map_budget=0): the canonical map comes back as a Dataset, the
    entity aggregation runs as a distributed join + bucketed aggregate, and
    the result must still be oracle-exact."""
    cfg = PipelineConfig(small_graph_threshold=0, broadcast_map_budget=0,
                         join_num_partitions=4)
    mentions = extract_mentions(derive_transcripts(sf_dir))
    entities, cmap = canonicalize(mentions, cfg)
    assert isinstance(cmap, ray.data.Dataset)
    assert_parity(entities, ENTITIES_SQL_TEMPLATE.format(mentions=_MENTIONS_SQL), duck)


def test_canonical_triples_join_path(ray_session, duck, sf_dir):
    """rewrite_triples with a Dataset map (distributed hash-join application)
    must produce the identical oracle-exact canonical triples."""
    cfg = PipelineConfig(small_graph_threshold=0, broadcast_map_budget=0,
                         join_num_partitions=4)
    t = derive_transcripts(sf_dir)
    _, cmap = canonicalize(extract_mentions(t), cfg)
    rewritten = rewrite_triples(extract_triples(t), cmap, config=cfg)
    sql = CANONICAL_TRIPLES_SQL_TEMPLATE.format(
        triples=_TRIPLES_SQL, mentions=_MENTIONS_SQL
    )
    assert_parity(rewritten, sql, duck)


def test_attach_entities_join_path(ray_session, sf_dir):
    """attach_entities with a Dataset map must equal the broadcast-dict
    result row-for-row."""
    from tcx2graph_jl_ray.stages.analysis import attach_entities

    t = derive_transcripts(sf_dir)
    mentions = extract_mentions(t).materialize()
    _, cmap_df = canonicalize(mentions)
    cfg = PipelineConfig(join_num_partitions=4)
    cmap_ds = ray.data.from_pandas(cmap_df)
    a = to_pandas(attach_entities(mentions, cmap_df))
    b = to_pandas(attach_entities(mentions, cmap_ds, config=cfg))
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_canonical_triples_match_oracle(ray_session, duck, sf_dir):
    t = derive_transcripts(sf_dir)
    _, cmap = canonicalize(extract_mentions(t))
    rewritten = rewrite_triples(extract_triples(t), cmap)
    sql = CANONICAL_TRIPLES_SQL_TEMPLATE.format(
        triples=_TRIPLES_SQL, mentions=_MENTIONS_SQL
    )
    assert_parity(rewritten, sql, duck)


def test_components_on_synthetic_graph(ray_session):
    """Chain-shaped component: propagation must converge across >1 hop, and
    disjoint groups must stay apart."""
    surfaces = ray.data.from_pandas(
        pd.DataFrame(
            {
                "norm": ["a b", "a b c", "a b c d", "x y", "zz"],
                "n_turns": [1] * 5,
                "n_mentions": [1] * 5,
            }
        )
    )
    # containment: "a b"~"a b c"=1.0, "a b c"~"a b c d"=1.0, "a b"~"a b c d"=1.0
    pairs = candidate_pairs(surfaces)
    verified = verify_pairs(pairs)
    labels = connected_components(surfaces, verified)
    lab = dict(zip(labels["node"], labels["label"]))
    assert lab["a b"] == lab["a b c"] == lab["a b c d"] == "a b"
    assert lab["x y"] == "x y" and lab["zz"] == "zz"


def test_distributed_components_long_chain(ray_session):
    """A 40-node path graph: plain min-label propagation needs 39 rounds, but
    pointer jumping must converge within the 16-round cap (O(log d))."""
    n = 40
    nodes = [f"x{i:03d}" for i in range(n)]
    surfaces = ray.data.from_pandas(
        pd.DataFrame({"norm": nodes, "n_turns": [1] * n, "n_mentions": [1] * n})
    )
    verified = ray.data.from_pandas(
        pd.DataFrame({"a": nodes[:-1], "b": nodes[1:]})
    )
    # small_graph_threshold=0 forces the DISTRIBUTED propagate+jump path
    cfg = PipelineConfig(union_find_max_rounds=16, small_graph_threshold=0)
    labels = connected_components(surfaces, verified, cfg)
    assert (labels["label"] == "x000").all()
    assert sorted(labels["node"]) == nodes


def test_hot_block_cap_drops_nondiscriminative_token(ray_session):
    """Tokens shared by more than max_block_size surfaces generate no pairs
    (skew guard); remaining tokens still link true aliases."""
    norms = [f"common {i}" for i in range(10)] + ["common 3 extra"]
    surfaces = ray.data.from_pandas(
        pd.DataFrame({"norm": norms, "n_turns": [1] * 11, "n_mentions": [1] * 11})
    )
    cfg = PipelineConfig(max_block_size=5)
    pairs = to_pandas(candidate_pairs(surfaces, cfg))
    # 'common' block (11 surfaces) is dropped; only the '3' block pairs up
    assert set(map(tuple, pairs[["a", "b"]].itertuples(index=False))) == {
        ("common 3", "common 3 extra")
    }
