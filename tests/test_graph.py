"""Graph construction invariants (reference src/GraphBuilder.jl:33-131):
per-conversation node count == turn count, edge count == turns - 1, edges
connect consecutive turns."""

import pandas as pd

from tcx2graph_jl_ray.sources.transcripts import TRANSCRIPTS_SQL, derive_transcripts
from tcx2graph_jl_ray.stages.graph import (
    COVERAGE_SQL_TEMPLATE,
    EDGES_SQL_TEMPLATE,
    NODES_SQL_TEMPLATE,
    build_next_turn_edges,
    build_nodes,
    coverage_stats,
)
from tests.parity import assert_parity, to_pandas


def test_nodes_match_oracle(ray_session, duck, sf_dir):
    ds = build_nodes(derive_transcripts(sf_dir))
    assert_parity(ds, NODES_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL), duck)


def test_edges_match_oracle(ray_session, duck, sf_dir):
    ds = build_next_turn_edges(derive_transcripts(sf_dir))
    assert_parity(ds, EDGES_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL), duck)


def test_coverage_match_oracle(ray_session, duck, sf_dir):
    tbl = coverage_stats(derive_transcripts(sf_dir))
    assert_parity(tbl, COVERAGE_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL), duck)


def test_graph_invariants(ray_session, sf_dir):
    t = derive_transcripts(sf_dir)
    nodes = to_pandas(build_nodes(t))
    edges = to_pandas(build_next_turn_edges(t))
    turns_per_conv = nodes.groupby("conv_id").size()
    edges_per_conv = edges.groupby("conv_id").size().reindex(
        turns_per_conv.index, fill_value=0
    )
    # edge count == turns - 1 per conversation (src/GraphBuilder.jl:109-111)
    assert (edges_per_conv == (turns_per_conv - 1).clip(lower=0)).all()
    # edges connect consecutive turn_idx
    assert (edges["dst_turn"] == edges["src_turn"] + 1).all()
    # inter-turn gaps are non-negative (ts monotone within conversation)
    assert (edges["delta_us"] >= 0).all()
