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


def test_simplify_conversations_douglas_peucker(ray_session):
    """Planted profiles: a linear length ramp collapses to endpoints; a spike
    above tolerance survives; small jitter below tolerance is dropped."""
    import numpy as np
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.stages.graph import simplify_conversations

    rows = []
    # linear ramp: text lengths 10, 20, ..., 100 -> only endpoints kept
    for t in range(10):
        rows.append(("ramp", t, "a" * (10 * (t + 1))))
    # flat profile with one big spike at t=5
    for t in range(10):
        rows.append(("spike", t, "b" * (500 if t == 5 else 50)))
    # flat with tiny jitter (below tol=10)
    for t in range(10):
        rows.append(("jitter", t, "c" * (50 + (t % 2) * 3)))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    out = (
        simplify_conversations(ray.data.from_pandas(df), tolerance=10.0)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    ramp = out[out.conv_id == "ramp"]["turn_idx"].tolist()
    assert ramp == [0, 9]
    spike = out[out.conv_id == "spike"]["turn_idx"].tolist()
    assert 5 in spike and 0 in spike and 9 in spike
    jitter = out[out.conv_id == "jitter"]["turn_idx"].tolist()
    assert jitter == [0, 9]


def test_cumulative_tokens_chunked_parity(ray_session, sf_dir, duck):
    """Chunked two-phase prefix sum == plain per-conv prefix sum == oracle,
    with chunks small enough that every conversation actually splits."""
    from tcx2graph_jl_ray.sources.transcripts import TRANSCRIPTS_SQL, derive_transcripts
    from tcx2graph_jl_ray.stages.graph import (
        CUMULATIVE_SQL_TEMPLATE,
        cumulative_tokens_chunked,
    )
    from tests.parity import assert_parity

    ds = cumulative_tokens_chunked(derive_transcripts(sf_dir), chunk_turns=4)
    assert_parity(
        ds, CUMULATIVE_SQL_TEMPLATE.format(transcripts=TRANSCRIPTS_SQL), duck
    )


def test_cumulative_tokens_chunked_whale(ray_session):
    """A single 50k-turn conversation (larger than any one chunk) sums
    correctly across chunk boundaries."""
    import numpy as np
    import pandas as pd
    import ray.data
    from tcx2graph_jl_ray.stages.graph import cumulative_tokens_chunked

    n = 50_000
    texts = ["x" * ((i * 7) % 13 + 1) for i in range(n)]
    whale = pd.DataFrame(
        {"conv_id": "whale", "turn_idx": pd.array(range(n), dtype="int32"),
         "text": texts}
    )
    out = (
        cumulative_tokens_chunked(ray.data.from_pandas(whale), chunk_turns=1000)
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    lens = np.array([len(t) for t in texts], dtype="int64")
    assert (out["n_chars"].to_numpy() == lens).all()
    assert (out["cum_chars"].to_numpy() == lens.cumsum()).all()
