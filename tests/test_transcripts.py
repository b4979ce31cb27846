"""Transcript derivation: Ray result must byte-match the DuckDB oracle.

This pins the engine's core invariant — per-turn text equality under stable
(conv_id, turn_idx) ordering (reference src/GraphBuilder.jl:104-111,
src/Neo4jUtils.jl:96).
"""

import pandas as pd

from tcx2graph_jl_ray.sources.transcripts import TRANSCRIPTS_SQL, derive_transcripts
from tests.parity import assert_parity, to_pandas


def test_transcripts_match_oracle(ray_session, duck, sf_dir):
    ds = derive_transcripts(sf_dir)
    assert_parity(ds, TRANSCRIPTS_SQL, duck)


def test_transcripts_schema_and_ordering(ray_session, sf_dir):
    df = to_pandas(derive_transcripts(sf_dir))
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df["turn_idx"].dtype == "int32"
    # (conv_id, turn_idx) unique and dense from 0 within each conversation
    g = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert g.apply(lambda s: (s.to_numpy() == range(len(s))).all()).all()
    # ts monotone non-decreasing within conversation (ordering derives from ts)
    mono = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
    assert mono.apply(lambda s: s.is_monotonic_increasing).all()
    # tool populated exactly on tool turns
    assert (df["tool"].notna() == (df["role"] == "tool")).all()
