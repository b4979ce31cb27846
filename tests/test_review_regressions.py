"""Regression tests for review-found defects (round 1 code review)."""

import numpy as np
import pandas as pd
import ray.data

from tcx2graph_jl_ray.config import PipelineConfig
from tcx2graph_jl_ray.stages.analysis import conv_dynamics
from tcx2graph_jl_ray.stages.canonicalize import connected_components
from tcx2graph_jl_ray.stages.extract import TripleExtractor
from tests.parity import to_pandas


def test_distributed_cc_nonmonotone_chain(ray_session):
    """Chain b - z1 - z2 - z3 - a: the min label 'a' sits at the far end with
    non-monotone names, so propagation must actually traverse edges (the
    self-loop EDGE re-emission bug split this into two components)."""
    nodes = ["b", "z1", "z2", "z3", "a"]
    surfaces = ray.data.from_pandas(
        pd.DataFrame({"norm": nodes, "n_turns": [1] * 5, "n_mentions": [1] * 5})
    )
    verified = ray.data.from_pandas(
        pd.DataFrame({"a": ["b", "z1", "z2", "z3"], "b": ["z1", "z2", "z3", "a"]})
    )
    cfg = PipelineConfig(union_find_max_rounds=16, small_graph_threshold=0)
    labels = connected_components(surfaces, verified, cfg)
    assert (labels["label"] == "a").all(), labels.to_dict("records")


def test_conv_dynamics_single_turn_conversation(ray_session):
    """Single-turn conversations have NaT gaps; the aggregate must coalesce
    them to 0 instead of crashing on a mixed object column."""
    df = pd.DataFrame(
        {
            "conv_id": ["solo", "duo", "duo"],
            "turn_idx": pd.array([0, 0, 1], dtype="int32"),
            "role": ["user"] * 3,
            "text": ["only", "first", "second!"],
            "tool": [None] * 3,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-02 00:00:00",
                 "2024-01-02 00:00:05"]
            ),
        }
    )
    out = to_pandas(conv_dynamics(ray.data.from_pandas(df))).set_index("conv_id")
    assert out.loc["solo", "total_variation"] == 0
    assert out.loc["solo", "max_gap_us"] == 0
    assert out.loc["duo", "max_gap_us"] == 5_000_000
    assert out.loc["duo", "total_variation"] == abs(len("second!") - len("first"))


def test_assistant_pattern_multiword_region():
    """Region slot must accept multi-word values ('MIDDLE EAST'); with the
    old (\\S+) slot these turns silently extracted nothing."""
    batch = pd.DataFrame(
        {
            "conv_id": ["c"],
            "turn_idx": pd.array([0], dtype="int32"),
            "text": ["NATION_4 is located in MIDDLE EAST ; NATION_4 reported click"],
        }
    )
    triples = TripleExtractor()(batch)
    assert len(triples) == 2
    located = triples[triples["pred"] == "located_in"].iloc[0]
    assert located["obj"] == "MIDDLE EAST"


def test_ann_partial_topk_tie_break(ray_session, sf_dir):
    """Duplicated embeddings tie on cosine; partial top-k must keep the
    lowest vec_ids (the oracle's ORDER BY sim DESC, vec_id)."""
    from tcx2graph_jl_ray.stages.ann import _BatchTopK
    import ray as _ray

    qids = np.array([0], dtype=np.int64)
    q = np.ones((1, 4), dtype=np.float64)
    ref = _ray.put((qids, q))
    stage = _BatchTopK(ref, k=3)
    batch = pd.DataFrame(
        {
            "vec_id": pd.array([9, 3, 7, 1, 5], dtype="int64"),
            "embedding": [np.ones(4, dtype=np.float32)] * 5,  # all identical
        }
    )
    out = stage(batch)
    assert sorted(out["vec_id"]) == [1, 3, 5]  # lowest ids survive ties
