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


def test_distributed_cc_stale_candidate_convergence(ray_session):
    """Path b0-h2-m4-m3-c1: a jump can lower labels AFTER candidates were
    fanned out, so a single zero-change round is not a fixpoint (the loop
    previously broke there and split the component)."""
    nodes = ["b0", "h2", "m4", "m3", "c1"]
    surfaces = ray.data.from_pandas(
        pd.DataFrame({"norm": nodes, "n_turns": [1] * 5, "n_mentions": [1] * 5})
    )
    verified = ray.data.from_pandas(
        pd.DataFrame({"a": ["b0", "h2", "m4", "m3"], "b": ["h2", "m4", "m3", "c1"]})
    )
    cfg = PipelineConfig(union_find_max_rounds=16, small_graph_threshold=0)
    labels = connected_components(surfaces, verified, cfg)
    assert (labels["label"] == "b0").all(), labels.to_dict("records")


def test_distributed_cc_fuzz_vs_union_find(ray_session):
    """Seeded random graphs: distributed path must match driver union-find."""
    from tcx2graph_jl_ray.stages.canonicalize import _components_local

    rng = np.random.RandomState(123)
    for trial in range(6):
        n = int(rng.randint(5, 14))
        nodes = [f"{rng.choice(list('abcdefgh'))}{i}" for i in range(n)]
        n_edges = int(rng.randint(0, n + 3))
        edges = [
            tuple(sorted(rng.choice(nodes, 2, replace=False)))
            for _ in range(n_edges)
        ]
        surfaces = ray.data.from_pandas(
            pd.DataFrame({"norm": nodes, "n_turns": [1] * n, "n_mentions": [1] * n})
        )
        verified = ray.data.from_pandas(
            pd.DataFrame({"a": [e[0] for e in edges], "b": [e[1] for e in edges]})
        ) if edges else ray.data.from_pandas(
            pd.DataFrame({"a": pd.Series([], dtype="object"),
                          "b": pd.Series([], dtype="object")})
        )
        cfg = PipelineConfig(union_find_max_rounds=24, small_graph_threshold=0)
        got = connected_components(surfaces, verified, cfg)
        want = _components_local(sorted(set(nodes)), edges)
        got_map = dict(zip(got["node"], got["label"]))
        want_map = dict(zip(want["node"], want["label"]))
        assert got_map == want_map, f"trial {trial}: {got_map} != {want_map}"


def test_cached_enricher_nan_keys():
    from tcx2graph_jl_ray.stages.link import CachedEnricher

    enricher = CachedEnricher(
        key_fn=lambda b: b["x"],
        fetch_fn=lambda k: {"v": "null" if k is None else f"v{k}"},
    )
    out = enricher(pd.DataFrame({"x": [1.0, np.nan, 2.0, np.nan]}))
    assert list(out["v"]) == ["v1.0", "null", "v2.0", "null"]
    assert enricher.fetches == 3  # 1.0, None, 2.0 — NaN cached once


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
