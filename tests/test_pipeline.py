"""Flagship pipeline + resumable partitioned sink (checkpoint/lineage)."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import ray.data

from tcx2graph_jl_ray.pipelines.kg import run_kg_pipeline_from_sf
from tcx2graph_jl_ray.state.manifest import (
    MANIFEST_NAME,
    load_manifest,
    read_partitioned,
    resumable_write,
)


def _toy_ds(n=100):
    return ray.data.from_pandas(
        pd.DataFrame({"k": [f"key_{i % 10}" for i in range(n)], "v": list(range(n))})
    )


def test_resumable_write_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "toy")
    m1 = resumable_write(_toy_ds(), out, key_col="k", n_parts=8, fingerprint="fp1")
    assert m1["total_rows"] == 100
    parts = sorted(m1["partitions"])
    assert len(parts) >= 2

    # simulate a crash that lost one partition: remove its dir + manifest entry
    victim = parts[0]
    shutil.rmtree(os.path.join(out, f"part={victim}"))
    m = load_manifest(out)
    lost_rows = m["partitions"].pop(victim)["rows"]
    with open(os.path.join(out, MANIFEST_NAME), "w") as f:
        json.dump(m, f)
    survivor = parts[1]
    survivor_file = os.path.join(
        out, f"part={survivor}", m["partitions"][survivor]["files"][0]
    )
    mtime_before = os.path.getmtime(survivor_file)

    # resume: same fingerprint -> only the missing partition is rewritten
    m2 = resumable_write(_toy_ds(), out, key_col="k", n_parts=8, fingerprint="fp1")
    assert m2["total_rows"] == 100
    assert m2["partitions"][victim]["rows"] == lost_rows
    assert os.path.getmtime(survivor_file) == mtime_before  # untouched

    # read-back equals the input
    back = read_partitioned(out).to_pandas().sort_values(["k", "v"])
    assert len(back) == 100 and back["v"].sum() == sum(range(100))

    # changed fingerprint (config/input changed) -> full rewrite
    m3 = resumable_write(_toy_ds(), out, key_col="k", n_parts=8, fingerprint="fp2")
    assert m3["fingerprint"] == "fp2" and m3["total_rows"] == 100
    assert not os.path.exists(survivor_file)  # stale output fully replaced


def test_kg_pipeline_end_to_end(ray_session, sf_dir, tmp_path):
    out = str(tmp_path / "kg")
    summary = run_kg_pipeline_from_sf(sf_dir, out)
    assert summary["turns"] == 1000
    assert summary["nodes"] == 1000
    n_convs = 15  # sf0.001: user_id 0..14
    assert summary["edges"] == 1000 - n_convs
    assert summary["entities"] == 25  # one per nation, aliases merged
    assert summary["triples"] > 0

    # sinks exist with manifests; entities carry KB links
    for sub in ["transcripts", "nodes", "edges", "triples"]:
        assert load_manifest(os.path.join(out, sub))["total_rows"] > 0
    ents = pq.read_table(os.path.join(out, "entities.parquet")).to_pandas()
    assert ents["kb_nationkey"].notna().all()

    # idempotent re-run: everything manifested -> nothing rewritten, same sums
    summary2 = run_kg_pipeline_from_sf(sf_dir, out)
    assert summary2["triples"] == summary["triples"]


def test_ordering_invariant_under_shuffled_input(ray_session, tmp_path):
    """FIXTURES.md §4: rows arriving in arbitrary order must reassemble into
    byte-identical per-conversation turn sequences (the reference's
    ORDER BY t.time read, src/Neo4jUtils.jl:96)."""
    from tcx2graph_jl_ray.stages.graph import build_next_turn_edges

    base = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4 + ["c2"] * 3,
            "turn_idx": pd.array([0, 1, 2, 3, 0, 1, 2], dtype="int32"),
            "role": ["user"] * 7,
            "text": [f"t{i}" for i in range(7)],
            "tool": [None] * 7,
            "ts": pd.to_datetime(["2024-01-01"] * 7),
        }
    )
    shuffled = base.sample(frac=1.0, random_state=7).reset_index(drop=True)
    edges = build_next_turn_edges(ray.data.from_pandas(shuffled)).to_pandas()
    edges = edges.sort_values(["conv_id", "src_turn"]).reset_index(drop=True)
    assert list(edges[edges.conv_id == "c1"]["src_turn"]) == [0, 1, 2]
    assert list(edges[edges.conv_id == "c2"]["src_turn"]) == [0, 1]


def test_kg_pipeline_entity_dataset_sink(ray_session, sf_dir, tmp_path):
    """Planted small-budget run: with broadcast_map_budget=0 the entity table
    stays a Dataset end-to-end and lands in a partitioned resumable sink
    (entities/ with a manifest), with the same entity vocabulary as the
    default vocabulary-bounded path writes to entities.parquet."""
    from tcx2graph_jl_ray.config import PipelineConfig

    out = str(tmp_path / "kg_dsent")
    cfg = PipelineConfig(
        small_graph_threshold=0, broadcast_map_budget=0, join_num_partitions=4
    )
    summary = run_kg_pipeline_from_sf(sf_dir, out, config=cfg)
    assert summary["entities"] == 25
    m = load_manifest(os.path.join(out, "entities"))
    assert m["total_rows"] == 25
    assert not os.path.exists(os.path.join(out, "entities.parquet"))

    ents = (
        read_partitioned(os.path.join(out, "entities"))
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    # KB links applied on the Dataset path too
    assert ents["kb_nationkey"].notna().all()

    # same vocabulary as the default driver-side path
    out2 = str(tmp_path / "kg_default")
    run_kg_pipeline_from_sf(sf_dir, out2)
    ents2 = (
        pq.read_table(os.path.join(out2, "entities.parquet"))
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        ents[["entity_id", "n_surfaces", "n_turns", "n_mentions"]],
        ents2[["entity_id", "n_surfaces", "n_turns", "n_mentions"]],
        check_dtype=False,
    )
