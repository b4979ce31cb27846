"""Flagship pipeline: transcripts -> knowledge graph, materialized as Parquet.

The Ray-Data recast of the reference's main flow (examples/main.jl:72-260):
load -> property graph -> overlap detection -> aggregation -> sinks, i.e.

    read/derive transcripts
      -> nodes + NEXT_TURN edges            (create_property_graph, G1)
      -> mentions + triples (actor pools)   (enrichment stages, M8/M9)
      -> canonicalize entities              (find_overlapping_segments, G2)
      -> rewrite triples to canonical ids   (segment-run join, J1)
      -> resumable partitioned Parquet      (Neo4j/CSV sinks, S5/S6)

Every sink is hash-partitioned by ``conv_id`` (nodes/edges/triples) with a
per-partition lineage manifest (state/manifest.py), so a killed run resumes
mid-stage.
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import ray.data

from tcx2graph_jl_ray.config import DEFAULT_CONFIG, PipelineConfig
from tcx2graph_jl_ray.sources.transcripts import derive_transcripts
from tcx2graph_jl_ray.stages.canonicalize import canonicalize, rewrite_triples
from tcx2graph_jl_ray.stages.extract import extract_mentions, extract_triples
from tcx2graph_jl_ray.stages.graph import build_next_turn_edges, build_nodes
from tcx2graph_jl_ray.stages.link import link_entities, load_kb
from tcx2graph_jl_ray.state.manifest import resumable_write, write_inspection_summary


TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(path: str) -> ray.data.Dataset:
    """Read a transcripts Parquet table/directory (the engine's authoritative
    input shape, BASELINE.json input_hint) with column pruning and an early
    schema check — a missing column should fail at the read with a clear
    message, not deep inside a stage."""
    try:
        return ray.data.read_parquet(path, columns=TRANSCRIPT_COLUMNS)
    except KeyError as err:
        # read_parquet's projection already detects the missing column;
        # re-raise with the full expected schema for the user
        raise ValueError(
            f"transcripts input at {path!r} does not match the required "
            f"schema {TRANSCRIPT_COLUMNS} (conv_id:string, turn_idx:int32, "
            f"role:string, text:string, tool:string|null, ts:timestamp): {err}"
        ) from err


def _fingerprint(config: PipelineConfig, lineage: dict) -> str:
    blob = json.dumps(
        {
            "containment": config.verify_containment,
            "max_block_size": config.max_block_size,
            "lineage": lineage,
        },
        sort_keys=True,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def run_kg_pipeline(
    transcripts: ray.data.Dataset,
    out_dir: str,
    sf_dir: str | None = None,
    config: PipelineConfig = DEFAULT_CONFIG,
    n_parts: int = 32,
    lineage: dict | None = None,
    stage_via: str = "parquet",
) -> dict:
    """Execute the full KG pipeline and materialize nodes/, edges/, triples/,
    entities/ under ``out_dir``. Returns a metrics summary (the per-stage
    row counts the reference prints as progress, plus manifest totals).

    ``stage_via`` picks how the ordered transcripts table (four downstream
    consumers) is staged:

    - ``"parquet"`` (default): write the staged table, re-read it. MEASURED
      faster than object-store pinning at bench scale (3 interleaved reps
      each at mult=32/32 CPUs: 34.9-45.2 s vs 46.6-54.1 s): the serial
      write is cheap, the re-read hands every consumer cleanly partitioned
      streaming scans, and no sink competes with the extraction stages for
      CPU. Also the resume point — a killed run picks up AFTER derivation.
    - ``"object_store"``: ``materialize()`` pins the blocks and the
      transcripts Parquet sink runs concurrently with downstream stages —
      the evaluated alternative, kept for environments where the staging
      disk (not CPU) is the bottleneck.
    """
    lineage = dict(lineage or {})
    fp = _fingerprint(config, lineage)

    # Stage 0: normalize (drop null-text turns — the lat/lon presence filter
    # M2, src/TCXParser.jl:58; dirty inputs are allowed per the input
    # contract) and stage the ordered transcripts once for the four
    # downstream consumers.
    def drop_null_text(batch):
        return batch[batch["text"].notna()]

    transcripts = transcripts.map_batches(
        drop_null_text, batch_format="pandas", batch_size=16384
    )
    t_dir = os.path.join(out_dir, "transcripts")
    f_t = None
    _sink_pool = None
    if stage_via == "parquet":
        m_t = resumable_write(transcripts, t_dir, "conv_id", n_parts, fp, lineage)
        staged = read_transcripts(t_dir)
    else:
        staged = transcripts.materialize()
        from concurrent.futures import ThreadPoolExecutor as _TPE

        _sink_pool = _TPE(max_workers=1)
        f_t = _sink_pool.submit(
            resumable_write, staged, t_dir, "conv_id", n_parts, fp, lineage
        )

    try:
        return _run_kg_body(
            staged, out_dir, sf_dir, config, n_parts, lineage, fp,
            m_t_future=f_t, m_t=None if f_t is not None else m_t,
        )
    finally:
        # an exception mid-pipeline must still join the background
        # transcripts sink and release its thread (otherwise a non-daemon
        # writer delays process exit and its write result goes unchecked;
        # on the success path the body already consumed f_t.result())
        if _sink_pool is not None:
            _sink_pool.shutdown(wait=True)


def _run_kg_body(
    staged: ray.data.Dataset,
    out_dir: str,
    sf_dir: str | None,
    config: PipelineConfig,
    n_parts: int,
    lineage: dict,
    fp: str,
    m_t_future=None,
    m_t: dict | None = None,
) -> dict:
    nodes = build_nodes(staged)
    edges = build_next_turn_edges(staged)
    from tcx2graph_jl_ray.stages.extract import pool_bounds

    bounds = pool_bounds(config.extract_concurrency)
    mentions = extract_mentions(
        staged, concurrency=bounds, batch_size=config.extract_batch_size,
        heavy_reps=config.extract_heavy_reps,
    )
    triples = extract_triples(
        staged, concurrency=bounds, batch_size=config.extract_batch_size,
        heavy_reps=config.extract_heavy_reps,
    )

    # Critical-path overlap: nodes/edges sinks and raw-triple extraction do
    # NOT depend on canonicalization — only the triple REWRITE does. Launch
    # them concurrently with canonicalize so the canonical-map build (a
    # serial driver-coordinated phase) hides behind sink I/O and the
    # regex-extraction scan; the rewrite+write of triples is the only work
    # left after the map exists. (Measured ~20% off the 32-CPU wall time.)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_nodes = pool.submit(
            resumable_write, nodes, os.path.join(out_dir, "nodes"),
            "conv_id", n_parts, fp, lineage,
        )
        f_edges = pool.submit(
            resumable_write, edges, os.path.join(out_dir, "edges"),
            "conv_id", n_parts, fp, lineage,
        )
        # pin raw triples: consumed once by the rewrite after canonicalize
        # finishes (at 100 TB this intermediate spills via the object store;
        # a parquet stage would also work but adds a disk round-trip)
        f_triples_raw = pool.submit(triples.materialize)

        entities, cmap = canonicalize(mentions, config)
        if sf_dir is not None:
            entities = link_entities(entities, load_kb(sf_dir))

        m_nodes = m_edges = None
        if isinstance(cmap, ray.data.Dataset):
            # web-scale branch: the rewrite is a distributed hash JOIN whose
            # shuffle actors reserve CPUs up front — at low CPU counts that
            # reservation deadlocks against the still-executing sink
            # datasets, so drain the sinks first (sequencing only this
            # branch keeps the measured overlap win on the broadcast path)
            m_nodes, m_edges = f_nodes.result(), f_edges.result()

        triples_c = rewrite_triples(f_triples_raw.result(), cmap)
        m_triples = resumable_write(
            triples_c, os.path.join(out_dir, "triples"),
            "conv_id", n_parts, fp, lineage,
        )
        if m_nodes is None:
            m_nodes, m_edges = f_nodes.result(), f_edges.result()
    if m_t_future is not None:
        m_t = m_t_future.result()
    if isinstance(entities, ray.data.Dataset):
        # web-scale branch (surfaces > broadcast_map_budget): the entity
        # table never touched the driver — partitioned resumable sink,
        # same lineage discipline as the fact tables
        m_ent = resumable_write(
            entities, os.path.join(out_dir, "entities"),
            "entity_id", n_parts, fp, lineage,
        )
        n_entities = int(m_ent["total_rows"])
    else:
        entities_path = os.path.join(out_dir, "entities.parquet")
        entities.to_parquet(entities_path, index=False)  # vocabulary-bounded
        n_entities = int(len(entities))

    write_inspection_summary(out_dir)  # human-openable run summary (S7 sink)

    return {
        "fingerprint": fp,
        "turns": m_t["total_rows"],
        "nodes": m_nodes["total_rows"],
        "edges": m_edges["total_rows"],
        "triples": m_triples["total_rows"],
        "entities": n_entities,
        "out_dir": out_dir,
    }


def run_kg_pipeline_from_sf(
    sf_dir: str,
    out_dir: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    n_parts: int = 32,
    mult: int = 1,
) -> dict:
    """Testdata adapter: derive the transcripts table from the sf tables, then
    run the flagship pipeline. ``mult`` replicates the input (bench-only)."""
    transcripts = derive_transcripts(sf_dir, mult=mult)
    return run_kg_pipeline(
        transcripts, out_dir, sf_dir=sf_dir, config=config, n_parts=n_parts,
        lineage={"input": sf_dir, "source": "derive_transcripts", "mult": mult},
    )
