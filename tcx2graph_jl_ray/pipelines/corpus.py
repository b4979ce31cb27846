"""Corpus curation pipeline: the training-data companion to the flagship KG
pipeline — documents in, deduplicated + quality-annotated corpus out.

Mirrors the lifecycle shape of the reference's main flow (examples/main.jl:
load -> detect -> aggregate -> CSV sinks) over a document corpus instead of
rides: read -> exact dedup -> near-dup clustering (MinHash-LSH) -> per-doc
quality/lang/token annotation -> resumable partitioned Parquet.

Stage graph (all Dataset -> Dataset, streaming end to end):

    read_parquet(documents)
      -> exact_dedup            (unique-cell dedup, src/GraphUtils.jl:46-88)
      -> neardup_minhash        (overlap detect+merge, OverlappingSegmentsUtils.jl:91-277)
      -> keep cluster minima    (greedy accepted-set dedup, :229-240)
      -> quality + lang-id cols (feature extraction, SegmentAnalysis.jl:96-146)
      -> resumable write        (progress/resume, examples/updateWeatherNeo4j.jl:244-288)

The survivors join is a Bloom-prefiltered semi-join (broadcast a fixed-size
filter, exact re-verify group-side) — never a broadcast id set and never a
driver materialization of the corpus.
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import ray
import ray.data

from tcx2graph_jl_ray.config import DEFAULT_CONFIG, PipelineConfig
from tcx2graph_jl_ray.state.manifest import resumable_write


def _survivor_ids(docs: ray.data.Dataset, config: PipelineConfig) -> ray.data.Dataset:
    """doc_id table of documents that survive exact + near-dup dedup:
    the minimum doc_id of each exact-duplicate group, intersected with the
    minimum doc_id of each minhash near-dup cluster."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.stages.dedup import exact_dedup, neardup_minhash

    exact = exact_dedup(docs).select_columns(["doc_id"])

    clusters = neardup_minhash(docs, config)

    def cluster_minima(bucket: pd.DataFrame) -> pd.DataFrame:
        keep = bucket.groupby("cluster_id", sort=False)["doc_id"].min()
        return pd.DataFrame({"doc_id": keep.astype("int64").to_numpy()})

    near = bucketed_group_apply(clusters, ["cluster_id"], cluster_minima)

    # survivors = exact-min ∩ near-dup-cluster-min: a doc must be the
    # canonical representative under BOTH criteria. Intersection as a
    # bucketed union-count (2 carriers per id == present in both sides).
    def both(bucket: pd.DataFrame) -> pd.DataFrame:
        c = bucket.groupby("doc_id", sort=False).size()
        return pd.DataFrame({"doc_id": c.index[c >= 2].astype("int64")})

    return bucketed_group_apply(exact.union(near), ["doc_id"], both)


def run_corpus_pipeline(
    docs: ray.data.Dataset,
    out_dir: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    n_parts: int = 32,
    lineage: dict | None = None,
) -> dict:
    """Documents -> curated corpus under ``out_dir/corpus`` (hash-partitioned
    by doc_id, per-partition manifest). Returns a metrics summary."""
    from tcx2graph_jl_ray.functions.bloom import BloomFilter

    lineage = dict(lineage or {})
    fp = hashlib.sha256(
        json.dumps({"lineage": lineage, "tau": config.jaccard_threshold},
                   sort_keys=True).encode()
    ).hexdigest()[:16]

    survivors = _survivor_ids(docs, config).materialize()
    n_survivors = survivors.count()

    # Bloom-prefiltered semi-join: stream survivor ids into a fixed-size
    # filter, broadcast it, drop non-survivors per batch, exact re-verify via
    # a bucketed join against the survivor table (false positives removed).
    bloom = BloomFilter(max(n_survivors, 64), fp_rate=0.001)
    for b in survivors.iter_batches(batch_size=65536, batch_format="pandas"):
        bloom.add(b["doc_id"])
    bloom_ref = ray.put(bloom)

    class _Prefilter:
        def __init__(self, ref):
            self.bloom = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch[self.bloom.contains(batch["doc_id"])]

    kept = docs.map_batches(
        _Prefilter,
        fn_constructor_args=(bloom_ref,),
        batch_format="pandas",
        batch_size=8192,
        concurrency=(1, 8),
    )

    # exact re-verify: distributed hash semi-join against the survivor table
    # removes the Bloom filter's false positives (the filter is a superset
    # pre-filter; the join is the exact gate)
    curated = kept.join(
        survivors, "left_semi", num_partitions=n_parts, on=("doc_id",)
    )

    # per-doc quality + language annotation: per-row maps, so they attach
    # INLINE in one stage (row-aligned frames) — an annotation that can be
    # computed from the row itself must never cost a join/shuffle
    from tcx2graph_jl_ray.stages.text import _token_frame, lang_frame, quality_frame

    def annotate(batch: pd.DataFrame) -> pd.DataFrame:
        tf = _token_frame(batch)  # tokenize once, share across annotators
        qf = quality_frame(batch, tf).drop(columns=["doc_id", "n_chars"])
        lf = lang_frame(batch, tf).drop(columns=["doc_id"])
        out = batch.reset_index(drop=True)
        for c in qf.columns:
            out[c] = qf[c].to_numpy()
        out["lang_pred"] = lf["lang_pred"].to_numpy()
        return out

    annotated = curated.map_batches(
        annotate, batch_format="pandas", batch_size=8192
    )

    m = resumable_write(
        annotated, os.path.join(out_dir, "corpus"), "doc_id", n_parts, fp,
        lineage,
    )
    return {
        "fingerprint": fp,
        "survivors": int(n_survivors),
        "rows_written": m["total_rows"],
        "out_dir": out_dir,
    }
