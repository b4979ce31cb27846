"""End-to-end corpus curation pipeline: dedup + annotate + resumable sink."""

import os

import pandas as pd
import ray.data

from tcx2graph_jl_ray.pipelines.corpus import run_corpus_pipeline
from tcx2graph_jl_ray.state.manifest import load_manifest, read_partitioned


def _docs(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def test_corpus_pipeline_end_to_end(ray_session, sf_dir, tmp_path):
    out = str(tmp_path / "corpus_out")
    summary = run_corpus_pipeline(_docs(sf_dir), out, n_parts=8)
    assert summary["rows_written"] == summary["survivors"] > 0

    curated = read_partitioned(os.path.join(out, "corpus")).to_pandas()
    # annotation columns attached
    for c in ["n_tokens", "n_types", "stopword_ratio", "lang_pred"]:
        assert c in curated.columns
    # no exact-duplicate text survives
    assert curated["text"].nunique() == len(curated)
    # at most one member of each planted near-dup pair survives (the planted
    # pairs are the >=0.9 word-bigram Jaccard pairs, see test_dedup_text)
    from tcx2graph_jl_ray.stages.dedup import ngram_jaccard_join

    pairs = ngram_jaccard_join(_docs(sf_dir), threshold=0.9).to_pandas()
    kept = set(curated["doc_id"])
    assert len(pairs) > 0
    for a, b in zip(pairs["a"], pairs["b"]):
        assert not (a in kept and b in kept), f"near-dup pair ({a},{b}) both kept"
    # survivors are exactly the minhash-cluster minima (clusters may chain
    # beyond single pairs, so the canonical representative is the CLUSTER
    # min, not each pair's min)
    from tcx2graph_jl_ray.stages.dedup import neardup_minhash

    clusters = neardup_minhash(_docs(sf_dir)).to_pandas()
    expected = set(clusters.groupby("cluster_id")["doc_id"].min())
    assert kept == expected


def test_corpus_pipeline_resume_skips_done(ray_session, sf_dir, tmp_path):
    out = str(tmp_path / "corpus_resume")
    s1 = run_corpus_pipeline(_docs(sf_dir), out, n_parts=8)
    m1 = load_manifest(os.path.join(out, "corpus"))
    s2 = run_corpus_pipeline(_docs(sf_dir), out, n_parts=8)
    m2 = load_manifest(os.path.join(out, "corpus"))
    assert s1["rows_written"] == s2["rows_written"]
    # identical partitions on resume (no rewrite of manifested work)
    assert m1["partitions"] == m2["partitions"]
    assert m1["fingerprint"] == m2["fingerprint"]
