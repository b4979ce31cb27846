"""End-to-end tests for the hybrid retrieval-index pipeline
(pipelines/retrieval.py): build -> pruned-read search equality against the
in-corpus operators, plus manifest resume."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import ray.data


def _build(sf_dir, tmp_path, n_parts=8, n_cells=8):
    from tcx2graph_jl_ray.pipelines.retrieval import run_retrieval_pipeline

    out = str(tmp_path / "idx")
    summary = run_retrieval_pipeline(
        sf_dir, out, n_parts=n_parts, n_cells=n_cells
    )
    return out, summary


def test_bm25_search_matches_in_corpus_operator(ray_session, sf_dir,
                                                tmp_path):
    """The index read path must score IDENTICALLY to stages.text.bm25_topk
    (same formula, rounding, tie-break) for every canonical query."""
    from tcx2graph_jl_ray.pipelines.retrieval import bm25_search
    from tcx2graph_jl_ray.stages.text import BM25_QUERIES, bm25_topk

    out, summary = _build(sf_dir, tmp_path)
    assert summary["rows"]["postings"] > 0
    assert summary["rows"]["doclens"] == summary["meta"]["n_docs"]

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    ref = bm25_topk(docs, BM25_QUERIES, k=10)
    ref = ref.to_pandas() if isinstance(ref, pd.DataFrame) is False else ref
    for qid, terms in BM25_QUERIES:
        mine = bm25_search(out, terms, k=10)
        want = ref[ref["query_id"] == qid].sort_values("rank")[
            ["doc_id", "rank", "score"]
        ].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            mine.astype({"doc_id": "int64"}),
            want.astype({"doc_id": "int64"}),
            check_dtype=False,
        )


def test_ann_full_probe_equals_brute_force(ray_session, sf_dir, tmp_path):
    """nprobe = n_cells degrades the IVF probe to an exact full scan — it
    must equal the brute-force top-k exactly (same rounding, tie-break)."""
    from tcx2graph_jl_ray.pipelines.retrieval import ann_search

    out, _ = _build(sf_dir, tmp_path)
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").to_pandas()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    for qi in (0, 7):
        q = vecs[qi]
        full = ann_search(out, q, k=5, nprobe=8)
        d = np.round(np.sqrt(((vecs - q) ** 2).sum(axis=1)), 6)
        bf = pd.DataFrame({
            "vec_id": emb["vec_id"].astype("int64"), "dist": d,
        }).sort_values(["dist", "vec_id"], kind="mergesort").head(5)
        assert list(full["vec_id"]) == list(bf["vec_id"])
        # a narrow probe must return a SUBSET ranking drawn from its cells
        narrow = ann_search(out, q, k=5, nprobe=1)
        assert len(narrow) <= 5
        assert list(narrow["dist"]) == sorted(narrow["dist"])


def test_retrieval_resume_skips_finished_partitions(ray_session, sf_dir,
                                                    tmp_path):
    from tcx2graph_jl_ray.pipelines.retrieval import run_retrieval_pipeline

    out, s1 = _build(sf_dir, tmp_path)
    # manifest present for every row-scale table
    for tbl in ("postings", "doclens", "dictionary", "vectors"):
        assert os.path.exists(os.path.join(out, tbl, "_manifest.json"))
    s2 = run_retrieval_pipeline(sf_dir, out, n_parts=8, n_cells=8)
    assert s2["rows"] == s1["rows"]
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["fingerprint"] == s1["fingerprint"]
