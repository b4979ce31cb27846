"""Retrieval-index pipeline: the fourth end-to-end flow next to the KG,
corpus and analytics pipelines — raw documents + embeddings in, a PERSISTED
hybrid retrieval index out, plus the search path that reads it back with
pruned I/O. Mirrors the reference's build-then-query lifecycle
(src/PathFinder.jl builds the adjacency once, queries walk it) for the
lexical/vector axes.

Index layout under ``out_dir`` (every row-scale table goes through the
hash-partitioned ``resumable_write`` manifest sink, so a failed build skips
finished partitions on resume and a changed input fingerprint invalidates):

    postings/    (term, doc_id, tf)        partitioned by hash(term)
    doclens/     (doc_id, dl)              partitioned by hash(doc_id)
    dictionary/  (term, df, cf)            partitioned by hash(term)
    vectors/     (vec_id, cell, embedding) partitioned by CELL (IVF layout)
    centroids.parquet, meta.json           dimension-bounded small files

The search side is the point of the layout:

- ``bm25_search`` reads ONLY the postings/dictionary partitions that can
  contain the query's terms (``partition_of`` on the query terms prunes the
  directory list before any byte is read) and scores with the exact
  ``bm25_topk`` formula — the inverted-index read path costs O(query terms),
  not O(vocabulary).
- ``ann_search`` reads ONLY the ``nprobe`` closest cells' vector partitions
  (the IVF contract); ``nprobe = n_cells`` degrades to an exact full scan,
  which the tests exploit as an equality oracle against brute force.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import ray
import ray.data

from tcx2graph_jl_ray.state.manifest import partition_of, resumable_write

_TOKEN_SPLIT = " "


def _token_counts(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc term frequencies — one explode + one groupby per batch; a
    doc's text lives in ONE row, so postings need no shuffle at all."""
    b = batch[batch["text"].notna()]
    toks = b["text"].str.lower().str.split(_TOKEN_SPLIT)
    tf = pd.DataFrame({
        "row": np.repeat(np.arange(len(b)), toks.str.len()),
        "term": [t for ws in toks for t in ws],
    })
    tf = tf[tf["term"] != ""]
    doc = b["doc_id"].astype("int64").to_numpy()
    g = tf.groupby(["row", "term"], sort=False).size().reset_index(name="tf")
    return pd.DataFrame({
        "term": g["term"],
        "doc_id": doc[g["row"].to_numpy()],
        "tf": g["tf"].astype("int64"),
    })


def _doc_lens(batch: pd.DataFrame) -> pd.DataFrame:
    b = batch[batch["text"].notna()]
    toks = b["text"].str.lower().str.split(_TOKEN_SPLIT)
    dl = np.array(
        [sum(1 for t in ws if t) for ws in toks], dtype="int64"
    )
    return pd.DataFrame({
        "doc_id": b["doc_id"].astype("int64").to_numpy(),
        "dl": dl,
    })


def run_retrieval_pipeline(
    sf_dir: str,
    out_dir: str,
    n_parts: int = 16,
    n_cells: int = 16,
    lineage: dict | None = None,
) -> dict:
    """documents.parquet + embeddings.parquet -> hybrid retrieval index
    under ``out_dir``. Returns a metrics summary."""
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply
    from tcx2graph_jl_ray.stages.ann import _assign_cells, train_ivf_centroids

    lineage = dict(lineage or {})
    fp = hashlib.sha256(
        json.dumps({"lineage": lineage, "sf_dir": sf_dir,
                    "n_cells": n_cells}, sort_keys=True).encode()
    ).hexdigest()[:16]

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    os.makedirs(out_dir, exist_ok=True)
    rows: dict[str, int] = {}

    # -- lexical side ------------------------------------------------------
    postings = docs.map_batches(
        _token_counts, batch_format="pandas", batch_size=4096
    ).materialize()  # consumed by the postings sink AND the dictionary
    m_post = resumable_write(
        postings, os.path.join(out_dir, "postings"), "term", n_parts, fp,
        lineage,
    )
    rows["postings"] = int(m_post["total_rows"])

    doclens = docs.map_batches(
        _doc_lens, batch_format="pandas", batch_size=4096
    )
    m_dl = resumable_write(
        doclens, os.path.join(out_dir, "doclens"), "doc_id", n_parts, fp,
        lineage,
    )
    rows["doclens"] = int(m_dl["total_rows"])

    # dictionary: df = postings rows per term (each (term, doc) appears
    # exactly once), cf = sum tf — a SALTED exact reduce (stopword whales
    # split across tasks, re-summed algebraically)
    def dict_fold(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("term", sort=False).agg(
            df=("df", "sum"), cf=("cf", "sum")
        ).reset_index()
        g["df"] = g["df"].astype("int64")
        g["cf"] = g["cf"].astype("int64")
        return g

    dict_parts = postings.map_batches(
        lambda b: b.assign(df=np.int64(1)).rename(columns={"tf": "cf"})
        .groupby("term", sort=False).agg(df=("df", "sum"), cf=("cf", "sum"))
        .reset_index(),
        batch_format="pandas", batch_size=65536,
    )
    dictionary = salted_group_apply(
        dict_parts, ["term"], partial_fn=dict_fold, merge_fn=dict_fold
    )
    m_dict = resumable_write(
        dictionary, os.path.join(out_dir, "dictionary"), "term", n_parts,
        fp, lineage,
    )
    rows["dictionary"] = int(m_dict["total_rows"])

    # corpus scalars (N, total_dl) — combiner partials, folded on the driver
    scal = doclens.map_batches(
        lambda b: pd.DataFrame({
            "n": [np.int64(len(b))],
            "s": [np.int64(b["dl"].sum())],
        }),
        batch_format="pandas",
    ).to_pandas()
    n_docs, total_dl = int(scal["n"].sum()), int(scal["s"].sum())

    # -- vector side -------------------------------------------------------
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    centroids = train_ivf_centroids(emb, n_cells=n_cells)
    pd.DataFrame({
        "cell": np.arange(len(centroids), dtype="int64"),
        "centroid": list(centroids.astype(np.float64)),
    }).to_parquet(os.path.join(out_dir, "centroids.parquet"), index=False)

    cref = ray.put(centroids)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "vec_id": batch["vec_id"].astype("int64").to_numpy(),
            "cell": _assign_cells(vecs, c).astype("int64"),
            "embedding": batch["embedding"],
        })

    vectors = emb.map_batches(assign, batch_format="pandas", batch_size=4096)
    # partition BY CELL: n_parts == n_cells and part id == cell id, so a
    # probe reads exactly its cells' directories
    m_vec = resumable_write(
        vectors, os.path.join(out_dir, "vectors"), "cell", n_cells, fp,
        lineage,
    )
    rows["vectors"] = int(m_vec["total_rows"])

    meta = {
        "fingerprint": fp, "n_parts": n_parts, "n_cells": n_cells,
        "n_docs": n_docs, "total_dl": total_dl,
        "avgdl": total_dl / max(n_docs, 1),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return {"fingerprint": fp, "out_dir": out_dir, "rows": rows,
            "meta": meta}


def _parts_for(keys: list, n_parts: int) -> list[str]:
    ids = sorted(set(
        int(p) for p in partition_of(pd.Series(keys), n_parts)
    ))
    return [f"part={i}" for i in ids]


def _read_parts(root: str, parts: list[str]) -> ray.data.Dataset | None:
    import glob

    files: list[str] = []
    for p in parts:
        d = os.path.join(root, p)
        if os.path.isdir(d):
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not files:
        return None
    return ray.data.read_parquet(files)


def bm25_search(
    out_dir: str,
    terms: tuple,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """Score the persisted index against one term tuple — reading ONLY the
    postings/dictionary partitions the terms hash into (directory-level
    pruning before any byte moves), then one co-partitioned doc-keyed join
    against doclens and a local-top-k reduce. Formula, rounding (6) and
    doc_id tie-break are identical to ``stages.text.bm25_topk``, so the
    index path is equality-testable against the in-corpus path.
    Output: doc_id, rank, score."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    n_parts, n_docs = meta["n_parts"], meta["n_docs"]
    avgdl = meta["avgdl"]
    terms = tuple(sorted(set(terms)))
    parts = _parts_for(list(terms), n_parts)

    dic = _read_parts(os.path.join(out_dir, "dictionary"), parts)
    post = _read_parts(os.path.join(out_dir, "postings"), parts)
    if dic is None or post is None:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    dic_pd = dic.to_pandas()  # bounded by the pruned partitions' vocab
    dic_pd = dic_pd[dic_pd["term"].isin(terms)]
    idf = {
        t: float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
        for t, df in zip(dic_pd["term"], dic_pd["df"])
    }
    if not idf:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})

    hit = post.map_batches(
        lambda bt: bt[bt["term"].isin(set(idf))][["term", "doc_id", "tf"]],
        batch_format="pandas", batch_size=65536,
    )
    # doclens: per-doc length joins the candidate postings co-partitioned
    dl_all = ray.data.read_parquet(os.path.join(out_dir, "doclens"))
    joined = hash_join(hit, dl_all, on="doc_id", n_buckets=8)

    def score_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        w = bucket["term"].map(idf).to_numpy(dtype="float64")
        tf = bucket["tf"].to_numpy(dtype="float64")
        dl = bucket["dl"].to_numpy(dtype="float64")
        s = w * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        d = pd.DataFrame({"doc_id": bucket["doc_id"].astype("int64"),
                          "score": s})
        g = d.groupby("doc_id", sort=False)["score"].sum().reset_index()
        g["score"] = np.round(g["score"], 6)
        return g.sort_values(["score", "doc_id"],
                             ascending=[False, True]).head(k)

    top = bucketed_group_apply(joined, ["doc_id"], score_bucket, n_buckets=8)
    res = top.to_pandas().sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k).reset_index(drop=True)
    res["rank"] = np.arange(1, len(res) + 1, dtype="int64")
    return res[["doc_id", "rank", "score"]]


def ann_search(
    out_dir: str, qvec: np.ndarray, k: int = 10, nprobe: int = 4
) -> pd.DataFrame:
    """IVF probe over the persisted cell-partitioned vector table: rank
    cells by centroid distance, read ONLY the ``nprobe`` closest cells'
    directories, brute-force those. ``nprobe = n_cells`` is an exact full
    scan (the tests' equality oracle). L2 distances rounded 6, vec_id
    tie-break. Output: vec_id, rank, dist."""
    cent = pd.read_parquet(os.path.join(out_dir, "centroids.parquet"))
    c = np.stack(cent["centroid"].to_numpy()).astype(np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    order = np.argsort(((c - q) ** 2).sum(axis=1), kind="stable")
    cells = [int(cent["cell"].iloc[i]) for i in order[:nprobe]]
    vec = _read_parts(os.path.join(out_dir, "vectors"),
                      [f"part={i}" for i in cells])
    if vec is None:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64"),
                             "dist": pd.Series([], dtype="float64")})

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        d = np.round(np.sqrt(((vecs - q) ** 2).sum(axis=1)), 6)
        out = pd.DataFrame({
            "vec_id": batch["vec_id"].astype("int64").to_numpy(),
            "dist": d,
        })
        return out.sort_values(["dist", "vec_id"], kind="mergesort").head(k)

    cand = vec.map_batches(local_topk, batch_format="pandas",
                           batch_size=4096).to_pandas()
    res = cand.sort_values(["dist", "vec_id"], kind="mergesort")\
        .head(k).reset_index(drop=True)
    res["rank"] = np.arange(1, len(res) + 1, dtype="int64")
    return res[["vec_id", "rank", "dist"]]
