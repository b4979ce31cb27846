"""Approximate-nearest-neighbor search over an embedding column.

Pattern: broadcast the (small) query matrix once (``ray.put``), stream the
corpus through ``map_batches`` computing cosine against all queries per batch
(one numpy matmul — never a per-row loop), emit only each batch's per-query
top-k (partial top-k = the combiner), then merge partials in one tiny grouped
stage. The LSH variant buckets by random-hyperplane signs and searches only
matching buckets — the blocking analogue of the reference's KD-tree probe
(src/Utils.jl:243-252, src/OverlappingSegmentsUtils.jl:146-206).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    df = df[df["vec_id"] < n_queries].sort_values("vec_id")
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(dtype=np.int64), q


class _BatchTopK:
    """Actor-pool stage: embeddings batch -> per-query partial top-k rows."""

    def __init__(self, q_ref, k: int):
        self.qids, q = ray.get(q_ref)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vecs @ self.qn.T  # (batch, n_queries)
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        k = min(self.k, len(ids))
        out = []
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            # deterministic tie-break matching the oracle's ORDER BY sim
            # DESC, vec_id: sort by (-sim, vec_id) so ties keep the lowest id
            top = np.lexsort((ids, -col))[:k]
            out.append(
                pd.DataFrame(
                    {"query_id": qid, "vec_id": ids[top], "sim": col[top]}
                )
            )
        return pd.concat(out, ignore_index=True)


def ann_brute_topk(
    embeddings: ray.data.Dataset, sf_dir: str, n_queries: int = 8, k: int = 10
) -> ray.data.Dataset:
    """Exact cosine top-k per query (the correctness baseline for ANN).
    Output: query_id, vec_id, rank (1-based; ties broken by vec_id)."""
    q_ref = ray.put(_load_queries(sf_dir, n_queries))

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _BatchTopK,
        fn_constructor_args=(q_ref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 16),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort")
        top = g.head(k)
        return pd.DataFrame(
            {
                "query_id": top["query_id"].astype("int64").to_numpy(),
                "vec_id": top["vec_id"].astype("int64").to_numpy(),
                "rank": pd.array(range(1, len(top) + 1), dtype="int64"),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


ANN_BRUTE_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {n_queries}
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM s
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def embedding_nearest_neighbor(
    embeddings: ray.data.Dataset, sf_dir: str
) -> ray.data.Dataset:
    """Embedding-cosine near-dup candidates: each vector's single nearest
    other vector (ties by lower id) — the exact all-pairs baseline. The full
    normalized matrix is broadcast once and each batch does one matmul
    against it; the LSH-bucketed path (ann_lsh_topk) is the 100 TB variant
    where a broadcast corpus no longer fits. Output: vec_id, nn_id."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas().sort_values("vec_id")
    ids = t["vec_id"].to_numpy(dtype=np.int64)
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, m))

    class _NN:
        def __init__(self, r):
            self.ids, self.m = ray.get(r)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = vecs @ self.m.T
            bids = batch["vec_id"].to_numpy(dtype=np.int64)
            # mask self-similarity; argmax returns the FIRST max -> ties
            # resolve to the lowest id (matrix is sorted by vec_id)
            self_pos = np.searchsorted(self.ids, bids)
            sims[np.arange(len(bids)), self_pos] = -np.inf
            nn = self.ids[np.argmax(sims, axis=1)]
            return pd.DataFrame({"vec_id": bids, "nn_id": nn})

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _NN, fn_constructor_args=(ref,), batch_format="pandas",
        batch_size=4096, concurrency=(1, 16),
    )


EMBEDDING_NN_SQL = """
WITH s AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
),
r AS (
  SELECT va, vb, ROW_NUMBER() OVER (PARTITION BY va ORDER BY sim DESC, vb) AS rn
  FROM s
)
SELECT CAST(va AS BIGINT) AS vec_id, CAST(vb AS BIGINT) AS nn_id
FROM r WHERE rn = 1
"""


def _hyperplanes(dim: int, n_planes: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes))


def _bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes) > 0
    return (bits * (1 << np.arange(planes.shape[1]))).sum(axis=1).astype(np.int64)


def ann_lsh_sql(n_queries: int, k: int, n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB oracle for ``ann_lsh_topk``: the hyperplanes are deterministic
    (seeded), so they are inlined as literal DOUBLE[] vectors; bucket = sign
    bits of the 8 dot products, accept = bucket within hamming<=2 of the
    query's bucket (exactly the engine's multiprobe set), then cosine top-k
    among accepted."""
    planes = _hyperplanes(dim, n_planes)

    def lit(i: int) -> str:
        return "[" + ",".join(repr(float(x)) for x in planes[:, i]) + "]::DOUBLE[]"

    terms = "\n       + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {lit(i)}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    return f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
         {terms} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, ve AS qe, bucket AS qb FROM b
  WHERE vec_id < {n_queries}
),
s AS (
  SELECT q.query_id, b.vec_id, list_cosine_similarity(q.qe, b.ve) AS sim
  FROM q JOIN b ON bit_count(xor(q.qb, b.bucket)) <= 2
),
r AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id) AS rank
  FROM s
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def ann_lsh_topk(
    embeddings: ray.data.Dataset,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    n_planes: int = 8,
) -> ray.data.Dataset:
    """Approximate top-k: random-hyperplane LSH buckets; each corpus vector is
    scored only against queries sharing its bucket or any hamming<=2 neighbor
    bucket (multiprobe). The scale path: the bucket id is a shuffle/blocking
    key, so the per-bucket work is bounded regardless of corpus size.
    Output: query_id, vec_id, rank — value-exact vs the ``ann_lsh_sql``
    DuckDB oracle (deterministic hyperplanes inlined as SQL literals)."""
    qids, q = _load_queries(sf_dir, n_queries)
    planes = _hyperplanes(q.shape[1], n_planes)
    q_buckets = _bucket_of(q, planes)
    # query buckets + all hamming<=2 probes -> the accept set per query
    # (multiprobe: scans ~(1 + p + p(p-1)/2)/2^p of the corpus per query)
    probe_sets = []
    for b in q_buckets:
        probes = {int(b)} | {int(b) ^ (1 << i) for i in range(n_planes)}
        probes |= {
            int(b) ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
        probe_sets.append(probes)
    ref = ray.put((qids, q, planes, probe_sets))
    kk = k

    class _LshTopK:
        def __init__(self, r):
            self.qids, qm, self.planes, self.probes = ray.get(r)
            self.qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            buckets = _bucket_of(vecs, self.planes)
            vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            ids = batch["vec_id"].to_numpy(dtype=np.int64)
            out = []
            for j, qid in enumerate(self.qids):
                mask = np.isin(buckets, list(self.probes[j]))
                if not mask.any():
                    continue
                col = vn[mask] @ self.qn[j]
                sel = ids[mask]
                kq = min(kk, len(sel))
                top = np.lexsort((sel, -col))[:kq]  # ties keep lowest vec_id
                out.append(
                    pd.DataFrame({"query_id": qid, "vec_id": sel[top], "sim": col[top]})
                )
            if not out:
                return pd.DataFrame(
                    {"query_id": pd.Series([], dtype="int64"),
                     "vec_id": pd.Series([], dtype="int64"),
                     "sim": pd.Series([], dtype="float64")}
                )
            return pd.concat(out, ignore_index=True)

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _LshTopK, fn_constructor_args=(ref,), batch_format="pandas",
        batch_size=4096, concurrency=(1, 16),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort")
        top = g.head(kk)
        return pd.DataFrame(
            {
                "query_id": top["query_id"].astype("int64").to_numpy(),
                "vec_id": top["vec_id"].astype("int64").to_numpy(),
                "rank": pd.array(range(1, len(top) + 1), dtype="int64"),
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
