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


# --- embedding-cosine near-dup pairs ----------------------------------------

def embedding_cosine_pairs(
    embeddings: ray.data.Dataset, sf_dir: str, threshold: float = 0.4
) -> ray.data.Dataset:
    """All pairs with cosine >= threshold (a < b) — the exact near-dup-pair
    baseline, companion to ``embedding_nearest_neighbor``: the normalized
    corpus matrix is broadcast ONCE (``ray.put``) and each batch performs a
    single matmul against it, emitting only its above-threshold pairs with
    the batch side as the smaller id (each unordered pair is produced by
    exactly one batch row — no dedup shuffle needed). At corpus scale the
    broadcast no longer fits and the blocked paths (ann_lsh_topk /
    ann_ivf_topk cells as the blocking key) replace it; this is the declared
    exactness baseline they are measured against.
    Output: a, b, sim."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas().sort_values("vec_id")
    ids = t["vec_id"].to_numpy(dtype=np.int64)
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    ref = ray.put((ids, m, norms))
    tau = threshold

    class _Pairs:
        def __init__(self, r):
            self.ids, self.m, self.norms = ray.get(r)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            bids = batch["vec_id"].to_numpy(dtype=np.int64)
            # unnormalized dot / (|a||b|) — the same association order as the
            # oracle's list_cosine_similarity, so values match bit-exactly
            sims = (vecs @ self.m.T) / np.outer(
                np.linalg.norm(vecs, axis=1), self.norms
            )
            bi, cj = np.nonzero((sims >= tau) & (bids[:, None] < self.ids[None, :]))
            # cosine values differ from the oracle's in the last ulp (BLAS
            # vs sequential summation), so the emitted column is rounded to
            # 6 decimals on both sides
            return pd.DataFrame(
                {
                    "a": bids[bi],
                    "b": self.ids[cj],
                    "sim": np.round(sims[bi, cj], 6),
                }
            )

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _Pairs, fn_constructor_args=(ref,), batch_format="pandas",
        batch_size=4096, concurrency=(1, 16),
    )


COSINE_PAIRS_SQL_TEMPLATE = """
SELECT CAST(a.vec_id AS BIGINT) AS a,
       CAST(b.vec_id AS BIGINT) AS b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {threshold}
"""


# --- IVF (inverted-file) ANN -------------------------------------------------

def _ivf_anchors(dim: int, n_cells: int = 16, seed: int = 23) -> np.ndarray:
    """Deterministic seeded coarse-quantizer anchors (rows = cells). Seeded
    anchors keep the cell assignment DuckDB-reproducible (inlined literals);
    at corpus scale swap in ``train_ivf_centroids`` (k-means) for tighter
    cells — the partition/probe machinery is identical."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_cells, dim))


def _cosine_to_anchors(vecs: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """Cosine matrix computed as dot / (|v| * |a|) — the same association
    order as DuckDB's list_cosine_similarity, minimizing last-ulp divergence
    from the oracle (normalize-then-dot rounds differently)."""
    return (vecs @ anchors.T) / np.outer(
        np.linalg.norm(vecs, axis=1), np.linalg.norm(anchors, axis=1)
    )


def _assign_cells(vecs: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """Nearest-anchor cell by cosine; ties resolve to the lowest cell id
    (np.argmax returns the first maximum), matching the oracle's
    ORDER BY sim DESC, cid."""
    return np.argmax(_cosine_to_anchors(vecs, anchors), axis=1).astype(np.int64)


def train_ivf_centroids(
    embeddings: ray.data.Dataset,
    n_cells: int = 16,
    n_iters: int = 5,
    seed: int = 23,
) -> np.ndarray:
    """Distributed Lloyd's k-means over the embedding column: broadcast the
    (tiny) centroid matrix, one ``map_batches`` pass emits per-cell partial
    (sum, count) rows — the combiner — and the driver folds the partials
    (n_cells x dim floats, trivially small) and updates. Empty cells keep
    their previous centroid. The corpus itself is never materialized."""
    dim_row = embeddings.select_columns(["embedding"]).take(1)
    dim = len(dim_row[0]["embedding"])
    centroids = _ivf_anchors(dim, n_cells, seed)

    for _ in range(n_iters):
        ref = ray.put(centroids)

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            cells = _assign_cells(vecs, c)
            rows = []
            for cell in np.unique(cells):
                m = vecs[cells == cell]
                rows.append(
                    {"cell": int(cell), "n": len(m), "sum": m.sum(axis=0)}
                )
            return pd.DataFrame(rows)

        agg = embeddings.select_columns(["embedding"]).map_batches(
            partials, batch_format="pandas", batch_size=4096
        ).to_pandas()
        new = centroids.copy()
        for cell, g in agg.groupby("cell"):
            tot = np.sum(np.stack(g["sum"].to_numpy()), axis=0)
            cnt = g["n"].sum()
            if cnt:
                new[int(cell)] = tot / cnt
        centroids = new
    return centroids


def ann_ivf_sql(
    n_queries: int, k: int, n_cells: int = 16, nprobe: int = 4, dim: int = 64
) -> str:
    """DuckDB oracle for ``ann_ivf_topk``: the seeded anchors are inlined as
    literal DOUBLE[] rows; cell = argmax cosine(vec, anchor) (ties -> lowest
    cell id), each query probes its ``nprobe`` nearest cells, and cosine
    top-k runs among vectors in probed cells only."""
    anchors = _ivf_anchors(dim, n_cells)

    def lit(i: int) -> str:
        return "[" + ",".join(repr(float(x)) for x in anchors[i]) + "]::DOUBLE[]"

    values = ",\n  ".join(f"({i}, {lit(i)})" for i in range(n_cells))
    return f"""
WITH c(cid, ce) AS (VALUES
  {values}
),
a AS (
  SELECT vec_id, ve, cid,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY list_cosine_similarity(ve, ce) DESC, cid) AS rn
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings)
  CROSS JOIN c
),
assign AS (SELECT vec_id, ve, cid AS cell FROM a WHERE rn = 1),
qp AS (
  SELECT vec_id AS query_id, ve AS qe, cid AS probe,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY list_cosine_similarity(ve, ce) DESC, cid) AS rn
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
        WHERE vec_id < {n_queries})
  CROSS JOIN c
),
probes AS (SELECT query_id, qe, probe FROM qp WHERE rn <= {nprobe}),
s AS (
  SELECT p.query_id, v.vec_id, list_cosine_similarity(p.qe, v.ve) AS sim
  FROM probes p JOIN assign v ON v.cell = p.probe
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


def ann_ivf_topk(
    embeddings: ray.data.Dataset,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """IVF ANN: a coarse quantizer partitions the corpus into cells (the cell
    id is the shuffle/blocking key at scale — an inverted file is exactly a
    hash-partitioned layout), queries probe their ``nprobe`` nearest cells,
    and only vectors in probed cells are scored. With default seeded anchors
    the result is value-exact vs the ``ann_ivf_sql`` oracle; pass trained
    ``centroids`` (``train_ivf_centroids``) for the production path.
    Output: query_id, vec_id, rank."""
    qids, q = _load_queries(sf_dir, n_queries)
    anchors = centroids if centroids is not None else _ivf_anchors(
        q.shape[1], n_cells
    )
    sims = _cosine_to_anchors(q, anchors)
    cids = np.arange(anchors.shape[0])
    probe_sets = [
        set(cids[np.lexsort((cids, -sims[j]))[:nprobe]].tolist())
        for j in range(len(qids))
    ]
    ref = ray.put((qids, q, anchors, probe_sets))
    kk = k

    class _IvfTopK:
        def __init__(self, r):
            self.qids, qm, self.anchors, self.probes = ray.get(r)
            self.qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            cells = _assign_cells(vecs, self.anchors)
            vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            ids = batch["vec_id"].to_numpy(dtype=np.int64)
            out = []
            for j, qid in enumerate(self.qids):
                mask = np.isin(cells, list(self.probes[j]))
                if not mask.any():
                    continue
                col = vn[mask] @ self.qn[j]
                sel = ids[mask]
                top = np.lexsort((sel, -col))[: min(kk, len(sel))]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": sel[top], "sim": col[top]}
                    )
                )
            if not out:
                return pd.DataFrame(
                    {"query_id": pd.Series([], dtype="int64"),
                     "vec_id": pd.Series([], dtype="int64"),
                     "sim": pd.Series([], dtype="float64")}
                )
            return pd.concat(out, ignore_index=True)

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _IvfTopK, fn_constructor_args=(ref,), batch_format="pandas",
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


def embedding_centroids(
    embeddings: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-label embedding centroids — the cluster-summary aggregate a
    curation pipeline runs before IVF training / semantic balancing (the
    same per-group mean ``train_ivf_centroids`` iterates, exposed as a
    one-pass oracle-checkable operator).

    The statistic is DEFINED on 1e-6 floor-quantized embeddings
    (functions/exactsum.py, the ``label_cohesion`` discipline): with
    q = floor(e*1e6), centroid = half-away-rounded S/n in 1e-6 units
    (S = Σ q an EXACT integer; div_round_half_away — float ROUND would
    reintroduce numpy-half-even vs DuckDB-half-away tie disagreements,
    which integer numerators make common) — partition- and
    order-independent by construction (the previous float-sum formulation
    assumed addition-order divergence stays "below the 6-decimal
    rounding", the exact assumption that failed ``emb_label_cohesion`` at
    sf0.001; the driver's different CPU count means its block splits — and
    hence float summation order — need not match a local run's). Shape
    unchanged: per-batch int64 combiner (np.add.at over the quantized
    matrix), decimal-string carrier across batches, bucketed reduce by
    label, one exact-integer divide, one exact int->double conversion.

    Output: label, dim (1-based), centroid (rounded to 6 decimals), n_vecs.
    """
    from tcx2graph_jl_ray.functions.exactsum import (
        div_round_half_away, floor_quantize, merge_int_strs,
    )
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["embedding"].notna()]
        if not len(batch):
            return pd.DataFrame(
                {"label": pd.Series([], dtype="int64"),
                 "dim": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}
            )
        q = floor_quantize(np.stack(batch["embedding"].to_numpy()))
        uniq, inv = np.unique(batch["label"].to_numpy(), return_inverse=True)
        sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)  # 4096 rows x 1e7 quanta fits int64
        counts = np.bincount(inv)
        d = q.shape[1]
        return pd.DataFrame(
            {
                "label": np.repeat(uniq.astype(np.int64), d),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq)),
                "s": [str(int(v)) for v in sums.ravel()],
                "n": np.repeat(counts.astype(np.int64), d),
            }
        )

    def reduce_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["label", "dim"], sort=False).agg(
            s=("s", merge_int_strs), n=("n", "sum")
        ).reset_index()
        n = g["n"].to_numpy("int64")
        # exact integer half-away rounding in 1e-6 units, then the one
        # exact int->double step: CAST(m AS DOUBLE) / 1000000.0
        cent = np.array([
            float(div_round_half_away(int(s), int(nn)))
            for s, nn in zip(g["s"], n)
        ]) / 1e6
        return pd.DataFrame(
            {
                "label": g["label"].astype("int64"),
                "dim": g["dim"].astype("int64"),
                "centroid": cent,
                "n_vecs": pd.Series(n, dtype="int64"),
            }
        )

    partials = embeddings.select_columns(["label", "embedding"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )
    return bucketed_group_apply(
        partials, ["label"], reduce_bucket, n_buckets=n_buckets
    )


CENTROIDS_SQL = """
WITH u AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS HUGEINT) AS q
  FROM embeddings
  WHERE embedding IS NOT NULL
)
SELECT label, dim,
       CAST(CASE WHEN SUM(q) >= 0
                 THEN (2 * SUM(q) + CAST(COUNT(*) AS HUGEINT))
                      // (2 * CAST(COUNT(*) AS HUGEINT))
                 ELSE -((2 * (-SUM(q)) + CAST(COUNT(*) AS HUGEINT))
                        // (2 * CAST(COUNT(*) AS HUGEINT)))
            END AS DOUBLE) / 1000000.0 AS centroid,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM u GROUP BY label, dim
"""


class _BatchTopKLabeled:
    """Actor-pool stage for kNN classification: per-query partial top-k rows
    carrying the neighbor LABEL (so the vote needs no label join later); the
    query point itself is excluded."""

    def __init__(self, q_ref, k: int):
        self.qids, q = ray.get(q_ref)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vecs @ self.qn.T
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        labels = batch["label"].to_numpy(dtype=np.int64)
        out = []
        for j, qid in enumerate(self.qids):
            keep = ids != qid
            col, kid, klab = sims[keep, j], ids[keep], labels[keep]
            k = min(self.k, len(kid))
            top = np.lexsort((kid, -col))[:k]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": qid,
                        "vec_id": kid[top],
                        "label": klab[top],
                        "sim": col[top],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)


def knn_classify(
    embeddings: ray.data.Dataset, sf_dir: str, n_queries: int = 8, k: int = 10
) -> ray.data.Dataset:
    """k-nearest-neighbor majority-vote label prediction for each query
    vector (the query point itself excluded from its neighbor set) — the
    model-free classifier a curation pipeline runs over an embedded corpus.
    Ties: highest vote count, then smallest label (matches the oracle's
    ORDER BY votes DESC, label).

    Same broadcast-small-queries/partial-top-k-combiner shape as
    ``ann_brute_topk``: the query matrix ships once via ``ray.put``, each
    batch contributes its local top-k, one tiny per-query merge votes.
    Output: query_id, pred_label, votes (all int64).
    """
    q_ref = ray.put(_load_queries(sf_dir, n_queries))

    partials = embeddings.select_columns(
        ["vec_id", "embedding", "label"]
    ).map_batches(
        _BatchTopKLabeled,
        fn_constructor_args=(q_ref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 16),
    )

    def vote(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        counts = (
            g.groupby("label", sort=False).size().reset_index(name="votes")
        )
        counts = counts.sort_values(
            ["votes", "label"], ascending=[False, True], kind="mergesort"
        )
        return pd.DataFrame(
            {
                "query_id": pd.array(
                    [int(g["query_id"].iloc[0])], dtype="int64"
                ),
                "pred_label": pd.array(
                    [int(counts["label"].iloc[0])], dtype="int64"
                ),
                "votes": pd.array([int(counts["votes"].iloc[0])], dtype="int64"),
            }
        )

    return partials.groupby("query_id").map_groups(vote, batch_format="pandas")


KNN_CLASSIFY_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {n_queries}
),
s AS (
  SELECT q.query_id, e.vec_id, e.label,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.query_id
),
r AS (
  SELECT query_id, label,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id)
           AS rank
  FROM s
),
v AS (
  SELECT query_id, label, COUNT(*) AS votes
  FROM r WHERE rank <= {k} GROUP BY query_id, label
),
p AS (
  SELECT query_id, label, votes,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, label) AS rn
  FROM v
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(label AS BIGINT) AS pred_label,
       CAST(votes AS BIGINT) AS votes
FROM p WHERE rn = 1
"""


def semantic_clusters(
    embeddings: ray.data.Dataset, sf_dir: str, threshold: float = 0.4
) -> ray.data.Dataset:
    """Embedding-space near-duplicate CLUSTERS: connected components over
    the cosine-similarity pair graph — the semantic analogue of the
    MinHash clustering (same compose as the reference's overlap merge,
    src/OverlappingSegmentsUtils.jl:212-277: verified pairs -> union-find),
    with ``embedding_cosine_pairs`` as the verified-pair source. Vectors
    similar to nothing are absent (singletons carry no dedup action).

    Scale shape: the pair graph feeds the dual-path ``connected_components``
    via ``entity_components`` (driver union-find below the threshold,
    distributed min-label rounds above — labels are numeric-min member ids
    either way, matching the oracle's MIN(reach) over BIGINT).

    Output: vec_id, component_id (min member), component_size:int64.
    """
    from tcx2graph_jl_ray.stages.analysis import entity_components

    pairs = embedding_cosine_pairs(embeddings, sf_dir, threshold)
    edges = pairs.map_batches(
        lambda b: pd.DataFrame({"src": b["a"], "dst": b["b"]}),
        batch_format="pandas",
    )
    comp = entity_components(edges)
    return comp.map_batches(
        lambda b: pd.DataFrame(
            {
                "vec_id": b["entity_id"].astype("int64"),
                "component_id": b["component_id"].astype("int64"),
                "component_size": b["component_size"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def semantic_clusters_sql(threshold: float) -> str:
    from tcx2graph_jl_ray.stages.analysis import COMPONENTS_SQL_TEMPLATE

    pairs = COSINE_PAIRS_SQL_TEMPLATE.format(threshold=threshold)
    comp = COMPONENTS_SQL_TEMPLATE.format(
        cooccurrence=f"SELECT a AS src, b AS dst FROM ({pairs})"
    )
    return (
        "SELECT CAST(entity_id AS BIGINT) AS vec_id,\n"
        "       CAST(component_id AS BIGINT) AS component_id,\n"
        "       component_size\n"
        f"FROM ({comp})"
    )


def embedding_covariance(
    embeddings: ray.data.Dataset, n_buckets: int = 16
) -> ray.data.Dataset:
    """Distributed covariance matrix of the embedding column — the PCA /
    whitening preparation step (population covariance, upper triangle
    i ≤ j). Defined on 1e-6 floor-quantized values (functions/exactsum.py
    discipline): cov(i,j) = (n·Σ q_i q_j − S_i·S_j) / (n²·1e12) with
    EVERY sum an exact integer — each batch contributes one dense int64
    QᵀQ partial (a single matmul; q_iq_j ≤ 1e14 × 4096 rows fits int64),
    decimal-string carriers reduce by (i, j) in a bucketed shuffle, the
    d exact first-moment sums broadcast back (dimension-bounded small
    side), and the final round-6 is an exact signed integer half-away
    divide — order- and partition-independent.

    Output: i, j (1-based, i ≤ j), cov:float64.
    """
    from tcx2graph_jl_ray.functions.exactsum import (
        div_round_half_away, floor_quantize, merge_int_strs,
    )
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    dim = len(embeddings.take(1)[0]["embedding"])
    iu = np.triu_indices(dim)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = floor_quantize(np.stack(batch["embedding"].to_numpy()))
        g = q.T @ q  # int64 exact: 4096 rows x 1e14 quanta²
        sx = q.sum(axis=0)
        out = pd.DataFrame(
            {
                "i": (iu[0] + 1).astype("int64"),
                "j": (iu[1] + 1).astype("int64"),
                "sxy": [str(int(v)) for v in g[iu]],
            }
        )
        moments = pd.DataFrame(
            {
                "i": np.arange(1, dim + 1, dtype="int64"),
                "j": np.full(dim, -1, dtype="int64"),
                "sxy": [str(int(v)) for v in sx],
            }
        )
        nrow = pd.DataFrame({"i": [-1], "j": [-1], "sxy": [str(len(q))]})
        return pd.concat([out, moments, nrow], ignore_index=True)

    parts = embeddings.select_columns(["embedding"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )

    def reduce_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby(["i", "j"], sort=False)["sxy"].agg(
            merge_int_strs
        ).map(str)
        return s.reset_index()

    sums = bucketed_group_apply(
        parts, ["i", "j"], reduce_sum, n_buckets=n_buckets
    ).materialize()

    # first moments: d+1 rows, bounded by the dimension — the small side
    mom = sums.filter(lambda r: r["j"] == -1).to_pandas()
    n = int(mom.loc[mom["i"] == -1, "sxy"].iloc[0])
    s_by_dim = {
        int(i): int(s)
        for i, s in zip(mom.loc[mom["i"] > 0, "i"],
                        mom.loc[mom["i"] > 0, "sxy"])
    }
    mref = ray.put((s_by_dim, n))

    class _Cov:
        def __init__(self, ref):
            self.s, self.n = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            b = batch[batch["j"] > 0]
            n = self.n
            denom = n * n * 1_000_000_000_000
            cov = np.array([
                float(div_round_half_away(
                    (n * int(sxy) - self.s[int(i)] * self.s[int(j)])
                    * 1_000_000,
                    denom,
                )) / 1e6
                for i, j, sxy in zip(b["i"], b["j"], b["sxy"])
            ], dtype="float64")  # positional ndarray — a pd.Series here
            # would index-align against the filtered b and scramble rows
            return pd.DataFrame(
                {
                    "i": b["i"].astype("int64"),
                    "j": b["j"].astype("int64"),
                    "cov": cov,
                }
            )

    return sums.map_batches(
        _Cov, fn_constructor_args=(mref,), batch_format="pandas",
        concurrency=(1, 4),
    )


def embedding_covariance_sql(dim: int = 64) -> str:
    return f"""
WITH x AS (
  SELECT list_transform(
           CAST(embedding AS DOUBLE[]),
           v -> CAST(FLOOR(v * 1000000.0) AS HUGEINT)
         ) AS qe
  FROM embeddings
),
p AS (
  SELECT i, j, SUM(qe[i] * qe[j]) AS sxy
  FROM x, unnest(range(1, {dim} + 1)) AS t(i),
       unnest(range(1, {dim} + 1)) AS u(j)
  WHERE i <= j
  GROUP BY i, j
),
m AS (
  SELECT i, SUM(qe[i]) AS si
  FROM x, unnest(range(1, {dim} + 1)) AS t(i)
  GROUP BY i
),
n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM x),
num AS (
  SELECT p.i, p.j,
         (n.n * p.sxy - mi.si * mj.si) * 1000000 AS nu,
         n.n * n.n * 1000000000000 AS de
  FROM p, n
  JOIN m mi ON mi.i = p.i
  JOIN m mj ON mj.i = p.j
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(CASE WHEN nu >= 0 THEN (2 * nu + de) // (2 * de)
                 ELSE -((2 * (-nu) + de) // (2 * de)) END AS DOUBLE)
         / 1000000.0 AS cov
FROM num
"""


def _pq_codebooks(
    dim: int, m: int = 8, ksub: int = 16, seed: int = 29
) -> np.ndarray:
    """Deterministic seeded product-quantization codebooks, shape
    (m subspaces, ksub codewords, dim/m). Seeded codewords keep the encode
    and the ADC tables DuckDB-reproducible (inlined literals) — at corpus
    scale train each subspace's codebook with the same distributed k-means
    as ``train_ivf_centroids``; the encode/ADC machinery is identical."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((m, ksub, dim // m))


def ann_pq_topk(
    embeddings: ray.data.Dataset,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
) -> ray.data.Dataset:
    """Product-quantization ANN with asymmetric distance computation (ADC) —
    the compressed-vector regime: each database vector is stored as m uint8
    codes (here 8 bytes instead of 512 — the layout that lets 100 TB of
    float32 embeddings fit an object store), queries precompute per-subspace
    distance tables against the codebooks, and the approximate distance is a
    table-lookup SUM — no float vector ever leaves the encode stage.

    Jegou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search"
    (TPAMI 2011), the standard public formulation. Encode ties resolve to
    the lowest codeword id; ADC distances round to 9 decimals before
    ranking so the m-term summation order can never flip a rank between
    engine and oracle; ties then break on vec_id. With the default seeded
    codebooks the result is value-exact vs ``ann_pq_sql``.

    Output: query_id, vec_id, rank (1..k per query).
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    qids, q = _load_queries(sf_dir, n_queries)
    dim = q.shape[1]
    books = _pq_codebooks(dim, m, ksub)
    sub = dim // m

    # per-query ADC tables: d[j, s, c] = list_distance(q_sub, codeword)^2
    qsub = q.reshape(len(qids), m, sub)
    dtab = (
        np.sqrt(((qsub[:, :, None, :] - books[None]) ** 2).sum(-1)) ** 2
    )

    ref = ray.put((qids, books, dtab))
    kk = k

    class _PqAdc:
        def __init__(self, r):
            self.qids, self.books, self.dtab = ray.get(r)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            ids = batch["vec_id"].to_numpy(dtype=np.int64)
            n = len(ids)
            vs = vecs.reshape(n, m, sub)
            # encode: per subspace argmin of list_distance (first min = the
            # oracle's ties -> lowest codeword id)
            codes = np.empty((n, m), dtype=np.int64)
            for s in range(m):
                d = np.sqrt(
                    ((vs[:, s, None, :] - self.books[s][None]) ** 2).sum(-1)
                )
                codes[:, s] = np.argmin(d, axis=1)
            out = []
            srange = np.arange(m)
            for j, qid in enumerate(self.qids):
                adc = np.round(self.dtab[j][srange, codes].sum(axis=1), 9)
                top = np.lexsort((ids, adc))[: min(kk, n)]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": ids[top], "dist": adc[top]}
                    )
                )
            return pd.concat(out, ignore_index=True)

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _PqAdc, fn_constructor_args=(ref,), batch_format="pandas",
        batch_size=4096, concurrency=(1, 16),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["query_id", "dist", "vec_id"], kind="mergesort")
        out = []
        for qid, gg in g.groupby("query_id", sort=False):
            top = gg.head(kk)
            out.append(
                pd.DataFrame(
                    {
                        "query_id": top["query_id"].astype("int64").to_numpy(),
                        "vec_id": top["vec_id"].astype("int64").to_numpy(),
                        "rank": pd.array(range(1, len(top) + 1), dtype="int64"),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(partials, ["query_id"], merge, n_buckets=8)


def ann_pq_sql(
    n_queries: int, k: int, m: int = 8, ksub: int = 16, dim: int = 64
) -> str:
    """DuckDB oracle for ``ann_pq_topk``: seeded codebooks inlined as
    literal DOUBLE[] rows; encode = per-(vector, subspace) argmin
    list_distance (ties -> lowest codeword id); ADC = SUM of the query's
    per-subspace table entries over the vector's codes, rounded to 9."""
    books = _pq_codebooks(dim, m, ksub)
    sub = dim // m

    def lit(s: int, c: int) -> str:
        return "[" + ",".join(repr(float(x)) for x in books[s, c]) + "]::DOUBLE[]"

    values = ",\n  ".join(
        f"({s}, {c}, {lit(s, c)})" for s in range(m) for c in range(ksub)
    )
    return f"""
WITH cb(s, cid, cw) AS (VALUES
  {values}
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
enc AS (
  SELECT vec_id, s, cid,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id, s
           ORDER BY list_distance(ve[s * {sub} + 1 : s * {sub} + {sub}], cw)
                    ASC, cid) AS rn
  FROM v CROSS JOIN cb
),
codes AS (SELECT vec_id, s, cid FROM enc WHERE rn = 1),
qt AS (
  SELECT q.vec_id AS query_id, c.s, c.cid,
         pow(list_distance(
               q.ve[c.s * {sub} + 1 : c.s * {sub} + {sub}], c.cw), 2) AS d
  FROM v q CROSS JOIN cb c WHERE q.vec_id < {n_queries}
),
adc AS (
  SELECT qt.query_id, codes.vec_id, ROUND(SUM(qt.d), 9) AS dist
  FROM codes JOIN qt ON qt.s = codes.s AND qt.cid = codes.cid
  GROUP BY qt.query_id, codes.vec_id
),
r AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id) AS rank
  FROM adc
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def _quantized_label_sums(
    base: ray.data.Dataset, n_buckets: int = 4
) -> dict:
    """Exact per-label quantized sums: {label: (n, [Σq per dim])} over
    1e-6 floor-quantized embeddings (functions/exactsum.py). int64 per
    batch, decimal-string carriers across batches, Python-int merge —
    order- and partition-independent; labels × dims driver-bounded.
    Shared by ``label_cohesion`` and ``label_outliers``."""
    from tcx2graph_jl_ray.functions.exactsum import (
        floor_quantize, merge_int_strs,
    )
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def cent_partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for lab, g in batch.groupby("label", sort=False):
            q = floor_quantize(np.stack(g["embedding"].to_numpy()))
            frames.append(pd.DataFrame({
                "label": lab,
                "dim": np.arange(q.shape[1], dtype="int64"),
                "s": [str(int(v)) for v in q.sum(axis=0)],
                "n": np.int64(len(q)),
            }))
        if not frames:
            return pd.DataFrame({
                "label": pd.Series([], dtype="object"),
                "dim": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            })
        return pd.concat(frames, ignore_index=True)

    def cent_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["label", "dim"], sort=False).agg(
            s=("s", merge_int_strs), n=("n", "sum")
        ).reset_index()
        g["s"] = g["s"].map(str)
        return g[["label", "dim", "s", "n"]]

    cents = bucketed_group_apply(
        base.map_batches(cent_partial, batch_format="pandas",
                         batch_size=4096),
        ["label"], cent_merge, n_buckets=n_buckets,
    ).to_pandas()
    cmap = {}
    for lab, g in cents.groupby("label", sort=False):
        g = g.sort_values("dim")
        cmap[lab] = (int(g["n"].iloc[0]), [int(v) for v in g["s"]])
    return cmap


def label_outliers(
    embeddings: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Label-noise screen: per label, the squared-L2 distance distribution
    from the label centroid and the worst offender — the curation report
    that flags mislabeled / contaminated embedding clusters before they
    poison retrieval or balancing.

    Defined on 1e-6 floor-quantized embeddings with the EXACT rational
    centroid (the ``label_cohesion`` discipline, functions/exactsum.py):
    per vector, d2q = Σ_dim (n·q − s_d)² is an exact integer, rounded
    half-away to 1e-6 units (m = dr(d2q·1e6, n²·1e12)) BEFORE any
    comparison — so per-vector dist2 values, the per-label max, the
    argmax tie-break (lowest vec_id) and the mean are all integer-exact
    and independent of batch layout and summation order. Two passes:
    the shared quantized-sum reduce (labels × dims, driver-bounded,
    broadcast back), then one map with algebraic (n, Σm, max m,
    argmin-vid-at-max) partials. No per-vector state reaches the driver.
    Output: label, n_vecs, mean_dist2, max_dist2, outlier_vec_id.
    """
    from tcx2graph_jl_ray.functions.exactsum import (
        div_round_half_away, floor_quantize, merge_int_strs,
    )
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    base = embeddings.select_columns(
        ["vec_id", "label", "embedding"]
    ).map_batches(
        lambda b: b[b["embedding"].notna() & b["label"].notna()],
        batch_format="pandas", batch_size=4096,
    ).materialize()  # consumed by the centroid pass AND the distance pass

    cent_ref = ray.put(_quantized_label_sums(base))

    class _Dist:
        def __init__(self, ref):
            self.cmap = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for lab, g in batch.groupby("label", sort=False):
                n, s = self.cmap[lab]
                q = floor_quantize(np.stack(g["embedding"].to_numpy()))
                vids = g["vec_id"].to_numpy().astype(np.int64)
                denom = n * n * 1_000_000_000_000
                diff = (q * np.int64(n)
                        - np.asarray(s, dtype=object)[None, :])
                best_m, best_vid, tot = -1, -1, 0
                ms = []
                for i in range(len(q)):
                    d2q = sum(d * d for d in diff[i])
                    m = div_round_half_away(d2q * 1_000_000, denom)
                    ms.append(m)
                    tot += m
                    if m > best_m or (m == best_m
                                      and int(vids[i]) < best_vid):
                        best_m, best_vid = m, int(vids[i])
                rows.append((lab, np.int64(len(q)), str(tot),
                             str(best_m), best_vid))
            return pd.DataFrame({
                "label": pd.Series([r[0] for r in rows], dtype="object"),
                "n": pd.Series([r[1] for r in rows], dtype="int64"),
                "s": pd.Series([r[2] for r in rows], dtype="object"),
                "mx": pd.Series([r[3] for r in rows], dtype="object"),
                "vid": pd.Series([r[4] for r in rows], dtype="int64"),
            })

    partials = base.map_batches(
        _Dist, fn_constructor_args=(cent_ref,), batch_format="pandas",
        batch_size=4096, concurrency=(1, 8),
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(cent_ref)
        rows = []
        for lab, g in bucket.groupby("label", sort=False):
            n = cm[lab][0]
            tot = merge_int_strs(g["s"])
            mxs = [int(v) for v in g["mx"]]
            mx = max(mxs)
            vid = min(int(v) for v, m in zip(g["vid"], mxs) if m == mx)
            mean_m = div_round_half_away(tot, n)
            rows.append((lab, n, float(mean_m) / 1e6, float(mx) / 1e6,
                         vid))
        return pd.DataFrame({
            "label": pd.Series([int(r[0]) for r in rows], dtype="int64"),
            "n_vecs": pd.Series([r[1] for r in rows], dtype="int64"),
            "mean_dist2": pd.Series([r[2] for r in rows],
                                    dtype="float64"),
            "max_dist2": pd.Series([r[3] for r in rows], dtype="float64"),
            "outlier_vec_id": pd.Series([r[4] for r in rows],
                                        dtype="int64"),
        })

    return bucketed_group_apply(partials, ["label"], merge, n_buckets=n_buckets)


LABEL_OUTLIERS_SQL = """
WITH u AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS HUGEINT) AS q
  FROM embeddings
  WHERE embedding IS NOT NULL
),
c AS (
  SELECT label, dim, SUM(q) AS s, CAST(COUNT(*) AS HUGEINT) AS n
  FROM u GROUP BY label, dim
),
d AS (
  SELECT u.vec_id, u.label, MAX(c.n) AS n,
         (2 * SUM((c.n * u.q - c.s) * (c.n * u.q - c.s)) * 1000000
          + MAX(c.n) * MAX(c.n) * 1000000000000)
         // (2 * MAX(c.n) * MAX(c.n) * 1000000000000) AS m
  FROM u JOIN c ON u.label = c.label AND u.dim = c.dim
  GROUP BY u.vec_id, u.label
),
g AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs, MAX(n) AS n,
         SUM(m) AS tot, MAX(m) AS mx
  FROM d GROUP BY label
)
SELECT g.label, g.n_vecs,
       CAST((2 * g.tot + g.n) // (2 * g.n) AS DOUBLE) / 1000000.0
         AS mean_dist2,
       CAST(g.mx AS DOUBLE) / 1000000.0 AS max_dist2,
       CAST(MIN(d.vec_id) AS BIGINT) AS outlier_vec_id
FROM g JOIN d ON d.label = g.label AND d.m = g.mx
GROUP BY g.label, g.n_vecs, g.tot, g.mx, g.n
"""


def ann_recall_eval(
    embeddings: ray.data.Dataset,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    n_buckets: int = 16,
    index: str = "ivf",
) -> ray.data.Dataset:
    """Per-query recall@k of an approximate index against the exact
    brute-force baseline — the index-quality harness every ANN deployment
    ships next to the index itself (the ``dedup_lsh_eval`` discipline
    applied to retrieval): recall = |approx top-k ∩ exact top-k| / k.
    ``index`` selects the approximate side: "ivf" or "lsh".

    Both rankings come from the production operators (``ann_ivf_topk`` /
    ``ann_lsh_topk`` / ``ann_brute_topk``); the intersection is one
    co-partitioned ``hash_join`` on (query_id, vec_id) with the EXACT list
    as the left base (so zero-hit queries still emit), and the per-query
    reduce is query-bounded. recall is one division by the constant k,
    rounded 6. Output: query_id, n_hits, recall."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    approx_fn = {
        "ivf": ann_ivf_topk, "lsh": ann_lsh_topk, "pq": ann_pq_topk,
    }[index]
    brute = ann_brute_topk(embeddings, sf_dir, n_queries, k).map_batches(
        lambda b: b[["query_id", "vec_id"]], batch_format="pandas",
    )
    ivf = approx_fn(embeddings, sf_dir, n_queries, k).map_batches(
        lambda b: b[["query_id", "vec_id"]].assign(hit=np.int64(1)),
        batch_format="pandas",
    )
    j = hash_join(
        brute, ivf, on=["query_id", "vec_id"], how="left",
        n_buckets=n_buckets,
    )

    kf = float(k)

    def per_query(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("query_id", sort=False)["hit"].agg(
            lambda s: int(s.notna().sum())
        )
        n = g.to_numpy().astype("int64")
        return pd.DataFrame({
            "query_id": g.index.astype("int64"),
            "n_hits": n,
            "recall": np.round(n.astype("float64") / kf, 6),
        })

    return bucketed_group_apply(j, ["query_id"], per_query, n_buckets=4)


def ann_recall_sql(n_queries: int, k: int, dim: int = 64,
                   index: str = "ivf") -> str:
    """Oracle for ``ann_recall_eval``: the two production index oracles
    composed, LEFT-joined on (query_id, vec_id), counted per query."""
    brute = ANN_BRUTE_SQL_TEMPLATE.format(n_queries=n_queries, k=k)
    ivf = {
        "ivf": lambda: ann_ivf_sql(n_queries, k, dim=dim),
        "lsh": lambda: ann_lsh_sql(n_queries, k, dim=dim),
        "pq": lambda: ann_pq_sql(n_queries, k, dim=dim),
    }[index]()
    return f"""
WITH brute AS MATERIALIZED ({brute}),
ivf AS MATERIALIZED ({ivf}),
h AS (
  SELECT b.query_id, CAST(COUNT(i.vec_id) AS BIGINT) AS n_hits
  FROM brute b
  LEFT JOIN ivf i ON i.query_id = b.query_id AND i.vec_id = b.vec_id
  GROUP BY b.query_id
)
SELECT query_id, n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / {float(k)}, 6) AS recall
FROM h
"""


def embedding_dim_stats(
    embeddings: ray.data.Dataset, n_buckets: int = 16
) -> ray.data.Dataset:
    """Per-dimension min / max / mean of the embedding column — the scalar
    quantization calibration pass (the per-dim value range an int8 SQ index
    clips to) and the drift monitor a feature store runs per snapshot.

    Shape: a per-batch vectorized partial (column-wise min/max/sum over the
    stacked matrix — d rows per batch regardless of batch size)
    -> bucketed reduce by dim. min/max are exact (no summation); mean is
    the exact floor-quantized integer statistic (the ``emb_centroids``
    discipline, functions/exactsum.py): order- and partition-independent
    by construction, exact integer half-away rounding at 1e-6.

    Output: dim (1-based), vmin, vmax, mean (rounded 6), n_vecs."""
    from tcx2graph_jl_ray.functions.exactsum import (
        div_round_half_away, floor_quantize, merge_int_strs,
    )
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["embedding"].notna()]
        if not len(batch):
            return pd.DataFrame(
                {"dim": pd.Series([], dtype="int64"),
                 "vmin": pd.Series([], dtype="float64"),
                 "vmax": pd.Series([], dtype="float64"),
                 "s": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}
            )
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        q = floor_quantize(vecs)
        d = vecs.shape[1]
        return pd.DataFrame(
            {
                "dim": np.arange(1, d + 1, dtype=np.int64),
                "vmin": vecs.min(axis=0),
                "vmax": vecs.max(axis=0),
                "s": [str(int(v)) for v in q.sum(axis=0)],
                "n": np.int64(len(vecs)),
            }
        )

    def reduce_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("dim", sort=False).agg(
            vmin=("vmin", "min"), vmax=("vmax", "max"),
            s=("s", merge_int_strs), n=("n", "sum"),
        ).reset_index()
        n = g["n"].to_numpy("int64")
        mean = np.array([
            float(div_round_half_away(int(s), int(nn)))
            for s, nn in zip(g["s"], n)
        ]) / 1e6
        return pd.DataFrame(
            {
                "dim": g["dim"].astype("int64"),
                "vmin": g["vmin"].astype("float64"),
                "vmax": g["vmax"].astype("float64"),
                "mean": mean,
                "n_vecs": pd.Series(n, dtype="int64"),
            }
        )

    partials = embeddings.select_columns(["embedding"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )
    return bucketed_group_apply(
        partials, ["dim"], reduce_bucket, n_buckets=n_buckets
    )


DIM_STATS_SQL = """
WITH u AS (
  SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS e,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS HUGEINT) AS q
  FROM embeddings
  WHERE embedding IS NOT NULL
)
SELECT dim, MIN(e) AS vmin, MAX(e) AS vmax,
       CAST(CASE WHEN SUM(q) >= 0
                 THEN (2 * SUM(q) + CAST(COUNT(*) AS HUGEINT))
                      // (2 * CAST(COUNT(*) AS HUGEINT))
                 ELSE -((2 * (-SUM(q)) + CAST(COUNT(*) AS HUGEINT))
                        // (2 * CAST(COUNT(*) AS HUGEINT)))
            END AS DOUBLE) / 1000000.0 AS mean,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM u GROUP BY dim
"""


def centroid_distances(
    embeddings: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Pairwise L2 distances between the per-label centroids — the
    cluster-separation diagnostic (a merge-candidate matrix for semantic
    balancing, and the IVF coarse-quantizer sanity check). Composes
    ``embedding_centroids``; the pairwise step runs on the label-count ×
    dim table, bounded by the LABEL CARDINALITY, never the corpus — the
    declared small side, collected to the driver.

    Exactness: centroids are already rounded to 6 decimals, so differences
    are exact integers at 1e6 scale; the squared-distance sum is computed
    in those integer units (|d| ~ 2e6 over 64 dims < 2^53) and a single
    sqrt/scale/round lands identically to the SQL expression.

    Output: label_a < label_b, dist (rounded 6)."""
    cent = embedding_centroids(embeddings, n_buckets=n_buckets).to_pandas()
    # label-count x dim rows — dimension-bounded driver pivot
    piv = cent.pivot(index="label", columns="dim", values="centroid")
    labels = piv.index.to_numpy().astype(np.int64)
    m = np.rint(piv.to_numpy(dtype=np.float64) * 1e6).astype(np.int64)
    ia, ib = np.triu_indices(len(labels), k=1)
    diffs = m[ia] - m[ib]
    s = (diffs * diffs).sum(axis=1)  # exact int64
    dist = np.round(np.sqrt(s.astype(np.float64)) / 1e6, 6)
    out = pd.DataFrame(
        {"label_a": labels[ia], "label_b": labels[ib], "dist": dist}
    )
    return ray.data.from_pandas(out)


CENTROID_DISTS_SQL = f"""
WITH c AS MATERIALIZED ({CENTROIDS_SQL}),
i AS (
  SELECT label, dim, CAST(ROUND(centroid * 1000000) AS BIGINT) AS ci
  FROM c
)
SELECT a.label AS label_a, b.label AS label_b,
       ROUND(SQRT(CAST(SUM((a.ci - b.ci) * (a.ci - b.ci)) AS DOUBLE))
             / 1000000.0, 6) AS dist
FROM i a JOIN i b ON a.dim = b.dim AND a.label < b.label
GROUP BY a.label, b.label
"""


def sq8_quantization_error(
    embeddings: ray.data.Dataset, n_buckets: int = 16
) -> ray.data.Dataset:
    """Int8 scalar-quantization (SQ8) calibration profile: per dimension,
    the affine-quantizer reconstruction error when each value is snapped
    to one of 256 levels across the dim's [vmin, vmax] range — the
    embedding-compression counterpart of the PQ codebook (SQ stores d
    bytes/vector, PQ m bytes; this table says whether SQ's error budget
    is acceptable per dimension before paying PQ's training cost).

    Exactness: only order-free reductions leave the workers — per-dim
    MAX abs error, exact-hit count, n — never a float error SUM (whose
    summation order would break the driver's exact value hash). The
    quantizer is the SAME IEEE expression on both sides
    (q = FLOOR((e-vmin)*255/range + 0.5); e_hat = vmin + q*range/255),
    so err values are bit-identical; max_abs_err is rounded 9 for
    display. Pass 1 collects the 64-row per-dim range (dimension-bounded
    broadcast); pass 2 streams. Constant dims quantize exactly (err 0).
    Output: dim, vmin, vmax, max_abs_err, n_exact, n_vecs."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    ranges = (
        embedding_dim_stats(embeddings, n_buckets=n_buckets)
        .to_pandas()
        .sort_values("dim")
    )
    vmin = ranges["vmin"].to_numpy(dtype="float64")
    vmax = ranges["vmax"].to_numpy(dtype="float64")
    rng = vmax - vmin

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                "dim": pd.Series([], dtype="int64"),
                "mx": pd.Series([], dtype="float64"),
                "nx": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            })
        e = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((e - vmin) * 255.0 / rng + 0.5)
            ehat = vmin + q * rng / 255.0
        err = np.abs(e - ehat)
        err = np.where(rng > 0, err, 0.0)
        return pd.DataFrame({
            "dim": np.arange(1, e.shape[1] + 1, dtype="int64"),
            "mx": err.max(axis=0),
            "nx": (err == 0.0).sum(axis=0).astype("int64"),
            "n": np.full(e.shape[1], len(e), dtype="int64"),
        })

    parts = embeddings.select_columns(["embedding"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("dim", sort=False).agg(
            mx=("mx", "max"), nx=("nx", "sum"), n=("n", "sum")
        ).reset_index()
        d = g["dim"].astype("int64").to_numpy()
        return pd.DataFrame({
            "dim": d,
            "vmin": vmin[d - 1],
            "vmax": vmax[d - 1],
            "max_abs_err": np.round(g["mx"].to_numpy(dtype="float64"), 9),
            "n_exact": g["nx"].astype("int64"),
            "n_vecs": g["n"].astype("int64"),
        })

    return bucketed_group_apply(parts, ["dim"], merge, n_buckets=8)


SQ8_ERROR_SQL = """
WITH u AS (
  SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings
  WHERE embedding IS NOT NULL
),
r AS (SELECT dim, MIN(e) AS vmin, MAX(e) AS vmax FROM u GROUP BY dim),
q AS (
  SELECT u.dim,
         CASE WHEN r.vmax > r.vmin
              THEN ABS(u.e - (r.vmin
                   + FLOOR((u.e - r.vmin) * 255.0 / (r.vmax - r.vmin) + 0.5)
                     * (r.vmax - r.vmin) / 255.0))
              ELSE 0.0 END AS err
  FROM u JOIN r ON r.dim = u.dim
)
SELECT q.dim, ANY_VALUE(r.vmin) AS vmin, ANY_VALUE(r.vmax) AS vmax,
       ROUND(MAX(err), 9) AS max_abs_err,
       CAST(SUM(CASE WHEN err = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM q JOIN r ON r.dim = q.dim
GROUP BY q.dim
"""


def ivf_cell_purity(
    embeddings: ray.data.Dataset, n_cells: int = 16, n_buckets: int = 4
) -> ray.data.Dataset:
    """Label purity of the IVF coarse quantizer's cells: per cell, the
    vector count, dominant label and its share — the supervised
    cluster-quality gauge (a quantizer whose cells mix labels probes more
    cells per recall point; reference's segment-cluster homogeneity check
    applied to the vector index). Uses the SAME seeded-anchor assignment
    as ``ann_ivf_topk`` (cosine argmax, ties to the lowest cell id), so
    the oracle reuses that operator's literal-anchor CTE. Dominant-label
    ties break to the lowest label. Counts exact; purity one division,
    rounded 6. Output: cell, n_vecs, top_label, n_top, purity."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    dim_row = embeddings.select_columns(["embedding"]).take(1)
    anchors = _ivf_anchors(len(dim_row[0]["embedding"]), n_cells)
    ref = ray.put(anchors)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        a = ray.get(ref)
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        cells = _assign_cells(vecs, a)
        g = pd.DataFrame({
            "cell": cells.astype("int64"),
            "label": batch["label"].astype("int64").to_numpy(),
        }).groupby(["cell", "label"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = embeddings.select_columns(["embedding", "label"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )

    def per_cell(bucket: pd.DataFrame) -> pd.DataFrame:
        c = bucket.groupby(["cell", "label"], sort=False)["n"].sum()\
            .reset_index()
        rows = []
        for cell, g in c.groupby("cell", sort=False):
            nt = int(g["n"].sum())
            top = g.sort_values(["n", "label"], ascending=[False, True],
                                kind="mergesort").iloc[0]
            rows.append((int(cell), nt, int(top["label"]), int(top["n"]),
                         np.round(int(top["n"]) / nt, 6)))
        if not rows:
            return pd.DataFrame({
                "cell": pd.Series([], dtype="int64"),
                "n_vecs": pd.Series([], dtype="int64"),
                "top_label": pd.Series([], dtype="int64"),
                "n_top": pd.Series([], dtype="int64"),
                "purity": pd.Series([], dtype="float64"),
            })
        return pd.DataFrame(rows, columns=[
            "cell", "n_vecs", "top_label", "n_top", "purity"
        ]).astype({
            "cell": "int64", "n_vecs": "int64", "top_label": "int64",
            "n_top": "int64",
        })

    return bucketed_group_apply(parts, ["cell"], per_cell,
                                n_buckets=n_buckets)


def ivf_cell_purity_sql(n_cells: int = 16, dim: int = 64) -> str:
    """Oracle for ``ivf_cell_purity``: the ``ann_ivf_sql`` literal-anchor
    assignment CTE, rolled up per cell against the label column."""
    anchors = _ivf_anchors(dim, n_cells)

    def lit(i: int) -> str:
        return "[" + ",".join(
            repr(float(x)) for x in anchors[i]
        ) + "]::DOUBLE[]"

    values = ",\n  ".join(f"({i}, {lit(i)})" for i in range(n_cells))
    return f"""
WITH c(cid, ce) AS (VALUES
  {values}
),
a AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY list_cosine_similarity(ve, ce) DESC, cid) AS rn
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings)
  CROSS JOIN c
),
assign AS (SELECT vec_id, cid AS cell FROM a WHERE rn = 1),
j AS (
  SELECT s.cell, e.label FROM assign s
  JOIN embeddings e ON e.vec_id = s.vec_id
),
cnt AS (SELECT cell, label, COUNT(*) AS n FROM j GROUP BY cell, label),
t AS (SELECT cell, SUM(n) AS nt FROM cnt GROUP BY cell),
r AS (
  SELECT cell, label, n,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY n DESC, label) AS rk
  FROM cnt
)
SELECT CAST(r.cell AS BIGINT) AS cell,
       CAST(t.nt AS BIGINT) AS n_vecs,
       CAST(r.label AS BIGINT) AS top_label,
       CAST(r.n AS BIGINT) AS n_top,
       ROUND(CAST(r.n AS DOUBLE) / CAST(t.nt AS DOUBLE), 6) AS purity
FROM r JOIN t ON t.cell = r.cell
WHERE r.rk = 1
"""


def knn_accuracy(
    embeddings: ray.data.Dataset, sf_dir: str,
    n_queries: int = 8, k: int = 10,
) -> pd.DataFrame:
    """Leave-one-out kNN evaluation summary: over the query set, how often
    the majority-vote prediction matches the query vector's own label —
    the one-row embedding-quality score a feature-store gate thresholds
    on (labels separable under cosine -> the embedding carries the
    signal). Composes the production ``knn_classify`` (same broadcast /
    partial-top-k shape) against the query vectors' true labels (an
    n_queries-bounded pull). Accuracy is one division of exact ints,
    rounded 6. Output: n_queries, n_correct, accuracy."""
    preds = knn_classify(embeddings, sf_dir, n_queries, k).to_pandas()

    truth = (
        embeddings.select_columns(["vec_id", "label"])
        .filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
    )
    j = preds.merge(truth, left_on="query_id", right_on="vec_id")
    n = len(j)
    correct = int((j["pred_label"].astype("int64")
                   == j["label"].astype("int64")).sum())
    return pd.DataFrame({
        "n_queries": [np.int64(n)],
        "n_correct": [np.int64(correct)],
        "accuracy": [np.round(correct / n, 6) if n else 0.0],
    })


def knn_accuracy_sql(n_queries: int, k: int) -> str:
    inner = KNN_CLASSIFY_SQL_TEMPLATE.format(n_queries=n_queries, k=k)
    return f"""
WITH pred AS MATERIALIZED ({inner})
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN pred.pred_label = e.label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CASE WHEN pred.pred_label = e.label THEN 1 ELSE 0
                      END) AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM pred JOIN embeddings e ON e.vec_id = pred.query_id
"""


def exact_dup_vectors(
    embeddings: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """EXACT-DUPLICATE vector audit: how many embedding rows are
    bit-identical copies of another row — the integrity check that runs
    before any ANN index build (duplicate vectors skew IVF cell balance
    and make recall@k look better than it is; a nonzero count usually
    means an upstream join fanned out). The full float payload IS the
    shuffle key (bounded: one vector per row, the dedup-exact discipline
    — byte equality, no hash that could collide); per-key multiplicities
    reduce bucketed, the four summary scalars fold in one tiny merge.
    Output: n_vectors, n_distinct, n_dup_vectors, max_multiplicity."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # lossless hex of the float32 payload: string-typed for the bucket
        # hash, still full byte equality (never a collidable digest)
        keys = [np.asarray(v, dtype="float32").tobytes().hex()
                for v in batch["embedding"]]
        s = pd.Series(np.ones(len(keys), dtype="int64"))
        g = s.groupby(pd.Series(keys), sort=False).sum()
        return pd.DataFrame({"k": g.index, "n": g.to_numpy()})

    parts = embeddings.select_columns(["embedding"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )

    def per_key(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("k", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        return pd.DataFrame({
            "n_vectors": [int(n.sum())],
            "n_distinct": [len(n)],
            "n_dup_vectors": [int((n >= 2).sum())],
            "max_multiplicity": [int(n.max()) if len(n) else 0],
        })

    mid = bucketed_group_apply(parts, ["k"], per_key, n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_vectors": pd.Series([int(bucket["n_vectors"].sum())],
                                   dtype="int64"),
            "n_distinct": pd.Series([int(bucket["n_distinct"].sum())],
                                    dtype="int64"),
            "n_dup_vectors": pd.Series(
                [int(bucket["n_dup_vectors"].sum())], dtype="int64"),
            "max_multiplicity": pd.Series(
                [int(bucket["max_multiplicity"].max())], dtype="int64"),
        })

    return bucketed_group_apply(mid, ["n_vectors"], merge, n_buckets=1)


EXACT_DUP_VECTORS_SQL = """
WITH c AS (SELECT embedding, COUNT(*) AS n FROM embeddings
           GROUP BY embedding)
SELECT CAST(SUM(n) AS BIGINT) AS n_vectors,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) FILTER (n >= 2) AS BIGINT) AS n_dup_vectors,
       CAST(MAX(n) AS BIGINT) AS max_multiplicity
FROM c
"""


def label_profile(
    embeddings: ray.data.Dataset, n_buckets: int = 1
) -> ray.data.Dataset:
    """Embedding LABEL composition: count and share per class label — the
    class-balance read every classifier-adjacent consumer (kNN accuracy,
    cell purity, stratified eval splits) normalizes against; a skewed row
    here is why purity looked "high". Pure-int combiner rollup, share one
    division rounded 6. Output: label, n_vectors, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["label"].groupby(batch["label"], sort=False).size()
        return pd.DataFrame({
            "label": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    parts = embeddings.select_columns(["label"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("label", sort=False)["n"].sum().reset_index()
        tot = float(g["n"].sum())
        return pd.DataFrame({
            "label": g["label"].astype("int64"),
            "n_vectors": g["n"].astype("int64"),
            "share": np.round(g["n"].to_numpy(dtype="float64") / tot, 6),
        })

    return bucketed_group_apply(parts, ["label"], merge,
                                n_buckets=n_buckets)


LABEL_PROFILE_SQL = """
WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label)
SELECT CAST(label AS BIGINT) AS label, CAST(n AS BIGINT) AS n_vectors,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM c
"""


def norm_profile(
    embeddings: ray.data.Dataset, collect_budget: int = 65536
) -> ray.data.Dataset:
    """L2-NORM profile of the embedding column — the first sanity gate on
    any vector feed (un-normalized vectors break cosine shortcuts; a
    drifting norm mean is an encoder version change). Defined on 1e-6
    floor-quantized values (functions/exactsum.py discipline): per
    vector, d2q = Σ q² is an EXACT int64 (64 dims × 1e14 quanta²), and
    norm = ROUND(SQRT(d2q)/1e6, 6) — identical fl(sqrt)/divide on both
    sides, and SQRT of an integer never lands on a rounding tie. The
    mean then runs on the EXACT micro-integer norms (rint(norm*1e6),
    recovering the rounded grid value exactly) with an integer half-away
    divide; min/max are exact comparisons; p50/p90 via one
    histogram-refinement descent (bounded driver memory).
    Output: one row — n_vecs, norm_min, norm_max, norm_mean, p50, p90."""
    from tcx2graph_jl_ray.functions.exactsum import (
        div_round_half_away, floor_quantize,
    )
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    def norms(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["embedding"].notna()]
        if not len(d):
            return pd.DataFrame({"norm": pd.Series([], dtype="float64")})
        q = floor_quantize(np.stack(d["embedding"].to_numpy()))
        d2q = (q * q).sum(axis=1)  # exact int64
        return pd.DataFrame({
            "norm": np.round(np.sqrt(d2q.astype(np.float64)) / 1e6, 6),
        })

    ns = embeddings.select_columns(["embedding"]).map_batches(
        norms, batch_format="pandas", batch_size=4096
    ).materialize()  # consumed by the scalar fold AND the descent

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["norm"].to_numpy(dtype="float64")
        # norms sit exactly on the 1e-6 grid: micro-int sum is exact
        micro = np.rint(v * 1e6).astype(np.int64)
        return pd.DataFrame({
            "k": ["all"], "n": [np.int64(len(v))],
            "vmin": [v.min()], "vmax": [v.max()],
            "s": [str(int(micro.sum()))],
        })

    folded = ns.map_batches(
        partial, batch_format="pandas", batch_size=65536
    ).to_pandas()  # one row per batch — bounded

    n = int(folded["n"].sum())
    s_micro = sum(int(v) for v in folded["s"])
    _, qv = exact_global_quantiles(
        ns, "norm", [0.5, 0.9], collect_budget
    )
    return ray.data.from_pandas(pd.DataFrame({
        "n_vecs": pd.array([n], dtype="int64"),
        "norm_min": [float(folded["vmin"].min())],
        "norm_max": [float(folded["vmax"].max())],
        "norm_mean": [float(div_round_half_away(s_micro, n)) / 1e6],
        "p50": [float(np.round(qv[0.5], 6))],
        "p90": [float(np.round(qv[0.9], 6))],
    }))


NORM_PROFILE_SQL = """
WITH u AS (
  SELECT vec_id,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS HUGEINT) AS q
  FROM embeddings WHERE embedding IS NOT NULL
),
nrm AS (
  SELECT ROUND(SQRT(CAST(SUM(q * q) AS DOUBLE)) / 1000000.0, 6) AS norm
  FROM u GROUP BY vec_id
),
mic AS (
  SELECT norm, CAST(ROUND(norm * 1000000.0) AS HUGEINT) AS micro FROM nrm
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
       MIN(norm) AS norm_min, MAX(norm) AS norm_max,
       CAST((2 * SUM(micro) + CAST(COUNT(*) AS HUGEINT))
            // (2 * CAST(COUNT(*) AS HUGEINT)) AS DOUBLE)
         / 1000000.0 AS norm_mean,
       ROUND(QUANTILE_CONT(norm, 0.5), 6) AS p50,
       ROUND(QUANTILE_CONT(norm, 0.9), 6) AS p90
FROM mic
"""


def centroid_drift(
    embeddings: ray.data.Dataset, n_buckets: int = 16
) -> ray.data.Dataset:
    """Encoder DRIFT check: distance between the centroids of the
    even-``vec_id`` and odd-``vec_id`` halves of the corpus — on an
    id-assignment that tracks ingest time, a non-trivial distance means
    the embedding distribution moved mid-corpus (an encoder swap or a
    data mix shift) and every trained IVF/PQ codebook is stale. Defined
    on 1e-6 floor-quantized values (functions/exactsum.py discipline):
    per-parity per-dim EXACT integer sums, each centroid mean an exact
    half-away integer divide in 1e-6 units FIRST (the defined statistic
    — order- and partition-independent), then the L2 distance over the 64
    integer diffs: dist = ROUND(SQRT(Σ diff²)/1e6, 6) where Σ diff² is
    exact and SQRT of an integer can never land on a rounding tie.
    Output: one row — n_even, n_odd, centroid_dist."""
    from tcx2graph_jl_ray.functions.exactsum import (
        div_round_half_away, floor_quantize, merge_int_strs,
    )
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["embedding"].notna()]
        if not len(d):
            return pd.DataFrame({
                "dim": pd.Series([], dtype="int64"),
                "par": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            })
        q = floor_quantize(np.stack(d["embedding"].to_numpy()))
        par = (d["vec_id"].to_numpy(dtype="int64") % 2)
        ndim = q.shape[1]
        frames = []
        for p in (0, 1):
            m = q[par == p]
            if not len(m):
                continue
            frames.append(pd.DataFrame({
                "dim": np.arange(1, ndim + 1, dtype="int64"),
                "par": np.int64(p),
                "s": [str(int(v)) for v in m.sum(axis=0)],
                "n": np.int64(len(m)),
            }))
        return pd.concat(frames, ignore_index=True)

    parts = embeddings.select_columns(
        ["vec_id", "embedding"]
    ).map_batches(partial, batch_format="pandas", batch_size=4096)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["dim", "par"], sort=False).agg(
            s=("s", merge_int_strs), n=("n", "sum")
        ).reset_index()
        # exact integer centroid means in 1e-6 units
        g["mean_q"] = [
            div_round_half_away(int(s), int(n))
            for s, n in zip(g["s"], g["n"])
        ]
        w = g.pivot(index="dim", columns="par", values="mean_q")
        n_even = int(g.loc[g["par"] == 0, "n"].iloc[0]) if (
            (g["par"] == 0).any()) else 0
        n_odd = int(g.loc[g["par"] == 1, "n"].iloc[0]) if (
            (g["par"] == 1).any()) else 0
        if 0 not in w.columns or 1 not in w.columns:
            dist = float("nan")
        else:
            s2 = sum(
                (int(a) - int(b)) ** 2
                for a, b in zip(w[0].to_numpy(), w[1].to_numpy())
            )
            # SQRT(CAST(s2 AS DOUBLE)) / 1e6 — identical fl ops in SQL;
            # sqrt of an integer is never exactly on the round-6 grid's
            # half boundary, so ROUND has no tie to break
            dist = float(np.round(np.sqrt(float(s2)) / 1e6, 6))
        return pd.DataFrame({
            "n_even": pd.array([n_even], dtype="int64"),
            "n_odd": pd.array([n_odd], dtype="int64"),
            "centroid_dist": [dist],
        })

    # ONE bucket: 64 dims x 2 parities is constant-size
    return bucketed_group_apply(parts, ["dim"], final, n_buckets=1)


CENTROID_DRIFT_SQL = """
WITH u AS (
  SELECT vec_id % 2 AS par,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS HUGEINT) AS q
  FROM embeddings WHERE embedding IS NOT NULL
),
m AS (
  SELECT dim, par,
         CASE WHEN SUM(q) >= 0
              THEN (2 * SUM(q) + CAST(COUNT(*) AS HUGEINT))
                   // (2 * CAST(COUNT(*) AS HUGEINT))
              ELSE -((2 * (-SUM(q)) + CAST(COUNT(*) AS HUGEINT))
                     // (2 * CAST(COUNT(*) AS HUGEINT)))
         END AS mean_q
  FROM u GROUP BY dim, par
),
w AS (
  SELECT dim,
         MAX(CASE WHEN par = 0 THEN mean_q END) AS m0,
         MAX(CASE WHEN par = 1 THEN mean_q END) AS m1
  FROM m GROUP BY dim
),
cnt AS (
  SELECT
    (SELECT COUNT(*) FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id % 2 = 0) AS n_even,
    (SELECT COUNT(*) FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id % 2 = 1) AS n_odd
)
SELECT CAST(n_even AS BIGINT) AS n_even, CAST(n_odd AS BIGINT) AS n_odd,
       (SELECT ROUND(SQRT(CAST(SUM((m0 - m1) * (m0 - m1)) AS DOUBLE))
                     / 1000000.0, 6) FROM w)
         AS centroid_dist
FROM cnt
"""


def label_cohesion(
    embeddings: ray.data.Dataset, n_buckets: int = 16
) -> ray.data.Dataset:
    """Per-LABEL cohesion: mean squared distance from each labelled
    vector to its own label centroid — the within-class scatter table
    (one number per class) that says which labels are tight clusters and
    which are grab-bags, next to ``centroid_drift``'s corpus-level check.

    The statistic is DEFINED on 1e-6 floor-quantized embeddings with the
    EXACT rational centroid (functions/exactsum.py — the float-space
    analogue of integer cents): with q = floor(e*1e6), s_d = Σ q over the
    label, n = |label|,

        mean_dist2 = half-away-round6( Σ_vec Σ_dim (n*q - s_d)² / (n³·1e12) )

    Every sum is integer-exact (int64 inside a batch, Python-int across
    batches via decimal-string partials), so the value is independent of
    batch boundaries and summation order; the final rounding is an exact
    integer half-away divide (div_round_half_away — float ROUND would
    reopen numpy-half-even vs DuckDB-half-away ties, which integer
    numerators make common) followed by one exact int->double conversion,
    making engine == oracle bit-exact by construction. (The previous float-sum
    formulation failed last-ULP parity at sf0.001: 0.979233 vs 0.979232
    across the round-6 boundary.) Two dimension-bounded passes, same
    shuffle shape as before. Output: label, n_vecs, mean_dist2."""
    from tcx2graph_jl_ray.functions.exactsum import (
        floor_quantize, merge_int_strs,
    )
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    base = embeddings.select_columns(["label", "embedding"]).map_batches(
        lambda b: b[b["embedding"].notna() & b["label"].notna()],
        batch_format="pandas", batch_size=4096,
    ).materialize()  # consumed by the centroid pass AND the distance pass

    cref = ray.put(_quantized_label_sums(base))

    def dist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(cref)
        frames = []
        for lab, g in batch.groupby("label", sort=False):
            n, s = cm[lab]
            q = floor_quantize(np.stack(g["embedding"].to_numpy()))
            # n*q ≤ ~1e13 quanta² fits int64; the SQUARE can overflow
            # int64, so the square-and-sum runs on Python ints (exact).
            # Bounded work: dims * rows per batch; a cluster port would
            # vectorize via two-limb int64 decomposition.
            diff = (q * np.int64(n)
                    - np.asarray(s, dtype=object)[None, :]).ravel().tolist()
            t = sum(d * d for d in diff)
            frames.append(pd.DataFrame({
                "label": [lab],
                "n_part": [np.int64(len(q))],
                "t": [str(t)],
            }))
        if not frames:
            return pd.DataFrame({
                "label": pd.Series([], dtype="object"),
                "n_part": pd.Series([], dtype="int64"),
                "t": pd.Series([], dtype="object"),
            })
        return pd.concat(frames, ignore_index=True)

    parts = base.map_batches(dist_partial, batch_format="pandas",
                             batch_size=4096)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        from tcx2graph_jl_ray.functions.exactsum import div_round_half_away

        cm = ray.get(cref)
        rows = []
        for lab, g in bucket.groupby("label", sort=False):
            n = cm[lab][0]
            t = merge_int_strs(g["t"])
            # exact integer half-away rounding in 1e-6 units (float ROUND
            # would reopen the numpy-half-even vs DuckDB-half-away tie),
            # then the one exact int->double step, same as the SQL
            m = div_round_half_away(
                t * 1_000_000, n * n * n * 1_000_000_000_000
            )
            rows.append((lab, n, float(m) / 1e6))
        return pd.DataFrame({
            "label": [r[0] for r in rows],
            "n_vecs": pd.Series([r[1] for r in rows], dtype="int64"),
            "mean_dist2": pd.Series([r[2] for r in rows], dtype="float64"),
        })

    return bucketed_group_apply(parts, ["label"], final, n_buckets=1)


LABEL_COHESION_SQL = """
WITH u AS (
  SELECT vec_id, label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS HUGEINT) AS q
  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
),
c AS (
  SELECT label, dim, SUM(q) AS s, CAST(COUNT(*) AS HUGEINT) AS n
  FROM u GROUP BY label, dim
),
t AS (
  SELECT u.label, MAX(c.n) AS n,
         SUM((c.n * u.q - c.s) * (c.n * u.q - c.s)) AS tt
  FROM u JOIN c ON c.label = u.label AND c.dim = u.dim
  GROUP BY u.label
)
SELECT label, CAST(n AS BIGINT) AS n_vecs,
       CAST((2 * tt * 1000000 + n * n * n * 1000000000000)
            // (2 * n * n * n * 1000000000000) AS DOUBLE)
         / 1000000.0 AS mean_dist2
FROM t
"""


def dim_variance(
    embeddings: ray.data.Dataset, n_buckets: int = 16
) -> ray.data.Dataset:
    """Per-dimension VARIANCE of the embedding column — the dead-axis
    detector that ``embedding_dim_stats``' min/max can't give (a
    dimension whose variance collapsed carries no information and is
    free compression budget for PQ/SQ). Defined on 1e-6 floor-quantized
    values (functions/exactsum.py discipline): population variance
    var = (n·Σq² − (Σq)²) / (n²·1e12), every sum an exact integer
    (int64 per batch, decimal-string carriers across batches), final
    rounding an exact integer half-away divide at 1e-6 — order- and
    partition-independent. Output: dim (1-based), n_vecs, variance."""
    from tcx2graph_jl_ray.functions.exactsum import (
        div_round_half_away, floor_quantize, merge_int_strs,
    )
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["embedding"].notna()]
        if not len(d):
            return pd.DataFrame({
                "dim": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="object"),
                "s2": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            })
        q = floor_quantize(np.stack(d["embedding"].to_numpy()))
        nd = q.shape[1]
        return pd.DataFrame({
            "dim": np.arange(1, nd + 1, dtype="int64"),
            "s": [str(int(v)) for v in q.sum(axis=0)],
            # q² ≤ 1e14 quanta²: 4096-row batch sums fit int64
            "s2": [str(int(v)) for v in (q * q).sum(axis=0)],
            "n": np.int64(len(q)),
        })

    parts = embeddings.select_columns(["embedding"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("dim", sort=False).agg(
            s=("s", merge_int_strs), s2=("s2", merge_int_strs),
            n=("n", "sum"),
        ).reset_index()
        rows = []
        for dim, s, s2, n in zip(g["dim"], g["s"], g["s2"], g["n"]):
            s, s2, n = int(s), int(s2), int(n)
            m = div_round_half_away(
                (n * s2 - s * s) * 1_000_000,
                n * n * 1_000_000_000_000,
            )
            rows.append((int(dim), n, float(m) / 1e6))
        return pd.DataFrame({
            "dim": pd.Series([r[0] for r in rows], dtype="int64"),
            "n_vecs": pd.Series([r[1] for r in rows], dtype="int64"),
            "variance": pd.Series([r[2] for r in rows], dtype="float64"),
        })

    return bucketed_group_apply(parts, ["dim"], final,
                                n_buckets=n_buckets)


DIM_VARIANCE_SQL = """
WITH u AS (
  SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS HUGEINT) AS q
  FROM embeddings WHERE embedding IS NOT NULL
),
a AS (
  SELECT dim, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(q) AS s, SUM(q * q) AS s2
  FROM u GROUP BY dim
)
SELECT dim, CAST(n AS BIGINT) AS n_vecs,
       CAST((2 * (n * s2 - s * s) * 1000000 + n * n * 1000000000000)
            // (2 * n * n * 1000000000000) AS DOUBLE)
         / 1000000.0 AS variance
FROM a
"""


def truncation_profile(
    embeddings: ray.data.Dataset, keep_dims: int = 32
) -> ray.data.Dataset:
    """MATRYOSHKA TRUNCATION profile: how much of each vector's energy the
    first ``keep_dims`` dimensions retain — the feasibility gate for
    serving truncated embeddings (half the index bytes) from a full-width
    encoder. Per vector r = ||v[:k]||² / ||v||² on 1e-6 floor-quantized
    values (functions/exactsum.py discipline): both energies are EXACT
    int64 sums, so r = ROUND(head/full, 6) divides identical integers on
    both sides regardless of batch layout; then histogrammed into
    tenth-wide bins — only integer bin counts leave the workers.
    Output per occupied bin: bin, bin_lo, n_vecs, share."""
    from tcx2graph_jl_ray.functions.exactsum import floor_quantize

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["embedding"].notna()]
        if not len(d):
            return pd.DataFrame({
                "bin": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            })
        q = floor_quantize(np.stack(d["embedding"].to_numpy()))
        full = (q * q).sum(axis=1).astype(np.float64)  # exact ints < 2^53
        head = (q[:, :keep_dims] * q[:, :keep_dims]).sum(axis=1).astype(
            np.float64
        )
        r = np.round(head / full, 6)
        b = np.minimum(np.floor(r * 10.0), 9.0).astype("int64")
        g = pd.DataFrame({"bin": b, "n": np.int64(1)})\
            .groupby("bin", sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    parts = embeddings.select_columns(["embedding"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum().astype("int64")
        n = g.to_numpy()
        total = float(n.sum())
        return pd.DataFrame({
            "bin": g.index.to_numpy().astype("int64"),
            "bin_lo": np.round(g.index.to_numpy().astype("float64") / 10.0,
                               6),
            "n_vecs": n,
            "share": np.round(n.astype("float64") / total, 6),
        })

    keyed = parts.map_batches(
        lambda b: b.assign(g=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["g"], lambda b: final(b.drop(columns=["g"])), n_buckets=1
    )


TRUNCATION_PROFILE_SQL_TEMPLATE = """
WITH q AS (
  SELECT list_transform(
           CAST(embedding AS DOUBLE[]),
           x -> CAST(FLOOR(x * 1000000.0) AS HUGEINT)
         ) AS qe
  FROM embeddings WHERE embedding IS NOT NULL
),
r AS (
  SELECT ROUND(
           CAST(list_sum(list_transform(qe[1:{keep_dims}], x -> x * x))
                AS DOUBLE)
           / CAST(list_sum(list_transform(qe, x -> x * x)) AS DOUBLE),
           6) AS r
  FROM q
),
b AS (
  SELECT CAST(LEAST(FLOOR(r * 10.0), 9.0) AS BIGINT) AS bin FROM r
),
g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bin)
SELECT bin, ROUND(CAST(bin AS DOUBLE) / 10.0, 6) AS bin_lo,
       n AS n_vecs,
       ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6)
         AS share
FROM g
"""


class _BatchTopKBoth:
    """Actor-pool stage: embeddings batch -> per-query partial top-k rows
    under BOTH similarity metrics (cosine and raw inner product) from the
    same matmul pass."""

    def __init__(self, q_ref, k: int):
        self.qids, q = ray.get(q_ref)
        self.q = q
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cos = vn @ self.qn.T
        dot = vecs @ self.q.T
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        k = min(self.k, len(ids))
        out = []
        for j, qid in enumerate(self.qids):
            for metric, col in (("cos", cos[:, j]), ("dot", dot[:, j])):
                top = np.lexsort((ids, -col))[:k]
                out.append(pd.DataFrame({
                    "query_id": qid, "metric": metric,
                    "vec_id": ids[top], "sim": col[top],
                }))
        return pd.concat(out, ignore_index=True)


def metric_rank_agreement(
    embeddings: ray.data.Dataset, sf_dir: str, n_queries: int = 8,
    k: int = 10,
) -> ray.data.Dataset:
    """SIMILARITY-METRIC AGREEMENT audit: per query, how much the top-k
    retrieved under COSINE differs from the top-k under raw INNER PRODUCT —
    the norm-sensitivity check run before choosing an index metric (IP
    favors long vectors; if the two lists diverge, vector norms carry
    signal and the metric choice matters). Agreement is reported as the
    INTEGER overlap count and the INTEGER Spearman footrule
    (sum |rank_cos - rank_dot| over the shared items) — rank statistics,
    no float similarity values in the output.

    Shape: one actor-pool matmul pass produces partial top-k rows under
    both metrics (same broadcast query matrix as ``ann_brute_topk``),
    per-(query, metric) merge, then one self-join on (query, vec).
    Output: query_id, n_overlap, footrule (int64)."""
    q_ref = ray.put(_load_queries(sf_dir, n_queries))

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _BatchTopKBoth,
        fn_constructor_args=(q_ref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 16),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pd.DataFrame({
            "query_id": g["query_id"].astype("int64").to_numpy(),
            "metric": g["metric"].to_numpy(),
            "vec_id": g["vec_id"].astype("int64").to_numpy(),
            "rank": pd.array(range(1, len(g) + 1), dtype="int64"),
        })

    ranked = partials.groupby(["query_id", "metric"]).map_groups(
        merge, batch_format="pandas"
    )

    def agree(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["metric"] == "cos"][["vec_id", "rank"]]
        d = g[g["metric"] == "dot"][["vec_id", "rank"]]
        m = c.merge(d, on="vec_id", suffixes=("_c", "_d"))
        return pd.DataFrame({
            "query_id": [np.int64(g["query_id"].iloc[0])],
            "n_overlap": [np.int64(len(m))],
            "footrule": [np.int64(
                np.abs(m["rank_c"].to_numpy(dtype="int64")
                       - m["rank_d"].to_numpy(dtype="int64")).sum()
                if len(m) else 0
            )],
        })

    return ranked.groupby("query_id").map_groups(agree, batch_format="pandas")


METRIC_RANK_AGREEMENT_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {n_queries}
),
sc AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS s
  FROM q CROSS JOIN embeddings e
),
sd AS (
  SELECT q.query_id, e.vec_id,
         list_inner_product(q.qe, CAST(e.embedding AS DOUBLE[])) AS s
  FROM q CROSS JOIN embeddings e
),
rc AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id)
           AS rank
  FROM sc QUALIFY rank <= {k}
),
rd AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id)
           AS rank
  FROM sd QUALIFY rank <= {k}
)
SELECT rc.query_id,
       CAST(COUNT(rd.vec_id) AS BIGINT) AS n_overlap,
       CAST(COALESCE(SUM(ABS(rc.rank - rd.rank)), 0) AS BIGINT) AS footrule
FROM rc LEFT JOIN rd ON rd.query_id = rc.query_id AND rd.vec_id = rc.vec_id
GROUP BY rc.query_id
"""


class _BatchTopKSq8:
    """Actor-pool stage: per-query partial top-k under BOTH the float
    corpus and its SQ8 dequantized twin, one pass. The quantizer is the
    identical IEEE expression as ``sq8_quantization_error`` / its oracle:
    e_hat = vmin + FLOOR((e - vmin) * 255 / rng + 0.5) * rng / 255."""

    def __init__(self, q_ref, rng_ref, k: int):
        self.qids, q = ray.get(q_ref)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.vmin, self.rng = ray.get(rng_ref)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            steps = np.floor(
                (vecs - self.vmin) * 255.0 / self.rng + 0.5
            )
        deq = np.where(
            self.rng > 0, self.vmin + steps * self.rng / 255.0, vecs
        )
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        k = min(self.k, len(ids))
        out = []
        for metric, m in (("float", vecs), ("sq8", deq)):
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = mn @ self.qn.T
            for j, qid in enumerate(self.qids):
                col = sims[:, j]
                top = np.lexsort((ids, -col))[:k]
                out.append(pd.DataFrame({
                    "query_id": qid, "metric": metric,
                    "vec_id": ids[top], "sim": col[top],
                }))
        return pd.concat(out, ignore_index=True)


def sq8_rank_agreement(
    embeddings: ray.data.Dataset, sf_dir: str, n_queries: int = 8,
    k: int = 10, n_buckets: int = 16,
) -> ray.data.Dataset:
    """QUANTIZATION-AWARE RECALL: per query, how much the cosine top-k over
    the SQ8-dequantized corpus differs from the float-corpus top-k — the
    accept/reject number for serving an index at 8 bits per dimension
    (``emb_sq8_error`` profiles per-dim error; this measures what actually
    matters, RANK damage). Integer overlap + integer Spearman footrule +
    recall@k (one division, round 6).

    Shape: the 64-row per-dim range broadcast once; one actor-pool matmul
    pass scores both corpora; per-(query, metric) merge; one self-join.
    Output: query_id, n_overlap, footrule (int64), recall (float64)."""
    ranges = (
        embedding_dim_stats(embeddings, n_buckets=n_buckets)
        .to_pandas().sort_values("dim")
    )
    vmin = ranges["vmin"].to_numpy(dtype="float64")
    rng = ranges["vmax"].to_numpy(dtype="float64") - vmin
    q_ref = ray.put(_load_queries(sf_dir, n_queries))
    rng_ref = ray.put((vmin, rng))

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _BatchTopKSq8,
        fn_constructor_args=(q_ref, rng_ref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 16),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pd.DataFrame({
            "query_id": g["query_id"].astype("int64").to_numpy(),
            "metric": g["metric"].to_numpy(),
            "vec_id": g["vec_id"].astype("int64").to_numpy(),
            "rank": pd.array(range(1, len(g) + 1), dtype="int64"),
        })

    ranked = partials.groupby(["query_id", "metric"]).map_groups(
        merge, batch_format="pandas"
    )

    def agree(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["metric"] == "float"][["vec_id", "rank"]]
        s = g[g["metric"] == "sq8"][["vec_id", "rank"]]
        m = f.merge(s, on="vec_id", suffixes=("_f", "_s"))
        n_f = max(len(f), 1)
        return pd.DataFrame({
            "query_id": [np.int64(g["query_id"].iloc[0])],
            "n_overlap": [np.int64(len(m))],
            "footrule": [np.int64(
                np.abs(m["rank_f"].to_numpy(dtype="int64")
                       - m["rank_s"].to_numpy(dtype="int64")).sum()
                if len(m) else 0
            )],
            "recall": [float(np.round(len(m) / n_f, 6))],
        })

    return ranked.groupby("query_id").map_groups(agree, batch_format="pandas")


SQ8_RANK_AGREEMENT_SQL_TEMPLATE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {n_queries}
),
u AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings WHERE embedding IS NOT NULL
),
r AS (SELECT dim, MIN(e) AS vmin, MAX(e) AS vmax FROM u GROUP BY dim),
dq AS (
  SELECT u.vec_id, u.dim,
         CASE WHEN r.vmax > r.vmin
              THEN r.vmin
                   + FLOOR((u.e - r.vmin) * 255.0 / (r.vmax - r.vmin) + 0.5)
                     * (r.vmax - r.vmin) / 255.0
              ELSE u.e END AS eq
  FROM u JOIN r ON r.dim = u.dim
),
vq AS (SELECT vec_id, list(eq ORDER BY dim) AS emq FROM dq GROUP BY vec_id),
sf AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS s
  FROM q CROSS JOIN embeddings e
),
sq AS (
  SELECT q.query_id, v.vec_id, list_cosine_similarity(q.qe, v.emq) AS s
  FROM q CROSS JOIN vq v
),
rf AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id)
           AS rank
  FROM sf QUALIFY rank <= {k}
),
rq AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id)
           AS rank
  FROM sq QUALIFY rank <= {k}
)
SELECT rf.query_id,
       CAST(COUNT(rq.vec_id) AS BIGINT) AS n_overlap,
       CAST(COALESCE(SUM(ABS(rf.rank - rq.rank)), 0) AS BIGINT) AS footrule,
       ROUND(CAST(COUNT(rq.vec_id) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS recall
FROM rf LEFT JOIN rq ON rq.query_id = rf.query_id AND rq.vec_id = rf.vec_id
GROUP BY rf.query_id
"""


def ivf_probe_curve(
    embeddings: ray.data.Dataset,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    nprobes: tuple = (1, 2, 4),
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """IVF RECALL-vs-PROBES curve: total recall@k of the IVF index at each
    ``nprobe`` setting — the latency/recall trade table an ANN deployment
    tunes against (each probed cell costs one more partition scan;
    ``ann_ivf_recall`` is one point of this curve, this is the sweep).
    Recall counts are exact integers (hits against the exact brute top-k
    through the co-partitioned join); recall is one division by the
    constant n_queries*k, rounded 6.

    Output: nprobe (int64), n_hits (int64), recall (float64), one row per
    probed setting."""
    from tcx2graph_jl_ray.functions.join import hash_join

    brute = ann_brute_topk(embeddings, sf_dir, n_queries, k).map_batches(
        lambda b: b[["query_id", "vec_id"]], batch_format="pandas",
    ).materialize()

    rows = []
    for np_ in nprobes:
        approx = ann_ivf_topk(
            embeddings, sf_dir, n_queries, k, nprobe=int(np_)
        ).map_batches(
            lambda b: b[["query_id", "vec_id"]].assign(hit=np.int64(1)),
            batch_format="pandas",
        )
        j = hash_join(brute, approx, on=["query_id", "vec_id"], how="left",
                      n_buckets=n_buckets)
        hits = int(j.map_batches(
            lambda b: pd.DataFrame({"h": [b["hit"].notna().sum()]}),
            batch_format="pandas",
        ).to_pandas()["h"].sum())
        rows.append((
            np.int64(int(np_)), np.int64(hits),
            float(np.round(hits / float(n_queries * k), 6)),
        ))
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["nprobe", "n_hits", "recall"]
    ))


def ivf_probe_curve_sql(
    n_queries: int, k: int, nprobes: tuple = (1, 2, 4), dim: int = 64
) -> str:
    brute = ANN_BRUTE_SQL_TEMPLATE.format(n_queries=n_queries, k=k)
    blocks = []
    for np_ in nprobes:
        ivf = ann_ivf_sql(n_queries, k, nprobe=int(np_), dim=dim)
        blocks.append(f"""
SELECT CAST({int(np_)} AS BIGINT) AS nprobe,
       CAST(COUNT(i.vec_id) AS BIGINT) AS n_hits,
       ROUND(CAST(COUNT(i.vec_id) AS DOUBLE)
             / {float(n_queries * k)}, 6) AS recall
FROM brute b
LEFT JOIN ({ivf}) i ON i.query_id = b.query_id AND i.vec_id = b.vec_id
""")
    body = "\nUNION ALL\n".join(blocks)
    return f"WITH brute AS MATERIALIZED ({brute})\n{body}"
