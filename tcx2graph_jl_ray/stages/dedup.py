"""Document deduplication suite: exact, MinHash-LSH, SimHash, char-set
similarity join.

The reference's dedup surface is geometric — unique-grid-cell dedup
(src/GraphUtils.jl:46-88), range-overlap dedup
(src/OverlappingSegmentsUtils.jl:229-240), Fréchet near-dedup
(examples/case_study_1.jl:114-126). Recast for a text corpus:

- **exact**      = unique-cell dedup: content-hash partition + per-group first
- **MinHash-LSH**= bbox-prefilter + Fréchet verify: band-bucket blocking +
  true-Jaccard verify + connected components (reusing the canonicalization
  machinery, stages/canonicalize.py)
- **SimHash**    = cheap near-dup sketch with banded hamming candidates
- **similarity join** = per-block pairwise verify with an exact, oracle-
  checkable metric (distinct-character Jaccard, matching DuckDB ``jaccard``)

Scale notes in each function: blocking keys are the shuffle keys; the
verify side-table broadcast is the sandbox shortcut for what is a bucketed
hash join at 100 TB (documented inline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from tcx2graph_jl_ray.config import DEFAULT_CONFIG, PipelineConfig
from tcx2graph_jl_ray.functions.minhash import (
    band_keys,
    jaccard_of_sets,
    minhash_signatures,
    simhash64,
    word_shingles,
)


from tcx2graph_jl_ray.functions.hygiene import nonnull_text as _nonnull_text


# --- exact dedup -------------------------------------------------------------

def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup by full text: one survivor (min doc_id) per distinct text,
    with the copy count. Hash-partition on a content digest so the shuffle
    moves digests, not the texts' assumed uniqueness; equality is re-verified
    group-side (hash collisions cannot corrupt the result).
    Output: doc_id, n_copies."""

    def add_digest(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch).copy()
        # internal shuffle key only (equality re-verified group-side), so a
        # process-stable vectorized hash replaces the per-row md5 loop
        batch["digest"] = pd.util.hash_pandas_object(
            batch["text"], index=False
        ).astype("int64")
        return batch

    def first_per_text(bucket: pd.DataFrame) -> pd.DataFrame:
        agg = bucket.groupby("text", sort=False)["doc_id"].agg(["min", "count"])
        return pd.DataFrame(
            {
                "doc_id": agg["min"].astype("int64").to_numpy(),
                "n_copies": agg["count"].astype("int64").to_numpy(),
            }
        )

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    return bucketed_group_apply(
        docs.map_batches(add_digest, batch_format="pandas", batch_size=8192),
        ["digest"],
        first_per_text,
    )


EXACT_DEDUP_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents WHERE text IS NOT NULL GROUP BY text
"""


# --- MinHash-LSH near-dup clustering ----------------------------------------

class _Signatures:
    """Actor-pool stage: documents batch -> (doc_id, sig, bands) rows.
    Permutation parameters are built once per actor in __init__."""

    def __init__(self, num_perm: int, bands: int, shingle_k: int):
        self.num_perm = num_perm
        self.bands = bands
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        sh = word_shingles(batch["text"], self.k)
        sig = minhash_signatures(
            batch["doc_id"].to_numpy(), sh, num_perm=self.num_perm
        )
        sig["bands"] = [band_keys(s, self.bands) for s in sig["sig"]]
        return sig[["doc_id", "bands"]]


def _word_shingle_set(t: str, k: int) -> set:
    # split-on-space + drop empties == the oracles' string_split/list_filter
    ws = [w for w in t.lower().split(" ") if w]
    if len(ws) < k:
        return {" ".join(ws)} if ws else set()
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


def _verify_pairs_join(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float,
    shingle_k: int,
    emit_sim: bool = False,
) -> ray.data.Dataset:
    """True-Jaccard verify of candidate (a, b) pairs as a distributed
    bucketed hash join against the docs table — no driver materialization of
    the corpus and no whole-corpus broadcast.

    Shuffle 1 (key = doc_id): each pair emits two text requests; docs emit
    text carriers, prefiltered by a Bloom filter over requested ids (broadcast
    in a fixed budget; false positives only ship an unneeded text — the merge
    is exact). Shuffle 2 (key = (a, b)): the two attached texts meet and the
    group verifies word-shingle Jaccard, memoizing shingle sets per doc within
    the bucket.
    """
    from tcx2graph_jl_ray.functions.bloom import BloomFilter
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    # Bloom over candidate doc ids, built streaming (never holds the pair set
    # in one object); capacity = distinct-id upper bound (2 ids per pair)
    n_pairs = pairs.count()
    bloom = BloomFilter(max(2 * n_pairs, 64), fp_rate=0.01)
    for b in pairs.iter_batches(batch_size=65536, batch_format="pandas"):
        bloom.add(b["a"])
        bloom.add(b["b"])
    bloom_ref = ray.put(bloom)

    def to_requests(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": pd.concat(
                    [batch["a"], batch["b"]], ignore_index=True
                ).astype("int64"),
                "a": pd.concat([batch["a"], batch["a"]], ignore_index=True).astype(
                    "int64"
                ),
                "b": pd.concat([batch["b"], batch["b"]], ignore_index=True).astype(
                    "int64"
                ),
                "text": pd.Series([None] * (2 * len(batch)), dtype="object"),
            }
        )

    class _Carriers:
        """Actor-pool stage: Bloom-prefilter the corpus to ~requested texts
        (filter fetched once per actor in __init__)."""

        def __init__(self, ref):
            self.bloom = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            kept = batch[self.bloom.contains(batch["doc_id"])]
            return pd.DataFrame(
                {
                    "doc_id": kept["doc_id"].astype("int64").to_numpy(),
                    "a": np.full(len(kept), -1, dtype="int64"),
                    "b": np.full(len(kept), -1, dtype="int64"),
                    "text": kept["text"].astype("object").to_numpy(),
                }
            )

    requests = pairs.map_batches(to_requests, batch_format="pandas")
    carriers = docs.select_columns(["doc_id", "text"]).map_batches(
        _Carriers,
        fn_constructor_args=(bloom_ref,),
        batch_format="pandas",
        batch_size=8192,
        concurrency=(1, 8),
    )

    def attach_text(bucket: pd.DataFrame) -> pd.DataFrame:
        car = bucket[bucket["a"] < 0][["doc_id", "text"]]
        req = bucket[bucket["a"] >= 0][["doc_id", "a", "b"]]
        if not len(req) or not len(car):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "a": pd.Series([], dtype="int64"),
                 "b": pd.Series([], dtype="int64"),
                 "text": pd.Series([], dtype="object")}
            )
        return req.merge(car.drop_duplicates("doc_id"), on="doc_id")

    attached = bucketed_group_apply(
        requests.union(carriers), ["doc_id"], attach_text
    )

    def verify_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # memoize shingle sets per distinct doc in the bucket (each doc
        # participates in many candidate pairs)
        sh: dict = {}
        for did, txt in zip(bucket["doc_id"].to_numpy(), bucket["text"].to_numpy()):
            if did not in sh:
                sh[did] = _word_shingle_set(txt, shingle_k)
        out_a, out_b, out_s = [], [], []
        for (a, b), g in bucket.groupby(["a", "b"], sort=False):
            if g["doc_id"].nunique() < 2:  # a text side went missing
                continue
            j = jaccard_of_sets(sh[a], sh[b])
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_s.append(j)
        out = {"a": pd.Series(out_a, dtype="int64"),
               "b": pd.Series(out_b, dtype="int64")}
        if emit_sim:
            out["sim"] = pd.Series(out_s, dtype="float64")
        return pd.DataFrame(out)

    return bucketed_group_apply(attached, ["a", "b"], verify_bucket)


def _candidate_pairs(
    docs: ray.data.Dataset, config: PipelineConfig
) -> ray.data.Dataset:
    """MinHash-LSH candidate pairs: shingle -> signature (actor pool) ->
    banded blocking -> per-band pair generation (hot-band cap) -> distinct
    (a, b). The materialize pins the bounded candidate set: it feeds both the
    Bloom build and the verify join."""
    sigs = docs.map_batches(
        _Signatures,
        fn_constructor_args=(config.minhash_num_perm, config.minhash_bands,
                             config.shingle_size),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 16),
    )

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.explode("bands").rename(columns={"bands": "band"})
        return out[["band", "doc_id"]]

    cap = config.max_block_size

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # bucket holds whole bands; per-band pair generation, capped per band
        out_a, out_b = [], []
        for _, g in bucket.groupby("band", sort=False):
            ids = np.sort(g["doc_id"].unique())
            if len(ids) < 2 or len(ids) > cap:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    pairs = bucketed_group_apply(
        sigs.map_batches(explode_bands, batch_format="pandas"),
        ["band"],
        pairs_in_bucket,
    )
    return bucketed_group_apply(
        pairs, ["a", "b"], lambda b: b.drop_duplicates(["a", "b"])
    ).materialize()


def neardup_minhash_pairs(
    docs: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Verified MinHash near-dup pairs: banded candidates, then true
    word-shingle Jaccard >= threshold via the bucketed hash join. Output:
    a, b (a < b) — value-exact vs the ``minhash_pairs_sql`` DuckDB oracle
    (md5-based hash family, inlined permutation parameters, band-tuple
    equality; the engine's FNV band fingerprint can only ADD candidates on a
    64-bit collision, which the exact verify then removes). Caveat the
    oracle does NOT model: bands with more than ``config.max_block_size``
    docs are SKIPPED for pair generation (the hot-band guard — a band that
    big is a boilerplate signature, and its quadratic pair cost buys no
    discrimination), so parity holds only while no band exceeds the cap
    (asserted at test scale; at corpus scale the cap is the intended recall
    trade, not a bug)."""
    pairs = _candidate_pairs(docs, config)
    return _verify_pairs_join(
        pairs, docs, config.jaccard_threshold, config.shingle_size
    )


def minhash_pairs_sql(config: PipelineConfig = DEFAULT_CONFIG) -> str:
    """DuckDB oracle for ``neardup_minhash_pairs``: reproduces the exact
    sketch — md5_number_lower base hash, (a*h + b) mod 2^64 permutations in
    HUGEINT (a < 2^61 so the product fits), per-doc per-permutation MIN,
    band = permutation block, candidates share a band's full value tuple,
    verify = distinct-word-shingle Jaccard >= threshold."""
    from tcx2graph_jl_ray.functions.minhash import _perm_params

    num_perm = config.minhash_num_perm
    bands = config.minhash_bands
    r = num_perm // bands
    k = config.shingle_size
    tau = config.jaccard_threshold
    a, b = _perm_params(num_perm)
    perm_rows = ",\n    ".join(
        f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)"
        for j in range(num_perm)
    )
    full = r * bands
    return f"""
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(l) >= {k} THEN array_to_string(l[i:i+{k}-1], ' ')
              ELSE array_to_string(l, ' ') END AS shingle
  FROM tk, unnest(CASE WHEN len(l) >= {k} THEN range(1, len(l) - {k} + 2)
                       ELSE [1] END) AS t(i)
  WHERE len(l) > 0
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
h AS (
  SELECT doc_id, shingle, CAST(md5_number_lower(shingle) AS HUGEINT) AS h
  FROM sh
),
perms(j, pa, pb) AS (VALUES
    {perm_rows}
),
sig AS (
  SELECT doc_id, j,
         MIN((pa * h + pb) % 18446744073709551616::HUGEINT) AS v
  FROM h CROSS JOIN perms
  GROUP BY doc_id, j
),
bandkeys AS (
  -- j < bands*r mirrors band_keys(): leftover permutations beyond the last
  -- full band are dropped when num_perm is not divisible by bands
  SELECT doc_id, j // {r} AS band, LIST(v ORDER BY j) AS key
  FROM sig WHERE j < {full} GROUP BY doc_id, j // {r}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bandkeys x JOIN bandkeys y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
inter AS (
  SELECT c.a, c.b, COUNT(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
)
SELECT CAST(inter.a AS BIGINT) AS a, CAST(inter.b AS BIGINT) AS b
FROM inter
JOIN cnt ca ON ca.doc_id = inter.a
JOIN cnt cb ON cb.doc_id = inter.b
WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= {tau}
"""


def neardup_minhash(
    docs: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    verified_pairs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """MinHash-LSH near-duplicate clustering.

    shingle -> minhash (actor pool) -> explode band keys -> groupby(band)
    candidate pairs (capped per band: hot-band guard) -> true word-shingle
    Jaccard verify -> connected components (min-label propagation) ->
    Output: doc_id, cluster_id (min doc_id of the component).

    The verify is a **bucketed hash join** of candidate pairs against the
    docs table on doc_id — never a driver materialization or whole-corpus
    broadcast (the two-phase candidate/verify split of the reference,
    src/OverlappingSegmentsUtils.jl:173-209 vs :222-274). Candidate doc ids
    are broadcast as a fixed-budget Bloom filter that prefilters the text
    carriers (a superset — the join itself is exact), so only ~matched texts
    are shuffled; pair groups then verify true word-shingle Jaccard
    group-side with per-doc shingle memoization.

    ``verified_pairs`` lets a caller that already materialized
    ``neardup_minhash_pairs(docs, config)`` (e.g. a query sweep running
    pairs, clusters, eval and funnel over one corpus) reuse it instead of
    re-deriving the candidate/verify chain.
    """
    verified = (
        verified_pairs
        if verified_pairs is not None
        else neardup_minhash_pairs(docs, config)
    )

    # reuse the distributed component machinery on stringified doc ids
    from tcx2graph_jl_ray.stages.canonicalize import connected_components

    def ids_as_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"norm": batch["doc_id"].map("{:020d}".format)})

    def pairs_as_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": batch["a"].map("{:020d}".format),
                "b": batch["b"].map("{:020d}".format),
            }
        )

    nodes = docs.select_columns(["doc_id"]).map_batches(
        ids_as_nodes, batch_format="pandas"
    )
    labels = connected_components(
        nodes, verified.map_batches(pairs_as_edges, batch_format="pandas"), config
    )
    labels["doc_id"] = labels["node"].astype("int64")
    labels["cluster_id"] = labels["label"].astype("int64")
    return ray.data.from_pandas(
        labels[["doc_id", "cluster_id"]].reset_index(drop=True)
    )


def minhash_clusters_sql(config: PipelineConfig = DEFAULT_CONFIG) -> str:
    """DuckDB oracle for ``neardup_minhash``: connected components over the
    oracle-exact verified pairs (``minhash_pairs_sql``) as a recursive CTE
    computing, per doc, the minimum doc_id reachable through the pair graph
    — exactly the engine's min-label component id. Every documents row is a
    node (singletons cluster with themselves). Polynomial, not exponential:
    the UNION dedups, so the recursion enumerates at most
    sum(component_size^2) (node, reach) rows — tiny at oracle scale where
    near-dup clusters are small."""
    pairs = minhash_pairs_sql(config).strip()
    assert pairs.startswith("WITH ")
    # splice our CTE list into the pairs query's own WITH clause, then make
    # the whole thing recursive
    inner = pairs[len("WITH "):]
    return f"""
WITH RECURSIVE {inner.replace("SELECT CAST(inter.a AS BIGINT) AS a",
                              ", pairs AS (SELECT CAST(inter.a AS BIGINT) AS a", 1)}
),
edges AS (
  SELECT a AS u, b AS v FROM pairs
  UNION ALL
  SELECT b, a FROM pairs
),
r(node, reach) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.node, e.v FROM r JOIN edges e ON e.u = r.reach
)
SELECT node AS doc_id, MIN(reach) AS cluster_id FROM r GROUP BY node
"""


# --- SimHash -----------------------------------------------------------------

def simhash_table(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc 64-bit SimHash (deterministic). Output: doc_id, simhash:int64
    (bit-reinterpreted from uint64 for Arrow)."""

    def sh(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "simhash": simhash64(batch["text"]).view(np.int64),
            }
        )

    return docs.map_batches(sh, batch_format="pandas", batch_size=8192)


def simhash_neardup_pairs(
    docs: ray.data.Dataset, max_hamming: int = 3
) -> ray.data.Dataset:
    """Candidate pairs with hamming(simhash) <= max_hamming, blocked by four
    16-bit simhash bands (a pair within distance 3 shares at least one exact
    band). Output: a, b, hamming:int64."""
    sigs = simhash_table(docs)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        rows = []
        for band in range(4):
            chunk = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            rows.append(
                pd.DataFrame(
                    {
                        "band": [f"{band}:{int(c)}" for c in chunk],
                        "doc_id": batch["doc_id"].astype("int64"),
                        "simhash": batch["simhash"],
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        from tcx2graph_jl_ray.functions.minhash import hamming64

        out = []
        for _, g in bucket.groupby("band", sort=False):
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            if len(g) < 2:
                continue
            ids = g["doc_id"].to_numpy()
            hs = g["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
            ii, jj = np.triu_indices(len(ids), k=1)
            hd = hamming64(hs[ii], hs[jj]).astype("int64")
            keep = hd <= max_hamming
            out.append(
                pd.DataFrame(
                    {"a": ids[ii][keep], "b": ids[jj][keep], "hamming": hd[keep]}
                )
            )
        if not out:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        return pd.concat(out, ignore_index=True)

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    pairs = bucketed_group_apply(
        sigs.map_batches(explode, batch_format="pandas"), ["band"], pairs_in_bucket
    )
    return bucketed_group_apply(
        pairs, ["a", "b"], lambda b: b.drop_duplicates(["a", "b"])
    )


# SQL reproduction of simhash64 (functions/minhash.py): token hash =
# md5_number_lower, per-bit +-1 vote over token OCCURRENCES, bit set when the
# vote sum is positive, result bit-reinterpreted to BIGINT. Tokenization
# caveat: the engine splits on any whitespace run; the SQL splits on ' ' and
# filters empties — identical whenever whitespace is spaces (true of the
# corpus; tabs/newlines would need regexp_split_to_array).
SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
  WHERE text IS NOT NULL
),
h AS (
  SELECT doc_id, md5_number_lower(tok) AS h FROM toks WHERE tok != ''
),
bits AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN (h >> CAST(b.b AS UBIGINT)) & CAST(1 AS UBIGINT)
                       = CAST(1 AS UBIGINT)
                  THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) b
  GROUP BY doc_id, b.b
),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN s > 0 THEN CAST(1 AS HUGEINT) << b ELSE 0 END) AS u
  FROM bits GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN COALESCE(sh.u, 0) >= 9223372036854775808
                 THEN sh.u - 18446744073709551616
                 ELSE COALESCE(sh.u, 0) END AS BIGINT) AS simhash
FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id
WHERE d.text IS NOT NULL
"""

SIMHASH_PAIRS_SQL_TEMPLATE = """
WITH sh AS ({simhash}),
u AS (
  SELECT doc_id,
         CAST(CAST(simhash AS HUGEINT)
              + CASE WHEN simhash < 0 THEN 18446744073709551616 ELSE 0 END
              AS UBIGINT) AS u
  FROM sh
),
bands AS (
  SELECT doc_id, u, b.b AS band,
         (u >> CAST(16 * b.b AS UBIGINT)) & CAST(65535 AS UBIGINT) AS bval
  FROM u CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b
)
SELECT DISTINCT CAST(x.doc_id AS BIGINT) AS a,
       CAST(y.doc_id AS BIGINT) AS b,
       CAST(bit_count(xor(x.u, y.u)) AS BIGINT) AS hamming
FROM bands x JOIN bands y
  ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.u, y.u)) <= {max_hamming}
"""


# --- char-set similarity join (oracle-checkable) -----------------------------

def charset_similarity_join(
    docs: ray.data.Dataset,
    threshold: float = 0.86,
    max_block: int = 100_000,
    tile: int = 4096,
) -> ray.data.Dataset:
    """Similarity join within ``source`` blocks: distinct-character Jaccard
    (exactly DuckDB's ``jaccard`` semantics: case-sensitive, spaces count).
    Vectorized via 256-bit byte bitmasks + popcount — no per-pair set ops.

    Skew guards: pair generation is **tiled** (``tile`` × ``tile`` index
    blocks) so a hot source costs bounded memory instead of an O(n²) triu
    allocation, and sources with more than ``max_block`` docs are dropped
    entirely (the non-discriminative-block cap, same rule as token blocking's
    ``max_block_size``) — at the default the oracle at test scale is
    unaffected. Output: source, a, b, sim (a < b)."""

    EMPTY = pd.DataFrame(
        {"source": pd.Series([], dtype="object"),
         "a": pd.Series([], dtype="int64"),
         "b": pd.Series([], dtype="int64"),
         "sim": pd.Series([], dtype="float64")}
    )

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        # null AND empty texts excluded: an empty doc has no character set
        # (DuckDB's jaccard likewise rejects empty arguments)
        g = _nonnull_text(g)
        g = g[g["text"].str.len() > 0]
        n = len(g)
        if n < 2 or n > max_block:
            return EMPTY
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        # DuckDB jaccard operates on distinct UTF-8 BYTES (verified: 'é'
        # counts as its two bytes), so a 256-bit byte mask is exact for any
        # input, ASCII or not
        masks = np.zeros((n, 4), dtype=np.uint64)
        for i, t in enumerate(g["text"].to_numpy()):
            for o in set(t.encode()):
                masks[i, o >> 6] |= np.uint64(1) << np.uint64(o & 63)
        counts = np.unpackbits(masks.view(np.uint8), axis=1).sum(axis=1)

        def pop(x):
            return np.unpackbits(
                np.ascontiguousarray(x).view(np.uint8).reshape(len(x), -1), axis=1
            ).sum(axis=1)

        out = []
        for i0 in range(0, n, tile):
            i1 = min(i0 + tile, n)
            for j0 in range(i0, n, tile):
                j1 = min(j0 + tile, n)
                ii, jj = np.meshgrid(
                    np.arange(i0, i1), np.arange(j0, j1), indexing="ij"
                )
                ii, jj = ii.ravel(), jj.ravel()
                upper = ii < jj
                ii, jj = ii[upper], jj[upper]
                if not len(ii):
                    continue
                inter = sum(pop(masks[ii, w] & masks[jj, w]) for w in range(4))
                union = counts[ii] + counts[jj] - inter
                sim = inter / union
                keep = sim >= threshold
                if keep.any():
                    out.append(
                        pd.DataFrame(
                            {
                                "source": g["source"].iloc[0],
                                "a": ids[ii[keep]].astype("int64"),
                                "b": ids[jj[keep]].astype("int64"),
                                "sim": sim[keep],
                            }
                        )
                    )
        return pd.concat(out, ignore_index=True) if out else EMPTY

    import pyarrow as pa

    from tcx2graph_jl_ray.functions.arrowutil import with_schema

    out = docs.select_columns(["doc_id", "source", "text"]).groupby(
        "source"
    ).map_groups(per_block, batch_format="pandas")
    # pin the schema: an all-empty result (no qualifying pair anywhere) must
    # keep its columns through Ray's empty-block degradation
    return with_schema(
        out,
        [("source", pa.string()), ("a", pa.int64()), ("b", pa.int64()),
         ("sim", pa.float64())],
    )


CHARSET_JOIN_SQL_TEMPLATE = """
SELECT d1.source AS source,
       CAST(d1.doc_id AS BIGINT) AS a,
       CAST(d2.doc_id AS BIGINT) AS b,
       jaccard(d1.text, d2.text) AS sim
FROM documents d1
JOIN documents d2 ON d1.source = d2.source AND d1.doc_id < d2.doc_id
WHERE d1.text IS NOT NULL AND d2.text IS NOT NULL
  AND d1.text <> '' AND d2.text <> ''
  AND jaccard(d1.text, d2.text) >= {threshold}
"""


# --- word n-gram Jaccard similarity join (token join / PPJoin-lite) ----------

def ngram_jaccard_join(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    k: int = 2,
) -> ray.data.Dataset:
    """Exact word-``k``-gram Jaccard similarity join over the whole corpus —
    the full PPJoin formulation (Xiao et al., "Efficient Similarity Joins for
    Near Duplicate Detection", WWW'08): candidates come only from PREFIX
    shingles under a global rarity order, so hot stop-shingles cost neither
    recall (the old ``max_df`` drop silently lost pairs related through
    them) nor quadratic pair blowup (a hot shingle almost never survives
    into any doc's prefix — its document frequency ranks it last).

    Plan:
    (1) per-doc DISTINCT shingle rows carrying the doc's shingle-set size;
    (2) global shingle document frequencies (one bucketed count — reduced,
        vocabulary-sized);
    (3) df joins back to the shingle rows (co-partitioned ``hash_join``);
        per doc keep the first ``|d| - ceil(t·|d|) + 1`` shingles in
        (df asc, shingle asc) order — the Jaccard prefix-filter bound: two
        docs with J >= t MUST share a prefix shingle, so dropping the rest
        loses nothing;
    (4) candidate pairs per prefix shingle (vectorized triu), distinct;
    (5) exact verify via the Bloom-prefiltered bucketed text join
        (``_verify_pairs_join`` — the MinHash verify machinery), emitting
        the true Jaccard as ``sim``.

    Shingle semantics (mirrored exactly by the DuckDB oracle): lowercase,
    split on spaces, consecutive ``k``-grams; docs with fewer than ``k``
    tokens contribute their whole token string as one shingle; empty docs
    contribute nothing. Output: a, b, sim (a < b, sim >= threshold) —
    value-exact vs the oracle: the prefix filter is lossless by the bound
    above and the verify recomputes the exact Jaccard.

    Reference analogue: the candidate/verify split of overlapping-segment
    detection (src/OverlappingSegmentsUtils.jl:173-209) with the prefix
    shingle as the blocking key instead of the bbox/KD prefilter.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    kk = k
    thr = threshold

    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids_out, sh_out, n_out = [], [], []
        batch = _nonnull_text(batch)
        for did, txt in zip(
            batch["doc_id"].astype("int64").to_numpy(), batch["text"].to_numpy()
        ):
            s = _word_shingle_set(txt, kk)
            if not s:
                continue
            ids_out.extend([did] * len(s))
            sh_out.extend(s)
            n_out.extend([len(s)] * len(s))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids_out, dtype="int64"),
                "shingle": pd.Series(sh_out, dtype="object"),
                "n": pd.Series(n_out, dtype="int64"),
            }
        )

    shingles = docs.select_columns(["doc_id", "text"]).map_batches(
        shingle_rows, batch_format="pandas", batch_size=4096
    ).materialize()

    def df_count(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("shingle", sort=False).size()
        return pd.DataFrame(
            {"shingle": s.index, "df": s.to_numpy().astype("int64")}
        )

    dfs = bucketed_group_apply(
        shingles.select_columns(["shingle"]), ["shingle"], df_count
    )
    withdf = hash_join(shingles, dfs, on="shingle")

    def prefix(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["doc_id", "df", "shingle"], kind="mergesort")
        pos = b.groupby("doc_id", sort=False).cumcount().to_numpy()
        n = b["n"].to_numpy()
        # alpha = ceil(t·|d|), epsilon-guarded toward the SAFE side (a
        # smaller alpha only lengthens the prefix)
        alpha = np.ceil(thr * n - 1e-9).astype("int64")
        return b[pos < (n - alpha + 1)]

    pref = bucketed_group_apply(withdf, ["doc_id"], prefix)

    def pairs_per_shingle(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in bucket.groupby("shingle", sort=False):
            if len(g) < 2:
                continue
            ids = np.sort(g["doc_id"].unique())
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"),
                 "b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    # duplicate (a, b) rows (docs sharing 2+ prefix shingles) ride straight
    # into the verify: its own (a, b) bucket groupby collapses them, so a
    # dedicated distinct-pair shuffle would only add a stage (the Bloom
    # capacity below uses the duplicate-inclusive count — a safe upper bound)
    cand = bucketed_group_apply(
        pref, ["shingle"], pairs_per_shingle
    ).materialize()
    return _verify_pairs_join(cand, docs, thr, kk, emit_sim=True)


NGRAM_JACCARD_SQL_TEMPLATE = """
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(l) >= {k} THEN array_to_string(l[i:i+{k}-1], ' ')
              ELSE array_to_string(l, ' ') END AS shingle
  FROM tk, unnest(CASE WHEN len(l) >= {k} THEN range(1, len(l) - {k} + 2)
                       ELSE [1] END) AS t(i)
  WHERE len(l) > 0
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT CAST(inter.a AS BIGINT) AS a,
       CAST(inter.b AS BIGINT) AS b,
       CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) AS sim
FROM inter
JOIN cnt ca ON ca.doc_id = inter.a
JOIN cnt cb ON cb.doc_id = inter.b
WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= {threshold}
"""


# --- benchmark contamination check -------------------------------------------

def contamination_check(
    docs: ray.data.Dataset,
    benchmark_source: str = "src0",
    k: int = 5,
) -> ray.data.Dataset:
    """Training-data decontamination (the overlap-fraction anti-check of
    accepted segments, src/OverlappingSegmentsUtils.jl:229-240, turned into
    a corpus-vs-benchmark gate): flag corpus docs sharing any word
    ``k``-gram with the benchmark/eval set (here: docs whose ``source`` is
    ``benchmark_source``). The benchmark side is SMALL by nature (eval sets),
    so its distinct shingle set is built streaming on the driver and
    broadcast once (``ray.put``) — the canonical broadcast-small-side rule;
    the corpus streams through one vectorized flag map, no shuffle at all.
    Output: doc_id, n_overlap (distinct shared k-grams, >= 1) for
    non-benchmark docs. Value-exact vs ``CONTAMINATION_SQL_TEMPLATE``."""
    bench_sh: set = set()
    bench = docs.select_columns(["doc_id", "source", "text"]).filter(
        expr=f"source == '{benchmark_source}'"
    )
    for b in bench.iter_batches(batch_size=8192, batch_format="pandas"):
        for t in b["text"].dropna().to_numpy():
            bench_sh |= _word_shingle_set(t, k)
    ref = ray.put(bench_sh)
    kk = k

    class _Flag:
        def __init__(self, r):
            self.bench = ray.get(r)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch = _nonnull_text(batch)
            batch = batch[batch["source"] != benchmark_source]
            ids, hits = [], []
            for did, txt in zip(
                batch["doc_id"].astype("int64").to_numpy(),
                batch["text"].to_numpy(),
            ):
                n = len(_word_shingle_set(txt, kk) & self.bench)
                if n:
                    ids.append(did)
                    hits.append(n)
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_overlap": pd.Series(hits, dtype="int64"),
                }
            )

    return docs.select_columns(["doc_id", "source", "text"]).map_batches(
        _Flag, fn_constructor_args=(ref,), batch_format="pandas",
        batch_size=4096, concurrency=(1, 8),
    )


CONTAMINATION_SQL_TEMPLATE = """
WITH tk AS (
  SELECT doc_id, source,
         list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT DISTINCT doc_id, source,
         CASE WHEN len(l) >= {k} THEN array_to_string(l[i:i+{k}-1], ' ')
              ELSE array_to_string(l, ' ') END AS shingle
  FROM tk, unnest(CASE WHEN len(l) >= {k} THEN range(1, len(l) - {k} + 2)
                       ELSE [1] END) AS t(i)
  WHERE len(l) > 0
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE source = '{benchmark_source}')
SELECT CAST(s.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(DISTINCT s.shingle) AS BIGINT) AS n_overlap
FROM sh s JOIN bench b ON s.shingle = b.shingle
WHERE s.source != '{benchmark_source}'
GROUP BY s.doc_id
"""


def dedup_keep_best(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup with QUALITY-AWARE survivor selection: one representative
    per distinct text — the longest copy (``n_chars``), ties to the lowest
    ``doc_id`` — the "keep best" policy real curation pipelines apply where
    ``exact_dedup`` keeps the first. Same scale shape as ``exact_dedup``:
    hash-partition on a content digest (shuffle key only; equality is
    re-verified group-side so hash collisions cannot merge distinct texts),
    vectorized in-group argmax. The reference's candidate dedup keeps the
    RICHEST candidate the same way (sort by run count desc then drop
    overlaps, src/OverlappingSegmentsUtils.jl:220-240).

    Output: doc_id, n_chars:int64, n_copies:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def add_digest(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch).copy()
        batch["digest"] = pd.util.hash_pandas_object(
            batch["text"], index=False
        ).astype("int64")
        return batch

    def best_per_text(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        g = d.groupby("text", sort=False)
        best = g.head(1)
        n = g.size()
        return pd.DataFrame(
            {
                "doc_id": best["doc_id"].astype("int64").to_numpy(),
                "n_chars": best["n_chars"].astype("int64").to_numpy(),
                "n_copies": n.loc[best["text"]].astype("int64").to_numpy(),
            }
        )

    return bucketed_group_apply(
        docs.select_columns(["doc_id", "text", "n_chars"]).map_batches(
            add_digest, batch_format="pandas", batch_size=8192
        ),
        ["digest"],
        best_per_text,
    )


DEDUP_KEEP_BEST_SQL = """
WITH r AS (
  SELECT doc_id, n_chars, COUNT(*) OVER (PARTITION BY text) AS n_copies,
         ROW_NUMBER() OVER (PARTITION BY text
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents WHERE text IS NOT NULL
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_copies AS BIGINT) AS n_copies
FROM r WHERE rn = 1
"""


def cross_contamination(
    docs: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    k: int = 5,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Cross-CORPUS contamination: for every document, how many of its
    distinct word ``k``-grams also occur anywhere in the transcript corpus —
    ``contamination_check``'s complement for the regime where the other side
    is NOT small (decontaminating pretraining data against another full
    corpus, not a tiny eval set), so broadcasting it is off the table.

    Shape: both corpora reduce to distinct (key, gram) rows per batch +
    bucket-side (combiner distinct — the shuffle moves distinct grams, not
    token streams); they meet in the co-partitioned ``hash_join`` (LEFT, so
    unmatched doc grams survive for the totals); per-doc counts reduce in
    doc buckets. Reference analogue: the overlap anti-check
    (src/OverlappingSegmentsUtils.jl:229-240) across two segment sets.

    Output: doc_id, n_grams:int64 (distinct k-grams), n_hit:int64 (of them,
    in the transcript corpus); docs with < k tokens are absent.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def grams_of(texts: pd.Series) -> list[list[str]]:
        toks = texts.str.lower().str.split(" ")
        toks = toks.map(lambda ws: [w for w in ws if w])
        return [
            [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
            for ws in toks
        ]

    def doc_grams(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        gs = grams_of(batch["text"])
        n = [len(g) for g in gs]
        df = pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), n),
                "gram": [g for row in gs for g in row],
            }
        ).drop_duplicates()
        df["doc_id"] = df["doc_id"].astype("int64")
        return df

    def turn_grams(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["text"].notna()]
        gs = grams_of(b["text"])
        return pd.DataFrame(
            {"gram": sorted({g for row in gs for g in row})}
        )

    d_rows = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_grams, batch_format="pandas", batch_size=4096
    )
    t_rows = bucketed_group_apply(
        transcripts.select_columns(["text"]).map_batches(
            turn_grams, batch_format="pandas", batch_size=8192
        ),
        ["gram"],
        lambda bucket: bucket.drop_duplicates("gram").assign(
            hit=np.int64(1)
        ),
        n_buckets=n_buckets,
    )
    joined = hash_join(d_rows, t_rows, on="gram", how="left", n_buckets=n_buckets)

    def per_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.assign(h=bucket["hit"].notna().astype("int64"))
        g = bucket.groupby("doc_id", sort=False).agg(
            n_grams=("h", "size"), n_hit=("h", "sum")
        ).reset_index()
        g["doc_id"] = g["doc_id"].astype("int64")
        g["n_grams"] = g["n_grams"].astype("int64")
        g["n_hit"] = g["n_hit"].astype("int64")
        return g

    return bucketed_group_apply(joined, ["doc_id"], per_doc, n_buckets=n_buckets)


def cross_contamination_sql(transcripts_sql: str, k: int = 5) -> str:
    span = k - 1
    return f"""
WITH tr AS ({transcripts_sql}),
dtk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
dg AS (
  SELECT DISTINCT doc_id, array_to_string(l[i:i+{span}], ' ') AS gram
  FROM dtk, unnest(range(1, len(l) - {k} + 2)) AS t(i)
  WHERE len(l) >= {k}
),
ttk AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM tr WHERE text IS NOT NULL
),
tg AS (
  SELECT DISTINCT array_to_string(l[i:i+{span}], ' ') AS gram
  FROM ttk, unnest(range(1, len(l) - {k} + 2)) AS t(i)
  WHERE len(l) >= {k}
)
SELECT CAST(dg.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit
FROM dg LEFT JOIN tg USING (gram)
GROUP BY dg.doc_id
"""


def lsh_eval(
    docs: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    n_buckets: int = 64,
    verified_pairs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Quality harness for the MinHash-LSH candidate generation: score the
    verified LSH pairs against the EXACT shingle-Jaccard join at the same
    shingle size / threshold. tp = pairs both produce, fn = true pairs the
    banding missed (the recall trade of b bands × r rows), fp = LSH pairs
    the exact join lacks (0 when the two shingle definitions agree — the
    verify step is exact; nonzero would flag semantic drift between the
    sketch and the truth operator). The measurable-gate pattern: every
    approximate operator ships with the query that measures it.

    Shape: both pair sets stream into one bucketed (a, b) reduction with a
    side marker — no pair set is collected; the output is one row.

    Output: tp:int64, fp:int64, fn:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    lsh = (
        verified_pairs
        if verified_pairs is not None
        else neardup_minhash_pairs(docs, config)
    ).map_batches(
        lambda b: pd.DataFrame(
            {"a": b["a"], "b": b["b"], "src": np.int64(1)}
        ),
        batch_format="pandas",
    )
    truth = ngram_jaccard_join(
        docs, threshold=config.jaccard_threshold, k=config.shingle_size
    ).map_batches(
        lambda b: pd.DataFrame(
            {"a": b["a"], "b": b["b"], "src": np.int64(2)}
        ),
        batch_format="pandas",
    )

    def tally(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["a", "b"], sort=False)["src"].sum()
        return pd.DataFrame(
            {
                "tp": [int((g == 3).sum())],
                "fp": [int((g == 1).sum())],
                "fn": [int((g == 2).sum())],
            }
        )

    per_bucket = bucketed_group_apply(
        lsh.union(truth), ["a", "b"], tally, n_buckets=n_buckets
    )

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        # a corpus with no pairs at all yields zero tally rows, not columns
        t = int(batch["tp"].sum()) if "tp" in batch.columns else 0
        p = int(batch["fp"].sum()) if "fp" in batch.columns else 0
        n = int(batch["fn"].sum()) if "fn" in batch.columns else 0
        return pd.DataFrame(
            {
                "tp": pd.array([t], dtype="int64"),
                "fp": pd.array([p], dtype="int64"),
                "fn": pd.array([n], dtype="int64"),
            }
        )

    # the per-bucket tallies are n_buckets rows: a driver-size final sum
    import ray.data as _rd

    return _rd.from_pandas(final(per_bucket.to_pandas()))


def lsh_eval_sql(config: PipelineConfig = DEFAULT_CONFIG) -> str:
    lsh = minhash_pairs_sql(config)
    truth = NGRAM_JACCARD_SQL_TEMPLATE.format(
        k=config.shingle_size, threshold=config.jaccard_threshold
    )
    return f"""
WITH lsh AS MATERIALIZED ({lsh}),
truth AS MATERIALIZED (SELECT a, b FROM ({truth}))
SELECT
  CAST((SELECT COUNT(*) FROM lsh JOIN truth USING (a, b)) AS BIGINT) AS tp,
  CAST((SELECT COUNT(*) FROM lsh ANTI JOIN truth USING (a, b)) AS BIGINT) AS fp,
  CAST((SELECT COUNT(*) FROM truth ANTI JOIN lsh USING (a, b)) AS BIGINT) AS fn
"""


def simhash_clusters(
    docs: ray.data.Dataset, max_hamming: int = 3
) -> ray.data.Dataset:
    """SimHash near-duplicate CLUSTERS: connected components over the banded
    hamming-distance pair graph — the third member of the clustering trio
    (MinHash-Jaccard: ``neardup_minhash``; embedding-cosine:
    ``semantic_clusters``), same compose as the reference's overlap merge
    (pairs -> union-find, src/OverlappingSegmentsUtils.jl:212-277). Docs
    similar to nothing are absent.

    Output: doc_id, component_id (min member), component_size:int64.
    """
    from tcx2graph_jl_ray.stages.analysis import entity_components

    pairs = simhash_neardup_pairs(docs, max_hamming=max_hamming)
    edges = pairs.map_batches(
        lambda b: pd.DataFrame({"src": b["a"], "dst": b["b"]}),
        batch_format="pandas",
    )
    comp = entity_components(edges)
    return comp.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["entity_id"].astype("int64"),
                "component_id": b["component_id"].astype("int64"),
                "component_size": b["component_size"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def simhash_clusters_sql(max_hamming: int = 3) -> str:
    from tcx2graph_jl_ray.stages.analysis import COMPONENTS_SQL_TEMPLATE

    pairs = SIMHASH_PAIRS_SQL_TEMPLATE.format(
        simhash=SIMHASH_SQL, max_hamming=max_hamming
    )
    comp = COMPONENTS_SQL_TEMPLATE.format(
        cooccurrence=f"SELECT a AS src, b AS dst FROM ({pairs})"
    )
    return (
        "SELECT CAST(entity_id AS BIGINT) AS doc_id,\n"
        "       CAST(component_id AS BIGINT) AS component_id,\n"
        "       component_size\n"
        f"FROM ({comp})"
    )


def curation_funnel(
    docs: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    min_chars: int = 100,
    n_buckets: int = 64,
    clusters: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """The curation FUNNEL report: how many documents survive each gate of
    the standard training-data sequence — raw -> non-null text -> exact
    unique (min doc_id per text) -> not a non-minimum member of a MinHash
    near-dup cluster -> length gate (n_chars ≥ ``min_chars``). One row of
    integer counts, the number every curation run reports first
    (``pipelines/corpus.py`` is the operational flow; this is its
    driver-checkable measurement).

    Shape: each gate composes the already-scale-shaped operators
    (``exact_dedup``, ``neardup_minhash``); survivor/victim sets meet
    through the co-partitioned ``hash_join`` (anti on the null side), never
    a collected id set; each count is a Dataset aggregate.

    Output: n_raw, n_nonnull, n_exact_unique, n_after_neardup,
    n_quality (all int64).
    """
    from tcx2graph_jl_ray.functions.join import hash_join

    n_raw = docs.count()
    nn = docs.map_batches(_nonnull_text, batch_format="pandas")
    n_nonnull = nn.count()

    exact = exact_dedup(docs).select_columns(["doc_id"])
    n_exact = exact.count()

    victims = (
        clusters if clusters is not None else neardup_minhash(docs, config)
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b.loc[b["cluster_id"] != b["doc_id"], "doc_id"]
                .astype("int64"),
                "__victim": np.int64(1),
            }
        ),
        batch_format="pandas",
    )
    survivors = hash_join(
        exact, victims, on="doc_id", how="left", n_buckets=n_buckets
    ).map_batches(
        lambda b: b.loc[b["__victim"].isna(), ["doc_id"]].astype(
            {"doc_id": "int64"}
        ),
        batch_format="pandas",
    )
    n_after = survivors.count()

    quality = hash_join(
        survivors,
        docs.select_columns(["doc_id", "n_chars"]).map_batches(
            lambda b: b.astype({"doc_id": "int64"}), batch_format="pandas"
        ),
        on="doc_id",
        n_buckets=n_buckets,
    ).map_batches(
        lambda b: b[b["n_chars"] >= min_chars], batch_format="pandas"
    )
    n_quality = quality.count()

    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "n_raw": pd.array([n_raw], dtype="int64"),
                "n_nonnull": pd.array([n_nonnull], dtype="int64"),
                "n_exact_unique": pd.array([n_exact], dtype="int64"),
                "n_after_neardup": pd.array([n_after], dtype="int64"),
                "n_quality": pd.array([n_quality], dtype="int64"),
            }
        )
    )


def curation_funnel_sql(
    config: PipelineConfig = DEFAULT_CONFIG, min_chars: int = 100
) -> str:
    clusters = minhash_clusters_sql(config)
    return f"""
WITH cl AS MATERIALIZED ({clusters}),
nn AS (SELECT * FROM documents WHERE text IS NOT NULL),
ex AS (SELECT MIN(doc_id) AS doc_id FROM nn GROUP BY text),
victims AS (SELECT doc_id FROM cl WHERE cluster_id <> doc_id),
nd AS (SELECT doc_id FROM ex ANTI JOIN victims USING (doc_id)),
q AS (SELECT nd.doc_id FROM nd JOIN documents d USING (doc_id)
      WHERE d.n_chars >= {min_chars})
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_raw,
       CAST((SELECT COUNT(*) FROM nn) AS BIGINT) AS n_nonnull,
       CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_exact_unique,
       CAST((SELECT COUNT(*) FROM nd) AS BIGINT) AS n_after_neardup,
       CAST((SELECT COUNT(*) FROM q) AS BIGINT) AS n_quality
"""


# --- exact substring (char-gram) duplication ---------------------------------

def _distinct_char_grams(batch: pd.DataFrame, k: int) -> pd.DataFrame:
    """Distinct char-k-grams per document: (doc_id, gram) pairs.

    Vectorized per document: the text's byte buffer is windowed with
    ``sliding_window_view`` (zero-copy), viewed as fixed-width ``S{k}``
    byte-strings and uniqued — no per-position Python slicing. Byte grams
    equal character grams for ASCII corpora (this corpus is ASCII; the SQL
    oracle's ``substr`` is character-based, so parity assumes ASCII and the
    docstring of each consumer states it). Documents shorter than k emit
    nothing — matching the oracle's ``len(text) >= k`` predicate.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    batch = _nonnull_text(batch)
    ids: list[np.ndarray] = []
    grams: list[np.ndarray] = []
    for doc_id, t in zip(batch["doc_id"].to_numpy(), batch["text"].to_numpy()):
        b = np.frombuffer(str(t).encode("utf-8"), dtype=np.uint8)
        if b.size < k:
            continue
        w = np.ascontiguousarray(sliding_window_view(b, k)).view(f"S{k}").ravel()
        u = np.unique(w)
        ids.append(np.full(u.size, doc_id, dtype="int64"))
        grams.append(u)
    if not ids:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "gram": pd.Series([], dtype="object")}
        )
    return pd.DataFrame(
        {
            "doc_id": np.concatenate(ids),
            "gram": pd.Series(np.concatenate(grams)).str.decode("ascii"),
        }
    )


def _gram_pairs(docs: ray.data.Dataset, k: int) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        lambda b: _distinct_char_grams(b, k),
        batch_format="pandas",
        batch_size=1024,
    )


def _gram_doc_counts(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """(gram, n_docs) — documents containing each gram. Whale-safe: a gram
    appearing in every document (boilerplate) splits across salt tasks."""
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # (doc_id, gram) rows are globally distinct (one row per doc per
        # gram), so a per-salt size() is a partial doc count.
        return b.groupby("gram", sort=False).size().reset_index(name="n_docs")

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("gram", sort=False)["n_docs"].sum().reset_index()
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    return salted_group_apply(pairs, ["gram"], partial_fn=partial, merge_fn=merge)


def _gram_doc_counts_hash64(
    docs: ray.data.Dataset, k: int, min_docs: int
) -> ray.data.Dataset:
    """(gram, n_docs) via the 8-byte-hash exchange + gated exact second pass
    (see ``duplicated_grams(exchange="hash64")``). Counts below min_docs may
    be absent (the gate drops them) — callers filter on min_docs anyway."""
    from tcx2graph_jl_ray.functions.digest import md5_low64
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    def hash_pairs(b: pd.DataFrame) -> pd.DataFrame:
        g = _distinct_char_grams(b, k)
        return pd.DataFrame(
            {"doc_id": g["doc_id"],
             "h": md5_low64(g["gram"]).astype("uint64")}
        )

    pairs_h = docs.select_columns(["doc_id", "text"]).map_batches(
        hash_pairs, batch_format="pandas", batch_size=1024
    )

    def partial_h(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("h", sort=False).size().reset_index(name="n_docs")

    def merge_h(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("h", sort=False)["n_docs"].sum().reset_index()
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    counts_h = salted_group_apply(
        pairs_h, ["h"], partial_fn=partial_h, merge_fn=merge_h
    )
    surv = counts_h.map_batches(
        lambda b: b.loc[b["n_docs"] >= min_docs, ["h"]], batch_format="pandas"
    ).to_pandas()
    # survivor set = duplicated-gram population: the bounded gate (CMS
    # heavy-hitters discipline); broadcast once as a sorted probe array
    surv_arr = (
        np.sort(surv["h"].to_numpy(dtype=np.uint64))
        if len(surv)
        else np.array([], dtype=np.uint64)
    )
    surv_ref = ray.put(surv_arr)

    class _Gate:
        def __init__(self, ref):
            self.surv = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            g = _distinct_char_grams(b, k)
            if not len(g) or not self.surv.size:
                return pd.DataFrame(
                    {"gram": pd.Series([], dtype="object"),
                     "n_docs": pd.Series([], dtype="int64")}
                )
            h = md5_low64(g["gram"]).astype("uint64")
            idx = np.searchsorted(self.surv, h)
            idx[idx == self.surv.size] = 0
            keep = g.loc[self.surv[idx] == h]
            return (
                keep.groupby("gram", sort=False)
                .size()
                .reset_index(name="n_docs")
            )

    survivors = docs.select_columns(["doc_id", "text"]).map_batches(
        _Gate, fn_constructor_args=(surv_ref,), batch_format="pandas",
        batch_size=1024, concurrency=(1, 8),
    )

    def merge_g(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("gram", sort=False)["n_docs"].sum().reset_index()
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    return salted_group_apply(
        survivors, ["gram"], partial_fn=merge_g, merge_fn=merge_g
    )


def duplicated_grams(
    docs: ray.data.Dataset,
    k: int = 32,
    min_docs: int = 2,
    top: int = 100,
    exchange: str = "string",
) -> ray.data.Dataset:
    """Exact duplicated substrings: the k-char grams shared by >= min_docs
    documents, ranked by document frequency — the detection half of
    suffix-style exact-substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"; the reference's
    unique-grid-cell duplication surface src/GraphUtils.jl:46-88 recast at
    substring granularity).

    Scale shape: per-doc distinct grams are extracted vectorized (one
    windowed view + unique per doc, no Python position loop), the doc-count
    reduce is SALTED by gram so boilerplate grams that occur in most of the
    corpus cannot sink one task, and top-k is two-phase (per-block head-k,
    then one bounded driver merge of <= top rows per block).

    ``exchange`` picks the corpus-scale layout:

    - ``"string"`` (default): the k-byte gram itself is the shuffle key —
      one pass, the oracle-checked path.
    - ``"hash64"``: the 100 TB path. Pass 1 shuffles only the 8-byte
      ``md5_low64`` gram hash (k/8× less exchange payload) and counts docs
      per hash; the >= min_docs survivor hashes broadcast back (bounded by
      the duplicated-gram population — the same gate discipline as the CMS
      heavy hitters), and pass 2 re-derives grams, keeps survivors via a
      sorted-array membership probe, and counts doc frequency by the gram
      STRING — so hash collisions can only admit extra candidates into the
      exact second pass, never corrupt a count. Output is identical to
      ``"string"`` (asserted in tests/test_substring_entropy.py).

    Output: gram, n_docs — ordered (n_docs desc, gram asc), <= top rows.
    """
    if exchange == "hash64":
        counts = _gram_doc_counts_hash64(docs, k, min_docs)
    else:
        counts = _gram_doc_counts(_gram_pairs(docs, k))
    dup = counts.map_batches(
        lambda b: b[b["n_docs"] >= min_docs], batch_format="pandas"
    )

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["n_docs", "gram"], ascending=[False, True]
        ).head(top)

    cand = dup.map_batches(local_top, batch_format="pandas").to_pandas()
    if not len(cand):
        # typed empty PANDAS frame (house pattern, heavy_hitter_words):
        # Ray drops empty blocks at to_pandas(), losing the (gram, n_docs)
        # schema the driver contract checks — and the collected frame may
        # arrive column-less, so rebuild it rather than sort it
        return pd.DataFrame(
            {"gram": pd.Series([], dtype="object"),
             "n_docs": pd.Series([], dtype="int64")}
        )
    out = (
        cand.sort_values(["n_docs", "gram"], ascending=[False, True])
        .head(top)
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return ray.data.from_pandas(out)


DUP_GRAMS_SQL_TEMPLATE = """
WITH g AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {k}) AS gram
  FROM documents, unnest(range(1, len(text) - {k} + 2)) AS t(i)
  WHERE text IS NOT NULL AND len(text) >= {k}
),
c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_docs FROM g GROUP BY gram)
SELECT gram, n_docs FROM c
WHERE n_docs >= {min_docs}
ORDER BY n_docs DESC, gram
LIMIT {top}
"""


def doc_dup_ratio(
    docs: ray.data.Dataset, k: int = 32, min_docs: int = 2
) -> ray.data.Dataset:
    """Per-document duplicated-content fraction: of each document's distinct
    k-char grams, the share that also appear in >= min_docs documents
    (itself included) — the per-document drop/trim signal of exact-substring
    dedup (Lee et al. 2021 report dup tokens/doc the same way).

    Scale shape: reuses the salted gram doc-count reduce, then joins counts
    back to the (doc_id, gram) pairs with the co-partitioned ``hash_join``
    (both sides scale with the corpus — never a broadcast), and reduces per
    doc with a second salted aggregate. dup_frac is ONE division of two
    exact int64 counts, rounded once — no summation-order exposure.

    Output: doc_id, n_grams, n_dup_grams, dup_frac (round 6); documents
    shorter than k are absent, matching the oracle's len >= k predicate.
    """
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    pairs = _gram_pairs(docs, k).materialize()  # consumed by 2 branches
    counts = _gram_doc_counts(pairs)
    joined = hash_join(pairs, counts, on="gram", how="inner")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(dup=(b["n_docs"] >= min_docs).astype("int64"))
        return (
            b.groupby("doc_id", sort=False)
            .agg(n_grams=("gram", "size"), n_dup_grams=("dup", "sum"))
            .reset_index()
        )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.groupby("doc_id", sort=False)
            .agg(n_grams=("n_grams", "sum"), n_dup_grams=("n_dup_grams", "sum"))
            .reset_index()
        )
        # doc_id passes through hash_join's union (the counts side carries
        # it as an all-null extension Int64 placeholder) — re-emit plain
        # int64: it is never null in this output, and extension dtypes are
        # a driver-hash hazard (r4 events_asof_join class)
        g["doc_id"] = g["doc_id"].astype("int64")
        g["n_grams"] = g["n_grams"].astype("int64")
        g["n_dup_grams"] = g["n_dup_grams"].astype("int64")
        g["dup_frac"] = np.round(
            g["n_dup_grams"].to_numpy(dtype="float64")
            / g["n_grams"].to_numpy(dtype="float64"),
            6,
        )
        return g

    return salted_group_apply(
        joined, ["doc_id"], partial_fn=partial, merge_fn=merge
    )


DOC_DUP_RATIO_SQL_TEMPLATE = """
WITH g AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {k}) AS gram
  FROM documents, unnest(range(1, len(text) - {k} + 2)) AS t(i)
  WHERE text IS NOT NULL AND len(text) >= {k}
),
c AS (SELECT gram, COUNT(*) AS n_docs FROM g GROUP BY gram)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN c.n_docs >= {min_docs} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       ROUND(CAST(SUM(CASE WHEN c.n_docs >= {min_docs} THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS dup_frac
FROM g JOIN c USING (gram)
GROUP BY g.doc_id
"""


def dup_span_coverage(
    docs: ray.data.Dataset, k: int = 32, min_docs: int = 2
) -> ray.data.Dataset:
    """Per-document duplicated-CHARACTER coverage: how many of a document's
    characters sit under at least one k-gram that also appears in
    >= min_docs documents — the span metric exact-substring dedup actually
    trims on (Lee et al. 2021 cut the covered spans, not whole docs).
    Completes the substring triptych: corpus signal (``duplicated_grams``)
    -> per-doc gram ratio (``doc_dup_ratio``) -> per-doc char coverage.

    Semantics: covered chars = |union of [pos, pos+k) over every occurrence
    of a duplicated gram| — computed as a sorted-position interval merge
    (sum of min(gap, k) + k per doc), which equals the oracle's
    COUNT(DISTINCT position) exactly in integers. Scale shape: the
    all-positions (doc_id, pos, gram) stream joins the duplicated-gram set
    through the co-partitioned ``hash_join`` (the dup set is unbounded at
    corpus scale — never broadcast); the interval merge runs per doc inside
    one hash bucket (a doc's positions are bounded by its text length, the
    row-size bound that already holds everywhere); docs with no duplicated
    gram re-enter through a left join against the per-doc length table.

    Output: doc_id, n_chars, n_dup_chars, dup_char_frac (round 6, one
    exact-int division); documents shorter than k are absent.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def pos_grams(batch: pd.DataFrame) -> pd.DataFrame:
        from numpy.lib.stride_tricks import sliding_window_view

        batch = _nonnull_text(batch)
        ids, poss, grams = [], [], []
        for doc_id, t in zip(
            batch["doc_id"].to_numpy(), batch["text"].to_numpy()
        ):
            b = np.frombuffer(str(t).encode("utf-8"), dtype=np.uint8)
            if b.size < k:
                continue
            w = np.ascontiguousarray(sliding_window_view(b, k)).view(
                f"S{k}"
            ).ravel()
            ids.append(np.full(w.size, doc_id, dtype="int64"))
            poss.append(np.arange(1, w.size + 1, dtype="int64"))
            grams.append(w)
        if not ids:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "pos": pd.Series([], dtype="int64"),
                 "gram": pd.Series([], dtype="object")}
            )
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(ids),
                "pos": np.concatenate(poss),
                "gram": pd.Series(np.concatenate(grams)).str.decode("ascii"),
            }
        )

    positions = docs.select_columns(["doc_id", "text"]).map_batches(
        pos_grams, batch_format="pandas", batch_size=1024
    )
    counts = _gram_doc_counts(_gram_pairs(docs, k))
    dup = counts.map_batches(
        lambda b: b.loc[b["n_docs"] >= min_docs, ["gram"]],
        batch_format="pandas",
    )
    hit = hash_join(positions, dup, on="gram", how="inner")

    def cover(bucket: pd.DataFrame) -> pd.DataFrame:
        outs_id, outs_n = [], []
        for doc_id, g in bucket.groupby("doc_id", sort=False):
            p = np.sort(g["pos"].to_numpy(dtype=np.int64))
            gaps = np.diff(p)
            outs_id.append(int(doc_id))
            outs_n.append(int(np.minimum(gaps, k).sum()) + k)
        return pd.DataFrame(
            {"doc_id": pd.array(outs_id, dtype="int64"),
             "n_dup_chars": pd.array(outs_n, dtype="int64")}
        )

    covered = bucketed_group_apply(hit, ["doc_id"], cover)

    def doc_lens(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        lens = batch["text"].str.len().astype("int64")
        keep = lens >= k
        return pd.DataFrame(
            {"doc_id": batch.loc[keep, "doc_id"].astype("int64"),
             "n_chars": lens[keep]}
        )

    base = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_lens, batch_format="pandas"
    )
    joined = hash_join(base, covered, on="doc_id", how="left")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n_dup = b["n_dup_chars"].fillna(0).to_numpy(dtype="int64")
        n_chars = b["n_chars"].to_numpy(dtype="int64")
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_chars": n_chars,
                "n_dup_chars": n_dup,
                "dup_char_frac": np.round(
                    n_dup.astype("float64") / n_chars.astype("float64"), 6
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


DUP_SPAN_COVERAGE_SQL_TEMPLATE = """
WITH g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         substr(text, CAST(i AS INT), {k}) AS gram
  FROM documents, unnest(range(1, len(text) - {k} + 2)) AS t(i)
  WHERE text IS NOT NULL AND len(text) >= {k}
),
c AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram),
dup AS (SELECT gram FROM c WHERE nd >= {min_docs}),
cov AS (
  SELECT DISTINCT g.doc_id, g.i + CAST(o.off AS BIGINT) AS pos
  FROM g JOIN dup USING (gram), unnest(range(0, {k})) AS o(off)
),
base AS (
  SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars FROM documents
  WHERE text IS NOT NULL AND len(text) >= {k}
)
SELECT b.doc_id, b.n_chars,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_dup_chars,
       ROUND(CAST(COALESCE(cnt.n, 0) AS DOUBLE) / b.n_chars, 6)
         AS dup_char_frac
FROM base b
LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY doc_id) cnt
  ON b.doc_id = cnt.doc_id
"""


# --- edit-distance similarity join ------------------------------------------

def edit_distance_pairs(
    strings: ray.data.Dataset,
    col: str = "surf",
    k: int = 2,
    q: int = 3,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact edit-distance similarity self-join: all unordered pairs of
    DISTINCT values of ``col`` with Levenshtein distance in ``1..k`` — the
    Ed-Join formulation (Xiao, Wang, Lin, "Ed-Join: an efficient algorithm
    for similarity joins with edit distance constraints", VLDB'08), the
    complementary typo-level verifier to the token-overlap canonicalizer
    (canonicalize.py) and the set-similarity PPJoin (ngram_jaccard_join).

    Candidate filter (lossless): one edit alters at most ``q`` distinct
    positional ``q``-grams, so ed(a,b) <= k implies
    |grams(a) ∩ grams(b)| >= max(|grams(a)|, |grams(b)|) - q·k; by the
    standard prefix-filter pigeonhole, the first ``q·k + 1`` grams of each
    side under one global (df asc, gram asc) rarity order must intersect.
    Hot stop-grams therefore almost never block anything — they rank last.
    Degenerate-short strings (< q·k + 1 distinct grams) can lose their whole
    gram set to k edits, so every string with < 2·q·k + 1 distinct grams
    ALSO enters one shared SHORT block (a partner of a short string is
    itself short: |grams| grows by <= q per edit), keeping the filter
    lossless; that block is all-pairs but bounded by the near-empty-string
    vocabulary.

    Verify: candidate pairs shuffle once by (a, b) — the same bucketed
    exchange dedups multi-gram duplicates — then the banded-DP kernel
    (functions/editdist.py) scores each bucket's pairs in O(L·k) vectorized
    numpy; |len diff| <= k pre-filters.

    Output: surf_a, surf_b, dist (surf_a < surf_b, 1 <= dist <= k).

    Reference analogue: the candidate/verify split of overlapping-segment
    detection (src/OverlappingSegmentsUtils.jl:173-209) with the rarity-
    ordered gram prefix as the blocking key.
    """
    from tcx2graph_jl_ray.functions.editdist import banded_edit_distances
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    prefix_len = q * k + 1
    short_cut = 2 * q * k + 1
    short_key = "\x00S"  # length 2 != q: can never collide with a real gram

    def distinct_vals(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates()

    vals = bucketed_group_apply(
        strings.select_columns([col])
        .map_batches(
            lambda b: b[b[col].notna() & (b[col] != "")]
            .rename(columns={col: "s"})
            .drop_duplicates(),
            batch_format="pandas",
            batch_size=32768,
        ),
        ["s"],
        distinct_vals,
        n_buckets=n_buckets,
    ).materialize()

    def _typed_empty() -> pd.DataFrame:
        # typed empty PANDAS frame, deliberately not a Dataset: Ray drops
        # empty blocks at to_pandas()/schema() (same convention as
        # text.py heavy_hitter_words)
        return pd.DataFrame({
            "surf_a": pd.Series([], dtype="object"),
            "surf_b": pd.Series([], dtype="object"),
            "dist": pd.Series([], dtype="int64"),
        })

    if vals.count() == 0:
        return _typed_empty()

    def gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out_s, out_g, out_n = [], [], []
        for s in batch["s"].to_numpy():
            grams = {s[i : i + q] for i in range(len(s) - q + 1)}
            ng = len(grams)
            for g in grams:
                out_s.append(s)
                out_g.append(g)
                out_n.append(ng)
            if ng < short_cut:
                out_s.append(s)
                out_g.append(short_key)
                out_n.append(ng)
        return pd.DataFrame({
            "s": pd.Series(out_s, dtype="object"),
            "gram": pd.Series(out_g, dtype="object"),
            "n": pd.Series(out_n, dtype="int64"),
        })

    grams = vals.map_batches(
        gram_rows, batch_format="pandas", batch_size=8192
    ).materialize()

    def df_count(bucket: pd.DataFrame) -> pd.DataFrame:
        c = bucket.groupby("gram", sort=False).size()
        return pd.DataFrame({"gram": c.index, "df": c.to_numpy().astype("int64")})

    dfs = bucketed_group_apply(
        grams.select_columns(["gram"]), ["gram"], df_count, n_buckets=n_buckets
    )
    withdf = hash_join(grams, dfs, on="gram", n_buckets=n_buckets)

    def prefix(bucket: pd.DataFrame) -> pd.DataFrame:
        # SHORT rows bypass prefix selection — they must always block
        is_short = bucket["gram"] == short_key
        b = bucket[~is_short].sort_values(
            ["s", "df", "gram"], kind="mergesort"
        )
        pos = b.groupby("s", sort=False).cumcount().to_numpy()
        kept = b[pos < prefix_len]
        return pd.concat([kept, bucket[is_short]], ignore_index=True)[
            ["s", "gram"]
        ]

    pref = bucketed_group_apply(withdf, ["s"], prefix, n_buckets=n_buckets)

    def pairs_per_gram(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in bucket.groupby("gram", sort=False):
            if len(g) < 2:
                continue
            ss = np.sort(g["s"].unique())
            ii, jj = np.triu_indices(len(ss), k=1)
            out_a.append(ss[ii])
            out_b.append(ss[jj])
        if not out_a:
            return pd.DataFrame({
                "surf_a": pd.Series([], dtype="object"),
                "surf_b": pd.Series([], dtype="object"),
            })
        return pd.DataFrame({
            "surf_a": np.concatenate(out_a), "surf_b": np.concatenate(out_b)
        })

    cand = bucketed_group_apply(
        pref, ["gram"], pairs_per_gram, n_buckets=n_buckets
    )

    def verify(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates()
        d = banded_edit_distances(
            b["surf_a"].tolist(), b["surf_b"].tolist(), k
        )
        keep = d <= k
        return pd.DataFrame({
            "surf_a": b["surf_a"].to_numpy()[keep],
            "surf_b": b["surf_b"].to_numpy()[keep],
            "dist": d[keep].astype("int64"),
        })

    out = bucketed_group_apply(
        cand, ["surf_a", "surf_b"], verify, n_buckets=n_buckets
    ).materialize()  # pair list: output-sized, far below the corpus
    if out.count() == 0:
        return _typed_empty()
    return out


EDIT_PAIRS_SQL_TEMPLATE = """
WITH src AS ({source}),
s AS (
  SELECT DISTINCT {col} AS surf FROM src
  WHERE {col} IS NOT NULL AND {col} != ''
)
SELECT a.surf AS surf_a, b.surf AS surf_b,
       CAST(levenshtein(a.surf, b.surf) AS BIGINT) AS dist
FROM s a JOIN s b ON a.surf < b.surf
WHERE abs(length(a.surf) - length(b.surf)) <= {k}
  AND levenshtein(a.surf, b.surf) <= {k}
"""


# --- sorted-neighborhood blocking (SNM) --------------------------------------

def sorted_neighborhood_pairs(
    docs: ray.data.Dataset,
    window: int = 6,
    threshold: float = 0.9,
    key_len: int = 16,
    bucket_rows: int = 8192,
) -> ray.data.Dataset:
    """Sorted-neighborhood dedup blocking (Hernandez-Stolfo merge/purge): sort
    the corpus by a normalized blocking key, slide a fixed ``window`` over the
    GLOBAL sorted order, verify every in-window pair with distinct-byte
    Jaccard (DuckDB ``jaccard`` semantics — the same bit-exact kernel as
    ``charset_similarity_join``). The sort-based counterpart of the hash/gram
    blocking elsewhere in this module (reference's grid blocking,
    src/GraphUtils.jl:46-88, re-expressed as the classic sort paradigm).

    Distributed shape (the 100 TB story):

    1. **Key + sort.** key = first ``key_len`` chars of lowercased
       alphanumeric-only text (pure ASCII by construction, so Ray, pandas and
       DuckDB agree on its order). ``ds.sort([key, doc_id])`` is Ray's
       range-partitioned distributed sort; (key, doc_id) is a unique total
       order, so block key-ranges are disjoint.
    2. **Global rank, two-phase.** Per sorted block: (first-row key,
       first-row doc_id, row count) — ONE summary row per block. The driver
       prefix-sums block counts in key order (bounded by block count, not
       rows) and broadcasts first-row -> offset; each block then ranks
       locally as offset + arange. The same sorted-block-offset pattern as
       ``cumulative_tokens_chunked``.
    3. **Ghost-row windowing.** rank r goes to bucket r // bucket_rows, plus
       a ghost copy to the next bucket when it sits within window-1 rows of
       the bucket edge — every in-window pair is co-located in the (unique)
       bucket where its HIGHER rank is native. No all-pairs, no driver rows.
    4. **Verify.** Per bucket: ranks are consecutive, so in-window pairs are
       the d-shifted arrays for d = 1..window-1; similarity is the 256-bit
       byte-mask popcount kernel (vectorized, no per-pair set ops).

    Output: a, b (doc_ids, a = lower rank), rank_dist, sim.
    """
    import pyarrow as pa

    from tcx2graph_jl_ray.functions.arrowutil import with_schema

    w = int(window)
    B = int(bucket_rows)
    if w < 2:
        raise ValueError("window must be >= 2")
    if B <= w:
        raise ValueError("bucket_rows must exceed window")

    import re as _re

    _strip = _re.compile(r"[^a-z0-9]")

    _KEY_SCHEMA = pa.schema([("doc_id", pa.int64()), ("key", pa.string())])

    def keyed(batch: pd.DataFrame) -> pa.Table:
        b = _nonnull_text(batch)
        b = b[b["text"].str.len() > 0]
        # Arrow out with a pinned schema: an all-filtered block must keep its
        # columns through the sort (pandas empty-block degradation drops them)
        key = (
            b["text"].str.lower()
            .str.replace(_strip, "", regex=True)
            .str.slice(0, key_len)
        )
        return pa.Table.from_pydict(
            {
                "doc_id": b["doc_id"].astype("int64").to_numpy(),
                "key": key.to_numpy(),
            },
            schema=_KEY_SCHEMA,
        )

    keys = docs.select_columns(["doc_id", "text"]).map_batches(
        keyed, batch_format="pandas"
    )
    # materialize the sorted (key, doc_id) ribbon ONCE so both rank passes
    # see identical blocks; 2 narrow columns, never the texts
    skeys = keys.sort(["key", "doc_id"]).materialize()

    def block_summary(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"key": pd.Series([], dtype="object"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"key": [batch["key"].iloc[0]],
             "doc_id": [int(batch["doc_id"].iloc[0])],
             "n": [len(batch)]}
        )

    # batch_size=None -> one batch per materialized block; the summary table
    # is one row per BLOCK (driver-bounded by cluster block count, not data)
    summ = skeys.map_batches(
        block_summary, batch_format="pandas", batch_size=None
    ).to_pandas()
    if not len(summ):
        # empty corpus: keep the output contract (typed empty Dataset)
        return ray.data.from_arrow(
            pa.schema(
                [("a", pa.int64()), ("b", pa.int64()),
                 ("rank_dist", pa.int64()), ("sim", pa.float64())]
            ).empty_table()
        )
    summ = summ.sort_values(["key", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )
    offsets = (summ["n"].cumsum() - summ["n"]).astype("int64")
    off_by_first = {
        (k, int(d)): int(o)
        for k, d, o in zip(summ["key"], summ["doc_id"], offsets)
    }

    def rank_block(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "rank": pd.Series([], dtype="int64")}
            )
        off = off_by_first[(batch["key"].iloc[0], int(batch["doc_id"].iloc[0]))]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].astype("int64"),
             "rank": (off + np.arange(len(batch))).astype("int64")}
        )

    ranked = skeys.map_batches(
        rank_block, batch_format="pandas", batch_size=None
    )

    from tcx2graph_jl_ray.functions.join import hash_join

    def texts_of(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        b = b[b["text"].str.len() > 0]
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"), "text": b["text"]}
        )

    with_text = hash_join(
        ranked,
        docs.select_columns(["doc_id", "text"]).map_batches(
            texts_of, batch_format="pandas"
        ),
        on="doc_id",
    )

    def to_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        r = batch["rank"].to_numpy()
        native = batch.assign(bucket=(r // B).astype("int64"))
        ghost_mask = (r % B) >= (B - (w - 1))
        ghosts = batch[ghost_mask].assign(
            bucket=(r[ghost_mask] // B + 1).astype("int64")
        )
        return pd.concat([native, ghosts], ignore_index=True)

    bucketed = with_text.map_batches(to_buckets, batch_format="pandas")

    EMPTY = pd.DataFrame(
        {"a": pd.Series([], dtype="int64"),
         "b": pd.Series([], dtype="int64"),
         "rank_dist": pd.Series([], dtype="int64"),
         "sim": pd.Series([], dtype="float64")}
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        g = g.sort_values("rank", kind="mergesort")
        n = len(g)
        if n < 2:
            return EMPTY
        ranks = g["rank"].to_numpy()
        ids = g["doc_id"].to_numpy().astype("int64")
        # byte masks once per bucket (same exact-DuckDB-jaccard kernel as
        # charset_similarity_join: distinct UTF-8 bytes, 256-bit mask)
        masks = np.zeros((n, 4), dtype=np.uint64)
        for i, t in enumerate(g["text"].to_numpy()):
            for o in set(t.encode()):
                masks[i, o >> 6] |= np.uint64(1) << np.uint64(o & 63)
        counts = np.unpackbits(masks.view(np.uint8), axis=1).sum(axis=1)

        out = []
        for d in range(1, w):
            if n <= d:
                break
            ii = np.arange(0, n - d)
            jj = ii + d
            # ranks in a bucket (incl. ghosts) are consecutive, so the
            # d-shift IS rank distance d. Emit a pair only where the HIGHER
            # rank is native: a boundary pair co-locates solely in the next
            # bucket (ghost lower + native higher), and a pair whose both
            # ends ghost forward would otherwise double-emit.
            ok = (ranks[jj] - ranks[ii] == d) & (ranks[jj] // B == bucket)
            ii, jj = ii[ok], jj[ok]
            if not len(ii):
                continue
            inter = sum(
                np.unpackbits(
                    np.ascontiguousarray(masks[ii, wd] & masks[jj, wd])
                    .view(np.uint8).reshape(len(ii), -1),
                    axis=1,
                ).sum(axis=1)
                for wd in range(4)
            )
            union = counts[ii] + counts[jj] - inter
            sim = inter / union
            keep = sim >= threshold
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {"a": ids[ii[keep]], "b": ids[jj[keep]],
                         "rank_dist": np.full(int(keep.sum()), d, dtype="int64"),
                         "sim": sim[keep]}
                    )
                )
        return pd.concat(out, ignore_index=True) if out else EMPTY

    out = bucketed.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    return with_schema(
        out,
        [("a", pa.int64()), ("b", pa.int64()),
         ("rank_dist", pa.int64()), ("sim", pa.float64())],
    )


SORTED_NEIGHBORHOOD_SQL_TEMPLATE = """
WITH k AS (
  SELECT doc_id, text,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, {key_len}) AS key
  FROM documents
  WHERE text IS NOT NULL AND text <> ''
),
r AS (
  SELECT doc_id, text, ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rn FROM k
)
SELECT CAST(x.doc_id AS BIGINT) AS a,
       CAST(y.doc_id AS BIGINT) AS b,
       CAST(y.rn - x.rn AS BIGINT) AS rank_dist,
       jaccard(x.text, y.text) AS sim
FROM r x JOIN r y ON y.rn - x.rn BETWEEN 1 AND {wm1}
WHERE jaccard(x.text, y.text) >= {threshold}
"""


# --- set-containment join -----------------------------------------------------

def containment_pairs(
    docs: ray.data.Dataset,
    min_words: int = 1,
    max_posting: int = 100_000,
) -> ray.data.Dataset:
    """Set-containment join: all ordered pairs (sub, sup) of distinct docs
    where sub's distinct word set is contained in sup's — the "drop subsumed
    documents" dedup primitive (reference's range-overlap dedup,
    src/OverlappingSegmentsUtils.jl:229-240, as subset instead of interval
    containment). Tokenization matches the corpus convention: lowercase,
    split on single spaces, empty tokens dropped.

    Fully relational distributed shape — no per-pair Python set ops and no
    all-pairs stage:

    1. **Distinct words + df.** (doc_id, word) distinct rows (each doc lives
       in one input row, so per-doc dedup is in-batch); document frequency
       df(word) by bucketed count.
    2. **Rarest-word anchoring.** Each doc anchors at its min-df word
       (lexicographic tie-break). If sub ⊆ sup, then sup contains sub's
       rarest word, so the pair co-locates in that ONE word bucket: postings
       of w × anchors of w is a complete, duplicate-free candidate set. A
       word with a posting list over ``max_posting`` is skipped with a
       warning (the non-discriminative-block cap; lossy ONLY if it fires).
    3. **Intersection count, two exchanges.** Candidates (a, b) join a's
       word rows (bucketed on a), re-key by (b, word), meet sup's word rows
       there — a hit row per shared word; count hits per (a, b).
       Containment iff hits == nw(a). Exact counting, no sketches.

    Output: sub_id, sup_id, n_sub, n_sup (distinct-word counts).
    """
    import logging

    import pyarrow as pa

    from tcx2graph_jl_ray.functions.arrowutil import with_schema
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def distinct_words(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        s = b.set_index(b["doc_id"].astype("int64"))["text"].str.lower().str.split(" ").explode()
        s = s[s.notna() & (s != "")]
        out = s.reset_index()
        out.columns = ["doc_id", "word"]
        out = out.drop_duplicates()
        nw = out.groupby("doc_id", sort=False)["word"].transform("size")
        out["nw"] = nw.astype("int64")
        return out[nw >= min_words].reset_index(drop=True)

    # the distinct-word table fans out to five consumers (df, anchors,
    # postings, both verify sides); pin it once instead of re-tokenizing per
    # consumer. Token-scale, so the object store may spill — at corpus scale
    # this is the staged-parquet-sink candidate (pipelines/kg.py discipline).
    words = docs.select_columns(["doc_id", "text"]).map_batches(
        distinct_words, batch_format="pandas"
    ).materialize()

    def df_count(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("word", sort=False).size()
        return pd.DataFrame(
            {"word": g.index.to_numpy(), "df": g.to_numpy().astype("int64")}
        )

    dfreq = bucketed_group_apply(
        words.select_columns(["word"]), ["word"], df_count
    )

    with_df = hash_join(words, dfreq, on="word")

    def rarest(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["doc_id", "df", "word"], kind="mergesort")
        first = g.drop_duplicates("doc_id")
        return pd.DataFrame(
            {"word": first["word"],
             "doc_id": first["doc_id"].astype("int64"),
             "nw": first["nw"].astype("int64"),
             "role": np.zeros(len(first), dtype="int64")}
        )

    anchors = bucketed_group_apply(with_df, ["doc_id"], rarest)

    def as_posting(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"word": batch["word"],
             "doc_id": batch["doc_id"].astype("int64"),
             "nw": batch["nw"].astype("int64"),
             "role": np.ones(len(batch), dtype="int64")}
        )

    postings = words.map_batches(as_posting, batch_format="pandas")

    CAND_EMPTY = pd.DataFrame(
        {"a": pd.Series([], dtype="int64"),
         "b": pd.Series([], dtype="int64"),
         "nw_a": pd.Series([], dtype="int64")}
    )

    def pairs_in_word(bucket: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized equi-merge on word generates every (anchor x
        # posting) candidate in the bucket — no per-word Python loop. The
        # hot-word cap filters posting lists first (lossy ONLY if it fires).
        an = bucket[bucket["role"] == 0]
        po = bucket[bucket["role"] == 1]
        if not len(an) or not len(po):
            return CAND_EMPTY
        sizes = po.groupby("word", sort=False)["doc_id"].transform("size")
        hot = sizes > max_posting
        if hot.any():
            logging.getLogger(__name__).warning(
                "containment_pairs: skipping %d hot words "
                "(posting > max_posting=%d) — recall loss",
                po[hot]["word"].nunique(), max_posting,
            )
            po = po[~hot]
        c = an[["word", "doc_id", "nw"]].rename(
            columns={"doc_id": "a", "nw": "nw_a"}
        ).merge(
            po[["word", "doc_id", "nw"]].rename(
                columns={"doc_id": "b", "nw": "nw_b"}
            ),
            on="word",
        )
        c = c[(c["a"] != c["b"]) & (c["nw_a"] <= c["nw_b"])]
        if not len(c):
            return CAND_EMPTY
        return c[["a", "b", "nw_a"]].astype(
            {"a": "int64", "b": "int64", "nw_a": "int64"}
        )

    cands = bucketed_group_apply(
        anchors.union(postings), ["word"], pairs_in_word
    )

    # exchange 1: candidates meet sub's word rows on a
    a_words = words.map_batches(
        lambda b: pd.DataFrame(
            {"a": b["doc_id"].astype("int64"), "word": b["word"]}
        ),
        batch_format="pandas",
    )
    probe = hash_join(cands, a_words, on="a")  # (a, b, nw_a, word): one row per sub-word

    # exchange 2: re-key by (b, word); sup's word rows answer membership
    def as_probe(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["b"].astype("int64"),
             "word": batch["word"],
             "a": batch["a"].astype("int64"),
             "nw_a": batch["nw_a"].astype("int64")}
        )

    def as_member(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].astype("int64"),
             "word": batch["word"],
             "a": np.full(len(batch), -1, dtype="int64"),
             "nw_a": batch["nw"].astype("int64")}
        )

    tagged = probe.map_batches(as_probe, batch_format="pandas").union(
        words.map_batches(as_member, batch_format="pandas")
    )

    HIT_EMPTY = pd.DataFrame(
        {"a": pd.Series([], dtype="int64"),
         "b": pd.Series([], dtype="int64"),
         "nw_a": pd.Series([], dtype="int64"),
         "nw_b": pd.Series([], dtype="int64")}
    )

    def hits(bucket: pd.DataFrame) -> pd.DataFrame:
        # membership as ONE vectorized merge: probe rows match the (sup
        # doc, word) member rows — words are distinct per doc, so the merge
        # is 1:N, never a blow-up
        mem = bucket[bucket["a"] < 0][["doc_id", "word", "nw_a"]].rename(
            columns={"nw_a": "nw_b"}
        )
        pr = bucket[bucket["a"] >= 0]
        if not len(mem) or not len(pr):
            return HIT_EMPTY
        m = pr.merge(mem, on=["doc_id", "word"])
        if not len(m):
            return HIT_EMPTY
        return pd.DataFrame(
            {"a": m["a"].astype("int64"),
             "b": m["doc_id"].astype("int64"),
             "nw_a": m["nw_a"].astype("int64"),
             "nw_b": m["nw_b"].astype("int64")}
        )

    hit_rows = bucketed_group_apply(tagged, ["doc_id", "word"], hits)

    OUT_EMPTY = pd.DataFrame(
        {"sub_id": pd.Series([], dtype="int64"),
         "sup_id": pd.Series([], dtype="int64"),
         "n_sub": pd.Series([], dtype="int64"),
         "n_sup": pd.Series([], dtype="int64")}
    )

    def contained(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["a", "b", "nw_a", "nw_b"], sort=False).size()
        g = g[g.index.get_level_values("nw_a") == g.to_numpy()]
        if not len(g):
            return OUT_EMPTY
        idx = g.index.to_frame(index=False)
        return pd.DataFrame(
            {"sub_id": idx["a"].astype("int64"),
             "sup_id": idx["b"].astype("int64"),
             "n_sub": idx["nw_a"].astype("int64"),
             "n_sup": idx["nw_b"].astype("int64")}
        )

    out = bucketed_group_apply(hit_rows, ["a", "b"], contained)
    return with_schema(
        out,
        [("sub_id", pa.int64()), ("sup_id", pa.int64()),
         ("n_sub", pa.int64()), ("n_sup", pa.int64())],
    )


CONTAINMENT_SQL_TEMPLATE = """
WITH w AS (
  SELECT doc_id, list(DISTINCT word) AS ws, count(DISTINCT word) AS nw
  FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
    FROM documents WHERE text IS NOT NULL
  ) t
  WHERE word <> ''
  GROUP BY doc_id
  HAVING count(DISTINCT word) >= {min_words}
)
SELECT CAST(a.doc_id AS BIGINT) AS sub_id,
       CAST(b.doc_id AS BIGINT) AS sup_id,
       CAST(a.nw AS BIGINT) AS n_sub,
       CAST(b.nw AS BIGINT) AS n_sup
FROM w a JOIN w b
  ON a.doc_id <> b.doc_id AND a.nw <= b.nw AND list_has_all(b.ws, a.ws)
"""


# --- split leakage ------------------------------------------------------------

def split_leakage(
    pairs: ray.data.Dataset,
    splits: ray.data.Dataset,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Train/test contamination audit: near-duplicate pairs whose two docs
    landed in DIFFERENT splits — the leakage every eval pipeline must check
    before trusting a held-out score. Pure composition: verified near-dup
    pairs (``neardup_minhash_pairs``) x the deterministic hash split
    (``text.split_assign``), stitched by two co-partitioned ``hash_join``s
    (no broadcast of either side; a trillion-doc split table co-shuffles
    with the match-bounded pair list).

    Output: a, b (a < b), split_a, split_b (split_a <> split_b).
    """
    import pyarrow as pa

    from tcx2graph_jl_ray.functions.arrowutil import with_schema
    from tcx2graph_jl_ray.functions.join import hash_join

    j1 = hash_join(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {"a": b["a"].astype("int64"), "b": b["b"].astype("int64")}
            ),
            batch_format="pandas",
        ),
        splits.map_batches(
            lambda b: pd.DataFrame(
                {"a": b["doc_id"].astype("int64"),
                 "split_a": b["split"].astype("object")}
            ),
            batch_format="pandas",
        ),
        on="a",
        n_buckets=n_buckets,
    )
    j2 = hash_join(
        j1,
        splits.map_batches(
            lambda b: pd.DataFrame(
                {"b": b["doc_id"].astype("int64"),
                 "split_b": b["split"].astype("object")}
            ),
            batch_format="pandas",
        ),
        on="b",
        n_buckets=n_buckets,
    )

    def leak(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch[batch["split_a"] != batch["split_b"]]
        return pd.DataFrame(
            {"a": k["a"].astype("int64"), "b": k["b"].astype("int64"),
             "split_a": k["split_a"], "split_b": k["split_b"]}
        )

    return with_schema(
        j2.map_batches(leak, batch_format="pandas"),
        [("a", pa.int64()), ("b", pa.int64()),
         ("split_a", pa.string()), ("split_b", pa.string())],
    )


SPLIT_LEAKAGE_SQL_TEMPLATE = """
WITH p AS ({pairs}),
s AS ({splits})
SELECT CAST(p.a AS BIGINT) AS a, CAST(p.b AS BIGINT) AS b,
       sa.split AS split_a, sb.split AS split_b
FROM p
JOIN s sa ON sa.doc_id = p.a
JOIN s sb ON sb.doc_id = p.b
WHERE sa.split <> sb.split
"""


def edit_clusters(
    source: ray.data.Dataset, col: str = "norm", k: int = 2
) -> ray.data.Dataset:
    """Surface-form clusters within edit distance ``k``: connected
    components over the Ed-Join pair graph — the entity-resolution compose
    (typo/variant surfaces collapse to one cluster), fourth member of the
    clustering family (MinHash / SimHash / cosine / EDIT). Surfaces similar
    to nothing are absent, like the other three.

    Output: surf, cluster_id (lexicographic min member), cluster_size:int64.
    """
    from tcx2graph_jl_ray.stages.analysis import entity_components

    pairs = edit_distance_pairs(source, col=col, k=k)
    edges = pairs.map_batches(
        lambda b: pd.DataFrame({"src": b["surf_a"], "dst": b["surf_b"]}),
        batch_format="pandas",
    )
    comp = entity_components(edges)
    return comp.map_batches(
        lambda b: pd.DataFrame(
            {
                "surf": b["entity_id"].astype("object"),
                "cluster_id": b["component_id"].astype("object"),
                "cluster_size": b["component_size"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def edit_clusters_sql(source_sql: str, col: str = "norm", k: int = 2) -> str:
    """DuckDB oracle for ``edit_clusters``: min-reachable-label recursive
    CTE over the oracle-exact Ed-Join pairs (the ``minhash_clusters_sql``
    discipline; nodes are the pair endpoints, so surfaces similar to
    nothing are absent on both sides)."""
    pairs = EDIT_PAIRS_SQL_TEMPLATE.format(source=source_sql, col=col, k=k)
    return f"""
WITH RECURSIVE p AS ({pairs}),
edges AS (
  SELECT surf_a AS u, surf_b AS v FROM p
  UNION ALL
  SELECT surf_b, surf_a FROM p
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
r(node, reach) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.node, e.v FROM r JOIN edges e ON e.u = r.reach
),
lab AS (SELECT node AS surf, MIN(reach) AS cluster_id FROM r GROUP BY node)
SELECT l.surf, l.cluster_id, CAST(c.n AS BIGINT) AS cluster_size
FROM lab l
JOIN (SELECT cluster_id, COUNT(*) AS n FROM lab GROUP BY cluster_id) c
  USING (cluster_id)
"""


def prefix_pairs(
    docs: ray.data.Dataset, min_len: int = 32, n_buckets: int = 64
) -> ray.data.Dataset:
    """Exact PREFIX-containment pairs: (sub, sup) where sub's full text is a
    prefix of sup's (sub at least ``min_len`` chars; equal texts pair once,
    lower id as sub) — the boilerplate/truncation duplicate class that
    near-dup shingling over-pays for and exact-hash dedup misses.

    Blocking is LOSSLESS by construction: a prefix-pair's two docs share
    their first ``min_len`` characters, so blocking on that key puts every
    qualifying pair in exactly one bucket. Inside a bucket the texts are
    sorted once and each doc's prefix-supersets are the CONTIGUOUS sorted
    range [text, text + U+FFFF) — two vectorized searchsorteds + the
    cumsum/arange flat-range expansion, no per-pair compare, no cross
    join (ASCII-corpus assumption of the substring suite,
    ``dedup_substring_grams``). Output: sub_id, sup_id, sub_len."""

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        d = _nonnull_text(batch)
        n = d["text"].str.len()
        d = d[n >= min_len]
        if not len(d):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "text": pd.Series([], dtype="object"),
                "key": pd.Series([], dtype="object"),
            })
        return pd.DataFrame({
            "doc_id": d["doc_id"].astype("int64"),
            "text": d["text"],
            "key": d["text"].str[:min_len],
        })

    def per_block(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "sub_id": pd.Series([], dtype="int64"),
            "sup_id": pd.Series([], dtype="int64"),
            "sub_len": pd.Series([], dtype="int64"),
        })
        out = [empty]
        for _, g in bucket.groupby("key", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("text", kind="mergesort")
            texts = g["text"].to_numpy()
            ids = g["doc_id"].to_numpy()
            lens = g["text"].str.len().to_numpy()
            lo = np.searchsorted(texts, texts, side="left")
            hi = np.searchsorted(
                texts, np.char.add(texts.astype(str), "￿"), side="left"
            )
            counts = hi - lo
            if counts.sum() <= len(g):
                continue
            offs = np.zeros(len(g), dtype="int64")
            np.cumsum(counts[:-1], out=offs[1:])
            a_idx = np.repeat(np.arange(len(g)), counts)
            b_idx = np.arange(counts.sum()) - np.repeat(offs, counts) \
                + np.repeat(lo, counts)
            keep = b_idx != a_idx
            a_idx, b_idx = a_idx[keep], b_idx[keep]
            # equal-length (== equal-text) pairs once, lower id as sub
            eq = lens[a_idx] == lens[b_idx]
            keep = ~eq | (ids[a_idx] < ids[b_idx])
            a_idx, b_idx = a_idx[keep], b_idx[keep]
            if len(a_idx):
                out.append(pd.DataFrame({
                    "sub_id": ids[a_idx],
                    "sup_id": ids[b_idx],
                    "sub_len": lens[a_idx].astype("int64"),
                }))
        return pd.concat(out, ignore_index=True)

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    return bucketed_group_apply(
        docs.select_columns(["doc_id", "text"]).map_batches(
            prep, batch_format="pandas", batch_size=8192
        ),
        ["key"],
        per_block,
        n_buckets=n_buckets,
    )


PREFIX_PAIRS_SQL_TEMPLATE = """
WITH d AS (
  SELECT doc_id, text, len(text) AS n
  FROM documents WHERE text IS NOT NULL AND len(text) >= {min_len}
)
SELECT a.doc_id AS sub_id, b.doc_id AS sup_id,
       CAST(a.n AS BIGINT) AS sub_len
FROM d a JOIN d b
  ON left(a.text, {min_len}) = left(b.text, {min_len})
 AND a.doc_id <> b.doc_id
 AND left(b.text, a.n) = a.text
 AND (b.n > a.n OR (b.n = a.n AND a.doc_id < b.doc_id))
"""


def source_dup_matrix(
    pairs: ray.data.Dataset, docs: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Cross-source near-duplication matrix: how many verified near-dup
    pairs land within/between each pair of sources — the
    contamination-by-domain heat map a curation team reads before deciding
    which domains to de-weight. Same composition shape as
    ``dedup_split_leakage``: the match-bounded pair list co-shuffles twice
    with the doc -> source map (``hash_join``, no broadcast of the doc
    table), then (source_a <= source_b) normalized counts reduce in a
    source-pair-bounded groupby. Output: source_a, source_b, n_pairs."""
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    j1 = hash_join(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {"a": b["a"].astype("int64"), "b": b["b"].astype("int64")}
            ),
            batch_format="pandas",
        ),
        docs.map_batches(
            lambda b: pd.DataFrame(
                {"a": b["doc_id"].astype("int64"), "src_a": b["source"]}
            ),
            batch_format="pandas",
        ),
        on="a",
        n_buckets=n_buckets,
    )
    j2 = hash_join(
        j1,
        docs.map_batches(
            lambda b: pd.DataFrame(
                {"b": b["doc_id"].astype("int64"), "src_b": b["source"]}
            ),
            batch_format="pandas",
        ),
        on="b",
        n_buckets=n_buckets,
    )

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        lo = batch[["src_a", "src_b"]].min(axis=1)
        hi = batch[["src_a", "src_b"]].max(axis=1)
        g = pd.DataFrame({"source_a": lo, "source_b": hi}).groupby(
            ["source_a", "source_b"], sort=False
        ).size()
        out = g.reset_index(name="n_pairs")
        out["n_pairs"] = out["n_pairs"].astype("int64")
        return out

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source_a", "source_b"], sort=False)[
            "n_pairs"
        ].sum()
        return g.reset_index().astype({"n_pairs": "int64"})

    return bucketed_group_apply(
        j2.map_batches(norm, batch_format="pandas", batch_size=65536),
        ["source_a", "source_b"],
        merge,
        n_buckets=8,
    )


SOURCE_DUP_MATRIX_SQL_TEMPLATE = """
WITH p AS ({pairs})
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p
JOIN documents da ON da.doc_id = p.a
JOIN documents db ON db.doc_id = p.b
GROUP BY 1, 2
"""


def dup_degree_hist(
    pairs: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Degree histogram of the near-duplicate graph: how many docs
    participate in exactly d verified near-dup pairs — the one-glance
    duplication profile (a heavy tail means template families, a flat 1
    means scattered copies). Two-level count-of-counts, both exact: pair
    endpoints explode per batch, per-doc degrees reduce in a doc-keyed
    shuffle, then the degree histogram reduces in a degree-bounded second
    shuffle (the ``docs_length_histogram`` shape over the pair graph).
    Output: degree, n_docs (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    ends = pairs.map_batches(
        lambda b: pd.DataFrame({
            "doc_id": pd.concat(
                [b["a"].astype("int64"), b["b"].astype("int64")],
                ignore_index=True,
            )
        }),
        batch_format="pandas", batch_size=65536,
    )

    def per_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("doc_id", sort=False).size()
        return pd.DataFrame({"doc_id": s.index,
                             "degree": s.to_numpy().astype("int64")})

    deg = bucketed_group_apply(ends, ["doc_id"], per_doc, n_buckets=n_buckets)

    def hist(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("degree", sort=False).size()
        return pd.DataFrame({"degree": s.index.astype("int64"),
                             "n_docs": s.to_numpy().astype("int64")})

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("degree", sort=False)["n_docs"].sum()
        return pd.DataFrame({"degree": g.index.astype("int64"),
                             "n_docs": g.to_numpy().astype("int64")})

    return bucketed_group_apply(
        deg.map_batches(hist, batch_format="pandas", batch_size=65536),
        ["degree"],
        merge,
        n_buckets=4,
    )


DUP_DEGREE_HIST_SQL_TEMPLATE = """
WITH p AS ({pairs}),
d AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT a AS doc_id FROM p UNION ALL SELECT b FROM p)
  GROUP BY doc_id
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY degree
"""


def cluster_size_hist(
    clusters: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Size histogram of the near-duplicate clusters: how many clusters
    hold exactly s docs — the companion of ``dedup_degree_hist`` at the
    component level (template families show as the tail; s=1 is the
    dedup-clean mass). Two exact count-of-counts shuffles (cluster-keyed,
    then size-bounded). Output: cluster_size, n_clusters (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_cluster(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("cluster_id", sort=False).size()
        return pd.DataFrame({"cluster_id": s.index,
                             "sz": s.to_numpy().astype("int64")})

    sizes = bucketed_group_apply(
        clusters.select_columns(["cluster_id"]), ["cluster_id"], per_cluster,
        n_buckets=n_buckets,
    )

    def hist(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("sz", sort=False).size()
        return pd.DataFrame({"cluster_size": s.index.astype("int64"),
                             "n_clusters": s.to_numpy().astype("int64")})

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("cluster_size", sort=False)["n_clusters"].sum()
        return pd.DataFrame({"cluster_size": g.index.astype("int64"),
                             "n_clusters": g.to_numpy().astype("int64")})

    return bucketed_group_apply(
        sizes.map_batches(hist, batch_format="pandas", batch_size=65536),
        ["cluster_size"],
        merge,
        n_buckets=4,
    )


CLUSTER_SIZE_HIST_SQL_TEMPLATE = """
WITH c AS ({clusters}),
s AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM c GROUP BY cluster_id)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM s GROUP BY cluster_size
"""


def len_dup_corr(
    pairs: ray.data.Dataset, docs: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Does document LENGTH predict near-duplication? One-row Pearson
    correlation between each doc's token length and its near-dup pair
    degree (0 for unpaired docs) over the whole corpus — the
    exact-integer sufficient-statistics discipline of
    ``events_corr_value_hour`` composed across the dedup and text
    families. Per-doc degrees reduce keyed, attach to lengths through one
    co-partitioned ``hash_join``, and only six integer scalars reach the
    driver (HUGEINT-equal Python-int merge). Output: n_docs, corr."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    ends = pairs.map_batches(
        lambda b: pd.DataFrame({
            "doc_id": pd.concat(
                [b["a"].astype("int64"), b["b"].astype("int64")],
                ignore_index=True,
            )
        }),
        batch_format="pandas", batch_size=65536,
    )

    def per_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("doc_id", sort=False).size()
        return pd.DataFrame({"doc_id": s.index,
                             "degree": s.to_numpy().astype("int64")})

    deg = bucketed_group_apply(ends, ["doc_id"], per_doc,
                               n_buckets=n_buckets)

    lens = docs.map_batches(
        lambda b: pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "ntok": b["text"].str.count(r"[^ ]+").fillna(0).astype("int64"),
        })[b["text"].notna().to_numpy()],
        batch_format="pandas", batch_size=8192,
    )

    j = hash_join(lens, deg, on="doc_id", how="left", n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["ntok"].astype("int64")
        y = batch["degree"].fillna(0).astype("int64")
        return pd.DataFrame({
            "n": [np.int64(len(batch))],
            "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxy": [int((x * y).sum())],
            "sx2": [int((x * x).sum())], "sy2": [int((y * y).sum())],
        })

    stats = j.map_batches(
        partial, batch_format="pandas", batch_size=65536
    ).to_pandas()  # one row per batch: batch-count-bounded
    n = int(stats["n"].sum())
    sx, sy = int(stats["sx"].sum()), int(stats["sy"].sum())
    sxy = int(stats["sxy"].sum())
    sx2, sy2 = int(stats["sx2"].sum()), int(stats["sy2"].sum())
    vx = n * sx2 - sx * sx       # Python ints: HUGEINT-equal
    vy = n * sy2 - sy * sy
    if n == 0 or vx <= 0 or vy <= 0:
        return pd.DataFrame({
            "n_docs": pd.Series([], dtype="int64"),
            "corr": pd.Series([], dtype="float64"),
        })
    corr = float(n * sxy - sx * sy) / float(np.sqrt(float(vx) * float(vy)))
    return ray.data.from_pandas(pd.DataFrame({
        "n_docs": pd.array([n], dtype="int64"),
        "corr": [np.round(corr, 6)],
    }))


LEN_DUP_CORR_SQL_TEMPLATE = """
WITH p AS ({pairs}),
deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT a AS doc_id FROM p UNION ALL SELECT b FROM p)
  GROUP BY doc_id
),
x AS (
  SELECT CAST(len(regexp_extract_all(d.text, '[^ ]+')) AS BIGINT) AS x,
         CAST(COALESCE(g.degree, 0) AS BIGINT) AS y
  FROM documents d LEFT JOIN deg g ON g.doc_id = d.doc_id
  WHERE d.text IS NOT NULL
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM x
)
SELECT n AS n_docs,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6) AS corr
FROM s
WHERE (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
"""


def jaccard_similarity_hist(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    k: int = 2,
    n_bins: int = 20,
) -> ray.data.Dataset:
    """Similarity-mass histogram over the verified n-gram Jaccard pairs:
    how much near-duplication sits just above the threshold vs at
    copy-level similarity — the curve a curator reads to PICK the
    threshold (a fat just-above-tau bin means the cut is shaving a dense
    region; reference's overlap-fraction distribution,
    src/OverlappingSegmentsUtils.jl:173-274, summarized).

    Composes the production ``ngram_jaccard_join``; bin = FLOOR(sim *
    n_bins) is exact on both sides because sim is ONE division of exact
    ints (identical double), capped into the last bin at sim = 1.0.
    Output: bin, bin_lo, n_pairs."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    pairs = ngram_jaccard_join(docs, threshold, k)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(
            batch["sim"].to_numpy(dtype="float64") * n_bins
        ).astype("int64")
        b = np.minimum(b, n_bins - 1)  # sim == 1.0 joins the top bin
        s = pd.Series(b).groupby(b, sort=False).size()
        return pd.DataFrame({
            "bin": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    parts = pairs.map_batches(partial, batch_format="pandas",
                              batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum().reset_index()
        b = g["bin"].astype("int64")
        return pd.DataFrame({
            "bin": b,
            "bin_lo": np.round(
                b.to_numpy(dtype="float64") / float(n_bins), 6
            ),
            "n_pairs": g["n"].astype("int64"),
        })

    return bucketed_group_apply(parts, ["bin"], merge, n_buckets=4)


def jaccard_hist_sql(threshold: float, k: int = 2, n_bins: int = 20) -> str:
    inner = NGRAM_JACCARD_SQL_TEMPLATE.format(k=k, threshold=threshold)
    return f"""
WITH pairs AS MATERIALIZED ({inner}),
b AS (
  SELECT LEAST(CAST(FLOOR(sim * {n_bins}) AS BIGINT), {n_bins - 1}) AS bin
  FROM pairs
)
SELECT bin, ROUND(CAST(bin AS DOUBLE) / {float(n_bins)}, 6) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM b GROUP BY bin
"""


def hamming_distance_hist(
    docs: ray.data.Dataset, max_hamming: int = 3
) -> ray.data.Dataset:
    """Hamming-distance histogram over the verified SimHash near-dup pairs
    — the SimHash threshold-tuning curve (the ``jaccard_similarity_hist``
    question asked of the bitwise family: pair mass at distance 0 is
    exact-duplicate pressure, mass hugging max_hamming says the radius is
    clipping a dense shell). Composes the production
    ``simhash_neardup_pairs``; distances are exact small ints, counts
    exact int64. Output: hamming, n_pairs."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    pairs = simhash_neardup_pairs(docs, max_hamming)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("hamming", sort=False).size()
        return pd.DataFrame({
            "hamming": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    parts = pairs.map_batches(partial, batch_format="pandas",
                              batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("hamming", sort=False)["n"].sum().reset_index()
        return pd.DataFrame({
            "hamming": g["hamming"].astype("int64"),
            "n_pairs": g["n"].astype("int64"),
        })

    return bucketed_group_apply(parts, ["hamming"], merge, n_buckets=2)


def hamming_hist_sql(max_hamming: int = 3) -> str:
    inner = SIMHASH_PAIRS_SQL_TEMPLATE.format(
        simhash=SIMHASH_SQL, max_hamming=max_hamming
    )
    return f"""
WITH pairs AS MATERIALIZED ({inner})
SELECT CAST(hamming AS BIGINT) AS hamming,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY hamming
"""


def lsh_band_stats(
    docs: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """LSH blocking LOAD PROFILE: per band, the document count, distinct
    bucket count, largest bucket, singleton buckets and the candidate-pair
    mass sum C(size, 2) — the table that tells an operator whether a band
    is about to go quadratic (the ``max_block_size`` hot-band guard's
    monitoring view; a band whose max_bucket approaches the cap is
    boilerplate pressure). Same signature stage as the production pairs
    op; counts are exact ints. The engine's FNV band fingerprint vs the
    oracle's full value tuple can differ only on a 64-bit collision
    (the documented ``neardup_minhash_pairs`` caveat — here it would
    merge two buckets; ~n^2/2^64). Output: band, n_docs, n_buckets,
    max_bucket, singletons, cand_pairs."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        _Signatures,
        fn_constructor_args=(
            config.minhash_num_perm, config.minhash_bands, config.shingle_size
        ),
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, 8),
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = [(k,) for keys in batch["bands"] for k in keys]
        d = pd.DataFrame(rows, columns=["key"])
        g = d.groupby("key", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    # bucket sizes: exact reduce keyed on the band key
    sizes = bucketed_group_apply(
        sigs.map_batches(explode, batch_format="pandas", batch_size=4096),
        ["key"],
        lambda b: b.groupby("key", sort=False)["n"].sum().reset_index(),
        n_buckets=n_buckets,
    )

    def per_band_partial(batch: pd.DataFrame) -> pd.DataFrame:
        band = batch["key"].str.split(":").str[0].astype("int64")
        n = batch["n"].astype("int64")
        d = pd.DataFrame({
            "band": band,
            "n_docs": n,
            "n_buckets": np.int64(1),
            "max_bucket": n,
            "singletons": (n == 1).astype("int64"),
            "cand_pairs": n * (n - 1) // 2,
        })
        return d.groupby("band", sort=False).agg(
            n_docs=("n_docs", "sum"), n_buckets=("n_buckets", "sum"),
            max_bucket=("max_bucket", "max"),
            singletons=("singletons", "sum"),
            cand_pairs=("cand_pairs", "sum"),
        ).reset_index()

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("band", sort=False).agg(
            n_docs=("n_docs", "sum"), n_buckets=("n_buckets", "sum"),
            max_bucket=("max_bucket", "max"),
            singletons=("singletons", "sum"),
            cand_pairs=("cand_pairs", "sum"),
        ).reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return g

    return bucketed_group_apply(
        sizes.map_batches(per_band_partial, batch_format="pandas",
                          batch_size=65536),
        ["band"],
        merge,
        n_buckets=4,
    )


def band_stats_sql(config: PipelineConfig = DEFAULT_CONFIG) -> str:
    """Oracle for ``lsh_band_stats`` — the ``minhash_pairs_sql`` signature
    CTEs rolled up into per-band bucket-size statistics."""
    from tcx2graph_jl_ray.functions.minhash import _perm_params

    num_perm = config.minhash_num_perm
    bands = config.minhash_bands
    r = num_perm // bands
    k = config.shingle_size
    a, b = _perm_params(num_perm)
    perm_rows = ",\n    ".join(
        f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)"
        for j in range(num_perm)
    )
    full = r * bands
    return f"""
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(l) >= {k} THEN array_to_string(l[i:i+{k}-1], ' ')
              ELSE array_to_string(l, ' ') END AS shingle
  FROM tk, unnest(CASE WHEN len(l) >= {k} THEN range(1, len(l) - {k} + 2)
                       ELSE [1] END) AS t(i)
  WHERE len(l) > 0
),
h AS (
  SELECT doc_id, shingle, CAST(md5_number_lower(shingle) AS HUGEINT) AS h
  FROM sh
),
perms(j, pa, pb) AS (VALUES
    {perm_rows}
),
sig AS (
  SELECT doc_id, j,
         MIN((pa * h + pb) % 18446744073709551616::HUGEINT) AS v
  FROM h CROSS JOIN perms
  GROUP BY doc_id, j
),
bandkeys AS (
  SELECT doc_id, j // {r} AS band, LIST(v ORDER BY j) AS key
  FROM sig WHERE j < {full} GROUP BY doc_id, j // {r}
),
sizes AS (
  SELECT band, key, COUNT(*) AS sz FROM bandkeys GROUP BY band, key
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(MAX(sz) AS BIGINT) AS max_bucket,
       CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS singletons,
       CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs
FROM sizes GROUP BY band
"""


def minhash_calibration(
    docs: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """Sketch-calibration table for the MinHash estimator: per VERIFIED
    near-dup pair, the signature-agreement estimate (matching permutations
    / num_perm — the unbiased Jaccard estimator, exact integer ratio) next
    to the true word-shingle Jaccard — the empirical answer to "how many
    permutations does this corpus actually need" (read the |est - true|
    spread; Broder's resemblance estimator audited on real pairs).

    Shape: the production candidate+verify path (banded, Bloom-gated)
    yields the pairs; signatures attach through two co-partitioned
    ``hash_join``s (the signature table rides as list columns, bounded by
    num_perm x 8 bytes per row); the agreement count is one vectorized
    stacked compare per bucket. Both ratios are single divisions of exact
    ints, rounded 6. Output: a, b, est_sim, true_sim."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    num_perm = config.minhash_num_perm
    pairs = _verify_pairs_join(
        _candidate_pairs(docs, config), docs,
        config.jaccard_threshold, config.shingle_size, emit_sim=True,
    )

    sigs = docs.map_batches(
        _Signatures2,
        fn_constructor_args=(num_perm, config.shingle_size),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 8),
    )

    wa = hash_join(
        pairs,
        sigs.map_batches(
            lambda b: b.rename(columns={"doc_id": "a", "sig": "sig_a"}),
            batch_format="pandas",
        ),
        on="a", n_buckets=n_buckets,
    )
    wb = hash_join(
        wa,
        sigs.map_batches(
            lambda b: b.rename(columns={"doc_id": "b", "sig": "sig_b"}),
            batch_format="pandas",
        ),
        on="b", n_buckets=n_buckets,
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "est_sim": pd.Series([], dtype="float64"),
                "true_sim": pd.Series([], dtype="float64"),
            })
        sa = np.stack([
            np.frombuffer(x, dtype=np.uint64) for x in batch["sig_a"]
        ])
        sb = np.stack([
            np.frombuffer(x, dtype=np.uint64) for x in batch["sig_b"]
        ])
        agree = (sa == sb).sum(axis=1).astype("int64")
        return pd.DataFrame({
            "a": batch["a"].astype("int64").to_numpy(),
            "b": batch["b"].astype("int64").to_numpy(),
            "est_sim": np.round(
                agree.astype("float64") / float(num_perm), 6
            ),
            "true_sim": np.round(
                batch["sim"].to_numpy(dtype="float64"), 6
            ),
        })

    return wb.map_batches(finish, batch_format="pandas", batch_size=65536)


class _Signatures2:
    """Signature stage emitting the raw signature vector (no band keys) —
    the calibration op needs the permutation mins themselves."""

    def __init__(self, num_perm: int, shingle_k: int):
        self.num_perm = num_perm
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from tcx2graph_jl_ray.functions.minhash import minhash_signatures

        batch = _nonnull_text(batch)
        sh = word_shingles(batch["text"], self.k)
        sig = minhash_signatures(
            batch["doc_id"].to_numpy(), sh, num_perm=self.num_perm
        )
        # ship as packed BYTES (num_perm x 8, little-endian) — a scalar
        # binary column survives the co-partitioned joins, where a
        # list/tensor column breaks pandas-block concat
        sig["sig"] = [s.astype("<u8").tobytes() for s in sig["sig"]]
        return sig[["doc_id", "sig"]]


def minhash_calibration_sql(config: PipelineConfig = DEFAULT_CONFIG) -> str:
    """Oracle for ``minhash_calibration``: the ``minhash_pairs_sql`` CTEs
    plus a per-pair signature-agreement count."""
    from tcx2graph_jl_ray.functions.minhash import _perm_params

    num_perm = config.minhash_num_perm
    bands = config.minhash_bands
    r = num_perm // bands
    k = config.shingle_size
    tau = config.jaccard_threshold
    a, b = _perm_params(num_perm)
    perm_rows = ",\n    ".join(
        f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)"
        for j in range(num_perm)
    )
    full = r * bands
    return f"""
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(l) >= {k} THEN array_to_string(l[i:i+{k}-1], ' ')
              ELSE array_to_string(l, ' ') END AS shingle
  FROM tk, unnest(CASE WHEN len(l) >= {k} THEN range(1, len(l) - {k} + 2)
                       ELSE [1] END) AS t(i)
  WHERE len(l) > 0
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
h AS (
  SELECT doc_id, shingle, CAST(md5_number_lower(shingle) AS HUGEINT) AS h
  FROM sh
),
perms(j, pa, pb) AS (VALUES
    {perm_rows}
),
sig AS (
  SELECT doc_id, j,
         MIN((pa * h + pb) % 18446744073709551616::HUGEINT) AS v
  FROM h CROSS JOIN perms
  GROUP BY doc_id, j
),
bandkeys AS (
  SELECT doc_id, j // {r} AS band, LIST(v ORDER BY j) AS key
  FROM sig WHERE j < {full} GROUP BY doc_id, j // {r}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bandkeys x JOIN bandkeys y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
inter AS (
  SELECT c.a, c.b, COUNT(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
),
verified AS (
  SELECT inter.a, inter.b,
         CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) AS ts
  FROM inter
  JOIN cnt ca ON ca.doc_id = inter.a
  JOIN cnt cb ON cb.doc_id = inter.b
  WHERE CAST(inter.i AS DOUBLE) / (ca.n + cb.n - inter.i) >= {tau}
),
agree AS (
  SELECT v.a, v.b, COUNT(*) AS m
  FROM verified v
  JOIN sig x ON x.doc_id = v.a
  JOIN sig y ON y.doc_id = v.b AND y.j = x.j AND y.v = x.v
  GROUP BY v.a, v.b
)
SELECT CAST(v.a AS BIGINT) AS a, CAST(v.b AS BIGINT) AS b,
       ROUND(CAST(COALESCE(ag.m, 0) AS DOUBLE) / {float(num_perm)}, 6)
         AS est_sim,
       ROUND(v.ts, 6) AS true_sim
FROM verified v LEFT JOIN agree ag ON ag.a = v.a AND ag.b = v.b
"""


def gram_df_hist(
    docs: ray.data.Dataset, k: int = 32, n_buckets: int = 4
) -> ray.data.Dataset:
    """Document-frequency HISTOGRAM of k-char grams: how many distinct
    grams appear in exactly-one doc, 2-3 docs, 4-7, ... (log2 bins) — the
    duplication SPECTRUM that tunes every gram-based dedup knob upstream
    (min_docs sits where the unique mass ends; a fat tail bin means
    boilerplate that ``duplicated_grams`` will surface). Reuses the
    vectorized per-doc distinct gram extraction and the salted per-gram
    doc-count reduce (``_gram_pairs`` / ``_gram_doc_counts``); the
    count-of-counts fold is a pure-int combiner. Share is one division
    rounded 6. Output: bin, min_docs, n_grams, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    counts = _gram_doc_counts(_gram_pairs(docs, k))

    def bin_partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["n_docs"].to_numpy(dtype="int64")
        bins = np.array([int(x).bit_length() - 1 for x in d], dtype="int64")
        s = pd.Series(bins).groupby(bins, sort=False).size()
        return pd.DataFrame({
            "bin": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    parts = counts.map_batches(bin_partial, batch_format="pandas",
                               batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum().reset_index()
        tot = float(g["n"].sum())
        b = g["bin"].astype("int64")
        return pd.DataFrame({
            "bin": b,
            "min_docs": (np.int64(1) << b.to_numpy()).astype("int64"),
            "n_grams": g["n"].astype("int64"),
            "share": np.round(g["n"].to_numpy(dtype="float64") / tot, 6),
        })

    # single merge bucket: global share denominator, log-bounded bin space
    return bucketed_group_apply(parts, ["bin"], merge, n_buckets=1)


GRAM_DF_HIST_SQL_TEMPLATE = """
WITH g AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {k}) AS gram
  FROM documents, unnest(range(1, len(text) - {k} + 2)) AS t(i)
  WHERE text IS NOT NULL AND len(text) >= {k}
),
dfc AS (SELECT gram, COUNT(*) AS n_docs FROM g GROUP BY gram),
b AS (SELECT CAST(floor(log2(n_docs)) AS BIGINT) AS bin FROM dfc)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_docs,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6) AS share
FROM b GROUP BY bin
"""


def method_agreement(
    minhash_pairs: ray.data.Dataset,
    simhash_pairs: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """AGREEMENT between two near-dup detectors: the Jaccard overlap of the
    verified MinHash pair set and the SimHash pair set — the methodology
    cross-check every dedup rollout wants before trusting either alone
    (high agreement = safe to run the cheaper one; low = the corpus has a
    dup mode one family misses, e.g. SimHash catching token-reordered
    copies MinHash's shingles keep). Pair sets intersect through the
    co-partitioned (a, b) ``hash_join`` — no pair list ever collects;
    the three counts are distributed aggregates and the Jaccard is one
    division rounded 6. Output: n_minhash, n_simhash, n_both,
    agreement."""
    from tcx2graph_jl_ray.functions.join import hash_join

    mh = minhash_pairs.select_columns(["a", "b"])
    sh = simhash_pairs.select_columns(["a", "b"])
    n_mh = mh.count()
    n_sh = sh.count()
    n_both = hash_join(mh, sh, on=["a", "b"], n_buckets=n_buckets).count()
    union = n_mh + n_sh - n_both
    agree = float(np.round(n_both / union, 6)) if union else 0.0
    return ray.data.from_pandas(pd.DataFrame({
        "n_minhash": pd.Series([n_mh], dtype="int64"),
        "n_simhash": pd.Series([n_sh], dtype="int64"),
        "n_both": pd.Series([n_both], dtype="int64"),
        "agreement": pd.Series([agree], dtype="float64"),
    }))


METHOD_AGREEMENT_SQL_TEMPLATE = """
WITH mh AS ({minhash_pairs}),
shp AS ({simhash_pairs}),
bc AS (SELECT COUNT(*) AS n FROM mh JOIN shp USING (a, b)),
mc AS (SELECT COUNT(*) AS n FROM mh),
sc AS (SELECT COUNT(*) AS n FROM shp)
SELECT CAST(mc.n AS BIGINT) AS n_minhash,
       CAST(sc.n AS BIGINT) AS n_simhash,
       CAST(bc.n AS BIGINT) AS n_both,
       CASE WHEN mc.n + sc.n - bc.n > 0
            THEN ROUND(CAST(bc.n AS DOUBLE) / (mc.n + sc.n - bc.n), 6)
            ELSE 0.0 END AS agreement
FROM mc, sc, bc
"""


def cross_source_clusters(
    clusters: ray.data.Dataset,
    docs: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Near-dup cluster SOURCE-SPAN histogram: for each MinHash cluster,
    how many distinct sources its members come from — rolled up to
    (n_sources → n_clusters, n_docs). Single-source clusters are
    within-feed boilerplate (dedup locally, cheap); multi-source clusters
    are syndication/scraper copies — the rows that make cross-feed dedup
    worth its global shuffle, measured here before paying for it. Cluster
    rows pick up their source through the co-partitioned doc_id
    ``hash_join``; span counts reduce cluster-bucketed; the histogram fold
    is a tiny single-bucket merge. Output: n_sources, n_clusters,
    n_docs."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    j = hash_join(
        clusters.select_columns(["doc_id", "cluster_id"]),
        docs.select_columns(["doc_id", "source"]),
        on="doc_id",
        n_buckets=n_buckets,
    )

    def per_cluster(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("cluster_id", sort=False).agg(
            nd=("doc_id", "size"), ns=("source", "nunique")
        ).reset_index()
        out = g.groupby("ns", sort=False).agg(
            n_clusters=("cluster_id", "size"), n_docs=("nd", "sum")
        ).reset_index()
        return out.rename(columns={"ns": "n_sources"})

    mid = bucketed_group_apply(j, ["cluster_id"], per_cluster,
                               n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("n_sources", sort=False).sum().reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return g[["n_sources", "n_clusters", "n_docs"]]

    return bucketed_group_apply(mid, ["n_sources"], merge, n_buckets=1)


CROSS_SOURCE_CLUSTERS_SQL_TEMPLATE = """
WITH cl AS ({clusters}),
j AS (
  SELECT cl.doc_id, cl.cluster_id, d.source
  FROM cl JOIN documents d USING (doc_id)
),
pc AS (
  SELECT cluster_id, COUNT(*) AS nd, COUNT(DISTINCT source) AS ns
  FROM j GROUP BY cluster_id
)
SELECT CAST(ns AS BIGINT) AS n_sources,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(nd) AS BIGINT) AS n_docs
FROM pc GROUP BY ns
"""


def dup_rate_by_length(
    docs: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """EXACT-DUPLICATE rate BY LENGTH BIN: of the docs in each log2
    token-length bucket, how many are byte-identical copies of another doc
    — the length-axis slice of ``dedup_exact`` that answers "is my dup
    mass short boilerplate or full mirrored articles?" (the answer picks
    prefix-dedup vs full-content dedup as the cheap first pass). The text
    itself is the shuffle key (complete per bucket, byte equality — the
    dedup-exact discipline); each text group contributes its copy count to
    its (single, text-functional) length bin; the histogram fold is exact
    ints, rate one division rounded 6. Output: bin, min_tokens, n_docs,
    n_dup_docs, dup_rate."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        d = pd.DataFrame({"text": b["text"], "n": np.int64(1)})
        return d.groupby("text", sort=False).sum().reset_index()

    parts = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def per_text(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("text", sort=False)["n"].sum().reset_index()
        ntok = (g["text"].str.count(" ") + 1).to_numpy().astype("int64")
        bins = np.array(
            [int(x).bit_length() - 1 for x in ntok], dtype="int64"
        )
        n = g["n"].to_numpy(dtype="int64")
        d = pd.DataFrame({
            "bin": bins,
            "n_docs": n,
            "n_dup": np.where(n >= 2, n, np.int64(0)),
        })
        return d.groupby("bin", sort=False).sum().reset_index()

    mid = bucketed_group_apply(parts, ["text"], per_text,
                               n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False).sum().reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pd.DataFrame({
            "bin": g["bin"],
            "min_tokens": (np.int64(1) << g["bin"].to_numpy())
            .astype("int64"),
            "n_docs": g["n_docs"],
            "n_dup_docs": g["n_dup"],
            "dup_rate": np.round(
                g["n_dup"].to_numpy(dtype="float64")
                / g["n_docs"].to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(mid, ["bin"], merge, n_buckets=1)


DUP_RATE_BY_LENGTH_SQL = """
WITH c AS (
  SELECT text, COUNT(*) AS n,
         len(text) - len(replace(text, ' ', '')) + 1 AS ntok
  FROM documents WHERE text IS NOT NULL GROUP BY text
),
b AS (
  SELECT CAST(floor(log2(ntok)) AS BIGINT) AS bin, n,
         CASE WHEN n >= 2 THEN n ELSE 0 END AS ndup
  FROM c
)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_tokens,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(SUM(ndup) AS BIGINT) AS n_dup_docs,
       ROUND(CAST(SUM(ndup) AS DOUBLE) / SUM(n), 6) AS dup_rate
FROM b GROUP BY bin
"""


def source_copy_matrix(
    docs: ray.data.Dataset, prefix_len: int = 64, n_buckets: int = 32
) -> ray.data.Dataset:
    """Shared-TEMPLATE matrix across sources: for each source pair (a < b),
    how many distinct ``prefix_len``-char document prefixes appear in BOTH
    — the syndication/mail-merge map (``dedup_source_matrix``'s near-dup
    picture at template strength; a hot pair here is one scraper feeding
    two feeds, the cross-feed case ``template_rate`` cannot attribute;
    full-text equality is deliberately NOT the key — byte-exact
    cross-source copies are measured zero in this corpus, templates are
    not). Prefix buckets see each prefix's complete source set, so the
    (small, <= S^2) pair expansion happens inside the bucket on the
    deduped source list; the matrix fold is exact ints. Output: source_a,
    source_b, n_shared_prefixes."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        return pd.DataFrame({
            "source": b["source"],
            "p": b["text"].str[:prefix_len],
        }).drop_duplicates()

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def per_prefix(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()
        m = d.merge(d, on="p", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        g = m.groupby(["source_a", "source_b"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    mid = bucketed_group_apply(parts, ["p"], per_prefix,
                               n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source_a", "source_b"], sort=False)["n"]\
            .sum().reset_index()
        g["n_shared_prefixes"] = g.pop("n").astype("int64")
        return g

    return bucketed_group_apply(mid, ["source_a"], merge, n_buckets=4)


SOURCE_COPY_MATRIX_SQL_TEMPLATE = """
WITH d AS (
  SELECT DISTINCT source, substr(text, 1, {prefix_len}) AS p
  FROM documents WHERE text IS NOT NULL
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_prefixes
FROM d a JOIN d b ON a.p = b.p AND a.source < b.source
GROUP BY a.source, b.source
"""


def dedup_savings(
    clusters: ray.data.Dataset,
    docs: ray.data.Dataset,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """One-row DEDUP SAVINGS ledger: if every near-dup cluster keeps only
    its representative (the min-doc_id member, ``neardup_minhash``'s
    cluster label), how many documents and TOKENS leave the corpus — the
    number a pretraining budget actually cares about. The corpus totals
    fold per batch; the removed side joins cluster members to their token
    counts through the co-partitioned ``hash_join`` (both sides
    corpus-scale) and folds the ``doc_id != cluster_id`` rows; the two
    one-row-per-batch partial streams union into one final bucket. Token
    rule: ``str.count('[^ ]+')`` over non-null text, the house doc-token
    count. Output: n_docs, n_removed, tokens_total, tokens_removed,
    savings_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def tok_map(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        return pd.DataFrame({
            "doc_id": d["doc_id"].astype("int64"),
            "ntok": d["text"].str.count(r"[^ ]+").astype("int64"),
        })

    tok = docs.select_columns(["doc_id", "text"]).map_batches(
        tok_map, batch_format="pandas", batch_size=8192
    ).materialize()  # consumed by the totals fold AND the removed join

    def tot_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": ["all"],
            "n_docs": [np.int64(len(batch))],
            "tokens_total": [np.int64(batch["ntok"].sum())],
            "n_removed": [np.int64(0)],
            "tokens_removed": [np.int64(0)],
        })

    removed = hash_join(
        clusters.select_columns(["doc_id", "cluster_id"]),
        tok, on="doc_id", n_buckets=n_buckets,
    )

    def rem_partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["doc_id"] != batch["cluster_id"]]
        return pd.DataFrame({
            "k": ["all"],
            "n_docs": [np.int64(0)],
            "tokens_total": [np.int64(0)],
            "n_removed": [np.int64(len(d))],
            "tokens_removed": [np.int64(d["ntok"].sum())],
        })

    parts = tok.map_batches(
        tot_partial, batch_format="pandas", batch_size=65536
    ).union(removed.map_batches(
        rem_partial, batch_format="pandas", batch_size=65536
    ))

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        n_docs = int(bucket["n_docs"].sum())
        toks = int(bucket["tokens_total"].sum())
        nr = int(bucket["n_removed"].sum())
        tr = int(bucket["tokens_removed"].sum())
        return pd.DataFrame({
            "n_docs": pd.array([n_docs], dtype="int64"),
            "n_removed": pd.array([nr], dtype="int64"),
            "tokens_total": pd.array([toks], dtype="int64"),
            "tokens_removed": pd.array([tr], dtype="int64"),
            "savings_share": [np.round(float(tr) / toks, 6)],
        })

    return bucketed_group_apply(parts, ["k"], final, n_buckets=1)


DEDUP_SAVINGS_SQL_TEMPLATE = """
WITH c AS ({clusters}),
tok AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ntok
  FROM documents WHERE text IS NOT NULL
),
tot AS (SELECT COUNT(*) AS n_docs, SUM(ntok) AS toks FROM tok),
rem AS (
  SELECT COUNT(*) AS nr, COALESCE(SUM(t.ntok), 0) AS tr
  FROM c JOIN tok t USING (doc_id)
  WHERE c.doc_id <> c.cluster_id
)
SELECT CAST(tot.n_docs AS BIGINT) AS n_docs,
       CAST(rem.nr AS BIGINT) AS n_removed,
       CAST(tot.toks AS BIGINT) AS tokens_total,
       CAST(rem.tr AS BIGINT) AS tokens_removed,
       ROUND(CAST(rem.tr AS DOUBLE) / tot.toks, 6) AS savings_share
FROM tot, rem
"""


def simhash_bit_balance(
    docs: ray.data.Dataset, n_buckets: int = 1
) -> ray.data.Dataset:
    """Per-BIT balance of the 64-bit SimHash — the degenerate-hash
    detector (a healthy corpus keeps every bit near 0.5 set; a bit pinned
    to 0/1 halves the effective band entropy and floods
    ``simhash_neardup_pairs`` with false candidates). Every batch folds
    to 64 rows of exact set-counts (vectorized shift-and-mask over the
    int64 column — numpy's arithmetic >> matches SQL's on every bit,
    sign bit included); the final exchange is 64 rows per batch.
    Output: bit, n_set, n_docs, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy(dtype="int64")
        bits = np.arange(64, dtype="int64")
        n_set = ((h[:, None] >> bits[None, :]) & 1).sum(axis=0)
        return pd.DataFrame({
            "bit": bits,
            "n_set": n_set.astype("int64"),
            "n": np.int64(len(h)),
        })

    sh = simhash_table(docs)
    parts = sh.map_batches(partial, batch_format="pandas",
                           batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bit", sort=False)[["n_set", "n"]].sum()
        n_set = g["n_set"].to_numpy(dtype="int64")
        n = g["n"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "bit": g.index.to_numpy().astype("int64"),
            "n_set": n_set,
            "n_docs": n,
            "share": np.round(n_set.astype("float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["bit"], final, n_buckets=1)


SIMHASH_BIT_BALANCE_SQL_TEMPLATE = """
WITH s AS ({simhash}),
b AS (SELECT unnest(generate_series(0, 63)) AS bit),
c AS (
  SELECT b.bit,
         SUM(CASE WHEN (s.simhash >> b.bit) & 1 = 1 THEN 1 ELSE 0 END)
           AS n_set,
         COUNT(*) AS n
  FROM s CROSS JOIN b GROUP BY b.bit
)
SELECT CAST(bit AS BIGINT) AS bit, CAST(n_set AS BIGINT) AS n_set,
       CAST(n AS BIGINT) AS n_docs,
       ROUND(CAST(n_set AS DOUBLE) / n, 6) AS share
FROM c
"""


def dup_rate_by_source(
    clusters: ray.data.Dataset,
    docs: ray.data.Dataset,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """NEAR-DUP rate by source: per source, how many documents sit in a
    MinHash cluster at all and how many are non-representative members
    (what dedup would actually delete) — ``dup_rate_by_length``'s
    companion along the provenance axis, and the table that says WHICH
    feed pays for the dedup pass. Cluster members and doc sources meet
    in the co-partitioned ``hash_join`` on doc_id; source partials bound
    the final exchange. Output: source, n_docs, n_clustered, n_removable,
    dup_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    src = docs.select_columns(["doc_id", "source"]).map_batches(
        lambda b: pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "source": b["source"],
        }),
        batch_format="pandas", batch_size=65536,
    )
    j = hash_join(
        clusters.select_columns(["doc_id", "cluster_id"]), src,
        on="doc_id", n_buckets=n_buckets, how="right",
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        inc = batch["cluster_id"].notna()
        rem = inc & (batch["doc_id"] != batch["cluster_id"])
        g = pd.DataFrame({
            "source": batch["source"],
            "n": np.int64(1),
            "c": inc.astype("int64"),
            "r": rem.astype("int64"),
        }).groupby("source", sort=False).sum().reset_index()
        return g.astype({"n": "int64", "c": "int64", "r": "int64"})

    parts = j.map_batches(partial, batch_format="pandas",
                          batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False)[["n", "c", "r"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "source": g.index,
            "n_docs": n,
            "n_clustered": g["c"].to_numpy(dtype="int64"),
            "n_removable": g["r"].to_numpy(dtype="int64"),
            "dup_share": np.round(
                g["r"].to_numpy(dtype="float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["source"], final, n_buckets=1)


DUP_RATE_BY_SOURCE_SQL_TEMPLATE = """
WITH c AS ({clusters}),
j AS (
  SELECT d.source, c.cluster_id, d.doc_id
  FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id
),
s AS (
  SELECT source, COUNT(*) AS n,
         SUM(CASE WHEN cluster_id IS NOT NULL THEN 1 ELSE 0 END) AS cl,
         SUM(CASE WHEN cluster_id IS NOT NULL AND doc_id <> cluster_id
                  THEN 1 ELSE 0 END) AS r
  FROM j GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       CAST(cl AS BIGINT) AS n_clustered,
       CAST(r AS BIGINT) AS n_removable,
       ROUND(CAST(r AS DOUBLE) / n, 6) AS dup_share
FROM s
"""


def pair_len_ratio_hist(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """LENGTH-RATIO spectrum of verified near-dup pairs: for each
    MinHash pair, the shorter/longer token-count ratio binned into ten
    pure-integer deciles — the containment diagnostic
    (``jaccard_hist`` says how similar pairs are; this says whether
    they are same-size rewrites near 1.0 or snippet-inside-article
    containment in the low bins). Both endpoints pick up token counts
    through two co-partitioned ``hash_join``s; the bin is
    ``min(10*lmin // lmax, 9)``; the count-of-counts fold bounds the
    final exchange. Output: bin, lo, n_pairs, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def tok_map(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        return pd.DataFrame({
            "doc_id": d["doc_id"].astype("int64"),
            "ntok": d["text"].str.count(r"[^ ]+").astype("int64"),
        })

    tok = docs.select_columns(["doc_id", "text"]).map_batches(
        tok_map, batch_format="pandas", batch_size=8192
    ).materialize()  # joined twice (once per pair endpoint)

    ja = hash_join(
        pairs.select_columns(["a", "b"]).map_batches(
            lambda x: pd.DataFrame({
                "doc_id": x["a"].astype("int64"),
                "b": x["b"].astype("int64"),
            }),
            batch_format="pandas", batch_size=65536,
        ),
        tok, on="doc_id", n_buckets=n_buckets,
    ).map_batches(
        lambda x: pd.DataFrame({
            "doc_id": x["b"], "na": x["ntok"].astype("int64"),
        }),
        batch_format="pandas", batch_size=65536,
    )
    jb = hash_join(ja, tok, on="doc_id", n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        na = batch["na"].to_numpy(dtype="int64")
        nb = batch["ntok"].to_numpy(dtype="int64")
        lmin = np.minimum(na, nb)
        lmax = np.maximum(na, nb)
        b = np.minimum(10 * lmin // np.maximum(lmax, 1), 9)
        s = pd.Series(b).groupby(b).size()
        return pd.DataFrame({
            "bin": s.index.to_numpy().astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "bin": g.index.to_numpy().astype("int64"),
            "lo": np.round(g.index.to_numpy().astype("float64") / 10.0, 1),
            "n_pairs": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(
        jb.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["bin"], final, n_buckets=1,
    )


PAIR_LEN_RATIO_HIST_SQL_TEMPLATE = """
WITH p AS ({pairs}),
tok AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ntok
  FROM documents WHERE text IS NOT NULL
),
r AS (
  SELECT LEAST(ta.ntok, tb.ntok) AS lmin,
         GREATEST(ta.ntok, tb.ntok) AS lmax
  FROM p
  JOIN tok ta ON ta.doc_id = p.a
  JOIN tok tb ON tb.doc_id = p.b
),
h AS (
  SELECT LEAST(10 * lmin // GREATEST(lmax, 1), 9) AS bin, COUNT(*) AS n
  FROM r GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin, ROUND(bin / 10.0, 1) AS lo,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""
