"""Vectorized MinHash / SimHash primitives.

Process-stable hashing throughout (``pandas.util.hash_pandas_object`` with its
fixed key; Python's builtin ``hash`` is per-process salted and must never feed
a shuffle key). All functions operate on batches, not rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def token_hashes(tokens: pd.Series) -> np.ndarray:
    """Stable uint64 hash per token (vectorized)."""
    return pd.util.hash_pandas_object(tokens, index=False).to_numpy(dtype=np.uint64)


def token_hashes_md5(tokens: pd.Series | np.ndarray) -> np.ndarray:
    """Stable uint64 hash per token, REPRODUCIBLE IN SQL: equals DuckDB's
    ``md5_number_lower(tok)`` (bytes 8..16 of the md5 digest, little-endian;
    verified empirically). The batch is deduplicated first (token streams are
    Zipfian — the unique vocabulary per batch is a small fraction of
    occurrences), then hashed through the batched C kernel
    (functions/digest.py)."""
    from tcx2graph_jl_ray.functions.digest import md5_low64

    arr = tokens.to_numpy() if isinstance(tokens, pd.Series) else tokens
    uniq, inv = np.unique(arr.astype(object), return_inverse=True)
    return md5_low64(uniq)[inv]


def word_shingles(text: pd.Series, k: int = 3) -> pd.Series:
    """Per row: the set of k-word shingles (list of strings). Tokenization is
    split-on-SPACE with empty tokens dropped — exactly DuckDB's
    ``list_filter(string_split(lower(text), ' '), x -> x != '')``, so every
    shingle-based oracle stays value-exact on tabs/newlines too (a bare
    ``str.split()`` would merge any whitespace run and silently diverge)."""
    toks = text.str.lower().str.split(" ").map(
        lambda ws: [w for w in ws if w]
    )

    def shingle(ws):
        if len(ws) < k:
            return [" ".join(ws)] if ws else []
        return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]

    return toks.map(shingle)


def minhash_signatures(
    doc_ids: np.ndarray, shingles: pd.Series, num_perm: int = 64, seed: int = 7
) -> pd.DataFrame:
    """Batch -> one signature row per doc: DataFrame[doc_id, sig (list[uint64])].

    Vectorized over the exploded (doc, shingle-hash) pairs: one
    (n_pairs x num_perm) broadcast then a grouped min.
    """
    exploded = pd.DataFrame({"doc_id": doc_ids, "sh": shingles}).explode("sh")
    exploded = exploded[exploded["sh"].notna()]
    if not len(exploded):
        return pd.DataFrame({"doc_id": pd.Series([], dtype=doc_ids.dtype), "sig": []})
    # md5-derived base hash: the whole sketch (mins, band keys) becomes
    # value-reproducible by a DuckDB oracle (md5_number_lower + HUGEINT
    # modular arithmetic, stages/dedup.py::minhash_pairs_sql)
    h = token_hashes_md5(exploded["sh"].astype(str))
    a, b = _perm_params(num_perm, seed)
    # (n, p): ((a * h + b) mod 2^64) is a fine universal-ish family here
    m = (h[:, None] * a[None, :] + b[None, :])  # uint64 wraparound
    df = pd.DataFrame(m)
    df["doc_id"] = exploded["doc_id"].to_numpy()
    mins = df.groupby("doc_id", sort=False).min()
    return pd.DataFrame(
        {"doc_id": mins.index.to_numpy(), "sig": list(mins.to_numpy(dtype=np.uint64))}
    )


def band_keys(sig: np.ndarray, bands: int) -> list[str]:
    """Signature -> one stable string key per band (band idx + band hash)."""
    r = len(sig) // bands
    out = []
    for i in range(bands):
        chunk = sig[i * r : (i + 1) * r]
        out.append(f"{i}:{hash_band(chunk)}")
    return out


def hash_band(chunk: np.ndarray) -> int:
    # FNV-1a over the band values; explicit 64-bit wraparound (python ints —
    # numpy scalar uint64 multiply emits overflow warnings for the intended
    # modular arithmetic)
    acc = 1469598103934665603
    for v in chunk:
        acc = ((acc ^ int(v)) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return acc


def simhash64(text: pd.Series) -> np.ndarray:
    """64-bit SimHash per row over word tokens (vectorized per batch).

    Token hash = md5-derived (token_hashes_md5) so the whole sketch is
    value-reproducible by a DuckDB oracle (md5_number_lower + bitwise SQL,
    stages/dedup.py::SIMHASH_SQL). Tokenization = split-on-space with empty
    tokens dropped, matching the oracle's string_split + tok != '' filter
    on ALL whitespace, not just spaces."""
    toks = text.str.lower().str.split(" ").map(
        lambda ws: [w for w in ws if w]
    )
    exploded = pd.DataFrame(
        {"row": np.repeat(np.arange(len(text)), toks.str.len().fillna(0).astype(int)),
         "tok": [t for ws in toks for t in (ws or [])]}
    )
    n = len(text)
    if not len(exploded):
        return np.zeros(n, dtype=np.uint64)
    h = token_hashes_md5(exploded["tok"])
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int32
    )
    contrib = np.where(bits == 1, 1, -1)
    sums = np.zeros((n, 64), dtype=np.int64)
    np.add.at(sums, exploded["row"].to_numpy(), contrib)
    out = (sums > 0).astype(np.uint64)
    return (out << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # vectorized popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def jaccard_of_sets(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)
