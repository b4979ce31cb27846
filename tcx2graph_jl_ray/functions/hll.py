"""HyperLogLog distinct-count sketch — the cardinality estimator for the
regimes where exact distinct (one row per key through a shuffle) is not worth
its exchange: 10^12-key uniques, per-stage progress gauges, optimizer-style
pre-estimates before choosing a join side. Flajolet-Fuhr-Gandouet-Meunier
HLL with the classic small/large-range corrections.

Distributed shape: each batch folds its values into one 2^p-register
partial (a map-side combiner — the object shipped per batch is 2^p bytes
regardless of rows); partials merge by elementwise max, which is
associative/commutative, so the reduce is a tree of tiny arrays, never a
shuffle of keys. Hash is md5-derived (process-stable, engine-reproducible),
like every deterministic draw in this repo.

Exactness contract: this is the repo's ONE deliberately approximate
operator, so it has no DuckDB oracle row; its guarantee is the standard
±1.04/sqrt(2^p) relative error, asserted against exact distinct counts in
tests/test_round3_ops.py. Reference analogue: the coverage metric's unique
cell count (src/GraphUtils.jl:18-103) — this is what that aggregate becomes
when the cell table no longer fits a shuffle.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import ray.data


def _hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes (md5 lower half, LE — the repo's
    md5_number_lower convention), batched through the C kernel."""
    from tcx2graph_jl_ray.functions.digest import md5_low64

    strs = np.asarray(values).astype(str).astype(object)
    return md5_low64(strs)


def register_partial(values, p: int = 12) -> np.ndarray:
    """Fold values into one 2^p register array (uint8)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = position of first set bit in the remaining bits, 1-based;
    # all-zero rest -> max rank 64-p+1
    nz = rest != 0
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    if nz.any():
        # leading zero count via float64 log2 is unsafe; use bit twiddling:
        # highest set bit position b (0-based from LSB of the 64-bit word)
        r = rest[nz]
        b = np.zeros(len(r), dtype=np.uint64)
        for shift in (32, 16, 8, 4, 2, 1):
            step = r >> np.uint64(shift)
            take = step != 0
            b[take] += np.uint64(shift)
            r = np.where(take, step, r)
        rank[nz] = (np.uint64(63) - b).astype(np.uint8) + 1
    np.maximum.at(regs, idx, rank)
    return regs


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with small/large-range corrections."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.power(2.0, -regs.astype(np.float64))
    e = alpha * m * m / inv.sum()
    if e <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            e = m * np.log(m / zeros)  # linear counting
    elif e > (1 << 32) / 30.0:
        e = -(2.0**64) * np.log(1.0 - e / 2.0**64)
    return float(e)


def approx_distinct(
    ds: ray.data.Dataset, column: str, p: int = 12, batch_size: int = 65536
) -> float:
    """Approximate COUNT(DISTINCT column) over a Dataset: per-batch register
    partials, tree-merged driver-side (each partial is 2^p bytes — bounded
    by the sketch, not the data)."""
    regs_col = f"__hll_{column}"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        regs = register_partial(batch[column].dropna().to_numpy(), p)
        return pd.DataFrame({regs_col: [regs.tobytes()]})

    merged = np.zeros(1 << p, dtype=np.uint8)
    parts = ds.select_columns([column]).map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    )
    for b in parts.iter_batches(batch_size=256, batch_format="pandas"):
        for raw in b[regs_col].to_numpy():
            merged = merge_registers(
                merged, np.frombuffer(raw, dtype=np.uint8)
            )
    return estimate(merged)
