"""Count-min sketch — the heavy-hitter gate for streams whose key domain
cannot shuffle (a 10^11-word token stream has a vocabulary that dwarfs any
exchange budget, but its φ-frequent words number at most 1/φ).

Shape mirrors functions/hll.py: each batch folds into one fixed d×w counter
array (the shipped object is d·w·8 bytes regardless of rows); partials merge
by elementwise ADD, associative/commutative, so the reduce is a tree of tiny
arrays. The sketch only ever OVERcounts (hash collisions add, never
subtract), which is the guarantee the two-pass exact heavy-hitters operator
leans on: filtering on sketch-estimate >= T yields a SUPERSET of the truly
>= T keys, and the exact second pass over that bounded superset makes the
final answer exact (stages/text.py heavy_hitter_words).

Hashing is process-stable (pandas hash_pandas_object fixed key), with the d
row-hashes derived as independent affine mixes of one 64-bit value hash over
the Mersenne prime 2^61-1 — the same family as the MinHash permutations
(functions/minhash.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = np.uint64((1 << 61) - 1)


def _row_params(depth: int, seed: int = 11) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=depth, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=depth, dtype=np.uint64)
    return a, b


def _columns(values: pd.Series, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices for each value."""
    h = pd.util.hash_pandas_object(values, index=False).to_numpy(dtype=np.uint64)
    a, b = _row_params(depth)
    cols = np.empty((depth, len(h)), dtype=np.int64)
    for i in range(depth):
        mixed = (a[i] * h + b[i]) % _MERSENNE
        cols[i] = (mixed % np.uint64(width)).astype(np.int64)
    return cols


def cms_partial(
    values: pd.Series, depth: int = 4, width: int = 16384
) -> np.ndarray:
    """Fold a batch of values into one (depth, width) int64 counter array."""
    regs = np.zeros((depth, width), dtype=np.int64)
    if not len(values):
        return regs
    cols = _columns(values, depth, width)
    for i in range(depth):
        np.add.at(regs[i], cols[i], 1)
    return regs


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_estimate(regs: np.ndarray, values: pd.Series) -> np.ndarray:
    """Upper-bound count per value: min over the d rows (classic CMS read).
    Never below the true count."""
    if not len(values):
        return np.array([], dtype=np.int64)
    depth, width = regs.shape
    cols = _columns(values, depth, width)
    est = regs[0][cols[0]]
    for i in range(1, depth):
        est = np.minimum(est, regs[i][cols[i]])
    return est
