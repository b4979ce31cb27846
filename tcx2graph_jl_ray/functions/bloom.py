"""A minimal Bloom filter for broadcast semi-joins at scale.

The zone-map semi-join (stages/analysis.py::convs_in_window) broadcasts the
qualifying key SET — fine while it fits in the object store. At 10^12 turns a
raw key set may not; a Bloom filter broadcasts in a fixed budget and admits a
bounded false-positive rate, turning the filter into a SUPERSET pre-filter
that must be followed by an exact verify (or accepted as approximate).

Stable hashing (pandas hash_pandas_object with two fixed keys) so the filter
built on the driver answers identically inside every worker.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, capacity)
        m = math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2))
        self.n_bits = max(64, m)
        self.n_hashes = max(1, round(self.n_bits / capacity * math.log(2)))
        self.bits = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    def _positions(self, keys: pd.Series) -> np.ndarray:
        """(n_keys, n_hashes) bit positions via double hashing."""
        s = keys.astype(str)
        h1 = pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=np.uint64)
        h2 = pd.util.hash_pandas_object(s, index=False, hash_key="fedcba9876543210").to_numpy(
            dtype=np.uint64
        ) | np.uint64(1)  # odd -> full period
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add(self, keys: pd.Series) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, keys: pd.Series) -> np.ndarray:
        """Vectorized membership (no false negatives)."""
        pos = self._positions(keys)
        words = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1)
