"""Batched md5 digests at C speed with bit-exact oracle parity.

Several operators are md5-DEFINED — deterministic splits/samples
(``docs_split_assign``, ``kg_sample_turns``), content fingerprints,
conversation digests, MinHash's hash family — so the digest cannot be
swapped for a faster non-cryptographic hash without changing results. What
CAN go is the per-row Python ``hashlib`` call: this module evaluates the
whole batch through an in-process DuckDB kernel (the same engine the oracle
runs on, so agreement is by construction), Arrow in / Arrow out. Measured at
200k rows: hex 2.1× faster than the hashlib loop, 64-bit numeric form 5.5×.

Each worker process keeps one lazily-created connection; projection scans
preserve row order (DuckDB ``preserve_insertion_order``, default on).
"""

from __future__ import annotations

import numpy as np

_CON = None


def _con():
    global _CON
    if _CON is None:
        import duckdb

        _CON = duckdb.connect()
    return _CON


def _as_arrow_table(values):
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        arr = values
    elif isinstance(values, pa.Array):
        arr = values
    else:
        arr = pa.array(np.asarray(values, dtype=object), type=pa.string())
    return pa.table({"s": arr})


def md5_hex(values) -> np.ndarray:
    """Row-wise ``md5(s)`` hexdigest (identical to ``hashlib.md5(
    s.encode()).hexdigest()`` and DuckDB ``md5(s)``). Returns an object
    ndarray aligned with the input."""
    if len(values) == 0:
        return np.array([], dtype=object)
    tbl = _as_arrow_table(values)  # noqa: F841 — scanned by name below
    out = _con().execute("SELECT md5(s) AS h FROM tbl").fetch_arrow_table()
    return out["h"].to_numpy(zero_copy_only=False)


def md5_low64(values) -> np.ndarray:
    """Row-wise lower 64 bits of md5 as uint64 — identical to
    ``int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")`` and
    DuckDB ``md5_number_lower(s)``."""
    if len(values) == 0:
        return np.array([], dtype=np.uint64)
    tbl = _as_arrow_table(values)  # noqa: F841
    out = _con().execute("SELECT md5_number_lower(s) AS h FROM tbl").fetchnumpy()
    return out["h"].astype(np.uint64)
