"""Order-independent float statistics via floor-quantized exact integers.

The round-3 money fix (functions/money.py) made currency aggregates exact by
working in integer cents; this module is the same kill applied to the FLOAT
metric class (embedding means/variances/distances), where last-ULP
summation-order divergence can cross a ROUND(x, 6) boundary and fail
bit-exact parity (the ``emb_label_cohesion`` defect: 0.979233 vs 0.979232 at
sf0.001 — engine partials summed per-batch, oracle summed in DuckDB's order).

DuckDB's ``fsum`` is Kahan (compensated but NOT correctly rounded — it
disagrees with Python ``math.fsum`` on adversarial inputs, verified in this
container), so pairing fsum oracles with fsum engines does NOT give equality.
Instead the statistic itself is (re)defined on quantized inputs:

    q = FLOOR(CAST(x AS DOUBLE) * scale)        -- exact on both sides

``x * scale`` is the same IEEE double multiply in numpy and DuckDB, and
``floor`` is exact — no round-half tie-breaking ambiguity exists anywhere
(ROUND-based quantization would differ half-even vs half-away on exact .5
doubles). From there every sum is integer arithmetic: associative,
commutative, overflow-safe (int64 partials within a batch, arbitrary-
precision Python ints across batches — serialized as decimal strings in
partial frames because Arrow has no int128). One float division at the very
end, written with the SAME operation order in the engine and the SQL, makes
the two sides bit-identical by construction.

Scale note (100 TB): the per-batch kernels stay numpy-int64-vectorized; only
the cross-batch merge (one row per group) touches Python ints. A cluster
port would swap the decimal-string carrier for two-limb int64 columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_SCALE = 1_000_000.0  # 1e-6 quantum, matching the portfolio's round-6


def floor_quantize(arr: np.ndarray, scale: float = DEFAULT_SCALE) -> np.ndarray:
    """Exact, platform/order-independent quantization: floor(x * scale).

    ``x * scale`` is one IEEE-754 double multiply — identical in numpy and
    DuckDB for identical inputs — and floor of a double is exact, so the
    resulting int64 grid is bit-reproducible everywhere. |x*scale| must fit
    int64 (callers' metric spaces are O(1e7) after scaling)."""
    return np.floor(arr.astype(np.float64) * scale).astype(np.int64)


def int_to_str(x: int) -> str:
    """Serialize an arbitrary-precision partial sum for an Arrow column."""
    return str(x)


def merge_int_strs(col: pd.Series) -> int:
    """Exactly merge decimal-string partials (associative, no overflow)."""
    return sum(int(v) for v in col)


def div_round_half_away(numer: int, denom: int) -> int:
    """round(numer/denom) half-AWAY-from-zero on exact integers (denom > 0).

    The final ROUND of an integer-quantized statistic cannot be done in
    float: with integer numerators, EXACT .5 ties at the rounding position
    are common (S/n with n | 2S), and numpy rounds half-even while DuckDB
    ROUND rounds half-away — observed as one-ULP disagreements the moment
    emb_centroids moved to quantized sums. So the tie rule is made explicit
    and integer-exact; the SQL side spells the same formula:

        CASE WHEN S >= 0 THEN (2*S + D) // (2*D)
             ELSE -((2*(-S) + D) // (2*D)) END

    (operands kept non-negative because DuckDB ``//`` truncates toward
    zero while Python ``//`` floors — they agree only for non-negatives).
    The rounded integer then converts to float exactly the same way on
    both sides: CAST(m AS DOUBLE) / scale."""
    if numer >= 0:
        return (2 * numer + denom) // (2 * denom)
    return -((2 * (-numer) + denom) // (2 * denom))


def exact_ratio_round6(numer: int, denom_f: float) -> float:
    """float(numer)/denom_f rounded to 6 — the ONE float step of the
    discipline. ``float(int)`` is correctly rounded (ties-to-even), exactly
    like DuckDB's ``CAST(HUGEINT AS DOUBLE)``; callers must build
    ``denom_f`` with the same left-associative multiply chain the SQL
    spells out so both sides divide identical doubles."""
    return float(np.round(float(numer) / denom_f, 6))
