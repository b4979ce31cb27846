"""Boundary-adversarial tests for the exact-integer float-statistic
discipline (functions/exactsum.py) — the round-5 kill of the float
summation-order parity class (``emb_label_cohesion`` diverged from its
oracle by one ULP ACROSS the round-6 boundary at sf0.001: 0.979233 vs
0.979232, a defect invisible at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from tcx2graph_jl_ray.functions.exactsum import (
    exact_ratio_round6,
    floor_quantize,
    int_to_str,
    merge_int_strs,
)


def test_floor_quantize_matches_duckdb_bit_exact():
    """floor(x*scale) must be the identical integer in numpy and DuckDB for
    ADVERSARIAL inputs sitting exactly on and astride quantization
    boundaries — including negative values (floor != trunc) and values
    whose product x*1e6 is one ULP away from an integer."""
    xs = [
        0.5e-6, 1.5e-6, 2.5e-6, -0.5e-6, -1.5e-6,          # exact .5 grid
        1e-6, -1e-6, 0.0, -0.0,                            # exact integers
        np.nextafter(1e-6, 0), np.nextafter(1e-6, 1),      # one-ULP straddle
        0.1, -0.1, 0.3, -0.3,                              # inexact decimals
        float(np.float32(0.1546943634748459)),             # real f32 value
        123.4567895, -123.4567895,                         # .5 at 6th place
    ]
    arr = np.array(xs, dtype=np.float64)
    got = floor_quantize(arr)
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(FLOOR(CAST(? AS DOUBLE) * 1000000.0) AS BIGINT)",
            [float(x)],
        ).fetchone()[0]
        for x in xs
    ]
    assert got.tolist() == want


def test_merge_int_strs_arbitrary_precision():
    """Cross-batch partial merge must be exact far beyond int64/float64."""
    big = 2**200 + 7
    parts = pd.Series([int_to_str(big), int_to_str(-3), int_to_str(big)])
    assert merge_int_strs(parts) == 2 * big - 3


def test_div_round_half_away_ties_match_duckdb():
    """EXACT .5 ties (common with integer numerators: n | 2S) must round
    half-away on both sides — numpy's half-even would disagree. The SQL
    spells (2S+D)//(2D) with non-negative operands because DuckDB //
    truncates toward zero while Python // floors."""
    from tcx2graph_jl_ray.functions.exactsum import div_round_half_away

    con = duckdb.connect()
    for s, d in [(1, 2), (3, 2), (5, 2), (-1, 2), (-3, 2), (-5, 2),
                 (7, 4), (-7, 4), (0, 3), (10, 3), (-10, 3),
                 (2**70 + 1, 2), (-(2**70 + 1), 2)]:
        got = div_round_half_away(s, d)
        want = con.execute(
            "SELECT CASE WHEN CAST(? AS HUGEINT) >= 0"
            " THEN (2 * CAST(? AS HUGEINT) + CAST(? AS HUGEINT))"
            "      // (2 * CAST(? AS HUGEINT))"
            " ELSE -((2 * (-CAST(? AS HUGEINT)) + CAST(? AS HUGEINT))"
            "        // (2 * CAST(? AS HUGEINT))) END",
            [str(s), str(s), str(d), str(d), str(s), str(d), str(d)],
        ).fetchone()[0]
        assert int(got) == int(want), (s, d, got, want)


def test_exact_ratio_round6_matches_duckdb_cast_divide():
    """float(int)/denom rounded 6 must equal DuckDB's
    ROUND(CAST(h AS DOUBLE)/denom, 6) — the ONE float step both sides
    share. Uses a numerator needing >53 bits so CAST rounding is live."""
    t = 2**80 + 2**27 + 1  # not exactly representable as double
    denom = 125.0 * 125.0 * 125.0 * 1e12
    got = exact_ratio_round6(t, denom)
    con = duckdb.connect()
    want = con.execute(
        "SELECT ROUND(CAST(CAST(? AS HUGEINT) AS DOUBLE) /"
        " (CAST(125 AS DOUBLE) * CAST(125 AS DOUBLE) * CAST(125 AS DOUBLE)"
        "  * 1000000000000.0), 6)",
        [str(t)],
    ).fetchone()[0]
    assert got == want


def _cohesion_df(order: np.ndarray) -> pd.DataFrame:
    """A planted embeddings frame ENGINEERED so the legacy float-sum path
    is order-dependent: coordinates mix magnitudes (1e8-scale and 1e-8-
    scale float32s) whose naive float64 sum depends on addition order,
    with a centroid quotient landing within one ULP of a .xxxxx5
    round-6 boundary. The exact-integer path must be invariant under any
    row permutation AND any batch split."""
    rng = np.random.default_rng(7)
    n, d = 40, 8
    base = rng.standard_normal((n, d)).astype(np.float32)
    base[:, 0] += np.float32(1e8)          # huge head coordinate
    base[: n // 2, 1] = np.float32(1e-8)   # tiny tail coordinates
    base[n // 2:, 1] = np.float32(-1e-8)
    # drive the mean of dim 2 onto a 6-decimal .5 boundary
    base[:, 2] = np.float32(0.0000005 * 3)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64")[order],
        "embedding": [base[i].copy() for i in order],
        "label": (np.arange(n, dtype="int32") % 3)[order],
    })


def test_label_cohesion_order_and_batch_invariant(ray_session):
    """label_cohesion must produce BIT-IDENTICAL results for permuted row
    orders and hostile batch splits (override_num_blocks 1 vs 13), and
    match its DuckDB oracle on the planted adversarial frame."""
    from tcx2graph_jl_ray.stages.ann import LABEL_COHESION_SQL, label_cohesion
    from tests.parity import assert_parity

    rng = np.random.default_rng(11)
    results = []
    for order, blocks in [
        (np.arange(40), 1),
        (rng.permutation(40), 13),
        (np.arange(39, -1, -1), 5),
    ]:
        df = _cohesion_df(np.asarray(order))
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = (
            label_cohesion(ds).to_pandas()
            .sort_values("label").reset_index(drop=True)
        )
        results.append(out)
    for other in results[1:]:
        pd.testing.assert_frame_equal(results[0], other, check_exact=True)

    con = duckdb.connect()
    con.register("embeddings_pd", _cohesion_df(np.arange(40)))
    con.execute(
        "CREATE VIEW embeddings AS "
        "SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, label "
        "FROM embeddings_pd"
    )
    ds = ray.data.from_pandas(_cohesion_df(np.arange(40))).repartition(7)
    assert_parity(label_cohesion(ds), LABEL_COHESION_SQL, con)


def test_asof_join_null_encoding_is_fetchdf_compatible(ray_session, duck):
    """Regression for r4's only red driver row: matched_event_id must come
    back float64+NaN (DuckDB fetchdf's encoding of nullable BIGINT), never
    pandas nullable Int64 — the driver's value hash distinguishes the two
    encodings even at equal values."""
    from tcx2graph_jl_ray.stages.window import asof_join_events

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    df = asof_join_events(ds).to_pandas()
    assert df["matched_event_id"].dtype == np.dtype("float64")
    assert not any(
        isinstance(t, pd.api.extensions.ExtensionDtype) for t in df.dtypes
    )
