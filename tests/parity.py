"""Driver-mimicking parity check: Ray pipeline result vs DuckDB oracle SQL.

The driver sorts columns by name, then compares row count + schema + an
order-insensitive value hash. We go stricter: BIT-EXACT value equality
(``check_exact=True`` — never a relative tolerance, which would hide the
cent-boundary float divergence that failed ``rel_part_pareto`` in round 3)
after a canonical row sort, so a local pass implies a driver pass.
"""

from __future__ import annotations

import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    raise TypeError(type(result))


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def audit_encoding(got: pd.DataFrame, want: pd.DataFrame) -> None:
    """Output-ENCODING audit (round-4 verdict directive 8): value equality
    under ``check_dtype=False`` is not enough for the grading driver, whose
    value hash canonicalizes null ENCODINGS — a pandas nullable ``Int64``
    engine column hashed differently from the oracle's float64+NaN even
    though every value matched (``events_asof_join``, r4's only red row).
    So every parity check also asserts the engine output carries no
    encoding one-offs relative to the DuckDB ``fetchdf`` convention:

    - no pandas extension dtypes (Int64/boolean/Float64/categorical/tz);
    - datetime columns use the same unit as the oracle;
    - any column that is nullable IN PRACTICE (either side has nulls)
      must agree on dtype kind (float-NaN vs int is the hash hazard).
    """
    for col in got.columns:
        gd, wd = got[col].dtype, want[col].dtype
        assert not isinstance(gd, pd.api.extensions.ExtensionDtype), (
            f"column {col}: engine emits extension dtype {gd}; use the "
            f"fetchdf-compatible numpy encoding (float64+NaN for nullable "
            f"ints) — the driver's value hash treats them as different"
        )
        if pd.api.types.is_datetime64_any_dtype(gd) or (
            pd.api.types.is_datetime64_any_dtype(wd)
        ):
            assert str(gd) == str(wd), (
                f"column {col}: timestamp encoding {gd} vs oracle {wd}"
            )
        elif got[col].isna().any() or want[col].isna().any():
            gk = getattr(gd, "kind", None)
            wk = getattr(wd, "kind", None)
            assert gk == wk, (
                f"column {col} is nullable and engine kind {gk} != "
                f"oracle kind {wk} — null-encoding hash hazard"
            )


def assert_parity(ray_result, sql: str, duck, check_dtype: bool = False):
    got = canonicalize(to_pandas(ray_result))
    want = canonicalize(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    audit_encoding(got, want)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=check_dtype, check_exact=True
    )
