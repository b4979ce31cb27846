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


def assert_parity(ray_result, sql: str, duck, check_dtype: bool = False):
    got = canonicalize(to_pandas(ray_result))
    want = canonicalize(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=check_dtype, check_exact=True
    )
