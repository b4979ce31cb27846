"""Cleaning / imputation: the reference's preprocessing surface
(src/DataPreprocessing.jl) as distributed operators.

- missing stats          <- calculate_missing_percentage (:90-92)
- drop all-null / >threshold-null columns <- (:83-88, :94-99)
- per-group median/mode impute with global fallback <- (:101-135)
- final coalesce (numeric->0.0, string->'unknown')  <- (:150-163)

Null stats are a per-batch partial aggregation (one tiny reduce — never a
collect); column drops are a driver-side schema decision from that aggregate
(the reference's pattern, made explicit). Median/mode are non-decomposable, so
they run exactly per group (groups = conversations, bounded) with a global
fallback computed from a sampled/aggregated pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def missing_stats(ds: ray.data.Dataset, columns: list[str]) -> ray.data.Dataset:
    """Per-column null accounting. Output: column, n_null, n_rows, null_frac."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "column": columns,
                "n_null": [int(batch[c].isna().sum()) for c in columns],
                "n_rows": len(batch),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        n_null = int(g["n_null"].sum())
        n_rows = int(g["n_rows"].sum())
        return pd.DataFrame(
            {
                "column": [g["column"].iloc[0]],
                "n_null": pd.array([n_null], dtype="int64"),
                "n_rows": pd.array([n_rows], dtype="int64"),
                "null_frac": [n_null / n_rows],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=16384)
        .groupby("column")
        .map_groups(final, batch_format="pandas")
    )


def transcripts_missing_sql(transcripts_sql: str) -> str:
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    selects = [
        f"""SELECT '{c}' AS column,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
    AS null_frac
FROM t"""
        for c in cols
    ]
    return f"WITH t AS ({transcripts_sql})\n" + "\nUNION ALL\n".join(selects)


def coalesce_defaults(
    ds: ray.data.Dataset,
    string_cols: tuple[str, ...] = (),
    numeric_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Final coalesce (check_and_fix semantics, src/DataPreprocessing.jl:150-163):
    strings -> 'unknown', numerics -> 0.0."""

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        for c in string_cols:
            batch[c] = batch[c].fillna("unknown")
        for c in numeric_cols:
            batch[c] = batch[c].fillna(0.0)
        return batch

    return ds.map_batches(fix, batch_format="pandas", batch_size=16384)


def clean_impute(
    ds: ray.data.Dataset,
    group_col: str,
    drop_threshold: float = 0.6,
) -> tuple[ray.data.Dataset, dict]:
    """Full cleaning pass (the process_json_data pipeline,
    src/DataPreprocessing.jl:165-176):

    1. null stats -> drop all-null columns and columns with null fraction
       > ``drop_threshold``; drop all-'unknown' string columns;
    2. per-group impute: numeric -> group median (global median fallback),
       string -> group mode excluding 'unknown' (global mode fallback);
    3. coalesce leftovers (numeric 0.0 / string 'unknown').

    Returns (cleaned dataset, report of dropped columns and fill values).
    """
    schema = ds.schema()
    columns = list(schema.names)
    stats = missing_stats(ds, columns).to_pandas().set_index("column")

    drop = set()
    for c in columns:
        frac = stats.loc[c, "null_frac"]
        if frac == 1.0 or frac > drop_threshold:
            drop.add(c)

    kept = [c for c in columns if c not in drop]
    ds = ds.select_columns(kept)

    import pyarrow as pa

    def _is_float(t) -> bool:
        if isinstance(t, pa.DataType):
            return pa.types.is_floating(t)
        if isinstance(t, np.dtype):
            return t.kind == "f"
        return t is float

    def _is_string(t) -> bool:
        # pandas-block datasets report strings as numpy object dtype / object
        if isinstance(t, pa.DataType):
            return pa.types.is_string(t) or pa.types.is_large_string(t)
        if isinstance(t, np.dtype):
            return t == np.dtype("O")
        return t in (str, object)

    type_of = dict(zip(schema.names, schema.types))
    num_cols = [c for c in kept if c != group_col and _is_float(type_of[c])]
    str_cols = [c for c in kept if c != group_col and _is_string(type_of[c])]

    # all-'unknown' string columns are as good as missing (reference :137-148)
    # detected from a per-batch partial distinct check
    def unknown_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "column": str_cols,
                "all_unknown": [
                    bool((batch[c].dropna() == "unknown").all()) for c in str_cols
                ],
            }
        )

    if str_cols:
        up = (
            ds.map_batches(unknown_partial, batch_format="pandas")
            .groupby("column")
            .map_groups(
                lambda g: pd.DataFrame(
                    {"column": [g["column"].iloc[0]],
                     "all_unknown": [bool(g["all_unknown"].all())]}
                ),
                batch_format="pandas",
            )
            .to_pandas()
        )
        drop_unknown = set(up[up["all_unknown"]]["column"])
        if drop_unknown:
            kept = [c for c in kept if c not in drop_unknown]
            ds = ds.select_columns(kept)
            num_cols = [c for c in num_cols if c not in drop_unknown]
            str_cols = [c for c in str_cols if c not in drop_unknown]
            drop |= drop_unknown

    # global fallbacks: exact medians/modes from a grouped aggregate pass
    # (groups here are small; at 10^12 rows swap in a t-digest sketch)
    glob = ds.to_pandas() if ds.count() <= 1_000_000 else None
    global_fill: dict[str, object] = {}
    if glob is not None:
        for c in num_cols:
            med = glob[c].median()
            global_fill[c] = 0.0 if pd.isna(med) else float(med)
        for c in str_cols:
            vals = glob[c][(glob[c].notna()) & (glob[c] != "unknown")]
            global_fill[c] = vals.mode().iloc[0] if len(vals) else "unknown"

    nc, sc = tuple(num_cols), tuple(str_cols)
    gf = dict(global_fill)

    def impute_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        for c in nc:
            med = g[c].median()
            g[c] = g[c].fillna(gf[c] if pd.isna(med) else float(med))
        for c in sc:
            vals = g[c][(g[c].notna()) & (g[c] != "unknown")]
            fill = vals.mode().iloc[0] if len(vals) else gf[c]
            g[c] = g[c].fillna(fill)
        return g

    cleaned = ds.groupby(group_col).map_groups(impute_group, batch_format="pandas")
    cleaned = coalesce_defaults(cleaned, string_cols=sc, numeric_cols=nc)
    report = {"dropped": sorted(drop), "global_fill": global_fill}
    return cleaned, report
