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


def clean_impute_events(sf_dir: str) -> ray.data.Dataset:
    """End-to-end cleaning pipeline over a deterministically dirtied events
    projection — the engine's analogue of the reference's golden
    segment_runs.json -> segment_runs_cleaned.csv pair
    (src/DataPreprocessing.jl:165-176): value is nulled on event_id % 7 == 0,
    event_type on event_id % 11 == 0, then per-user median/mode impute with
    distributed global fallbacks. Output: event_id, user_id, event_type,
    value (fully imputed, SQL-oracle-checkable)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    )

    def dirty(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["value"] = batch["value"].mask(batch["event_id"] % 7 == 0)
        batch["event_type"] = batch["event_type"].mask(
            batch["event_id"] % 11 == 0, None
        )
        return batch

    dirtied = ds.map_batches(dirty, batch_format="pandas", batch_size=65536)
    cleaned, _ = clean_impute(dirtied, group_col="user_id")
    return cleaned.select_columns(["event_id", "user_id", "event_type", "value"])


CLEAN_IMPUTE_EVENTS_SQL = """
WITH d AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id AS BIGINT) AS user_id,
         CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END AS event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
  FROM events
),
grp_med AS (SELECT user_id, MEDIAN(value) AS gm FROM d GROUP BY user_id),
glob_med AS (SELECT MEDIAN(value) AS m FROM d),
grp_mode AS (
  SELECT user_id, event_type AS md FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type) AS rn
    FROM d WHERE event_type IS NOT NULL AND event_type != 'unknown'
    GROUP BY user_id, event_type) WHERE rn = 1
),
glob_mode AS (
  SELECT event_type AS md FROM (
    SELECT event_type,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type) AS rn
    FROM d WHERE event_type IS NOT NULL AND event_type != 'unknown'
    GROUP BY event_type) WHERE rn = 1
)
SELECT d.event_id, d.user_id,
  COALESCE(d.event_type, gmo.md, (SELECT md FROM glob_mode), 'unknown')
    AS event_type,
  COALESCE(d.value, gme.gm, (SELECT m FROM glob_med), 0.0) AS value
FROM d
LEFT JOIN grp_med gme USING (user_id)
LEFT JOIN grp_mode gmo USING (user_id)
"""


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

    # global fallbacks: exact medians/modes computed DISTRIBUTEDLY from
    # per-batch (column, value) count partials — never a driver collect of
    # the dataset. Exactness note: the median is reconstructed from the
    # per-value count profile, which is exact at any row count; a
    # continuous column with ~n distinct values would swap the count
    # profile for a t-digest sketch.
    global_fill = _global_fills_distributed(ds, num_cols, str_cols)

    nc, sc = tuple(num_cols), tuple(str_cols)
    gf = dict(global_fill)
    gcol = group_col

    def impute_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-group impute across every group in the hash bucket
        bucket = bucket.copy()
        grp = bucket.groupby(gcol, sort=False)
        for c in nc:
            med = grp[c].transform("median")  # NaN where the group is all-null
            bucket[c] = bucket[c].fillna(med).fillna(gf.get(c, 0.0))
        for c in sc:
            known = bucket[(bucket[c].notna()) & (bucket[c] != "unknown")]
            if len(known):
                counts = (
                    known.groupby([gcol, c], sort=False).size().reset_index(name="n")
                )
                # mode tie-break = lexicographically smallest (pandas
                # Series.mode().iloc[0] semantics)
                best = (
                    counts.sort_values(["n", c], ascending=[False, True],
                                       kind="mergesort")
                    .drop_duplicates(gcol)
                    .set_index(gcol)[c]
                )
                fill = bucket[gcol].map(best)
            else:
                fill = pd.Series(None, index=bucket.index, dtype="object")
            bucket[c] = bucket[c].fillna(fill).fillna(gf.get(c, "unknown"))
        return bucket

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    cleaned = bucketed_group_apply(ds, [group_col], impute_bucket)
    cleaned = coalesce_defaults(cleaned, string_cols=sc, numeric_cols=nc)
    report = {"dropped": sorted(drop), "global_fill": global_fill}
    return cleaned, report


def _global_fills_distributed(
    ds: ray.data.Dataset, num_cols: list[str], str_cols: list[str]
) -> dict[str, object]:
    """Exact global median (numeric) / mode-excluding-'unknown' (string) per
    column via distributed (column, value) count partials + one tiny
    per-column finalize — the combiner pattern; only n_columns result rows
    ever reach the driver."""
    if not num_cols and not str_cols:
        return {}

    EMPTY = pd.DataFrame(
        {"column": pd.Series([], dtype="object"),
         "val_num": pd.Series([], dtype="float64"),
         "val_str": pd.Series([], dtype="object"),
         "n": pd.Series([], dtype="int64")}
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in num_cols:
            v = batch[c].dropna()
            if len(v):
                vc = v.value_counts()
                frames.append(
                    pd.DataFrame(
                        {"column": c,
                         "val_num": vc.index.to_numpy(dtype="float64"),
                         "val_str": None,
                         "n": vc.to_numpy().astype("int64")}
                    )
                )
        for c in str_cols:
            v = batch[c][(batch[c].notna()) & (batch[c] != "unknown")]
            if len(v):
                vc = v.value_counts()
                frames.append(
                    pd.DataFrame(
                        {"column": c, "val_num": np.nan,
                         "val_str": vc.index.to_numpy(),
                         "n": vc.to_numpy().astype("int64")}
                    )
                )
        return pd.concat(frames, ignore_index=True) if frames else EMPTY.copy()

    num_set = set(num_cols)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        c = g["column"].iloc[0]
        if c in num_set:
            vc = g.groupby("val_num")["n"].sum().sort_index()
            n = int(vc.sum())
            cum = vc.cumsum().to_numpy()
            vals = vc.index.to_numpy()
            # positions of the middle element(s) in the sorted expansion;
            # mean of the two middles == pandas/DuckDB interpolated median
            lo = vals[int(np.searchsorted(cum, (n - 1) // 2 + 1))]
            hi = vals[int(np.searchsorted(cum, n // 2 + 1))]
            return pd.DataFrame(
                {"column": [c], "fill_num": [(lo + hi) / 2.0], "fill_str": [None]}
            )
        vc = g.groupby("val_str")["n"].sum().reset_index()
        best = vc.sort_values(["n", "val_str"], ascending=[False, True],
                              kind="mergesort").iloc[0]["val_str"]
        return pd.DataFrame({"column": [c], "fill_num": [np.nan], "fill_str": [best]})

    counts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    per_col = (
        counts.groupby("column").map_groups(finalize, batch_format="pandas")
        .to_pandas()  # exactly one row per surviving column
    )
    fills: dict[str, object] = {}
    for _, row in per_col.iterrows():
        if row["column"] in num_set:
            fills[row["column"]] = float(row["fill_num"])
        else:
            fills[row["column"]] = row["fill_str"]
    return fills


def events_profile(
    events: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Column-level data profile of the events table — the data-contract
    audit a pipeline runs before trusting an input drop (null counts,
    distinct cardinalities per column; the Deequ/TFDV basic-stats shape).
    All-integer output, so the oracle parity has zero float surface.

    Distinct counting is EXACT and distributed: each batch emits its
    distinct (column, value-representation) rows — representations are
    injective per dtype (int64 epoch-us for ts, raw float64 bits for
    value), never display strings — then one bucketed shuffle dedups and
    counts per column. Null/row counts fold as per-batch partials
    (combiner). NULLs are excluded from distinct, matching
    COUNT(DISTINCT). Output: column, n_rows, n_null, n_distinct (int64).
    """
    import pyarrow as pa

    from tcx2graph_jl_ray.functions.arrowutil import with_schema
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def reps(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in COLS:
            s = batch[c]
            nn = s[s.notna()]
            if c == "ts":
                r = nn.astype("int64").astype(str)
            elif c == "value":
                # + 0.0 folds -0.0 into +0.0 BEFORE taking bits — SQL
                # DISTINCT treats them equal, distinct bit patterns don't
                r = pd.Series(
                    (nn.to_numpy(dtype="float64") + 0.0).view("int64"),
                    index=nn.index,
                ).astype(str)
            else:
                r = nn.astype(str)
            u = pd.unique(r)
            frames.append(pd.DataFrame({"column": c, "rep": u}))
        return pd.concat(frames, ignore_index=True)

    def distinct_count(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.drop_duplicates().groupby("column", sort=False).size()
        return pd.DataFrame(
            {"column": g.index.to_numpy(),
             "nd_part": g.to_numpy().astype("int64")}
        )

    # bucket on the REP so one column's values spread across buckets (a
    # column is a whale key by construction); per-column partial counts
    # then fold in a tiny second pass
    nd_parts = bucketed_group_apply(
        events.select_columns(COLS).map_batches(
            reps, batch_format="pandas", batch_size=65536
        ),
        ["column", "rep"],
        distinct_count,
        n_buckets=n_buckets,
    ).to_pandas()  # <= n_buckets x |COLS| rows
    nd = nd_parts.groupby("column")["nd_part"].sum().astype("int64")

    def null_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"column": COLS,
             "n_rows": np.full(len(COLS), len(batch), dtype="int64"),
             "n_null": np.array(
                 [int(batch[c].isna().sum()) for c in COLS], dtype="int64"
             )}
        )

    nulls = events.select_columns(COLS).map_batches(
        null_partial, batch_format="pandas", batch_size=65536
    ).to_pandas()  # |COLS| rows per batch: combiner-sized
    agg = nulls.groupby("column")[["n_rows", "n_null"]].sum()

    out = pd.DataFrame(
        {"column": COLS,
         "n_rows": [int(agg.loc[c, "n_rows"]) for c in COLS],
         "n_null": [int(agg.loc[c, "n_null"]) for c in COLS],
         "n_distinct": [int(nd.get(c, 0)) for c in COLS]}
    ).astype({"n_rows": "int64", "n_null": "int64", "n_distinct": "int64"})
    import ray.data as rd

    return with_schema(
        rd.from_pandas(out),
        [("column", pa.string()), ("n_rows", pa.int64()),
         ("n_null", pa.int64()), ("n_distinct", pa.int64())],
    )


EVENTS_PROFILE_SQL = """
SELECT 'event_id' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
UNION ALL
SELECT 'ts', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(ts) AS BIGINT),
       CAST(COUNT(DISTINCT ts) AS BIGINT) FROM events
UNION ALL
SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
       CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
UNION ALL
SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
       CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events
UNION ALL
SELECT 'value', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(value) AS BIGINT),
       CAST(COUNT(DISTINCT value) AS BIGINT) FROM events
UNION ALL
SELECT 'props', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(props) AS BIGINT),
       CAST(COUNT(DISTINCT props) AS BIGINT) FROM events
"""


def clean_winsorize(
    events: ray.data.Dataset, q_lo: float = 0.05, q_hi: float = 0.95
) -> ray.data.Dataset:
    """Winsorized mean of ``events.value`` — the outlier-robust location
    estimate a curation pipeline reports next to the raw mean (values below
    the q_lo quantile are clamped up to it, above q_hi clamped down).

    Two passes, both bounded: thresholds from ``exact_global_quantiles``
    (QUANTILE_CONT-identical, driver memory capped by collect_budget), then
    one combiner pass — per-batch counts below/above plus the mid-range sum
    in EXACT integer cents (functions/money.py), so the winsorized mean is
    one fixed-order double expression both sides:
    ((mid_cents/100 + n_lo*p_lo) + n_hi*p_hi) / n.

    Output (one row): n, p_lo, p_hi (round 6), n_lo, n_hi,
    mean_winsor (round 6)."""
    from tcx2graph_jl_ray.functions.money import cents_i64
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    vals = events.select_columns(["value"]).filter(
        lambda r: r["value"] is not None
    )
    _, quants = exact_global_quantiles(vals, "value", [q_lo, q_hi])
    p_lo, p_hi = quants[q_lo], quants[q_hi]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(dtype="float64")
        lo = v < p_lo
        hi = v > p_hi
        mid = ~lo & ~hi
        return pd.DataFrame({
            "n": pd.array([len(v)], dtype="int64"),
            "n_lo": pd.array([int(lo.sum())], dtype="int64"),
            "n_hi": pd.array([int(hi.sum())], dtype="int64"),
            "mid_c": pd.array([int(cents_i64(pd.Series(v[mid])).sum())],
                              dtype="int64"),
        })

    parts = vals.map_batches(partial, batch_format="pandas",
                             batch_size=65536)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        n_lo = int(g["n_lo"].sum())
        n_hi = int(g["n_hi"].sum())
        mid_c = int(g["mid_c"].sum())
        # fixed-order expression mirrored verbatim in the SQL oracle
        mean_w = ((mid_c / 100.0 + n_lo * p_lo) + n_hi * p_hi) / n
        return pd.DataFrame({
            "n": pd.array([n], dtype="int64"),
            "p_lo": [round(p_lo, 6)],
            "p_hi": [round(p_hi, 6)],
            "n_lo": pd.array([n_lo], dtype="int64"),
            "n_hi": pd.array([n_hi], dtype="int64"),
            "mean_winsor": [round(mean_w, 6)],
        })

    # one-row reduce: the partial frame is batch-count-bounded (4 ints per
    # batch), the house one-row pattern (value_by_type)
    return parts.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


def clean_winsorize_sql(q_lo: float = 0.05, q_hi: float = 0.95) -> str:
    return f"""
WITH q AS (
  SELECT QUANTILE_CONT(value, {q_lo}) AS p_lo,
         QUANTILE_CONT(value, {q_hi}) AS p_hi
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value < q.p_lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lo,
         CAST(SUM(CASE WHEN value > q.p_hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hi,
         SUM(CASE WHEN value >= q.p_lo AND value <= q.p_hi
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
           AS mid_c
  FROM events, q WHERE value IS NOT NULL
)
SELECT s.n, ROUND(q.p_lo, 6) AS p_lo, ROUND(q.p_hi, 6) AS p_hi,
       s.n_lo, s.n_hi,
       ROUND(((CAST(s.mid_c AS DOUBLE) / 100.0
               + CAST(s.n_lo AS DOUBLE) * q.p_lo)
              + CAST(s.n_hi AS DOUBLE) * q.p_hi)
             / CAST(s.n AS DOUBLE), 6) AS mean_winsor
FROM s, q
"""


def missing_sql_for(table: str, columns: list[str]) -> str:
    """DuckDB oracle for ``missing_stats`` over any registered table —
    one UNION ALL leg per column (column name, null count, row count,
    exact double fraction)."""
    legs = []
    for c in columns:
        legs.append(f"""
SELECT '{c}' AS column,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS null_frac
FROM {table}""")
    return "\nUNION ALL".join(legs)
