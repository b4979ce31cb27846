"""Generic distributed equi-join: co-partitioned bucketed hash join.

Every join shipped so far broadcast a small side (`ray.put` dim tables,
canonical maps, Bloom-gated text carriers). This is the complementary
primitive for the case with NO small side — fact x fact at 100 TB, where
the only correct shape is to co-partition BOTH inputs by the join key and
merge key-locally:

    tag side -> conform to union schema -> union -> one shuffle on
    hash(key) % n_buckets -> pandas merge inside each bucket

One all-to-all exchange total (both sides move once), n_buckets groups
regardless of key cardinality (the bucketed-groupby finding), vectorized
merge inside. Reference analogue: the candidate/verify gather of
src/OverlappingSegmentsUtils.jl:173-274, generalized from (pair, doc) to
arbitrary relations.

Schema discipline: Ray blocks must agree across the union, so each side's
missing columns are added as typed ALL-NULL columns (pandas nullable
dtypes derived from the other side's Arrow schema) — never object-dtype
None, which would poison numeric columns through the shuffle.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

_SIDE = "__join_side"


def _nullable_dtype(t) -> str | object:
    """Pandas dtype that can carry ALL-NULL for a column type without
    changing the dtype of real values on the other side after pd.concat.
    ``t`` is an Arrow DataType (Arrow-backed blocks) or a numpy/pandas
    dtype (``schema()`` of pandas-backed blocks reports those)."""
    if isinstance(t, pa.DataType):
        if pa.types.is_integer(t):
            return "Int64"
        if pa.types.is_floating(t):
            return "Float64"
        if pa.types.is_boolean(t):
            return "boolean"
        if pa.types.is_timestamp(t):
            return f"datetime64[{t.unit}]"
        return object  # strings, lists, binaries
    dt = pd.api.types.pandas_dtype(t)
    if pd.api.types.is_integer_dtype(dt):
        return "Int64"
    if pd.api.types.is_float_dtype(dt):
        return "Float64"
    if pd.api.types.is_bool_dtype(dt):
        return "boolean"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return dt
    return object


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | Sequence[str],
    how: str = "inner",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Join two Datasets on equal key column names (rename beforehand, as in
    SQL ``USING``). Non-key columns must be disjoint across sides — the
    caller aliases, exactly like a SELECT list.

    ``how``: inner / left / right. Rows with a NULL key never match (SQL
    semantics — pandas would match NaN to NaN, so null-key rows are split
    out before the merge and re-emitted only for outer sides)."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "right"):
        raise ValueError(f"unsupported how={how!r}")

    lschema, rschema = left.schema(), right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    overlap = (set(lcols) & set(rcols)) - set(keys)
    if overlap:
        raise ValueError(f"non-key columns on both sides: {sorted(overlap)}")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def conform(own_cols, other_types, side):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.reset_index(drop=True)
            out = {c: batch[c] for c in own_cols}
            for c in all_cols:
                if c not in own_cols:
                    out[c] = pd.Series(
                        pd.NA, index=batch.index,
                        dtype=_nullable_dtype(other_types[c]),
                    )
            out[_SIDE] = pd.Series(
                np.full(len(batch), side, dtype=np.int64), index=batch.index
            )
            return pd.DataFrame(out)[all_cols + [_SIDE]]

        return fn

    tagged = left.map_batches(
        conform(lcols, rtypes, 0), batch_format="pandas", batch_size=32768
    ).union(
        right.map_batches(
            conform(rcols, ltypes, 1), batch_format="pandas", batch_size=32768
        )
    )

    l_payload = [c for c in lcols if c not in keys]
    r_payload = [c for c in rcols if c not in keys]

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        lf = bucket.loc[bucket[_SIDE] == 0, keys + l_payload]
        rf = bucket.loc[bucket[_SIDE] == 1, keys + r_payload]
        lnull = lf[keys].isna().any(axis=1)
        rnull = rf[keys].isna().any(axis=1)
        merged = lf[~lnull].merge(rf[~rnull], on=keys, how=how)
        parts = [merged]
        if how == "left" and lnull.any():
            parts.append(lf[lnull].reindex(columns=merged.columns))
        if how == "right" and rnull.any():
            parts.append(rf[rnull].reindex(columns=merged.columns))
        return pd.concat(parts, ignore_index=True) if len(parts) > 1 else merged

    return bucketed_group_apply(tagged, keys, merge_bucket, n_buckets=n_buckets)
