"""Bucketed grouping: the high-cardinality groupby pattern.

Ray Data's ``groupby().map_groups``/aggregate pays a fixed per-group cost, so
a key with many distinct values (conversations, content digests, candidate
pairs) is orders of magnitude slower than the same reduction done as:

    hash(key) % n_buckets  ->  groupby(bucket)  ->  vectorized pandas
                                                    groupby(key) inside

Correctness is preserved because hashing co-locates every row of a key in
exactly one bucket; the shuffle then moves n_buckets groups regardless of key
cardinality. This is also the 100 TB shape: n_buckets is sized to the
cluster, and a hot key can be salted into sub-buckets *within* its bucket_fn
when a single key exceeds a worker (config.salt_buckets).

Hash is process-stable (pandas hash_pandas_object fixed key — never builtin
``hash``, which is salted per process).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import ray.data

BUCKET_COL = "__bucket"


def add_bucket(
    batch: pd.DataFrame, keys: Sequence[str], n_buckets: int
) -> pd.DataFrame:
    k = batch[keys[0]].astype(str)
    for extra in keys[1:]:
        k = k + "\x1f" + batch[extra].astype(str)
    batch = batch.copy()
    batch[BUCKET_COL] = (
        pd.util.hash_pandas_object(k, index=False) % n_buckets
    ).astype("int64")
    return batch


def bucketed_group_apply(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
    batch_size: int = 32768,
) -> ray.data.Dataset:
    """Apply ``bucket_fn`` to each hash bucket of ``keys``.

    ``bucket_fn`` receives ALL rows of every key hashed into the bucket (keys
    are complete, order arbitrary) and must do its own vectorized per-key
    logic (``df.groupby(keys)`` inside — pandas, not Ray, pays the per-key
    cost there, vectorized).
    """
    keys = list(keys)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return add_bucket(batch, keys, n_buckets)

    def run(group: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(group.drop(columns=[BUCKET_COL]))

    return (
        ds.map_batches(tag, batch_format="pandas", batch_size=batch_size)
        .groupby(BUCKET_COL)
        .map_groups(run, batch_format="pandas")
    )


def salted_group_apply(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
    salt_buckets: int = 16,
    batch_size: int = 32768,
) -> ray.data.Dataset:
    """Whale-key-safe two-level bucketed aggregate (``config.salt_buckets``).

    ``bucketed_group_apply`` lands EVERY row of a key in one task — a key
    larger than a worker (one conversation/user with more rows than fit in a
    heap) sinks that task. Here level 1 hashes ``(keys, salt)`` with a
    row-position salt, so a whale key's rows split across ``salt_buckets``
    tasks, each applying ``partial_fn`` — a per-key PARTIAL aggregate over
    the rows it sees (must be order-free/algebraic: count partials, sum
    partials, min/max, distinct subsets...). Level 2 re-buckets the partial
    rows by ``keys`` alone and applies ``merge_fn``; by then each key
    contributes at most ``salt_buckets × partial-rows-per-key`` rows, bounded
    regardless of the key's raw row count.

    Order-DEPENDENT per-key logic cannot salt transparently — slice on the
    order key with a boundary carry instead (``assign_turn_idx_sliced`` in
    sources/transcripts.py, ``cumulative_tokens_chunked`` in stages/graph.py
    are the two shipped shapes).
    """
    keys = list(keys)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        # The salt OFFSETS within the same n_buckets space rather than
        # multiplying it: level-1 partials are algebraic over ARBITRARY row
        # subsets (partial_fn groups by the real keys inside), so level-1
        # groups need no key co-location — only the bound matters. A whale
        # key still splits across min(salt_buckets, n_buckets) groups
        # (<= salt_buckets partial rows per key into level 2, unchanged),
        # but the level-1 exchange stays at n_buckets Ray groups instead of
        # n_buckets x salt_buckets — measured 15x cheaper on the benchmark's
        # conv_stats at sf0.1 (1024-group map_groups dominated the stage).
        b = add_bucket(batch, keys, n_buckets)
        salt = np.arange(len(b)) % salt_buckets
        b[BUCKET_COL] = ((b[BUCKET_COL] + salt) % n_buckets).astype("int64")
        return b

    def run_partial(group: pd.DataFrame) -> pd.DataFrame:
        return partial_fn(group.drop(columns=[BUCKET_COL]))

    level1 = (
        ds.map_batches(tag, batch_format="pandas", batch_size=batch_size)
        .groupby(BUCKET_COL)
        .map_groups(run_partial, batch_format="pandas")
    )
    return bucketed_group_apply(
        level1, keys, merge_fn, n_buckets=n_buckets, batch_size=batch_size
    )
