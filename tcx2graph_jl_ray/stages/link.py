"""Entity linking: canonical entities -> knowledge-base attributes.

Analogue of the reference's nearest-way OSM attribute attach
(src/TCXParser.jl:188-265, ``assign_road_features!``): a small side table is
broadcast once and each record gets its KB attributes by lookup — never a
shuffle join. Here the KB is the nation/region dimension (the vocabulary the
planted surface forms derive from); linking is by normalized-name equality.
"""

from __future__ import annotations

import pandas as pd
import ray

from tcx2graph_jl_ray.stages.extract import normalize_surface


def load_kb(sf_dir: str) -> pd.DataFrame:
    """nation ⋈ region -> DataFrame[kb_norm, kb_nationkey, kb_region]."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    kb = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    return pd.DataFrame(
        {
            "kb_norm": kb["n_name"].map(normalize_surface),
            "kb_nationkey": kb["n_nationkey"].astype("int32"),
            "kb_region": kb["r_name"],
        }
    )


def link_entities(entities, kb: pd.DataFrame):
    """entities (entity_id = canonical surface) -> + kb_nationkey, kb_region.

    The canonical id is already a normalized surface; unlinked entities keep
    null KB columns (the reference's get_or_missing semantics,
    src/TCXParser.jl:117-119).

    Accepts a pandas DataFrame (vocabulary-bounded path) or a
    ``ray.data.Dataset`` (web-scale path above ``broadcast_map_budget``):
    the KB is dimension-bounded, so the Dataset form applies the same merge
    per batch with the KB shipped once in the task closure — a broadcast
    join, never a shuffle.
    """
    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.merge(kb, left_on="entity_id", right_on="kb_norm", how="left")
        out = out.drop(columns=["kb_norm"])
        # fetchdf-mimicking encoding (never extension Int32 — the driver's
        # value hash canonicalizes extension nulls differently, the r4
        # events_asof_join defect class): int32 while fully linked,
        # float64+NaN once an unlinked entity appears — exactly what the
        # oracle's nullable-INTEGER column comes back as. Entity tables are
        # vocabulary-bounded, so the per-batch decision is global in
        # practice; a mixed multi-block output promotes to float64 at
        # concat, which is also fetchdf's null-present encoding.
        k = out["kb_nationkey"]
        out["kb_nationkey"] = (
            k.astype("float64") if k.isna().any() else k.astype("int32")
        )
        return out

    import ray.data

    if isinstance(entities, ray.data.Dataset):
        return entities.map_batches(_merge, batch_format="pandas")
    return _merge(entities)


class CachedEnricher:
    """Per-actor cached lookup stage — the weather-cache pattern (ST3,
    src/TCXParser.jl:267-355): rows are quantized to a cache key, each batch
    deduplicates its keys, and the expensive ``fetch_fn`` runs ONCE per unique
    key per actor (cache held for the actor's lifetime). Use for feature
    services / model lookups where the key space is much smaller than the
    row stream.

    ``fetch_fn(key) -> dict`` must be deterministic; its result columns are
    attached to every row sharing the key.

    Failure policy (the reference's 3-attempt backoff + rate-limit sleep,
    examples/updateWeatherNeo4j.jl:182-212): each fetch is retried
    ``max_attempts`` times with linear backoff before the error propagates
    (Ray then retries the task), so one transient service blip doesn't kill
    a batch.
    """

    def __init__(self, key_fn, fetch_fn, max_attempts: int = 3,
                 backoff_s: float = 0.1):
        self.key_fn = key_fn        # batch -> Series of cache keys
        self.fetch_fn = fetch_fn    # key -> dict of enrichment values
        self.cache: dict = {}
        self.fetches = 0            # observable for tests/metrics
        self.attempts = 0           # total fetch attempts incl. retries
        self.max_attempts = max_attempts
        self.backoff_s = backoff_s

    def _fetch_with_retry(self, key):
        import time

        last = None
        for attempt in range(self.max_attempts):
            self.attempts += 1
            try:
                return self.fetch_fn(key)
            except Exception as exc:  # transient service failure
                last = exc
                if attempt + 1 < self.max_attempts:
                    time.sleep(self.backoff_s * (attempt + 1))
        raise last

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # normalize NaN keys to None: distinct float('nan') objects neither
        # hash nor compare equal, so a raw NaN key would poison the cache
        # (dirty inputs are allowed by the input contract)
        keys = [None if pd.isna(k) else k for k in self.key_fn(batch)]
        for k in set(keys):
            if k not in self.cache:
                self.cache[k] = self._fetch_with_retry(k)
                self.fetches += 1
        enrich = pd.DataFrame([self.cache[k] for k in keys], index=batch.index)
        out = batch.copy()
        for c in enrich.columns:
            out[c] = enrich[c]
        return out


LINKED_ENTITIES_SQL_TEMPLATE = r"""
WITH ents AS ({entities})
SELECT e.entity_id, e.n_surfaces, e.n_turns, e.n_mentions,
       n.n_nationkey AS kb_nationkey,
       r.r_name AS kb_region
FROM ents e
LEFT JOIN nation n
  ON trim(regexp_replace(lower(n.n_name), '[^a-z0-9]+', ' ', 'g')) = e.entity_id
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def enrich_events_cached(sf_dir: str) -> "ray.data.Dataset":
    """Driver-checkable exercise of the ``CachedEnricher`` actor pool (M9/ST3,
    the weather-cache pattern src/TCXParser.jl:267-355): every event is
    quantized to its (event_type, hour-of-day) cache key — a key space of
    |types| × 24, orders of magnitude below the row stream, exactly the
    regime the per-actor cache targets — and enriched with the key's
    deterministic service payload (peak-hour flag + a type code). The
    lookup itself is deterministic so DuckDB reproduces the VALUES while the
    engine path still runs the real machinery: actor pool, per-batch key
    dedup, per-actor cache, retry wrapper.

    Output: event_id, event_type, hour:int64, peak:bool, type_code:int64.
    """
    import ray.data

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "ts"]
    )

    def add_hour(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "event_type": batch["event_type"],
                "hour": batch["ts"].dt.hour.astype("int64"),
            }
        )

    def key_fn(batch: pd.DataFrame) -> pd.Series:
        return batch["event_type"] + "\x1f" + batch["hour"].astype(str)

    def fetch_fn(key: str) -> dict:
        etype, hour = key.split("\x1f")
        return {"peak": 8 <= int(hour) <= 17, "type_code": len(etype)}

    enriched = events.map_batches(add_hour, batch_format="pandas").map_batches(
        CachedEnricher,
        fn_constructor_args=(key_fn, fetch_fn),
        batch_format="pandas",
        batch_size=8192,
        concurrency=(1, 4),
    )

    def conform(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["type_code"] = batch["type_code"].astype("int64")
        return batch

    return enriched.map_batches(conform, batch_format="pandas")


ENRICH_EVENTS_SQL = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       event_type,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       EXTRACT(hour FROM ts) BETWEEN 8 AND 17 AS peak,
       CAST(len(event_type) AS BIGINT) AS type_code
FROM events
"""


def kb_coverage(entities_linked) -> "pd.DataFrame":
    """Linkage-quality rollup over the KB-linked entity table: per KB
    region (unlinked entities fold into the 'UNLINKED' row) the entity and
    mention counts and the entity share — the one-screen answer to "how
    much of the graph did the KB actually cover" (reference's
    get_or_missing accounting, src/TCXParser.jl:117-119, aggregated).
    Input may be the vocabulary-bounded pandas form or the Dataset form
    of ``link_entities``; the rollup is region-bounded either way. Share
    is one division of exact ints, rounded 6. Output: kb_region,
    n_entities, n_mentions, entity_share."""
    import numpy as np
    import ray.data

    if isinstance(entities_linked, ray.data.Dataset):
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            d = pd.DataFrame({
                "kb_region": b["kb_region"].fillna("UNLINKED"),
                "n_entities": np.int64(1),
                "n_mentions": b["n_mentions"].astype("int64"),
            })
            return d.groupby("kb_region", sort=False).sum().reset_index()

        parts = entities_linked.map_batches(
            partial, batch_format="pandas", batch_size=65536
        ).to_pandas()  # region-bounded partials
        g = parts.groupby("kb_region", sort=False).sum().reset_index()
    else:
        d = pd.DataFrame({
            "kb_region": entities_linked["kb_region"].fillna("UNLINKED"),
            "n_entities": 1,
            "n_mentions": entities_linked["n_mentions"].astype("int64"),
        })
        g = d.groupby("kb_region", sort=False).sum().reset_index()
    import numpy as np

    tot = float(g["n_entities"].sum())
    return pd.DataFrame({
        "kb_region": g["kb_region"],
        "n_entities": g["n_entities"].astype("int64"),
        "n_mentions": g["n_mentions"].astype("int64"),
        "entity_share": np.round(
            g["n_entities"].to_numpy(dtype="float64") / tot, 6
        ),
    })


KB_COVERAGE_SQL_TEMPLATE = r"""
WITH linked AS ({linked}),
c AS (
  SELECT COALESCE(kb_region, 'UNLINKED') AS kb_region,
         COUNT(*) AS ne, SUM(n_mentions) AS nm
  FROM linked GROUP BY 1
)
SELECT kb_region, CAST(ne AS BIGINT) AS n_entities,
       CAST(nm AS BIGINT) AS n_mentions,
       ROUND(CAST(ne AS DOUBLE) / SUM(CAST(ne AS DOUBLE)) OVER (), 6)
         AS entity_share
FROM c
"""
