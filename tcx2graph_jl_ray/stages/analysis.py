"""KG analysis operators over transcripts / mentions / entities.

Recasts the reference's analysis surface:

- per-conversation stats          <- segment characteristics + coverage
  (src/SegmentAnalysis.jl:32-146, src/GraphUtils.jl:18-103)
- hot entities                    <- hotspot-grid best-reference scan
  (src/GraphUtils.jl:117-189, ``find_best_ref_ride``)
- entity co-occurrence edges      <- run-transition edge table
  (src/DataPreprocessing.jl:330-397)
- next-entity transitions         <- ordered run pairing with gap filter
  (src/DataPreprocessing.jl:345-367)
- two-hop entity paths            <- segment path-finding BFS
  (src/PathFinder.jl:36-149)

Each operator takes its inputs as Datasets plus the (small, broadcast)
canonical map produced by stages/canonicalize.py.
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data

from tcx2graph_jl_ray.config import DEFAULT_CONFIG, PipelineConfig


class _AttachEntity:
    """Broadcast lookup: mention norm -> canonical entity_id (no shuffle)."""

    def __init__(self, map_ref):
        cm = ray.get(map_ref)
        self.lookup = dict(zip(cm["norm"], cm["entity_id"]))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        lk = self.lookup
        batch["entity_id"] = pd.Series(
            [lk.get(n, n) for n in batch["norm"].to_numpy()],
            index=batch.index,
            dtype="object",
        )
        return batch


def attach_entities(
    mentions: ray.data.Dataset, canonical_map: pd.DataFrame, concurrency=(1, 8)
) -> ray.data.Dataset:
    map_ref = ray.put(canonical_map)
    return mentions.map_batches(
        _AttachEntity,
        fn_constructor_args=(map_ref,),
        batch_format="pandas",
        batch_size=16384,
        concurrency=concurrency,
    )


def conv_stats(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation node/property aggregation (the A10-style grouped
    aggregate): turn counts by role, span, duration."""

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"]
        return pd.DataFrame(
            {
                "conv_id": [g["conv_id"].iloc[0]],
                "n_turns": pd.array([len(g)], dtype="int64"),
                "n_user": pd.array([int((g["role"] == "user").sum())], dtype="int64"),
                "n_assistant": pd.array(
                    [int((g["role"] == "assistant").sum())], dtype="int64"
                ),
                "n_tool": pd.array([int((g["role"] == "tool").sum())], dtype="int64"),
                "first_ts": [ts.min()],
                "last_ts": [ts.max()],
                "duration_us": pd.array(
                    [int((ts.max() - ts.min()).value // 1000)], dtype="int64"
                ),
            }
        )

    return transcripts.groupby("conv_id").map_groups(per_conv, batch_format="pandas")


def hot_entities(
    mentions_with_entity: ray.data.Dataset, min_convs: int = 2
) -> ray.data.Dataset:
    """Entities mentioned in >= min_convs distinct conversations, with counts —
    the hotspot scan (cells visited by >= K rides, src/GraphUtils.jl:117-189).

    Two-phase distinct-count: groupby (entity, conv) first (pre-aggregation),
    then groupby entity — never a global count-distinct on raw mentions.
    """
    per_conv = mentions_with_entity.groupby(["entity_id", "conv_id"]).count()

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "entity_id": [g["entity_id"].iloc[0]],
                "n_convs": pd.array([len(g)], dtype="int64"),
                "n_turns": pd.array([int(g["count()"].sum())], dtype="int64"),
            }
        )

    agg = per_conv.groupby("entity_id").map_groups(finalize, batch_format="pandas")

    def keep_hot(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n_convs"] >= min_convs]

    return agg.map_batches(keep_hot, batch_format="pandas")


def cooccurrence_edges(mentions_with_entity: ray.data.Dataset) -> ray.data.Dataset:
    """Undirected entity co-occurrence edges weighted by shared conversations
    (the graph whose paths the reference's path-finder walks,
    src/PathFinder.jl:36-149). Output: src, dst (src < dst), n_convs."""
    distinct = mentions_with_entity.groupby(["conv_id", "entity_id"]).count()

    def pairs_in_conv(g: pd.DataFrame) -> pd.DataFrame:
        ents = sorted(g["entity_id"].unique())
        src, dst = [], []
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                src.append(ents[i])
                dst.append(ents[j])
        return pd.DataFrame({"src": src, "dst": dst})

    pairs = distinct.groupby("conv_id").map_groups(
        pairs_in_conv, batch_format="pandas"
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": [g["src"].iloc[0]],
                "dst": [g["dst"].iloc[0]],
                "n_convs": pd.array([len(g)], dtype="int64"),
            }
        )

    return pairs.groupby(["src", "dst"]).map_groups(finalize, batch_format="pandas")


def entity_transitions(
    mentions_with_entity: ray.data.Dataset,
    max_turn_gap: int = 5,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Directed next-entity transitions: per conversation, order mention turns
    by turn_idx and pair consecutive ones within ``max_turn_gap`` turns —
    the run-transition builder (src/DataPreprocessing.jl:330-397: sort runs by
    start_time, pair consecutive, filter by max_gap).
    Output: from_entity, to_entity, n (count over the corpus)."""

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="mergesort")
        src = g.iloc[:-1]
        dst = g.iloc[1:]
        gap_ok = (dst["turn_idx"].to_numpy() - src["turn_idx"].to_numpy()) <= max_turn_gap
        return pd.DataFrame(
            {
                "from_entity": src["entity_id"].to_numpy()[gap_ok],
                "to_entity": dst["entity_id"].to_numpy()[gap_ok],
            }
        )

    pairs = mentions_with_entity.groupby("conv_id").map_groups(
        per_conv, batch_format="pandas"
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "from_entity": [g["from_entity"].iloc[0]],
                "to_entity": [g["to_entity"].iloc[0]],
                "n": pd.array([len(g)], dtype="int64"),
            }
        )

    return pairs.groupby(["from_entity", "to_entity"]).map_groups(
        finalize, batch_format="pandas"
    )


def reachable_pairs(
    transitions: ray.data.Dataset, min_n: int = 2
) -> ray.data.Dataset:
    """Entity pairs reachable within <= 2 hops over the directed transition
    graph, keeping only edges observed at least ``min_n`` times — the
    path-finding analogue (src/PathFinder.jl:36-149: BFS over segments that
    satisfy ``min_runs``, here min_n). Output: src, dst, hops (1 or 2).

    Distributed shape: direct edges filter in map_batches; 2-hop pairs via a
    groupby on the middle node (every in-edge × out-edge of the pivot); min
    hops via a final grouped Min — no driver-side graph walk."""

    def strong(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[(batch["n"] >= min_n) & (batch["from_entity"] != batch["to_entity"])]
        return pd.DataFrame({"src": keep["from_entity"], "dst": keep["to_entity"]})

    # Materialize at the branch point: edges feed BOTH the one-hop and the
    # two-hop branch; without pinning, each branch re-executes the whole
    # upstream plan (duplicate actor pools — deadlock-prone and 2x work).
    # The filtered canonical-entity edge list is small by construction.
    edges = transitions.map_batches(strong, batch_format="pandas").materialize()

    def to_pivot(batch: pd.DataFrame) -> pd.DataFrame:
        # each edge participates as an in-edge (pivot=dst) and out-edge (pivot=src)
        return pd.DataFrame(
            {
                "pivot": pd.concat([batch["dst"], batch["src"]], ignore_index=True),
                "node": pd.concat([batch["src"], batch["dst"]], ignore_index=True),
                "dir": ["in"] * len(batch) + ["out"] * len(batch),
            }
        )

    def pivot_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ins = g.loc[g["dir"] == "in", "node"].unique()
        outs = g.loc[g["dir"] == "out", "node"].unique()
        src, dst = [], []
        for a in ins:
            for b in outs:
                if a != b:
                    src.append(a)
                    dst.append(b)
        return pd.DataFrame(
            {"src": src, "dst": dst, "hops": pd.array([2] * len(src), dtype="int64")}
        )

    two_hop = edges.map_batches(to_pivot, batch_format="pandas").groupby(
        "pivot"
    ).map_groups(pivot_pairs, batch_format="pandas")

    one_hop = edges.map_batches(
        lambda b: b.assign(hops=pd.array([1] * len(b), dtype="int64")),
        batch_format="pandas",
    )

    def min_hops(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": [g["src"].iloc[0]],
                "dst": [g["dst"].iloc[0]],
                "hops": pd.array([int(g["hops"].min())], dtype="int64"),
            }
        )

    return one_hop.union(two_hop).groupby(["src", "dst"]).map_groups(
        min_hops, batch_format="pandas"
    )


# --- Oracles -----------------------------------------------------------------

CONV_STATS_SQL_TEMPLATE = """
WITH t AS ({transcripts})
SELECT conv_id,
  CAST(COUNT(*) AS BIGINT) AS n_turns,
  CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
  CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
  CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool,
  MIN(ts) AS first_ts,
  MAX(ts) AS last_ts,
  date_diff('microsecond', MIN(ts), MAX(ts)) AS duration_us
FROM t GROUP BY conv_id
"""

# planted-truth canonical labels over mention norms (see stages/canonicalize.py)
_LABELS = r"""
mn AS (SELECT DISTINCT norm FROM m),
lab AS (
  SELECT norm,
         MIN(norm) OVER (PARTITION BY regexp_extract(norm, '[0-9]+')) AS entity_id
  FROM mn
)
"""

HOT_ENTITIES_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
me AS (SELECT mm.conv_id, l.entity_id
       FROM m mm JOIN lab l ON mm.norm = l.norm)
SELECT entity_id,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(COUNT(*) AS BIGINT) AS n_turns
FROM me GROUP BY entity_id
HAVING COUNT(DISTINCT conv_id) >= {min_convs}
"""
)

COOCCURRENCE_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
me AS (SELECT DISTINCT mm.conv_id, l.entity_id
       FROM m mm JOIN lab l ON mm.norm = l.norm)
SELECT a.entity_id AS src, b.entity_id AS dst,
       CAST(COUNT(*) AS BIGINT) AS n_convs
FROM me a JOIN me b
  ON a.conv_id = b.conv_id AND a.entity_id < b.entity_id
GROUP BY a.entity_id, b.entity_id
"""
)

TRANSITIONS_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
me AS (SELECT mm.conv_id, mm.turn_idx, l.entity_id
       FROM m mm JOIN lab l ON mm.norm = l.norm),
w AS (
  SELECT conv_id, turn_idx, entity_id,
    LEAD(entity_id) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_entity,
    LEAD(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_turn
  FROM me
)
SELECT entity_id AS from_entity, next_entity AS to_entity,
       CAST(COUNT(*) AS BIGINT) AS n
FROM w
WHERE next_entity IS NOT NULL AND next_turn - turn_idx <= {max_turn_gap}
GROUP BY entity_id, next_entity
"""
)

REACHABLE_SQL_TEMPLATE = (
    r"""
WITH tr AS ({transitions}),
e AS (
  SELECT from_entity AS src, to_entity AS dst FROM tr
  WHERE n >= {min_n} AND from_entity != to_entity
),
cand AS (
  SELECT src, dst, 1 AS hops FROM e
  UNION ALL
  SELECT x.src, y.dst, 2 AS hops
  FROM e x JOIN e y ON x.dst = y.src AND x.src != y.dst
)
SELECT src, dst, CAST(MIN(hops) AS BIGINT) AS hops
FROM cand GROUP BY src, dst
"""
)
