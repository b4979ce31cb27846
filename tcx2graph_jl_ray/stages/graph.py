"""Property-graph construction over transcripts.

Ray-Data recast of the reference's ``create_property_graph``
(src/GraphBuilder.jl:33-131): vertices are appended per file in point order
(:104-107) and edges connect consecutive points (:109-111). Here:

- **nodes**  = one row per turn, ``node_id = conv_id + ':' + turn_idx`` —
  a vectorized arrow/pandas ``map_batches`` (no shuffle; the input already
  carries its lineage columns, unlike the reference's driver-resident
  ``all_gps_data`` dict, src/GraphBuilder.jl:36).
- **edges**  = per-conversation consecutive pairs (``NEXT_TURN``), built in a
  single conv-keyed ``groupby().map_groups`` window — the same shuffle key the
  transcript derivation used, so at scale the exchange is reused rather than
  repeated.
- **coverage stats** = unique node/edge/conversation counts, the analogue of
  ``compute_unique_coverage_km`` (src/GraphUtils.jl:18-103).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data


def build_nodes(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """One node per turn with its properties (reference src/GraphBuilder.jl:104-107,
    property attach :113-122). Stateless vectorized map; no shuffle."""

    def to_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node_id": batch["conv_id"] + ":" + batch["turn_idx"].astype(str),
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].astype("int32"),
                "role": batch["role"],
                "n_chars": batch["text"].str.len().astype("int64"),
                "ts": batch["ts"],
            }
        )

    return transcripts.map_batches(to_nodes, batch_format="pandas", batch_size=16384)


def _edges_for_conv(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("turn_idx", kind="mergesort")
    # the slicing below naturally yields a typed empty frame for 1-turn
    # conversations (no special case: a hand-built empty DataFrame loses its
    # Arrow schema and triggers schema-mismatch warnings downstream)
    src = g.iloc[:-1].reset_index(drop=True)
    dst = g.iloc[1:].reset_index(drop=True)
    conv = src["conv_id"]
    return pd.DataFrame(
        {
            "conv_id": conv,
            "src_turn": src["turn_idx"].astype("int32"),
            "dst_turn": dst["turn_idx"].astype("int32"),
            "src_node": conv + ":" + src["turn_idx"].astype(str),
            "dst_node": conv + ":" + dst["turn_idx"].astype(str),
            "delta_us": (dst["ts"].values - src["ts"].values).astype("timedelta64[us]").astype("int64"),
        }
    )


def build_next_turn_edges(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Consecutive-turn edges per conversation (reference src/GraphBuilder.jl:109-111)
    with the inter-turn gap as an edge property. One conv-keyed shuffle."""
    return transcripts.groupby("conv_id").map_groups(
        _edges_for_conv, batch_format="pandas"
    )


def coverage_stats(transcripts: ray.data.Dataset) -> pa.Table:
    """KG summary: unique nodes / edges / conversations — the analogue of the
    reference's unique-cell coverage metric (src/GraphUtils.jl:18-103).

    Node/edge uniqueness is structural here ((conv_id, turn_idx) is unique by
    construction), so counts reduce to distributed counts: total turns, total
    turns minus one per conversation, distinct conversations.
    """
    per_conv = transcripts.groupby("conv_id").count()  # shuffle on conv_id
    agg = per_conv.to_pandas()  # one row per conversation — small
    n_convs = len(agg)
    n_nodes = int(agg["count()"].sum())
    n_edges = int((agg["count()"] - 1).clip(lower=0).sum())
    return pa.table(
        {
            "unique_nodes": pa.array([n_nodes], type=pa.int64()),
            "unique_edges": pa.array([n_edges], type=pa.int64()),
            "n_convs": pa.array([n_convs], type=pa.int64()),
        }
    )


NODES_SQL_TEMPLATE = """
SELECT
  t.conv_id || ':' || CAST(t.turn_idx AS VARCHAR) AS node_id,
  t.conv_id AS conv_id,
  t.turn_idx AS turn_idx,
  t.role AS role,
  length(t.text) AS n_chars,
  t.ts AS ts
FROM ({transcripts}) t
"""

EDGES_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
w AS (
  SELECT
    conv_id, turn_idx, ts,
    LEAD(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt_turn,
    LEAD(ts)       OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt_ts
  FROM t
)
SELECT
  conv_id,
  turn_idx AS src_turn,
  nxt_turn AS dst_turn,
  conv_id || ':' || CAST(turn_idx AS VARCHAR) AS src_node,
  conv_id || ':' || CAST(nxt_turn AS VARCHAR) AS dst_node,
  date_diff('microsecond', ts, nxt_ts) AS delta_us
FROM w
WHERE nxt_turn IS NOT NULL
"""

COVERAGE_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
per_conv AS (SELECT conv_id, COUNT(*) AS n FROM t GROUP BY conv_id)
SELECT
  CAST(SUM(n) AS BIGINT) AS unique_nodes,
  CAST(SUM(n - 1) AS BIGINT) AS unique_edges,
  CAST(COUNT(*) AS BIGINT) AS n_convs
FROM per_conv
"""
