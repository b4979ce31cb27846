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

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def build_nodes(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """One node per turn with its properties (reference src/GraphBuilder.jl:104-107,
    property attach :113-122). Stateless vectorized map; no shuffle. Pure
    projection, so the batch stays a zero-copy Arrow table end to end
    (pyarrow.compute kernels; no pandas conversion)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def to_nodes(batch: pa.Table) -> pa.Table:
        turn = pc.cast(batch["turn_idx"], pa.int32())
        node_id = pc.binary_join_element_wise(
            batch["conv_id"], pc.cast(turn, pa.string()), ":"
        )
        return pa.table(
            {
                "node_id": node_id,
                "conv_id": batch["conv_id"],
                "turn_idx": turn,
                "role": batch["role"],
                "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
                "ts": batch["ts"],
            }
        )

    return transcripts.map_batches(to_nodes, batch_format="pyarrow", batch_size=16384)


def _edges_for_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
    # one vectorized pass over a hash bucket of complete conversations:
    # sort by (conv, turn), shift within conversation, keep in-conv pairs
    g = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    nxt_turn = g.groupby("conv_id", sort=False)["turn_idx"].shift(-1)
    nxt_ts = g.groupby("conv_id", sort=False)["ts"].shift(-1)
    keep = nxt_turn.notna()
    src = g[keep]
    conv = src["conv_id"]
    dst_turn = nxt_turn[keep].astype("int32")
    return pd.DataFrame(
        {
            "conv_id": conv,
            "src_turn": src["turn_idx"].astype("int32"),
            "dst_turn": dst_turn,
            "src_node": conv + ":" + src["turn_idx"].astype(str),
            "dst_node": conv + ":" + dst_turn.astype(str),
            "delta_us": (nxt_ts[keep].values - src["ts"].values)
            .astype("timedelta64[us]")
            .astype("int64"),
        }
    )


def build_next_turn_edges(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Consecutive-turn edges per conversation (reference src/GraphBuilder.jl:109-111)
    with the inter-turn gap as an edge property. One bucketed conv-keyed
    shuffle (per-group cost paid vectorized in pandas, not per conversation)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    return bucketed_group_apply(transcripts, ["conv_id"], _edges_for_bucket)


def coverage_stats(transcripts: ray.data.Dataset) -> pa.Table:
    """KG summary: unique nodes / edges / conversations — the analogue of the
    reference's unique-cell coverage metric (src/GraphUtils.jl:18-103).

    Node/edge uniqueness is structural here ((conv_id, turn_idx) is unique by
    construction), so counts reduce to distributed counts: total turns, total
    turns minus one per conversation, distinct conversations. Combiner
    pattern: per-batch partial conversation counts, bucketed final merge.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("conv_id", sort=False).size().reset_index(name="n")
        return g

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("conv_id", sort=False)["n"].sum().reset_index()
        return g.rename(columns={"n": "count()"})

    per_conv = bucketed_group_apply(
        transcripts.select_columns(["conv_id"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["conv_id"],
        merge,
    )
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


def conv_digests(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation content digest: md5 over the turn texts joined with
    0x1f in turn order — the analogue of the per-file polyline digest
    (create_proper_polyline, src/TCXParser.jl:133-146), and the strongest
    pin on the ordering invariant: any reordering or byte change of any turn
    changes the digest. Output: conv_id, digest, n_turns."""
    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        agg = g.groupby("conv_id", sort=False)["text"].agg("\x1f".join)
        n = g.groupby("conv_id", sort=False).size()
        return pd.DataFrame(
            {
                "conv_id": agg.index.to_numpy(),
                "digest": md5_hex(agg.to_numpy()),
                "n_turns": n.astype("int64").to_numpy(),
            }
        )

    return bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "text"]),
        ["conv_id"],
        per_bucket,
    )


def cumulative_tokens(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation running totals — the prefix-sum window (cumulative
    distances, src/Utils.jl:279-288): for every turn, the cumulative character
    count of the conversation up to and including it.
    Output: conv_id, turn_idx, n_chars, cum_chars."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        n = g["text"].str.len().astype("int64")
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"].astype("int32"),
                "n_chars": n,
                "cum_chars": n.groupby(g["conv_id"], sort=False).cumsum().astype("int64"),
            }
        )

    return bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "text"]),
        ["conv_id"],
        per_bucket,
    )


def cumulative_tokens_chunked(
    transcripts: ray.data.Dataset, chunk_turns: int = 65536
) -> ray.data.Dataset:
    """Whale-safe per-conversation prefix sum: identical output to
    ``cumulative_tokens``, but a conversation is never required to fit one
    worker. The classic two-phase split:

    1. **Offsets** (tiny): per-batch partial sums of ``n_chars`` per
       ``(conv_id, chunk)`` where ``chunk = turn_idx // chunk_turns``
       (order-independent, so a plain combiner), then one per-conv prefix
       over its CHUNK TOTALS — a table 1/chunk_turns the size of the data.
    2. **Data** (one shuffle): rows + offset rows meet in ``(conv_id,
       chunk)`` buckets; each chunk sorts locally, cumsums, and adds its
       conversation-prefix offset.

    The shuffle key carries the chunk, so a conversation larger than a
    worker splits across buckets — the salting answer for giant ordered
    groups (per-conv windows elsewhere assume a conv fits a worker; this is
    the pattern to reach for when one doesn't).
    Output: conv_id, turn_idx, n_chars, cum_chars."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    src = transcripts.select_columns(["conv_id", "turn_idx", "text"])

    def partial_totals(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "chunk": (batch["turn_idx"].astype("int64") // chunk_turns),
                "total": batch["text"].str.len().astype("int64"),
            }
        )
        return df.groupby(["conv_id", "chunk"], sort=False, as_index=False).sum()

    def conv_offsets(bucket: pd.DataFrame) -> pd.DataFrame:
        # per conv: final chunk totals, then exclusive prefix -> offsets
        t = bucket.groupby(["conv_id", "chunk"], sort=False, as_index=False)[
            "total"
        ].sum()
        t = t.sort_values(["conv_id", "chunk"], kind="mergesort")
        csum = t.groupby("conv_id", sort=False)["total"].cumsum()
        t["offset"] = (csum - t["total"]).astype("int64")
        return t[["conv_id", "chunk", "offset"]]

    offsets = bucketed_group_apply(
        src.map_batches(partial_totals, batch_format="pandas", batch_size=16384),
        ["conv_id"],
        conv_offsets,
    )

    def tag_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "chunk": (batch["turn_idx"].astype("int64") // chunk_turns),
                "turn_idx": batch["turn_idx"].astype("int32"),
                "n_chars": batch["text"].str.len().astype("int64"),
                "offset": pd.array([-1] * len(batch), dtype="int64"),
            }
        )

    def tag_offsets(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "chunk": batch["chunk"].astype("int64"),
                "turn_idx": pd.array([-1] * len(batch), dtype="int32"),
                "n_chars": pd.array([0] * len(batch), dtype="int64"),
                "offset": batch["offset"].astype("int64"),
            }
        )

    def apply_chunk(bucket: pd.DataFrame) -> pd.DataFrame:
        off = bucket[bucket["turn_idx"] < 0].set_index(["conv_id", "chunk"])[
            "offset"
        ]
        rows = bucket[bucket["turn_idx"] >= 0]
        g = rows.sort_values(["conv_id", "chunk", "turn_idx"], kind="mergesort")
        local = g.groupby(["conv_id", "chunk"], sort=False)["n_chars"].cumsum()
        base = off.reindex(
            pd.MultiIndex.from_arrays([g["conv_id"], g["chunk"]])
        ).fillna(0).to_numpy(dtype="int64")
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"].astype("int32"),
                "n_chars": g["n_chars"],
                "cum_chars": (local.to_numpy() + base).astype("int64"),
            }
        )

    rows = src.map_batches(tag_rows, batch_format="pandas", batch_size=16384)
    offs = offsets.map_batches(tag_offsets, batch_format="pandas")
    return bucketed_group_apply(
        rows.union(offs), ["conv_id", "chunk"], apply_chunk
    )


CUMULATIVE_SQL_TEMPLATE = """
WITH t AS ({transcripts})
SELECT conv_id, turn_idx,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(SUM(length(text)) OVER (
         PARTITION BY conv_id ORDER BY turn_idx
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
FROM t
"""


CONV_DIGEST_SQL_TEMPLATE = """
WITH t AS ({transcripts})
SELECT conv_id,
       md5(string_agg(text, chr(31) ORDER BY turn_idx)) AS digest,
       CAST(COUNT(*) AS BIGINT) AS n_turns
FROM t GROUP BY conv_id
"""


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


def simplify_conversations(
    transcripts: ray.data.Dataset, tolerance: float = 10.0
) -> ray.data.Dataset:
    """Per-conversation lossy simplification (M3/M4) — Douglas-Peucker on the
    (turn_idx, len(text)) polyline, the direct analogue of the reference's
    GPS-trace simplification (douglas_peucker, src/Utils.jl:156-186): keep a
    turn only if dropping it would displace the length profile by more than
    ``tolerance`` characters. Endpoints always survive; a straight-line
    profile collapses to its two endpoints. Output: conv_id, turn_idx,
    n_chars (the kept turns). Runs vectorized-per-conversation inside hash
    buckets (iterative stack DP, no recursion, no driver work)."""
    import numpy as np

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def dp_keep(x: np.ndarray, y: np.ndarray, tol: float) -> np.ndarray:
        n = len(x)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[-1] = True
        stack = [(0, n - 1)]
        while stack:
            i, j = stack.pop()
            if j <= i + 1:
                continue
            # perpendicular distance of interior points to chord (i, j)
            dx, dy = x[j] - x[i], y[j] - y[i]
            norm = np.hypot(dx, dy)
            xi, yi = x[i + 1 : j], y[i + 1 : j]
            if norm == 0.0:
                d = np.hypot(xi - x[i], yi - y[i])
            else:
                d = np.abs(dy * (xi - x[i]) - dx * (yi - y[i])) / norm
            kmax = int(np.argmax(d))
            if d[kmax] > tol:
                mid = i + 1 + kmax
                keep[mid] = True
                stack.append((i, mid))
                stack.append((mid, j))
        return keep

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        g = g.assign(n_chars=g["text"].str.len().astype("int64"))
        out = []
        for _, grp in g.groupby("conv_id", sort=False):
            x = grp["turn_idx"].to_numpy(dtype="float64")
            y = grp["n_chars"].to_numpy(dtype="float64")
            keep = (
                np.ones(len(grp), dtype=bool)
                if len(grp) <= 2
                else dp_keep(x, y, tolerance)
            )
            out.append(grp.loc[keep, ["conv_id", "turn_idx", "n_chars"]])
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {"conv_id": pd.Series([], dtype="object"),
                 "turn_idx": pd.Series([], dtype="int32"),
                 "n_chars": pd.Series([], dtype="int64")}
            )
        )

    return bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "text"]),
        ["conv_id"],
        per_bucket,
    )


def _dp_keep_mask(x: np.ndarray, y: np.ndarray, tol: float, depth: int) -> np.ndarray:
    """Bounded-depth Douglas-Peucker keep mask over an ordered polyline.
    Endpoints always kept; each level splits every open segment at its
    max-perpendicular-distance interior point when that distance exceeds
    ``tol`` (ties -> smallest index, np.argmax semantics). The distance
    expression is written in exactly the operation order the SQL oracle
    uses, so float comparisons at the tol boundary agree bit-for-bit."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    segs = [(0, n - 1)]
    for _ in range(depth):
        nxt: list[tuple[int, int]] = []
        for i, j in segs:
            if j - i < 2:
                continue
            dx, dy = x[j] - x[i], y[j] - y[i]
            length = np.sqrt(dx * dx + dy * dy)
            px, py = x[i + 1 : j], y[i + 1 : j]
            dist = np.abs(dx * (py - y[i]) - (px - x[i]) * dy) / length
            k = int(np.argmax(dist))
            if dist[k] > tol:
                mid = i + 1 + k
                keep[mid] = True
                nxt.extend([(i, mid), (mid, j)])
        segs = nxt
        if not segs:
            break
    return keep


def conv_simplify(
    transcripts: ray.data.Dataset, tol: float = 2.0, depth: int = 5
) -> ray.data.Dataset:
    """Tolerance-parameterized LOSSY conversation reduction — the engine's
    analogue of the reference's Douglas-Peucker polyline simplification
    (``tol_m`` over GPS tracks, src/Utils.jl:156-186; M3/M4): each
    conversation becomes the polyline (turn_idx, token_count) and keeps only
    the turns that shape it — endpoints plus every interior turn whose
    perpendicular deviation from the running chord exceeds ``tol`` tokens,
    refined ``depth`` levels deep (the bounded-work analogue of the
    reference's recursion; depth >= log2(max turns) is exact DP).

    One conv-keyed bucketed shuffle; per-conversation DP runs vectorized
    inside the bucket (a whale conversation is the
    ``assign_turn_idx_sliced`` story — slice first, simplify slices).

    Output: conv_id, turn_idx, n_tokens (the kept skeleton — what a
    downstream summarizer or embedder would consume instead of the full
    transcript). Value-exact vs the unrolled-CTE DuckDB oracle
    (``conv_simplify_sql``) at any depth: a segment whose max deviation is
    <= tol adds no point at any later level, so re-examining it (the SQL
    formulation) and dropping it (this one) agree.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        toks = (
            bucket["text"]
            .str.split(" ")
            .map(lambda ws: sum(1 for w in ws if w))
            .to_numpy(dtype="float64")
        )
        out = []
        start = 0
        conv_ids = bucket["conv_id"].to_numpy()
        turn_idx = bucket["turn_idx"].to_numpy()
        bounds = np.flatnonzero(conv_ids[1:] != conv_ids[:-1]) + 1
        for end in list(bounds) + [len(bucket)]:
            x = turn_idx[start:end].astype("float64")
            y = toks[start:end]
            m = _dp_keep_mask(x, y, tol, depth)
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": conv_ids[start:end][m],
                        "turn_idx": turn_idx[start:end][m],
                        "n_tokens": y[m].astype("int64"),
                    }
                )
            )
            start = end
        if not out:
            return pd.DataFrame(
                {"conv_id": pd.Series([], dtype="object"),
                 "turn_idx": pd.Series([], dtype="int32"),
                 "n_tokens": pd.Series([], dtype="int64")}
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "text"]),
        ["conv_id"],
        per_bucket,
    )


def conv_simplify_sql(
    transcripts_sql: str, tol: float = 2.0, depth: int = 5
) -> str:
    """DuckDB oracle for ``conv_simplify``: the bounded DP recursion unrolled
    as ``depth`` CTE layers. Each layer pairs consecutive kept points via
    LEAD into segments, scores every interior point's perpendicular distance
    (identical operation order to the engine), and adds each segment's
    argmax point (ties -> smallest turn_idx) when its distance > tol."""
    parts = [
        f"WITH t AS MATERIALIZED ({transcripts_sql}),",
        """pts AS MATERIALIZED (
  SELECT conv_id, turn_idx,
         CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
              AS DOUBLE) AS y
  FROM t
),
k0 AS (
  SELECT conv_id, MIN(turn_idx) AS turn_idx FROM pts GROUP BY conv_id
  UNION
  SELECT conv_id, MAX(turn_idx) AS turn_idx FROM pts GROUP BY conv_id
)""",
    ]
    for lv in range(depth):
        parts.append(
            f""", segs{lv} AS (
  SELECT k.conv_id, k.turn_idx AS lx, p.y AS ly,
         LEAD(k.turn_idx) OVER w AS rx, LEAD(p.y) OVER w AS ry
  FROM k{lv} k JOIN pts p USING (conv_id, turn_idx)
  WINDOW w AS (PARTITION BY k.conv_id ORDER BY k.turn_idx)
), cand{lv} AS (
  SELECT s.conv_id, s.lx, p.turn_idx,
         abs((s.rx - s.lx) * (p.y - s.ly) - (p.turn_idx - s.lx) * (s.ry - s.ly))
           / sqrt((s.rx - s.lx) * (s.rx - s.lx) + (s.ry - s.ly) * (s.ry - s.ly))
           AS dist
  FROM segs{lv} s
  JOIN pts p ON p.conv_id = s.conv_id
            AND p.turn_idx > s.lx AND p.turn_idx < s.rx
  WHERE s.rx IS NOT NULL
), k{lv + 1} AS MATERIALIZED (
  SELECT conv_id, turn_idx FROM k{lv}
  UNION
  SELECT conv_id, turn_idx FROM (
    SELECT conv_id, turn_idx, dist,
           ROW_NUMBER() OVER (PARTITION BY conv_id, lx
                              ORDER BY dist DESC, turn_idx) AS rn
    FROM cand{lv}
  ) WHERE rn = 1 AND dist > {tol}
)"""
        )
    parts.append(
        f"""
SELECT p.conv_id, p.turn_idx, CAST(p.y AS BIGINT) AS n_tokens
FROM pts p JOIN k{depth} k USING (conv_id, turn_idx)"""
    )
    return "\n".join(parts)
