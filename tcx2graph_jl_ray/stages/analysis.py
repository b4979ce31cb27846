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

import numpy as np
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
        # vectorized dict lookup with identity fallback (Series.map + fillna
        # — never a per-row Python loop in this hot path)
        batch["entity_id"] = (
            batch["norm"].map(self.lookup).fillna(batch["norm"]).astype("object")
        )
        return batch


def attach_entities(
    mentions: ray.data.Dataset, canonical_map, concurrency=(1, 16),
    config: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Broadcast lookup for a DataFrame map; distributed hash join on norm
    when canonicalize returned the map as a Dataset (above
    ``broadcast_map_budget`` distinct surfaces)."""
    if isinstance(canonical_map, ray.data.Dataset):
        lab = canonical_map.map_batches(
            lambda b: pd.DataFrame({"norm": b["norm"], "__label": b["entity_id"]}),
            batch_format="pandas",
        )
        joined = mentions.join(
            lab,
            join_type="left_outer",
            num_partitions=config.join_num_partitions,
            on=("norm",),
        )
        return joined.map_batches(
            lambda b: b.assign(
                entity_id=b["__label"].fillna(b["norm"]).astype("object")
            ).drop(columns=["__label"]),
            batch_format="pandas",
        )
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
    aggregate): turn counts by role, span, duration. Combiner pattern:
    per-batch partial aggregates, bucketed vectorized merge."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "n_turns": 1,
                "n_user": (batch["role"] == "user").astype("int64"),
                "n_assistant": (batch["role"] == "assistant").astype("int64"),
                "n_tool": (batch["role"] == "tool").astype("int64"),
                "first_ts": batch["ts"],
                "last_ts": batch["ts"],
            }
        )
        g = df.groupby("conv_id", sort=False)
        return g.agg(
            n_turns=("n_turns", "sum"), n_user=("n_user", "sum"),
            n_assistant=("n_assistant", "sum"), n_tool=("n_tool", "sum"),
            first_ts=("first_ts", "min"), last_ts=("last_ts", "max"),
        ).reset_index()

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("conv_id", sort=False)
        out = g.agg(
            n_turns=("n_turns", "sum"), n_user=("n_user", "sum"),
            n_assistant=("n_assistant", "sum"), n_tool=("n_tool", "sum"),
            first_ts=("first_ts", "min"), last_ts=("last_ts", "max"),
        ).reset_index()
        out["duration_us"] = (
            (out["last_ts"] - out["first_ts"]).astype("timedelta64[us]").astype("int64")
        )
        for c in ["n_turns", "n_user", "n_assistant", "n_tool"]:
            out[c] = out[c].astype("int64")
        return out

    def re_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        # salt-level partial: same algebraic re-aggregate, no derived column
        g = bucket.groupby("conv_id", sort=False)
        return g.agg(
            n_turns=("n_turns", "sum"), n_user=("n_user", "sum"),
            n_assistant=("n_assistant", "sum"), n_tool=("n_tool", "sum"),
            first_ts=("first_ts", "min"), last_ts=("last_ts", "max"),
        ).reset_index()

    partials = transcripts.select_columns(["conv_id", "role", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    # whale-conversation safe: a conv with more partial rows than a worker
    # heap splits across salt tasks (sum/min/max are order-free)
    return salted_group_apply(
        partials, ["conv_id"], partial_fn=re_sum, merge_fn=merge
    )


def hot_entities(
    mentions_with_entity: ray.data.Dataset, min_convs: int = 2
) -> ray.data.Dataset:
    """Entities mentioned in >= min_convs distinct conversations, with counts —
    the hotspot scan (cells visited by >= K rides, src/GraphUtils.jl:117-189).

    Per-batch partial (entity, conv) counts collapse the mention stream before
    the shuffle; a salted two-level reduce then (1) re-sums at (entity, conv)
    grain — a whale entity's rows split across salt tasks, each emitting its
    own (entity, conv) partials — and (2) re-groups per entity to count
    distinct conversations exactly (bounded by the entity's distinct-conv
    count, not its raw mention count).
    """
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby(["entity_id", "conv_id"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def re_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["entity_id", "conv_id"], sort=False)["n"]
            .sum()
            .reset_index()
        )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        pc = bucket.groupby(["entity_id", "conv_id"], sort=False)["n"].sum()
        g = pc.reset_index().groupby("entity_id", sort=False)
        out = g.agg(n_convs=("conv_id", "nunique"), n_turns=("n", "sum")).reset_index()
        out = out[out["n_convs"] >= min_convs]
        out["n_convs"] = out["n_convs"].astype("int64")
        out["n_turns"] = out["n_turns"].astype("int64")
        return out

    partials = mentions_with_entity.select_columns(
        ["entity_id", "conv_id"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)
    return salted_group_apply(
        partials, ["entity_id"], partial_fn=re_sum, merge_fn=merge
    )


def cooccurrence_edges(mentions_with_entity: ray.data.Dataset) -> ray.data.Dataset:
    """Undirected entity co-occurrence edges weighted by shared conversations
    (the graph whose paths the reference's path-finder walks,
    src/PathFinder.jl:36-149). Output: src, dst (src < dst), n_convs.

    Shape: per-batch distinct (conv, entity) partial -> bucketed-by-conv pair
    generation (vectorized self-merge per bucket) -> bucketed-by-pair count.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["conv_id", "entity_id"]].drop_duplicates()

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates(["conv_id", "entity_id"])
        m = d.merge(d, on="conv_id")
        m = m[m["entity_id_x"] < m["entity_id_y"]]
        return pd.DataFrame({"src": m["entity_id_x"], "dst": m["entity_id_y"]})

    def count_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["src", "dst"], sort=False).size().reset_index(name="n_convs")
        g["n_convs"] = g["n_convs"].astype("int64")
        return g

    distinct = mentions_with_entity.select_columns(
        ["conv_id", "entity_id"]
    ).map_batches(partial_distinct, batch_format="pandas", batch_size=65536)
    pairs = bucketed_group_apply(distinct, ["conv_id"], pairs_in_bucket)
    return bucketed_group_apply(pairs, ["src", "dst"], count_in_bucket)


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

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        grp = g.groupby("conv_id", sort=False)
        nxt_e = grp["entity_id"].shift(-1)
        nxt_t = grp["turn_idx"].shift(-1)
        keep = nxt_e.notna() & ((nxt_t - g["turn_idx"]) <= max_turn_gap)
        return pd.DataFrame(
            {"from_entity": g["entity_id"][keep], "to_entity": nxt_e[keep]}
        )

    def count_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["from_entity", "to_entity"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype("int64")
        return g

    pairs = bucketed_group_apply(
        mentions_with_entity.select_columns(["conv_id", "turn_idx", "entity_id"]),
        ["conv_id"],
        pairs_in_bucket,
    )
    return bucketed_group_apply(pairs, ["from_entity", "to_entity"], count_in_bucket)


def reachable_pairs(
    transitions: ray.data.Dataset,
    min_n: int = 2,
    salt_threshold: int = 1024,
    n_salts: int = 16,
) -> ray.data.Dataset:
    """Entity pairs reachable within <= 2 hops over the directed transition
    graph, keeping only edges observed at least ``min_n`` times — the
    path-finding analogue (src/PathFinder.jl:36-149: BFS over segments that
    satisfy ``min_runs``, here min_n). Output: src, dst, hops (1 or 2).

    Distributed shape: direct edges filter in map_batches; 2-hop pairs from a
    single vectorized cross-merge per (pivot, salt) hash bucket; min hops via
    a bucketed grouped min. Hub skew guard: pivots whose in-degree exceeds
    ``salt_threshold`` have their in-edges salted into ``n_salts`` sub-groups
    (out-edges replicated per salt), bounding any one group's cross product —
    results are identical, each (in, out) pair still meets exactly once."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def strong(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[(batch["n"] >= min_n) & (batch["from_entity"] != batch["to_entity"])]
        return pd.DataFrame({"src": keep["from_entity"], "dst": keep["to_entity"]})

    # Materialize at the branch point: edges feed BOTH the one-hop and the
    # two-hop branch; without pinning, each branch re-executes the whole
    # upstream plan (duplicate actor pools — deadlock-prone and 2x work).
    # The filtered canonical-entity edge list is small by construction.
    edges = transitions.map_batches(strong, batch_format="pandas").materialize()

    # hot-pivot pre-pass: in-degree per pivot (combiner + bucketed merge);
    # hot pivots are FEW by definition, so the set broadcasts in the closure
    deg = bucketed_group_apply(
        edges.map_batches(
            lambda b: b.groupby("dst", sort=False).size().reset_index(name="n"),
            batch_format="pandas",
        ),
        ["dst"],
        lambda g: g.groupby("dst", sort=False)["n"].sum().reset_index(),
    )
    def hot_filter(b: pd.DataFrame) -> pd.DataFrame:
        if "dst" not in b.columns:  # schema-less empty block after the sort
            return pd.DataFrame({"dst": pd.Series([], dtype="object")})
        return b[b["n"] > salt_threshold][["dst"]]

    hot_pdf = deg.map_batches(hot_filter, batch_format="pandas").to_pandas()
    # an all-empty result loses its schema through Arrow; no hot pivots then
    hot = set(hot_pdf["dst"]) if "dst" in hot_pdf.columns else set()

    def to_pivot(batch: pd.DataFrame) -> pd.DataFrame:
        iv = pd.DataFrame(
            {"pivot": batch["dst"], "node": batch["src"], "dir": "in", "salt": 0}
        )
        ov = pd.DataFrame(
            {"pivot": batch["src"], "node": batch["dst"], "dir": "out", "salt": 0}
        )
        if hot:
            hi = iv["pivot"].isin(hot)
            iv.loc[hi, "salt"] = (
                pd.util.hash_pandas_object(iv.loc[hi, "node"], index=False)
                % n_salts
            ).astype("int64")
            ho = ov["pivot"].isin(hot)
            if ho.any():
                reps = [ov[~ho]]
                hot_rows = ov[ho]
                for s in range(n_salts):
                    reps.append(hot_rows.assign(salt=s))
                ov = pd.concat(reps, ignore_index=True)
        out = pd.concat([iv, ov], ignore_index=True)
        out["salt"] = out["salt"].astype("int64")
        return out

    def pivot_pairs_bucket(b: pd.DataFrame) -> pd.DataFrame:
        ins = b.loc[b["dir"] == "in", ["pivot", "salt", "node"]]
        outs = b.loc[b["dir"] == "out", ["pivot", "salt", "node"]]
        m = ins.merge(outs, on=["pivot", "salt"], suffixes=("_a", "_b"))
        m = m[m["node_a"] != m["node_b"]]
        return pd.DataFrame(
            {
                "src": m["node_a"].to_numpy(),
                "dst": m["node_b"].to_numpy(),
                "hops": pd.array([2] * len(m), dtype="int64"),
            }
        )

    two_hop = bucketed_group_apply(
        edges.map_batches(to_pivot, batch_format="pandas"),
        ["pivot", "salt"],
        pivot_pairs_bucket,
    )

    one_hop = edges.map_batches(
        lambda b: b.assign(hops=pd.array([1] * len(b), dtype="int64")),
        batch_format="pandas",
    )

    def min_hops_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["src", "dst"], sort=False)["hops"].min().reset_index()
        g["hops"] = g["hops"].astype("int64")
        return g

    return bucketed_group_apply(
        one_hop.union(two_hop), ["src", "dst"], min_hops_bucket
    )


def khop_paths(
    transitions: ray.data.Dataset,
    max_hops: int = 3,
    min_n: int = 2,
    config: PipelineConfig = DEFAULT_CONFIG,
    max_out_degree: int = 10_000,
    per_src_budget: int = 100_000,
    cap_trigger_rows: int = 1_000_000,
) -> ray.data.Dataset:
    """Min-hop reachability up to ``max_hops`` WITH path reconstruction —
    the full analogue of the reference's BFS path finder
    (src/PathFinder.jl:36-149, reconstruction :118-139), beyond 2 hops.

    Iterative distributed frontier expansion: each round hash-joins the
    frontier against the edge list on the frontier's endpoint (native
    Dataset.join — one shuffle per hop), extending only simple paths (a
    candidate node already on the path is rejected via a vectorized
    delimiter-wrapped substring check). The final reduce keeps, per (src,
    dst), the minimum hop count and the lexicographically smallest path at
    that hop count — deterministic, and exactly reproducible in SQL.

    Work guards (the reference bounds path-search work via window_step /
    min_runs, src/OverlappingSegmentsUtils.jl:95-99; simple-path enumeration
    grows ~degree^hops through hubs, so an unguarded hop-3 frontier explodes
    on hub-heavy graphs):

    - **hub-degree guard**: sources with out-degree > ``max_out_degree``
      contribute no edges at all (a hub that dense is non-discriminative for
      path semantics, exactly like a hot blocking token);
    - **per-source frontier budget**: whenever a hop's frontier exceeds
      ``cap_trigger_rows`` total rows, each src keeps only its
      ``per_src_budget`` lexicographically-smallest paths.

    Both are deterministic RECALL trades — results are exact (and
    oracle-identical) while no guard fires, which the defaults guarantee at
    test scale; at corpus scale they bound per-hop frontier growth to
    |srcs| × budget. Output: src, dst, hops:int64, path ('>'-joined)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def strong(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[
            (batch["n"] >= min_n) & (batch["from_entity"] != batch["to_entity"])
        ]
        return pd.DataFrame({"src": keep["from_entity"], "dst": keep["to_entity"]})

    edges = transitions.map_batches(strong, batch_format="pandas").materialize()

    def drop_hubs(bucket: pd.DataFrame) -> pd.DataFrame:
        deg = bucket.groupby("src", sort=False)["dst"].transform("size")
        return bucket[deg <= max_out_degree]

    n_edges_raw = edges.count()
    edges = bucketed_group_apply(edges, ["src"], drop_hubs).materialize()
    n_dropped = n_edges_raw - edges.count()
    if n_dropped:
        # the hub guard is a deterministic RECALL trade the SQL oracle does
        # not model — make a fired guard observable instead of silent
        import logging

        logging.getLogger(__name__).warning(
            "khop_paths: drop_hubs removed %d of %d edges "
            "(max_out_degree=%d); results diverge from the unguarded oracle",
            n_dropped, n_edges_raw, max_out_degree,
        )

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": b["src"],
                "dst": b["dst"],
                "hops": pd.array([1] * len(b), dtype="int64"),
                "path": b["src"] + ">" + b["dst"],
            }
        )

    from tcx2graph_jl_ray.functions.arrowutil import with_schema
    import pyarrow as pa

    F_SCHEMA = [("src", pa.string()), ("dst", pa.string()),
                ("hops", pa.int64()), ("path", pa.string())]

    # repartition after with_schema: Ray degrades EMPTY blocks to schema-less
    # pandas frames (even when the map returns a typed Arrow table), and the
    # native join resolves key fields per partition — merging blocks removes
    # the schema-less empties (see functions/arrowutil.py)
    frontier = (
        with_schema(edges.map_batches(init, batch_format="pandas"), F_SCHEMA)
        .repartition(config.join_num_partitions)
        .materialize()
    )
    levels = [frontier]
    # edge list keyed by its source, renamed to meet the frontier's endpoint
    ejoin = (
        with_schema(
            edges.map_batches(
                lambda b: pd.DataFrame({"dst": b["src"], "__next": b["dst"]}),
                batch_format="pandas",
            ),
            [("dst", pa.string()), ("__next", pa.string())],
        )
        .repartition(config.join_num_partitions)
        .materialize()
    )

    for hop in range(2, max_hops + 1):
        if not frontier.count():  # no simple paths left to extend
            break
        joined = frontier.join(
            ejoin,
            join_type="inner",
            num_partitions=config.join_num_partitions,
            on=("dst",),
        )

        def extend(b: pd.DataFrame, h: int = hop) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"src": pd.Series([], dtype="object"),
                 "dst": pd.Series([], dtype="object"),
                 "hops": pd.array([], dtype="int64"),
                 "path": pd.Series([], dtype="object")}
            )
            if not len(b):
                return empty
            # simple-path check: reject a next-node already on the path
            # (delimiter-wrapped so node names that are substrings of other
            # names cannot false-positive); np.char.find is element-wise
            wrapped = (">" + b["path"] + ">").to_numpy(dtype=str)
            nxt = (">" + b["__next"] + ">").to_numpy(dtype=str)
            kept = b[np.char.find(wrapped, nxt) < 0]
            if not len(kept):
                return empty
            return pd.DataFrame(
                {
                    "src": kept["src"].to_numpy(),
                    "dst": kept["__next"].to_numpy(),
                    "hops": pd.array([h] * len(kept), dtype="int64"),
                    "path": (kept["path"] + ">" + kept["__next"]).to_numpy(),
                }
            )

        frontier = (
            with_schema(joined.map_batches(extend, batch_format="pandas"), F_SCHEMA)
            .repartition(config.join_num_partitions)
            .materialize()
        )
        n_frontier = frontier.count()
        if n_frontier > cap_trigger_rows:
            def cap_src(bucket: pd.DataFrame) -> pd.DataFrame:
                return (
                    bucket.sort_values("path", kind="mergesort")
                    .groupby("src", sort=False)
                    .head(per_src_budget)
                )

            frontier = (
                with_schema(
                    bucketed_group_apply(frontier, ["src"], cap_src), F_SCHEMA
                )
                .repartition(config.join_num_partitions)
                .materialize()
            )
            n_capped = n_frontier - frontier.count()
            if n_capped:
                # same observability rule as drop_hubs: a fired recall
                # guard must not be silent
                import logging

                logging.getLogger(__name__).warning(
                    "khop_paths: per-source cap dropped %d of %d hop-%d "
                    "paths (per_src_budget=%d); results diverge from the "
                    "unguarded oracle",
                    n_capped, n_frontier, hop, per_src_budget,
                )
        levels.append(frontier)

    allp = levels[0]
    for lv in levels[1:]:
        allp = allp.union(lv)

    def best(bucket: pd.DataFrame) -> pd.DataFrame:
        min_h = bucket.groupby(["src", "dst"], sort=False)["hops"].transform("min")
        at_min = bucket[bucket["hops"] == min_h]
        g = (
            at_min.sort_values("path", kind="mergesort")
            .groupby(["src", "dst"], sort=False)
            .first()
            .reset_index()
        )
        g["hops"] = g["hops"].astype("int64")
        return g[["src", "dst", "hops", "path"]]

    return bucketed_group_apply(allp, ["src", "dst"], best)


KHOP_PATHS_SQL_TEMPLATE = """
WITH tr AS ({transitions}),
e AS (
  SELECT from_entity AS src, to_entity AS dst FROM tr
  WHERE n >= {min_n} AND from_entity != to_entity
),
p1 AS (SELECT src, dst, 1 AS hops, src || '>' || dst AS path FROM e),
p2 AS (
  SELECT p.src, e.dst AS dst, 2 AS hops, p.path || '>' || e.dst AS path
  FROM p1 p JOIN e ON p.dst = e.src
  WHERE position('>' || e.dst || '>' IN '>' || p.path || '>') = 0
),
p3 AS (
  SELECT p.src, e.dst AS dst, 3 AS hops, p.path || '>' || e.dst AS path
  FROM p2 p JOIN e ON p.dst = e.src
  WHERE position('>' || e.dst || '>' IN '>' || p.path || '>') = 0
),
allp AS (
  SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3
),
m AS (SELECT src, dst, MIN(hops) AS hops FROM allp GROUP BY src, dst)
SELECT a.src, a.dst, CAST(a.hops AS BIGINT) AS hops, MIN(a.path) AS path
FROM allp a JOIN m ON a.src = m.src AND a.dst = m.dst AND a.hops = m.hops
GROUP BY a.src, a.dst, a.hops
"""


def convs_in_window(
    transcripts: ray.data.Dataset,
    start: str,
    end: str,
    broadcast_budget: int = 5_000_000,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Semi-join via block stats (the bbox prefilter, J5,
    src/OverlappingSegmentsUtils.jl:126-137): keep only conversations whose
    [min_ts, max_ts] span intersects the query window. Phase 1 aggregates
    per-conv zone stats (combiner + bucketed merge). Phase 2 has a budget
    switch: up to ``broadcast_budget`` qualifying ids, the raw set is
    broadcast and the stream filtered map-side (no shuffle); above it, a
    fixed-size Bloom filter is broadcast as a SUPERSET prefilter and the
    (now small) candidate stream is exactly re-verified with a left-semi
    hash join against the qualifying ids — false positives cost one shuffled
    row, never a wrong row.
    Output: the transcript rows of qualifying conversations."""
    import ray as _ray

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    lo, hi = pd.Timestamp(start), pd.Timestamp(end)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("conv_id", sort=False)["ts"].agg(["min", "max"])
        return g.reset_index()

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("conv_id", sort=False).agg(
            mn=("min", "min"), mx=("max", "max")
        ).reset_index()
        return g[(g["mn"] <= hi) & (g["mx"] >= lo)][["conv_id"]]

    qualifying = bucketed_group_apply(
        transcripts.select_columns(["conv_id", "ts"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["conv_id"],
        merge,
    ).materialize()
    n_qual = qualifying.count()

    if n_qual <= broadcast_budget:
        keep_ref = _ray.put(set(qualifying.to_pandas()["conv_id"]))

        class _Keep:
            def __init__(self, ref):
                self.keep = _ray.get(ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                return batch[batch["conv_id"].isin(self.keep)]

        return transcripts.map_batches(
            _Keep, fn_constructor_args=(keep_ref,), batch_format="pandas",
            batch_size=65536, concurrency=(1, 8),
        )

    # Bloom path: build streaming (never the whole id set in one object),
    # broadcast once, prefilter map-side, then exact left-semi re-verify
    from tcx2graph_jl_ray.functions.bloom import BloomFilter

    bloom = BloomFilter(max(n_qual, 64), fp_rate=0.01)
    for b in qualifying.iter_batches(batch_size=65536, batch_format="pandas"):
        bloom.add(b["conv_id"])
    bloom_ref = _ray.put(bloom)

    class _BloomKeep:
        def __init__(self, ref):
            self.bloom = _ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch[self.bloom.contains(batch["conv_id"])]

    candidates = transcripts.map_batches(
        _BloomKeep, fn_constructor_args=(bloom_ref,), batch_format="pandas",
        batch_size=65536, concurrency=(1, 8),
    ).repartition(config.join_num_partitions)  # merge away empty blocks
    return candidates.join(
        qualifying.repartition(config.join_num_partitions),
        join_type="left_semi",
        num_partitions=config.join_num_partitions,
        on=("conv_id",),
    )


CONVS_IN_WINDOW_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
spans AS (
  SELECT conv_id FROM t GROUP BY conv_id
  HAVING MIN(ts) <= TIMESTAMP '{end}' AND MAX(ts) >= TIMESTAMP '{start}'
)
SELECT t.* FROM t JOIN spans USING (conv_id)
"""


def conv_dynamics(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation dynamics over consecutive turns — the segment
    characteristics aggregate (compute_segment_characteristics_basic,
    src/SegmentAnalysis.jl:32-81: total distance / ascent / descent / max
    gradient over consecutive pairs), recast for text: total variation of
    turn length, growth/shrink counts, max/total inter-turn gap.
    Output: conv_id, total_variation, n_grow, n_shrink, max_gap_us, total_gap_us."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        grp = g.groupby("conv_id", sort=False)
        n = g["text"].str.len().astype("int64")
        delta = n - n.groupby(g["conv_id"], sort=False).shift(1)
        # integer microseconds as float (NaN for the first turn / single-turn
        # conversations): aggregating raw timedeltas and fillna(0) later
        # yields an object column mixing Timedelta and int that astype cannot
        # handle (crashes exactly on single-turn conversations)
        gap = (g["ts"] - grp["ts"].shift(1)) // pd.Timedelta(microseconds=1)
        agg = pd.DataFrame(
            {
                "conv_id": g["conv_id"],
                "tv": delta.abs(),
                "grow": (delta > 0).astype("int64"),
                "shrink": (delta < 0).astype("int64"),
                "gap": gap,
            }
        ).groupby("conv_id", sort=False)
        out = agg.agg(
            total_variation=("tv", "sum"),
            n_grow=("grow", "sum"),
            n_shrink=("shrink", "sum"),
            max_gap_us=("gap", "max"),
            total_gap_us=("gap", "sum"),
        ).reset_index()
        for c in ["total_variation", "n_grow", "n_shrink", "max_gap_us", "total_gap_us"]:
            out[c] = out[c].fillna(0).astype("int64")
        return out

    return bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "text", "ts"]),
        ["conv_id"],
        per_bucket,
    )


CONV_DYNAMICS_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
w AS (
  SELECT conv_id,
    length(text) - LAG(length(text)) OVER
      (PARTITION BY conv_id ORDER BY turn_idx) AS delta,
    date_diff('microsecond',
      LAG(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx), ts) AS gap
  FROM t
)
SELECT conv_id,
  CAST(COALESCE(SUM(ABS(delta)), 0) AS BIGINT) AS total_variation,
  CAST(COALESCE(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_grow,
  CAST(COALESCE(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_shrink,
  CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us,
  CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS total_gap_us
FROM w GROUP BY conv_id
"""


def top_entities_with_ties(
    hot: ray.data.Dataset,
) -> ray.data.Dataset:
    """Entities tied at the maximum conversation coverage — the reference's
    keep-ties-at-max top-segment selection (examples/case_study_1.jl:98-129:
    sort by repetitions, keep every segment tied with the best). Input is the
    hot_entities output; the global max is a scalar aggregate, then a filter."""
    max_convs = hot.max("n_convs")

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n_convs"] == max_convs]

    return hot.map_batches(keep, batch_format="pandas")


TOP_ENTITIES_SQL_TEMPLATE = """
WITH hot AS ({hot_entities})
SELECT * FROM hot WHERE n_convs = (SELECT MAX(n_convs) FROM hot)
"""


def top_entities_dedup(
    hot: ray.data.Dataset, threshold: float = 0.8
) -> ray.data.Dataset:
    """Tied-top selection WITH near-duplicate suppression — the reference
    Fréchet-dedups the segments tied at max repetitions
    (examples/case_study_1.jl:114-126). Text analogue (SQL-expressible,
    non-greedy): among the tied entities, drop any whose token-set
    containment with a lexicographically SMALLER tied entity is >=
    ``threshold``. The tie set is tiny by construction (argmax survivors),
    so the pairwise check runs in one block."""
    from tcx2graph_jl_ray.stages.canonicalize import _containment

    ties = top_entities_with_ties(hot)

    def suppress(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        ids = sorted(batch["entity_id"])
        dropped = {
            a for i, a in enumerate(ids)
            if any(_containment(a, b) >= threshold for b in ids[:i])
        }
        return batch[~batch["entity_id"].isin(dropped)]

    # the tie set is a handful of rows: collapse to one block so every pair
    # meets (documented small-side step, like the reference's driver dedup)
    return ties.repartition(1).map_batches(suppress, batch_format="pandas")


TOP_ENTITIES_DEDUP_SQL_TEMPLATE = """
WITH hot AS ({hot_entities}),
ties AS (SELECT * FROM hot WHERE n_convs = (SELECT MAX(n_convs) FROM hot)),
sup AS (
  SELECT a.entity_id AS eid
  FROM ties a JOIN ties b ON b.entity_id < a.entity_id
  WHERE CAST(len(list_intersect(
          list_distinct(string_split(a.entity_id, ' ')),
          list_distinct(string_split(b.entity_id, ' ')))) AS DOUBLE)
        / least(len(list_distinct(string_split(a.entity_id, ' '))),
                len(list_distinct(string_split(b.entity_id, ' ')))) >= {threshold}
)
SELECT * FROM ties WHERE entity_id NOT IN (SELECT eid FROM sup)
"""


def entity_feature_stats(mentions_with_entity: ray.data.Dataset) -> ray.data.Dataset:
    """Per-canonical-entity feature statistics — the A3 grouped min/max/mean
    (get_feature_stats / extract_segment_features, src/SegmentAnalysis.jl:96-146)
    over mention features. Combiner pattern: per-batch partials, salted
    two-level merge (sum/min/max are order-free, so a whale entity's partial
    rows split across salt tasks; the mean is derived once at the end).
    Output: entity_id, n_rows, min_turn, max_turn, mean_occurrences."""
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("entity_id", sort=False)
        return g.agg(
            n_rows=("turn_idx", "size"),
            min_turn=("turn_idx", "min"),
            max_turn=("turn_idx", "max"),
            sum_occ=("n_occurrences", "sum"),
        ).reset_index()

    def re_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("entity_id", sort=False)
        return g.agg(
            n_rows=("n_rows", "sum"),
            min_turn=("min_turn", "min"),
            max_turn=("max_turn", "max"),
            sum_occ=("sum_occ", "sum"),
        ).reset_index()

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        out = re_sum(bucket)
        out["mean_occurrences"] = out["sum_occ"] / out["n_rows"]
        out["n_rows"] = out["n_rows"].astype("int64")
        out["min_turn"] = out["min_turn"].astype("int32")
        out["max_turn"] = out["max_turn"].astype("int32")
        return out.drop(columns=["sum_occ"])

    partials = mentions_with_entity.select_columns(
        ["entity_id", "turn_idx", "n_occurrences"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)
    return salted_group_apply(
        partials, ["entity_id"], partial_fn=re_sum, merge_fn=merge
    )


def sample_turns_by_hash(transcripts: ray.data.Dataset, hex_max: str = "19") -> ray.data.Dataset:
    """Deterministic hash sampling (the O5 sampling analogue, made
    reproducible): keep turns whose md5(conv_id + ':' + turn_idx) first two
    hex chars are <= ``hex_max`` (rate = (int(hex_max,16)+1)/256). Stable
    across runs/processes — the right way to sample a 10^12-row table for
    inspection without a global shuffle."""
    from tcx2graph_jl_ray.functions.digest import md5_hex

    # hex-string compare on 2 lowercase hex chars == numeric compare on the
    # first digest byte (both orderings are monotone) — but ONLY when the
    # cutoff is exactly 2 chars, so normalize: a 1-char "9" would otherwise
    # silently compare lexically ("10" <= "9") instead of numerically
    cut_val = int(hex_max, 16)
    if not 0 <= cut_val <= 0xFF:
        raise ValueError(f"hex_max must be one byte (00..ff), got {hex_max!r}")
    hex_cut = format(cut_val, "02x")

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch["conv_id"] + ":" + batch["turn_idx"].astype(str)
        p2 = np.asarray(md5_hex(keys.to_numpy()), dtype="U32").astype("U2")
        return batch[p2 <= hex_cut]

    return transcripts.map_batches(keep, batch_format="pandas", batch_size=65536)


SAMPLE_TURNS_SQL_TEMPLATE = """
WITH t AS ({transcripts})
SELECT * FROM t
WHERE substring(md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)), 1, 2) <= '{hex_max}'
"""


def shortest_entity_path(
    edges, src: str, dst: str, min_weight: int = 1
) -> list[str] | None:
    """BFS shortest path between two canonical entities over the (undirected)
    co-occurrence graph, using only edges with weight >= min_weight — the
    reference's segment path finder (src/PathFinder.jl:36-149: BFS over
    segments meeting ``min_runs``, with path reconstruction). The canonical
    graph is small after canonicalization, so this runs driver-side exactly
    like the reference; ``edges`` may be a Dataset or DataFrame with columns
    (src, dst, n_convs). Returns the entity path or None."""
    import collections

    if isinstance(edges, ray.data.Dataset):
        edges = edges.to_pandas()
    keep = edges[edges["n_convs"] >= min_weight]
    adj: dict[str, set] = collections.defaultdict(set)
    for a, b in zip(keep["src"], keep["dst"]):
        adj[a].add(b)
        adj[b].add(a)
    if src == dst:
        return [src]
    prev: dict[str, str] = {src: src}
    queue = collections.deque([src])
    while queue:
        cur = queue.popleft()
        for nxt in sorted(adj[cur]):  # deterministic expansion order
            if nxt in prev:
                continue
            prev[nxt] = cur
            if nxt == dst:
                path = [dst]
                while path[-1] != src:
                    path.append(prev[path[-1]])
                return path[::-1]
            queue.append(nxt)
    return None


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

ENTITY_FEATURE_STATS_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
me AS (SELECT mm.conv_id, mm.turn_idx, mm.n_occurrences, l.entity_id
       FROM m mm JOIN lab l ON mm.norm = l.norm)
SELECT entity_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(turn_idx) AS INTEGER) AS min_turn,
       CAST(MAX(turn_idx) AS INTEGER) AS max_turn,
       CAST(SUM(n_occurrences) AS DOUBLE) / COUNT(*) AS mean_occurrences
FROM me GROUP BY entity_id
"""
)


# --- entity degree stats + PageRank ------------------------------------------

def entity_degree_stats(transitions: ray.data.Dataset) -> ray.data.Dataset:
    """Per-entity degree summary of the transition graph: distinct out/in
    neighbors and total out/in transition weight. One tagged union + one
    bucketed merge (no join shuffle per side).
    Output: entity_id, out_deg, in_deg, out_n, in_n."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"entity_id": batch["from_entity"], "peer": batch["to_entity"],
             "n": batch["n"].astype("int64"), "dir": "out"}
        )
        inn = pd.DataFrame(
            {"entity_id": batch["to_entity"], "peer": batch["from_entity"],
             "n": batch["n"].astype("int64"), "dir": "in"}
        )
        return pd.concat([out, inn], ignore_index=True)

    def per_entity(bucket: pd.DataFrame) -> pd.DataFrame:
        agg = bucket.groupby(["entity_id", "dir"], sort=False).agg(
            deg=("peer", "nunique"), n=("n", "sum")
        )
        wide = agg.unstack("dir")
        ent = wide.index.to_numpy()

        def col(name, d):
            if (name, d) in wide.columns:
                return wide[(name, d)].fillna(0).astype("int64").to_numpy()
            return np.zeros(len(ent), dtype="int64")

        return pd.DataFrame(
            {
                "entity_id": ent,
                "out_deg": col("deg", "out"),
                "in_deg": col("deg", "in"),
                "out_n": col("n", "out"),
                "in_n": col("n", "in"),
            }
        )

    return bucketed_group_apply(
        transitions.map_batches(tag, batch_format="pandas"),
        ["entity_id"],
        per_entity,
    )


DEGREE_STATS_SQL_TEMPLATE = """
WITH tr AS ({transitions}),
o AS (SELECT from_entity AS e, COUNT(DISTINCT to_entity) AS out_deg,
             SUM(n) AS out_n FROM tr GROUP BY from_entity),
i AS (SELECT to_entity AS e, COUNT(DISTINCT from_entity) AS in_deg,
             SUM(n) AS in_n FROM tr GROUP BY to_entity),
u AS (SELECT e FROM o UNION SELECT e FROM i)
SELECT u.e AS entity_id,
       CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg,
       CAST(COALESCE(o.out_n, 0) AS BIGINT) AS out_n,
       CAST(COALESCE(i.in_n, 0) AS BIGINT) AS in_n
FROM u LEFT JOIN o ON o.e = u.e LEFT JOIN i ON i.e = u.e
"""


def _pagerank_dataset_ranks(
    edges: ray.data.Dataset,
    ow_ds: ray.data.Dataset,
    nodes_ds: ray.data.Dataset,
    n_nodes: int,
    n_iter: int,
    damping: float,
) -> ray.data.Dataset:
    """PageRank with the rank vector held as a DATASET — the above-budget
    path of ``entity_pagerank``: per round, contributions = edges ⋈ ranks
    via the co-partitioned ``hash_join`` on from_entity, reduced per
    to_entity; dangling mass = one scalar aggregate over the (static)
    dangling-node semi-join. Nothing vocabulary-sized ever reaches the
    driver or a broadcast."""
    from ray.data.aggregate import Sum

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    # static: edge weights w = n / out_w (one join, reused every round)
    edges_w = hash_join(
        edges, ow_ds, on="from_entity"
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "from_entity": b["from_entity"],
                "to_entity": b["to_entity"],
                "w": b["n"].astype("float64") / b["out_w"].astype("float64"),
            }
        ),
        batch_format="pandas",
    ).materialize()

    # static: dangling nodes (no out-edges) — the left join's null side
    dangling = hash_join(
        nodes_ds.map_batches(
            lambda b: pd.DataFrame({"from_entity": b["entity"]}),
            batch_format="pandas",
        ),
        ow_ds,
        on="from_entity",
        how="left",
    ).map_batches(
        lambda b: pd.DataFrame(
            {"entity": b.loc[b["out_w"].isna(), "from_entity"]}
        ),
        batch_format="pandas",
    ).materialize()

    r0 = 1.0 / n_nodes
    rank_ds = nodes_ds.map_batches(
        lambda b: pd.DataFrame({"entity": b["entity"], "rank": r0}),
        batch_format="pandas",
    ).materialize()

    def reduce_c(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("to_entity", sort=False)["c"].sum()
        return pd.DataFrame({"to_entity": s.index, "c": s.to_numpy()})

    for _ in range(n_iter):
        agg = hash_join(
            dangling,
            rank_ds,
            on="entity",
        ).aggregate(Sum("rank"))
        dang = float(agg["sum(rank)"] or 0.0)

        contrib_rows = hash_join(
            edges_w,
            rank_ds.map_batches(
                lambda b: pd.DataFrame(
                    {"from_entity": b["entity"], "rank": b["rank"]}
                ),
                batch_format="pandas",
            ),
            on="from_entity",
        ).map_batches(
            lambda b: pd.DataFrame(
                {"to_entity": b["to_entity"], "c": b["rank"] * b["w"]}
            )
            .groupby("to_entity", sort=False)["c"]
            .sum()
            .reset_index(),
            batch_format="pandas",
        )
        csum = bucketed_group_apply(contrib_rows, ["to_entity"], reduce_c)

        base = (1.0 - damping) / n_nodes + damping * dang / n_nodes
        d = damping
        rank_ds = hash_join(
            nodes_ds,
            csum.map_batches(
                lambda b: pd.DataFrame({"entity": b["to_entity"], "c": b["c"]}),
                batch_format="pandas",
            ),
            on="entity",
            how="left",
        ).map_batches(
            lambda b, base=base, d=d: pd.DataFrame(
                {
                    "entity": b["entity"],
                    "rank": base
                    + d * b["c"].astype("float64").fillna(0.0).to_numpy(),
                }
            ),
            batch_format="pandas",
        ).materialize()

    return rank_ds.map_batches(
        lambda b: pd.DataFrame(
            {
                "entity_id": b["entity"],
                "pagerank": np.round(b["rank"].to_numpy(dtype="float64"), 6),
            }
        ),
        batch_format="pandas",
    )


def entity_pagerank(
    transitions: ray.data.Dataset,
    n_iter: int = 10,
    damping: float = 0.85,
    small_graph_threshold: int = 200_000,
    rank_vector_budget: int = 2_000_000,
) -> ray.data.Dataset:
    """Weighted PageRank over the entity transition graph — the iterative
    graph analysis beyond the reference's BFS pathfinding
    (src/PathFinder.jl:36-149). Edge weight = transition count; dangling mass
    redistributed uniformly; ranks rounded to 6 decimals (iteration
    accumulates ulp-order float divergence vs the oracle's sum order).

    Size discipline, three paths by node count (the dual-path discipline of
    connected components and the canonical map, extended one level):

    - <= ``small_graph_threshold``: one driver numpy loop (edges aggregated
      once);
    - <= ``rank_vector_budget``: rank / out-weight VECTORS broadcast per
      round (vocabulary-bounded), the EDGE set — up to vocabulary² for dense
      graphs — streams through ``map_batches`` partial sums + a bucketed
      reduce;
    - above the budget: the rank vector itself stays a DATASET; per-round
      contributions flow through the co-partitioned ``hash_join`` (edges ⋈
      ranks on from_entity) and the dangling mass is one scalar aggregate —
      no driver-side or broadcast structure scales with the vocabulary.

    Output: entity_id, pagerank."""
    edges = transitions.select_columns(
        ["from_entity", "to_entity", "n"]
    ).materialize()

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def out_weights(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("from_entity", sort=False)["n"].sum()
        return pd.DataFrame(
            {"from_entity": s.index, "out_w": s.astype("float64").to_numpy()}
        )

    # vocabulary-sized: out-weights and the node universe. Distinct targets
    # are reduced DISTRIBUTED before reaching the driver (a dense graph has
    # edge-cardinality to_entity rows; only the distinct set is vocab-sized)
    ow_ds = bucketed_group_apply(edges, ["from_entity"], out_weights).materialize()
    tos_ds = bucketed_group_apply(
        edges.select_columns(["to_entity"]),
        ["to_entity"],
        lambda b: b.drop_duplicates(),
    ).materialize()
    nodes_ds = bucketed_group_apply(
        ow_ds.select_columns(["from_entity"])
        .map_batches(
            lambda b: pd.DataFrame({"entity": b["from_entity"]}),
            batch_format="pandas",
        )
        .union(
            tos_ds.map_batches(
                lambda b: pd.DataFrame({"entity": b["to_entity"]}),
                batch_format="pandas",
            )
        ),
        ["entity"],
        lambda b: b.drop_duplicates(),
    ).materialize()
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"entity_id": pd.Series([], dtype="object"),
                          "pagerank": pd.Series([], dtype="float64")})
        )

    if n_nodes > rank_vector_budget:
        return _pagerank_dataset_ranks(
            edges, ow_ds, nodes_ds, n_nodes, n_iter, damping
        )

    ow = ow_ds.to_pandas()
    froms = ow["from_entity"]
    tos = tos_ds.to_pandas()["to_entity"]
    nodes = np.sort(pd.concat([froms, tos]).drop_duplicates().to_numpy())

    if n_nodes <= small_graph_threshold:
        e = edges.to_pandas()
        idx = {v: i for i, v in enumerate(nodes)}
        src = e["from_entity"].map(idx).to_numpy()
        dst = e["to_entity"].map(idx).to_numpy()
        w = e["n"].to_numpy() / ow.set_index("from_entity")["out_w"].reindex(
            e["from_entity"]
        ).to_numpy()
        has_out = np.zeros(n_nodes, dtype=bool)
        has_out[np.unique(src)] = True
        rank = np.full(n_nodes, 1.0 / n_nodes)
        for _ in range(n_iter):
            contrib = np.zeros(n_nodes)
            np.add.at(contrib, dst, rank[src] * w)
            dang = rank[~has_out].sum()
            rank = (1.0 - damping) / n_nodes + damping * (
                contrib + dang / n_nodes
            )
        return ray.data.from_pandas(
            pd.DataFrame({"entity_id": nodes, "pagerank": np.round(rank, 6)})
        )

    # streaming-edges path: broadcast the rank vector each round, stream the
    # edges once per round with per-batch partial sums, reduce per to_entity
    ow_map = ow.set_index("from_entity")["out_w"]
    has_out = pd.Index(nodes).isin(ow_map.index)
    rank = pd.Series(np.full(n_nodes, 1.0 / n_nodes), index=nodes)

    class _Partial:
        def __init__(self, r):
            self.rank, self.ow = ray.get(r)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            r = self.rank.reindex(batch["from_entity"]).to_numpy()
            w = batch["n"].to_numpy() / self.ow.reindex(
                batch["from_entity"]
            ).to_numpy()
            df = pd.DataFrame({"to_entity": batch["to_entity"], "c": r * w})
            s = df.groupby("to_entity", sort=False)["c"].sum()
            return pd.DataFrame({"to_entity": s.index, "c": s.to_numpy()})

    def reduce_c(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("to_entity", sort=False)["c"].sum()
        return pd.DataFrame({"to_entity": s.index, "c": s.to_numpy()})

    for _ in range(n_iter):
        rref = ray.put((rank, ow_map))
        partials = edges.map_batches(
            _Partial, fn_constructor_args=(rref,), batch_format="pandas",
            batch_size=65536, concurrency=(1, 8),
        )
        csum = bucketed_group_apply(
            partials, ["to_entity"], reduce_c
        ).to_pandas().set_index("to_entity")["c"]

        dang = float(rank[~has_out].sum())
        contrib = csum.reindex(nodes).fillna(0.0).to_numpy()
        rank = pd.Series(
            (1.0 - damping) / n_nodes + damping * (contrib + dang / n_nodes),
            index=nodes,
        )

    return ray.data.from_pandas(
        pd.DataFrame(
            {"entity_id": nodes, "pagerank": np.round(rank.to_numpy(), 6)}
        )
    )


def pagerank_sql(
    transitions_sql: str, n_iter: int = 10, damping: float = 0.85
) -> str:
    """DuckDB oracle for ``entity_pagerank``: the bounded iteration is
    UNROLLED as pr0..pr{n_iter} CTE layers (no recursive-CTE aggregate
    restrictions), each layer = damped weighted contributions + uniform
    dangling redistribution; final ranks rounded to 6 decimals."""
    d = damping
    layers = []
    prev = "pr0"
    for i in range(1, n_iter + 1):
        cur = f"pr{i}"
        layers.append(f"""{cur} AS MATERIALIZED (
  SELECT nd.entity_id,
         (1.0 - {d}) / nn.n + {d} * (
           COALESCE(c.contrib, 0.0)
           + (SELECT COALESCE(SUM(p.rank), 0.0) FROM {prev} p
              WHERE p.entity_id NOT IN (SELECT from_entity FROM tr)) / nn.n
         ) AS rank
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN (
    SELECT e.to_entity, SUM(p.rank * e.w) AS contrib
    FROM {prev} p JOIN we e ON e.from_entity = p.entity_id
    GROUP BY e.to_entity
  ) c ON c.to_entity = nd.entity_id
)""")
        prev = cur
    layer_sql = ",\n".join(layers)
    return f"""
WITH tr AS MATERIALIZED ({transitions_sql}),
nodes AS MATERIALIZED (
  SELECT from_entity AS entity_id FROM tr
  UNION SELECT to_entity FROM tr
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
ow AS (SELECT from_entity, CAST(SUM(n) AS DOUBLE) AS out_w
       FROM tr GROUP BY from_entity),
we AS MATERIALIZED (SELECT t.from_entity, t.to_entity, t.n / o.out_w AS w
       FROM tr t JOIN ow o ON o.from_entity = t.from_entity),
pr0 AS MATERIALIZED (SELECT entity_id, 1.0 / nn.n AS rank
        FROM nodes CROSS JOIN nn),
{layer_sql}
SELECT entity_id, ROUND(rank, 6) AS pagerank FROM {prev}
"""


def _oriented_triangles(
    edges: ray.data.Dataset, n_buckets: int = 64
) -> tuple:
    """Enumerate each triangle of an undirected edge set (src < dst,
    distinct, MATERIALIZED by the caller) exactly once, degree-oriented so a
    hub generates wedges only among its higher-(degree, id) neighbours
    (Suri & Vassilvitskii WWW'11; total wedge work O(m^1.5)). Returns
    (triangles Dataset[apex, src, dst], degree Dataset[node, degree]) —
    shared by ``triangle_stats`` (node counts) and ``ktruss_edges``
    (per-edge support)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    # -- degrees: partial per-batch count -> bucketed sum (combiner shape)
    def partial_deg(batch: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([batch["src"], batch["dst"]], ignore_index=True)
        s = both.groupby(both, sort=False).size()
        return pd.DataFrame({"node": s.index, "deg_part": s.to_numpy()})

    def sum_deg(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("node", sort=False)["deg_part"].sum()
        return pd.DataFrame(
            {"node": s.index, "degree": s.astype("int64").to_numpy()}
        )

    deg = bucketed_group_apply(
        edges.map_batches(partial_deg, batch_format="pandas", batch_size=65536),
        ["node"],
        sum_deg,
        n_buckets=n_buckets,
    ).materialize()

    # -- orient each edge toward the higher-(degree, id) endpoint
    with_sdeg = hash_join(
        edges,
        deg.map_batches(
            lambda b: b.rename(columns={"node": "src", "degree": "src_deg"}),
            batch_format="pandas",
        ),
        on="src",
        n_buckets=n_buckets,
    )
    with_both = hash_join(
        with_sdeg,
        deg.map_batches(
            lambda b: b.rename(columns={"node": "dst", "degree": "dst_deg"}),
            batch_format="pandas",
        ),
        on="dst",
        n_buckets=n_buckets,
    )

    def orient(batch: pd.DataFrame) -> pd.DataFrame:
        # src < dst always, so the (deg, id) tie-break is src on equal degree
        fwd = (batch["src_deg"] < batch["dst_deg"]) | (
            (batch["src_deg"] == batch["dst_deg"]) & (batch["src"] < batch["dst"])
        )
        fwd = fwd.to_numpy()
        return pd.DataFrame(
            {
                "tail": np.where(fwd, batch["src"], batch["dst"]),
                "head": np.where(fwd, batch["dst"], batch["src"]),
            }
        )

    oriented = with_both.map_batches(
        orient, batch_format="pandas", batch_size=65536
    )

    # -- wedges among each apex's out-neighbours (lo < hi by id, which is
    # exactly the (src, dst) key of the undirected edge that would close it)
    def wedges_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates(["tail", "head"])
        m = d.merge(d, on="tail")
        m = m[m["head_x"] < m["head_y"]]
        return pd.DataFrame(
            {"apex": m["tail"], "src": m["head_x"], "dst": m["head_y"]}
        )

    wedges = bucketed_group_apply(
        oriented, ["tail"], wedges_in_bucket, n_buckets=n_buckets
    )

    # -- close: wedge (src, dst) is a triangle iff that edge exists
    triangles = hash_join(wedges, edges, on=["src", "dst"], n_buckets=n_buckets)
    return triangles, deg


def triangle_stats(
    cooccurrence: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Per-entity triangle counts and local clustering coefficient over the
    undirected co-occurrence graph — triadic structure analysis one level up
    from the reference's pairwise overlap detection
    (src/OverlappingSegmentsUtils.jl:173-274) and path-finding
    (src/PathFinder.jl:36-149).

    Scale shape (the node-iterator-with-degree-orientation algorithm,
    cf. Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11 — public): every edge is ORIENTED from its lower-
    (degree, id) endpoint to its higher one, wedges are generated only among
    each apex's OUT-neighbours, so a hub of degree d contributes pairs only
    among its few higher-degree neighbours (total wedge work O(m^1.5),
    never d^2 at the hub), and each triangle is closed exactly once at its
    minimum-(degree, id) vertex. Wedge closure is a co-partitioned
    ``hash_join`` against the edge set — no broadcast, both sides shuffle
    once. Degrees come from a per-batch partial count + bucketed reduce.

    Input: src, dst (src < dst, distinct undirected edges).
    Output: entity_id, degree, n_triangles, clustering (= 2T / d(d-1),
    rounded to 6 decimals; 0.0 for degree < 2).
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    edges = cooccurrence.select_columns(["src", "dst"]).materialize()
    triangles, deg = _oriented_triangles(edges, n_buckets)

    def tri_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat(
            [batch["apex"], batch["src"], batch["dst"]], ignore_index=True
        )
        s = both.groupby(both, sort=False).size()
        return pd.DataFrame({"node": s.index, "t_part": s.to_numpy()})

    def sum_tri(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("node", sort=False)["t_part"].sum()
        return pd.DataFrame(
            {"node": s.index, "n_triangles": s.astype("int64").to_numpy()}
        )

    tri_counts = bucketed_group_apply(
        triangles.map_batches(tri_nodes, batch_format="pandas", batch_size=65536),
        ["node"],
        sum_tri,
        n_buckets=n_buckets,
    )

    joined = hash_join(deg, tri_counts, on="node", how="left", n_buckets=n_buckets)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["degree"].astype("int64").to_numpy()
        t = batch["n_triangles"].fillna(0).astype("int64").to_numpy()
        denom = d.astype("float64") * (d - 1.0)
        clustering = np.where(d > 1, 2.0 * t / np.where(denom == 0, 1.0, denom), 0.0)
        return pd.DataFrame(
            {
                "entity_id": batch["node"],
                "degree": d,
                "n_triangles": t,
                "clustering": np.round(clustering, 6),
            }
        )

    return joined.map_batches(finish, batch_format="pandas", batch_size=65536)


TRIANGLE_SQL_TEMPLATE = """
WITH e AS MATERIALIZED ({cooccurrence}),
d AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
  GROUP BY node
),
t AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1
  JOIN e e2 ON e2.src = e1.dst
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
tc AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT a AS node FROM t UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t)
  GROUP BY node
)
SELECT d.node AS entity_id, d.degree,
       CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
       ROUND(CASE WHEN d.degree > 1
                  THEN 2.0 * COALESCE(tc.n_triangles, 0)
                       / (d.degree * (d.degree - 1.0))
                  ELSE 0.0 END, 6) AS clustering
FROM d LEFT JOIN tc ON tc.node = d.node
"""


def pmi_edges(
    mentions_with_entity: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Pointwise mutual information weighting of co-occurrence edges —
    pmi(a,b) = ln( p(a,b) / (p(a) p(b)) ) over conversations — the
    information-theoretic upgrade of the reference's raw shared-run edge
    weights (src/DataPreprocessing.jl:330-397). Standard corpus-statistics
    edge weighting (Church & Hanks 1990 — public).

    Scale shape: one partial-distinct map feeds (a) the pair generation
    (bucketed by conv, same as ``cooccurrence_edges``), (b) the per-entity
    conversation counts (bucketed distinct count), and (c) the scalar
    conversation universe; the marginals then attach to the edges via two
    co-partitioned ``hash_join``s — entity marginals are NOT broadcast, so
    a billion-entity vocabulary still streams.

    Output: src, dst, n_convs, pmi (natural log, rounded to 6 decimals).
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    distinct = (
        mentions_with_entity.select_columns(["conv_id", "entity_id"])
        .map_batches(
            lambda b: b.drop_duplicates(),
            batch_format="pandas",
            batch_size=65536,
        )
        .materialize()
    )

    def count_entity(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()
        s = d.groupby("entity_id", sort=False).size()
        return pd.DataFrame(
            {"entity_id": s.index, "n": s.astype("int64").to_numpy()}
        )

    ent_counts = bucketed_group_apply(
        distinct, ["entity_id"], count_entity, n_buckets=n_buckets
    )
    n_convs_total = float(
        bucketed_group_apply(
            distinct.select_columns(["conv_id"]),
            ["conv_id"],
            lambda b: b.drop_duplicates(),
            n_buckets=n_buckets,
        ).count()
    )

    edges = cooccurrence_edges(distinct)
    e1 = hash_join(
        edges,
        ent_counts.map_batches(
            lambda b: b.rename(columns={"entity_id": "src", "n": "src_n"}),
            batch_format="pandas",
        ),
        on="src",
        n_buckets=n_buckets,
    )
    e2 = hash_join(
        e1,
        ent_counts.map_batches(
            lambda b: b.rename(columns={"entity_id": "dst", "n": "dst_n"}),
            batch_format="pandas",
        ),
        on="dst",
        n_buckets=n_buckets,
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        num = batch["n_convs"].astype("float64").to_numpy() * n_convs_total
        den = (
            (batch["src_n"].astype("int64") * batch["dst_n"].astype("int64"))
            .astype("float64")
            .to_numpy()
        )
        return pd.DataFrame(
            {
                "src": batch["src"],
                "dst": batch["dst"],
                "n_convs": batch["n_convs"].astype("int64"),
                "pmi": np.round(np.log(num / den), 6),
            }
        )

    return e2.map_batches(finish, batch_format="pandas", batch_size=65536)


PMI_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
me AS (SELECT DISTINCT mm.conv_id, l.entity_id
       FROM m mm JOIN lab l ON mm.norm = l.norm),
e AS (SELECT a.entity_id AS src, b.entity_id AS dst,
             CAST(COUNT(*) AS BIGINT) AS n_convs
      FROM me a JOIN me b
        ON a.conv_id = b.conv_id AND a.entity_id < b.entity_id
      GROUP BY 1, 2),
c AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n FROM me
      GROUP BY entity_id),
nv AS (SELECT CAST(COUNT(DISTINCT conv_id) AS DOUBLE) AS n FROM me)
SELECT e.src, e.dst, e.n_convs,
       ROUND(LN(CAST(e.n_convs AS DOUBLE) * nv.n
                / CAST(ca.n * cb.n AS DOUBLE)), 6) AS pmi
FROM e
JOIN c ca ON ca.entity_id = e.src
JOIN c cb ON cb.entity_id = e.dst
CROSS JOIN nv
"""
)


def kcore_members(
    cooccurrence: ray.data.Dataset,
    k: int = 2,
    n_buckets: int = 64,
    max_rounds: int = 100,
) -> ray.data.Dataset:
    """k-core decomposition of the undirected co-occurrence graph: iteratively
    peel every node of degree < k until fixpoint; return the surviving core
    members with their in-core degree. The dense-subgraph robustness filter
    one level up from the reference's min-run edge filter
    (src/PathFinder.jl:59-63 keeps edges with >= min_runs support; the k-core
    keeps NODES with >= k supported edges, recursively).

    Scale shape per round: degrees via per-batch partial count + bucketed
    reduce (combiner), then the edge set is semi-joined against the
    surviving-node set on BOTH endpoints through the co-partitioned
    ``hash_join`` — survivors are never broadcast, so a billion-node graph
    peels with two exchanges per round. Rounds are data-dependent but each
    one strictly shrinks the node set; the loop stops when no node is
    removed (typically a handful of rounds on heavy-tailed graphs).

    Output: entity_id, core_degree (degree within the k-core subgraph).
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def partial_deg(batch: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([batch["src"], batch["dst"]], ignore_index=True)
        s = both.groupby(both, sort=False).size()
        return pd.DataFrame({"node": s.index, "deg_part": s.to_numpy()})

    def sum_deg(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("node", sort=False)["deg_part"].sum()
        return pd.DataFrame(
            {"node": s.index, "degree": s.astype("int64").to_numpy()}
        )

    import pyarrow as pa

    empty = pa.table(
        {"entity_id": pa.array([], pa.string()),
         "core_degree": pa.array([], pa.int64())}
    )

    edges = cooccurrence.select_columns(["src", "dst"]).materialize()
    for _ in range(max_rounds):
        if edges.count() == 0:
            return ray.data.from_arrow(empty)
        deg = bucketed_group_apply(
            edges.map_batches(
                partial_deg, batch_format="pandas", batch_size=65536
            ),
            ["node"],
            sum_deg,
            n_buckets=n_buckets,
        ).materialize()
        n_low = deg.filter(expr=f"degree < {k}").count()
        if n_low == deg.count():
            return ray.data.from_arrow(empty)
        if n_low == 0:
            return deg.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "entity_id": b["node"],
                        "core_degree": b["degree"].astype("int64"),
                    }
                ),
                batch_format="pandas",
            )
        survivors = deg.filter(expr=f"degree >= {k}").select_columns(["node"])
        edges = (
            hash_join(
                edges,
                survivors.map_batches(
                    lambda b: b.rename(columns={"node": "src"}),
                    batch_format="pandas",
                ),
                on="src",
                n_buckets=n_buckets,
            )
        )
        edges = (
            hash_join(
                edges,
                survivors.map_batches(
                    lambda b: b.rename(columns={"node": "dst"}),
                    batch_format="pandas",
                ),
                on="dst",
                n_buckets=n_buckets,
            )
            .select_columns(["src", "dst"])
            .materialize()
        )
    raise RuntimeError(f"k-core did not converge in {max_rounds} rounds")


def kcore_sql(cooccurrence_sql: str, k: int, rounds: int = 30) -> str:
    """DuckDB oracle for ``kcore_members``: the peeling loop UNROLLED as
    ``rounds`` (degree-filter -> edge-filter) CTE layer pairs — sound as
    long as ``rounds`` >= the true peel count (extra layers are no-ops at
    the fixpoint; 30 covers any graph with <= 30 effective peels, verified
    at the driver scales by parity with the fixpoint loop)."""
    layers = []
    prev_e = "e0"
    for i in range(1, rounds + 1):
        layers.append(f"""d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS deg
  FROM (SELECT src AS node FROM {prev_e}
        UNION ALL SELECT dst FROM {prev_e})
  GROUP BY node
),
e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {prev_e} e
  JOIN d{i} a ON a.node = e.src AND a.deg >= {k}
  JOIN d{i} b ON b.node = e.dst AND b.deg >= {k}
)""")
        prev_e = f"e{i}"
    layer_sql = ",\n".join(layers)
    return f"""
WITH e0 AS MATERIALIZED (SELECT src, dst FROM ({cooccurrence_sql})),
{layer_sql}
SELECT node AS entity_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM (SELECT src AS node FROM {prev_e} UNION ALL SELECT dst FROM {prev_e})
GROUP BY node
HAVING COUNT(*) >= {k}
"""


def entity_components(
    cooccurrence: ray.data.Dataset,
    config=None,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Connected components of the undirected co-occurrence graph, with
    component sizes — the graph-wide grouping the reference's overlapping-
    segment merge produces for SEGMENTS (src/OverlappingSegmentsUtils.jl:
    212-277 union-find over overlap pairs), lifted to the entity graph.

    Reuses the dual-path ``connected_components`` (driver union-find below
    ``small_graph_threshold``, distributed min-label propagation above), so
    a billion-edge graph resolves through per-round keyed shuffles, never a
    driver collect. Sizes come from a per-batch partial count + bucketed
    reduce over labels, joined back onto the members through the
    co-partitioned ``hash_join`` (no label-histogram broadcast).

    Output: entity_id, component_id (lexicographic-min member),
    component_size:int64.
    """
    from tcx2graph_jl_ray.stages.canonicalize import (
        DEFAULT_CONFIG,
        connected_components,
    )
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    config = config or DEFAULT_CONFIG
    edges = cooccurrence.select_columns(["src", "dst"])

    def as_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([batch["src"], batch["dst"]], ignore_index=True)
        return pd.DataFrame({"norm": both.unique()})

    def dedup_nodes(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates("norm")

    nodes = bucketed_group_apply(
        edges.map_batches(as_nodes, batch_format="pandas"),
        ["norm"],
        dedup_nodes,
        n_buckets=n_buckets,
    )
    labels = connected_components(
        nodes,
        edges.map_batches(
            lambda b: b.rename(columns={"src": "a", "dst": "b"}),
            batch_format="pandas",
        ),
        config,
        as_dataset=True,
    )

    def partial_count(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("label", sort=False).size()
        return pd.DataFrame({"label": s.index, "n_part": s.to_numpy()})

    def sum_count(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("label", sort=False)["n_part"].sum()
        return pd.DataFrame(
            {"label": s.index, "component_size": s.astype("int64").to_numpy()}
        )

    sizes = bucketed_group_apply(
        labels.map_batches(partial_count, batch_format="pandas"),
        ["label"],
        sum_count,
        n_buckets=n_buckets,
    )
    return hash_join(labels, sizes, on="label", n_buckets=n_buckets).map_batches(
        lambda b: pd.DataFrame(
            {
                "entity_id": b["node"],
                "component_id": b["label"],
                "component_size": b["component_size"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


COMPONENTS_SQL_TEMPLATE = """
WITH RECURSIVE e AS MATERIALIZED ({cooccurrence}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
ed AS (SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst, src FROM e),
r(node, reach) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.node, ed.v FROM r JOIN ed ON ed.u = r.reach
),
comp AS (SELECT node, MIN(reach) AS component_id FROM r GROUP BY node)
SELECT node AS entity_id, component_id,
       CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT)
         AS component_size
FROM comp
"""


def neighbor_jaccard(
    cooccurrence: ray.data.Dataset,
    tau: float = 0.5,
    n_buckets: int = 64,
    max_pivot_degree: int = 10_000,
) -> ray.data.Dataset:
    """Structural similarity join: pairs of entities whose co-occurrence
    NEIGHBORHOODS overlap (Jaccard of neighbor sets >= tau) — the node-level
    analogue of the reference's overlap-fraction segment merge
    (src/OverlappingSegmentsUtils.jl:222-274: candidate pairs from shared
    cells, exact overlap verify), with the shared NEIGHBOR as the blocking
    key instead of a geo cell.

    Shape: symmetric adjacency rows -> bucketed per-neighbor vectorized
    self-merge emits candidate pairs (a pivot with degree >
    ``max_pivot_degree`` is SKIPPED for pair generation — hub guard, same
    trade as the minhash hot-band cap: oracle parity holds while no pivot
    exceeds it, asserted at test scale) -> bucketed pair count (= common
    neighbors) -> degrees via partial-count combiner, joined on both sides
    through the co-partitioned ``hash_join`` -> jaccard filter. No stage
    broadcasts or driver-materializes anything.

    Output: a, b (a < b), jaccard:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    edges = cooccurrence.select_columns(["src", "dst"])

    def adj_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat(
                    [batch["src"], batch["dst"]], ignore_index=True
                ),
                "nbr": pd.concat(
                    [batch["dst"], batch["src"]], ignore_index=True
                ),
            }
        )

    adj = edges.map_batches(adj_rows, batch_format="pandas", batch_size=65536)

    def pairs_per_nbr(bucket: pd.DataFrame) -> pd.DataFrame:
        sizes = bucket.groupby("nbr", sort=False)["node"].transform("size")
        d = bucket[sizes <= max_pivot_degree]
        m = d.merge(d, on="nbr")
        m = m[m["node_x"] < m["node_y"]]
        return pd.DataFrame({"a": m["node_x"], "b": m["node_y"]})

    pairs = bucketed_group_apply(adj, ["nbr"], pairs_per_nbr, n_buckets=n_buckets)

    def count_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["a", "b"], sort=False).size().reset_index(name="common")
        g["common"] = g["common"].astype("int64")
        return g

    common = bucketed_group_apply(
        pairs, ["a", "b"], count_pairs, n_buckets=n_buckets
    )

    def partial_deg(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("node", sort=False).size()
        return pd.DataFrame({"node": s.index, "d_part": s.to_numpy()})

    def sum_deg(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("node", sort=False)["d_part"].sum()
        return pd.DataFrame({"node": s.index, "deg": s.astype("int64").to_numpy()})

    deg = bucketed_group_apply(
        adj.map_batches(partial_deg, batch_format="pandas"),
        ["node"],
        sum_deg,
        n_buckets=n_buckets,
    )

    j1 = hash_join(
        common,
        deg.map_batches(
            lambda b: pd.DataFrame({"a": b["node"], "deg_a": b["deg"]}),
            batch_format="pandas",
        ),
        on="a",
        n_buckets=n_buckets,
    )
    j2 = hash_join(
        j1,
        deg.map_batches(
            lambda b: pd.DataFrame({"b": b["node"], "deg_b": b["deg"]}),
            batch_format="pandas",
        ),
        on="b",
        n_buckets=n_buckets,
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["common"].to_numpy(dtype="float64")
        u = (
            batch["deg_a"].to_numpy(dtype="float64")
            + batch["deg_b"].to_numpy(dtype="float64")
            - c
        )
        out = batch[["a", "b"]].copy()
        out["jaccard"] = c / u
        return out[out["jaccard"] >= tau]

    return j2.map_batches(score, batch_format="pandas")


NEIGHBOR_JACCARD_SQL_TEMPLATE = """
WITH e AS MATERIALIZED ({cooccurrence}),
adj AS (SELECT src AS node, dst AS nbr FROM e
        UNION ALL SELECT dst, src FROM e),
deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
common AS (
  SELECT x.node AS a, y.node AS b, COUNT(*) AS c
  FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
  GROUP BY x.node, y.node
)
SELECT common.a, common.b,
       CAST(c AS DOUBLE) / (da.d + db.d - c) AS jaccard
FROM common
JOIN deg da ON da.node = common.a
JOIN deg db ON db.node = common.b
WHERE CAST(c AS DOUBLE) / (da.d + db.d - c) >= {tau}
"""


def entity_bursts(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    z: float = 2.0,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Burst days per entity: days whose mention mass exceeds the entity's
    own mean by ``z`` sample standard deviations — the temporal hotspot
    detector paired with the reference's spatial hotspot argmax
    (examples/case_study_1.jl repetitions-max over segments, here over a
    time axis). Entities observed on a single day have no sample deviation
    and are excluded on both engine and oracle sides.

    Shape: mention rows pick up their turn timestamp through the
    co-partitioned ``hash_join`` on (conv_id, turn_idx) — never a broadcast
    of the transcripts side; daily mass via per-batch partial sums +
    bucketed reduce; the per-entity mean/std screen runs inside entity
    buckets (one vectorized pandas groupby per bucket, not one Ray group
    per entity).

    Output: entity_id, day ('YYYY-MM-DD'), n_mentions:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    joined = hash_join(
        mentions_with_entity.select_columns(
            ["conv_id", "turn_idx", "entity_id", "n_occurrences"]
        ),
        transcripts.select_columns(["conv_id", "turn_idx", "ts"]),
        on=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
    )

    def partial_day(batch: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m-%d")
        g = (
            pd.DataFrame(
                {
                    "entity_id": batch["entity_id"],
                    "day": day,
                    "n_part": batch["n_occurrences"],
                }
            )
            .groupby(["entity_id", "day"], sort=False)["n_part"]
            .sum()
        )
        return g.reset_index()

    def sum_day(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["entity_id", "day"], sort=False)["n_part"].sum()
        out = g.reset_index().rename(columns={"n_part": "n_mentions"})
        out["n_mentions"] = out["n_mentions"].astype("int64")
        return out

    daily = bucketed_group_apply(
        joined.map_batches(partial_day, batch_format="pandas", batch_size=65536),
        ["entity_id", "day"],
        sum_day,
        n_buckets=n_buckets,
    )

    def screen(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("entity_id", sort=False)["n_mentions"]
        mu = g.transform("mean")
        sd = g.transform("std")  # ddof=1 == STDDEV_SAMP
        nd = g.transform("size")
        keep = (nd >= 2) & (bucket["n_mentions"] > mu + z * sd)
        return bucket.loc[keep, ["entity_id", "day", "n_mentions"]]

    return bucketed_group_apply(daily, ["entity_id"], screen, n_buckets=n_buckets)


BURSTS_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
t AS ({transcripts}),
me AS (
  SELECT l.entity_id, strftime(CAST(t.ts AS DATE), '%Y-%m-%d') AS day,
         mm.n_occurrences
  FROM m mm
  JOIN lab l ON mm.norm = l.norm
  JOIN t ON t.conv_id = mm.conv_id AND t.turn_idx = mm.turn_idx
),
d AS (
  SELECT entity_id, day, CAST(SUM(n_occurrences) AS BIGINT) AS n_mentions
  FROM me GROUP BY entity_id, day
),
s AS (
  SELECT entity_id, AVG(n_mentions) AS mu, STDDEV_SAMP(n_mentions) AS sd,
         COUNT(*) AS nd
  FROM d GROUP BY entity_id
)
SELECT d.entity_id, d.day, d.n_mentions
FROM d JOIN s ON s.entity_id = d.entity_id
WHERE s.nd >= 2 AND d.n_mentions > s.mu + {z} * s.sd
"""
)


def bfs_levels(
    transitions: ray.data.Dataset,
    max_rounds: int = 30,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Single-source BFS levels over the directed transition graph from the
    lexicographically smallest entity — the unbounded-depth generalization
    of ``reachable_pairs``/``khop_paths`` (reference walker
    src/PathFinder.jl:36-149 explores from a chosen segment; here the
    frontier expands breadth-first until empty or ``max_rounds``).

    Per round: frontier ⋈ edges through the co-partitioned ``hash_join``
    (never an edge broadcast), visited-set subtraction via a LEFT join
    against the accumulated labels, per-node dedup in buckets. The visited
    set lives as a Dataset, so a billion-node reachable set never touches
    the driver.

    Output: entity_id, dist:int64 (0 for the source; unreachable entities
    absent). ``max_rounds`` mirrors the oracle's recursion bound — exact
    whenever the true eccentricity is below it (asserted at test scale).
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    edges = transitions.select_columns(["from_entity", "to_entity"]).materialize()

    lo = edges.map_batches(
        lambda b: pd.DataFrame(
            {
                "m": [
                    min(
                        b["from_entity"].min(),
                        b["to_entity"].min(),
                    )
                ]
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    if not len(lo):
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table(
                {"entity_id": pa.array([], pa.string()),
                 "dist": pa.array([], pa.int64())}
            )
        )
    source = lo["m"].min()

    labels = ray.data.from_pandas(
        pd.DataFrame(
            {"entity_id": [source], "dist": pd.array([0], dtype="int64")}
        )
    ).materialize()
    frontier = labels

    for rnd in range(max_rounds):
        cand = hash_join(
            frontier.map_batches(
                lambda b: pd.DataFrame({"from_entity": b["entity_id"]}),
                batch_format="pandas",
            ),
            edges,
            on="from_entity",
            n_buckets=n_buckets,
        ).map_batches(
            lambda b: pd.DataFrame({"entity_id": b["to_entity"]}),
            batch_format="pandas",
        )
        if cand.count() == 0:
            break
        new = hash_join(
            cand,
            labels.map_batches(
                lambda b: pd.DataFrame(
                    {"entity_id": b["entity_id"], "seen": 1}
                ),
                batch_format="pandas",
            ),
            on="entity_id",
            how="left",
            n_buckets=n_buckets,
        ).map_batches(
            lambda b: b.loc[b["seen"].isna(), ["entity_id"]],
            batch_format="pandas",
        )

        def dedup(bucket: pd.DataFrame) -> pd.DataFrame:
            return bucket.drop_duplicates("entity_id")

        new = bucketed_group_apply(
            new, ["entity_id"], dedup, n_buckets=n_buckets
        ).materialize()
        if new.count() == 0:
            break
        d = rnd + 1
        frontier = new.map_batches(
            lambda b, _d=d: pd.DataFrame(
                {
                    "entity_id": b["entity_id"],
                    "dist": pd.array([_d] * len(b), dtype="int64"),
                }
            ),
            batch_format="pandas",
        ).materialize()
        labels = labels.union(frontier).materialize()
    return labels


BFS_LEVELS_SQL_TEMPLATE = """
WITH RECURSIVE t AS ({transitions}),
e AS (SELECT from_entity AS u, to_entity AS v FROM t),
src AS (
  SELECT MIN(node) AS s
  FROM (SELECT u AS node FROM e UNION SELECT v FROM e)
),
r(node, d) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT e.v, r.d + 1 FROM r JOIN e ON e.u = r.node WHERE r.d < {max_rounds}
)
SELECT node AS entity_id, CAST(MIN(d) AS BIGINT) AS dist
FROM r GROUP BY node
"""


def adamic_adar(
    cooccurrence: ray.data.Dataset,
    min_common: int = 2,
    n_buckets: int = 64,
    max_pivot_degree: int = 10_000,
) -> ray.data.Dataset:
    """Adamic-Adar link prediction over the co-occurrence graph: for entity
    pairs sharing ≥ ``min_common`` neighbors, score = Σ 1/ln(deg(z)) over
    common neighbors z — ``neighbor_jaccard``'s candidate machinery with a
    degree-weighted pivot, the standard KG link-prediction baseline (the
    reference ranks segment hotspots by how many distinct rides share a
    cell, src/GraphUtils.jl:117-189; here shared neighbors are the cells and
    rare neighbors count for more).

    Shape: degrees via partial-count combiner; each adjacency row picks up
    its PIVOT's degree through the co-partitioned ``hash_join`` (never a
    degree-dict broadcast); per-pivot vectorized self-merge emits candidate
    pairs carrying the pivot weight 1/ln(deg(pivot)); a bucketed pair
    reduction sums weights and counts. A pivot with degree >
    ``max_pivot_degree`` is skipped (hub guard, same trade as
    ``neighbor_jaccard``). A pivot that forms a pair has degree ≥ 2, so
    ln(deg) > 0 — no division guard needed. The gate is the INTEGER common
    count, so no float-boundary filter; the score rounds to 6 decimals on
    both sides (the repo's float-aggregate convention — summation order
    differs between engine and oracle).

    Output: a, b (a < b), common:int64, adamic_adar:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    edges = cooccurrence.select_columns(["src", "dst"])

    def adj_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat(
                    [batch["src"], batch["dst"]], ignore_index=True
                ),
                "nbr": pd.concat(
                    [batch["dst"], batch["src"]], ignore_index=True
                ),
            }
        )

    adj = edges.map_batches(adj_rows, batch_format="pandas", batch_size=65536)

    def partial_deg(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("nbr", sort=False).size()
        return pd.DataFrame({"nbr": s.index, "d_part": s.to_numpy()})

    def sum_deg(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("nbr", sort=False)["d_part"].sum()
        return pd.DataFrame({"nbr": s.index, "deg": s.astype("int64").to_numpy()})

    deg = bucketed_group_apply(
        adj.map_batches(partial_deg, batch_format="pandas"),
        ["nbr"],
        sum_deg,
        n_buckets=n_buckets,
    )
    adj_w = hash_join(adj, deg, on="nbr", n_buckets=n_buckets)

    def pairs_per_nbr(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket[bucket["deg"] <= max_pivot_degree]
        m = d.merge(d, on="nbr")
        m = m[m["node_x"] < m["node_y"]]
        return pd.DataFrame(
            {
                "a": m["node_x"],
                "b": m["node_y"],
                "w": 1.0 / np.log(m["deg_x"].to_numpy(dtype="float64")),
            }
        )

    pairs = bucketed_group_apply(
        adj_w, ["nbr"], pairs_per_nbr, n_buckets=n_buckets
    )

    def reduce_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["a", "b"], sort=False)["w"].agg(["size", "sum"])
        g = g[g["size"] >= min_common].reset_index()
        return pd.DataFrame(
            {
                "a": g["a"],
                "b": g["b"],
                "common": g["size"].astype("int64"),
                "adamic_adar": g["sum"].astype("float64").round(6),
            }
        )

    return bucketed_group_apply(
        pairs, ["a", "b"], reduce_pairs, n_buckets=n_buckets
    )


ADAMIC_ADAR_SQL_TEMPLATE = """
WITH e AS MATERIALIZED ({cooccurrence}),
adj AS (SELECT src AS node, dst AS nbr FROM e
        UNION ALL SELECT dst, src FROM e),
deg AS (SELECT nbr, COUNT(*) AS d FROM adj GROUP BY nbr)
SELECT x.node AS a, y.node AS b,
       CAST(COUNT(*) AS BIGINT) AS common,
       ROUND(SUM(1.0 / LN(d.d)), 6) AS adamic_adar
FROM adj x
JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
JOIN deg d ON d.nbr = x.nbr
GROUP BY x.node, y.node
HAVING COUNT(*) >= {min_common}
"""


def label_propagation(
    entities_linked: ray.data.Dataset,
    cooccurrence: ray.data.Dataset,
    rounds: int = 2,
    n_buckets: int = 64,
    small_graph_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Semi-supervised type inference over the KG: KB-linked entities seed
    labels (their ``kb_region``), and each round every UNLABELED entity
    adopts the majority label among its labeled co-occurrence neighbors
    (ties to the lexicographically smaller label; a node once labeled is
    frozen). The classic label-propagation inference the reference's
    enrichment chain implies but never closes (assign_road_features
    attaches KB attributes to matched points, src/TCXParser.jl:188-265 —
    this pushes those attributes one/two hops outward).

    Scale shape per round: symmetric adjacency rows pick up their
    NEIGHBOR's current label through the co-partitioned ``hash_join``
    (labels are never broadcast — at web scale the label table is the node
    table); the per-node majority vote is a vectorized count+argmax inside
    node buckets; the freeze is an anti-merge on the label table. Rounds
    are a driver-side loop over a bounded round count — the unrolled-CTE
    oracle mirrors it round for round.

    Output: entity_id, kb_region, round:int64 (0 = KB seed).
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def seed_batch(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["kb_region"].notna()
        return pd.DataFrame(
            {
                "entity_id": b.loc[keep, "entity_id"],
                "kb_region": b.loc[keep, "kb_region"],
                "round": np.int64(0),
            }
        )

    if isinstance(entities_linked, pd.DataFrame):
        # link_entities returns pandas when the entity table fits the driver
        # (vocabulary-bounded); at web scale it is a Dataset and stays one
        seeds = ray.data.from_pandas(seed_batch(entities_linked))
    else:
        seeds = entities_linked.map_batches(seed_batch, batch_format="pandas")

    edges = cooccurrence.select_columns(["src", "dst"]).materialize()

    if edges.count() <= small_graph_threshold:
        # budget-switched driver path (house rule for iterative loops: each
        # distributed round costs ~15-25 Ray stage launches; below the edge
        # budget one pandas loop is strictly faster and output-identical —
        # tests/test_round4f_ops.py plants the both-paths-agree check)
        ep = edges.to_pandas()
        adj_pd = pd.DataFrame({
            "node": pd.concat([ep["src"], ep["dst"]], ignore_index=True),
            "nbr": pd.concat([ep["dst"], ep["src"]], ignore_index=True),
        })
        labels_pd = seeds.to_pandas()
        for r in range(1, rounds + 1):
            nbr = adj_pd.merge(
                labels_pd[["entity_id", "kb_region"]],
                left_on="nbr", right_on="entity_id", how="inner",
            )
            c = (
                nbr.groupby(["node", "kb_region"], sort=False)
                .size().reset_index(name="n")
                .sort_values(["n", "kb_region"], ascending=[False, True],
                             kind="mergesort")
            )
            best = c.drop_duplicates("node", keep="first")
            fresh = best[~best["node"].isin(labels_pd["entity_id"])]
            labels_pd = pd.concat(
                [labels_pd, pd.DataFrame({
                    "entity_id": fresh["node"],
                    "kb_region": fresh["kb_region"],
                    "round": np.int64(r),
                })],
                ignore_index=True,
            )
        labels_pd["round"] = labels_pd["round"].astype("int64")
        return ray.data.from_pandas(labels_pd.reset_index(drop=True))

    adj = edges.map_batches(
        lambda b: pd.DataFrame(
            {
                "node": pd.concat([b["src"], b["dst"]], ignore_index=True),
                "entity_id": pd.concat(
                    [b["dst"], b["src"]], ignore_index=True
                ),
            }
        ),
        batch_format="pandas",
        batch_size=65536,
    ).materialize()  # reused every round; derivation must not re-run

    labels = seeds.materialize()
    for r in range(1, rounds + 1):
        # adjacency rows pick up the NEIGHBOR's label (join key = neighbor
        # as entity_id), then votes reduce per node
        nbr_labels = hash_join(adj, labels, on="entity_id", n_buckets=n_buckets)

        def vote(bucket: pd.DataFrame, _r=r) -> pd.DataFrame:
            c = (
                bucket.groupby(["node", "kb_region"], sort=False)
                .size()
                .reset_index(name="n")
            )
            c = c.sort_values(
                ["n", "kb_region"], ascending=[False, True], kind="mergesort"
            )
            best = c.drop_duplicates("node", keep="first")
            return pd.DataFrame(
                {
                    "entity_id": best["node"],
                    "kb_region": best["kb_region"],
                    "round": np.int64(_r),
                }
            )

        proposals = bucketed_group_apply(
            nbr_labels, ["node"], vote, n_buckets=n_buckets
        )
        # freeze: drop proposals for already-labeled nodes (anti on labels)
        merged = hash_join(
            proposals,
            labels.map_batches(
                lambda b: pd.DataFrame(
                    {"entity_id": b["entity_id"], "__have": np.int64(1)}
                ),
                batch_format="pandas",
            ),
            on="entity_id",
            how="left",
            n_buckets=n_buckets,
        ).map_batches(
            lambda b: b.loc[
                b["__have"].isna(), ["entity_id", "kb_region", "round"]
            ].assign(round=lambda d: d["round"].astype("int64")),
            batch_format="pandas",
        )
        labels = labels.union(merged).materialize()

    return labels.map_batches(
        lambda b: pd.DataFrame(
            {
                "entity_id": b["entity_id"],
                "kb_region": b["kb_region"],
                "round": b["round"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def label_propagation_sql(
    entities_linked_sql: str,
    cooccurrence_sql: str,
    rounds: int = 2,
    seed_region: str | None = None,
) -> str:
    """Unrolled-CTE oracle for ``label_propagation`` (same pattern as the
    k-core unrolled oracle: one CTE pair per round). ``seed_region``
    restricts the seed set, mirroring the driver query's partial-KB setup
    (with the full KB every canonical entity is already labeled and no
    propagation happens)."""
    seed_where = "kb_region IS NOT NULL" + (
        f" AND kb_region = '{seed_region}'" if seed_region else ""
    )
    parts = [
        f"WITH el AS MATERIALIZED ({entities_linked_sql}),",
        f"e AS MATERIALIZED ({cooccurrence_sql}),",
        "adj AS (SELECT src AS node, dst AS nbr FROM e"
        " UNION ALL SELECT dst, src FROM e),",
        f"l0 AS (SELECT entity_id, kb_region, 0 AS rnd FROM el"
        f" WHERE {seed_where}),",
    ]
    prev = "l0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""v{r} AS (
  SELECT adj.node, l.kb_region, COUNT(*) AS n
  FROM adj JOIN {prev} l ON l.entity_id = adj.nbr
  WHERE adj.node NOT IN (SELECT entity_id FROM {prev})
  GROUP BY adj.node, l.kb_region
),
p{r} AS (
  SELECT node AS entity_id, kb_region, {r} AS rnd,
         ROW_NUMBER() OVER (PARTITION BY node
                            ORDER BY n DESC, kb_region) AS rk
  FROM v{r}
),
l{r} AS (
  SELECT entity_id, kb_region, rnd FROM {prev}
  UNION ALL
  SELECT entity_id, kb_region, rnd FROM p{r} WHERE rk = 1
),"""
        )
        prev = f"l{r}"
    body = "\n".join(parts).rstrip(",")
    # strip the trailing comma of the last CTE
    if body.endswith(","):
        body = body[:-1]
    return (
        body
        + f"\nSELECT entity_id, kb_region, CAST(rnd AS BIGINT) AS round FROM {prev}"
    )


def conv_entity_diversity(
    mentions_with_entity: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Per-conversation entity DIVERSITY: distinct entities, total mentions,
    and the Herfindahl concentration index HHI = Σ share² (1 = one entity
    dominates, → 1/n = uniform) — the KG profile of how focused each
    conversation is, the per-group composition statistic paired with the
    corpus-level hotspot scan (src/GraphUtils.jl:117-189 counts rides per
    cell; this inverts to entities per conversation). HHI is one float
    expression over integer counts, rounded to 6.

    Shape: per-batch (conv, entity) partial counts; conv buckets reduce and
    compute the index vectorized — one keyed shuffle of count rows.

    Output: conv_id, n_entities:int64, n_mentions:int64, hhi:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby(["conv_id", "entity_id"], sort=False).size()
        out = s.reset_index()
        out.columns = ["conv_id", "entity_id", "m_part"]
        return out

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        c = (
            bucket.groupby(["conv_id", "entity_id"], sort=False)["m_part"]
            .sum()
            .reset_index(name="m")
        )
        tot = c.groupby("conv_id", sort=False)["m"].transform("sum")
        c = c.assign(sq=(c["m"] / tot) ** 2)
        g = c.groupby("conv_id", sort=False).agg(
            n_entities=("m", "size"), n_mentions=("m", "sum"), hhi=("sq", "sum")
        ).reset_index()
        g["n_entities"] = g["n_entities"].astype("int64")
        g["n_mentions"] = g["n_mentions"].astype("int64")
        g["hhi"] = g["hhi"].astype("float64").round(6)
        return g

    partials = mentions_with_entity.select_columns(
        ["conv_id", "entity_id"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_apply(partials, ["conv_id"], per_conv, n_buckets=n_buckets)


CONV_DIVERSITY_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
c AS (
  SELECT mm.conv_id, l.entity_id, COUNT(*) AS cnt
  FROM m mm JOIN lab l ON mm.norm = l.norm
  GROUP BY mm.conv_id, l.entity_id
),
t AS (SELECT conv_id, SUM(cnt) AS tot FROM c GROUP BY conv_id)
SELECT c.conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_entities,
       CAST(SUM(cnt) AS BIGINT) AS n_mentions,
       ROUND(SUM((CAST(cnt AS DOUBLE) / t.tot) ^ 2), 6) AS hhi
FROM c JOIN t USING (conv_id)
GROUP BY c.conv_id
"""
)


def entity_transitions_monthly(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    max_turn_gap: int = 5,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TEMPORAL KG slicing: the next-entity transition edges of
    ``entity_transitions`` sliced by the month of the FROM turn — the
    time-evolving edge table (how the graph's structure drifts), the
    edge-side analogue of ``entity_bursts``'s node-side time axis. Mention
    rows pick up their turn timestamp through the co-partitioned
    ``hash_join`` on (conv_id, turn_idx) — never a transcripts broadcast;
    pairing runs inside conv buckets exactly like the untimed operator.

    Output: from_entity, to_entity, month ('YYYY-MM'), n:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    joined = hash_join(
        mentions_with_entity.select_columns(
            ["conv_id", "turn_idx", "entity_id"]
        ),
        transcripts.select_columns(["conv_id", "turn_idx", "ts"]),
        on=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
    )

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        grp = g.groupby("conv_id", sort=False)
        nxt_e = grp["entity_id"].shift(-1)
        nxt_t = grp["turn_idx"].shift(-1)
        keep = nxt_e.notna() & ((nxt_t - g["turn_idx"]) <= max_turn_gap)
        month = pd.to_datetime(g["ts"]).dt.strftime("%Y-%m")
        d = pd.DataFrame(
            {
                "from_entity": g["entity_id"][keep],
                "to_entity": nxt_e[keep],
                "month": month[keep],
            }
        )
        s = d.groupby(["from_entity", "to_entity", "month"], sort=False).size()
        out = s.reset_index()
        out.columns = ["from_entity", "to_entity", "month", "n_part"]
        return out

    pairs = bucketed_group_apply(
        joined, ["conv_id"], pairs_in_bucket, n_buckets=n_buckets
    )

    def reduce_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby(
            ["from_entity", "to_entity", "month"], sort=False
        )["n_part"].sum()
        out = s.reset_index()
        out.columns = ["from_entity", "to_entity", "month", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    return bucketed_group_apply(
        pairs, ["from_entity", "to_entity", "month"], reduce_counts,
        n_buckets=n_buckets,
    )


TRANSITIONS_MONTHLY_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
tr AS ({transcripts}),
me AS (SELECT mm.conv_id, mm.turn_idx, l.entity_id, t.ts
       FROM m mm
       JOIN lab l ON mm.norm = l.norm
       JOIN tr t ON t.conv_id = mm.conv_id AND t.turn_idx = mm.turn_idx),
w AS (
  SELECT conv_id, turn_idx, entity_id, ts,
    LEAD(entity_id) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_entity,
    LEAD(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_turn
  FROM me
)
SELECT entity_id AS from_entity, next_entity AS to_entity,
       strftime(ts, '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n
FROM w
WHERE next_entity IS NOT NULL AND next_turn - turn_idx <= {max_turn_gap}
GROUP BY entity_id, next_entity, strftime(ts, '%Y-%m')
"""
)


def degree_assortativity(
    transitions: ray.data.Dataset, n_buckets: int = 64
) -> pd.DataFrame:
    """Degree assortativity of the entity transition graph — the Pearson
    correlation, over directed edges, between the source's out-degree and
    the target's in-degree (Newman 2002's mixing coefficient, the
    one-number answer to "do hub entities point at hubs?"). The structural
    summary beyond per-node `entity_degree_stats`.

    Scale shape: degrees are per-key count reductions (per-batch partial →
    bucketed merge — partial rows per key are batch-bounded); each degree
    table joins back onto the edge stream through the co-partitioned
    ``hash_join`` (both sides are edge/vocabulary-scale facts — never
    broadcast); every batch of the joined stream folds to ONE row of six
    integer sufficient statistics, and the driver sums a handful of
    PYTHON ints (exact at any scale; the oracle's SUM(BIGINT) is HUGEINT).
    The coefficient is one shared double expression, rounded to 6.

    Output (one row; empty if degenerate): n_edges:int64,
    assortativity:float64.
    """
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    edges = transitions.map_batches(
        lambda b: b[["from_entity", "to_entity"]], batch_format="pandas"
    ).materialize()  # consumed three times: two degree scans + the join

    def make_degrees(key: str, out_col: str) -> ray.data.Dataset:
        def part(b: pd.DataFrame) -> pd.DataFrame:
            s = b.groupby(key, sort=False).size()
            return pd.DataFrame(
                {key: s.index.to_numpy(), "d_part": s.to_numpy()}
            )

        def merge(bucket: pd.DataFrame) -> pd.DataFrame:
            g = bucket.groupby(key, sort=False)["d_part"].sum()
            return pd.DataFrame(
                {
                    key: g.index.to_numpy(),
                    out_col: g.to_numpy(dtype="int64"),
                }
            )

        return bucketed_group_apply(
            edges.map_batches(part, batch_format="pandas"),
            [key],
            merge,
            n_buckets=n_buckets,
        )

    out_deg = make_degrees("from_entity", "xd")
    in_deg = make_degrees("to_entity", "yd")
    j = hash_join(
        hash_join(edges, out_deg, on="from_entity", n_buckets=n_buckets),
        in_deg,
        on="to_entity",
        n_buckets=n_buckets,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["xd"].to_numpy(dtype="int64")
        y = b["yd"].to_numpy(dtype="int64")
        return pd.DataFrame(
            {
                "n": [len(b)],
                "sx": [int(x.sum())],
                "sy": [int(y.sum())],
                "sxy": [int((x * y).sum())],
                "sx2": [int((x * x).sum())],
                "sy2": [int((y * y).sum())],
            }
        )

    parts = j.map_batches(
        partial, batch_format="pandas", batch_size=65536
    ).to_pandas()  # one row per batch

    empty = pd.DataFrame(
        {
            "n_edges": pd.array([], dtype="int64"),
            "assortativity": pd.array([], dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    n = sum(int(v) for v in parts["n"])
    sx = sum(int(v) for v in parts["sx"])
    sy = sum(int(v) for v in parts["sy"])
    sxy = sum(int(v) for v in parts["sxy"])
    sx2 = sum(int(v) for v in parts["sx2"])
    sy2 = sum(int(v) for v in parts["sy2"])
    dx = n * sx2 - sx * sx
    dy = n * sy2 - sy * sy
    if n == 0 or dx <= 0 or dy <= 0:
        return empty
    corr = float(n * sxy - sx * sy) / math.sqrt(float(dx) * float(dy))
    return pd.DataFrame(
        {
            "n_edges": pd.array([n], dtype="int64"),
            "assortativity": pd.array([float(np.round(corr, 6))],
                                      dtype="float64"),
        }
    )


DEGREE_ASSORT_SQL_TEMPLATE = """
WITH tr AS ({transitions}),
e AS (SELECT from_entity, to_entity FROM tr),
od AS (SELECT from_entity, CAST(COUNT(*) AS BIGINT) AS xd
       FROM e GROUP BY from_entity),
idg AS (SELECT to_entity, CAST(COUNT(*) AS BIGINT) AS yd
        FROM e GROUP BY to_entity),
j AS (SELECT xd, yd
      FROM e
      JOIN od USING (from_entity)
      JOIN idg USING (to_entity)),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(xd) AS sx, SUM(yd) AS sy, SUM(xd * yd) AS sxy,
             SUM(xd * xd) AS sx2, SUM(yd * yd) AS sy2
      FROM j)
SELECT n AS n_edges,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6)
         AS assortativity
FROM s
WHERE (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
"""


def temporal_reach(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    max_turn_gap: int = 5,
    max_rounds: int = 30,
    n_buckets: int = 64,
    small_graph_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Time-respecting (temporal) reachability: earliest-arrival search over
    TIMESTAMPED entity transitions, where a path may only traverse edges in
    non-decreasing time order — the "information flow" closure of the
    transition graph (a static-graph path through (a -> b at 4pm,
    b -> c at 9am) is NOT a temporal path). Classic earliest-arrival
    label-correcting (Wu et al., "Path Problems in Temporal Graphs",
    VLDB'14): per node keep only the MINIMUM arrival time — an earlier
    arrival strictly dominates (it enables a superset of outgoing edges),
    so the frontier is dominance-pruned every round.

    Edges: consecutive same-conversation mentions within ``max_turn_gap``
    turns (the ``entity_transitions`` pairing), timestamped with the
    DESTINATION turn's ``ts`` (when the handoff completes), self-loops
    dropped, distinct (u, v, t). Source: lexicographically smallest
    entity, arrival = epoch (before all data).

    Per round: frontier |><| edges through the co-partitioned ``hash_join``
    keyed on the source entity (never an edge broadcast), time-monotonic
    filter ``t >= arr(u)``, bucketed min-arrival per destination, improvement
    test via a LEFT join against the current labels; labels stay min-unique
    per node. Converges when no arrival improves; ``max_rounds`` mirrors the
    oracle's recursion depth (exact whenever converged within the bound —
    asserted at test scale, same discipline as ``bfs_levels``).

    Output: entity_id, first_reach:timestamp[us] (source row at epoch;
    temporally unreachable entities absent).

    Reference analogue: the time-ordered run walker constraint
    (src/DataPreprocessing.jl:330-397 pairs runs by start_time order) lifted
    from within one file to a corpus-wide reachability closure.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    me = mentions_with_entity.select_columns(
        ["conv_id", "turn_idx", "entity_id"]
    )
    ts = transcripts.select_columns(["conv_id", "turn_idx", "ts"])
    met = hash_join(me, ts, on=["conv_id", "turn_idx"], n_buckets=n_buckets)

    def edges_in_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        grp = g.groupby("conv_id", sort=False)
        nxt_e = grp["entity_id"].shift(-1)
        nxt_i = grp["turn_idx"].shift(-1)
        nxt_t = grp["ts"].shift(-1)
        keep = (
            nxt_e.notna()
            & ((nxt_i - g["turn_idx"]) <= max_turn_gap)
            & (nxt_e != g["entity_id"])
        )
        return pd.DataFrame({
            "u": g.loc[keep, "entity_id"].to_numpy(),
            "v": nxt_e[keep].to_numpy(),
            "t": nxt_t[keep].to_numpy(),
        }).drop_duplicates()

    def distinct_triples(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates()

    edges = bucketed_group_apply(
        met, ["conv_id"], edges_in_conv, n_buckets=n_buckets
    )
    edges = bucketed_group_apply(
        edges, ["u", "v", "t"], distinct_triples, n_buckets=n_buckets
    ).materialize()

    lo = edges.map_batches(
        lambda b: pd.DataFrame({"m": [min(b["u"].min(), b["v"].min())]}),
        batch_format="pandas",
    ).to_pandas()
    if not len(lo):
        return pd.DataFrame({
            "entity_id": pd.Series([], dtype="object"),
            "first_reach": pd.Series([], dtype="datetime64[us]"),
        })
    source = lo["m"].min()
    epoch = pd.Timestamp("1970-01-01")

    if edges.count() <= small_graph_threshold:
        # budget-switched driver path (the ktruss / connected_components
        # discipline): the edge table is match-bounded, and the distributed
        # loop below costs ~15 Ray stages PER ROUND of pure launch overhead
        # at sandbox scale. Identical label-correcting semantics; the
        # planted test pins the two paths to each other.
        e = edges.to_pandas()  # bounded by small_graph_threshold rows
        arr: dict = {source: epoch}
        frontier_d: dict = {source: epoch}
        for _ in range(max_rounds):
            f = pd.DataFrame(
                {"u": list(frontier_d), "arr": list(frontier_d.values())}
            )
            m = e.merge(f, on="u")
            m = m[m["t"] >= m["arr"]]
            if not len(m):
                break
            cand = m.groupby("v", sort=False)["t"].min()
            improved = {
                v: t for v, t in cand.items()
                if v not in arr or t < arr[v]
            }
            if not improved:
                break
            arr.update(improved)
            frontier_d = improved
        out = pd.DataFrame(
            {"entity_id": list(arr),
             "first_reach": pd.Series(list(arr.values()),
                                       dtype="datetime64[us]")}
        )
        return ray.data.from_pandas(out)

    labels = ray.data.from_pandas(pd.DataFrame({
        "entity_id": [source],
        "first_reach": pd.Series([epoch], dtype="datetime64[us]"),
    })).materialize()
    frontier = labels

    def min_per_node(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("entity_id", sort=False)["first_reach"].min()
        return pd.DataFrame({
            "entity_id": g.index,
            "first_reach": g.to_numpy(),
        })

    for _ in range(max_rounds):
        cand = hash_join(
            frontier.map_batches(
                lambda b: pd.DataFrame({
                    "u": b["entity_id"], "arr": b["first_reach"]
                }),
                batch_format="pandas",
            ),
            edges,
            on="u",
            n_buckets=n_buckets,
        ).map_batches(
            lambda b: pd.DataFrame({
                "entity_id": b.loc[b["t"] >= b["arr"], "v"],
                "first_reach": b.loc[b["t"] >= b["arr"], "t"],
            }),
            batch_format="pandas",
        )
        cand = bucketed_group_apply(
            cand, ["entity_id"], min_per_node, n_buckets=n_buckets
        ).materialize()
        if cand.count() == 0:  # frontier had no time-usable out-edges
            break
        improved = hash_join(
            cand,
            labels.map_batches(
                lambda b: pd.DataFrame({
                    "entity_id": b["entity_id"], "old": b["first_reach"]
                }),
                batch_format="pandas",
            ),
            on="entity_id",
            how="left",
            n_buckets=n_buckets,
        ).map_batches(
            lambda b: b.loc[
                b["old"].isna() | (b["first_reach"] < b["old"]),
                ["entity_id", "first_reach"],
            ],
            batch_format="pandas",
        ).materialize()
        if improved.count() == 0:
            break
        labels = bucketed_group_apply(
            labels.union(improved), ["entity_id"], min_per_node,
            n_buckets=n_buckets,
        ).materialize()
        frontier = improved
    return labels.map_batches(
        lambda b: pd.DataFrame(
            {"entity_id": b["entity_id"],
             "first_reach": b["first_reach"].astype("datetime64[us]")}
        ),
        batch_format="pandas",
    )


TEMPORAL_REACH_SQL_TEMPLATE = (
    r"""
WITH RECURSIVE m AS ({mentions}),
tt AS ({transcripts}),
"""
    + _LABELS
    + r""",
me AS (SELECT mm.conv_id, mm.turn_idx, l.entity_id, tt.ts
       FROM m mm JOIN lab l ON mm.norm = l.norm
       JOIN tt ON tt.conv_id = mm.conv_id AND tt.turn_idx = mm.turn_idx),
w AS (
  SELECT conv_id, turn_idx, entity_id, ts,
    LEAD(entity_id) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt_e,
    LEAD(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt_i,
    LEAD(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt_t
  FROM me
),
e AS (
  SELECT DISTINCT entity_id AS u, nxt_e AS v, nxt_t AS t FROM w
  WHERE nxt_e IS NOT NULL AND nxt_i - turn_idx <= {max_turn_gap}
    AND nxt_e != entity_id
),
src AS (
  SELECT MIN(node) AS s
  FROM (SELECT u AS node FROM e UNION SELECT v FROM e)
),
r(node, arr, d) AS (
  SELECT s, TIMESTAMP '1970-01-01', 0 FROM src
  UNION
  SELECT e.v, e.t, r.d + 1
  FROM r JOIN e ON e.u = r.node AND e.t >= r.arr
  WHERE r.d < {max_rounds}
)
SELECT node AS entity_id, MIN(arr) AS first_reach FROM r GROUP BY node
"""
)


def ktruss_edges(
    edges: ray.data.Dataset,
    k: int = 4,
    n_buckets: int = 64,
    max_rounds: int = 100,
    small_graph_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """k-truss decomposition of an undirected graph (src < dst, distinct):
    iteratively drop every edge in fewer than k-2 triangles until fixpoint —
    the EDGE-level cohesion filter one step stronger than the node-level
    ``kcore_members`` (an edge in a k-truss has k-2 common-neighbour
    witnesses; reference's min-run edge support, src/PathFinder.jl:59-63,
    recursively enforced).

    Per round: triangles via the degree-oriented wedge machinery
    (``_oriented_triangles`` — O(m^1.5) wedge work, hub-safe), each triangle
    emits support to its three canonical edges, support counts by bucketed
    reduce, and the edge set filters through a co-partitioned left
    ``hash_join`` (edges without triangles get support 0). Every round
    strictly shrinks the edge set; the loop stops at fixpoint and returns
    the surviving edges with their within-truss support.

    Dual path (the ``connected_components`` discipline): a graph at or
    below ``small_graph_threshold`` edges peels vectorized on the driver —
    the multi-round distributed loop is ~25 Ray stages per round of pure
    launch overhead at that size — while anything larger runs the bounded
    per-round shuffles above. Identical output either way (planted test
    pins the two paths to each other).

    Output: src, dst, support:int64 (triangle count inside the k-truss).
    """
    import pyarrow as pa

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    if k < 3:
        raise ValueError("k-truss requires k >= 3")

    empty = pa.table(
        {"src": pa.array([], pa.int64()),
         "dst": pa.array([], pa.int64()),
         "support": pa.array([], pa.int64())}
    )

    def tri_edges(batch: pd.DataFrame) -> pd.DataFrame:
        # triangle (apex, src, dst) with src < dst; apex vs src/dst order is
        # arbitrary, so canonicalize the two apex edges
        a = batch["apex"].to_numpy()
        s = batch["src"].to_numpy()
        d = batch["dst"].to_numpy()
        return pd.DataFrame(
            {
                "src": np.concatenate(
                    [np.minimum(a, s), np.minimum(a, d), s]
                ),
                "dst": np.concatenate(
                    [np.maximum(a, s), np.maximum(a, d), d]
                ),
            }
        )

    def sum_support(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["src", "dst"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame(
            {"src": idx["src"], "dst": idx["dst"],
             "support": g.to_numpy().astype("int64")}
        )

    cur = edges.select_columns(["src", "dst"]).materialize()

    if cur.count() <= small_graph_threshold:
        e = cur.to_pandas()  # bounded by small_graph_threshold rows
        for _ in range(max_rounds):
            if not len(e):
                return ray.data.from_arrow(empty)
            idx = pd.MultiIndex.from_frame(e[["src", "dst"]])
            m = e.merge(e, left_on="dst", right_on="src")
            tri = m[
                pd.MultiIndex.from_arrays(
                    [m["src_x"], m["dst_y"]]
                ).isin(idx)
            ]
            sup = (
                pd.concat(
                    [
                        tri[["src_x", "dst_x"]].set_axis(["src", "dst"], axis=1),
                        tri[["src_x", "dst_y"]].set_axis(["src", "dst"], axis=1),
                        tri[["dst_x", "dst_y"]].set_axis(["src", "dst"], axis=1),
                    ],
                    ignore_index=True,
                )
                .groupby(["src", "dst"], sort=False)
                .size()
                .rename("support")
                .reset_index()
            )
            scored = e.merge(sup, on=["src", "dst"], how="left")
            scored["support"] = scored["support"].fillna(0).astype("int64")
            surv = scored[scored["support"] >= k - 2]
            if len(surv) == len(e):
                if not len(surv):
                    return ray.data.from_arrow(empty)
                return ray.data.from_pandas(
                    surv.astype(
                        {"src": "int64", "dst": "int64", "support": "int64"}
                    ).reset_index(drop=True)
                )
            e = surv[["src", "dst"]].reset_index(drop=True)
        raise RuntimeError(f"k-truss did not converge in {max_rounds} rounds")

    for _ in range(max_rounds):
        n_edges = cur.count()
        if n_edges == 0:
            return ray.data.from_arrow(empty)
        triangles, _deg = _oriented_triangles(cur, n_buckets)
        support = bucketed_group_apply(
            triangles.map_batches(
                tri_edges, batch_format="pandas", batch_size=65536
            ),
            ["src", "dst"],
            sum_support,
            n_buckets=n_buckets,
        )
        joined = hash_join(
            cur, support, on=["src", "dst"], how="left", n_buckets=n_buckets
        )

        def finish(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "src": batch["src"].astype("int64"),
                    "dst": batch["dst"].astype("int64"),
                    "support": batch["support"].fillna(0).astype("int64"),
                }
            )

        scored = joined.map_batches(
            finish, batch_format="pandas", batch_size=65536
        ).materialize()
        survivors = scored.filter(expr=f"support >= {k - 2}")
        n_surv = survivors.count()
        if n_surv == n_edges:
            return survivors
        cur = survivors.select_columns(["src", "dst"]).materialize()
    raise RuntimeError(f"k-truss did not converge in {max_rounds} rounds")


def ktruss_sql(edges_sql: str, k: int, rounds: int = 10) -> str:
    """DuckDB oracle for ``ktruss_edges``: the peel loop UNROLLED as
    ``rounds`` (triangle-support -> edge-filter) CTE layer pairs, the
    ``kcore_sql`` discipline — sound while ``rounds`` >= the true peel
    count (extra layers are no-ops at the fixpoint; verified by parity with
    the fixpoint loop at the driver scales). The final layer recomputes
    support on the fixpoint edge set, which equals the engine's last-round
    support."""
    layers = []
    prev_e = "e0"
    for i in range(1, rounds + 1):
        layers.append(f"""t{i} AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM {prev_e} e1
  JOIN {prev_e} e2 ON e2.src = e1.dst
  JOIN {prev_e} e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
s{i} AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS sup
  FROM (SELECT a AS src, b AS dst FROM t{i}
        UNION ALL SELECT a, c FROM t{i}
        UNION ALL SELECT b, c FROM t{i})
  GROUP BY src, dst
),
e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {prev_e} e
  JOIN s{i} s ON s.src = e.src AND s.dst = e.dst
  WHERE s.sup >= {k - 2}
)""")
        prev_e = f"e{i}"
    layer_sql = ",\n".join(layers)
    return f"""
WITH e0 AS MATERIALIZED ({edges_sql}),
{layer_sql},
t_fin AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM {prev_e} e1
  JOIN {prev_e} e2 ON e2.src = e1.dst
  JOIN {prev_e} e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT CAST(e.src AS BIGINT) AS src, CAST(e.dst AS BIGINT) AS dst,
       CAST(s.sup AS BIGINT) AS support
FROM {prev_e} e
JOIN (
  SELECT src, dst, COUNT(*) AS sup
  FROM (SELECT a AS src, b AS dst FROM t_fin
        UNION ALL SELECT a, c FROM t_fin
        UNION ALL SELECT b, c FROM t_fin)
  GROUP BY src, dst
) s ON s.src = e.src AND s.dst = e.dst
"""


COPURCHASE_EDGES_SQL = """
SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
       CAST(b.l_partkey AS BIGINT) AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def tool_stats(
    transcripts: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Per-tool usage statistics over the transcript corpus — the one
    input_hint column (``tool``) no other operator aggregates BY: for every
    tool name, how often it is called, in how many conversations, and how
    many calls are immediately followed by an assistant turn in the same
    conversation (the tool-call-got-consumed proxy an agent-quality
    dashboard tracks).

    Order-dependent per conversation, so conv streams co-locate whole in
    conv buckets (one keyed shuffle), the next-turn role comes from a
    vectorized in-group shift, and per-tool partials reduce in a tiny
    tool-cardinality-bounded second shuffle — the ``event_markov`` shape
    over the transcripts table. Output: tool, n_calls:int64, n_convs:int64,
    n_followed_by_assistant:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        nxt = d.groupby("conv_id", sort=False)["role"].shift(-1)
        k = d["tool"].notna()
        if not k.any():
            return pd.DataFrame(
                {"tool": pd.Series([], dtype="object"),
                 "conv_id": pd.Series([], dtype="object"),
                 "n_calls": pd.Series([], dtype="int64"),
                 "n_followed": pd.Series([], dtype="int64")}
            )
        t = pd.DataFrame(
            {"tool": d["tool"][k], "conv_id": d["conv_id"][k],
             "followed": (nxt[k] == "assistant").astype("int64")}
        )
        g = t.groupby(["tool", "conv_id"], sort=False).agg(
            n_calls=("followed", "size"), n_followed=("followed", "sum")
        ).reset_index()
        g["n_calls"] = g["n_calls"].astype("int64")
        g["n_followed"] = g["n_followed"].astype("int64")
        return g

    per = bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "role", "tool"]),
        ["conv_id"],
        per_conv,
        n_buckets=n_buckets,
    )

    def per_tool(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("tool", sort=False).agg(
            n_calls=("n_calls", "sum"),
            n_convs=("conv_id", "nunique"),
            n_followed_by_assistant=("n_followed", "sum"),
        ).reset_index()
        for c in ("n_calls", "n_convs", "n_followed_by_assistant"):
            g[c] = g[c].astype("int64")
        return g

    import pyarrow as pa

    from tcx2graph_jl_ray.functions.arrowutil import with_schema

    out = bucketed_group_apply(per, ["tool"], per_tool, n_buckets=16)
    return with_schema(
        out,
        [("tool", pa.string()), ("n_calls", pa.int64()),
         ("n_convs", pa.int64()), ("n_followed_by_assistant", pa.int64())],
    )


TOOL_STATS_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
seq AS (
  SELECT tool,
         conv_id,
         LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role
  FROM t
)
SELECT tool,
       CAST(COUNT(*) AS BIGINT) AS n_calls,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(COUNT(*) FILTER (next_role = 'assistant') AS BIGINT)
         AS n_followed_by_assistant
FROM seq
WHERE tool IS NOT NULL
GROUP BY tool
"""


def directed_triads(
    transitions: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Directed-triad census over the entity transition graph: distinct
    directed 2-paths (wedges a->b->c, a != c), TRANSITIVE triangles
    (a->b->c closed by a->c — hierarchy/feed-forward motifs) and CYCLIC
    triangles (closed by c->a, each 3-cycle counted once) — the motif
    profile that separates hierarchical KGs from cyclic ones (directed-triad
    census of Holland & Leinhardt, public), one level past the undirected
    ``triangle_stats``.

    Scale shape: the distinct edge set dedupes through one bucketed apply;
    wedges materialize via a co-partitioned ``hash_join`` on the middle
    vertex; both closures are one more co-partitioned join each (never a
    broadcast of the edge set). Every count reduces with ``Dataset.count``
    — the driver never holds rows. Output (one row): n_edges, n_wedges,
    n_transitive, n_cyclic (all int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    edges = bucketed_group_apply(
        transitions.select_columns(["from_entity", "to_entity"]).map_batches(
            lambda b: b[b["from_entity"] != b["to_entity"]].drop_duplicates(),
            batch_format="pandas", batch_size=65536,
        ),
        ["from_entity", "to_entity"],
        lambda b: b.drop_duplicates(),
        n_buckets=n_buckets,
    ).materialize()
    n_edges = edges.count()

    eab = edges.map_batches(
        lambda b: b.rename(columns={"from_entity": "a", "to_entity": "b"}),
        batch_format="pandas",
    )
    ebc = edges.map_batches(
        lambda b: b.rename(columns={"from_entity": "b", "to_entity": "c"}),
        batch_format="pandas",
    )
    wedges = hash_join(eab, ebc, on="b", n_buckets=n_buckets).map_batches(
        lambda b: b[b["a"] != b["c"]], batch_format="pandas",
    ).materialize()
    n_wedges = wedges.count()

    w_ac = wedges.select_columns(["a", "c"])
    eac = edges.map_batches(
        lambda b: b.rename(columns={"from_entity": "a", "to_entity": "c"})
        .assign(hit=np.int64(1)),
        batch_format="pandas",
    )
    n_trans = hash_join(w_ac, eac, on=["a", "c"], n_buckets=n_buckets).count()
    eca = edges.map_batches(
        lambda b: b.rename(columns={"from_entity": "c", "to_entity": "a"})
        .assign(hit=np.int64(1)),
        batch_format="pandas",
    )
    n_cyc3 = hash_join(w_ac, eca, on=["a", "c"], n_buckets=n_buckets).count()

    return ray.data.from_pandas(pd.DataFrame({
        "n_edges": pd.array([n_edges], dtype="int64"),
        "n_wedges": pd.array([n_wedges], dtype="int64"),
        "n_transitive": pd.array([n_trans], dtype="int64"),
        # every directed 3-cycle appears once per rotation
        "n_cyclic": pd.array([n_cyc3 // 3], dtype="int64"),
    }))


DIRECTED_TRIADS_SQL_TEMPLATE = """
WITH tr AS ({transitions}),
e AS MATERIALIZED (
  SELECT DISTINCT from_entity AS a, to_entity AS b
  FROM tr WHERE from_entity <> to_entity
),
w AS MATERIALIZED (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1 JOIN e e2 ON e2.a = e1.b
  WHERE e1.a <> e2.b
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n_wedges,
  (SELECT CAST(COUNT(*) AS BIGINT)
   FROM w JOIN e ON e.a = w.a AND e.b = w.c) AS n_transitive,
  (SELECT CAST(COUNT(*) // 3 AS BIGINT)
   FROM w JOIN e ON e.a = w.c AND e.b = w.a) AS n_cyclic
"""


def entity_hits(
    transitions: ray.data.Dataset,
    n_iter: int = 10,
    small_graph_threshold: int = 200_000,
) -> ray.data.Dataset:
    """HITS hubs-and-authorities (Kleinberg JACM'99, public) over the
    weighted entity transition graph, L1-normalized per half-step: the
    second iterative centrality next to ``entity_pagerank``, separating
    entities that POINT AT important things (hubs) from the important
    things themselves (authorities).

    Size discipline mirrors ``entity_pagerank``: at or below
    ``small_graph_threshold`` nodes the iteration is one driver numpy loop
    over the (aggregated once) edge arrays; above it, the hub/authority
    VECTORS broadcast per half-step (vocabulary-bounded, ray.put once per
    round) while the edge set streams through ``map_batches`` partial sums
    + a bucketed reduce — contributions never land on the driver. (A
    vocabulary beyond broadcast budget would thread through the
    ``_pagerank_dataset_ranks`` dataset-vector shape; transitions
    vocabularies are entity-bounded well before that.) Scores round to 6
    (iteration accumulates ulp-order sum-order divergence vs the oracle).
    Output: entity_id, authority, hub."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    edges = transitions.select_columns(
        ["from_entity", "to_entity", "n"]
    ).materialize()

    def agg_edges(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby(["from_entity", "to_entity"], sort=False)["n"].sum()
        return s.reset_index().astype({"n": "int64"})

    e = bucketed_group_apply(
        edges, ["from_entity", "to_entity"], agg_edges
    ).materialize()

    nodes_ds = bucketed_group_apply(
        e.select_columns(["from_entity"]).map_batches(
            lambda b: pd.DataFrame({"entity": b["from_entity"]}),
            batch_format="pandas",
        ).union(
            e.select_columns(["to_entity"]).map_batches(
                lambda b: pd.DataFrame({"entity": b["to_entity"]}),
                batch_format="pandas",
            )
        ),
        ["entity"],
        lambda b: b.drop_duplicates(),
    ).materialize()
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "entity_id": pd.Series([], dtype="object"),
            "authority": pd.Series([], dtype="float64"),
            "hub": pd.Series([], dtype="float64"),
        }))

    nodes = np.sort(nodes_ds.to_pandas()["entity"].to_numpy())

    if n_nodes <= small_graph_threshold:
        ep = e.to_pandas()
        idx = {v: i for i, v in enumerate(nodes)}
        src = ep["from_entity"].map(idx).to_numpy()
        dst = ep["to_entity"].map(idx).to_numpy()
        w = ep["n"].to_numpy(dtype="float64")
        h = np.full(n_nodes, 1.0 / n_nodes)
        a = np.full(n_nodes, 1.0 / n_nodes)
        for _ in range(n_iter):
            ra = np.zeros(n_nodes)
            np.add.at(ra, dst, h[src] * w)
            a = ra / ra.sum()
            rh = np.zeros(n_nodes)
            np.add.at(rh, src, a[dst] * w)
            h = rh / rh.sum()
        return ray.data.from_pandas(pd.DataFrame({
            "entity_id": nodes,
            "authority": np.round(a, 6),
            "hub": np.round(h, 6),
        }))

    # streaming path: broadcast one score vector per half-step, stream edges
    h = pd.Series(np.full(n_nodes, 1.0 / n_nodes), index=nodes)
    a = pd.Series(np.full(n_nodes, 1.0 / n_nodes), index=nodes)

    class _Push:
        """Half-step partial: contribution = score[key_col] * w grouped by
        the opposite endpoint."""

        def __init__(self, ref, key_col, out_col):
            self.score = ray.get(ref)
            self.key_col, self.out_col = key_col, out_col

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            s = self.score.reindex(batch[self.key_col]).to_numpy()
            df = pd.DataFrame({
                "node": batch[self.out_col],
                "x": s * batch["n"].to_numpy(dtype="float64"),
            })
            g = df.groupby("node", sort=False)["x"].sum()
            return pd.DataFrame({"node": g.index, "x": g.to_numpy()})

    def reduce_x(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("node", sort=False)["x"].sum()
        return pd.DataFrame({"node": g.index, "x": g.to_numpy()})

    def half_step(score, key_col, out_col):
        ref = ray.put(score)
        parts = e.map_batches(
            _Push, fn_constructor_args=(ref, key_col, out_col),
            batch_format="pandas", batch_size=65536, concurrency=(1, 8),
        )
        raw = bucketed_group_apply(parts, ["node"], reduce_x).to_pandas()
        v = raw.set_index("node")["x"].reindex(nodes).fillna(0.0)
        return v / v.to_numpy().sum()

    for _ in range(n_iter):
        a = half_step(h, "from_entity", "to_entity")
        h = half_step(a, "to_entity", "from_entity")

    return ray.data.from_pandas(pd.DataFrame({
        "entity_id": nodes,
        "authority": np.round(a.to_numpy(), 6),
        "hub": np.round(h.to_numpy(), 6),
    }))


def hits_sql(transitions_sql: str, n_iter: int = 10) -> str:
    """DuckDB oracle for ``entity_hits``: the bounded iteration UNROLLED as
    paired a{i}/h{i} CTE layers (the ``pagerank_sql`` pattern), each
    half-step = weighted push + L1 normalization."""
    layers = []
    prev_h = "h0"
    last_a = None
    for i in range(1, n_iter + 1):
        ar, ai, hr, hi = f"ar{i}", f"a{i}", f"hr{i}", f"h{i}"
        layers.append(f"""{ar} AS MATERIALIZED (
  SELECT nd.entity_id, COALESCE(s.x, 0.0) AS x
  FROM nodes nd LEFT JOIN (
    SELECT e.v AS entity_id, SUM(p.h * e.w) AS x
    FROM {prev_h} p JOIN e ON e.u = p.entity_id GROUP BY e.v
  ) s USING (entity_id)
),
{ai} AS MATERIALIZED (
  SELECT entity_id, x / (SELECT SUM(x) FROM {ar}) AS a FROM {ar}
),
{hr} AS MATERIALIZED (
  SELECT nd.entity_id, COALESCE(s.x, 0.0) AS x
  FROM nodes nd LEFT JOIN (
    SELECT e.u AS entity_id, SUM(q.a * e.w) AS x
    FROM {ai} q JOIN e ON e.v = q.entity_id GROUP BY e.u
  ) s USING (entity_id)
),
{hi} AS MATERIALIZED (
  SELECT entity_id, x / (SELECT SUM(x) FROM {hr}) AS h FROM {hr}
)""")
        prev_h = hi
        last_a = ai
    layer_sql = ",\n".join(layers)
    return f"""
WITH tr AS MATERIALIZED ({transitions_sql}),
e AS MATERIALIZED (
  SELECT from_entity AS u, to_entity AS v, CAST(SUM(n) AS DOUBLE) AS w
  FROM tr GROUP BY from_entity, to_entity
),
nodes AS MATERIALIZED (
  SELECT u AS entity_id FROM e UNION SELECT v FROM e
),
h0 AS MATERIALIZED (
  SELECT entity_id, 1.0 / (SELECT COUNT(*) FROM nodes) AS h FROM nodes
),
{layer_sql}
SELECT n.entity_id,
       ROUND(a.a, 6) AS authority,
       ROUND(h.h, 6) AS hub
FROM nodes n
JOIN {last_a} a USING (entity_id)
JOIN {prev_h} h USING (entity_id)
"""


def response_latency(
    transcripts: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Per-conversation assistant response latency: for every user turn, the
    time to the FIRST assistant turn that follows it in the conversation —
    the agent-quality latency metric next to ``tool_stats``'s consumption
    metric. All statistics in exact integer microseconds (half-up mean, the
    ``rel_cohort_ltv`` discipline; no float enters).

    Order-dependent per conversation: conv streams co-locate whole in conv
    buckets (one keyed shuffle); the next-assistant timestamp is one
    vectorized in-group backfill over assistant-only timestamps (turn order
    is (ts, event_id)-monotone, so the backfilled value IS the first
    following assistant). Output: conv_id, n_responses, min_latency_us,
    max_latency_us, avg_latency_us (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        us = pd.to_datetime(d["ts"]).astype("datetime64[us]").astype("int64")
        a_ts = us.where((d["role"] == "assistant").to_numpy())
        next_a = a_ts.groupby(d["conv_id"], sort=False).bfill()
        k = ((d["role"] == "user") & next_a.notna()).to_numpy()
        if not k.any():
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype="object"),
                "n_responses": pd.Series([], dtype="int64"),
                "min_latency_us": pd.Series([], dtype="int64"),
                "max_latency_us": pd.Series([], dtype="int64"),
                "avg_latency_us": pd.Series([], dtype="int64"),
            })
        lat = (next_a[k] - us[k]).astype("int64")
        g = pd.DataFrame({"conv_id": d["conv_id"][k], "lat": lat}).groupby(
            "conv_id", sort=False
        )["lat"].agg(["size", "sum", "min", "max"])
        n = g["size"].astype("int64")
        s = g["sum"].astype("int64")
        return pd.DataFrame({
            "conv_id": g.index,
            "n_responses": n.to_numpy(),
            "min_latency_us": g["min"].astype("int64").to_numpy(),
            "max_latency_us": g["max"].astype("int64").to_numpy(),
            "avg_latency_us": ((2 * s + n) // (2 * n)).to_numpy(),
        })

    return bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "role", "ts"]),
        ["conv_id"],
        per_conv,
        n_buckets=n_buckets,
    )


RESPONSE_LATENCY_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
w1 AS (
  SELECT conv_id, role, ts,
         MIN(CASE WHEN role = 'assistant' THEN epoch_us(ts) END) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS next_a
  FROM t
),
lat AS (
  SELECT conv_id, next_a - epoch_us(ts) AS lat
  FROM w1 WHERE role = 'user' AND next_a IS NOT NULL
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_responses,
       CAST(MIN(lat) AS BIGINT) AS min_latency_us,
       CAST(MAX(lat) AS BIGINT) AS max_latency_us,
       CAST((2 * SUM(lat) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
         AS avg_latency_us
FROM lat GROUP BY conv_id
"""


def reciprocity(
    transitions: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-entity edge reciprocity over the distinct directed transition
    graph: out-degree, the number of out-neighbors that point back, and
    their ratio — the dialogue-symmetry signal that separates
    command-response entity pairs from one-way references (complements
    ``kg_directed_triads``' triangle census at the node level).

    Shape: distinct edges dedupe once (bucketed apply); the reciprocal
    check is ONE co-partitioned self-join of the edge set against its own
    reversal (never a broadcast); per-entity counts reduce bucketed. The
    ratio is one division of exact ints, rounded 6. Output: entity_id,
    out_deg, n_recip, reciprocity."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    edges = bucketed_group_apply(
        transitions.select_columns(["from_entity", "to_entity"]).map_batches(
            lambda b: b[b["from_entity"] != b["to_entity"]].drop_duplicates(),
            batch_format="pandas", batch_size=65536,
        ),
        ["from_entity", "to_entity"],
        lambda b: b.drop_duplicates(),
        n_buckets=n_buckets,
    ).materialize()

    def count_out(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("a", sort=False).size()
        return pd.DataFrame({"a": s.index,
                             "out_deg": s.to_numpy().astype("int64")})

    eab = edges.map_batches(
        lambda b: b.rename(columns={"from_entity": "a", "to_entity": "b"}),
        batch_format="pandas",
    )
    erev = edges.map_batches(
        lambda b: pd.DataFrame({"a": b["to_entity"], "b": b["from_entity"],
                                "back": np.int64(1)}),
        batch_format="pandas",
    )
    od = bucketed_group_apply(eab, ["a"], count_out, n_buckets=n_buckets)
    recip_rows = hash_join(eab, erev, on=["a", "b"], n_buckets=n_buckets)
    rc = bucketed_group_apply(
        recip_rows.select_columns(["a"]),
        ["a"],
        lambda b: pd.DataFrame({
            "a": b.groupby("a", sort=False).size().index,
            "n_recip": b.groupby("a", sort=False).size().to_numpy()
            .astype("int64"),
        }),
        n_buckets=n_buckets,
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        nr = batch["n_recip"].fillna(0).astype("int64")
        od_ = batch["out_deg"].astype("int64")
        return pd.DataFrame({
            "entity_id": batch["a"],
            "out_deg": od_,
            "n_recip": nr,
            "reciprocity": np.round(
                nr.to_numpy(dtype="float64") / od_.to_numpy(dtype="float64"),
                6,
            ),
        })

    return hash_join(od, rc, on="a", how="left", n_buckets=n_buckets)\
        .map_batches(finish, batch_format="pandas", batch_size=65536)


RECIPROCITY_SQL_TEMPLATE = """
WITH tr AS ({transitions}),
e AS MATERIALIZED (
  SELECT DISTINCT from_entity AS a, to_entity AS b
  FROM tr WHERE from_entity <> to_entity
),
od AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS out_deg FROM e GROUP BY a),
rc AS (
  SELECT e.a, CAST(COUNT(*) AS BIGINT) AS n_recip
  FROM e JOIN e r ON r.a = e.b AND r.b = e.a
  GROUP BY e.a
)
SELECT od.a AS entity_id, od.out_deg,
       CAST(COALESCE(rc.n_recip, 0) AS BIGINT) AS n_recip,
       ROUND(CAST(COALESCE(rc.n_recip, 0) AS DOUBLE)
             / CAST(od.out_deg AS DOUBLE), 6) AS reciprocity
FROM od LEFT JOIN rc ON rc.a = od.a
"""


def role_stats(
    transcripts: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """Corpus composition by ROLE: turns, conversations touched, total and
    half-up-average whitespace tokens per role — the transcript-side
    counterpart of ``text_corpus_composition`` (what share of the corpus is
    user ask vs assistant answer vs tool output drives every token-budget
    decision).

    Order-free: per-batch partials (token counts via the house
    ``str.count('[^ ]+')`` == non-empty split-token rule), conv
    distinctness via per-batch (role, conv) dedup then a bucketed exact
    reduce, final rollup role-bounded. Output: role, n_turns, n_convs,
    n_tokens, avg_tokens (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ntok = batch["text"].str.count(r"[^ ]+").fillna(0).astype("int64")
        g = pd.DataFrame({
            "role": batch["role"], "conv_id": batch["conv_id"], "ntok": ntok,
        }).groupby(["role", "conv_id"], sort=False)["ntok"].agg(
            ["size", "sum"]
        ).reset_index()
        g.columns = ["role", "conv_id", "n_turns", "n_tokens"]
        return g

    parts = transcripts.select_columns(
        ["conv_id", "role", "text"]
    ).map_batches(partial, batch_format="pandas", batch_size=8192)

    def per_role_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["role", "conv_id"], sort=False).agg(
            n_turns=("n_turns", "sum"), n_tokens=("n_tokens", "sum")
        ).reset_index()
        return g

    rc = bucketed_group_apply(
        parts, ["role", "conv_id"], per_role_conv, n_buckets=n_buckets
    )

    def finish(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("role", sort=False).agg(
            n_turns=("n_turns", "sum"),
            n_convs=("conv_id", "size"),
            n_tokens=("n_tokens", "sum"),
        ).reset_index()
        nt = g["n_turns"].astype("int64")
        tk = g["n_tokens"].astype("int64")
        return pd.DataFrame({
            "role": g["role"],
            "n_turns": nt,
            "n_convs": g["n_convs"].astype("int64"),
            "n_tokens": tk,
            "avg_tokens": (2 * tk + nt) // (2 * nt),
        })

    return bucketed_group_apply(rc, ["role"], finish, n_buckets=4)


ROLE_STATS_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
m AS (
  SELECT role, conv_id,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ntok
  FROM t
)
SELECT role,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST((2 * SUM(ntok) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
         AS avg_tokens
FROM m GROUP BY role
"""


def graph_summary(
    transitions: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """One-row global summary of the entity transition graph: node count,
    distinct directed edge count (self-loops excluded), max out-degree, and
    density = e / (n * (n - 1)) as one division of exact ints (rounded 6)
    — the at-a-glance gauge a KG dashboard leads with.

    Distinct edges dedupe once; nodes and the degree max reduce
    distributed; only four scalars reach the driver. Output: n_nodes,
    n_edges, max_out_degree (int64), density (float64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    edges = bucketed_group_apply(
        transitions.select_columns(["from_entity", "to_entity"]).map_batches(
            lambda b: b[b["from_entity"] != b["to_entity"]].drop_duplicates(),
            batch_format="pandas", batch_size=65536,
        ),
        ["from_entity", "to_entity"],
        lambda b: b.drop_duplicates(),
        n_buckets=n_buckets,
    ).materialize()
    n_edges = edges.count()

    nodes = bucketed_group_apply(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": pd.concat(
                [b["from_entity"], b["to_entity"]], ignore_index=True
            )}),
            batch_format="pandas",
        ),
        ["node"],
        lambda b: b.drop_duplicates(),
        n_buckets=n_buckets,
    )
    n_nodes = nodes.count()

    def out_deg(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("from_entity", sort=False).size()
        return pd.DataFrame({"from_entity": s.index,
                             "d": s.to_numpy().astype("int64")})

    od = bucketed_group_apply(
        edges.select_columns(["from_entity"]), ["from_entity"], out_deg,
        n_buckets=n_buckets,
    )
    max_od = int(od.max("d")) if n_edges else 0

    dens = (
        np.round(float(n_edges) / float(n_nodes * (n_nodes - 1)), 6)
        if n_nodes > 1 else 0.0
    )
    return ray.data.from_pandas(pd.DataFrame({
        "n_nodes": pd.array([n_nodes], dtype="int64"),
        "n_edges": pd.array([n_edges], dtype="int64"),
        "max_out_degree": pd.array([max_od], dtype="int64"),
        "density": [dens],
    }))


GRAPH_SUMMARY_SQL_TEMPLATE = """
WITH tr AS ({transitions}),
e AS MATERIALIZED (
  SELECT DISTINCT from_entity AS a, to_entity AS b
  FROM tr WHERE from_entity <> to_entity
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM (SELECT a FROM e UNION SELECT b FROM e)),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
d AS (SELECT CAST(MAX(cnt) AS BIGINT) AS max_out_degree
      FROM (SELECT COUNT(*) AS cnt FROM e GROUP BY a))
SELECT n.n_nodes, m.n_edges, d.max_out_degree,
       ROUND(CAST(m.n_edges AS DOUBLE)
             / CAST(n.n_nodes * (n.n_nodes - 1) AS DOUBLE), 6) AS density
FROM n, m, d
"""


def tool_chains(
    transcripts: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Tool-call chains: counts of consecutive (tool -> next tool) calls
    within a conversation, adjacency taken over the TOOL TURNS ONLY (the
    assistant/user turns between them don't break a chain) — the workflow
    mining view on top of ``tool_stats`` (which tools pipeline into which).

    Order-dependent per conversation: conv streams co-locate whole, the
    next-tool column is one vectorized in-group shift over the tool-turn
    subsequence, pair counts reduce in a tool-pair-bounded second shuffle.
    Output: tool_a, tool_b, n (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        d = d[d["tool"].notna()]
        if not len(d):
            return pd.DataFrame({
                "tool_a": pd.Series([], dtype="object"),
                "tool_b": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            })
        nxt = d.groupby("conv_id", sort=False)["tool"].shift(-1)
        k = nxt.notna()
        g = pd.DataFrame({"tool_a": d["tool"][k], "tool_b": nxt[k]})\
            .groupby(["tool_a", "tool_b"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "tool"]),
        ["conv_id"],
        per_conv,
        n_buckets=n_buckets,
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["tool_a", "tool_b"], sort=False)["n"].sum()
        return g.reset_index().astype({"n": "int64"})

    return bucketed_group_apply(parts, ["tool_a", "tool_b"], merge,
                                n_buckets=4)


TOOL_CHAINS_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
seq AS (
  SELECT tool AS tool_a,
         LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS tool_b
  FROM t WHERE tool IS NOT NULL
)
SELECT tool_a, tool_b, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE tool_b IS NOT NULL
GROUP BY tool_a, tool_b
"""


def cooc_conditional(
    cooccurrence: ray.data.Dataset,
    mentions_with_entity: ray.data.Dataset,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """Directed conditional co-occurrence: P(b | a) = conversations
    containing both / conversations containing a, for every ordered
    co-occurring entity pair — the association-rule confidence over the
    KG's undirected co-occurrence counts (asymmetry is the signal: a
    niche entity implies its hub, never the reverse).

    The per-entity conversation counts reduce distributed and ship once
    via ray.put (entity-vocabulary-bounded — the canonicalization small
    side); both directions of each undirected edge emit in one map; the
    probability is one division of exact ints, rounded 6. Output:
    entity_a, entity_b, n_both, n_a, p_b_given_a."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["conv_id", "entity_id"]].drop_duplicates()

    def count_entity(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()
        s = d.groupby("entity_id", sort=False).size()
        return pd.DataFrame({"entity_id": s.index,
                             "n": s.to_numpy().astype("int64")})

    ec = bucketed_group_apply(
        mentions_with_entity.select_columns(["conv_id", "entity_id"])
        .map_batches(partial_distinct, batch_format="pandas",
                     batch_size=65536),
        ["entity_id"],
        count_entity,
        n_buckets=n_buckets,
    ).to_pandas()  # entity-vocabulary-bounded
    n_ref = ray.put(dict(zip(ec["entity_id"], ec["n"])))

    class _Cond:
        def __init__(self, ref):
            self.n = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            a = pd.concat([batch["src"], batch["dst"]], ignore_index=True)
            b = pd.concat([batch["dst"], batch["src"]], ignore_index=True)
            nb = pd.concat(
                [batch["n_convs"], batch["n_convs"]], ignore_index=True
            ).astype("int64")
            na = a.map(self.n).astype("int64")
            return pd.DataFrame({
                "entity_a": a, "entity_b": b,
                "n_both": nb, "n_a": na,
                "p_b_given_a": np.round(
                    nb.to_numpy(dtype="float64")
                    / na.to_numpy(dtype="float64"), 6
                ),
            })

    return cooccurrence.map_batches(
        _Cond, fn_constructor_args=(n_ref,), batch_format="pandas",
        batch_size=65536, concurrency=(1, 4),
    )


COOC_CONDITIONAL_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
me AS (SELECT DISTINCT mm.conv_id, l.entity_id
       FROM m mm JOIN lab l ON mm.norm = l.norm),
ec AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n
       FROM me GROUP BY entity_id),
cooc AS (
  SELECT a.entity_id AS src, b.entity_id AS dst,
         CAST(COUNT(*) AS BIGINT) AS n_convs
  FROM me a JOIN me b
    ON a.conv_id = b.conv_id AND a.entity_id < b.entity_id
  GROUP BY 1, 2
),
d AS (
  SELECT src AS entity_a, dst AS entity_b, n_convs FROM cooc
  UNION ALL
  SELECT dst, src, n_convs FROM cooc
)
SELECT d.entity_a, d.entity_b, d.n_convs AS n_both, ec.n AS n_a,
       ROUND(CAST(d.n_convs AS DOUBLE) / CAST(ec.n AS DOUBLE), 6)
         AS p_b_given_a
FROM d JOIN ec ON ec.entity_id = d.entity_a
"""
)


def entity_trend(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    min_days: int = 2,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-entity activity trend: OLS slope + intercept of DAILY mention
    counts over days-since-2020 — is an entity heating up or fading
    (``events_user_trend``'s exact-integer OLS applied to the KG's
    temporal axis; only days WITH mentions enter the fit, stated
    contract). Mention timestamps attach from transcripts through the
    co-partitioned (conv, turn) join the monthly transitions already use.

    All sufficient statistics exact int64; slope and intercept are one
    shared double expression each, rounded 6; zero-variance (single-day)
    entities drop. Output: entity_id, n_days, slope, intercept."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    me = mentions_with_entity.select_columns(
        ["conv_id", "turn_idx", "entity_id"]
    )
    ts = transcripts.select_columns(["conv_id", "turn_idx", "ts"])
    j = hash_join(me, ts, on=["conv_id", "turn_idx"], n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(batch["ts"])
        mi = (
            (t.dt.floor("D") - pd.Timestamp("2020-01-01")).dt.days
        ).astype("int64")
        g = pd.DataFrame({"entity_id": batch["entity_id"], "m": mi})\
            .groupby(["entity_id", "m"], sort=False).size()
        out = g.reset_index(name="y")
        out["y"] = out["y"].astype("int64")
        return out

    per_month = bucketed_group_apply(
        j.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["entity_id", "m"],
        lambda b: b.groupby(["entity_id", "m"], sort=False)["y"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    )

    def per_entity(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket
        x = d["m"].astype("int64")
        y = d["y"].astype("int64")
        g = pd.DataFrame({
            "entity_id": d["entity_id"], "x": x, "y": y,
            "xy": x * y, "x2": x * x,
        }).groupby("entity_id", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sx2=("x2", "sum"),
        )
        n = g["n"].astype("int64")
        det = n * g["sx2"] - g["sx"] * g["sx"]
        k = (n >= min_days) & (det > 0)
        g, n, det = g[k], n[k], det[k]
        if not len(g):
            return pd.DataFrame({
                "entity_id": pd.Series([], dtype="object"),
                "n_days": pd.Series([], dtype="int64"),
                "slope": pd.Series([], dtype="float64"),
                "intercept": pd.Series([], dtype="float64"),
            })
        num_s = (n * g["sxy"] - g["sx"] * g["sy"]).astype("int64")
        num_i = (g["sy"] * g["sx2"] - g["sx"] * g["sxy"]).astype("int64")
        return pd.DataFrame({
            "entity_id": g.index,
            "n_days": n.to_numpy(),
            "slope": np.round(
                num_s.to_numpy(dtype="float64")
                / det.to_numpy(dtype="float64"), 6
            ),
            "intercept": np.round(
                num_i.to_numpy(dtype="float64")
                / det.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(
        per_month, ["entity_id"], per_entity, n_buckets=8
    )


ENTITY_TREND_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
t AS ({transcripts}),
me AS (
  SELECT l.entity_id,
         date_diff('day', DATE '2020-01-01', CAST(t.ts AS DATE)) AS mo
  FROM m mm
  JOIN lab l ON mm.norm = l.norm
  JOIN t ON t.conv_id = mm.conv_id AND t.turn_idx = mm.turn_idx
),
c AS (
  SELECT entity_id, CAST(mo AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM me GROUP BY entity_id, mo
),
s AS (
  SELECT entity_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sx2
  FROM c GROUP BY entity_id
)
SELECT entity_id,
       n AS n_days,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS slope,
       ROUND(CAST(sy * sx2 - sx * sxy AS DOUBLE)
             / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS intercept
FROM s
WHERE n >= {min_days} AND (n * sx2 - sx * sx) > 0
"""
)


def conv_mention_density(
    mentions: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-conversation mention density: tokens, mention rows, and
    mentions-per-100-tokens — how entity-rich each conversation is (the
    prioritization signal for extraction budgets). Both sides reduce to
    conv-level partials before ONE co-partitioned join on conv_id; the
    density is one division of exact ints scaled by 100, rounded 6.
    Output: conv_id, n_tokens, n_mentions, density."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def tok_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ntok = batch["text"].str.count(r"[^ ]+").fillna(0).astype("int64")
        g = pd.DataFrame({"conv_id": batch["conv_id"], "t": ntok})\
            .groupby("conv_id", sort=False)["t"].sum()
        return pd.DataFrame({"conv_id": g.index,
                             "n_tokens": g.to_numpy().astype("int64")})

    toks = bucketed_group_apply(
        transcripts.select_columns(["conv_id", "text"]).map_batches(
            tok_partial, batch_format="pandas", batch_size=8192
        ),
        ["conv_id"],
        lambda b: b.groupby("conv_id", sort=False)["n_tokens"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    )

    def men_partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("conv_id", sort=False).size()
        return pd.DataFrame({"conv_id": s.index,
                             "n_mentions": s.to_numpy().astype("int64")})

    mens = bucketed_group_apply(
        mentions.select_columns(["conv_id"]).map_batches(
            men_partial, batch_format="pandas", batch_size=65536
        ),
        ["conv_id"],
        lambda b: b.groupby("conv_id", sort=False)["n_mentions"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        nm = batch["n_mentions"].fillna(0).astype("int64")
        nt = batch["n_tokens"].astype("int64")
        k = (nt > 0).to_numpy()
        return pd.DataFrame({
            "conv_id": batch["conv_id"][k],
            "n_tokens": nt[k],
            "n_mentions": nm[k],
            "density": np.round(
                100.0 * nm[k].to_numpy(dtype="float64")
                / nt[k].to_numpy(dtype="float64"), 6
            ),
        })

    return hash_join(toks, mens, on="conv_id", how="left",
                     n_buckets=n_buckets)\
        .map_batches(finish, batch_format="pandas", batch_size=65536)


CONV_MENTION_DENSITY_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
m AS ({mentions}),
tk AS (
  SELECT conv_id,
         CAST(SUM(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT)
           AS n_tokens
  FROM t GROUP BY conv_id
),
mc AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_mentions
       FROM m GROUP BY conv_id)
SELECT tk.conv_id, tk.n_tokens,
       CAST(COALESCE(mc.n_mentions, 0) AS BIGINT) AS n_mentions,
       ROUND(100.0 * CAST(COALESCE(mc.n_mentions, 0) AS DOUBLE)
             / CAST(tk.n_tokens AS DOUBLE), 6) AS density
FROM tk LEFT JOIN mc ON mc.conv_id = tk.conv_id
WHERE tk.n_tokens > 0
"""


def entity_roles(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Which ROLE talks about each entity: per-entity mention counts by
    speaker role (user / assistant / tool) plus the dominant role (ties to
    the lexicographically smaller role) — provenance profiling for KG
    trust (tool-sourced entities are measurements; user-sourced ones are
    asks). Roles attach through the co-partitioned (conv, turn) join;
    counts reduce entity-bounded. Output: entity_id, n_user, n_assistant,
    n_tool, dominant_role."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    j = hash_join(
        mentions_with_entity.select_columns(
            ["conv_id", "turn_idx", "entity_id"]
        ),
        transcripts.select_columns(["conv_id", "turn_idx", "role"]),
        on=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["entity_id", "role"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    def per_entity(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["entity_id", "role"], sort=False)["n"].sum()\
            .reset_index()
        p = g.pivot_table(index="entity_id", columns="role", values="n",
                          aggfunc="sum", fill_value=0)
        for c in ("user", "assistant", "tool"):
            if c not in p.columns:
                p[c] = 0
        dom = g.sort_values(["n", "role"], ascending=[False, True],
                            kind="mergesort").drop_duplicates("entity_id")\
            .set_index("entity_id")["role"]
        return pd.DataFrame({
            "entity_id": p.index,
            "n_user": p["user"].astype("int64").to_numpy(),
            "n_assistant": p["assistant"].astype("int64").to_numpy(),
            "n_tool": p["tool"].astype("int64").to_numpy(),
            "dominant_role": dom.reindex(p.index).to_numpy(),
        })

    return bucketed_group_apply(
        j.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["entity_id"],
        per_entity,
        n_buckets=8,
    )


ENTITY_ROLES_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
t AS ({transcripts}),
me AS (
  SELECT l.entity_id, t.role
  FROM m mm
  JOIN lab l ON mm.norm = l.norm
  JOIN t ON t.conv_id = mm.conv_id AND t.turn_idx = mm.turn_idx
),
c AS (SELECT entity_id, role, CAST(COUNT(*) AS BIGINT) AS n
      FROM me GROUP BY entity_id, role),
dom AS (
  SELECT entity_id, role AS dominant_role
  FROM (SELECT entity_id, role,
               ROW_NUMBER() OVER (PARTITION BY entity_id
                                  ORDER BY n DESC, role) AS r
        FROM c)
  WHERE r = 1
)
SELECT p.entity_id,
       CAST(COALESCE(SUM(n) FILTER (role = 'user'), 0) AS BIGINT)
         AS n_user,
       CAST(COALESCE(SUM(n) FILTER (role = 'assistant'), 0) AS BIGINT)
         AS n_assistant,
       CAST(COALESCE(SUM(n) FILTER (role = 'tool'), 0) AS BIGINT)
         AS n_tool,
       ANY_VALUE(dom.dominant_role) AS dominant_role
FROM c p JOIN dom ON dom.entity_id = p.entity_id
GROUP BY p.entity_id
"""
)


def region_edge_matrix(
    cooccurrence: ray.data.Dataset,
    entities_linked,
    n_buckets: int = 8,
) -> ray.data.Dataset:
    """Inter-/intra-region co-occurrence matrix: every undirected entity
    edge rolled up to its endpoints' KB regions (unlinked -> 'UNKNOWN',
    unordered pair normalized) — does the graph talk across regions or
    within them? The entity -> region map is the canonical broadcast small
    side (entity-vocabulary-bounded, ray.put once); counts reduce in a
    region-pair-bounded shuffle. Output: region_a, region_b, n_edges,
    n_convs."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    if isinstance(entities_linked, ray.data.Dataset):
        entities_linked = entities_linked.to_pandas()
    reg = {
        e: (r if isinstance(r, str) else "UNKNOWN")
        for e, r in zip(
            entities_linked["entity_id"], entities_linked["kb_region"]
        )
    }
    reg_ref = ray.put(reg)

    class _Roll:
        def __init__(self, ref):
            self.reg = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ra = batch["src"].map(self.reg).fillna("UNKNOWN")
            rb = batch["dst"].map(self.reg).fillna("UNKNOWN")
            lo = np.minimum(ra.to_numpy(dtype=object),
                            rb.to_numpy(dtype=object))
            hi = np.maximum(ra.to_numpy(dtype=object),
                            rb.to_numpy(dtype=object))
            g = pd.DataFrame({
                "region_a": lo, "region_b": hi,
                "n_convs": batch["n_convs"].astype("int64"),
            }).groupby(["region_a", "region_b"], sort=False)["n_convs"]\
                .agg(["size", "sum"]).reset_index()
            return pd.DataFrame({
                "region_a": g["region_a"], "region_b": g["region_b"],
                "n_edges": g["size"].astype("int64"),
                "n_convs": g["sum"].astype("int64"),
            })

    parts = cooccurrence.map_batches(
        _Roll, fn_constructor_args=(reg_ref,), batch_format="pandas",
        batch_size=65536, concurrency=(1, 4),
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["region_a", "region_b"], sort=False).agg(
            n_edges=("n_edges", "sum"), n_convs=("n_convs", "sum")
        ).reset_index()
        return g.astype({"n_edges": "int64", "n_convs": "int64"})

    return bucketed_group_apply(
        parts, ["region_a", "region_b"], merge, n_buckets=n_buckets
    )


def region_matrix_sql(cooccurrence_sql: str, linked_sql: str) -> str:
    return f"""
WITH cooc AS MATERIALIZED ({cooccurrence_sql}),
lk AS MATERIALIZED ({linked_sql})
SELECT LEAST(COALESCE(la.kb_region, 'UNKNOWN'),
             COALESCE(lb.kb_region, 'UNKNOWN')) AS region_a,
       GREATEST(COALESCE(la.kb_region, 'UNKNOWN'),
                COALESCE(lb.kb_region, 'UNKNOWN')) AS region_b,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(cooc.n_convs) AS BIGINT) AS n_convs
FROM cooc
LEFT JOIN lk la ON la.entity_id = cooc.src
LEFT JOIN lk lb ON lb.entity_id = cooc.dst
GROUP BY 1, 2
"""


def mention_gaps(
    mentions_with_entity: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-entity RE-MENTION gap statistics: for every consecutive pair of
    mentions of the same entity within a conversation, the turn-index gap —
    the temporal-locality profile of the KG (how quickly a conversation
    returns to an entity; the reference's repeated-segment run spacing,
    src/OverlappingSegmentsUtils.jl:146-206, applied to the mention axis).

    Shape: one bucketed pass co-partitioned by (conv, entity) computes the
    in-group sorted diffs and reduces them to per-entity PARTIALS
    (n/min/max/sum — a combiner, one row per entity per bucket); a second
    entity-keyed bucketed reduce merges partials. All gaps exact int64;
    mean is one division, rounded 6. Entities never re-mentioned in any
    conversation drop (stated contract, WHERE gap IS NOT NULL in the
    oracle). Output: entity_id, n_gaps, min_gap, max_gap, mean_gap."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    me = mentions_with_entity.select_columns(
        ["conv_id", "turn_idx", "entity_id"]
    )

    def gaps_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["conv_id", "entity_id", "turn_idx"],
                               kind="mergesort")
        same = (
            (d["conv_id"] == d["conv_id"].shift())
            & (d["entity_id"] == d["entity_id"].shift())
        ).to_numpy()
        gap = d["turn_idx"].astype("int64").diff().to_numpy()
        keep = pd.DataFrame({
            "entity_id": d["entity_id"].to_numpy()[same],
            "gap": gap[same].astype("int64"),
        })
        if not len(keep):
            return pd.DataFrame({
                "entity_id": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "mn": pd.Series([], dtype="int64"),
                "mx": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
            })
        g = keep.groupby("entity_id", sort=False)["gap"].agg(
            ["size", "min", "max", "sum"]
        )
        return pd.DataFrame({
            "entity_id": g.index,
            "n": g["size"].astype("int64").to_numpy(),
            "mn": g["min"].astype("int64").to_numpy(),
            "mx": g["max"].astype("int64").to_numpy(),
            "s": g["sum"].astype("int64").to_numpy(),
        })

    partials = bucketed_group_apply(
        me, ["conv_id", "entity_id"], gaps_in_bucket, n_buckets=n_buckets
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("entity_id", sort=False).agg(
            n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"),
            s=("s", "sum"),
        ).reset_index()
        return pd.DataFrame({
            "entity_id": g["entity_id"],
            "n_gaps": g["n"].astype("int64"),
            "min_gap": g["mn"].astype("int64"),
            "max_gap": g["mx"].astype("int64"),
            "mean_gap": np.round(
                g["s"].to_numpy(dtype="float64")
                / g["n"].to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(partials, ["entity_id"], merge, n_buckets=8)


MENTION_GAPS_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
me AS (
  SELECT mm.conv_id, mm.turn_idx, l.entity_id
  FROM m mm JOIN lab l ON mm.norm = l.norm
),
g AS (
  SELECT entity_id,
         turn_idx - LAG(turn_idx) OVER (
           PARTITION BY conv_id, entity_id ORDER BY turn_idx) AS gap
  FROM me
)
SELECT entity_id,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap) AS BIGINT) AS min_gap,
       CAST(MAX(gap) AS BIGINT) AS max_gap,
       ROUND(CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_gap
FROM g WHERE gap IS NOT NULL
GROUP BY entity_id
"""
)


POS_MARKERS = ("purchase", "signup")
NEG_MARKERS = ("error",)


def conv_sentiment(
    transcripts: ray.data.Dataset,
    pos: tuple = POS_MARKERS,
    neg: tuple = NEG_MARKERS,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """Per-conversation outcome polarity from a marker lexicon:
    P = (pos−neg)/(pos+neg) over exact token hits — the lang_id
    marker-word machinery (src/TCXReader.jl:141-163 provenance) pointed
    at outcome words instead of languages (the synthetic corpus's
    positive markers are conversion events, its negative marker the
    error event; a real deployment swaps in a sentiment lexicon — the
    shape is the lexicon-scoring shape either way).

    Tokenization is the house lower + ' '-split (exact token membership,
    so 'lookup[error]' is NOT an 'error' hit — mirrored by the oracle's
    list_filter). Per-batch (conv, pos, neg) int64 partials, one
    conv-keyed bucketed reduce; conversations with zero marker hits drop
    (stated contract, oracle HAVING). Polarity is one division of exact
    ints, rounded 6. Output: conv_id, n_pos, n_neg, polarity."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    pos_set, neg_set = set(pos), set(neg)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["text"].notna()]
        toks = b["text"].str.lower().str.split(" ")
        tf = pd.DataFrame({
            "row": np.repeat(np.arange(len(b)), toks.str.len()),
            "tok": [t for ws in toks for t in ws],
        })
        conv = b["conv_id"].to_numpy()
        d = pd.DataFrame({
            "conv_id": conv[tf["row"].to_numpy()],
            "p": tf["tok"].isin(pos_set).to_numpy().astype("int64"),
            "n": tf["tok"].isin(neg_set).to_numpy().astype("int64"),
        })
        return d.groupby("conv_id", sort=False).sum().reset_index()

    parts = transcripts.select_columns(["conv_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("conv_id", sort=False).sum().reset_index()
        p = g["p"].astype("int64")
        n = g["n"].astype("int64")
        k = (p + n) > 0
        g, p, n = g[k], p[k], n[k]
        return pd.DataFrame({
            "conv_id": g["conv_id"],
            "n_pos": p,
            "n_neg": n,
            "polarity": np.round(
                (p - n).to_numpy(dtype="float64")
                / (p + n).to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["conv_id"], merge,
                                n_buckets=n_buckets)


CONV_SENTIMENT_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
m AS (
  SELECT conv_id,
         len(list_filter(string_split(lower(text), ' '),
                         x -> x IN {pos})) AS p,
         len(list_filter(string_split(lower(text), ' '),
                         x -> x IN {neg})) AS n
  FROM t WHERE text IS NOT NULL
),
s AS (
  SELECT conv_id, SUM(p) AS p, SUM(n) AS n FROM m GROUP BY conv_id
  HAVING SUM(p) + SUM(n) > 0
)
SELECT conv_id, CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
       ROUND(CAST(p - n AS DOUBLE) / CAST(p + n AS DOUBLE), 6) AS polarity
FROM s
"""


def entity_persistence(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-entity temporal PERSISTENCE: first/last active day, calendar
    span, distinct active days, and the fill ratio active/span — separates
    evergreen entities (mentioned most days of their life) from one-burst
    flashes, the lifespan view next to ``entity_trend``'s direction-of-
    travel fit. Timestamps attach through the same co-partitioned
    (conv, turn) join; (entity, day) dedups exactly in the bucketed
    reduce; per-entity rollup is min/max/count — all order-free. Ratio is
    one division of exact ints, rounded 6. Days emit as 'YYYY-MM-DD'
    strings. Output: entity_id, first_day, last_day, span_days,
    n_active_days, persistence."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    me = mentions_with_entity.select_columns(
        ["conv_id", "turn_idx", "entity_id"]
    )
    ts = transcripts.select_columns(["conv_id", "turn_idx", "ts"])
    j = hash_join(me, ts, on=["conv_id", "turn_idx"], n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            (pd.to_datetime(batch["ts"]).dt.floor("D")
             - pd.Timestamp("2020-01-01")).dt.days
        ).astype("int64")
        d = pd.DataFrame({"entity_id": batch["entity_id"], "day": day})
        return d.drop_duplicates(["entity_id", "day"])

    days = bucketed_group_apply(
        j.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["entity_id", "day"],
        lambda b: b.drop_duplicates(["entity_id", "day"]),
        n_buckets=n_buckets,
    )

    def per_entity(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("entity_id", sort=False)["day"].agg(
            ["min", "max", "size"]
        ).reset_index()
        mn = g["min"].astype("int64")
        mx = g["max"].astype("int64")
        n = g["size"].astype("int64")
        span = mx - mn + 1
        base = pd.Timestamp("2020-01-01")
        return pd.DataFrame({
            "entity_id": g["entity_id"],
            "first_day": (base + pd.to_timedelta(mn, unit="D"))
            .dt.strftime("%Y-%m-%d"),
            "last_day": (base + pd.to_timedelta(mx, unit="D"))
            .dt.strftime("%Y-%m-%d"),
            "span_days": span,
            "n_active_days": n,
            "persistence": np.round(
                n.to_numpy(dtype="float64")
                / span.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(days, ["entity_id"], per_entity,
                                n_buckets=8)


ENTITY_PERSISTENCE_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
t AS ({transcripts}),
me AS (
  SELECT DISTINCT l.entity_id, CAST(t.ts AS DATE) AS day
  FROM m mm
  JOIN lab l ON mm.norm = l.norm
  JOIN t ON t.conv_id = mm.conv_id AND t.turn_idx = mm.turn_idx
),
s AS (
  SELECT entity_id, MIN(day) AS mn, MAX(day) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM me GROUP BY entity_id
)
SELECT entity_id,
       strftime(mn, '%Y-%m-%d') AS first_day,
       strftime(mx, '%Y-%m-%d') AS last_day,
       CAST(date_diff('day', mn, mx) + 1 AS BIGINT) AS span_days,
       n AS n_active_days,
       ROUND(CAST(n AS DOUBLE)
             / CAST(date_diff('day', mn, mx) + 1 AS DOUBLE), 6)
         AS persistence
FROM s
"""
)


def role_transitions(
    transcripts: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Conversation-structure transition matrix: counts and row shares of
    consecutive ROLE pairs (user->assistant, assistant->tool, ...) over
    the in-conversation turn order — the dialogue-protocol fingerprint
    (a spike in assistant->assistant means multi-part replies;
    tool->user means a human interrupted a chain). One conv-keyed bucket
    co-locates each conversation; the in-group shift is vectorized; the
    role-pair rollup is |roles|^2-bounded. Share one division, rounded 6.
    Output: from_role, to_role, n_pairs, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        nxt = d.groupby(d["conv_id"], sort=False)["role"].shift(-1)
        k = nxt.notna()
        g = pd.DataFrame({
            "from_role": d["role"][k],
            "to_role": nxt[k],
        }).groupby(["from_role", "to_role"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "role"]),
        ["conv_id"],
        pairs_in_bucket,
        n_buckets=n_buckets,
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["from_role", "to_role"], sort=False)["n"].sum()\
            .reset_index()
        tot = g.groupby("from_role", sort=False)["n"].transform("sum")
        return pd.DataFrame({
            "from_role": g["from_role"],
            "to_role": g["to_role"],
            "n_pairs": g["n"].astype("int64"),
            "share": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["from_role"], merge, n_buckets=4)


ROLE_TRANSITIONS_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
s AS (
  SELECT role AS from_role,
         LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS to_role
  FROM t
),
c AS (
  SELECT from_role, to_role, COUNT(*) AS n
  FROM s WHERE to_role IS NOT NULL GROUP BY from_role, to_role
)
SELECT from_role, to_role, CAST(n AS BIGINT) AS n_pairs,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY from_role), 6)
         AS share
FROM c
"""


def mention_position_profile(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    n_deciles: int = 10,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """WHERE in a conversation entities get mentioned: the mention count
    and share per normalized-position decile (0 = opening turns, 9 =
    closing turns; decile = turn_idx * 10 // n_turns, pure integer
    arithmetic) — the discourse-structure profile (entities front-loaded
    in openings are topics; closing-heavy ones are resolutions/outcomes).
    Conversation lengths attach through one conv-keyed co-partitioned
    reduce+join; the decile rollup is 10-bounded. Share one division,
    rounded 6. Output: decile, n_mentions, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    me = mentions_with_entity.select_columns(["conv_id", "turn_idx"])

    def len_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("conv_id", sort=False)["turn_idx"].max()
        return pd.DataFrame({
            "conv_id": g.index,
            "mx": g.to_numpy().astype("int64"),
        })

    conv_len = bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx"]).map_batches(
            len_partial, batch_format="pandas", batch_size=65536
        ),
        ["conv_id"],
        lambda b: b.groupby("conv_id", sort=False)["mx"].max().reset_index()
        .rename(columns={"mx": "n_turns_m1"}),
        n_buckets=n_buckets,
    )
    j = hash_join(me, conv_len, on="conv_id", n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ti = batch["turn_idx"].astype("int64").to_numpy()
        nt = batch["n_turns_m1"].astype("int64").to_numpy() + 1
        dec = (ti * n_deciles) // nt
        s = pd.Series(dec).groupby(dec, sort=False).size()
        return pd.DataFrame({
            "decile": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    parts = j.map_batches(partial, batch_format="pandas", batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("decile", sort=False)["n"].sum().reset_index()
        tot = float(g["n"].sum())
        return pd.DataFrame({
            "decile": g["decile"].astype("int64"),
            "n_mentions": g["n"].astype("int64"),
            "share": np.round(g["n"].to_numpy(dtype="float64") / tot, 6),
        })

    keyed = parts.map_batches(
        lambda b: b.assign(kk=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["kk"], lambda b: merge(b.drop(columns=["kk"])), n_buckets=1
    )


MENTION_POSITIONS_SQL_TEMPLATE = """
WITH m AS ({mentions}),
t AS ({transcripts}),
ln AS (SELECT conv_id, MAX(turn_idx) + 1 AS nt FROM t GROUP BY conv_id),
d AS (
  SELECT (m.turn_idx * {n_deciles}) // ln.nt AS decile
  FROM m JOIN ln ON ln.conv_id = m.conv_id
),
c AS (SELECT decile, COUNT(*) AS n FROM d GROUP BY decile)
SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n_mentions,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM c
"""


def degree_histogram(
    cooccurrence: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """Log2-binned DEGREE DISTRIBUTION of the entity co-occurrence graph —
    the one-screen scale-free check (a straight line in log-log says hubs
    dominate; the tail bin count sizes every hub guard in the path/triangle
    operators). Degrees are the exact per-node edge-endpoint reduce
    (``_oriented_triangles``'s combiner shape); bin = bit_length(deg) - 1,
    pure integers. Output: bin, min_degree, n_entities."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    edges = cooccurrence.select_columns(["src", "dst"])

    def partial_deg(batch: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([batch["src"], batch["dst"]], ignore_index=True)
        s = both.groupby(both, sort=False).size()
        return pd.DataFrame({
            "node": s.index,
            "d": s.to_numpy().astype("int64"),
        })

    deg = bucketed_group_apply(
        edges.map_batches(partial_deg, batch_format="pandas",
                          batch_size=65536),
        ["node"],
        lambda b: b.groupby("node", sort=False)["d"].sum().reset_index(),
        n_buckets=32,
    )

    def bin_partial(batch: pd.DataFrame) -> pd.DataFrame:
        bins = np.array(
            [int(x).bit_length() - 1 for x in batch["d"]], dtype="int64"
        )
        s = pd.Series(bins).groupby(bins, sort=False).size()
        return pd.DataFrame({
            "bin": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    parts = deg.map_batches(bin_partial, batch_format="pandas",
                            batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum().reset_index()
        b = g["bin"].astype("int64")
        return pd.DataFrame({
            "bin": b,
            "min_degree": (np.int64(1) << b.to_numpy()).astype("int64"),
            "n_entities": g["n"].astype("int64"),
        })

    return bucketed_group_apply(parts, ["bin"], merge, n_buckets=4)


DEGREE_HIST_SQL_TEMPLATE = """
WITH cooc AS ({cooccurrence}),
d AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT src AS node FROM cooc UNION ALL SELECT dst AS node FROM cooc
  ) GROUP BY node
),
b AS (SELECT CAST(floor(log2(deg)) AS BIGINT) AS bin FROM d)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_degree,
       CAST(COUNT(*) AS BIGINT) AS n_entities
FROM b GROUP BY bin
"""


def clustering_by_degree(
    cooccurrence: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """C(k) — mean clustering BY DEGREE BIN: per log2-degree bucket, the
    ratio-of-sums clustering coefficient sum(triangles)/sum(wedges) — the
    curve whose downward slope diagnoses hierarchical structure (Ravasz &
    Barabási 2003 — public) and tells the hub guards how fast closure decays
    with degree; the aggregate view of ``triangle_stats``'s per-entity rows.
    Triangles come from the shared degree-oriented enumerator
    (``_oriented_triangles``, O(m^1.5) wedge work); wedges are the exact
    integers d(d-1)/2. Ratio of sums — exact ints, ONE division rounded 6 —
    not mean of per-node ratios (which a float sum order could scramble).
    Output: bin, min_degree, n_entities, n_triangles, n_wedges, cc."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    edges = cooccurrence.select_columns(["src", "dst"]).materialize()
    triangles, deg = _oriented_triangles(edges, n_buckets)

    def tri_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat(
            [batch["apex"], batch["src"], batch["dst"]], ignore_index=True
        )
        s = both.groupby(both, sort=False).size()
        return pd.DataFrame({"node": s.index, "t_part": s.to_numpy()})

    def sum_tri(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("node", sort=False)["t_part"].sum()
        return pd.DataFrame(
            {"node": s.index, "n_tri": s.astype("int64").to_numpy()}
        )

    tri_counts = bucketed_group_apply(
        triangles.map_batches(tri_nodes, batch_format="pandas",
                              batch_size=65536),
        ["node"],
        sum_tri,
        n_buckets=n_buckets,
    )

    joined = hash_join(deg, tri_counts, on="node", how="left",
                       n_buckets=n_buckets)

    def bin_partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["degree"].to_numpy(dtype="int64")
        t = batch["n_tri"].fillna(0).to_numpy(dtype="int64")
        bins = np.array([int(x).bit_length() - 1 for x in d], dtype="int64")
        g = pd.DataFrame({
            "bin": bins,
            "n_entities": np.int64(1),
            "n_triangles": t,
            "n_wedges": d * (d - 1) // 2,
        }).groupby("bin", sort=False).sum().reset_index()
        return g

    parts = joined.map_batches(bin_partial, batch_format="pandas",
                               batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False).sum().reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        b = g["bin"].to_numpy()
        w = g["n_wedges"].to_numpy(dtype="float64")
        t = g["n_triangles"].to_numpy(dtype="float64")
        g["min_degree"] = (np.int64(1) << b).astype("int64")
        g["cc"] = np.round(np.where(w > 0, t / np.where(w > 0, w, 1.0), 0.0), 6)
        return g[["bin", "min_degree", "n_entities", "n_triangles",
                  "n_wedges", "cc"]]

    return bucketed_group_apply(parts, ["bin"], merge, n_buckets=4)


CLUSTERING_BY_DEGREE_SQL_TEMPLATE = """
WITH e AS MATERIALIZED ({cooccurrence}),
d AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
  GROUP BY node
),
t AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1
  JOIN e e2 ON e2.src = e1.dst
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
tc AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM (SELECT a AS node FROM t UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t)
  GROUP BY node
),
pern AS (
  SELECT CAST(floor(log2(d.degree)) AS BIGINT) AS bin, d.degree,
         COALESCE(tc.n_tri, 0) AS n_tri
  FROM d LEFT JOIN tc ON tc.node = d.node
)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_degree,
       CAST(COUNT(*) AS BIGINT) AS n_entities,
       CAST(SUM(n_tri) AS BIGINT) AS n_triangles,
       CAST(SUM(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges,
       ROUND(CASE WHEN SUM(degree * (degree - 1) // 2) > 0
                  THEN CAST(SUM(n_tri) AS DOUBLE)
                       / CAST(SUM(degree * (degree - 1) // 2) AS DOUBLE)
                  ELSE 0.0 END, 6) AS cc
FROM pern GROUP BY bin
"""


def component_size_hist(
    cooccurrence: ray.data.Dataset, config=None, n_buckets: int = 64
) -> ray.data.Dataset:
    """GIANT-COMPONENT read-out: log2-binned histogram of connected-component
    sizes — n_components and member count per size bin, the one-screen answer
    to "is this graph one blob or dust?" that sizes every component-local
    algorithm downstream (a driver union-find is safe iff the tail bin is
    small). Reuses ``entity_components`` (dual-path CC), then reduces its
    (component_id, component_size) pairs — deduped per bucket, sizes already
    exact — into <= ~60 bins. Output: bin, min_size, n_components,
    n_entities."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    comp = entity_components(cooccurrence, config=config,
                             n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["component_id", "component_size"]].drop_duplicates()

    parts = comp.map_batches(partial, batch_format="pandas",
                             batch_size=65536)

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()  # one row per component in this bucket
        s = d["component_size"].to_numpy(dtype="int64")
        bins = np.array([int(x).bit_length() - 1 for x in s], dtype="int64")
        g = pd.DataFrame({
            "bin": bins,
            "n_components": np.int64(1),
            "n_entities": s,
        }).groupby("bin", sort=False).sum().reset_index()
        return g

    binned = bucketed_group_apply(parts, ["component_id"], per_bucket,
                                  n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False).sum().reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        g["min_size"] = (np.int64(1) << g["bin"].to_numpy()).astype("int64")
        return g[["bin", "min_size", "n_components", "n_entities"]]

    return bucketed_group_apply(binned, ["bin"], merge, n_buckets=4)


COMPONENT_SIZE_HIST_SQL_TEMPLATE = """
WITH RECURSIVE e AS MATERIALIZED ({cooccurrence}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
ed AS (SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst, src FROM e),
r(node, reach) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.node, ed.v FROM r JOIN ed ON ed.u = r.reach
),
comp AS (SELECT node, MIN(reach) AS component_id FROM r GROUP BY node),
sz AS (SELECT component_id, COUNT(*) AS s FROM comp GROUP BY component_id),
b AS (SELECT CAST(floor(log2(s)) AS BIGINT) AS bin, s FROM sz)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_size,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(s) AS BIGINT) AS n_entities
FROM b GROUP BY bin
"""


def cooc_weight_hist(
    cooccurrence: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Log2-binned EDGE-WEIGHT distribution of the co-occurrence graph
    (weight = n_convs sharing the pair) — the tie-strength spectrum that
    picks the weight cutoff for every thresholded downstream view (a PMI or
    transition edge below weight 2 is usually noise). Pure-integer combiner
    rollup, share one division rounded 6. Output: bin, min_weight, n_edges,
    share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["n_convs"].to_numpy(dtype="int64")
        bins = np.array([int(x).bit_length() - 1 for x in w], dtype="int64")
        s = pd.Series(bins).groupby(bins, sort=False).size()
        return pd.DataFrame({
            "bin": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    parts = cooccurrence.select_columns(["n_convs"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum().reset_index()
        tot = float(g["n"].sum())
        b = g["bin"].astype("int64")
        return pd.DataFrame({
            "bin": b,
            "min_weight": (np.int64(1) << b.to_numpy()).astype("int64"),
            "n_edges": g["n"].astype("int64"),
            "share": np.round(g["n"].to_numpy(dtype="float64") / tot, 6),
        })

    # single merge bucket: the share denominator is global and the bin
    # space is tiny; partials are already bin-level combiners
    return bucketed_group_apply(parts, ["bin"], merge, n_buckets=1)


COOC_WEIGHT_HIST_SQL_TEMPLATE = """
WITH cooc AS ({cooccurrence}),
b AS (SELECT CAST(floor(log2(n_convs)) AS BIGINT) AS bin FROM cooc)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_weight,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (), 6) AS share
FROM b GROUP BY bin
"""


def size_diversity_corr(
    transcripts: ray.data.Dataset,
    mentions_with_entity: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Pearson correlation between conversation LENGTH (turns) and entity
    DIVERSITY (distinct entities mentioned) — the scaling law of the KG
    itself: sub-linear diversity growth (corr high, slope of the cloud
    falling) says long conversations revisit entities rather than adding
    them, which calibrates how entity counts extrapolate to the full
    corpus. The ``corr_value_hour`` exactness mold: both per-conv counts
    are exact ints (turn counts via combiner, distinct entities via
    two-level (conv, entity) dedup), convs with no mentions join in as
    diversity 0 (``hash_join`` how='left'), the six sufficient statistics
    merge as Python ints, and the corr is ONE shared double expression
    rounded 6. Output: n_convs, corr_turns_entities."""
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def tc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["conv_id"].groupby(batch["conv_id"], sort=False).size()
        return pd.DataFrame({
            "conv_id": s.index,
            "nt": s.to_numpy().astype("int64"),
        })

    turns = bucketed_group_apply(
        transcripts.select_columns(["conv_id"]).map_batches(
            tc_partial, batch_format="pandas", batch_size=65536
        ),
        ["conv_id"],
        lambda b: b.groupby("conv_id", sort=False)["nt"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    )

    def ec_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["conv_id", "entity_id"]].drop_duplicates()

    def ec_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.drop_duplicates().groupby("conv_id", sort=False).size()
        return pd.DataFrame({
            "conv_id": g.index,
            "ne": g.to_numpy().astype("int64"),
        })

    ents = bucketed_group_apply(
        mentions_with_entity.select_columns(
            ["conv_id", "entity_id"]
        ).map_batches(ec_partial, batch_format="pandas", batch_size=65536),
        ["conv_id"],
        ec_merge,
        n_buckets=n_buckets,
    )

    joined = hash_join(turns, ents, on="conv_id", how="left",
                       n_buckets=n_buckets)

    def suff(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["nt"].to_numpy(dtype="int64")
        y = batch["ne"].fillna(0).to_numpy(dtype="int64")
        return pd.DataFrame({
            "k": ["all"],
            "n": [np.int64(len(batch))],
            "sx": [x.sum()], "sy": [y.sum()], "sxy": [(x * y).sum()],
            "sx2": [(x * x).sum()], "sy2": [(y * y).sum()],
        })

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        n = sum(int(v) for v in bucket["n"])
        sx = sum(int(v) for v in bucket["sx"])
        sy = sum(int(v) for v in bucket["sy"])
        sxy = sum(int(v) for v in bucket["sxy"])
        sx2 = sum(int(v) for v in bucket["sx2"])
        sy2 = sum(int(v) for v in bucket["sy2"])
        dx, dy = n * sx2 - sx * sx, n * sy2 - sy * sy
        if n == 0 or dx <= 0 or dy <= 0:
            return pd.DataFrame({
                "n_convs": pd.array([], dtype="int64"),
                "corr_turns_entities": pd.array([], dtype="float64"),
            })
        corr = float(n * sxy - sx * sy) / math.sqrt(float(dx) * float(dy))
        return pd.DataFrame({
            "n_convs": pd.Series([n], dtype="int64"),
            "corr_turns_entities": [float(np.round(corr, 6))],
        })

    return bucketed_group_apply(
        joined.map_batches(suff, batch_format="pandas", batch_size=65536),
        ["k"],
        final,
        n_buckets=1,
    )


SIZE_DIVERSITY_CORR_SQL_TEMPLATE = (
    r"""
WITH tr AS ({transcripts}),
m AS ({mentions}),
"""
    + _LABELS
    + r""",
tc AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS nt
       FROM tr GROUP BY conv_id),
ec AS (SELECT mm.conv_id,
              CAST(COUNT(DISTINCT l.entity_id) AS BIGINT) AS ne
       FROM m mm JOIN lab l ON mm.norm = l.norm
       GROUP BY mm.conv_id),
j AS (SELECT tc.nt, COALESCE(ec.ne, 0) AS ne
      FROM tc LEFT JOIN ec USING (conv_id)),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(nt) AS sx, SUM(ne) AS sy, SUM(nt * ne) AS sxy,
         SUM(nt * nt) AS sx2, SUM(ne * ne) AS sy2
  FROM j
)
SELECT n AS n_convs,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6)
         AS corr_turns_entities
FROM s WHERE n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
"""
)


def edge_growth(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """KG EDGE-GROWTH curve: per month, how many co-occurrence edges appear
    for the FIRST time, plus the cumulative edge count — the
    graph-construction burn-down (a flattening curve says the entity graph
    is saturating; a linear one says every month still discovers structure),
    the edge-side Heaps analogue of ``vocab_growth``. A conversation's
    month is the month of its FIRST turn; an edge's birth month is the MIN
    month over the conversations containing it ('YYYY-MM' strings order
    lexicographically == chronologically, so MIN is an order-free string
    reduce). Shape: conv→month via a per-conv min-ts combiner, attached to
    distinct (conv, entity) rows through the co-partitioned ``hash_join``;
    pairs generate vectorized (triu) inside conv buckets exactly like the
    co-occurrence builder; per-pair min-month reduces pair-bucketed; the
    month rollup + cumulative sum run in one tiny final bucket (months are
    calendar-bounded). Output: month, n_new_edges, edges_cum."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def conv_month_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.to_datetime(batch["ts"]).groupby(
            batch["conv_id"], sort=False
        ).min()
        return pd.DataFrame({"conv_id": g.index, "mts": g.to_numpy()})

    conv_month = bucketed_group_apply(
        transcripts.select_columns(["conv_id", "ts"]).map_batches(
            conv_month_partial, batch_format="pandas", batch_size=65536
        ),
        ["conv_id"],
        lambda b: b.groupby("conv_id", sort=False)["mts"].min()
        .dt.strftime("%Y-%m").reset_index().rename(
            columns={"mts": "month"}
        ),
        n_buckets=n_buckets,
    )

    me = bucketed_group_apply(
        mentions_with_entity.select_columns(
            ["conv_id", "entity_id"]
        ).map_batches(
            lambda b: b.drop_duplicates(), batch_format="pandas",
            batch_size=65536,
        ),
        ["conv_id"],
        lambda b: b.drop_duplicates(),
        n_buckets=n_buckets,
    )

    withm = hash_join(me, conv_month, on="conv_id", n_buckets=n_buckets)

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # vectorized pair generation (the co-occurrence builder idiom):
        # one self-merge per bucket, a < b orients each pair once; month
        # rides the left side (it is conv-functional, identical on both)
        d = bucket.drop_duplicates(["conv_id", "entity_id"])
        m = d.merge(
            d[["conv_id", "entity_id"]], on="conv_id",
            suffixes=("", "_b"),
        )
        m = m[m["entity_id"] < m["entity_id_b"]]
        return pd.DataFrame({
            "src": m["entity_id"].to_numpy(),
            "dst": m["entity_id_b"].to_numpy(),
            "month": m["month"].to_numpy(),
        })

    pairs = bucketed_group_apply(withm, ["conv_id"], pairs_in_bucket,
                                 n_buckets=n_buckets)

    def first_month(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["src", "dst"], sort=False)["month"].min()
        s = g.groupby(g, sort=False).size()
        return pd.DataFrame({
            "month": s.index,
            "n": s.to_numpy().astype("int64"),
        })

    per_month = bucketed_group_apply(pairs, ["src", "dst"], first_month,
                                     n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("month", sort=False)["n"].sum().reset_index()
        g = g.sort_values("month").reset_index(drop=True)
        return pd.DataFrame({
            "month": g["month"],
            "n_new_edges": g["n"].astype("int64"),
            "edges_cum": g["n"].cumsum().astype("int64"),
        })

    return bucketed_group_apply(per_month, ["month"], merge, n_buckets=1)


EDGE_GROWTH_SQL_TEMPLATE = (
    r"""
WITH tr AS ({transcripts}),
m AS ({mentions}),
"""
    + _LABELS
    + r""",
cm AS (SELECT conv_id, strftime(MIN(ts), '%Y-%m') AS month
       FROM tr GROUP BY conv_id),
me AS (SELECT DISTINCT mm.conv_id, l.entity_id
       FROM m mm JOIN lab l ON mm.norm = l.norm),
p AS (
  SELECT a.entity_id AS src, b.entity_id AS dst, MIN(cm.month) AS month
  FROM me a JOIN me b
    ON a.conv_id = b.conv_id AND a.entity_id < b.entity_id
  JOIN cm ON cm.conv_id = a.conv_id
  GROUP BY a.entity_id, b.entity_id
),
c AS (SELECT month, COUNT(*) AS n FROM p GROUP BY month)
SELECT month, CAST(n AS BIGINT) AS n_new_edges,
       CAST(SUM(n) OVER (ORDER BY month) AS BIGINT) AS edges_cum
FROM c
"""
)


def hot_stability(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    k: int = 50,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TOP-K STABILITY of the hot-entity set across corpus halves: split
    every mention at the EXACT median mention timestamp (the bounded-memory
    ``exact_global_quantiles`` primitive — QUANTILE_CONT-identical, never a
    driver collect of the column), rank entities per half by mention count
    (count desc, entity asc — fully deterministic), and report how much of
    the top-k survives from the first half to the second — the drift scalar
    that says whether yesterday's hot-entity cache/index is still right
    today. Mentions pick up timestamps through the co-partitioned
    (conv, turn) ``hash_join``; per-half counts reduce entity-bucketed;
    each bucket emits at most k rows per half, so the driver merge sees
    <= 2·k·n_buckets tiny rows. Output: k, n_top_h1, n_top_h2, n_overlap,
    stability (= overlap / min(n1, n2), rounded 6)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    mt = hash_join(
        mentions_with_entity.select_columns(
            ["conv_id", "turn_idx", "entity_id"]
        ),
        transcripts.select_columns(["conv_id", "turn_idx", "ts"]),
        on=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
    ).map_batches(
        lambda b: pd.DataFrame({
            "entity_id": b["entity_id"],
            "ts_us": pd.to_datetime(b["ts"]).astype("datetime64[us]")
            .astype("int64"),
        }),
        batch_format="pandas", batch_size=65536,
    ).materialize()  # consumed twice: quantile scan + count pass

    _, qv = exact_global_quantiles(mt, "ts_us", [0.5])
    med = qv[0.5]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = (batch["ts_us"].to_numpy(dtype="int64") <= med)
        d = pd.DataFrame({
            "entity_id": batch["entity_id"],
            "half": np.where(h, np.int64(1), np.int64(2)),
            "n": np.int64(1),
        })
        return d.groupby(["half", "entity_id"], sort=False).sum()\
            .reset_index()

    def head_k(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["half", "entity_id"], sort=False)["n"].sum()\
            .reset_index()
        return (
            g.sort_values(["half", "n", "entity_id"],
                          ascending=[True, False, True])
            .groupby("half", sort=False).head(k)
        )

    cand = bucketed_group_apply(
        mt.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["entity_id"],
        head_k,
        n_buckets=n_buckets,
    ).to_pandas()  # <= 2 * k * n_buckets rows (bounded by construction)

    tops = {}
    for half in (1, 2):
        g = cand[cand["half"] == half]
        g = g.sort_values(["n", "entity_id"], ascending=[False, True])\
            .head(k)
        tops[half] = set(g["entity_id"])
    n1, n2 = len(tops[1]), len(tops[2])
    n_ov = len(tops[1] & tops[2])
    stab = float(np.round(n_ov / min(n1, n2), 6)) if min(n1, n2) else 0.0
    return ray.data.from_pandas(pd.DataFrame({
        "k": pd.Series([k], dtype="int64"),
        "n_top_h1": pd.Series([n1], dtype="int64"),
        "n_top_h2": pd.Series([n2], dtype="int64"),
        "n_overlap": pd.Series([n_ov], dtype="int64"),
        "stability": pd.Series([stab], dtype="float64"),
    }))


HOT_STABILITY_SQL_TEMPLATE = (
    r"""
WITH tr AS ({transcripts}),
m AS ({mentions}),
"""
    + _LABELS
    + r""",
mt AS (
  SELECT l.entity_id, epoch_us(tr.ts) AS ts_us
  FROM m mm JOIN lab l ON mm.norm = l.norm
  JOIN tr ON tr.conv_id = mm.conv_id AND tr.turn_idx = mm.turn_idx
),
med AS (SELECT quantile_cont(ts_us, 0.5) AS md FROM mt),
h1 AS (SELECT entity_id, COUNT(*) AS c FROM mt, med
       WHERE ts_us <= md GROUP BY entity_id),
h2 AS (SELECT entity_id, COUNT(*) AS c FROM mt, med
       WHERE ts_us > md GROUP BY entity_id),
t1 AS (SELECT entity_id FROM h1 ORDER BY c DESC, entity_id LIMIT {k}),
t2 AS (SELECT entity_id FROM h2 ORDER BY c DESC, entity_id LIMIT {k})
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS n_top_h1,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS n_top_h2,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM t1 JOIN t2 USING (entity_id)) AS n_overlap,
       ROUND(CAST((SELECT COUNT(*) FROM t1 JOIN t2 USING (entity_id))
                  AS DOUBLE)
             / LEAST((SELECT COUNT(*) FROM t1),
                     (SELECT COUNT(*) FROM t2)), 6) AS stability
"""
)


def mentions_per_turn_hist(
    mentions: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """MENTION DENSITY at turn grain: of the turns that mention anything,
    how many carry exactly 1, 2, 3 ... mentions — the per-turn extraction
    load profile (the extractor's batch cost is linear in this; a fat tail
    means list-style turns that deserve their own parsing path). Counts per
    (conv, turn) reduce conv-bucketed; the count-of-counts fold is exact
    ints in one tiny merge (the per-turn mention count is parse-bounded).
    Output: n_mentions, n_turns, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["conv_id", "turn_idx"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = mentions.select_columns(["conv_id", "turn_idx"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_turn(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["conv_id", "turn_idx"], sort=False)["n"].sum()
        s = g.groupby(g, sort=False).size()
        return pd.DataFrame({
            "n_mentions": s.index.astype("int64"),
            "n_turns": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["conv_id"], per_turn,
                               n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("n_mentions", sort=False)["n_turns"].sum()\
            .reset_index()
        tot = float(g["n_turns"].sum())
        return pd.DataFrame({
            "n_mentions": g["n_mentions"].astype("int64"),
            "n_turns": g["n_turns"].astype("int64"),
            "share": np.round(
                g["n_turns"].to_numpy(dtype="float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["n_mentions"], merge, n_buckets=1)


MENTIONS_PER_TURN_SQL_TEMPLATE = """
WITH m AS ({mentions}),
c AS (SELECT conv_id, turn_idx, COUNT(*) AS n FROM m
      GROUP BY conv_id, turn_idx),
h AS (SELECT n, COUNT(*) AS n_turns FROM c GROUP BY n)
SELECT CAST(n AS BIGINT) AS n_mentions,
       CAST(n_turns AS BIGINT) AS n_turns,
       ROUND(CAST(n_turns AS DOUBLE)
             / SUM(CAST(n_turns AS DOUBLE)) OVER (), 6) AS share
FROM h
"""


def edge_type_overlap(
    cooccurrence: ray.data.Dataset,
    transitions: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Structural AGREEMENT of the two KG edge families: co-occurrence
    (same conversation, unordered) vs transition (consecutive mention,
    directed) — folded to undirected pairs and intersected, the
    ``dedup_method_agreement`` question asked of the graph builders
    themselves (a transition implies co-occurrence whenever both mentions
    share the conversation, so cooc ⊇ transitions is the health invariant
    and the Jaccard reads as "what share of co-occurrences are actually
    adjacent"). Transition pairs normalize (min, max) and dedup inside
    pair buckets; the intersection is the co-partitioned ``hash_join``;
    counts are distributed aggregates, Jaccard one division rounded 6.
    Output: n_cooc, n_transition_pairs, n_both, jaccard."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    cc = cooccurrence.select_columns(["src", "dst"])

    def norm_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["from_entity"] != batch["to_entity"]]
        lo = np.minimum(b["from_entity"], b["to_entity"])
        hi = np.maximum(b["from_entity"], b["to_entity"])
        return pd.DataFrame({"src": lo, "dst": hi}).drop_duplicates()

    tp = bucketed_group_apply(
        transitions.select_columns(["from_entity", "to_entity"])
        .map_batches(norm_pairs, batch_format="pandas", batch_size=65536),
        ["src", "dst"],
        lambda b: b.drop_duplicates(),
        n_buckets=n_buckets,
    ).materialize()

    n_cc = cc.count()
    n_tp = tp.count()
    n_both = hash_join(cc, tp, on=["src", "dst"],
                       n_buckets=n_buckets).count()
    union = n_cc + n_tp - n_both
    jac = float(np.round(n_both / union, 6)) if union else 0.0
    return ray.data.from_pandas(pd.DataFrame({
        "n_cooc": pd.Series([n_cc], dtype="int64"),
        "n_transition_pairs": pd.Series([n_tp], dtype="int64"),
        "n_both": pd.Series([n_both], dtype="int64"),
        "jaccard": pd.Series([jac], dtype="float64"),
    }))


EDGE_TYPE_OVERLAP_SQL_TEMPLATE = """
WITH cooc AS ({cooccurrence}),
trn AS ({transitions}),
tp AS (
  SELECT DISTINCT LEAST(from_entity, to_entity) AS src,
         GREATEST(from_entity, to_entity) AS dst
  FROM trn WHERE from_entity != to_entity
),
bc AS (SELECT COUNT(*) AS n FROM cooc JOIN tp USING (src, dst)),
cc AS (SELECT COUNT(*) AS n FROM cooc),
tc AS (SELECT COUNT(*) AS n FROM tp)
SELECT CAST(cc.n AS BIGINT) AS n_cooc,
       CAST(tc.n AS BIGINT) AS n_transition_pairs,
       CAST(bc.n AS BIGINT) AS n_both,
       CASE WHEN cc.n + tc.n - bc.n > 0
            THEN ROUND(CAST(bc.n AS DOUBLE) / (cc.n + tc.n - bc.n), 6)
            ELSE 0.0 END AS jaccard
FROM cc, tc, bc
"""


def role_mix_monthly(
    transcripts: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Monthly ROLE composition of the transcript stream: per month, the
    turn count and within-month share of user / assistant / tool turns —
    the conversation-shape drift trend (a rising tool share is agentic
    traffic arriving; the reference's per-activity state mix,
    src/TCXReader.jl, put on the calendar axis). Bounded (month × role)
    rollup; counts exact; share one division rounded 6. Output: month,
    role, n_turns, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "month": pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m"),
            "role": batch["role"],
            "n": np.int64(1),
        })
        return d.groupby(["month", "role"], sort=False).sum().reset_index()

    parts = transcripts.select_columns(["ts", "role"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["month", "role"], sort=False)["n"].sum()\
            .reset_index()
        tot = g.groupby("month", sort=False)["n"].transform("sum")
        return pd.DataFrame({
            "month": g["month"],
            "role": g["role"],
            "n_turns": g["n"].astype("int64"),
            "share": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["month"], merge,
                                n_buckets=n_buckets)


ROLE_MIX_MONTHLY_SQL_TEMPLATE = """
WITH tr AS ({transcripts}),
c AS (
  SELECT strftime(ts, '%Y-%m') AS month, role, COUNT(*) AS n
  FROM tr GROUP BY 1, 2
)
SELECT month, role, CAST(n AS BIGINT) AS n_turns,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY month), 6)
         AS share
FROM c
"""


def entity_growth(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """KG NODE-GROWTH curve: per month, how many entities are mentioned for
    the FIRST time, plus the cumulative entity count — ``edge_growth``'s
    node-side companion (nodes saturating while edges still grow means the
    graph is densifying, not expanding — the Leskovec densification
    signature, KDD'05 — public). An entity's birth month is the MIN month
    over its mentions' turn timestamps; mention rows pick up timestamps
    through the co-partitioned (conv, turn) ``hash_join``, the per-entity
    min reduces entity-bucketed ('YYYY-MM' min == chronological min), and
    the month rollup + cumulative sum run in one tiny final bucket.
    Output: month, n_new_entities, entities_cum."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    mt = hash_join(
        mentions_with_entity.select_columns(
            ["conv_id", "turn_idx", "entity_id"]
        ),
        transcripts.select_columns(["conv_id", "turn_idx", "ts"]),
        on=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m")
        g = m.groupby(batch["entity_id"], sort=False).min()
        return pd.DataFrame({"entity_id": g.index, "month": g.to_numpy()})

    def first_month(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("entity_id", sort=False)["month"].min()
        s = g.groupby(g, sort=False).size()
        return pd.DataFrame({
            "month": s.index,
            "n": s.to_numpy().astype("int64"),
        })

    per_month = bucketed_group_apply(
        mt.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["entity_id"],
        first_month,
        n_buckets=n_buckets,
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("month", sort=False)["n"].sum().reset_index()
        g = g.sort_values("month").reset_index(drop=True)
        return pd.DataFrame({
            "month": g["month"],
            "n_new_entities": g["n"].astype("int64"),
            "entities_cum": g["n"].cumsum().astype("int64"),
        })

    return bucketed_group_apply(per_month, ["month"], merge, n_buckets=1)


ENTITY_GROWTH_SQL_TEMPLATE = (
    r"""
WITH tr AS ({transcripts}),
m AS ({mentions}),
"""
    + _LABELS
    + r""",
mt AS (
  SELECT l.entity_id, strftime(tr.ts, '%Y-%m') AS month
  FROM m mm JOIN lab l ON mm.norm = l.norm
  JOIN tr ON tr.conv_id = mm.conv_id AND tr.turn_idx = mm.turn_idx
),
fm AS (SELECT entity_id, MIN(month) AS month FROM mt GROUP BY entity_id),
c AS (SELECT month, COUNT(*) AS n FROM fm GROUP BY month)
SELECT month, CAST(n AS BIGINT) AS n_new_entities,
       CAST(SUM(n) OVER (ORDER BY month) AS BIGINT) AS entities_cum
FROM c
"""
)


def turn_len_by_position(
    transcripts: ray.data.Dataset, cap: int = 20, n_buckets: int = 4
) -> ray.data.Dataset:
    """Turn LENGTH as a function of POSITION in the conversation — the
    fatigue curve (do turns shrink as conversations run long?), the
    positional companion to ``role_stats``' by-role composition. Positions
    cap at ``cap`` (the tail pools into one bucket) so the output is
    position-bounded at any corpus size; token counts use the house
    ``str.count('[^ ]+')`` whitespace rule and the mean is the half-up
    integer division (never a float sum). Output: turn_pos, n_turns,
    n_tokens, avg_tokens (all int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ntok = batch["text"].str.count(r"[^ ]+").fillna(0).astype("int64")
        pos = batch["turn_idx"].astype("int64").clip(upper=cap)
        g = ntok.groupby(pos, sort=False).agg(["size", "sum"]).reset_index()
        g.columns = ["turn_pos", "n_turns", "n_tokens"]
        return g

    parts = transcripts.select_columns(
        ["turn_idx", "text"]
    ).map_batches(partial, batch_format="pandas", batch_size=8192)

    def finish(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("turn_pos", sort=False).sum().reset_index()
        nt = g["n_turns"].astype("int64")
        tk = g["n_tokens"].astype("int64")
        return pd.DataFrame({
            "turn_pos": g["turn_pos"].astype("int64"),
            "n_turns": nt,
            "n_tokens": tk,
            "avg_tokens": (2 * tk + nt) // (2 * nt),
        })

    return bucketed_group_apply(parts, ["turn_pos"], finish,
                                n_buckets=n_buckets)


TURN_LEN_BY_POSITION_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
m AS (
  SELECT LEAST(turn_idx, {cap}) AS turn_pos,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ntok
  FROM t
)
SELECT CAST(turn_pos AS BIGINT) AS turn_pos,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST((2 * SUM(ntok) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
         AS avg_tokens
FROM m GROUP BY turn_pos
"""


def neighbor_degree_curve(
    transitions: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Average neighbour in-degree as a function of source out-degree —
    the knn(k) mixing CURVE behind ``degree_assortativity``'s single
    coefficient (a falling curve = hubs point at leaves, disassortative).
    Degrees are exact distinct-neighbour counts reduced inside one
    bucketed apply per side (each key's rows co-locate once); both degree
    tables re-attach to the edge stream through co-partitioned
    ``hash_join``s (degree tables are vocabulary-scale — never
    broadcast); every joined batch folds to degree-class partials so the
    final exchange is bounded by the number of distinct out-degree values.
    Mean is one double division of exact ints, rounded 6.
    Output: out_deg, n_edges, avg_nbr_in_deg."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    tr = transitions.select_columns(
        ["from_entity", "to_entity"]
    ).materialize()  # consumed by two degree reductions + the join chain

    def od_reduce(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("from_entity", sort=False)["to_entity"]\
            .nunique()
        return pd.DataFrame({
            "from_entity": g.index,
            "od": g.to_numpy().astype("int64"),
        })

    def id_reduce(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("to_entity", sort=False)["from_entity"]\
            .nunique()
        return pd.DataFrame({
            "to_entity": g.index,
            "idg": g.to_numpy().astype("int64"),
        })

    od = bucketed_group_apply(tr, ["from_entity"], od_reduce,
                              n_buckets=n_buckets)
    idg = bucketed_group_apply(tr, ["to_entity"], id_reduce,
                               n_buckets=n_buckets)

    j = hash_join(
        hash_join(tr, od, on="from_entity", n_buckets=n_buckets),
        idg, on="to_entity", n_buckets=n_buckets,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("od", sort=False)["idg"].agg(["size", "sum"])
        return pd.DataFrame({
            "od": g.index.to_numpy().astype("int64"),
            "n": g["size"].to_numpy().astype("int64"),
            "s": g["sum"].to_numpy().astype("int64"),
        })

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("od", sort=False)[["n", "s"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        s = g["s"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "out_deg": g.index.to_numpy().astype("int64"),
            "n_edges": n,
            "avg_nbr_in_deg": np.round(s.astype("float64") / n, 6),
        })

    return bucketed_group_apply(
        j.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["od"], final, n_buckets=4,
    )


NEIGHBOR_DEGREE_CURVE_SQL_TEMPLATE = """
WITH t AS ({transitions}),
od AS (
  SELECT from_entity, COUNT(DISTINCT to_entity) AS od
  FROM t GROUP BY from_entity
),
idg AS (
  SELECT to_entity, COUNT(DISTINCT from_entity) AS idg
  FROM t GROUP BY to_entity
),
e AS (
  SELECT od.od, idg.idg
  FROM t JOIN od USING (from_entity) JOIN idg USING (to_entity)
)
SELECT CAST(od AS BIGINT) AS out_deg,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       ROUND(CAST(SUM(idg) AS DOUBLE) / COUNT(*), 6) AS avg_nbr_in_deg
FROM e GROUP BY od
"""


def alternation_hist(
    transcripts: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Role ALTERNATION histogram: per conversation, the fraction of
    adjacent turn pairs whose roles differ (1.0 = strict user/assistant
    ping-pong, low = monologues or tool bursts), rolled into ten corpus
    bins — the dialogue-structure health check next to
    ``role_mix_monthly``'s volume view. Adjacent pairs form through one
    co-partitioned self-``hash_join`` on (conv, turn+1) — no per-conv
    ordering task, no whale-conv exposure; per-conv pair/alternation
    counts are order-free sums; the bin is the PURE-INTEGER
    ``min(10*alt // pairs, 9)`` (never a float ratio × 10 — boundary
    ratios like 1/2 must bin identically to SQL). Single-turn
    conversations carry no pair and drop on both sides.
    Output: bin, lo, n_convs, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    base = transcripts.select_columns(["conv_id", "turn_idx", "role"])

    def shift(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"].astype("int64") + 1,
            "role_prev": batch["role"],
        })

    pairs = hash_join(
        base,
        base.map_batches(shift, batch_format="pandas", batch_size=65536),
        on=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        alt = (batch["role"] != batch["role_prev"]).astype("int64")
        g = alt.groupby(batch["conv_id"], sort=False).agg(["size", "sum"])
        return pd.DataFrame({
            "conv_id": g.index,
            "n_pairs": g["size"].to_numpy().astype("int64"),
            "n_alt": g["sum"].to_numpy().astype("int64"),
        })

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("conv_id", sort=False)[["n_pairs", "n_alt"]]\
            .sum()
        b = np.minimum(
            10 * g["n_alt"].to_numpy(dtype="int64")
            // g["n_pairs"].to_numpy(dtype="int64"),
            9,
        )
        s = pd.Series(b).groupby(b).size()
        return pd.DataFrame({
            "bin": s.index.to_numpy().astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(
        pairs.map_batches(partial, batch_format="pandas",
                          batch_size=65536),
        ["conv_id"], per_conv, n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "bin": g.index.to_numpy().astype("int64"),
            "lo": np.round(g.index.to_numpy().astype("float64") / 10.0, 1),
            "n_convs": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["bin"], final, n_buckets=1)


ALTERNATION_HIST_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
p AS (
  SELECT a.conv_id,
         CASE WHEN a.role <> b.role THEN 1 ELSE 0 END AS alt
  FROM t a JOIN t b
    ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx - 1
),
c AS (
  SELECT conv_id, COUNT(*) AS n_pairs, SUM(alt) AS n_alt
  FROM p GROUP BY conv_id
),
h AS (
  SELECT LEAST(10 * n_alt // n_pairs, 9) AS bin, COUNT(*) AS n
  FROM c GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin, ROUND(bin / 10.0, 1) AS lo,
       CAST(n AS BIGINT) AS n_convs,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""


def mention_novelty(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Repeat-mention share by MONTH: of a month's mentions, what
    fraction reference an entity BORN (first mentioned) in an earlier
    month — ``entity_growth``'s flow-side complement (a rising repeat
    share is the corpus converging on a stable vocabulary; a falling one
    is topic churn). Mentions take timestamps through the co-partitioned
    (conv, turn) ``hash_join``; entity birth months reduce entity-bucketed;
    births re-attach to the mention stream through a second
    ``hash_join`` on entity (both sides vocabulary/fact-scale — never a
    broadcast); monthly partials bound the final exchange to the month
    count. Share is one double division rounded 6.
    Output: month, n_mentions, n_repeat, share_repeat."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    mt = hash_join(
        mentions_with_entity.select_columns(
            ["conv_id", "turn_idx", "entity_id"]
        ),
        transcripts.select_columns(["conv_id", "turn_idx", "ts"]),
        on=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
    )

    def month_of(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "entity_id": batch["entity_id"],
            "month": pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m"),
        })

    mm = mt.map_batches(
        month_of, batch_format="pandas", batch_size=65536
    ).materialize()  # consumed by the birth reduce AND the repeat join

    def birth_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("entity_id", sort=False)["month"].min()
        return pd.DataFrame({
            "entity_id": g.index, "birth": g.to_numpy(),
        })

    births = bucketed_group_apply(
        mm.map_batches(birth_partial, batch_format="pandas",
                       batch_size=65536),
        ["entity_id"],
        lambda b: b.groupby("entity_id", sort=False)["birth"].min()
        .reset_index(),
        n_buckets=n_buckets,
    )

    j = hash_join(mm, births, on="entity_id", n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rep = (batch["month"] > batch["birth"]).astype("int64")
        g = rep.groupby(batch["month"], sort=False).agg(["size", "sum"])
        return pd.DataFrame({
            "month": g.index,
            "n": g["size"].to_numpy().astype("int64"),
            "r": g["sum"].to_numpy().astype("int64"),
        })

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("month", sort=False)[["n", "r"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        r = g["r"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "month": g.index,
            "n_mentions": n,
            "n_repeat": r,
            "share_repeat": np.round(r.astype("float64") / n, 6),
        })

    return bucketed_group_apply(
        j.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["month"], final, n_buckets=4,
    )


MENTION_NOVELTY_SQL_TEMPLATE = (
    r"""
WITH tr AS ({transcripts}),
m AS ({mentions}),
"""
    + _LABELS
    + r""",
mt AS (
  SELECT l.entity_id, strftime(tr.ts, '%Y-%m') AS month
  FROM m mm JOIN lab l ON mm.norm = l.norm
  JOIN tr ON tr.conv_id = mm.conv_id AND tr.turn_idx = mm.turn_idx
),
b AS (SELECT entity_id, MIN(month) AS birth FROM mt GROUP BY entity_id),
s AS (
  SELECT mt.month,
         COUNT(*) AS n,
         SUM(CASE WHEN mt.month > b.birth THEN 1 ELSE 0 END) AS r
  FROM mt JOIN b USING (entity_id) GROUP BY mt.month
)
SELECT month, CAST(n AS BIGINT) AS n_mentions,
       CAST(r AS BIGINT) AS n_repeat,
       ROUND(CAST(r AS DOUBLE) / n, 6) AS share_repeat
FROM s
"""
)


def entity_cooc_entropy(
    cooc: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-entity PARTNER ENTROPY over the co-occurrence graph: how
    evenly an entity's shared-conversation weight spreads across its
    partners (hub-with-one-friend scores ~0, uniform mixer scores
    ~log2(deg)) — the node-local diversity measure next to
    ``conv_diversity``'s per-conversation view. Edges symmetrize via one
    tagged union (no join); each entity's partner rows co-locate once in
    the bucketed reduce; entropy follows the ``hourly_entropy``
    discipline (np.log2, round 6, ``+ 0.0`` -0.0 fold).
    Output: entity_id, n_partners, w_total, partner_entropy."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["n_convs"].astype("int64")
        return pd.DataFrame({
            "entity_id": pd.concat([batch["src"], batch["dst"]],
                                   ignore_index=True),
            "w": pd.concat([w, w], ignore_index=True),
        })

    sym = cooc.select_columns(["src", "dst", "n_convs"]).map_batches(
        tag, batch_format="pandas", batch_size=65536
    )

    def per_entity(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for ent, g in bucket.groupby("entity_id", sort=False):
            w = g["w"].to_numpy(dtype="int64")
            wt = int(w.sum())
            p = w.astype("float64") / float(wt)
            ent_h = 0.0 - float((p * np.log2(p)).sum()) + 0.0
            rows.append((ent, len(w), wt, np.round(ent_h, 6) + 0.0))
        if not rows:
            return pd.DataFrame({
                "entity_id": pd.Series([], dtype="object"),
                "n_partners": pd.Series([], dtype="int64"),
                "w_total": pd.Series([], dtype="int64"),
                "partner_entropy": pd.Series([], dtype="float64"),
            })
        return pd.DataFrame(rows, columns=[
            "entity_id", "n_partners", "w_total", "partner_entropy"
        ]).astype({"n_partners": "int64", "w_total": "int64"})

    return bucketed_group_apply(sym, ["entity_id"], per_entity,
                                n_buckets=n_buckets)


ENTITY_COOC_ENTROPY_SQL_TEMPLATE = """
WITH c AS ({cooccurrence}),
e AS (
  SELECT src AS entity_id, CAST(n_convs AS DOUBLE) AS w FROM c
  UNION ALL
  SELECT dst, CAST(n_convs AS DOUBLE) FROM c
),
t AS (SELECT entity_id, SUM(w) AS wt, COUNT(*) AS np FROM e
      GROUP BY entity_id)
SELECT e.entity_id,
       CAST(t.np AS BIGINT) AS n_partners,
       CAST(t.wt AS BIGINT) AS w_total,
       ROUND(0.0 - SUM((e.w / t.wt) * log2(e.w / t.wt)), 6) + 0.0
         AS partner_entropy
FROM e JOIN t USING (entity_id)
GROUP BY e.entity_id, t.np, t.wt
"""


def conv_duration_hist(
    transcripts: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Conversation DURATION spectrum: log2 histogram of wall-clock
    conversation length in seconds — ``user_activity_hist``'s time-axis
    sibling for conversations (one-shot Q&A vs day-long sessions sizes
    the per-conv state every windowed stage holds). Per-conv first/last
    timestamps are order-free min/max partials; the bin is the
    PURE-INTEGER ``(dur_s + 1).bit_length() - 1`` == floor(log2(dur_s+1))
    (zero-duration single-turn convs land in bin 0); the count-of-counts
    fold bounds the final exchange to ~40 bins. Output: bin, lo_seconds,
    n_convs, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(batch["ts"])
        g = ts.groupby(batch["conv_id"], sort=False).agg(["min", "max"])
        return pd.DataFrame({
            "conv_id": g.index,
            "t0": g["min"].to_numpy(),
            "t1": g["max"].to_numpy(),
        })

    parts = transcripts.select_columns(["conv_id", "ts"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("conv_id", sort=False).agg(
            t0=("t0", "min"), t1=("t1", "max")
        )
        dur_s = (
            (g["t1"].to_numpy() - g["t0"].to_numpy())
            .astype("timedelta64[us]").astype("int64") // 1_000_000
        )
        bins = np.array(
            [int(d + 1).bit_length() - 1 for d in dur_s], dtype="int64"
        )
        s = pd.Series(bins).groupby(bins).size()
        return pd.DataFrame({
            "bin": s.index.to_numpy().astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["conv_id"], per_conv,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        b = g.index.to_numpy().astype("int64")
        return pd.DataFrame({
            "bin": b,
            "lo_seconds": ((np.int64(1) << b) - 1).astype("int64"),
            "n_convs": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["bin"], final, n_buckets=1)


CONV_DURATION_HIST_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
c AS (
  -- floor of the microsecond span, NOT date_diff('second', ...) which
  -- counts boundary crossings and diverges on sub-second fractions
  SELECT conv_id,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dur_s
  FROM t GROUP BY conv_id
),
h AS (
  SELECT CAST(floor(log2(dur_s + 1)) AS BIGINT) AS bin, COUNT(*) AS n
  FROM c GROUP BY 1
)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) - 1 AS lo_seconds,
       CAST(n AS BIGINT) AS n_convs,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""


def hot_turnover_daily(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    k: int = 20,
    n_buckets: int = 32,
) -> "ray.data.Dataset | pd.DataFrame":
    """Day-over-day TURNOVER of the hot-entity leaderboard: Jaccard
    overlap between consecutive days' top-``k`` mentioned entities —
    ``hot_stability``'s static halves check put on the calendar (a
    crashing overlap is topic churn; 1.0 is a frozen vocabulary).
    Mentions pick up timestamps through the co-partitioned (conv, turn)
    ``hash_join``; (day, entity) counts reduce bucketed; each day's
    top-k (ties break to the lexically smaller entity) is cut inside a
    day-bucketed apply; the surviving days x k rows are calendar-bounded,
    so the consecutive-day set algebra runs on the driver (the
    ``docs_rrf_fusion`` rank-bounded pattern) with a typed-empty return
    when fewer than two days exist. Adjacency is DATA adjacency (the
    distinct days present). Output: day, next_day, n_common, jaccard."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    mt = hash_join(
        mentions_with_entity.select_columns(
            ["conv_id", "turn_idx", "entity_id"]
        ),
        transcripts.select_columns(["conv_id", "turn_idx", "ts"]),
        on=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.to_datetime(batch["ts"]).dt.strftime("%Y-%m-%d")
        g = pd.DataFrame({
            "day": d, "entity_id": batch["entity_id"],
        }).groupby(["day", "entity_id"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    counts = bucketed_group_apply(
        mt.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["day", "entity_id"],
        lambda b: b.groupby(["day", "entity_id"], sort=False)["n"]
        .sum().reset_index(),
        n_buckets=n_buckets,
    )

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for m, g in bucket.groupby("day", sort=False):
            g = g.sort_values(["n", "entity_id"],
                              ascending=[False, True], kind="mergesort")
            rows.append(g.head(k)[["day", "entity_id"]])
        return (
            pd.concat(rows, ignore_index=True)
            if rows else bucket[["day", "entity_id"]]
        )

    # days x k rows — calendar-bounded, safe to collect
    tops = bucketed_group_apply(counts, ["day"], topk,
                                n_buckets=4).to_pandas()

    # typed empty PANDAS frame on the degenerate (<2 days) path: Ray
    # drops empty blocks at to_pandas()/schema(), so a Dataset return
    # would lose the columns (the heavy_hitter_words contract)
    empty = pd.DataFrame({
        "day": pd.Series([], dtype="object"),
        "next_day": pd.Series([], dtype="object"),
        "n_common": pd.Series([], dtype="int64"),
        "jaccard": pd.Series([], dtype="float64"),
    })
    if not len(tops) or "day" not in tops.columns:
        return empty
    days = sorted(tops["day"].unique())
    sets = {m: set(tops.loc[tops["day"] == m, "entity_id"])
            for m in days}
    rows = []
    for a, b in zip(days, days[1:]):
        common = len(sets[a] & sets[b])
        union = len(sets[a]) + len(sets[b]) - common
        rows.append((a, b, common, float(np.round(common / union, 6))))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=[
        "day", "next_day", "n_common", "jaccard"
    ]).astype({"n_common": "int64"})
    return ray.data.from_pandas(out)


HOT_TURNOVER_DAILY_SQL_TEMPLATE = (
    r"""
WITH tr AS ({transcripts}),
m AS ({mentions}),
"""
    + _LABELS
    + r""",
mt AS (
  SELECT l.entity_id, strftime(tr.ts, '%Y-%m-%d') AS day
  FROM m mm JOIN lab l ON mm.norm = l.norm
  JOIN tr ON tr.conv_id = mm.conv_id AND tr.turn_idx = mm.turn_idx
),
c AS (SELECT day, entity_id, COUNT(*) AS n FROM mt GROUP BY 1, 2),
t AS (
  SELECT day, entity_id
  FROM (SELECT day, entity_id,
               ROW_NUMBER() OVER (PARTITION BY day
                                  ORDER BY n DESC, entity_id) AS r
        FROM c)
  WHERE r <= {k}
),
dd AS (
  SELECT day, LEAD(day) OVER (ORDER BY day) AS next_day
  FROM (SELECT DISTINCT day FROM t)
),
j AS (
  SELECT p.day, p.next_day,
         (SELECT COUNT(*) FROM t a JOIN t b
            ON a.entity_id = b.entity_id
           AND a.day = p.day AND b.day = p.next_day) AS n_common,
         (SELECT COUNT(*) FROM t WHERE day = p.day) AS na,
         (SELECT COUNT(*) FROM t WHERE day = p.next_day) AS nb
  FROM dd p WHERE p.next_day IS NOT NULL
)
SELECT day, next_day, CAST(n_common AS BIGINT) AS n_common,
       ROUND(CAST(n_common AS DOUBLE) / (na + nb - n_common), 6)
         AS jaccard
FROM j
"""
)


def tool_adoption_monthly(
    transcripts: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """TOOL-use adoption curve: per month (of a conversation's FIRST
    turn), how many conversations ran and what share contained at least
    one tool turn — ``tool_stats``' per-tool table reduced to the one
    adoption trend a capability dashboard plots. Per-conv first-ts and
    has-tool are order-free min/max partials reduced conv-bucketed; the
    monthly rollup is month-bounded; the share is one double division
    rounded 6. Output: month, n_convs, n_tool_convs, tool_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(batch["ts"])
        tool = (batch["role"] == "tool").astype("int64")
        g = pd.DataFrame({
            "conv_id": batch["conv_id"], "t0": ts, "tool": tool,
        }).groupby("conv_id", sort=False).agg(
            t0=("t0", "min"), tool=("tool", "max")
        ).reset_index()
        return g

    parts = transcripts.select_columns(
        ["conv_id", "role", "ts"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("conv_id", sort=False).agg(
            t0=("t0", "min"), tool=("tool", "max")
        )
        month = pd.to_datetime(g["t0"]).dt.strftime("%Y-%m")
        h = g["tool"].groupby(month, sort=False).agg(["size", "sum"])
        return pd.DataFrame({
            "month": h.index,
            "n": h["size"].to_numpy().astype("int64"),
            "t": h["sum"].to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["conv_id"], per_conv,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("month", sort=False)[["n", "t"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        t = g["t"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "month": g.index,
            "n_convs": n,
            "n_tool_convs": t,
            "tool_share": np.round(t.astype("float64") / n, 6),
        })

    return bucketed_group_apply(mid, ["month"], final, n_buckets=1)


TOOL_ADOPTION_MONTHLY_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
c AS (
  SELECT conv_id, strftime(MIN(ts), '%Y-%m') AS month,
         MAX(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS has_tool
  FROM t GROUP BY conv_id
),
s AS (SELECT month, COUNT(*) AS n, SUM(has_tool) AS tl
      FROM c GROUP BY month)
SELECT month, CAST(n AS BIGINT) AS n_convs,
       CAST(tl AS BIGINT) AS n_tool_convs,
       ROUND(CAST(tl AS DOUBLE) / n, 6) AS tool_share
FROM s
"""


def response_time_hist(
    transcripts: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Corpus-wide DISTRIBUTION of assistant response latency: every
    user turn's time-to-first-following-assistant-turn, binned log2 by
    seconds — ``response_latency``'s per-conversation means say who is
    slow, this histogram says whether the corpus tail is seconds or
    hours. The same conv-bucketed vectorized backfill produces the
    per-response latencies; the bin is the PURE-INTEGER
    ``(lat_s + 1).bit_length() - 1`` over the floored second gap; the
    count-of-counts fold bounds the final exchange to ~40 bins.
    Output: bin, lo_seconds, n_responses, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        us = pd.to_datetime(d["ts"]).astype("datetime64[us]")\
            .astype("int64")
        a_ts = us.where((d["role"] == "assistant").to_numpy())
        next_a = a_ts.groupby(d["conv_id"], sort=False).bfill()
        k = ((d["role"] == "user") & next_a.notna()).to_numpy()
        lat_s = ((next_a[k].astype("int64") - us[k]) // 1_000_000)\
            .to_numpy()
        bins = np.array(
            [int(v + 1).bit_length() - 1 for v in lat_s], dtype="int64"
        )
        s = pd.Series(bins).groupby(bins).size()
        return pd.DataFrame({
            "bin": s.index.to_numpy().astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "role", "ts"]),
        ["conv_id"], per_conv, n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        b = g.index.to_numpy().astype("int64")
        return pd.DataFrame({
            "bin": b,
            "lo_seconds": ((np.int64(1) << b) - 1).astype("int64"),
            "n_responses": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["bin"], final, n_buckets=1)


RESPONSE_TIME_HIST_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
nx AS (
  SELECT conv_id, turn_idx, role, ts,
         MIN(CASE WHEN role = 'assistant' THEN ts END) OVER (
           PARTITION BY conv_id ORDER BY turn_idx DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS next_a
  FROM t
),
lat AS (
  SELECT (epoch_us(next_a) - epoch_us(ts)) // 1000000 AS lat_s
  FROM nx WHERE role = 'user' AND next_a IS NOT NULL
),
h AS (
  SELECT CAST(floor(log2(lat_s + 1)) AS BIGINT) AS bin, COUNT(*) AS n
  FROM lat GROUP BY 1
)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) - 1 AS lo_seconds,
       CAST(n AS BIGINT) AS n_responses,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""


def conv_repeat_hist(
    mentions_with_entity: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Within-conversation mention REDUNDANCY: per conversation the share
    of mentions that re-reference an entity already mentioned in that
    conversation (1 - distinct/total — order-free, so no turn ordering is
    needed), rolled into ten pure-integer decile bins — the
    dialogue-level repetition gauge next to ``text_repetition``'s
    document view. Per-batch (conv, entity) count partials reduce
    conv-bucketed; the bin is ``min(10*(n-d) // n, 9)``; the
    count-of-counts fold bounds the final exchange.
    Output: bin, lo, n_convs, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["conv_id", "entity_id"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = mentions_with_entity.select_columns(
        ["conv_id", "entity_id"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        ce = bucket.groupby(["conv_id", "entity_id"], sort=False)["n"]\
            .sum().reset_index()
        g = ce.groupby("conv_id", sort=False)["n"].agg(["size", "sum"])
        d = g["size"].to_numpy(dtype="int64")       # distinct entities
        n = g["sum"].to_numpy(dtype="int64")        # total mentions
        b = np.minimum(10 * (n - d) // n, 9)
        s = pd.Series(b).groupby(b).size()
        return pd.DataFrame({
            "bin": s.index.to_numpy().astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["conv_id"], per_conv,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "bin": g.index.to_numpy().astype("int64"),
            "lo": np.round(g.index.to_numpy().astype("float64") / 10.0, 1),
            "n_convs": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["bin"], final, n_buckets=1)


CONV_REPEAT_HIST_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
me AS (
  SELECT mm.conv_id, l.entity_id
  FROM m mm JOIN lab l ON mm.norm = l.norm
),
c AS (
  SELECT conv_id, COUNT(*) AS n, COUNT(DISTINCT entity_id) AS d
  FROM me GROUP BY conv_id
),
h AS (
  SELECT LEAST(10 * (n - d) // n, 9) AS bin, COUNT(*) AS nc
  FROM c GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin, ROUND(bin / 10.0, 1) AS lo,
       CAST(nc AS BIGINT) AS n_convs,
       ROUND(CAST(nc AS DOUBLE) / SUM(CAST(nc AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""
)


def alias_count_hist(
    mentions_with_entity: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """ALIAS spectrum of the canonicalization: how many distinct surface
    forms map to each canonical entity, as a count histogram — the one
    chart that says whether entity resolution is folding variants (fat
    right tail) or pass-through (everything at 1). (entity, norm) dedups
    per batch then exactly in the entity-bucketed reduce; the alias count
    per entity is order-free; the count-of-counts fold bounds the final
    exchange. Output: n_aliases, n_entities, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["entity_id", "norm"]].drop_duplicates()

    parts = mentions_with_entity.select_columns(
        ["entity_id", "norm"]
    ).map_batches(partial, batch_format="pandas", batch_size=65536)

    def per_entity(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("entity_id", sort=False)["norm"].nunique()
        s = g.groupby(g, sort=False).size()
        return pd.DataFrame({
            "n_aliases": s.index.to_numpy().astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["entity_id"], per_entity,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("n_aliases", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "n_aliases": g.index.to_numpy().astype("int64"),
            "n_entities": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["n_aliases"], final, n_buckets=1)


ALIAS_COUNT_HIST_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
a AS (
  SELECT entity_id, COUNT(DISTINCT norm) AS n_aliases
  FROM lab GROUP BY entity_id
),
h AS (SELECT n_aliases, COUNT(*) AS n FROM a GROUP BY n_aliases)
SELECT CAST(n_aliases AS BIGINT) AS n_aliases,
       CAST(n AS BIGINT) AS n_entities,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""
)


def mention_strength_corr(
    mentions_with_entity: ray.data.Dataset,
    cooc: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Pearson correlation between an entity's MENTION count and its
    co-occurrence STRENGTH (total shared-conversation weight) — near-1
    means graph weight is just frequency restated; a low value means
    some entities are talked about a lot but always alone (the weighted-
    network frequency/embeddedness contrast, Barrat et al. 2004,
    public). The two per-entity measures arrive as one TAGGED UNION into
    the entity-bucketed apply (no join shuffle): mention partials carry
    (x, 0), symmetrized edge partials carry (0, w); entities missing
    from the co-occurrence graph keep strength 0. Each bucket folds its
    entities to ONE row of six integer sufficient statistics; the driver
    merges Python ints (exact at any scale) and the coefficient is one
    shared double expression rounded 6.
    Output: n_entities, corr_mention_strength."""
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def m_tag(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["entity_id"].groupby(batch["entity_id"],
                                       sort=False).size()
        return pd.DataFrame({
            "entity_id": s.index,
            "x": s.to_numpy().astype("int64"),
            "w": np.int64(0),
        })

    def e_tag(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["n_convs"].astype("int64")
        return pd.DataFrame({
            "entity_id": pd.concat([batch["src"], batch["dst"]],
                                   ignore_index=True),
            "x": np.int64(0),
            "w": pd.concat([w, w], ignore_index=True),
        })

    both = mentions_with_entity.select_columns(["entity_id"]).map_batches(
        m_tag, batch_format="pandas", batch_size=65536
    ).union(cooc.select_columns(["src", "dst", "n_convs"]).map_batches(
        e_tag, batch_format="pandas", batch_size=65536
    ))

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("entity_id", sort=False)[["x", "w"]].sum()
        # an entity only counts if it was MENTIONED (x > 0); pure-edge
        # rows cannot occur (cooc derives from mentions) but guard anyway
        g = g[g["x"] > 0]
        x = g["x"].to_numpy(dtype="int64")
        y = g["w"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "k": ["all"],
            "n": [np.int64(len(g))],
            "sx": [x.sum()], "sy": [y.sum()], "sxy": [(x * y).sum()],
            "sx2": [(x * x).sum()], "sy2": [(y * y).sum()],
        })

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        n = sum(int(v) for v in bucket["n"])
        sx = sum(int(v) for v in bucket["sx"])
        sy = sum(int(v) for v in bucket["sy"])
        sxy = sum(int(v) for v in bucket["sxy"])
        sx2 = sum(int(v) for v in bucket["sx2"])
        sy2 = sum(int(v) for v in bucket["sy2"])
        dx, dy = n * sx2 - sx * sx, n * sy2 - sy * sy
        if n == 0 or dx <= 0 or dy <= 0:
            return pd.DataFrame({
                "n_entities": pd.array([], dtype="int64"),
                "corr_mention_strength": pd.array([], dtype="float64"),
            })
        corr = float(n * sxy - sx * sy) / math.sqrt(float(dx) * float(dy))
        return pd.DataFrame({
            "n_entities": pd.array([n], dtype="int64"),
            "corr_mention_strength": [float(np.round(corr, 6))],
        })

    mid = bucketed_group_apply(both, ["entity_id"], per_bucket,
                               n_buckets=n_buckets)
    return bucketed_group_apply(mid, ["k"], final, n_buckets=1)


MENTION_STRENGTH_CORR_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
mc AS (
  SELECT l.entity_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM m mm JOIN lab l ON mm.norm = l.norm
  GROUP BY l.entity_id
),
c AS ({cooccurrence}),
e AS (
  SELECT src AS entity_id, n_convs FROM c
  UNION ALL
  SELECT dst, n_convs FROM c
),
st AS (SELECT entity_id, CAST(SUM(n_convs) AS BIGINT) AS y
       FROM e GROUP BY entity_id),
d AS (
  SELECT mc.x, COALESCE(st.y, 0) AS y
  FROM mc LEFT JOIN st USING (entity_id)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM d
)
SELECT n AS n_entities,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6)
         AS corr_mention_strength
FROM s WHERE n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
"""
)


def conv_size_hist(
    transcripts: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """Conversation SIZE spectrum: log2 histogram of turns per
    conversation — the third corpus-shape histogram next to
    ``conv_duration_hist`` (wall-clock) and ``user_activity_hist``
    (events), and the direct sizing input for every conv-bucketed stage
    (the tail bin is the whale-conversation exposure). Per-conv counts
    are order-free sums; the bin is the PURE-INTEGER ``bit_length`` rule;
    the count-of-counts fold bounds the final exchange.
    Output: bin, min_turns, n_convs, n_turns, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["conv_id"].groupby(batch["conv_id"], sort=False).size()
        return pd.DataFrame({
            "conv_id": s.index,
            "n": s.to_numpy().astype("int64"),
        })

    parts = transcripts.select_columns(["conv_id"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_conv(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("conv_id", sort=False)["n"].sum()
        c = g.to_numpy(dtype="int64")
        bins = np.array([int(x).bit_length() - 1 for x in c],
                        dtype="int64")
        d = pd.DataFrame({"bin": bins, "n_convs": np.int64(1),
                          "n_turns": c})
        return d.groupby("bin", sort=False).sum().reset_index()\
            .astype("int64")

    mid = bucketed_group_apply(parts, ["conv_id"], per_conv,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)[["n_convs", "n_turns"]]\
            .sum()
        n = g["n_convs"].to_numpy(dtype="int64")
        tot = float(n.sum())
        b = g.index.to_numpy().astype("int64")
        return pd.DataFrame({
            "bin": b,
            "min_turns": (np.int64(1) << b).astype("int64"),
            "n_convs": n,
            "n_turns": g["n_turns"].to_numpy(dtype="int64"),
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["bin"], final, n_buckets=1)


CONV_SIZE_HIST_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
c AS (SELECT conv_id, COUNT(*) AS n FROM t GROUP BY conv_id),
h AS (
  SELECT CAST(floor(log2(n)) AS BIGINT) AS bin,
         COUNT(*) AS nc, SUM(n) AS nt
  FROM c GROUP BY 1
)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_turns,
       CAST(nc AS BIGINT) AS n_convs, CAST(nt AS BIGINT) AS n_turns,
       ROUND(CAST(nc AS DOUBLE) / SUM(CAST(nc AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""


def mention_coverage_by_role(
    transcripts: ray.data.Dataset,
    mentions: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """MENTION coverage by ROLE: what share of each role's turns contain
    at least one extracted mention — the extractor recall dashboard (a
    drop in assistant-turn coverage is an extraction regression, not a
    corpus change). Turn rows and distinct mention (conv, turn) keys
    meet in one (conv, turn)-bucketed tagged union (anti-join shape, no
    row-scale join output); role partials bound the final exchange.
    Output: role, n_turns, n_with_mention, coverage."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def t_tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"].astype("int64"),
            "role": batch["role"],
            "has_m": np.int64(0),
        })

    def m_tag(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[["conv_id", "turn_idx"]].drop_duplicates()
        return pd.DataFrame({
            "conv_id": d["conv_id"],
            "turn_idx": d["turn_idx"].astype("int64"),
            # "" = missing sentinel: max("", role) keeps the real role
            "role": "",
            "has_m": np.int64(1),
        })

    both = transcripts.select_columns(
        ["conv_id", "turn_idx", "role"]
    ).map_batches(t_tag, batch_format="pandas", batch_size=65536).union(
        mentions.select_columns(["conv_id", "turn_idx"]).map_batches(
            m_tag, batch_format="pandas", batch_size=65536
        )
    )

    def per_turn(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["conv_id", "turn_idx"], sort=False).agg(
            role=("role", "max"), has_m=("has_m", "max")
        )
        g = g[g["role"] != ""]  # mention rows without a turn: impossible
        out = pd.DataFrame({
            "role": g["role"],
            "n": np.int64(1),
            "m": g["has_m"].to_numpy().astype("int64"),
        }).groupby("role", sort=False).sum().reset_index()
        return out.astype({"n": "int64", "m": "int64"})

    mid = bucketed_group_apply(both, ["conv_id", "turn_idx"], per_turn,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("role", sort=False)[["n", "m"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        m = g["m"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "role": g.index,
            "n_turns": n,
            "n_with_mention": m,
            "coverage": np.round(m.astype("float64") / n, 6),
        })

    return bucketed_group_apply(mid, ["role"], final, n_buckets=1)


MENTION_COVERAGE_BY_ROLE_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
m AS ({mentions}),
mk AS (SELECT DISTINCT conv_id, turn_idx FROM m),
j AS (
  SELECT t.role,
         CASE WHEN mk.conv_id IS NULL THEN 0 ELSE 1 END AS has_m
  FROM t LEFT JOIN mk
    ON mk.conv_id = t.conv_id AND mk.turn_idx = t.turn_idx
),
s AS (SELECT role, COUNT(*) AS n, SUM(has_m) AS m FROM j GROUP BY role)
SELECT role, CAST(n AS BIGINT) AS n_turns,
       CAST(m AS BIGINT) AS n_with_mention,
       ROUND(CAST(m AS DOUBLE) / n, 6) AS coverage
FROM s
"""


def entity_gini(
    mentions_with_entity: ray.data.Dataset, n_buckets: int = 16
) -> ray.data.Dataset:
    """Gini coefficient of per-entity MENTION inequality — the KG-side
    concentration scalar next to ``events_user_gini`` (a knowledge graph
    where three entities absorb all mentions answers questions about
    three things). Fully exact until the final division — the
    ``user_gini`` rank-sum mold: entity-bucketed counts, count-of-counts
    fold, arbitrary-precision rank sum over (count, multiplicity) runs,
    one double expression mirrored by the oracle, np.round 6.
    Output: one row — n_entities, total_mentions, gini."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("entity_id", sort=False).size()
        return pd.DataFrame({
            "entity_id": s.index,
            "c_part": s.to_numpy().astype("int64"),
        })

    def per_entity(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("entity_id", sort=False)["c_part"].sum()
        h = s.value_counts()
        return pd.DataFrame({
            "c": h.index.astype("int64"),
            "m_part": h.to_numpy().astype("int64"),
        })

    def hist(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("c", sort=False)["m_part"].sum()
        return pd.DataFrame({
            "c": s.index.astype("int64"),
            "m": s.astype("int64").to_numpy(),
        })

    per = bucketed_group_apply(
        mentions_with_entity.select_columns(["entity_id"]).map_batches(
            partial, batch_format="pandas", batch_size=65536
        ),
        ["entity_id"], per_entity, n_buckets=n_buckets,
    )
    cc = bucketed_group_apply(per, ["c"], hist, n_buckets=4).to_pandas()
    cc = cc.sort_values("c")
    n = t = s_rank = 0
    r = 1
    for c, m in zip(cc["c"].tolist(), cc["m"].tolist()):
        s_rank += c * (m * r + m * (m - 1) // 2)
        r += m
        n += m
        t += c * m
    gini = float(np.round(
        2.0 * float(s_rank) / (float(n) * float(t))
        - float(n + 1) / float(n), 6
    )) if n else float("nan")
    return ray.data.from_pandas(pd.DataFrame({
        "n_entities": pd.array([n], dtype="int64"),
        "total_mentions": pd.array([t], dtype="int64"),
        "gini": [gini],
    }))


ENTITY_GINI_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
u AS (
  SELECT l.entity_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM m mm JOIN lab l ON mm.norm = l.norm
  GROUP BY l.entity_id
),
r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, entity_id) AS rn FROM u
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS t,
         SUM(rn * c) AS s_rank
  FROM r
)
SELECT n AS n_entities, t AS total_mentions,
       ROUND(2.0 * CAST(s_rank AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
FROM s
"""
)


def top_cooc_pairs(
    cooc: ray.data.Dataset, k: int = 25, n_buckets: int = 16
) -> ray.data.Dataset:
    """Top-``k`` co-occurring entity PAIRS by shared-conversation weight
    — the leaderboard view of the co-occurrence graph
    (``cooc_weight_hist`` says how heavy edges get; this says WHICH).
    Per-bucket head-k candidates (lossless: the global top-k lives in
    the union), then one k × n_buckets merge with deterministic ties
    (weight desc, then src, then dst). Rank emits so the driver hash
    pins the order. Output: rank, src, dst, n_convs."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(
            ["n_convs", "src", "dst"], ascending=[False, True, True],
            kind="mergesort",
        )
        return g.head(k)[["src", "dst", "n_convs"]]

    cand = bucketed_group_apply(
        cooc.select_columns(["src", "dst", "n_convs"]),
        ["src", "dst"], per_bucket, n_buckets=n_buckets,
    ).to_pandas()  # <= k x n_buckets rows — bounded

    top = cand.sort_values(
        ["n_convs", "src", "dst"], ascending=[False, True, True],
        kind="mergesort",
    ).head(k).reset_index(drop=True)
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype="int64"))
    top["n_convs"] = top["n_convs"].astype("int64")
    return ray.data.from_pandas(top)


def top_cooc_pairs_sql(cooccurrence: str, k: int = 25) -> str:
    return f"""
WITH c AS ({cooccurrence})
SELECT CAST(ROW_NUMBER() OVER (
         ORDER BY n_convs DESC, src, dst) AS BIGINT) AS rank,
       src, dst, n_convs
FROM c
ORDER BY n_convs DESC, src, dst
LIMIT {k}
"""


def question_share_by_role(
    transcripts: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """QUESTION rate by role: the share of each role's turns whose text
    ends with '?' — the cheapest dialogue-act signal there is (users ask,
    assistants answer; an assistant question rate creeping up is a
    clarification-loop regression). Exact integer partials bounded to
    role cardinality; the share is one double division rounded 6.
    Output: role, n_turns, n_questions, question_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = batch["text"].fillna("").str.endswith("?").astype("int64")
        g = q.groupby(batch["role"], sort=False).agg(["size", "sum"])
        return pd.DataFrame({
            "role": g.index,
            "n": g["size"].to_numpy().astype("int64"),
            "q": g["sum"].to_numpy().astype("int64"),
        })

    parts = transcripts.select_columns(["role", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("role", sort=False)[["n", "q"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        q = g["q"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "role": g.index,
            "n_turns": n,
            "n_questions": q,
            "question_share": np.round(q.astype("float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["role"], final, n_buckets=1)


QUESTION_SHARE_BY_ROLE_SQL_TEMPLATE = """
WITH t AS ({transcripts}),
s AS (
  SELECT role, COUNT(*) AS n,
         SUM(CASE WHEN text LIKE '%?' THEN 1 ELSE 0 END) AS q
  FROM t GROUP BY role
)
SELECT role, CAST(n AS BIGINT) AS n_turns,
       CAST(q AS BIGINT) AS n_questions,
       ROUND(CAST(q AS DOUBLE) / n, 6) AS question_share
FROM s
"""


def connectivity_ratio(
    cooccurrence: ray.data.Dataset, config=None, n_buckets: int = 64
) -> ray.data.Dataset:
    """Graph CONNECTIVITY scalar: the probability that two random
    (distinct, edge-touched) entities are REACHABLE from each other —
    Σ sᵢ(sᵢ−1) / (n(n−1)) over connected-component sizes, the one number
    behind ``component_size_hist``'s spectrum (1.0 = one blob, →0 =
    dust). Reuses ``entity_components`` (dual-path CC); (component,
    size) pairs dedupe component-bucketed; the arbitrary-precision
    integer partials merge on the driver and the ratio divides two
    exact ints cast to double, rounded 6.
    Output: n_entities, n_components, reachable_pair_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    comp = entity_components(cooccurrence, config=config,
                             n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["component_id", "component_size"]].drop_duplicates()

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()
        s = d["component_size"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "k": ["all"],
            "n": [np.int64(s.sum())],
            "nc": [np.int64(len(s))],
            "pairs": [np.int64((s * (s - 1)).sum())],
        })

    mid = bucketed_group_apply(
        comp.map_batches(partial, batch_format="pandas",
                         batch_size=65536),
        ["component_id"], per_bucket, n_buckets=n_buckets,
    ).to_pandas()  # <= n_buckets rows — bounded

    n = int(mid["n"].sum())
    nc = int(mid["nc"].sum())
    pairs = int(mid["pairs"].sum())
    share = (
        float(np.round(float(pairs) / float(n * (n - 1)), 6))
        if n > 1 else float("nan")
    )
    return ray.data.from_pandas(pd.DataFrame({
        "n_entities": pd.array([n], dtype="int64"),
        "n_components": pd.array([nc], dtype="int64"),
        "reachable_pair_share": [share],
    }))


CONNECTIVITY_RATIO_SQL_TEMPLATE = """
WITH RECURSIVE e AS MATERIALIZED ({cooccurrence}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
ed AS (SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst, src FROM e),
r(node, reach) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.node, ed.v FROM r JOIN ed ON ed.u = r.reach
),
comp AS (SELECT node, MIN(reach) AS component_id FROM r GROUP BY node),
sz AS (SELECT component_id, CAST(COUNT(*) AS BIGINT) AS s
       FROM comp GROUP BY component_id),
agg AS (
  SELECT CAST(SUM(s) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS nc,
         CAST(SUM(s * (s - 1)) AS BIGINT) AS pairs
  FROM sz
)
SELECT n AS n_entities, nc AS n_components,
       ROUND(CAST(pairs AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6)
         AS reachable_pair_share
FROM agg WHERE n > 1
"""


def triple_intervals(
    triples: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Temporal-KG validity intervals: per (subj, pred, obj) fact, the
    first/last time it was asserted, its observed validity span, and its
    evidence mass (mention + distinct-conversation counts). The temporal
    axis of the reference's property graph (trackpoint ``time`` attached to
    every vertex, src/TCXParser.jl:62; transitions windowed by start_time,
    src/DataPreprocessing.jl:345-347) applied to the KG's fact table.

    Timestamps attach from transcripts through the co-partitioned
    (conv_id, turn_idx) hash join the monthly transitions / entity trend
    already use; all outputs are exact int64 (epoch microseconds), so the
    driver hash is bit-stable. Shape: per-batch (s,p,o,conv) partials
    (min/max ts + count), one triple-keyed bucketed reduce that first
    re-folds the (s,p,o,conv) level (partials for one conv may arrive from
    many batches) then aggregates to the fact level — per-task rows are
    bounded by the distinct convs of the bucket's facts, the same exposure
    class as kg_transitions. Output: subj, pred, obj, first_us, last_us,
    span_us, n_mentions, n_convs."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    tr = triples.select_columns(["conv_id", "turn_idx", "subj", "pred", "obj"])
    ts = transcripts.select_columns(["conv_id", "turn_idx", "ts"])
    j = hash_join(tr, ts, on=["conv_id", "turn_idx"], n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # normalize the unit before the int view: parquet timestamps arrive
        # as datetime64[us] (pandas>=2 keeps the unit, so astype(int64)
        # would already be µs and a //1000 would halve the scale)
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]")\
            .astype("int64")
        d = pd.DataFrame({
            "subj": batch["subj"], "pred": batch["pred"],
            "obj": batch["obj"], "conv_id": batch["conv_id"], "us": us,
        })
        g = d.groupby(["subj", "pred", "obj", "conv_id"], sort=False).agg(
            n=("us", "size"), tmin=("us", "min"), tmax=("us", "max")
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    parts = j.map_batches(partial, batch_format="pandas", batch_size=65536)

    def per_fact(bucket: pd.DataFrame) -> pd.DataFrame:
        c = bucket.groupby(
            ["subj", "pred", "obj", "conv_id"], sort=False
        ).agg(n=("n", "sum"), tmin=("tmin", "min"), tmax=("tmax", "max"))\
            .reset_index()
        g = c.groupby(["subj", "pred", "obj"], sort=False).agg(
            first_us=("tmin", "min"), last_us=("tmax", "max"),
            n_mentions=("n", "sum"), n_convs=("conv_id", "size"),
        ).reset_index()
        g["span_us"] = (g["last_us"] - g["first_us"]).astype("int64")
        for col in ("first_us", "last_us", "n_mentions", "n_convs"):
            g[col] = g[col].astype("int64")
        return g[["subj", "pred", "obj", "first_us", "last_us",
                  "span_us", "n_mentions", "n_convs"]]

    return bucketed_group_apply(
        parts, ["subj", "pred", "obj"], per_fact, n_buckets=n_buckets
    )


TRIPLE_INTERVALS_SQL_TEMPLATE = """
WITH t AS ({transcripts}), tr AS ({triples})
SELECT tr.subj, tr.pred, tr.obj,
       MIN(epoch_us(t.ts)) AS first_us,
       MAX(epoch_us(t.ts)) AS last_us,
       MAX(epoch_us(t.ts)) - MIN(epoch_us(t.ts)) AS span_us,
       CAST(COUNT(*) AS BIGINT) AS n_mentions,
       CAST(COUNT(DISTINCT tr.conv_id) AS BIGINT) AS n_convs
FROM tr JOIN t ON t.conv_id = tr.conv_id AND t.turn_idx = tr.turn_idx
GROUP BY 1, 2, 3
"""


def fact_conflicts(triples: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """KG CONSISTENCY audit — functional-dependency conflicts over the
    fact table: (subj, pred) keys asserted with MORE THAN ONE distinct
    object are the contradictions an ingest must adjudicate before the
    graph materializes (the reference's dedup-by-overlap admits one
    canonical segment per window for the same reason,
    src/OverlappingSegmentsUtils.jl:229-240). For each conflicted key:
    how many distinct objects, total assertions, the DOMINANT object
    (most assertions, lexicographic min tie-break) and its support share.

    Shape: per-batch (s,p,o) count partials, one (s,p)-keyed bucketed
    reduce (objects of one key land whole; per-task rows bounded by the
    bucket's distinct objects). Output: subj, pred, n_objects,
    n_assertions, top_obj, top_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["subj", "pred", "obj"], sort=False).size()\
            .reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    parts = triples.select_columns(["subj", "pred", "obj"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_key(bucket: pd.DataFrame) -> pd.DataFrame:
        c = bucket.groupby(["subj", "pred", "obj"], sort=False)["n"].sum()\
            .reset_index()
        # dominant object: max count, then lexicographic min object
        c = c.sort_values(["subj", "pred", "n", "obj"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        g = c.groupby(["subj", "pred"], sort=False).agg(
            n_objects=("obj", "size"), n_assertions=("n", "sum"),
            top_obj=("obj", "first"), top_n=("n", "first"),
        ).reset_index()
        g = g[g["n_objects"] > 1]
        for col in ("n_objects", "n_assertions", "top_n"):
            g[col] = g[col].astype("int64")
        g["top_share"] = np.round(
            g["top_n"].to_numpy(dtype="float64")
            / g["n_assertions"].to_numpy(dtype="float64"), 6
        )
        return g[["subj", "pred", "n_objects", "n_assertions",
                  "top_obj", "top_share"]]

    return bucketed_group_apply(parts, ["subj", "pred"], per_key,
                                n_buckets=n_buckets)


FACT_CONFLICTS_SQL_TEMPLATE = """
WITH tr AS ({triples}),
c AS (
  SELECT subj, pred, obj, CAST(COUNT(*) AS BIGINT) AS n
  FROM tr GROUP BY 1, 2, 3
),
k AS (
  SELECT subj, pred,
         CAST(COUNT(*) AS BIGINT) AS n_objects,
         CAST(SUM(n) AS BIGINT) AS n_assertions
  FROM c GROUP BY 1, 2
  HAVING COUNT(*) > 1
),
top AS (
  SELECT subj, pred, obj AS top_obj, n AS top_n
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY subj, pred ORDER BY n DESC, obj ASC
    ) AS rn FROM c
  ) WHERE rn = 1
)
SELECT k.subj, k.pred, k.n_objects, k.n_assertions, top.top_obj,
       ROUND(CAST(top.top_n AS DOUBLE) / CAST(k.n_assertions AS DOUBLE), 6)
         AS top_share
FROM k JOIN top ON top.subj = k.subj AND top.pred = k.pred
"""


def decayed_hotness(
    mentions_with_entity: ray.data.Dataset,
    transcripts: ray.data.Dataset,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """EXPONENTIALLY-DECAYED entity hotness with a one-week half-life,
    computed in EXACT DYADIC arithmetic: weight = 2^-w for age w whole
    weeks (w > 16 -> 0), scaled by 2^16 so the weighted sum is pure int64
    (the bit-shift decay a production counter service actually implements —
    no float pow, no summation-order drift). The freshness-weighted
    counterpart of ``hot_entities``' all-time count: an entity hot a month
    ago and silent since ranks below one trending today.

    Shape: mention rows pick up timestamps through the co-partitioned
    (conv_id, turn_idx) hash_join (as ``entity_bursts``); exact daily
    partials; the corpus max-day anchor is one tiny distributed max; the
    decay fold is one entity-bucketed reduce. Output: entity_id,
    n_mentions (int64), decayed_s16 (int64), decayed (float64 =
    decayed_s16 / 2^16, exact)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    US_PER_DAY = 86_400_000_000

    joined = hash_join(
        mentions_with_entity.select_columns(
            ["conv_id", "turn_idx", "entity_id", "n_occurrences"]
        ),
        transcripts.select_columns(["conv_id", "turn_idx", "ts"]),
        on=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
    )

    def partial_day(batch: pd.DataFrame) -> pd.DataFrame:
        us = pd.to_datetime(batch["ts"]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        g = pd.DataFrame({
            "entity_id": batch["entity_id"].to_numpy(),
            "day_i": us // US_PER_DAY,
            "n": batch["n_occurrences"].astype("int64").to_numpy(),
        }).groupby(["entity_id", "day_i"], sort=False)["n"].sum()
        return g.astype("int64").reset_index()

    daily = bucketed_group_apply(
        joined.map_batches(partial_day, batch_format="pandas",
                           batch_size=65536),
        ["entity_id", "day_i"],
        lambda b: b.groupby(["entity_id", "day_i"], sort=False)["n"].sum()
        .astype("int64").reset_index(),
        n_buckets=n_buckets,
    ).materialize()

    md = int(
        daily.map_batches(
            lambda b: pd.DataFrame({"m": [b["day_i"].max()]}),
            batch_format="pandas",
        ).to_pandas()["m"].max()
    )

    def fold(bucket: pd.DataFrame) -> pd.DataFrame:
        wk = (md - bucket["day_i"].to_numpy(dtype="int64")) // 7
        n = bucket["n"].to_numpy(dtype="int64")
        w16 = np.where(wk <= 16, n * np.left_shift(1, np.maximum(16 - wk, 0)),
                       0).astype("int64")
        d = pd.DataFrame({
            "entity_id": bucket["entity_id"].to_numpy(),
            "n": n,
            "w16": w16,
        }).groupby("entity_id", sort=False).sum().reset_index()
        return pd.DataFrame({
            "entity_id": d["entity_id"].to_numpy(),
            "n_mentions": d["n"].astype("int64").to_numpy(),
            "decayed_s16": d["w16"].astype("int64").to_numpy(),
            "decayed": d["w16"].astype("int64").to_numpy() / 65536.0,
        })

    return bucketed_group_apply(daily, ["entity_id"], fold,
                                n_buckets=n_buckets)


DECAYED_HOTNESS_SQL_TEMPLATE = (
    r"""
WITH m AS ({mentions}),
"""
    + _LABELS
    + r""",
t AS ({transcripts}),
me AS (
  SELECT l.entity_id,
         CAST(epoch_us(t.ts) // 86400000000 AS BIGINT) AS day_i,
         mm.n_occurrences
  FROM m mm
  JOIN lab l ON mm.norm = l.norm
  JOIN t ON t.conv_id = mm.conv_id AND t.turn_idx = mm.turn_idx
),
d AS (
  SELECT entity_id, day_i, CAST(SUM(n_occurrences) AS BIGINT) AS n
  FROM me GROUP BY entity_id, day_i
),
mx AS (SELECT MAX(day_i) AS md FROM d),
w AS (
  SELECT entity_id, n, (mx.md - day_i) // 7 AS wk FROM d, mx
)
SELECT entity_id,
       CAST(SUM(n) AS BIGINT) AS n_mentions,
       CAST(SUM(CASE WHEN wk <= 16 THEN n * (1::BIGINT << (16 - wk))
                ELSE 0 END) AS BIGINT) AS decayed_s16,
       CAST(SUM(CASE WHEN wk <= 16 THEN n * (1::BIGINT << (16 - wk))
                ELSE 0 END) AS BIGINT) / 65536.0 AS decayed
FROM w GROUP BY entity_id
"""
)


def coburst_pairs(
    bursts: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """CO-ANOMALY pairs: entities whose burst days (from ``entity_bursts``)
    coincide — two entities spiking the same day suggests one driving
    event (a shared incident, a campaign), the correlation an on-call
    investigation asks for right after the per-entity alert fires.

    Shape: day-keyed inverted index over the (already tiny relative to
    mentions) burst table, per-day vectorized triu pairs, one salted exact
    pair count. Output: entity_a < entity_b, n_shared_days (int64)."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )

    def day_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in bucket.groupby("day", sort=False):
            ents = np.sort(g["entity_id"].unique())
            if len(ents) < 2:
                continue
            ii, jj = np.triu_indices(len(ents), k=1)
            out_a.append(ents[ii])
            out_b.append(ents[jj])
        if not out_a:
            return pd.DataFrame({
                "entity_a": pd.Series(dtype="object"),
                "entity_b": pd.Series(dtype="object"),
            })
        return pd.DataFrame({
            "entity_a": np.concatenate(out_a),
            "entity_b": np.concatenate(out_b),
        })

    pairs = bucketed_group_apply(
        bursts.select_columns(["entity_id", "day"]), ["day"], day_pairs,
        n_buckets=n_buckets,
    )
    return salted_group_apply(
        pairs, ["entity_a", "entity_b"],
        partial_fn=lambda b: b.groupby(["entity_a", "entity_b"], sort=False)
        .size().astype("int64").reset_index(name="n_shared_days"),
        merge_fn=lambda b: b.groupby(["entity_a", "entity_b"], sort=False)
        ["n_shared_days"].sum().astype("int64").reset_index(),
    )


COBURST_PAIRS_SQL_TEMPLATE = """
WITH bursts AS ({bursts})
SELECT x.entity_id AS entity_a, y.entity_id AS entity_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_days
FROM bursts x
JOIN bursts y ON x.day = y.day AND x.entity_id < y.entity_id
GROUP BY x.entity_id, y.entity_id
"""


def community_modularity(
    labels: ray.data.Dataset | pd.DataFrame,
    cooccurrence: ray.data.Dataset,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """NEWMAN MODULARITY of the label-propagation communities over the
    co-occurrence graph — the single number that says whether the inferred
    region partition actually concentrates edges inside communities
    (Q near 0: the labels explain nothing; the standard quality gate run
    after any community assignment). Computed on the LABELED-node induced
    subgraph (label propagation leaves distant nodes unlabeled; modularity
    needs a partition of the graph it scores).

    EXACT INTEGER core: with m the induced edge count, e_c the
    within-community edge count and d_c the community degree sum,
    Q = sum_c (e_c/m - (d_c/2m)^2) == ( sum_c (4m*e_c - d_c^2) ) / (4m^2)
    — the numerator is pure int64 (emitted per community as the audit
    column q_num_c) and the one float division is identical on both sides.

    Shape: two co-partitioned hash joins attach endpoint communities to
    edges (labels are never broadcast), integer partial counts fold in one
    community-keyed reduce, and the final Q is a community-count-bounded
    driver sum. Output per community: kb_region, n_nodes, e_in, d_sum,
    q_num_c (int64), modularity (float64 round 6, global — identical on
    every row)."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )
    from tcx2graph_jl_ray.functions.join import hash_join

    if isinstance(labels, pd.DataFrame):
        labels = ray.data.from_pandas(labels)
    lab = labels.map_batches(
        lambda b: pd.DataFrame({
            "entity_id": b["entity_id"].to_numpy(),
            "c": b["kb_region"].to_numpy(),
        }),
        batch_format="pandas",
    ).materialize()

    e_src = cooccurrence.select_columns(["src", "dst"]).map_batches(
        lambda b: b.rename(columns={"src": "entity_id"}),
        batch_format="pandas",
    )
    j1 = hash_join(
        e_src,
        lab.map_batches(lambda b: b.rename(columns={"c": "c_src"}),
                        batch_format="pandas"),
        on="entity_id", n_buckets=n_buckets,
    ).map_batches(
        lambda b: b.rename(columns={"entity_id": "src",
                                    "dst": "entity_id"}),
        batch_format="pandas",
    )
    j2 = hash_join(
        j1,
        lab.map_batches(lambda b: b.rename(columns={"c": "c_dst"}),
                        batch_format="pandas"),
        on="entity_id", n_buckets=n_buckets,
    )

    def edge_partials(batch: pd.DataFrame) -> pd.DataFrame:
        # per edge: one m row; e_in if same community; one degree
        # endpoint row per side
        frames = [
            pd.DataFrame({
                "c": batch["c_src"].to_numpy(), "kind": "d", "n": 1
            }),
            pd.DataFrame({
                "c": batch["c_dst"].to_numpy(), "kind": "d", "n": 1
            }),
        ]
        same = batch[batch["c_src"] == batch["c_dst"]]
        frames.append(pd.DataFrame({
            "c": same["c_src"].to_numpy(), "kind": "e", "n": 1
        }))
        out = pd.concat(frames, ignore_index=True)
        g = out.groupby(["c", "kind"], sort=False)["n"].sum()
        return g.astype("int64").reset_index()

    parts = j2.map_batches(edge_partials, batch_format="pandas",
                           batch_size=65536)
    resum = lambda b: (  # noqa: E731
        b.groupby(["c", "kind"], sort=False)["n"].sum().astype("int64")
        .reset_index()
    )
    counts = salted_group_apply(
        parts, ["c", "kind"], partial_fn=resum, merge_fn=resum
    ).to_pandas()  # community-count bounded

    n_nodes = salted_group_apply(
        lab, ["c"],
        partial_fn=lambda b: b.groupby("c", sort=False).size()
        .astype("int64").reset_index(name="n_nodes"),
        merge_fn=lambda b: b.groupby("c", sort=False)["n_nodes"].sum()
        .astype("int64").reset_index(),
    ).to_pandas()

    piv = counts.pivot_table(index="c", columns="kind", values="n",
                             aggfunc="sum", fill_value=0)
    d_sum = piv["d"] if "d" in piv else pd.Series(0, index=piv.index)
    e_in = piv["e"] if "e" in piv else pd.Series(0, index=piv.index)
    table = n_nodes.set_index("c").join(
        pd.DataFrame({"d_sum": d_sum, "e_in": e_in}), how="left"
    ).fillna(0).reset_index()
    m = int(table["d_sum"].sum()) // 2
    d = table["d_sum"].astype("int64").to_numpy()
    e = table["e_in"].astype("int64").to_numpy()
    q_num = 4 * m * e - d * d
    q = float(np.round(int(q_num.sum()) / (4 * m * m), 6)) if m else 0.0
    out = pd.DataFrame({
        "kb_region": table["c"].to_numpy(),
        "n_nodes": table["n_nodes"].astype("int64").to_numpy(),
        "e_in": e,
        "d_sum": d,
        "q_num_c": q_num.astype("int64"),
        "modularity": q,
    })
    return ray.data.from_pandas(out)


def community_modularity_sql(labels_sql: str, cooccurrence_sql: str) -> str:
    return f"""
WITH qmod_lab AS MATERIALIZED (
  SELECT entity_id, kb_region AS c FROM ({labels_sql})
),
qmod_e AS MATERIALIZED ({cooccurrence_sql}),
qmod_je AS (
  SELECT ls.c AS c_src, ld.c AS c_dst
  FROM qmod_e e
  JOIN qmod_lab ls ON ls.entity_id = e.src
  JOIN qmod_lab ld ON ld.entity_id = e.dst
),
qmod_deg AS (
  SELECT c, CAST(SUM(n) AS BIGINT) AS d_sum FROM (
    SELECT c_src AS c, COUNT(*) AS n FROM qmod_je GROUP BY c_src
    UNION ALL
    SELECT c_dst AS c, COUNT(*) AS n FROM qmod_je GROUP BY c_dst
  ) GROUP BY c
),
qmod_ein AS (
  SELECT c_src AS c, CAST(COUNT(*) AS BIGINT) AS e_in
  FROM qmod_je WHERE c_src = c_dst GROUP BY c_src
),
qmod_nn AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM qmod_lab GROUP BY c),
qmod_m AS (SELECT CAST(SUM(d_sum) // 2 AS BIGINT) AS m FROM qmod_deg),
qmod_t AS (
  SELECT nn.c, nn.n_nodes,
         COALESCE(ein.e_in, 0) AS e_in,
         COALESCE(deg.d_sum, 0) AS d_sum,
         CAST(4 * m.m * COALESCE(ein.e_in, 0)
              - COALESCE(deg.d_sum, 0) * COALESCE(deg.d_sum, 0)
              AS BIGINT) AS q_num_c,
         m.m AS mm
  FROM qmod_nn nn LEFT JOIN qmod_deg deg ON deg.c = nn.c
          LEFT JOIN qmod_ein ein ON ein.c = nn.c, qmod_m m
)
SELECT c AS kb_region, n_nodes, CAST(e_in AS BIGINT) AS e_in,
       CAST(d_sum AS BIGINT) AS d_sum, q_num_c,
       CASE WHEN ANY_VALUE(mm) OVER () > 0
            THEN ROUND(CAST(SUM(q_num_c) OVER () AS DOUBLE)
                 / CAST(4 * (ANY_VALUE(mm) OVER ())
                        * (ANY_VALUE(mm) OVER ()) AS DOUBLE), 6)
            ELSE 0.0 END AS modularity
FROM qmod_t
"""
