"""Entity canonicalization: blocking + pairwise verify + connected components.

Ray-Data recast of the reference's overlapping-segment merge
(src/OverlappingSegmentsUtils.jl:91-277), which finds the same physical
segment across many rides via (1) bbox/KD-tree candidate blocking (:126-154),
(2) windowed Fréchet verification within tolerance (:195-206), and (3) greedy
overlap dedup into canonical segments (:220-240). Here:

1. **blocking**  — token blocking over *distinct normalized surfaces*: each
   token of a surface is a block key; pairs are only generated inside a block
   (``groupby(token)``). Hot blocks (tokens shared by more surfaces than
   ``max_block_size``) are dropped — the skew cap, analogue of the reference
   bounding work with ``window_step`` / ``prefilter_margin_m`` (:95-99).
2. **verify**    — token-set containment ``|A∩B| / min(|A|,|B|) >= threshold``
   (the Fréchet-tolerance analogue, :97).
3. **components** — distributed min-label propagation over the verified match
   graph: one ``groupby(node)`` shuffle per round; each node keeps the min
   label seen and fans it out to neighbors; converges when no label changes.
   Production note: alias components have tiny diameter so plain propagation
   converges in 2-3 rounds; for adversarial chain-shaped graphs swap in
   pointer-jumping / BTS-style balanced trees (PAPERS.md).

Scale shape: everything here runs on the **distinct-surface table** — the
output of one mentions ``groupby(norm)`` — which is orders of magnitude
smaller than the mention stream itself; the resulting canonical map is then
broadcast (``ray.put``) back over mentions/triples instead of a second
all-to-all shuffle.
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data
from tcx2graph_jl_ray.config import DEFAULT_CONFIG, PipelineConfig


def distinct_surfaces(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """Mentions -> one row per normalized surface with usage stats.

    Pre-aggregation before the wide steps (combiner pattern): the mention
    stream is reduced by a single groupby(norm) shuffle.
    Output: norm, n_turns, n_mentions.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("norm", sort=False).agg(
            n_turns=("norm", "size"), n_mentions=("n_occurrences", "sum")
        )
        return g.reset_index()

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("norm", sort=False).agg(
            n_turns=("n_turns", "sum"), n_mentions=("n_mentions", "sum")
        ).reset_index()
        g["n_turns"] = g["n_turns"].astype("int64")
        g["n_mentions"] = g["n_mentions"].astype("int64")
        return g

    partials = mentions.select_columns(["norm", "n_occurrences"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    return bucketed_group_apply(partials, ["norm"], merge)


def _explode_tokens(batch: pd.DataFrame) -> pd.DataFrame:
    toks = batch["norm"].str.split(" ")
    out = pd.DataFrame({"norm": batch["norm"], "token": toks}).explode("token")
    out = out[out["token"].astype(str).str.len() > 0]
    # one row per DISTINCT (norm, token): a token repeated inside a norm must
    # count once toward the block cap (matching _blocking_verify_local)
    return out.drop_duplicates(["norm", "token"]).reset_index(drop=True)


def candidate_pairs(
    surfaces: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Token blocking: (token, norm) exploded rows -> per-token pairs.

    The per-token group is capped at ``config.max_block_size`` surfaces; hotter
    tokens are dropped as non-discriminative (they would generate O(n^2) pairs
    — the all-pairs blowup the reference avoids with its bbox prefilter,
    src/OverlappingSegmentsUtils.jl:126-137).
    """
    cap = config.max_block_size

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        n_distinct = g["norm"].nunique()  # cap on distinct surfaces, not rows
        if n_distinct < 2 or n_distinct > cap:
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object")})
        norms = sorted(g["norm"].unique())
        a, b = [], []
        for i in range(len(norms)):
            for j in range(i + 1, len(norms)):
                a.append(norms[i])
                b.append(norms[j])
        return pd.DataFrame({"a": a, "b": b})

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    exploded = surfaces.map_batches(_explode_tokens, batch_format="pandas")
    pairs = exploded.groupby("token").map_groups(pairs_in_block, batch_format="pandas")
    # distinct pairs (the same pair arises from every shared token) —
    # bucketed dedup, pair cardinality can be large
    return bucketed_group_apply(
        pairs, ["a", "b"], lambda b: b.drop_duplicates(["a", "b"])
    )


def _containment(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / min(len(sa), len(sb))


def verify_pairs(
    pairs: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Keep pairs with token-set containment >= threshold (the pairwise
    similarity verify, analogue of discrete Fréchet <= tol_m,
    src/Utils.jl:256-276)."""
    thr = config.verify_containment

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        keep = [
            _containment(a, b) >= thr
            for a, b in zip(batch["a"].to_numpy(), batch["b"].to_numpy())
        ]
        return batch[pd.Series(keep, index=batch.index)]

    return pairs.map_batches(verify, batch_format="pandas", batch_size=16384)


# row kinds in the label-propagation working set
_SELF, _EDGE, _CAND, _QUERY = 0, 1, 2, 3


def _components_local(nodes: list, edges: list[tuple]) -> pd.DataFrame:
    """Driver-side min-label propagation (identical semantics to the
    distributed rounds; used below ``small_graph_threshold``). Classic
    union-find with path compression; label = lexicographic-min member."""
    parent: dict = {n: n for n in nodes}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the lexicographically smaller root -> deterministic labels
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    labels = sorted((n, find(n)) for n in nodes)
    return pd.DataFrame(labels, columns=["node", "label"])


def connected_components(
    surfaces: ray.data.Dataset,
    verified: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> pd.DataFrame:
    """Connected components -> DataFrame[node, label].

    Two physical paths with identical results:

    - **small graphs** (distinct surfaces <= ``config.small_graph_threshold``):
      collect the node/edge lists (already reduced: these are distinct
      surfaces, not mentions) and run union-find on the driver — the per-round
      shuffle fixed cost dwarfs the work at this size (and the reference also
      merges driver-side, src/OverlappingSegmentsUtils.jl:212-277);
    - **large graphs**: distributed min-label propagation — working set =
      label rows + symmetric edge rows, reduced by ONE ``groupby(node)``
      shuffle per round, materialized per round. Deterministic: labels are
      lexicographic-min members either way.
    """
    n_nodes = surfaces.count()
    if n_nodes <= config.small_graph_threshold:
        nodes = surfaces.select_columns(["norm"]).to_pandas()["norm"].tolist()
        epdf = verified.select_columns(["a", "b"]).to_pandas()
        edges = list(zip(epdf["a"], epdf["b"]))
        return _components_local(nodes, edges)

    def to_rows(batch: pd.DataFrame) -> pd.DataFrame:
        key = pd.concat([batch["a"], batch["b"]], ignore_index=True)
        val = pd.concat([batch["b"], batch["a"]], ignore_index=True)
        # seed both the static EDGE rows and the round-0 CAND rows: a node's
        # initial label is its own name, so the first candidates a node
        # receives are exactly its neighbors' names — without this seed the
        # first round observes zero changes and converges prematurely.
        return pd.DataFrame(
            {
                "key": pd.concat([key, key], ignore_index=True),
                "kind": [_EDGE] * len(key) + [_CAND] * len(key),
                "val": pd.concat([val, val], ignore_index=True),
                "aux": None,
                "changed": 0,
            }
        )

    def init_labels(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": batch["norm"], "kind": _SELF, "val": batch["norm"],
             "aux": None, "changed": 0}
        )

    edge_rows = verified.map_batches(to_rows, batch_format="pandas")
    label_rows = surfaces.map_batches(init_labels, batch_format="pandas")
    working = label_rows.union(edge_rows).materialize()

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        vals = g["val"]
        kinds = g["kind"]
        self_label = vals[kinds == _SELF].min()
        cand_min = vals[kinds != _EDGE].min()  # self + received candidates
        new_label = min(self_label, cand_min)
        neighbors = vals[kinds == _EDGE]
        key = g["key"].iloc[0]
        # EDGE rows are re-emitted keyed at each neighbor with THIS node as
        # the value — (key=neighbor, val=key) — reconstructing the symmetric
        # adjacency for the next round. (Emitting val=neighbor instead turns
        # every edge into a self-loop after round 1 and silently freezes
        # label propagation — found by review, regression-tested below.)
        out_key = [key] + list(neighbors) + list(neighbors)
        out_kind = [_SELF] + [_EDGE] * len(neighbors) + [_CAND] * len(neighbors)
        out_val = [new_label] + [key] * len(neighbors) + [new_label] * len(neighbors)
        changed = [int(new_label < self_label)] + [0] * (2 * len(neighbors))
        return pd.DataFrame(
            {"key": out_key, "kind": out_kind, "val": out_val,
             "aux": None, "changed": changed}
        )

    # pointer jumping (label(x) <- label(label(x))): halves pointer-chain
    # depth per jump so chain-shaped components converge in O(log d) macro
    # rounds instead of O(d) (the BTS-style acceleration, PAPERS.md).
    # Two shuffles: J1 routes each node's query to its label-holder; J2 has
    # the holder answer with ITS label. Each node's new SELF row is emitted
    # exactly once — by its label's group.
    def jump_send(g: pd.DataFrame) -> pd.DataFrame:
        kinds = g["kind"]
        self_rows = g[kinds == _SELF]
        label = self_rows["val"].min()
        node = g["key"].iloc[0]
        passthrough = g[kinds != _SELF]
        query = pd.DataFrame(
            {"key": [label], "kind": [_QUERY], "val": [node],
             "aux": [label], "changed": [0]}
        )
        keep_self = self_rows.head(1)  # the holder needs its own label in J2
        return pd.concat([keep_self, passthrough, query], ignore_index=True)

    def jump_answer(g: pd.DataFrame) -> pd.DataFrame:
        kinds = g["kind"]
        label_here = g.loc[kinds == _SELF, "val"].min()
        queries = g[kinds == _QUERY]
        passthrough = g[(kinds != _SELF) & (kinds != _QUERY)]
        answered = pd.DataFrame(
            {
                "key": queries["val"].to_numpy(),       # the querying node
                "kind": _SELF,
                "val": label_here,                       # label(label(x))
                "aux": None,
                "changed": (label_here < queries["aux"]).astype(int).to_numpy(),
            }
        )
        return pd.concat([passthrough, answered], ignore_index=True)

    def _count_changed(ds: ray.data.Dataset) -> int:
        return int(
            ds.map_batches(
                lambda b: pd.DataFrame(
                    {"c": [int(b.loc[b["kind"] == _SELF, "changed"].sum())]}
                ),
                batch_format="pandas",
            ).sum("c")
            or 0
        )

    # Convergence needs TWO consecutive all-zero macro rounds: the CAND rows
    # a propagate consumes were fanned out in the PREVIOUS round, so they can
    # be one jump stale — a single zero round can fire while adjacent nodes
    # still disagree (found by fuzzing vs union-find; regression-tested).
    # After a zero round the freshly emitted candidates ARE current, so a
    # second zero round proves a true fixpoint.
    zero_streak = 0
    for _ in range(config.union_find_max_rounds):
        working = (
            working.groupby("key").map_groups(propagate, batch_format="pandas")
            .materialize()
        )
        prop_changed = _count_changed(working)
        working = (
            working.groupby("key").map_groups(jump_send, batch_format="pandas")
            .groupby("key").map_groups(jump_answer, batch_format="pandas")
            .materialize()
        )
        jump_changed = _count_changed(working)
        if not prop_changed and not jump_changed:
            zero_streak += 1
            if zero_streak >= 2:
                break
        else:
            zero_streak = 0

    labels = working.map_batches(
        lambda b: b.loc[b["kind"] == _SELF, ["key", "val"]].rename(
            columns={"key": "node", "val": "label"}
        ),
        batch_format="pandas",
    ).to_pandas()
    # every node's SELF row is emitted exactly once per round -> node unique
    return labels.sort_values("node").reset_index(drop=True)


def _blocking_verify_local(
    norms: list[str], config: PipelineConfig
) -> list[tuple]:
    """Driver-side token blocking + containment verify for small distinct-
    surface tables — byte-identical pair semantics to the distributed path
    (same cap, same threshold), skipping two Ray stage launches when the
    whole graph fits in one hand."""
    from collections import defaultdict

    blocks: dict[str, list[str]] = defaultdict(list)
    for n in sorted(set(norms)):
        for tok in set(n.split()):
            if tok:
                blocks[tok].append(n)
    pairs = set()
    for members in blocks.values():
        if len(members) < 2 or len(members) > config.max_block_size:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    thr = config.verify_containment
    return [(a, b) for a, b in sorted(pairs) if _containment(a, b) >= thr]


def canonicalize(
    mentions: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
):
    """Full canonicalization: mentions -> (entities DataFrame, canonical map).

    entities: entity_id (canonical surface), n_surfaces, n_turns, n_mentions.
    canonical map: DataFrame[node(norm), label(canonical)] for broadcast joins.

    The mention stream is always reduced distributedly (distinct_surfaces);
    blocking/verify/components run driver-side below small_graph_threshold
    (identical semantics) and distributed above it.
    """
    surfaces = distinct_surfaces(mentions).materialize()
    stats = surfaces.to_pandas()  # distinct-surface stats: small, reused below
    if surfaces.count() <= config.small_graph_threshold:
        norms = stats["norm"].tolist()
        edges = _blocking_verify_local(norms, config)
        labels = _components_local(norms, edges)
    else:
        pairs = candidate_pairs(surfaces, config)
        verified = verify_pairs(pairs, config)
        labels = connected_components(surfaces, verified, config)

    merged = stats.merge(labels, left_on="norm", right_on="node", how="left")
    merged["label"] = merged["label"].fillna(merged["norm"])
    entities = (
        merged.groupby("label")
        .agg(
            n_surfaces=("norm", "nunique"),
            n_turns=("n_turns", "sum"),
            n_mentions=("n_mentions", "sum"),
        )
        .reset_index()
        .rename(columns={"label": "entity_id"})
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    entities["n_turns"] = entities["n_turns"].astype("int64")
    entities["n_mentions"] = entities["n_mentions"].astype("int64")
    entities["n_surfaces"] = entities["n_surfaces"].astype("int64")
    canonical_map = labels.rename(columns={"node": "norm", "label": "entity_id"})
    return entities, canonical_map


class _RewriteTriples:
    """Broadcast-join stage: rewrite triple subj/obj surfaces to canonical
    entity ids (the J1 hash join of runs to canonical segments,
    src/SegmentRuns.jl:21-38 — done broadcast-side because the canonical map
    is small relative to the triple stream)."""

    def __init__(self, map_ref):
        cm = ray.get(map_ref)
        self.lookup = dict(zip(cm["norm"], cm["entity_id"]))

    def _rewrite(self, col: pd.Series) -> pd.Series:
        # vectorized: normalize the whole column, dict-map, identity fallback
        from tcx2graph_jl_ray.stages.extract import _norm_series

        return _norm_series(col).map(self.lookup).fillna(col).astype("object")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["subj"] = self._rewrite(batch["subj"])
        batch["obj"] = self._rewrite(batch["obj"])
        return batch


def rewrite_triples(
    triples: ray.data.Dataset, canonical_map: pd.DataFrame, concurrency=(1, 16)
) -> ray.data.Dataset:
    map_ref = ray.put(canonical_map)
    return triples.map_batches(
        _RewriteTriples,
        fn_constructor_args=(map_ref,),
        batch_format="pandas",
        batch_size=16384,
        concurrency=concurrency,
    )


# --- Oracles -----------------------------------------------------------------
# Ground truth for the planted corpus: alias surfaces of the same nation all
# contain that nation's number, so components == groups of norms sharing the
# embedded integer, and the canonical id is the lexicographic-min norm.

ENTITIES_SQL_TEMPLATE = r"""
WITH m AS ({mentions}),
stats AS (
  SELECT norm, COUNT(*) AS n_turns, SUM(n_occurrences) AS n_mentions
  FROM m GROUP BY norm
),
gk AS (
  SELECT norm, n_turns, n_mentions, regexp_extract(norm, '[0-9]+') AS g
  FROM stats
),
lab AS (
  SELECT norm, n_turns, n_mentions, MIN(norm) OVER (PARTITION BY g) AS entity_id
  FROM gk
)
SELECT entity_id,
       CAST(COUNT(DISTINCT norm) AS BIGINT) AS n_surfaces,
       CAST(SUM(n_turns) AS BIGINT) AS n_turns,
       CAST(SUM(n_mentions) AS BIGINT) AS n_mentions
FROM lab GROUP BY entity_id
"""

CANONICAL_TRIPLES_SQL_TEMPLATE = r"""
WITH tr AS ({triples}),
m AS ({mentions}),
mn AS (SELECT DISTINCT norm FROM m),
lab AS (
  SELECT norm, MIN(norm) OVER (PARTITION BY regexp_extract(norm, '[0-9]+')) AS entity_id
  FROM mn
)
SELECT tr.conv_id, tr.turn_idx,
  COALESCE(ls.entity_id, tr.subj) AS subj,
  tr.pred AS pred,
  COALESCE(lo.entity_id, tr.obj) AS obj
FROM tr
LEFT JOIN lab ls ON trim(regexp_replace(lower(tr.subj), '[^a-z0-9]+', ' ', 'g')) = ls.norm
LEFT JOIN lab lo ON trim(regexp_replace(lower(tr.obj), '[^a-z0-9]+', ' ', 'g')) = lo.norm
"""
