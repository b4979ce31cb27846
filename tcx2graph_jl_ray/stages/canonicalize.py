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

import numpy as np
import pandas as pd
import ray
import ray.data
from tcx2graph_jl_ray.config import DEFAULT_CONFIG, PipelineConfig


def distinct_surfaces(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """Mentions -> one row per normalized surface with usage stats.

    Pre-aggregation before the wide steps (combiner pattern): the mention
    stream is reduced by a salted two-level groupby(norm) — a whale surface
    (one norm carrying a large share of all mentions) splits its partial
    rows across salt tasks instead of sinking one worker.
    Output: norm, n_turns, n_mentions.
    """
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

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
    # merge is an idempotent algebraic re-sum, so it serves as both the
    # salt-level partial and the final merge
    return salted_group_apply(
        partials, ["norm"], partial_fn=merge, merge_fn=merge
    )


def _explode_tokens(batch: pd.DataFrame) -> pd.DataFrame:
    toks = batch["norm"].str.split(" ")
    out = pd.DataFrame({"norm": batch["norm"], "token": toks}).explode("token")
    out = out[out["token"].astype(str).str.len() > 0]
    # one row per DISTINCT (norm, token): a token repeated inside a norm must
    # count once toward the block cap (matching _blocking_verify_local)
    return out.drop_duplicates(["norm", "token"]).reset_index(drop=True)


def candidate_pairs(
    surfaces: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    distinct: bool = True,
) -> ray.data.Dataset:
    """Token blocking: (token, norm) exploded rows -> per-token pairs.

    The per-token group is capped at ``config.max_block_size`` surfaces; hotter
    tokens are dropped as non-discriminative (they would generate O(n^2) pairs
    — the all-pairs blowup the reference avoids with its bbox prefilter,
    src/OverlappingSegmentsUtils.jl:126-137).

    Tokens shuffle through ``bucketed_group_apply`` (ONE hash-bucket shuffle
    for the whole vocabulary — Ray's native groupby costs ~1 ms per distinct
    group, which at a web-scale token vocabulary would dominate the stage);
    per-token pair generation inside a bucket is vectorized ``triu_indices``,
    the same shape as MinHash band blocking (dedup.py pairs_in_bucket).
    """
    cap = config.max_block_size

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in bucket.groupby("token", sort=False):
            norms = np.sort(g["norm"].unique())  # cap on distinct surfaces
            if len(norms) < 2 or len(norms) > cap:
                continue
            ii, jj = np.triu_indices(len(norms), k=1)
            out_a.append(norms[ii])
            out_b.append(norms[jj])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object")})
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    exploded = surfaces.map_batches(_explode_tokens, batch_format="pandas")
    pairs = bucketed_group_apply(exploded, ["token"], pairs_in_bucket)
    if not distinct:
        # caller fuses the dedup into its own (a, b) shuffle (verify_pairs
        # dedup=True) — one pair-set exchange instead of two
        return pairs
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


def _verify_frame(batch: pd.DataFrame, thr: float) -> pd.DataFrame:
    """Vectorized containment filter over an (a, b) frame: both sides explode
    to distinct (pair, token) rows; the intersection size is one merge + size
    count and the containment falls out columnar — no per-pair Python set
    construction (``_containment`` remains as the semantics spec and the
    local-path implementation)."""
    if not len(batch):
        return batch
    batch = batch.reset_index(drop=True)
    idx = np.arange(len(batch))

    def side(col: str) -> pd.DataFrame:
        f = pd.DataFrame(
            {"i": idx, "tok": batch[col].str.split().to_numpy()}
        ).explode("tok")
        return f[f["tok"].notna()].drop_duplicates()

    fa, fb = side("a"), side("b")
    na = fa.groupby("i", sort=False).size()
    nb = fb.groupby("i", sort=False).size()
    inter = fa.merge(fb, on=["i", "tok"]).groupby("i", sort=False).size()
    denom = np.minimum(
        na.reindex(idx, fill_value=0).to_numpy(),
        nb.reindex(idx, fill_value=0).to_numpy(),
    ).astype("float64")
    num = inter.reindex(idx, fill_value=0).to_numpy().astype("float64")
    cont = np.divide(num, denom, out=np.zeros_like(num), where=denom > 0)
    return batch[cont >= thr]


def verify_pairs(
    pairs: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
    dedup: bool = False,
) -> ray.data.Dataset:
    """Keep pairs with token-set containment >= threshold (the pairwise
    similarity verify, analogue of discrete Fréchet <= tol_m,
    src/Utils.jl:256-276).

    ``dedup=True`` fuses the distinct-pair step into this stage's own (a, b)
    shuffle (drop duplicates, then verify, inside one bucket apply) — pass
    ``candidate_pairs(..., distinct=False)`` output and the pair set crosses
    the wire once instead of twice.
    """
    thr = config.verify_containment

    if dedup:
        from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

        return bucketed_group_apply(
            pairs,
            ["a", "b"],
            lambda b: _verify_frame(b.drop_duplicates(["a", "b"]), thr),
        )

    return pairs.map_batches(
        lambda b: _verify_frame(b, thr), batch_format="pandas",
        batch_size=16384,
    )


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
    as_dataset: bool = False,
):
    """Connected components -> DataFrame[node, label] (or a Dataset of the
    same shape when ``as_dataset`` — the no-driver-materialization path used
    above ``broadcast_map_budget``).

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
        local = _components_local(nodes, edges)
        return ray.data.from_pandas(local) if as_dataset else local

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

    # Every round runs as bucketed_group_apply(key) with VECTORIZED per-node
    # pandas logic inside each hash bucket — one Ray group per bucket, never
    # one per node (the ~1 ms/distinct-group Ray cost this repo measured;
    # at millions of surfaces a per-node groupby would dominate every round).
    # Rows a node emits for its neighbors may land in other buckets — the
    # next round's shuffle re-keys them, exactly as the per-node groupby did.

    def propagate_bucket(b: pd.DataFrame) -> pd.DataFrame:
        # Factorize the bucket's name domain ONCE (sort=True -> codes are
        # order-preserving, so integer min == lexicographic-min name) and do
        # every grouped min/max on int64 codes: pandas min-aggregation over
        # object strings is ~35x slower and was the dominant per-round cost.
        kinds = b["kind"].to_numpy()
        n = len(b)
        codes, uniq = pd.factorize(
            pd.concat([b["key"], b["val"]], ignore_index=True), sort=True
        )
        k, v = codes[:n], codes[n:]
        self_m = kinds == _SELF
        edge_m = kinds == _EDGE
        cand_m = kinds == _CAND
        # min over SELF + received CANDs (self ⊆ non-edge, so this IS the min)
        new_label = pd.Series(v[~edge_m]).groupby(k[~edge_m]).min()
        self_label = pd.Series(v[self_m]).groupby(k[self_m]).min()
        changed = (
            (new_label < self_label.reindex(new_label.index))
            .astype("int64")
            .to_numpy()
        )
        # Convergence flag = changed OR edge-mismatch: a received candidate
        # LARGER than the node's label means a neighbor still disagreed last
        # round, so convergence is unproven. When every node reports
        # flag == 0, all candidates equaled every node's label AND nothing
        # moved — a label-consistent fixpoint of min-propagation, which is
        # provably the component minima (labels only take member names and
        # only decrease) — so ONE clean round ends the loop, replacing the
        # two-consecutive-zero-rounds proof (one full round cheaper).
        if cand_m.any():
            cand_max = pd.Series(v[cand_m]).groupby(k[cand_m]).max()
            mismatch = (
                (cand_max.reindex(new_label.index) > new_label)
                .fillna(False)
                .astype("int64")
                .to_numpy()
            )
            changed = np.maximum(changed, mismatch)
        nl_key = new_label.index.to_numpy()       # key codes
        nl_val = new_label.to_numpy()             # label codes
        key_names = uniq[nl_key]
        label_names = uniq[nl_val]
        self_out = pd.DataFrame(
            {"key": key_names, "kind": _SELF, "val": label_names,
             "aux": None, "changed": changed}
        )
        # EDGE rows are re-emitted keyed at each neighbor with THIS node as
        # the value — (key=neighbor, val=key) — reconstructing the symmetric
        # adjacency for the next round. (Emitting val=neighbor instead turns
        # every edge into a self-loop after round 1 and silently freezes
        # label propagation — found by review, regression-tested below.)
        ek, ev = k[edge_m], v[edge_m]
        lut = np.full(len(uniq), -1, dtype=np.int64)  # key code -> label code
        lut[nl_key] = nl_val
        edge_out = pd.DataFrame(
            {"key": uniq[ev], "kind": _EDGE, "val": uniq[ek],
             "aux": None, "changed": 0}
        )
        cand_out = pd.DataFrame(
            {"key": uniq[ev], "kind": _CAND, "val": uniq[lut[ek]],
             "aux": None, "changed": 0}
        )
        # The pointer-jump QUERY is emitted HERE (key = the node's new
        # label, i.e. the holder to ask): propagate already knows the
        # post-round label, so a separate jump_send shuffle is pure fixed
        # cost — fusing it cuts each macro round from 3 shuffles to 2.
        query_out = pd.DataFrame(
            {"key": label_names, "kind": _QUERY, "val": key_names,
             "aux": label_names, "changed": changed}
        )
        return pd.concat(
            [self_out, edge_out, cand_out, query_out], ignore_index=True
        )

    # pointer jumping (label(x) <- label(label(x))): halves pointer-chain
    # depth per jump so chain-shaped components converge in O(log d) macro
    # rounds instead of O(d) (the BTS-style acceleration, PAPERS.md). The
    # query was routed by propagate itself (key = the node's label-holder);
    # here the holder answers with ITS label, dropping the stale SELF rows —
    # each node's new SELF row is emitted exactly once, by its label's group.
    # The query carries the node's propagate flag so one column sum after
    # this stage counts the whole macro round.
    def jump_answer_bucket(b: pd.DataFrame) -> pd.DataFrame:
        kinds = b["kind"]
        self_rows = b[kinds == _SELF]
        # propagate emits exactly one SELF per key; sort+dedup keeps the min
        # defensively without an object-dtype grouped min
        lab = (
            self_rows.sort_values("val", kind="mergesort")
            .drop_duplicates("key")
            .set_index("key")["val"]
        )
        queries = b[kinds == _QUERY]
        passthrough = b[(kinds != _SELF) & (kinds != _QUERY)]
        label_here = queries["key"].map(lab)
        answered = pd.DataFrame(
            {
                "key": queries["val"].to_numpy(),        # the querying node
                "kind": _SELF,
                "val": label_here.to_numpy(),            # label(label(x))
                "aux": None,
                # combined per-round change: propagate's bit OR the jump's
                "changed": np.maximum(
                    queries["changed"].to_numpy(dtype="int64"),
                    (label_here < queries["aux"]).astype("int64").to_numpy(),
                ),
            }
        )
        return pd.concat([passthrough, answered], ignore_index=True)

    # One macro round = 2 bucketed shuffles chained (propagate-with-query,
    # jump-answer), ONE materialize, ONE native sum("changed") (non-SELF
    # rows carry changed=0 and the jump answer ORs in the propagate flag, so
    # a plain column sum IS the combined round count). Per-round wall time
    # is dominated by fixed stage-launch cost, so minimizing stages per
    # round matters more than per-row work here. The loop stops after the
    # FIRST all-clean round — the flag includes the edge-consistency
    # mismatch check (see propagate_bucket), which proves the fixpoint
    # without a second confirmation round.
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    for _ in range(config.union_find_max_rounds):
        working = bucketed_group_apply(
            bucketed_group_apply(working, ["key"], propagate_bucket),
            ["key"],
            jump_answer_bucket,
        ).materialize()
        if not int(working.sum("changed") or 0):
            break

    labels_ds = working.map_batches(
        lambda b: b.loc[b["kind"] == _SELF, ["key", "val"]].rename(
            columns={"key": "node", "val": "label"}
        ),
        batch_format="pandas",
    )
    if as_dataset:
        # every node's SELF row is emitted exactly once per round -> unique
        return labels_ds
    labels = labels_ds.to_pandas()
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
    canonical map: DataFrame[norm, entity_id] up to
    ``config.broadcast_map_budget`` distinct surfaces (for ray.put broadcast
    application), a **Dataset** of the same shape above it — downstream
    ``rewrite_triples`` / ``attach_entities`` switch to a distributed hash
    join on norm for the Dataset form, so no stage ever materializes or
    broadcasts a web-scale surface vocabulary on the driver.

    The mention stream is always reduced distributedly (distinct_surfaces);
    blocking/verify/components run driver-side below small_graph_threshold
    (identical semantics) and distributed above it.
    """
    surfaces = distinct_surfaces(mentions).materialize()
    n_nodes = surfaces.count()
    if n_nodes <= config.small_graph_threshold:
        stats = surfaces.to_pandas()  # small by the threshold's definition
        norms = stats["norm"].tolist()
        edges = _blocking_verify_local(norms, config)
        labels = _components_local(norms, edges)
    else:
        pairs = candidate_pairs(surfaces, config, distinct=False)
        verified = verify_pairs(pairs, config, dedup=True)
        if n_nodes > config.broadcast_map_budget:
            # web-scale branch: BOTH outputs stay Datasets — the entity
            # table flows to a partitioned resumable sink downstream
            # (pipelines/kg.py) and the canonical map applies via a
            # distributed hash join; the driver holds neither
            labels_ds = connected_components(
                surfaces, verified, config, as_dataset=True
            ).materialize()
            entities = _entities_distributed(
                surfaces, labels_ds, config, as_dataset=True
            )
            canonical_map = labels_ds.map_batches(
                lambda b: b.rename(columns={"node": "norm", "label": "entity_id"}),
                batch_format="pandas",
            )
            return entities, canonical_map
        stats = surfaces.to_pandas()  # bounded by broadcast_map_budget
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


def _entities_distributed(
    surfaces: ray.data.Dataset,
    labels_ds: ray.data.Dataset,
    config: PipelineConfig,
    as_dataset: bool = False,
) -> pd.DataFrame | ray.data.Dataset:
    """Entity aggregation without a driver-side surface table: surfaces
    ⟕ labels via the native hash join on norm, then a bucketed per-entity
    aggregate. With ``as_dataset`` the aggregate STAYS a Dataset (the
    web-scale form: the entity table flows straight to a partitioned
    resumable sink, never touching the driver); otherwise only the final
    entity vocabulary (orders of magnitude smaller than the surface table)
    is collected."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    from tcx2graph_jl_ray.functions.join import hash_join

    lab = labels_ds.map_batches(
        lambda b: b.rename(columns={"node": "norm", "label": "__label"}),
        batch_format="pandas",
    )
    # the repo's co-partitioned bucketed hash_join, not Ray's native join:
    # the native join's shuffle-aggregator ACTORS reserve CPUs up front and
    # deadlock against concurrently executing datasets at low CPU counts
    # (observed in run_kg_pipeline); the bucketed join is plain tasks
    joined = hash_join(
        surfaces, lab, on="norm", how="left",
        n_buckets=config.join_num_partitions,
    )

    def agg(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("__label", sort=False).agg(
            n_surfaces=("norm", "nunique"),
            n_turns=("n_turns", "sum"),
            n_mentions=("n_mentions", "sum"),
        )
        return g.reset_index().rename(columns={"__label": "entity_id"})

    # pre-fill the join key before bucketing so unlabeled surfaces group
    # under their own norm
    filled = joined.map_batches(
        lambda b: b.assign(__label=b["__label"].fillna(b["norm"])),
        batch_format="pandas",
    )
    agged = bucketed_group_apply(filled, ["__label"], agg)
    if as_dataset:
        def cast(b: pd.DataFrame) -> pd.DataFrame:
            for c in ("n_surfaces", "n_turns", "n_mentions"):
                b[c] = b[c].astype("int64")
            return b[["entity_id", "n_surfaces", "n_turns", "n_mentions"]]

        return agged.map_batches(cast, batch_format="pandas")
    entities = agged.to_pandas().sort_values("entity_id").reset_index(drop=True)
    for c in ("n_surfaces", "n_turns", "n_mentions"):
        entities[c] = entities[c].astype("int64")
    return entities[["entity_id", "n_surfaces", "n_turns", "n_mentions"]]


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


def apply_map_join(
    ds: ray.data.Dataset,
    canonical_map: ray.data.Dataset,
    cols: list[str],
    config: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Rewrite each surface column in ``cols`` to its canonical entity id via
    a distributed hash join on the normalized surface — the large-map path
    (one shuffle per rewritten column, no driver dict, no broadcast). Unmatched
    surfaces keep their original value. Joins run through the repo's
    co-partitioned bucketed ``hash_join`` (plain tasks) rather than Ray's
    native join, whose up-front actor reservation deadlocks against
    concurrently executing datasets at low CPU counts."""
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.stages.extract import _norm_series

    lab = canonical_map.map_batches(
        lambda b: pd.DataFrame(
            {"__join_norm": b["norm"], "__label": b["entity_id"]}
        ),
        batch_format="pandas",
    ).materialize()  # tiny vs the fact stream; reused once per rewritten col
    for col in cols:
        keyed = ds.map_batches(
            lambda b, c=col: b.assign(__join_norm=_norm_series(b[c])),
            batch_format="pandas",
        )
        joined = hash_join(
            keyed, lab, on="__join_norm", how="left",
            n_buckets=config.join_num_partitions,
        )

        def resolve(b: pd.DataFrame, c=col) -> pd.DataFrame:
            b = b.copy()
            b[c] = b["__label"].fillna(b[c]).astype("object")
            b = b.drop(columns=["__join_norm", "__label"])
            # the join's union-schema conformance widens ints to pandas
            # nullable dtypes; a LEFT join emits only left rows, so those
            # columns are null-free — restore plain numpy ints for clean
            # Arrow schemas at the sinks
            for cc in b.columns:
                dt = b[cc].dtype
                if isinstance(dt, pd.Int64Dtype | pd.Int32Dtype):
                    b[cc] = b[cc].astype(str(dt).lower())
            return b

        ds = joined.map_batches(resolve, batch_format="pandas")
    return ds


def rewrite_triples(
    triples: ray.data.Dataset,
    canonical_map,
    concurrency=(1, 16),
    config: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Canonical-map application with a broadcast/join budget switch: a
    DataFrame map (≤ broadcast_map_budget by construction) is ray.put once and
    applied map-side; a Dataset map is applied with distributed hash joins."""
    if isinstance(canonical_map, ray.data.Dataset):
        return apply_map_join(triples, canonical_map, ["subj", "obj"], config)
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
