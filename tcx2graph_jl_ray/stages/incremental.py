"""Incremental entity canonicalization (incremental ER): fold a NEW shard
of mentions into an existing canonicalization state and get results
BIT-IDENTICAL to re-running the batch canonicalizer over everything — the
maintenance mode a 10^12-turn KG actually runs in (reprocessing the corpus
per arriving shard is the one thing a web-scale pipeline cannot do; the
reference's per-file accumulation loop, src/TCX2Graph.jl ingest, is the
single-node ancestor of this).

Exactness argument (the part that is NOT obvious): the batch candidate set
is the union over QUALIFYING tokens (block size <= max_block_size) of each
token block's pairs. A new surface can push a token's block over the cap —
silently invalidating pairs that token contributed earlier — or create a
new qualifying block. A stored flat pair set cannot be maintained exactly
(a pair may be contributed by several tokens; dropping one token must not
drop the pair). So state keeps, per pair, the NUMBER OF QUALIFYING TOKENS
currently contributing it: delta = (- old dirty-token contributions)
+ (new dirty-token contributions), where dirty tokens are exactly the
tokens of genuinely new surfaces (an existing surface re-observed changes
stats, never blocking). A pair is a live candidate iff its count > 0 —
provably equal to the batch union at every step. Verify verdicts are
deterministic per pair, so they are cached and never recomputed.

State (all Datasets — nothing driver-bounded by corpus size):
  surfaces     (norm, n_turns, n_mentions)   exact additive stats
  token_index  (norm, token)                 distinct per surface
  pair_counts  (a, b, n_tokens)              live candidates have n > 0
  checked      (a, b, ok)                    cached verify verdicts
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from tcx2graph_jl_ray.config import DEFAULT_CONFIG, PipelineConfig
from tcx2graph_jl_ray.stages.canonicalize import (
    _explode_tokens,
    connected_components,
    distinct_surfaces,
    verify_pairs,
)


def _pairs_with_counts(
    exploded: ray.data.Dataset, config: PipelineConfig
) -> ray.data.Dataset:
    """(norm, token) rows -> (a, b, n_tokens): per qualifying token block
    the vectorized triu pairs, counted per pair across tokens (the same
    blocking rule as ``canonicalize.candidate_pairs``, counting instead of
    deduplicating)."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )

    cap = config.max_block_size

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in bucket.groupby("token", sort=False):
            norms = np.sort(g["norm"].unique())
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

    pairs = bucketed_group_apply(exploded, ["token"], pairs_in_bucket)
    return salted_group_apply(
        pairs, ["a", "b"],
        partial_fn=lambda b: b.groupby(["a", "b"], sort=False).size()
        .astype("int64").reset_index(name="n_tokens"),
        merge_fn=lambda b: b.groupby(["a", "b"], sort=False)["n_tokens"]
        .sum().astype("int64").reset_index(),
    )


def _typed_pairs(ds: ray.data.Dataset, with_counts: bool) -> ray.data.Dataset:
    """Zero-pair grouped outputs lose every block (and with them the
    schema), which breaks downstream joins/unions — substitute a TYPED
    empty Dataset (the repo's empty-frame discipline, see stages/text.py)."""
    if ds.count() > 0:
        return ds
    cols = {"a": pd.Series(dtype="object"), "b": pd.Series(dtype="object")}
    if with_counts:
        cols["n_tokens"] = pd.Series(dtype="int64")
    return ray.data.from_pandas(pd.DataFrame(cols))


def _typed_checked_empty() -> ray.data.Dataset:
    return ray.data.from_pandas(pd.DataFrame({
        "a": pd.Series(dtype="object"),
        "b": pd.Series(dtype="object"),
        "ok": pd.Series(dtype="bool"),
    }))


def _flag_checked(
    pairs: ray.data.Dataset, config: PipelineConfig
) -> ray.data.Dataset:
    """Verify a distinct (a, b) pair Dataset and return it with the verdict
    as an ``ok`` column (kept for BOTH outcomes — rejections are cached so a
    pair is never re-verified). Empty verify output (schema-less in Ray) is
    branched around rather than joined."""
    from tcx2graph_jl_ray.functions.join import hash_join

    ok = verify_pairs(pairs, config).materialize()
    if ok.count() == 0:
        return pairs.map_batches(
            lambda b: b.assign(ok=False), batch_format="pandas"
        )
    okm = ok.map_batches(
        lambda b: b[["a", "b"]].assign(__okhit=np.int64(1)),
        batch_format="pandas",
    )
    return hash_join(pairs, okm, on=["a", "b"], how="left").map_batches(
        lambda b: b.assign(ok=b["__okhit"].notna()).drop(
            columns=["__okhit"]
        ),
        batch_format="pandas",
    )


def _anti_join(
    left: ray.data.Dataset, right: ray.data.Dataset, on: list[str],
) -> ray.data.Dataset:
    """Rows of ``left`` whose key is absent from ``right`` (both Datasets)."""
    from tcx2graph_jl_ray.functions.join import hash_join

    if right.count() == 0:
        return left
    marker = right.map_batches(
        lambda b: b[on].drop_duplicates().assign(__hit=np.int64(1)),
        batch_format="pandas",
    )
    joined = hash_join(left, marker, on=on, how="left")
    return joined.map_batches(
        lambda b: b[b["__hit"].isna()].drop(columns=["__hit"]),
        batch_format="pandas",
    )


def _merge_surface_stats(
    a: ray.data.Dataset, b: ray.data.Dataset
) -> ray.data.Dataset:
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    both = a.union(b)
    resum = lambda x: x.groupby("norm", sort=False).agg(  # noqa: E731
        n_turns=("n_turns", "sum"), n_mentions=("n_mentions", "sum")
    ).reset_index().astype({"n_turns": "int64", "n_mentions": "int64"})
    return salted_group_apply(both, ["norm"], partial_fn=resum,
                              merge_fn=resum)


def canonicalize_init(
    mentions: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> dict:
    """Batch-build the incremental state from the first shard."""
    surfaces = distinct_surfaces(mentions).materialize()
    token_index = surfaces.map_batches(
        _explode_tokens, batch_format="pandas"
    ).select_columns(["norm", "token"]).materialize()
    pair_counts = _typed_pairs(
        _pairs_with_counts(token_index, config).materialize(),
        with_counts=True,
    )
    if pair_counts.count() == 0:
        checked = _typed_checked_empty()
    else:
        live = pair_counts.select_columns(["a", "b"])
        checked = _flag_checked(live, config).materialize()
    return {
        "surfaces": surfaces,
        "token_index": token_index,
        "pair_counts": pair_counts,
        "checked": checked,
    }


def canonicalize_delta(
    state: dict,
    new_mentions: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    """Fold one new shard of mentions into ``state`` — O(dirty blocks), not
    O(corpus)."""
    from tcx2graph_jl_ray.functions.join import hash_join

    s_b = distinct_surfaces(new_mentions).materialize()
    surfaces = _merge_surface_stats(state["surfaces"], s_b).materialize()
    new_norms = _anti_join(
        s_b.select_columns(["norm"]), state["surfaces"], on=["norm"]
    ).materialize()
    if new_norms.count() == 0:
        return {**state, "surfaces": surfaces}

    new_tok = new_norms.map_batches(
        _explode_tokens, batch_format="pandas"
    ).select_columns(["norm", "token"]).materialize()
    dirty = new_tok.map_batches(
        lambda b: b[["token"]].drop_duplicates(), batch_format="pandas"
    )
    # semi-join: the old index rows living in dirty blocks only
    dmark = dirty.map_batches(
        lambda b: b.drop_duplicates().assign(__d=np.int64(1)),
        batch_format="pandas",
    )
    old_dirty = hash_join(
        state["token_index"], dmark, on=["token"], how="left"
    ).map_batches(
        lambda b: b[b["__d"].notna()][["norm", "token"]],
        batch_format="pandas",
    ).materialize()

    p_old = _typed_pairs(
        _pairs_with_counts(old_dirty, config).materialize(), with_counts=True
    ).map_batches(
        lambda b: b.assign(n_tokens=-b["n_tokens"].astype("int64")),
        batch_format="pandas",
    )
    p_new = _typed_pairs(
        _pairs_with_counts(old_dirty.union(new_tok), config).materialize(),
        with_counts=True,
    )

    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    resum = lambda x: (  # noqa: E731
        x.groupby(["a", "b"], sort=False)["n_tokens"].sum().astype("int64")
        .reset_index()
    )
    pair_counts = _typed_pairs(
        salted_group_apply(
            state["pair_counts"].union(p_old).union(p_new), ["a", "b"],
            partial_fn=resum, merge_fn=resum,
        ).map_batches(
            lambda b: b[b["n_tokens"] > 0], batch_format="pandas"
        ).materialize(),
        with_counts=True,
    )

    to_check = _anti_join(
        pair_counts.select_columns(["a", "b"]), state["checked"],
        on=["a", "b"],
    ).materialize()
    if to_check.count() > 0:
        newly = _flag_checked(to_check, config)
        checked = state["checked"].union(newly).materialize()
    else:
        checked = state["checked"]

    return {
        "surfaces": surfaces,
        "token_index": state["token_index"].union(new_tok).materialize(),
        "pair_counts": pair_counts,
        "checked": checked,
    }


def entities_from_state(
    state: dict, config: PipelineConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Materialize the entity table from the live state — identical
    aggregation semantics to ``canonicalize.canonicalize`` (driver-side
    form; bounded by the surface vocabulary like the batch path below
    ``broadcast_map_budget``)."""
    from tcx2graph_jl_ray.functions.join import hash_join

    surfaces = state["surfaces"]
    passing = state["checked"].map_batches(
        lambda b: b[b["ok"]][["a", "b"]].assign(__ok=np.int64(1)),
        batch_format="pandas",
    ).materialize()
    if state["pair_counts"].count() == 0 or passing.count() == 0:
        labels = pd.DataFrame({"node": pd.Series(dtype="object"),
                               "label": pd.Series(dtype="object")})
    else:
        live_ok = hash_join(
            state["pair_counts"].select_columns(["a", "b"]),
            passing,
            on=["a", "b"], how="left",
        ).map_batches(
            lambda b: b[b["__ok"].notna()][["a", "b"]],
            batch_format="pandas",
        )
        labels = connected_components(surfaces, live_ok, config)
    stats = surfaces.to_pandas()
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
    for c in ("n_surfaces", "n_turns", "n_mentions"):
        entities[c] = entities[c].astype("int64")
    return entities


def entities_incremental(
    mentions: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Demo/driver entry: split the mention stream into two deterministic
    md5 shards (first hex of md5(conv_id) <= '7' ~ first shard), batch-init
    on shard 1, DELTA-fold shard 2, and emit the entity table — which must
    (and does: the oracle is the BATCH entities SQL) equal the one-shot
    batch canonicalization over all mentions."""
    from tcx2graph_jl_ray.functions.digest import md5_hex

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.asarray(
            md5_hex(batch["conv_id"].astype(str).to_numpy()), dtype="U32"
        ).astype("U1")
        return batch.assign(__shard=np.where(h <= "7", 0, 1))

    tagged = mentions.map_batches(tag, batch_format="pandas").materialize()
    a = tagged.map_batches(
        lambda x: x[x["__shard"] == 0].drop(columns=["__shard"]),
        batch_format="pandas",
    )
    b = tagged.map_batches(
        lambda x: x[x["__shard"] == 1].drop(columns=["__shard"]),
        batch_format="pandas",
    )
    state = canonicalize_init(a, config)
    state = canonicalize_delta(state, b, config)
    return entities_from_state(state, config)


# ---------------------------------------------------------------------------
# The same count-maintenance discipline, instantiated for MinHash-LSH dedup:
# blocking keys are signature BANDS instead of surface tokens (a doc's bands
# are a pure function of its own text, so the dirty keys of a delta are
# exactly the new docs' bands), and the verify is the true-Jaccard bucketed
# join against the docs table. Proves the incremental-ER primitive
# generalizes across the engine's blocking families.
# ---------------------------------------------------------------------------


def _band_pairs_with_counts(
    exploded: ray.data.Dataset, config: PipelineConfig
) -> ray.data.Dataset:
    """(band, doc_id) rows -> (a, b, n_keys): per qualifying band (block
    size <= max_block_size) the vectorized triu pairs, counted per pair
    across bands — the counting twin of ``dedup._candidate_pairs``."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )

    cap = config.max_block_size

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in bucket.groupby("band", sort=False):
            ids = np.sort(g["doc_id"].unique())
            if len(ids) < 2 or len(ids) > cap:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    pairs = bucketed_group_apply(exploded, ["band"], pairs_in_bucket)
    counted = salted_group_apply(
        pairs, ["a", "b"],
        partial_fn=lambda b: b.groupby(["a", "b"], sort=False).size()
        .astype("int64").reset_index(name="n_keys"),
        merge_fn=lambda b: b.groupby(["a", "b"], sort=False)["n_keys"]
        .sum().astype("int64").reset_index(),
    ).materialize()
    if counted.count() > 0:
        return counted
    return ray.data.from_pandas(pd.DataFrame({
        "a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
        "n_keys": pd.Series(dtype="int64"),
    }))


def _band_index(docs: ray.data.Dataset, config: PipelineConfig):
    from tcx2graph_jl_ray.stages.dedup import _Signatures

    sigs = docs.map_batches(
        _Signatures,
        fn_constructor_args=(config.minhash_num_perm, config.minhash_bands,
                             config.shingle_size),
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 16),
    )
    return sigs.map_batches(
        lambda b: b.explode("bands").rename(columns={"bands": "band"})
        [["band", "doc_id"]],
        batch_format="pandas",
    ).materialize()


def _flag_checked_dedup(
    pairs: ray.data.Dataset, docs: ray.data.Dataset, config: PipelineConfig
) -> ray.data.Dataset:
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.stages.dedup import _verify_pairs_join

    ok = _verify_pairs_join(
        pairs, docs, config.jaccard_threshold, config.shingle_size
    ).materialize()
    if ok.count() == 0:
        return pairs.map_batches(
            lambda b: b.assign(ok=False), batch_format="pandas"
        )
    okm = ok.map_batches(
        lambda b: b[["a", "b"]].assign(__okhit=np.int64(1)),
        batch_format="pandas",
    )
    return hash_join(pairs, okm, on=["a", "b"], how="left").map_batches(
        lambda b: b.assign(ok=b["__okhit"].notna()).drop(
            columns=["__okhit"]
        ),
        batch_format="pandas",
    )


def minhash_init(
    docs: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> dict:
    """Batch-build the incremental MinHash-LSH state from the first shard."""
    band_index = _band_index(docs, config)
    pair_counts = _band_pairs_with_counts(band_index, config)
    if pair_counts.count() == 0:
        checked = ray.data.from_pandas(pd.DataFrame({
            "a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
            "ok": pd.Series(dtype="bool"),
        }))
    else:
        checked = _flag_checked_dedup(
            pair_counts.select_columns(["a", "b"]), docs, config
        ).materialize()
    return {"band_index": band_index, "pair_counts": pair_counts,
            "checked": checked}


def minhash_delta(
    state: dict,
    new_docs: ray.data.Dataset,
    all_docs: ray.data.Dataset,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    """Fold one new shard of docs into the LSH state — O(dirty bands), not
    O(corpus). ``all_docs`` (old ∪ new) backs the text-side of the verify
    join only; texts are immutable so cached verdicts stay valid."""
    from tcx2graph_jl_ray.functions.join import hash_join

    new_bands = _band_index(new_docs, config)
    if new_bands.count() == 0:
        return state
    dmark = new_bands.map_batches(
        lambda b: b[["band"]].drop_duplicates().assign(__d=np.int64(1)),
        batch_format="pandas",
    )
    old_dirty = hash_join(
        state["band_index"], dmark, on=["band"], how="left"
    ).map_batches(
        lambda b: b[b["__d"].notna()][["band", "doc_id"]],
        batch_format="pandas",
    ).materialize()

    p_old = _band_pairs_with_counts(old_dirty, config).map_batches(
        lambda b: b.assign(n_keys=-b["n_keys"].astype("int64")),
        batch_format="pandas",
    )
    p_new = _band_pairs_with_counts(old_dirty.union(new_bands), config)

    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    resum = lambda x: (  # noqa: E731
        x.groupby(["a", "b"], sort=False)["n_keys"].sum().astype("int64")
        .reset_index()
    )
    pair_counts = salted_group_apply(
        state["pair_counts"].union(p_old).union(p_new), ["a", "b"],
        partial_fn=resum, merge_fn=resum,
    ).map_batches(
        lambda b: b[b["n_keys"] > 0], batch_format="pandas"
    ).materialize()
    if pair_counts.count() == 0:
        pair_counts = ray.data.from_pandas(pd.DataFrame({
            "a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
            "n_keys": pd.Series(dtype="int64"),
        }))

    to_check = _anti_join(
        pair_counts.select_columns(["a", "b"]), state["checked"],
        on=["a", "b"],
    ).materialize()
    if to_check.count() > 0:
        newly = _flag_checked_dedup(to_check, all_docs, config)
        checked = state["checked"].union(newly).materialize()
    else:
        checked = state["checked"]

    return {
        "band_index": state["band_index"].union(new_bands).materialize(),
        "pair_counts": pair_counts,
        "checked": checked,
    }


def minhash_pairs_from_state(state: dict) -> pd.DataFrame:
    """Live verified pairs (count > 0 AND verify-ok) as a sorted frame."""
    from tcx2graph_jl_ray.functions.join import hash_join

    if state["pair_counts"].count() == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    passing = state["checked"].map_batches(
        lambda b: b[b["ok"]][["a", "b"]].assign(__ok=np.int64(1)),
        batch_format="pandas",
    ).materialize()
    if passing.count() == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    live = hash_join(
        state["pair_counts"].select_columns(["a", "b"]), passing,
        on=["a", "b"], how="left",
    ).map_batches(
        lambda b: b[b["__ok"].notna()][["a", "b"]], batch_format="pandas"
    ).to_pandas()
    if len(live) == 0:
        # Ray drops empty blocks at to_pandas -> a column-less frame
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return live.astype({"a": "int64", "b": "int64"}) \
        .sort_values(["a", "b"]).reset_index(drop=True)


def minhash_pairs_incremental(
    docs: ray.data.Dataset, config: PipelineConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Demo/driver entry: md5-split the corpus into two shards, batch-init
    on shard 1, DELTA-fold shard 2 — the result must (and does: the oracle
    is the BATCH ``minhash_pairs_sql``) equal one-shot
    ``neardup_minhash_pairs`` over everything."""
    from tcx2graph_jl_ray.functions.digest import md5_hex

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.asarray(
            md5_hex(batch["doc_id"].astype("int64").astype(str).to_numpy()),
            dtype="U32",
        ).astype("U1")
        return batch.assign(__shard=np.where(h <= "7", 0, 1))

    tagged = docs.map_batches(tag, batch_format="pandas").materialize()
    a = tagged.map_batches(
        lambda x: x[x["__shard"] == 0].drop(columns=["__shard"]),
        batch_format="pandas",
    )
    b = tagged.map_batches(
        lambda x: x[x["__shard"] == 1].drop(columns=["__shard"]),
        batch_format="pandas",
    )
    all_docs = tagged.map_batches(
        lambda x: x.drop(columns=["__shard"]), batch_format="pandas"
    )
    state = minhash_init(a, config)
    state = minhash_delta(state, b, all_docs, config)
    return minhash_pairs_from_state(state)
