"""Transcript source.

The engine's authoritative input shape (BASELINE.json ``input_hint``) is a Parquet
table of multi-turn conversation transcripts::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string (nullable), ts: timestamp[us]

The sandbox test corpus (/root/testdata/sf*/) has no transcripts table, so we
*derive* one deterministically from the ``events`` stream joined to the
``nation``/``region`` dimensions. The derivation is intentionally expressible in
ANSI SQL (see ``TRANSCRIPTS_SQL``) so every downstream KG operator can be
verified against a DuckDB oracle, and it plants ground-truth structure:

- entity surface forms are aliased variants of nation names (4 variants per
  nation), giving canonicalization a known connected-component answer — the
  analogue of the same physical road segment appearing in many rides
  (reference src/OverlappingSegmentsUtils.jl:91-277);
- each turn's text follows a role-keyed template embedding (subj, pred, obj)
  triples, so extractor precision/recall is exactly computable;
- ``(conv_id, turn_idx)`` ordering is derived from ``(ts, event_id)`` — the
  ordered-trackpoint invariant (reference src/GraphBuilder.jl:104-111,
  src/Neo4jUtils.jl:96 ``ORDER BY t.time``).

Scale note: the derivation itself is a broadcast join (nation×region is tiny —
``ray.put`` once, read per actor) plus ONE keyed shuffle on ``conv_id`` to
assign ``turn_idx``; at 10^12 turns the shuffle key is the conversation id,
which is also the partitioning key every downstream per-conversation stage
reuses.
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data

# Columns actually consumed from the events table (prune at the read).
_EVENT_COLUMNS = ["event_id", "ts", "user_id", "event_type", "props"]

# Alias variants planted per nation: variant = event_id % 4.
# After generic normalization (lowercase, non-alnum -> space) variants 0-2
# collapse to e.g. "nation 7" while variant 3 stays "the nation 7 team";
# pairwise token containment >= 0.8 links them (stages/canonicalize.py).
_K_RE = r'"k": (\d+)'


def _alias_series(n_name: pd.Series, event_id: pd.Series) -> pd.Series:
    v = (event_id % 4).to_numpy()
    base = n_name
    lower = n_name.str.lower()
    spaced = n_name.str.replace("_", " ", regex=False)
    team = "the " + lower.str.replace("_", " ", regex=False) + " team"
    out = base.copy()
    out[v == 1] = lower[v == 1]
    out[v == 2] = spaced[v == 2]
    out[v == 3] = team[v == 3]
    return out


class _DeriveTurns:
    """Broadcast-join map stage: joins each event to the tiny nation×region
    lookup. The 25-row KB travels in the function closure (serialized once
    per task submission) — for a genuinely large side table this becomes a
    ``ray.put`` ref fetched in an actor pool's ``__init__`` (the pattern
    replacing the reference's per-point nearest-way lookup,
    src/TCXParser.jl:188-265); for 25 rows an actor pool's startup cost
    outweighs it.
    """

    def __init__(self, kb: pd.DataFrame):
        # kb: DataFrame[n_nationkey, n_name, r_name]
        self.kb = kb.set_index("n_nationkey")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # nation varies per event (not just per user) so a conversation
        # mentions many entities and entities span many conversations —
        # the many-rides-share-a-segment structure canonicalization needs
        nk = ((batch["user_id"] + batch["event_id"]) % 25).to_numpy()
        kb = self.kb.reindex(nk)
        n_name = pd.Series(kb["n_name"].to_numpy(), index=batch.index, dtype="object")
        r_name = pd.Series(kb["r_name"].to_numpy(), index=batch.index, dtype="object")

        role_code = (batch["event_id"] % 3).to_numpy()
        role = pd.Series("tool", index=batch.index, dtype="object")
        role[role_code == 0] = "user"
        role[role_code == 1] = "assistant"

        alias = _alias_series(n_name, batch["event_id"])
        et = batch["event_type"]
        # dirty-input contract: a props string without a k match concatenates
        # as '' (exactly DuckDB regexp_extract's no-match result) instead of
        # poisoning the whole text with NaN
        k = batch["props"].str.extract(_K_RE, expand=False).fillna("")

        text = pd.Series("", index=batch.index, dtype="object")
        m = role == "user"
        text[m] = "please look up " + alias[m] + " and report " + et[m]
        m = role == "assistant"
        text[m] = (
            alias[m] + " is located in " + r_name[m] + " ; "
            + alias[m] + " reported " + et[m]
        )
        m = role == "tool"
        text[m] = "lookup[" + et[m] + "] -> " + alias[m] + " k=" + k[m]

        tool = et.where(role == "tool", None)

        return pd.DataFrame(
            {
                "conv_id": "conv_" + batch["user_id"].astype(str),
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "role": role,
                "text": text,
                "tool": tool,
            }
        )


def _assign_turn_idx(bucket: pd.DataFrame) -> pd.DataFrame:
    # Stable per-conversation order from (ts, event_id) — the ordering
    # invariant (reference src/GraphBuilder.jl:104-111). event_id breaks ts
    # ties deterministically. Runs per hash BUCKET of conversations: one
    # vectorized sort + cumcount covers every conversation in the bucket.
    bucket = bucket.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
    bucket = bucket.assign(
        turn_idx=bucket.groupby("conv_id", sort=False).cumcount().astype("int32")
    )
    return bucket[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def assign_turn_idx_sliced(
    ds: ray.data.Dataset, slice_span_s: float = 3600.0
) -> ray.data.Dataset:
    """Whale-conversation-safe turn-idx assignment — identical output to the
    single-bucket ``_assign_turn_idx`` path, bounded per-task rows.

    ``bucketed_group_apply(["conv_id"], _assign_turn_idx)`` lands a whole
    conversation in one task; a conversation longer than a worker's heap (a
    years-long support thread, a bot account) sinks it. Ordered ranking
    cannot salt transparently, so it slices on the ORDER key instead (the
    ``cumulative_tokens_chunked`` boundary-carry shape, stages/graph.py):

    1. slice = ts // ``slice_span_s`` — monotone in ts, so every row of
       slice s precedes every row of slice s+1 within a conversation, and
       ts-ties never straddle a slice boundary (floor is deterministic);
    2. level 1 buckets on (conv_id, slice): local sort + cumcount, plus
       per-(conv, slice) counts — a whale conversation spreads across its
       slices' tasks;
    3. level 2 buckets the REDUCED counts per conv_id: ordered prefix sum
       gives each slice its global offset (rows here = active slices per
       conversation, bounded by timespan / span, not by row count);
    4. offsets rejoin the sliced rows via the co-partitioned ``hash_join``;
       turn_idx = offset + local index.

    Per-task bound: rows per conversation per ``slice_span_s`` window. Pick
    the span so the densest expected burst fits a worker.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    span_ns = int(slice_span_s * 1_000_000_000)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["__slice"] = (
            pd.to_datetime(b["ts"]).astype("int64") // span_ns
        ).astype("int64")
        return b

    def local_rank(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values(
            ["conv_id", "__slice", "ts", "event_id"], kind="mergesort"
        )
        return bucket.assign(
            __local_idx=bucket.groupby(["conv_id", "__slice"], sort=False)
            .cumcount()
            .astype("int64")
        )

    tagged = ds.map_batches(tag, batch_format="pandas")
    local = bucketed_group_apply(
        tagged, ["conv_id", "__slice"], local_rank
    ).materialize()

    counts = local.map_batches(
        lambda b: b.groupby(["conv_id", "__slice"], sort=False)
        .size()
        .reset_index(name="__n"),
        batch_format="pandas",
    )

    def offsets(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["conv_id", "__slice"], sort=False)["__n"]
            .sum()
            .reset_index()
            .sort_values(["conv_id", "__slice"], kind="mergesort")
        )
        g["__offset"] = (
            g.groupby("conv_id", sort=False)["__n"].cumsum() - g["__n"]
        ).astype("int64")
        return g[["conv_id", "__slice", "__offset"]]

    offs = bucketed_group_apply(counts, ["conv_id"], offsets)

    joined = hash_join(
        local.drop_columns(["event_id"]), offs, on=["conv_id", "__slice"]
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            turn_idx=(b["__offset"] + b["__local_idx"]).astype("int32")
        )
        return b[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]

    return joined.map_batches(finalize, batch_format="pandas")


def derive_transcripts(
    sf_dir: str, mult: int = 1, slice_span_s: float | None = None
) -> ray.data.Dataset:
    """events ⋈ nation ⋈ region → transcripts Dataset (see module docstring).

    One broadcast join + one bucketed keyed shuffle on conv_id to impose turn
    order.

    ``mult`` (bench-only; breaks oracle parity) replicates the event stream
    with disjoint user-id ranges — mult× conversations of the same shape — so
    scaling runs carry enough work per CPU to amortize fixed stage costs.

    ``slice_span_s`` switches turn ordering to the whale-safe sliced path
    (``assign_turn_idx_sliced``): identical output, per-task rows bounded by
    conversation rows per span instead of whole conversations. Default None
    keeps the single-shuffle path (right while no conversation approaches a
    worker's heap).
    """
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    kb = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "n_name", "r_name"]
    ]
    derive = _DeriveTurns(kb)  # stateless tasks; tiny KB rides in the closure

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=_EVENT_COLUMNS)
    # a single parquet file reads as a handful of blocks, capping every
    # downstream map (and the ordering sort's task count) at that width;
    # spread the rows first. Small replicate batches keep the task count up:
    # operator fusion bundles inputs toward the largest fused batch_size and
    # would otherwise collapse the chain to a few giant tasks (seen in
    # ds.stats()). A union-of-replica-reads variant was measured WORSE: 2x
    # mult operators overwhelm the driver-side executor loop, which already
    # bounds this pipeline at sandbox scale (remote compute is ~1s of the
    # ~30s wall at mult=32; see BASELINE.md).
    ds = ds.repartition(64 if mult == 1 else 128)
    if mult > 1:
        def replicate(batch: pd.DataFrame) -> pd.DataFrame:
            reps = []
            for r in range(mult):
                rep = batch.copy()
                rep["user_id"] = rep["user_id"] + r * 10_000_000
                reps.append(rep)
            return pd.concat(reps, ignore_index=True)

        ds = ds.map_batches(replicate, batch_format="pandas", batch_size=2048)
    ds = ds.map_batches(derive, batch_format="pandas", batch_size=16384)
    if slice_span_s is not None:
        return assign_turn_idx_sliced(ds, slice_span_s)
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    return bucketed_group_apply(ds, ["conv_id"], _assign_turn_idx)


# DuckDB-runnable oracle for derive_transcripts (same templates, same ordering).
TRANSCRIPTS_SQL = r"""
WITH base AS (
  SELECT
    'conv_' || CAST(e.user_id AS VARCHAR) AS conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) - 1
         AS INTEGER) AS turn_idx,
    CASE CAST(e.event_id % 3 AS INTEGER)
      WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    CASE CAST(e.event_id % 4 AS INTEGER)
      WHEN 0 THEN n.n_name
      WHEN 1 THEN lower(n.n_name)
      WHEN 2 THEN replace(n.n_name, '_', ' ')
      ELSE 'the ' || lower(replace(n.n_name, '_', ' ')) || ' team'
    END AS alias,
    e.event_type AS event_type,
    e.ts AS ts,
    r.r_name AS r_name,
    regexp_extract(e.props, '"k": (\d+)', 1) AS k
  FROM events e
  JOIN nation n ON ((e.user_id + e.event_id) % 25) = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT
  conv_id,
  turn_idx,
  role,
  CASE role
    WHEN 'user' THEN 'please look up ' || alias || ' and report ' || event_type
    WHEN 'assistant' THEN alias || ' is located in ' || r_name || ' ; '
                          || alias || ' reported ' || event_type
    ELSE 'lookup[' || event_type || '] -> ' || alias || ' k=' || k
  END AS text,
  CASE WHEN role = 'tool' THEN event_type ELSE NULL END AS tool,
  ts
FROM base
"""
