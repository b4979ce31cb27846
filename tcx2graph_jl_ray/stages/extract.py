"""Mention detection + (subj, pred, obj) triple extraction.

The KG analogue of the reference's per-point enrichment stages — OSM feature
attach (src/TCXParser.jl:83-101,188-265) and weather attach (:267-355) — which
run a stateful lookup over every record. Here the "model" is a compiled rule
set (deterministic, so precision/recall vs a single-threaded reference run is
exactly measurable), hosted by a ``map_batches`` **actor pool**: patterns are
compiled once per actor in ``__init__``, batches are processed vectorized in
``__call__``.

Extraction rules (the reference extractor this engine is graded against):

- ``please look up X and report Y``        -> triple (conv_id, asked_about, X)
- ``X is located in Y ; X reported Z``     -> (X, located_in, Y), (X, reported, Z)
- ``lookup[T] -> X k=N``                   -> (X, k_value, N)

and every captured ``X`` is an entity mention. Patterns are tried on every row
(not keyed on role). Mention normalization: lowercase, collapse non-alnum runs
to single spaces, strip — the analogue of coordinate rounding before dedup
(src/Utils.jl:22-25).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data


class _InferenceStandIn:
    """Bench-only per-row compute stand-in for model-based extraction.

    The synthetic regex rules cost ~1 µs/row, so sandbox scaling runs are
    bound by per-stage fixed costs and the shared disk, not worker CPU
    (BASELINE.md, single-box ceiling). A real KG extractor is a batched
    model forward pass, orders of magnitude heavier per row. This stand-in
    reproduces that shape — one float32 (rows × d) @ (d × d) matmul chain
    per batch, ``reps`` layers deep — so the scaling protocol can measure
    the engine in the compute-dominated regime the 100 TB deployment
    actually runs in. Deterministic, output-independent, OFF by default
    (``reps=0``); enabled only via ``PipelineConfig.extract_heavy_reps``
    (bench.py wires GRAFT_HEAVY_REPS). Measured ~6-7 µs/row/rep at d=128
    on this host (single-threaded BLAS under Ray's OMP_NUM_THREADS=1).
    """

    def __init__(self, reps: int, dim: int = 128):
        rng = np.random.default_rng(0)
        self.w = (rng.standard_normal((dim, dim)) * 0.1).astype("float32")
        self.reps = int(reps)
        self.dim = dim

    def burn(self, n_rows: int) -> None:
        if self.reps <= 0 or n_rows <= 0:
            return
        x = np.ones((n_rows, self.dim), dtype="float32")
        for _ in range(self.reps):
            x = np.tanh(x @ self.w)

USER_PATTERN = r"^please look up (.+) and report (\S+)$"
ASSISTANT_PATTERN = r"^(.+?) is located in (.+?) ; (.+?) reported (\S+)$"
TOOL_PATTERN = r"^lookup\[(\S+)\] -> (.+) k=(\d+)$"

_NORM_RE = re.compile(r"[^a-z0-9]+")


def normalize_surface(s: str) -> str:
    return _NORM_RE.sub(" ", s.lower()).strip()


def _norm_series(s: pd.Series) -> pd.Series:
    return s.str.lower().str.replace(_NORM_RE, " ", regex=True).str.strip()


class TripleExtractor:
    """Actor-pool stage: transcripts batch -> triples batch.

    Output: conv_id, turn_idx:int32, subj, pred, obj (surface forms; subj/obj
    are canonicalized later by stages/canonicalize.py, the way segment runs are
    only merged into canonical segments in the reference's second phase,
    src/OverlappingSegmentsUtils.jl:212-277).
    """

    def __init__(self, heavy_reps: int = 0):
        self.user_re = re.compile(USER_PATTERN)
        self.assistant_re = re.compile(ASSISTANT_PATTERN)
        self.tool_re = re.compile(TOOL_PATTERN)
        self.standin = _InferenceStandIn(heavy_reps)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        self.standin.burn(len(batch))
        out = []
        text = batch["text"]
        conv = batch["conv_id"]
        turn = batch["turn_idx"].astype("int32")

        u = text.str.extract(self.user_re)
        m = u[0].notna()
        if m.any():
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[m],
                        "turn_idx": turn[m],
                        "subj": conv[m],
                        "pred": "asked_about",
                        "obj": u.loc[m, 0],
                    }
                )
            )

        a = text.str.extract(self.assistant_re)
        m = a[0].notna()
        if m.any():
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[m],
                        "turn_idx": turn[m],
                        "subj": a.loc[m, 0],
                        "pred": "located_in",
                        "obj": a.loc[m, 1],
                    }
                )
            )
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[m],
                        "turn_idx": turn[m],
                        "subj": a.loc[m, 2],
                        "pred": "reported",
                        "obj": a.loc[m, 3],
                    }
                )
            )

        t = text.str.extract(self.tool_re)
        m = t[1].notna()
        if m.any():
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[m],
                        "turn_idx": turn[m],
                        "subj": t.loc[m, 1],
                        "pred": "k_value",
                        "obj": t.loc[m, 2],
                    }
                )
            )

        if not out:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "turn_idx": pd.Series([], dtype="int32"),
                    "subj": pd.Series([], dtype="object"),
                    "pred": pd.Series([], dtype="object"),
                    "obj": pd.Series([], dtype="object"),
                }
            )
        res = pd.concat(out, ignore_index=True)
        res["turn_idx"] = res["turn_idx"].astype("int32")
        return res


class MentionExtractor:
    """Actor-pool stage: transcripts batch -> mentions batch.

    Output: conv_id, turn_idx:int32, surface, norm, n_occurrences:int64 —
    one row per distinct surface per turn (occurrences folded into a count,
    like the reference folds repeated grid cells into a unique set,
    src/GraphUtils.jl:46-57).
    """

    def __init__(self, heavy_reps: int = 0):
        self.user_re = re.compile(USER_PATTERN)
        self.assistant_re = re.compile(ASSISTANT_PATTERN)
        self.tool_re = re.compile(TOOL_PATTERN)
        self.standin = _InferenceStandIn(heavy_reps)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        self.standin.burn(len(batch))
        text = batch["text"]
        surface = text.str.extract(self.user_re)[0]
        surface = surface.fillna(text.str.extract(self.assistant_re)[0])
        surface = surface.fillna(text.str.extract(self.tool_re)[1])
        m = surface.notna()
        if not m.any():
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "turn_idx": pd.Series([], dtype="int32"),
                    "surface": pd.Series([], dtype="object"),
                    "norm": pd.Series([], dtype="object"),
                    "n_occurrences": pd.Series([], dtype="int64"),
                }
            )
        surf = surface[m]
        txt = text[m]
        n_occ = pd.Series(
            [t.count(s) for t, s in zip(txt.to_numpy(), surf.to_numpy())],
            index=surf.index,
            dtype="int64",
        )
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"][m],
                "turn_idx": batch["turn_idx"][m].astype("int32"),
                "surface": surf,
                "norm": _norm_series(surf),
                "n_occurrences": n_occ,
            }
        )


def pool_bounds(cap: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the session: min = cpus//8
    (pre-started actors so short jobs don't wait on lazy scale-up — measured
    3x extraction wall-time loss with min=1 at 32 CPUs), max = session CPU
    count (a fixed cap silently serializes the regex-heavy extraction on
    wider sessions: the round-2 cap of 16 held the triple-extraction phase
    to a 1.7x speedup from 8 -> 32 CPUs; pass ``cap`` to bound it
    explicitly). Never the full CPU count as the MINIMUM: a fixed pool that
    large starves upstream read/shuffle stages and deadlocks small
    sessions."""
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    hi = cpus if cap is None else min(cap, cpus)
    # min stays cpus//8: actor ramp-up dominates an ISOLATED extraction
    # phase (measured 12.9 s -> 5.2 s with a half-session pre-start), but in
    # the overlapped flagship pipeline two pools run concurrently with the
    # nodes/edges sinks, and a larger reserved min measured NET-NEUTRAL to
    # worse there (57-65 s vs the 50-55 s band at mult=64/32 CPUs) — the
    # reservation starves the sink/shuffle tasks the overlap exists to hide.
    return (max(1, cpus // 8), max(1, hi))


def extract_triples(
    transcripts: ray.data.Dataset, concurrency=None, batch_size: int = 8192,
    heavy_reps: int = 0,
) -> ray.data.Dataset:
    return transcripts.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={"heavy_reps": heavy_reps},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency or pool_bounds(),
    )


def extract_mentions(
    transcripts: ray.data.Dataset, concurrency=None, batch_size: int = 8192,
    heavy_reps: int = 0,
) -> ray.data.Dataset:
    return transcripts.map_batches(
        MentionExtractor,
        fn_constructor_kwargs={"heavy_reps": heavy_reps},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency or pool_bounds(),
    )


TRIPLES_SQL_TEMPLATE = r"""
WITH t AS ({transcripts})
SELECT conv_id, turn_idx, conv_id AS subj, 'asked_about' AS pred,
       regexp_extract(text, '^please look up (.+) and report (\S+)$', 1) AS obj
FROM t WHERE regexp_matches(text, '^please look up (.+) and report (\S+)$')
UNION ALL
SELECT conv_id, turn_idx,
       regexp_extract(text, '^(.+?) is located in (.+?) ; (.+?) reported (\S+)$', 1),
       'located_in',
       regexp_extract(text, '^(.+?) is located in (.+?) ; (.+?) reported (\S+)$', 2)
FROM t WHERE regexp_matches(text, '^(.+?) is located in (.+?) ; (.+?) reported (\S+)$')
UNION ALL
SELECT conv_id, turn_idx,
       regexp_extract(text, '^(.+?) is located in (.+?) ; (.+?) reported (\S+)$', 3),
       'reported',
       regexp_extract(text, '^(.+?) is located in (.+?) ; (.+?) reported (\S+)$', 4)
FROM t WHERE regexp_matches(text, '^(.+?) is located in (.+?) ; (.+?) reported (\S+)$')
UNION ALL
SELECT conv_id, turn_idx,
       regexp_extract(text, '^lookup\[(\S+)\] -> (.+) k=(\d+)$', 2),
       'k_value',
       regexp_extract(text, '^lookup\[(\S+)\] -> (.+) k=(\d+)$', 3)
FROM t WHERE regexp_matches(text, '^lookup\[(\S+)\] -> (.+) k=(\d+)$')
"""

MENTIONS_SQL_TEMPLATE = r"""
WITH t AS ({transcripts}),
m AS (
  SELECT conv_id, turn_idx, text,
    COALESCE(
      NULLIF(regexp_extract(text, '^please look up (.+) and report (\S+)$', 1), ''),
      NULLIF(regexp_extract(text, '^(.+?) is located in (.+?) ; (.+?) reported (\S+)$', 1), ''),
      NULLIF(regexp_extract(text, '^lookup\[(\S+)\] -> (.+) k=(\d+)$', 2), '')
    ) AS surface
  FROM t
)
SELECT conv_id, turn_idx, surface,
  trim(regexp_replace(lower(surface), '[^a-z0-9]+', ' ', 'g')) AS norm,
  (length(text) - length(replace(text, surface, ''))) // length(surface) AS n_occurrences
FROM m WHERE surface IS NOT NULL
"""
