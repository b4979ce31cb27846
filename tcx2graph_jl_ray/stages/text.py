"""Text analysis operators over a document corpus: token counting, quality
scoring, language identification, content fingerprinting.

These extend the engine beyond the reference's GPS-specific per-record math
(haversine/gradient scoring, src/Utils.jl:42-86, src/SegmentAnalysis.jl:32-146)
to the per-record scoring a training-data pipeline needs. All operators are
stateless vectorized ``map_batches`` stages; marker/stopword tables are
compiled once per actor when hosted in a pool.

Every operator here is deliberately expressible in DuckDB (list_filter /
string_split / md5) so the driver's oracle gate covers it value-exactly:
tokenization is ``split(' ')`` (empty tokens preserved, like DuckDB
string_split), ratios are exact integer-over-integer IEEE divisions.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import ray.data

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is")

# language marker words, scored per doc; first-match-wins tie-break in this
# order, 'und' when no marker hits
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}
LANG_ORDER = ("en", "es", "de", "fr", "zh")



from tcx2graph_jl_ray.functions.hygiene import nonnull_text as _nonnull_text


def _token_frame(batch: pd.DataFrame) -> pd.DataFrame:
    """Explode lowercase ' '-split tokens -> (row, tok); vectorized counting
    substrate shared by the operators below."""
    toks = batch["text"].str.lower().str.split(" ")
    return pd.DataFrame(
        {
            "row": np.repeat(np.arange(len(batch)), toks.str.len()),
            "tok": [t for ws in toks for t in ws],
        }
    )


def quality_frame(
    batch: pd.DataFrame, tf: pd.DataFrame | None = None
) -> pd.DataFrame:
    """Per-batch quality features (row-aligned with the input batch) — shared
    by the ``quality_stats`` Dataset op and the corpus pipeline's inline
    annotator. Pass a precomputed ``_token_frame`` to share tokenization
    with other per-batch annotators."""
    return _quality_stats_batch(batch, tf)


def quality_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc quality features: doc_id, n_chars, n_tokens, n_types,
    stopword_ratio, mean_token_len."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        lambda b: _quality_stats_batch(_nonnull_text(b)),
        batch_format="pandas", batch_size=8192,
    )


def _quality_stats_batch(
    batch: pd.DataFrame, tf: pd.DataFrame | None = None
) -> pd.DataFrame:
    text = batch["text"]
    n_chars = text.str.len().astype("int64")
    n_tokens = (text.str.count(" ") + 1).astype("int64")
    nospace = text.str.replace(" ", "", regex=False).str.len().astype("int64")

    if tf is None:
        tf = _token_frame(batch)
    types = tf.groupby("row")["tok"].nunique()
    n_types = (
        pd.Series(0, index=range(len(batch)))
        .add(types, fill_value=0)
        .astype("int64")
    )
    stops = tf[tf["tok"].isin(STOPWORDS)].groupby("row").size()
    n_stop = (
        pd.Series(0, index=range(len(batch)))
        .add(stops, fill_value=0)
        .astype("int64")
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].astype("int64").to_numpy(),
            "n_chars": n_chars.to_numpy(),
            "n_tokens": n_tokens.to_numpy(),
            "n_types": n_types.to_numpy(),
            "stopword_ratio": (n_stop.to_numpy() / n_tokens.to_numpy()),
            "mean_token_len": (nospace.to_numpy() / n_tokens.to_numpy()),
        }
    )


QUALITY_SQL = f"""
WITH toks AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM documents
  WHERE text IS NOT NULL
)
SELECT
  CAST(doc_id AS BIGINT) AS doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(t) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(t)) AS BIGINT) AS n_types,
  CAST(len(list_filter(t, x -> x IN {STOPWORDS})) AS DOUBLE) / len(t)
    AS stopword_ratio,
  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(t) AS mean_token_len
FROM toks
"""


def lang_frame(
    batch: pd.DataFrame, tf: pd.DataFrame | None = None
) -> pd.DataFrame:
    """Per-batch language guess (row-aligned with the input batch)."""
    return _lang_id_batch(batch, tf)


def lang_id(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Marker-word language guesser: per doc the language whose marker words
    hit most tokens (first-wins tie-break in LANG_ORDER; 'und' when zero).
    Output: doc_id, lang_pred."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        lambda b: _lang_id_batch(_nonnull_text(b)),
        batch_format="pandas", batch_size=8192,
    )


def _lang_id_batch(
    batch: pd.DataFrame, tf: pd.DataFrame | None = None
) -> pd.DataFrame:
    if tf is None:
        tf = _token_frame(batch)
    n = len(batch)
    scores = np.zeros((n, len(LANG_ORDER)), dtype=np.int64)
    for li, lang in enumerate(LANG_ORDER):
        hits = tf[tf["tok"].isin(LANG_MARKERS[lang])].groupby("row").size()
        scores[hits.index.to_numpy(), li] = hits.to_numpy()
    best = scores.argmax(axis=1)  # argmax returns FIRST max -> LANG_ORDER tie-break
    pred = np.array(LANG_ORDER, dtype=object)[best]
    pred[scores.max(axis=1) == 0] = "und"
    return pd.DataFrame(
        {"doc_id": batch["doc_id"].astype("int64").to_numpy(), "lang_pred": pred}
    )


def _lang_scores_sql() -> str:
    cols = ",\n  ".join(
        f"len(list_filter(t, x -> x IN {LANG_MARKERS[lang]})) AS s_{lang}"
        for lang in LANG_ORDER
    )
    greatest = "greatest(" + ", ".join(f"s_{l}" for l in LANG_ORDER) + ")"
    case = "\n    ".join(
        f"WHEN s_{l} = {greatest} THEN '{l}'" for l in LANG_ORDER
    )
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
  WHERE text IS NOT NULL
),
s AS (
  SELECT doc_id,
  {cols}
  FROM toks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE WHEN {greatest} = 0 THEN 'und'
    {case}
  END AS lang_pred
FROM s
"""


LANG_ID_SQL = _lang_scores_sql()


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Stable content fingerprint per doc (md5 hex — the exact-dedup /
    lineage digest). Output: doc_id, fingerprint."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        from tcx2graph_jl_ray.functions.digest import md5_hex

        batch = _nonnull_text(batch)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "fingerprint": md5_hex(batch["text"].to_numpy()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fp, batch_format="pandas", batch_size=8192
    )


FINGERPRINT_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS fingerprint
FROM documents WHERE text IS NOT NULL
"""


def token_count_by_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus token accounting grouped by source: the pre-aggregated (combiner)
    pattern — per-batch partial sums, then one tiny groupby.
    Output: source, n_docs, n_tokens."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        n_tokens = (batch["text"].str.count(" ") + 1).astype("int64")
        g = pd.DataFrame({"source": batch["source"], "n_tokens": n_tokens}).groupby(
            "source", sort=False
        )
        agg = g.agg(n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        return agg.reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": pd.array([int(g["n_docs"].sum())], dtype="int64"),
                "n_tokens": pd.array([int(g["n_tokens"].sum())], dtype="int64"),
            }
        )

    return (
        docs.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


TOKEN_COUNT_SQL = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents WHERE text IS NOT NULL GROUP BY source
"""


# BPE-ish pre-tokenizer pattern (GPT-2 style, ASCII-simplified so pandas'
# re and DuckDB's RE2 count identically): a token is an optionally
# space-prefixed letter run, digit run, or punctuation run
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"


def bpe_token_count_by_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Token accounting under a BPE-ish regex pre-tokenizer, alongside the
    whitespace count — the two tokenizations a training-data pipeline
    budgets with. Same combiner pattern as ``token_count_by_source``:
    per-batch vectorized regex counts (compiled once by pandas' str engine),
    one tiny final groupby. Output: source, n_docs, n_ws_tokens,
    n_bpe_tokens."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        ws = (batch["text"].str.count(" ") + 1).astype("int64")
        bpe = batch["text"].str.count(BPE_PATTERN).astype("int64")
        g = pd.DataFrame(
            {"source": batch["source"], "ws": ws, "bpe": bpe}
        ).groupby("source", sort=False)
        return g.agg(
            n_docs=("ws", "size"), n_ws_tokens=("ws", "sum"),
            n_bpe_tokens=("bpe", "sum"),
        ).reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": pd.array([int(g["n_docs"].sum())], dtype="int64"),
                "n_ws_tokens": pd.array(
                    [int(g["n_ws_tokens"].sum())], dtype="int64"
                ),
                "n_bpe_tokens": pd.array(
                    [int(g["n_bpe_tokens"].sum())], dtype="int64"
                ),
            }
        )

    return (
        docs.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


BPE_TOKEN_COUNT_SQL = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+')))
            AS BIGINT) AS n_bpe_tokens
FROM documents WHERE text IS NOT NULL GROUP BY source
"""


def top_ngrams_by_source(docs: ray.data.Dataset, k_top: int = 3) -> ray.data.Dataset:
    """Vocabulary mining — the hotspot-grid scan recast for text (most
    frequent cells -> most frequent shingles, src/GraphUtils.jl:117-189):
    the ``k_top`` most frequent word bigrams per source
    (occurrence counts, not per-doc), ties broken by bigram text. Per-batch
    partial counts (combiner) -> bucketed sum per (source, bigram) -> tiny
    per-source top-k. Output: source, bigram, n, rank."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        toks = batch["text"].str.lower().str.split(" ")
        toks = toks.map(lambda ws: [w for w in ws if w])
        n_bi = toks.map(lambda ws: max(0, len(ws) - 1))
        src = np.repeat(batch["source"].to_numpy(), n_bi.to_numpy())
        bi = [
            f"{ws[i]} {ws[i+1]}"
            for ws in toks
            for i in range(len(ws) - 1)
        ]
        df = pd.DataFrame({"source": src, "bigram": bi})
        g = df.groupby(["source", "bigram"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    def sum_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source", "bigram"], sort=False)["n"].sum()
        return g.reset_index().astype({"n": "int64"})

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in bucket.groupby("source", sort=False):
            g = g.sort_values(["n", "bigram"], ascending=[False, True],
                              kind="mergesort").head(k_top)
            g = g.assign(rank=pd.array(range(1, len(g) + 1), dtype="int64"))
            out.append(g)
        return pd.concat(out, ignore_index=True)

    counts = bucketed_group_apply(
        docs.select_columns(["source", "text"]).map_batches(
            partial, batch_format="pandas", batch_size=4096
        ),
        ["source", "bigram"],
        sum_counts,
    )
    return bucketed_group_apply(counts, ["source"], topk)


TOP_NGRAMS_SQL_TEMPLATE = """
WITH tk AS (
  SELECT source, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
bi AS (
  SELECT source, l[i] || ' ' || l[i+1] AS bigram
  FROM tk, unnest(range(1, len(l))) AS t(i)
  WHERE len(l) >= 2
),
c AS (SELECT source, bigram, CAST(COUNT(*) AS BIGINT) AS n
      FROM bi GROUP BY source, bigram),
r AS (
  SELECT source, bigram, n,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n DESC, bigram) AS rank
  FROM c
)
SELECT source, bigram, n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k_top}
"""


def tfidf_top_terms(docs: ray.data.Dataset, k_top: int = 3) -> ray.data.Dataset:
    """Per-source characteristic vocabulary: top-``k_top`` terms by a
    linear-idf TF-IDF (score = tf * n_sources / df, one IEEE division so the
    DuckDB oracle is bit-identical — ln() idf would differ in the last ulp
    between libm builds). The hotspot scan generalized from cells to terms
    (src/GraphUtils.jl:117-189), with the corpus-frequency discount a
    training-data curator actually ranks domains by.

    Shape: per-batch partial (source, term) counts (combiner) -> bucketed
    sum per (source, term) -> df computed INSIDE a term-bucketed apply (all
    (source, term) rows of a term land in one bucket, so df = group size —
    no separate join, no vocab broadcast) -> tiny per-source top-k. The only
    driver-side scalar is n_sources (domain cardinality — small by nature).
    Output: source, term, tf, df, score, rank."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    nn = docs.select_columns(["source", "text"]).map_batches(
        _nonnull_text, batch_format="pandas", batch_size=8192
    )
    n_src = len(
        nn.select_columns(["source"])
        .map_batches(
            lambda b: b.drop_duplicates(), batch_format="pandas",
            batch_size=32768,
        )
        .unique("source")
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split(" ")
        toks = toks.map(lambda ws: [w for w in ws if w])
        n = toks.str.len().astype("int64")
        src = np.repeat(batch["source"].to_numpy(), n.to_numpy())
        term = [t for ws in toks for t in ws]
        df = pd.DataFrame({"source": src, "term": term})
        g = df.groupby(["source", "term"], sort=False).size().reset_index(name="tf")
        g["tf"] = g["tf"].astype("int64")
        return g

    def sum_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source", "term"], sort=False)["tf"].sum()
        return g.reset_index().astype({"tf": "int64"})

    def score(bucket: pd.DataFrame) -> pd.DataFrame:
        # counts are already one row per (source, term), so rows-per-term
        # IS the document-frequency-by-source
        bucket = bucket.copy()
        bucket["df"] = bucket.groupby("term", sort=False)["source"].transform(
            "size"
        ).astype("int64")
        bucket["score"] = (bucket["tf"] * n_src).astype("float64") / bucket[
            "df"
        ].astype("float64")
        return bucket

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in bucket.groupby("source", sort=False):
            g = g.sort_values(["score", "term"], ascending=[False, True],
                              kind="mergesort").head(k_top)
            g = g.assign(rank=pd.array(range(1, len(g) + 1), dtype="int64"))
            out.append(g)
        return pd.concat(out, ignore_index=True)

    counts = bucketed_group_apply(
        nn.map_batches(partial, batch_format="pandas", batch_size=4096),
        ["source", "term"],
        sum_counts,
    )
    scored = bucketed_group_apply(counts, ["term"], score)
    return bucketed_group_apply(scored, ["source"], topk)


TFIDF_SQL_TEMPLATE = """
WITH tk AS (
  SELECT source, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
t AS (SELECT source, unnest(l) AS term FROM tk),
c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM t GROUP BY source, term),
d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM c GROUP BY term),
n AS (SELECT COUNT(DISTINCT source) AS nsrc FROM documents
      WHERE text IS NOT NULL),
s AS (
  SELECT c.source, c.term, c.tf, d.df,
         CAST(c.tf * n.nsrc AS DOUBLE) / CAST(d.df AS DOUBLE) AS score
  FROM c JOIN d USING (term), n
),
r AS (
  SELECT source, term, tf, df, score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score DESC, term) AS rank
  FROM s
)
SELECT source, term, tf, df, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k_top}
"""


def quota_sample_by_source(docs: ray.data.Dataset, k: int = 5) -> ray.data.Dataset:
    """Deterministic per-source quota sample: the ``k`` docs with the
    smallest md5(doc_id) hex digest per source — the O5 sampling recast with
    a per-group quota (the "cap every domain at k docs" curation step).
    Content-independent and stable across runs/cluster sizes.

    Shape: per-batch hash + LOCAL per-source top-k (combiner — at most
    k rows per (batch, source) enter the shuffle) -> per-source final top-k
    in a bucketed apply. Output: source, doc_id, sample_rank."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from tcx2graph_jl_ray.functions.digest import md5_hex

        batch = _nonnull_text(batch)
        ids = batch["doc_id"].astype("int64")
        hx = md5_hex(ids.astype(str).to_numpy())
        df = pd.DataFrame(
            {"source": batch["source"].to_numpy(), "doc_id": ids.to_numpy(),
             "hx": hx}
        )
        df = df.sort_values(["hx", "doc_id"], kind="mergesort")
        return df.groupby("source", sort=False).head(k)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values(["hx", "doc_id"], kind="mergesort")
        out = bucket.groupby("source", sort=False).head(k).copy()
        out["sample_rank"] = out.groupby("source", sort=False).cumcount() + 1
        out["sample_rank"] = out["sample_rank"].astype("int64")
        return out[["source", "doc_id", "sample_rank"]]

    hashed = docs.select_columns(["source", "doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )
    return bucketed_group_apply(hashed, ["source"], final)


QUOTA_SAMPLE_SQL_TEMPLATE = """
WITH h AS (
  SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS hx
  FROM documents WHERE text IS NOT NULL
),
r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hx, doc_id)
           AS sample_rank
  FROM h
)
SELECT source, doc_id, CAST(sample_rank AS BIGINT) AS sample_rank
FROM r WHERE sample_rank <= {k}
"""


# whole-word denylist; every alternative appears in the synthetic corpus so
# the scrub demonstrably fires. \b is identical in Python re and RE2.
DENYLIST_PATTERN = r"\b(spark|flink|presto)\b"
SCRUB_TOKEN = "[scrubbed]"


def scrub_denylist(
    docs: ray.data.Dataset, pattern: str = DENYLIST_PATTERN
) -> ray.data.Dataset:
    """Denylist scrubbing (the C4-style badword/PII removal step): replace
    whole-word denylist matches with a fixed token and count the hits.
    Stateless vectorized map — pandas' str engine compiles the regex once
    per block; no shuffle. The pattern is restricted to constructs with
    identical semantics in Python re and DuckDB RE2 (word alternation +
    \\b), keeping the oracle value-exact.
    Output: doc_id, clean_text, n_scrubbed."""

    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        text = batch["text"]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "clean_text": text.str.replace(
                    pattern, SCRUB_TOKEN, regex=True
                ).to_numpy(),
                "n_scrubbed": text.str.count(pattern).astype("int64").to_numpy(),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        scrub, batch_format="pandas", batch_size=8192
    )


SCRUB_SQL = rf"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       regexp_replace(text, '{DENYLIST_PATTERN}', '{SCRUB_TOKEN}', 'g')
         AS clean_text,
       CAST(len(regexp_extract_all(text, '{DENYLIST_PATTERN}')) AS BIGINT)
         AS n_scrubbed
FROM documents WHERE text IS NOT NULL
"""


def repetition_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc repetition: what fraction of a document's word bigrams is its
    single most frequent bigram (the Gopher-style "top 2-gram fraction"
    quality rule — boilerplate and spam score high). Docs with fewer than
    two tokens have no bigrams and are excluded, like the oracle's
    len(l) >= 2. Purely per-row: one exploded-frame groupby per batch, no
    shuffle. rep_frac = max_bigram_n / n_bigrams as one IEEE division
    (oracle-exact). Output: doc_id, n_bigrams, max_bigram_n, rep_frac."""

    def rep(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        toks = batch["text"].str.lower().str.split(" ")
        toks = toks.map(lambda ws: [w for w in ws if w])
        n_bi = toks.map(lambda ws: max(0, len(ws) - 1))
        ids = np.repeat(
            batch["doc_id"].astype("int64").to_numpy(), n_bi.to_numpy()
        )
        bi = [
            f"{ws[i]} {ws[i+1]}" for ws in toks for i in range(len(ws) - 1)
        ]
        if not len(bi):
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "n_bigrams": pd.array([], dtype="int64"),
                    "max_bigram_n": pd.array([], dtype="int64"),
                    "rep_frac": pd.array([], dtype="float64"),
                }
            )
        c = (
            pd.DataFrame({"doc_id": ids, "bigram": bi})
            .groupby(["doc_id", "bigram"], sort=False)
            .size()
            .reset_index(name="n")
        )
        m = c.groupby("doc_id", sort=False)["n"].agg(["sum", "max"]).reset_index()
        return pd.DataFrame(
            {
                "doc_id": m["doc_id"].astype("int64"),
                "n_bigrams": m["sum"].astype("int64"),
                "max_bigram_n": m["max"].astype("int64"),
                "rep_frac": m["max"].astype("float64")
                / m["sum"].astype("float64"),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        rep, batch_format="pandas", batch_size=8192
    )


REPETITION_SQL = """
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
bi AS (
  SELECT doc_id, l[i] || ' ' || l[i+1] AS bigram
  FROM tk, unnest(range(1, len(l))) AS t(i)
  WHERE len(l) >= 2
),
c AS (SELECT doc_id, bigram, COUNT(*) AS n FROM bi GROUP BY doc_id, bigram),
m AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
             CAST(MAX(n) AS BIGINT) AS max_bigram_n
      FROM c GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_bigrams, max_bigram_n,
       CAST(max_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS rep_frac
FROM m
"""


def split_assign(
    docs: ray.data.Dataset, train_cut: int = 0xCB, val_cut: int = 0xE5
) -> ray.data.Dataset:
    """Deterministic train/val/test split assignment by a content-independent
    hash of the document id: first md5 byte <= 0xcb (204/256 ~ 79.7%) ->
    train, <= 0xe5 (230/256) -> val, else test. No shuffle, no RNG state —
    the only split that stays stable when a 10^12-doc corpus is re-sharded,
    re-read in a different order, or extended (new ids land in the same
    proportions; existing assignments never move). Hex-string compare on the
    2-char prefix equals numeric compare on the first byte (both monotone),
    matching the SQL oracle exactly — the same trick as
    ``analysis.sample_turns_by_hash``. Output: doc_id, split.
    """

    train_hex, val_hex = format(train_cut, "02x"), format(val_cut, "02x")

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        from tcx2graph_jl_ray.functions.digest import md5_hex

        ids = batch["doc_id"].astype("int64")
        # 2-char hex prefix compares identically to the first digest byte
        p2 = np.asarray(
            md5_hex(ids.astype(str).to_numpy()), dtype="U32"
        ).astype("U2")
        split = np.where(
            p2 <= train_hex, "train", np.where(p2 <= val_hex, "val", "test")
        )
        return pd.DataFrame({"doc_id": ids.to_numpy(), "split": split})

    return docs.select_columns(["doc_id"]).map_batches(
        assign, batch_format="pandas", batch_size=65536
    )


SPLIT_ASSIGN_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '{train_hex}'
              THEN 'train'
            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '{val_hex}'
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def winnow_fingerprints(
    docs: ray.data.Dataset, k: int = 3, window: int = 4
) -> ray.data.Dataset:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): per
    doc, hash every k-word-gram, then keep the MINIMUM hash of each sliding
    window of ``window`` consecutive grams — a locality-sensitive selection
    guaranteeing any shared run of >= k+window-1 words between two docs
    shares a fingerprint. The positional-robust upgrade of the whole-doc
    ``fingerprints`` digest.

    Stateless vectorized map: grams exploded across the batch, hashed once
    (md5 family — DuckDB-reproducible), per-doc sliding min via a numpy
    stride view. Output: doc_id, fp:int64 (uint64 hash bit-reinterpreted),
    distinct per doc. Docs with fewer than k+window-1 words yield no rows
    (no full window) on both engine and oracle sides.
    """
    import numpy as np

    from tcx2graph_jl_ray.functions.minhash import token_hashes_md5

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        out_ids: list[np.ndarray] = []
        out_fps: list[np.ndarray] = []
        grams: list[str] = []
        gram_doc: list[int] = []
        gram_cnt: list[int] = []
        for doc_id, text in zip(
            batch["doc_id"].astype("int64").to_numpy(),
            batch["text"].to_numpy(),
        ):
            words = [w for w in str(text).lower().split(" ") if w]
            n = len(words) - k + 1
            if n < window:
                continue
            grams.extend(
                " ".join(words[i : i + k]) for i in range(n)
            )
            gram_doc.append(doc_id)
            gram_cnt.append(n)
        if not grams:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "fp": pd.array([], dtype="int64"),
                }
            )
        h = token_hashes_md5(np.asarray(grams, dtype=object))
        off = 0
        for doc_id, n in zip(gram_doc, gram_cnt):
            mins = np.lib.stride_tricks.sliding_window_view(
                h[off : off + n], window
            ).min(axis=1)
            u = np.unique(mins)
            out_ids.append(np.full(len(u), doc_id, dtype=np.int64))
            out_fps.append(u.view(np.int64))
            off += n
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(out_ids),
                "fp": np.concatenate(out_fps),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fp, batch_format="pandas", batch_size=4096
    )


WINNOW_SQL_TEMPLATE = """
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, i AS pos,
         md5_number_lower(array_to_string(l[i:i+{k}-1], ' ')) AS h,
         len(l) - {k} + 1 AS n
  FROM tk, unnest(range(1, len(l) - {k} + 2)) AS t(i)
  WHERE len(l) >= {k}
),
w AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {window} - 1 FOLLOWING) AS mh
  FROM g
  QUALIFY pos <= n - {window} + 1
)
SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(CAST(mh AS HUGEINT)
            - CASE WHEN mh >= CAST(9223372036854775808 AS UBIGINT)
                   THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
            AS BIGINT) AS fp
FROM w
"""


def chunk_documents(
    docs: ray.data.Dataset, chunk_tokens: int = 64, stride: int = 48
) -> ray.data.Dataset:
    """Overlapping-window document chunking — the standard LLM-pretraining
    prep step: each doc yields windows of ``chunk_tokens`` whitespace tokens
    every ``stride`` tokens (overlap = chunk_tokens - stride). The chunk
    CONTENT travels as its md5 digest, not the text, so the result stays
    small while remaining value-checkable. Empty docs yield no chunks.

    Output: doc_id, chunk_idx, start_tok, n_tokens (int64), chunk_md5.
    """

    def ch(batch: pd.DataFrame) -> pd.DataFrame:
        from tcx2graph_jl_ray.functions.digest import md5_hex

        batch = _nonnull_text(batch)
        ids, idxs, starts, lens, pieces = [], [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].astype("int64").to_numpy(),
            batch["text"].to_numpy(),
        ):
            toks = [w for w in str(text).lower().split(" ") if w]
            n = len(toks)
            for ci, s in enumerate(range(0, n, stride)):
                pieces.append(" ".join(toks[s : s + chunk_tokens]))
                ids.append(doc_id)
                idxs.append(ci)
                starts.append(s)
                lens.append(min(chunk_tokens, n - s))
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "chunk_idx": pd.array(idxs, dtype="int64"),
                "start_tok": pd.array(starts, dtype="int64"),
                "n_tokens": pd.array(lens, dtype="int64"),
                "chunk_md5": md5_hex(np.array(pieces, dtype=object)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        ch, batch_format="pandas", batch_size=4096
    )


CHUNK_SQL_TEMPLATE = """
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(s.s / {stride} AS BIGINT) AS chunk_idx,
       CAST(s.s AS BIGINT) AS start_tok,
       CAST(least({chunk_tokens}, len(l) - s.s) AS BIGINT) AS n_tokens,
       md5(array_to_string(l[s.s + 1 : s.s + {chunk_tokens}], ' ')) AS chunk_md5
FROM tk, unnest(range(0, len(l), {stride})) AS s(s)
WHERE len(l) > 0
"""


def pack_sequences(
    docs: ray.data.Dataset,
    seq_tokens: int = 512,
    chunk_docs: int = 4096,
) -> ray.data.Dataset:
    """Greedy training-sequence packing: documents in doc_id order are laid
    end-to-end on a global token tape; each doc's sequence id is its start
    offset divided by ``seq_tokens`` (GPT-style packing, boundary docs
    assigned by where they start). The global prefix sum uses the same
    whale-safe two-phase split as ``cumulative_tokens_chunked``
    (graph.py): order-free per-chunk token totals via a combiner, one tiny
    exclusive prefix over chunk totals (rows = docs/``chunk_docs``,
    broadcast once via ``ray.put``), then a per-chunk local cumsum — no
    global sort, no driver pass over the data.

    Output: doc_id, n_tokens, offset, seq_id (all int64; empty/null docs
    count 0 tokens and still receive a slot, matching the SQL window).
    """
    import numpy as np
    import ray as _ray

    src = docs.select_columns(["doc_id", "text"])

    def tok_rows(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch["text"].fillna("")
        toks = txt.str.lower().str.split(" ").map(
            lambda ws: sum(1 for w in ws if w)
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "chunk": batch["doc_id"].astype("int64") // chunk_docs,
                "n_tokens": toks.astype("int64"),
            }
        )

    rows = src.map_batches(tok_rows, batch_format="pandas", batch_size=8192)

    def partial_totals(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("chunk", sort=False)["n_tokens"].sum()
        return pd.DataFrame({"chunk": g.index, "total": g.to_numpy()})

    totals = (
        rows.map_batches(partial_totals, batch_format="pandas")
        .to_pandas()
        .groupby("chunk", sort=True)["total"]
        .sum()
    )
    offsets = (totals.cumsum() - totals).astype("int64")
    off_ref = _ray.put(offsets.to_dict())

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    class _Apply:
        def __init__(self, ref):
            self.off = _ray.get(ref)

        def __call__(self, bucket: pd.DataFrame) -> pd.DataFrame:
            g = bucket.sort_values("doc_id", kind="mergesort")
            local = g.groupby("chunk", sort=False)["n_tokens"].cumsum()
            base = g["chunk"].map(self.off).to_numpy(dtype="int64")
            start = base + (local - g["n_tokens"]).to_numpy(dtype="int64")
            return pd.DataFrame(
                {
                    "doc_id": g["doc_id"].to_numpy(),
                    "n_tokens": g["n_tokens"].to_numpy(),
                    "offset": start,
                    "seq_id": start // seq_tokens,
                }
            )

    def apply_bucket(bucket: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "fn" not in _cache:
            _cache["fn"] = _Apply(off_ref)
        return _cache["fn"](bucket)

    return bucketed_group_apply(rows, ["chunk"], apply_bucket)


PACK_SQL_TEMPLATE = """
WITH d AS (
  SELECT doc_id,
         CAST(CASE WHEN text IS NULL THEN 0
              ELSE len(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) END AS BIGINT) AS n_tokens
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS offset,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {seq_tokens} AS BIGINT) AS seq_id
FROM d
"""


def winnow_neardup_pairs(
    docs: ray.data.Dataset,
    min_shared: int = 2,
    k: int = 3,
    window: int = 4,
    n_buckets: int = 64,
    max_fp_block: int = 10_000,
) -> ray.data.Dataset:
    """Near-duplicate pairs by shared winnowing fingerprints — the MOSS
    match step: docs sharing >= ``min_shared`` selected fingerprints are
    flagged. The fingerprint is the blocking key (same shape as the minhash
    band join); a fingerprint shared by more than ``max_fp_block`` docs is
    boilerplate and is skipped for pair generation (oracle parity holds
    while no fingerprint exceeds the cap — unconditional at test scale).

    Output: a, b (a < b, int64), n_shared:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    fps = winnow_fingerprints(docs, k=k, window=window)

    def pairs_per_fp(bucket: pd.DataFrame) -> pd.DataFrame:
        sizes = bucket.groupby("fp", sort=False)["doc_id"].transform("size")
        d = bucket[sizes <= max_fp_block]
        m = d.merge(d, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame({"a": m["doc_id_x"], "b": m["doc_id_y"]})

    pairs = bucketed_group_apply(fps, ["fp"], pairs_per_fp, n_buckets=n_buckets)

    def count_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="n_shared")
        )
        g = g[g["n_shared"] >= min_shared]
        g["n_shared"] = g["n_shared"].astype("int64")
        g["a"] = g["a"].astype("int64")
        g["b"] = g["b"].astype("int64")
        return g

    return bucketed_group_apply(
        pairs, ["a", "b"], count_pairs, n_buckets=n_buckets
    )


WINNOW_PAIRS_SQL_TEMPLATE = """
WITH w AS ({winnow})
SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM w x JOIN w y ON x.fp = y.fp AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
HAVING COUNT(*) >= {min_shared}
"""


def length_deciles(docs: ray.data.Dataset, n_tiles: int = 10, n_buckets: int = 64) -> ray.data.Dataset:
    """Global NTILE bucketing by document length: every doc gets its decile
    (1..n_tiles) in the corpus-wide ordering by (n_tokens, doc_id) — the
    distributed GLOBAL-RANK primitive, done without a global sort:

    1. token-count HISTOGRAM via combiner (distinct lengths ≪ docs);
    2. driver-side exclusive prefix over the tiny sorted histogram →
       broadcast base-rank per length (``ray.put`` once);
    3. within each equal-length group, position by doc_id assigned in
       length-keyed buckets (vectorized rank per group);
    4. NTILE arithmetic on the exact global rank.

    Matches SQL ``NTILE({n})`` exactly, including the first ``n_rows %
    n_tiles`` tiles taking the extra row. Null-text docs count 0 tokens
    and rank first, like the SQL COALESCE.

    Output: doc_id, n_tokens, tile (all int64).
    """
    import ray as _ray

    def tok_rows(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch["text"].fillna("")
        toks = txt.str.lower().str.split(" ").map(
            lambda ws: sum(1 for w in ws if w)
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_tokens": toks.astype("int64"),
            }
        )

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        tok_rows, batch_format="pandas", batch_size=8192
    ).materialize()

    def partial_hist(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("n_tokens", sort=False).size()
        return pd.DataFrame({"n_tokens": g.index, "cnt": g.to_numpy()})

    hist = (
        rows.map_batches(partial_hist, batch_format="pandas")
        .to_pandas()
        .groupby("n_tokens", sort=True)["cnt"]
        .sum()
    )
    total = int(hist.sum())
    base = (hist.cumsum() - hist).astype("int64")
    state = _ray.put((base.to_dict(), total))

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def assign(bucket: pd.DataFrame, _cache={}) -> pd.DataFrame:
        if "s" not in _cache:
            _cache["s"] = _ray.get(state)
        base_map, n = _cache["s"]
        g = bucket.sort_values(["n_tokens", "doc_id"], kind="mergesort")
        pos = g.groupby("n_tokens", sort=False).cumcount().to_numpy()
        rank = g["n_tokens"].map(base_map).to_numpy(dtype="int64") + pos
        q, rem = divmod(n, n_tiles)
        big = rem * (q + 1)
        tile = np.where(
            rank < big,
            rank // (q + 1) if q + 1 else 0,
            rem + (rank - big) // q if q else rem,
        ) + 1
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": g["n_tokens"].to_numpy(),
                "tile": tile.astype("int64"),
            }
        )

    return bucketed_group_apply(rows, ["n_tokens"], assign, n_buckets=n_buckets)


LENGTH_DECILES_SQL_TEMPLATE = """
WITH d AS (
  SELECT doc_id,
         CAST(CASE WHEN text IS NULL THEN 0
              ELSE len(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) END AS BIGINT) AS n_tokens
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
       CAST(NTILE({n_tiles}) OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS tile
FROM d
"""


def rare_bigram_rate(
    docs: ray.data.Dataset, min_count: int = 3, n_buckets: int = 64
) -> ray.data.Dataset:
    """LM-style quality screen from exact integer statistics: per document,
    how many of its word bigrams are RARE in the corpus (global occurrence
    count < ``min_count``) — the n-gram-LM out-of-vocabulary-rate proxy used
    to flag low-quality/garbled documents, kept integer-exact (no
    log-probability sums) so the oracle is bit-identical. The grid logic
    mirrors the reference's hotspot screen inverted (src/GraphUtils.jl:
    117-189: cells seen by MANY rides are hot; bigrams seen in FEW docs are
    suspect).

    Shape: per-batch (doc, bigram) multiplicity partials; corpus counts by
    per-batch partial + bucketed sum (the combiner — the shuffle moves
    distinct bigrams, not occurrences); doc rows meet counts in the
    co-partitioned ``hash_join`` (no vocabulary broadcast — corpus
    vocabularies at 100 TB are billions of bigrams); per-doc totals reduce
    inside doc_id buckets. Docs with < 2 tokens have no bigrams and are
    absent, as in the oracle.

    Output: doc_id, n_bigrams:int64, n_rare:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def doc_bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        toks = batch["text"].str.lower().str.split(" ")
        toks = toks.map(lambda ws: [w for w in ws if w])
        n_bi = toks.map(lambda ws: max(0, len(ws) - 1))
        ids = np.repeat(batch["doc_id"].to_numpy(), n_bi.to_numpy())
        bi = [
            f"{ws[i]} {ws[i+1]}"
            for ws in toks
            for i in range(len(ws) - 1)
        ]
        df = pd.DataFrame({"doc_id": ids, "bigram": bi})
        g = df.groupby(["doc_id", "bigram"], sort=False).size().reset_index(name="m")
        g["m"] = g["m"].astype("int64")
        return g

    # pinned once: the bigram derivation feeds BOTH the corpus-count branch
    # and the join branch; an unpinned Dataset would re-tokenize the corpus
    # per consumer (same reason the flagship stages its transcripts sink)
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_bigrams, batch_format="pandas", batch_size=4096
    ).materialize()

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("bigram", sort=False)["m"].sum()
        return pd.DataFrame({"bigram": s.index, "c_part": s.to_numpy()})

    def sum_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("bigram", sort=False)["c_part"].sum()
        return pd.DataFrame({"bigram": s.index, "c": s.astype("int64").to_numpy()})

    counts = bucketed_group_apply(
        rows.map_batches(partial_counts, batch_format="pandas"),
        ["bigram"],
        sum_counts,
        n_buckets=n_buckets,
    )
    joined = hash_join(rows, counts, on="bigram", n_buckets=n_buckets)

    def per_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.assign(
            rare=np.where(bucket["c"] < min_count, bucket["m"], 0)
        )
        g = bucket.groupby("doc_id", sort=False).agg(
            n_bigrams=("m", "sum"), n_rare=("rare", "sum")
        ).reset_index()
        g["doc_id"] = g["doc_id"].astype("int64")
        g["n_bigrams"] = g["n_bigrams"].astype("int64")
        g["n_rare"] = g["n_rare"].astype("int64")
        return g

    return bucketed_group_apply(joined, ["doc_id"], per_doc, n_buckets=n_buckets)


RARE_BIGRAM_SQL_TEMPLATE = """
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
bi AS (
  SELECT doc_id, l[i] || ' ' || l[i+1] AS bigram
  FROM tk, unnest(range(1, len(l))) AS t(i)
  WHERE len(l) >= 2
),
c AS (SELECT bigram, COUNT(*) AS c FROM bi GROUP BY bigram)
SELECT CAST(bi.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN c.c < {min_count} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rare
FROM bi JOIN c USING (bigram)
GROUP BY bi.doc_id
"""


def lm_logprob(docs: ray.data.Dataset, n_buckets: int = 64) -> ray.data.Dataset:
    """Corpus-trained bigram-LM score per document — the KenLM-style
    perplexity filter of LLM data pipelines: logprob = Σ ln(c(w1,w2)/c(w1·))
    over the doc's bigrams, where counts are CORPUS totals (MLE, no
    smoothing needed: every observed bigram has c ≥ 1 and its left unigram
    context c(w1·) ≥ c(w1,w2) > 0, so each term is ln of a ratio in (0,1]).
    A self-scored corpus is the screen's calibration run; scoring a held-out
    corpus against these counts is the same join with the count table
    swapped. Rounds to 6 decimals on both sides (float-aggregate
    convention: summation order differs).

    Shape: doc (bigram, multiplicity) rows as in ``rare_bigram_rate``;
    bigram counts AND left-context counts each via per-batch partial +
    bucketed sum; the doc rows pick both up through two co-partitioned
    ``hash_join``s (no vocabulary broadcast); per-doc reduce inside doc_id
    buckets. Docs with < 2 tokens are absent (no bigrams), as in the oracle.

    Output: doc_id, n_bigrams:int64, logprob:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def doc_bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        toks = batch["text"].str.lower().str.split(" ")
        toks = toks.map(lambda ws: [w for w in ws if w])
        n_bi = toks.map(lambda ws: max(0, len(ws) - 1))
        ids = np.repeat(batch["doc_id"].to_numpy(), n_bi.to_numpy())
        w1 = [ws[i] for ws in toks for i in range(len(ws) - 1)]
        bi = [
            f"{ws[i]} {ws[i+1]}"
            for ws in toks
            for i in range(len(ws) - 1)
        ]
        df = pd.DataFrame({"doc_id": ids, "w1": w1, "bigram": bi})
        g = (
            df.groupby(["doc_id", "w1", "bigram"], sort=False)
            .size()
            .reset_index(name="m")
        )
        g["m"] = g["m"].astype("int64")
        return g

    # pinned once: three consumers (bigram counts, unigram-context counts,
    # the scoring join) would otherwise re-tokenize the corpus three times
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_bigrams, batch_format="pandas", batch_size=4096
    ).materialize()

    def make_counts(col: str, out: str):
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            s = batch.groupby(col, sort=False)["m"].sum()
            return pd.DataFrame({col: s.index, "c_part": s.to_numpy()})

        def total(bucket: pd.DataFrame) -> pd.DataFrame:
            s = bucket.groupby(col, sort=False)["c_part"].sum()
            return pd.DataFrame({col: s.index, out: s.astype("int64").to_numpy()})

        return bucketed_group_apply(
            rows.map_batches(partial, batch_format="pandas"),
            [col],
            total,
            n_buckets=n_buckets,
        )

    bi_counts = make_counts("bigram", "c_bi")
    uni_counts = make_counts("w1", "c_uni")
    j = hash_join(rows, bi_counts, on="bigram", n_buckets=n_buckets)
    j = hash_join(j, uni_counts, on="w1", n_buckets=n_buckets)

    def per_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        lp = bucket["m"].to_numpy(dtype="float64") * np.log(
            bucket["c_bi"].to_numpy(dtype="float64")
            / bucket["c_uni"].to_numpy(dtype="float64")
        )
        d = pd.DataFrame(
            {"doc_id": bucket["doc_id"], "m": bucket["m"], "lp": lp}
        )
        g = d.groupby("doc_id", sort=False).agg(
            n_bigrams=("m", "sum"), logprob=("lp", "sum")
        ).reset_index()
        g["doc_id"] = g["doc_id"].astype("int64")
        g["n_bigrams"] = g["n_bigrams"].astype("int64")
        g["logprob"] = g["logprob"].astype("float64").round(6)
        return g

    return bucketed_group_apply(j, ["doc_id"], per_doc, n_buckets=n_buckets)


LM_LOGPROB_SQL = """
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
bi AS (
  SELECT doc_id, l[i] AS w1, l[i] || ' ' || l[i+1] AS bigram
  FROM tk, unnest(range(1, len(l))) AS t(i)
  WHERE len(l) >= 2
),
cb AS (SELECT bigram, COUNT(*) AS c_bi FROM bi GROUP BY bigram),
cu AS (SELECT w1, COUNT(*) AS c_uni FROM bi GROUP BY w1)
SELECT CAST(bi.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(SUM(LN(CAST(c_bi AS DOUBLE) / c_uni)), 6) AS logprob
FROM bi JOIN cb USING (bigram) JOIN cu USING (w1)
GROUP BY bi.doc_id
"""


def corpus_composition(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus-mix report: docs and tokens per (source, detected language) —
    the composition table every pretraining-data curation step starts from
    (what mix am I actually training on?), composing the ``lang_id``
    classifier with the token accounting. One streaming pass: each batch
    classifies and counts locally (combiner), the tiny (source, lang) grid
    reduces in one bucketed shuffle.

    Output: source, lang_pred, n_docs:int64, n_tokens:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        pred = _lang_id_batch(batch)
        n_tokens = (batch["text"].str.count(" ") + 1).astype("int64")
        d = pd.DataFrame(
            {
                "source": batch["source"].to_numpy(),
                "lang_pred": pred["lang_pred"].to_numpy(),
                "n_tokens": n_tokens.to_numpy(),
            }
        )
        g = d.groupby(["source", "lang_pred"], sort=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum")
        )
        return g.reset_index()

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source", "lang_pred"], sort=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum")
        ).reset_index()
        g["n_docs"] = g["n_docs"].astype("int64")
        g["n_tokens"] = g["n_tokens"].astype("int64")
        return g

    partials = docs.select_columns(["doc_id", "source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )
    return bucketed_group_apply(
        partials, ["source", "lang_pred"], final, n_buckets=8
    )


def corpus_composition_sql() -> str:
    return f"""
WITH pred AS ({LANG_ID_SQL})
SELECT d.source, p.lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
FROM documents d JOIN pred p ON p.doc_id = d.doc_id
WHERE d.text IS NOT NULL
GROUP BY d.source, p.lang_pred
"""


def bigram_novelty(docs: ray.data.Dataset, n_buckets: int = 64) -> ray.data.Dataset:
    """Per-document contribution/novelty score: how many of a doc's distinct
    word bigrams FIRST appear in that doc (first = smallest doc_id over the
    corpus) — the marginal-contribution measure behind dedup-aware corpus
    valuation (a doc whose n-grams all appeared earlier adds nothing). Same
    bigram derivation as ``rare_bigram_rate``; "first doc" is a per-bigram
    MIN(doc_id) combiner (per-batch min + bucketed min — the shuffle moves
    distinct bigrams once), joined back to the doc's distinct-bigram rows via
    the co-partitioned ``hash_join``. Integer-exact.

    Output: doc_id, n_distinct:int64, n_novel:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def doc_bigrams(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        toks = batch["text"].str.lower().str.split(" ")
        toks = toks.map(lambda ws: [w for w in ws if w])
        n_bi = toks.map(lambda ws: max(0, len(ws) - 1))
        ids = np.repeat(batch["doc_id"].to_numpy(), n_bi.to_numpy())
        bi = [
            f"{ws[i]} {ws[i+1]}"
            for ws in toks
            for i in range(len(ws) - 1)
        ]
        df = pd.DataFrame({"doc_id": ids, "bigram": bi}).drop_duplicates()
        df["doc_id"] = df["doc_id"].astype("int64")
        return df

    # pinned once: the first-doc reduce and the join branch both consume it
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_bigrams, batch_format="pandas", batch_size=4096
    ).materialize()

    def partial_min(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("bigram", sort=False)["doc_id"].min()
        return pd.DataFrame({"bigram": s.index, "first_part": s.to_numpy()})

    def min_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("bigram", sort=False)["first_part"].min()
        return pd.DataFrame(
            {"bigram": s.index, "first_doc": s.astype("int64").to_numpy()}
        )

    firsts = bucketed_group_apply(
        rows.map_batches(partial_min, batch_format="pandas"),
        ["bigram"],
        min_doc,
        n_buckets=n_buckets,
    )
    joined = hash_join(rows, firsts, on="bigram", n_buckets=n_buckets)

    def per_doc(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.assign(
            novel=(bucket["doc_id"] == bucket["first_doc"]).astype("int64")
        )
        g = bucket.groupby("doc_id", sort=False).agg(
            n_distinct=("novel", "size"), n_novel=("novel", "sum")
        ).reset_index()
        g["doc_id"] = g["doc_id"].astype("int64")
        g["n_distinct"] = g["n_distinct"].astype("int64")
        g["n_novel"] = g["n_novel"].astype("int64")
        return g

    return bucketed_group_apply(joined, ["doc_id"], per_doc, n_buckets=n_buckets)


BIGRAM_NOVELTY_SQL = """
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
bi AS (
  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] AS bigram
  FROM tk, unnest(range(1, len(l))) AS t(i)
  WHERE len(l) >= 2
),
f AS (SELECT bigram, MIN(doc_id) AS first_doc FROM bi GROUP BY bigram)
SELECT CAST(bi.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN bi.doc_id = f.first_doc THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel
FROM bi JOIN f USING (bigram)
GROUP BY bi.doc_id
"""


def importance_sample(
    docs: ray.data.Dataset, full_chars: int = 500, u_bits: int = 16
) -> ray.data.Dataset:
    """Quality-WEIGHTED deterministic sampling: keep each document with
    probability proportional to its quality proxy (here length, capped at
    ``full_chars`` chars ⇒ p = min(n_chars, full_chars)/full_chars) — the
    importance-sampling step of data mixing, where high-quality docs are
    kept at higher rates, made shuffle-free and reproducible the same way
    as ``sample_turns_by_hash`` (O5): the uniform draw is the document's
    own content hash, so the decision is stable across runs, processes and
    engines — no RNG state, no coordination. u = md5_number_lower(text)
    mod 2^``u_bits``; keep iff u < floor(min(n_chars, full) · 2^bits /
    full) — all integer arithmetic, bit-identical to the oracle.

    Output: kept docs — doc_id, n_chars:int64, u:int64.
    """
    from tcx2graph_jl_ray.stages.multimodal import _md5_halves

    mod = 1 << u_bits

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        u = np.fromiter(
            (
                _md5_halves(t.encode())[0] % mod
                for t in batch["text"].to_numpy()
            ),
            dtype="int64",
            count=len(batch),
        )
        n = batch["n_chars"].to_numpy(dtype="int64")
        thresh = np.minimum(n, full_chars) * mod // full_chars
        m = u < thresh
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy()[m],
                "n_chars": n[m],
                "u": u[m],
            }
        )

    return docs.select_columns(["doc_id", "text", "n_chars"]).map_batches(
        keep, batch_format="pandas", batch_size=8192
    )


IMPORTANCE_SAMPLE_SQL_TEMPLATE = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(md5_number_lower(text) % {mod} AS BIGINT) AS u
FROM documents
WHERE text IS NOT NULL
  AND md5_number_lower(text) % {mod}
      < (least(CAST(n_chars AS BIGINT), {full_chars}) * {mod}) // {full_chars}
"""


def lang_mismatch(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Label-noise audit: documents whose DECLARED ``lang`` column disagrees
    with the marker-word classifier's prediction — the data-quality check
    run before trusting upstream metadata (mirrors the reference's
    missing-value audits, src/DataPreprocessing.jl:90-99, for a categorical
    label instead of nulls). One streaming pass; no shuffle.

    Output: doc_id, lang, lang_pred — only disagreeing docs ('und'
    predictions count as disagreement unless declared 'und').
    """

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        pred = _lang_id_batch(batch)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "lang": batch["lang"].to_numpy(),
                "lang_pred": pred["lang_pred"].to_numpy(),
            }
        )
        return out[out["lang"] != out["lang_pred"]]

    return docs.select_columns(["doc_id", "lang", "text"]).map_batches(
        flag, batch_format="pandas", batch_size=8192
    )


def lang_mismatch_sql() -> str:
    return f"""
WITH pred AS ({LANG_ID_SQL})
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, p.lang_pred
FROM documents d JOIN pred p ON p.doc_id = d.doc_id
WHERE d.text IS NOT NULL AND d.lang <> p.lang_pred
"""


def length_histogram(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Log2-binned token-length histogram per source — the length
    distribution plot behind every truncation/packing decision, kept
    integer-exact: bin = floor(log2(n_tokens)) computed as the token
    count's BIT LENGTH − 1 (pure integer arithmetic, no float log edge
    cases at powers of two). Combiner shape like every count here.

    Output: source, bin:int64 (log2 bucket), n_docs:int64, n_tokens:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        n_tok = (batch["text"].str.count(" ") + 1).astype("int64")
        # floor(log2(n)) == bit_length(n) - 1 for ints — pure integer
        # arithmetic, no float-log edge case at powers of two
        bins = np.array(
            [int(v).bit_length() - 1 for v in np.maximum(n_tok, 1)],
            dtype="int64",
        )
        g = pd.DataFrame(
            {"source": batch["source"], "bin": bins, "n_tok": n_tok}
        ).groupby(["source", "bin"], sort=False)
        agg = g.agg(n_docs=("n_tok", "size"), n_tokens=("n_tok", "sum"))
        return agg.reset_index()

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source", "bin"], sort=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum")
        ).reset_index()
        g["bin"] = g["bin"].astype("int64")
        g["n_docs"] = g["n_docs"].astype("int64")
        g["n_tokens"] = g["n_tokens"].astype("int64")
        return g

    partials = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )
    return bucketed_group_apply(partials, ["source", "bin"], final, n_buckets=8)


LENGTH_HISTOGRAM_SQL = """
WITH t AS (
  SELECT source, len(string_split(text, ' ')) AS n_tok
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(FLOOR(LOG2(greatest(n_tok, 1))) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM t GROUP BY source, 2
"""


def vocab_by_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source vocabulary statistics — the Heaps'-law corpus gauge every
    training-mix report carries: distinct words vs total occurrences per
    source (type/token ratio falls out downstream).

    Scale shape: occurrences reduce with a per-batch (source, word)-level
    partial BEFORE any shuffle, so the exchange carries per-batch vocabulary
    rows, not the word stream; global distinctness is one SALTED
    (source, word) reduce — a stopword whale ("the" in one source, with one
    partial row per input batch) splits across salt tasks; both reduced
    tables collapse to one row per source via a second salted reduce.
    Output: source, n_distinct_words, n_words.
    """
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    def explode_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        words = batch["text"].str.lower().str.split(" ")
        df = pd.DataFrame({"source": batch["source"], "w": words}).explode("w")
        df = df[df["w"].notna() & (df["w"] != "")]
        g = df.groupby(["source", "w"], sort=False).size().reset_index(name="n")
        return g

    pairs = docs.select_columns(["source", "text"]).map_batches(
        explode_partial, batch_format="pandas", batch_size=4096
    )

    def merge_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source", "w"], sort=False)["n"].sum().reset_index()
        return g

    per_word = salted_group_apply(
        pairs, ["source", "w"], partial_fn=merge_pairs, merge_fn=merge_pairs
    )

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("source", sort=False).agg(
            n_distinct_words=("w", "size"), n_words=("n", "sum")
        ).reset_index()
        return g

    def merge_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False).agg(
            n_distinct_words=("n_distinct_words", "sum"),
            n_words=("n_words", "sum"),
        ).reset_index()
        g["n_distinct_words"] = g["n_distinct_words"].astype("int64")
        g["n_words"] = g["n_words"].astype("int64")
        return g

    return salted_group_apply(
        per_word.map_batches(partial_counts, batch_format="pandas"),
        ["source"],
        partial_fn=merge_counts,
        merge_fn=merge_counts,
    )


VOCAB_SQL = """
WITH w AS (
  SELECT source,
         unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct_words,
       CAST(COUNT(*) AS BIGINT) AS n_words
FROM w GROUP BY source
"""


def vocab_approx_by_source(
    docs: ray.data.Dataset, p: int = 14
) -> ray.data.Dataset:
    """Approximate per-source vocabulary via HyperLogLog — the web-scale
    regime of ``vocab_by_source``: at 10^12 documents the exact
    (source, word) distinct pass shuffles the whole vocabulary, while this
    ships one 2^p-byte register array per (source, batch) regardless of how
    many words a batch holds. The repo's ONE deliberately approximate
    operator family (``functions/hll.py``): standard ±1.04/sqrt(2^p) relative
    error (~0.8% at p=14), asserted against the exact operator in
    tests/test_salted_sites.py; rows-only in the driver (no value-hash
    oracle — declared in ``__ray_entry__.ROWS_ONLY_QUERIES``).

    Register merge is elementwise max (associative/commutative), so the
    per-source reduce salts safely: a whale source's partials split across
    salt tasks. Output: source, n_distinct_words_approx:int64,
    n_words:int64, rel_err_bound:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply
    from tcx2graph_jl_ray.functions.hll import estimate, register_partial

    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        words = batch["text"].str.lower().str.split(" ")
        df = pd.DataFrame({"source": batch["source"], "w": words}).explode("w")
        df = df[df["w"].notna() & (df["w"] != "")]
        rows = []
        for src, g in df.groupby("source", sort=False):
            regs = register_partial(g["w"].to_numpy(), p)
            rows.append(
                {"source": src, "regs": regs.tobytes(), "n_words": len(g)}
            )
        if not rows:
            return pd.DataFrame(
                {"source": pd.Series([], dtype="object"),
                 "regs": pd.Series([], dtype="object"),
                 "n_words": pd.Series([], dtype="int64")}
            )
        out = pd.DataFrame(rows)
        out["n_words"] = out["n_words"].astype("int64")
        return out

    def re_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in bucket.groupby("source", sort=False):
            regs = np.zeros(m, dtype=np.uint8)
            for raw in g["regs"].to_numpy():
                np.maximum(regs, np.frombuffer(raw, dtype=np.uint8), out=regs)
            rows.append(
                {"source": src, "regs": regs.tobytes(),
                 "n_words": int(g["n_words"].sum())}
            )
        out = pd.DataFrame(rows)
        out["n_words"] = out["n_words"].astype("int64")
        return out

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = re_merge(bucket)
        ests = [
            int(round(estimate(np.frombuffer(raw, dtype=np.uint8))))
            for raw in g["regs"].to_numpy()
        ]
        return pd.DataFrame(
            {
                "source": g["source"],
                "n_distinct_words_approx": pd.array(ests, dtype="int64"),
                "n_words": g["n_words"],
                "rel_err_bound": 1.04 / np.sqrt(float(m)),
            }
        )

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )
    return salted_group_apply(
        parts, ["source"], partial_fn=re_merge, merge_fn=final
    )


# PII regex classes written to the RE2 ∩ Python-re common subset (no
# lookaround), applied in a FIXED order so engine and oracle rewrite
# identically even when classes could overlap
_PII_CLASSES = [
    ("email", r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9\-]{7,14}[0-9]", "<PHONE>"),
]


def pii_scrub(docs: ray.data.Dataset) -> ray.data.Dataset:
    """PII detection + redaction — the curation gate every released corpus
    runs: emails, IPv4 literals and international phone numbers are counted
    and replaced with typed tags (email -> ip -> phone, fixed order).
    Patterns live in the RE2 ∩ Python-re common subset so the DuckDB oracle
    (``regexp_replace(..., 'g')`` / ``regexp_extract_all``) rewrites
    byte-identically. Pure vectorized map — no shuffle; pandas' str engine
    compiles each pattern once per batch.

    Output: doc_id, text_clean, n_emails, n_ips, n_phones.
    """

    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        text = batch["text"]
        counts = {}
        for name, pat, tag in _PII_CLASSES:
            counts[name] = text.str.count(pat).astype("int64")
            text = text.str.replace(pat, tag, regex=True)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64").to_numpy(),
                "text_clean": text.to_numpy(),
                "n_emails": counts["email"].to_numpy(),
                "n_ips": counts["ip"].to_numpy(),
                "n_phones": counts["phone"].to_numpy(),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        scrub, batch_format="pandas", batch_size=8192
    )


def pii_scrub_sql() -> str:
    email, ip, phone = (c[1] for c in _PII_CLASSES)
    return rf"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(
         text, '{email}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'),
         '{phone}', '<PHONE>', 'g') AS text_clean,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(regexp_replace(text, '{email}', '<EMAIL>', 'g'), '{ip}'))
            AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), '{phone}'))
            AS BIGINT) AS n_phones
FROM documents WHERE text IS NOT NULL
"""


def heavy_hitter_words(
    docs: ray.data.Dataset,
    phi: float = 0.01,
    depth: int = 4,
    width: int = 16384,
) -> ray.data.Dataset:
    """EXACT φ-frequent words (count >= ceil(φ · total words)) with exact
    counts — without ever shuffling the vocabulary. The textbook two-pass
    count-min heavy hitters:

    1. **Sketch pass**: every batch folds its words into a (depth, width)
       count-min partial (functions/cms.py — constant-size per batch) plus
       its word-count; partials ADD-merge into one corpus sketch and the
       total N. The merge is a real two-level TREE REDUCE: per-batch
       partials add within FAN_IN worker-side buckets, so the driver pulls
       at most FAN_IN sketches — never one per batch (at corpus scale the
       per-batch pull is a driver-network bottleneck, 512 KB x #batches).
    2. **Gated exact pass**: the merged sketch broadcasts (ray.put); each
       batch re-derives its words and keeps only those whose sketch
       ESTIMATE >= T = ceil(φ·N). CMS only overcounts, so the survivors are
       a SUPERSET of the truly φ-frequent — at most width·depth-collision
       inflated, and the truly frequent number <= 1/φ. Survivor partial
       counts bucket-merge and the exact threshold applies to exact counts.

    Result is value-EXACT (the sketch only gates; the counts and the final
    filter are exact), which is why this approximate-machinery operator
    still carries a plain SQL oracle — the measurable-gate discipline of
    ``dedup_lsh_eval`` taken one step further. Output: w, n.
    """
    import math

    import ray as _ray

    from tcx2graph_jl_ray.functions.cms import cms_estimate, cms_partial
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def words_of(batch: pd.DataFrame) -> pd.Series:
        batch = _nonnull_text(batch)
        w = batch["text"].str.lower().str.split(" ").explode()
        return w[w.notna() & (w != "")].reset_index(drop=True)

    FAN_IN = 32

    def sketch_partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = words_of(batch)
        # deterministic fan-in key: the sketches are commutative adds, so
        # ANY assignment works; first doc id spreads batches ~uniformly
        fb = int(batch["doc_id"].iloc[0]) % FAN_IN if len(batch) else 0
        return pd.DataFrame(
            {
                "cms": [cms_partial(w, depth, width).tobytes()],
                "n": pd.array([len(w)], dtype="int64"),
                "fb": pd.array([fb], dtype="int64"),
            }
        )

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros((depth, width), dtype=np.int64)
        for raw in bucket["cms"].to_numpy():
            acc += np.frombuffer(raw, dtype=np.int64).reshape(depth, width)
        return pd.DataFrame(
            {"cms": [acc.tobytes()],
             "n": pd.array([int(bucket["n"].sum())], dtype="int64"),
             "fb": pd.array([0], dtype="int64")}
        )

    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply as _bga,
    )

    # two-level tree reduce: per-batch partials add WITHIN FAN_IN buckets on
    # workers, so the driver pulls <= FAN_IN sketches (512 KB each) — never
    # one per batch (which at corpus scale is the driver's network, not its
    # CPU, that breaks)
    parts = _bga(
        docs.select_columns(["doc_id", "text"]).map_batches(
            sketch_partial, batch_format="pandas", batch_size=8192
        ),
        ["fb"],
        merge_bucket,
        n_buckets=FAN_IN,
    )

    merged = np.zeros((depth, width), dtype=np.int64)
    total = 0
    for b in parts.iter_batches(batch_size=FAN_IN, batch_format="pandas"):
        for raw, n in zip(b["cms"].to_numpy(), b["n"].to_numpy()):
            merged += np.frombuffer(raw, dtype=np.int64).reshape(depth, width)
            total += int(n)

    if total == 0:
        # typed empty PANDAS frame, deliberately not a Dataset: Ray drops
        # empty blocks at to_pandas()/schema(), so a Dataset return would
        # lose the (w, n) schema the driver contract checks (verified on
        # both from_pandas and from_arrow empty blocks)
        return pd.DataFrame(
            {"w": pd.Series([], dtype="object"),
             "n": pd.Series([], dtype="int64")}
        )
    threshold = int(math.ceil(phi * total))
    cms_ref = _ray.put(merged)

    class _Gate:
        def __init__(self, ref, t):
            self.cms = _ray.get(ref)
            self.t = t

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            w = words_of(batch)
            if not len(w):
                return pd.DataFrame(
                    {"w": pd.Series([], dtype="object"),
                     "n": pd.Series([], dtype="int64")}
                )
            keep = w[cms_estimate(self.cms, w) >= self.t]
            g = keep.groupby(keep, sort=False).size()
            return pd.DataFrame(
                {"w": g.index.to_numpy(), "n": g.to_numpy().astype("int64")}
            )

    survivors = docs.select_columns(["text"]).map_batches(
        _Gate,
        fn_constructor_args=(cms_ref, threshold),
        batch_format="pandas",
        batch_size=8192,
        concurrency=(1, 8),
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("w", sort=False)["n"].sum().reset_index()
        g = g[g["n"] >= threshold]
        g["n"] = g["n"].astype("int64")
        return g

    return bucketed_group_apply(survivors, ["w"], merge)


def heavy_hitters_sql(phi: float = 0.01) -> str:
    return f"""
WITH w AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
  FROM documents WHERE text IS NOT NULL
),
tot AS (SELECT COUNT(*) AS n FROM w)
SELECT w, CAST(COUNT(*) AS BIGINT) AS n
FROM w GROUP BY w
HAVING COUNT(*) >= ceil((SELECT n FROM tot) * {phi})
"""


# fixed keyword queries for the BM25 surface (terms drawn from the corpus
# vocabulary; a production caller passes its own)
BM25_QUERIES: tuple = (
    (0, ("spark", "join")),
    (1, ("window", "sort")),
    (2, ("customer",)),
)


def bm25_topk(
    docs: ray.data.Dataset,
    queries=BM25_QUERIES,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> ray.data.Dataset:
    """BM25 top-k retrieval over the corpus — the lexical-retrieval operator
    a RAG / data-curation stack runs next to the ANN family (Robertson &
    Zaragoza 2009, the standard public formulation):

        score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
        idf(t)      = ln((N − df + 0.5)/(df + 0.5) + 1)

    Scale shape — no inverted-index shuffle is needed for scoring because a
    document's text lives in ONE row: pass 1 reduces N, total length and
    per-query-term document frequencies from per-batch partials (tiny: one
    row per batch per term); the resulting idf/avgdl table broadcasts
    (query-term-bounded); pass 2 scores each batch's docs entirely in-batch
    and keeps a LOCAL top-k per query, so only batches × k rows reach the
    final per-query merge. Scores round to 6 (summation-order guard), ties
    break on doc_id. Output: query_id, doc_id, rank, score.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    terms = sorted({t for _, ts in queries for t in ts})

    def _tf_matrix(batch: pd.DataFrame):
        """Vectorized per-batch term-frequency matrix: one token explode +
        categorical bincount — no per-row Python over token lists.
        Returns (dl, tf) with dl[i] = non-empty token count of doc i and
        tf[i, j] = count of terms[j] in doc i."""
        lists = batch["text"].str.lower().str.split(" ")
        n = len(batch)
        if n == 0:
            return np.zeros(0), np.zeros((0, len(terms)))
        counts = lists.str.len().to_numpy(dtype="int64")
        idx = np.repeat(np.arange(n), counts)
        words = np.concatenate(lists.to_numpy()) if counts.sum() else np.array(
            [], dtype=object
        )
        keep = words != ""
        idx, words = idx[keep], words[keep]
        dl = np.bincount(idx, minlength=n).astype("float64")
        codes = pd.Categorical(words, categories=terms).codes
        hit = codes >= 0
        tf = np.zeros((n, len(terms)))
        np.add.at(tf, (idx[hit], codes[hit]), 1.0)
        return dl, tf

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        dl, tf = _tf_matrix(batch)
        rows = {"__n": [len(batch)], "__len": [int(dl.sum())]}
        df_t = (tf > 0).sum(axis=0)
        for j, t in enumerate(terms):
            rows[f"df_{t}"] = [int(df_t[j])]
        return pd.DataFrame(rows)

    agg = (
        docs.select_columns(["text"])
        .map_batches(stats_partial, batch_format="pandas", batch_size=8192)
        .to_pandas()
        .sum()
    )
    n_docs = int(agg["__n"])
    if n_docs == 0:
        # typed empty PANDAS frame, deliberately not a Dataset: Ray drops
        # empty blocks at to_pandas()/schema(), so a Dataset return would
        # lose the typed schema the driver contract checks
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "doc_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )
    avgdl = float(agg["__len"]) / n_docs
    idf = {
        t: float(np.log((n_docs - int(agg[f"df_{t}"]) + 0.5)
                        / (int(agg[f"df_{t}"]) + 0.5) + 1.0))
        for t in terms
    }

    kk, k1f, bf = k, k1, b
    qlist = [(int(qid), tuple(ts)) for qid, ts in queries]

    term_col = {t: j for j, t in enumerate(terms)}

    def score_local(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        dl, tf_mat = _tf_matrix(batch)
        ids = batch["doc_id"].astype("int64").to_numpy()
        norm = k1f * (1.0 - bf + bf * dl / avgdl)
        out = []
        for qid, ts in qlist:
            s = np.zeros(len(ids))
            for t in ts:
                tf = tf_mat[:, term_col[t]]
                s += idf[t] * tf * (k1f + 1.0) / (tf + norm)
            s = np.round(s, 6)
            hit = s > 0
            if not hit.any():
                continue
            hids, hs = ids[hit], s[hit]
            top = np.lexsort((hids, -hs))[: min(kk, len(hids))]
            out.append(
                pd.DataFrame(
                    {"query_id": np.int64(qid), "doc_id": hids[top],
                     "score": hs[top]}
                )
            )
        if not out:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    partials = docs.select_columns(["doc_id", "text"]).map_batches(
        score_local, batch_format="pandas", batch_size=8192
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "score", "doc_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        out = []
        for qid, gg in g.groupby("query_id", sort=False):
            top = gg.head(kk)
            out.append(
                pd.DataFrame(
                    {"query_id": top["query_id"].astype("int64").to_numpy(),
                     "doc_id": top["doc_id"].astype("int64").to_numpy(),
                     "rank": pd.array(range(1, len(top) + 1), dtype="int64"),
                     "score": top["score"].to_numpy()}
                )
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(partials, ["query_id"], merge, n_buckets=4)


def bm25_sql(
    queries=BM25_QUERIES, k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    qvals = ",\n  ".join(
        f"({qid}, '{t}')" for qid, ts in queries for t in ts
    )
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
stats AS (SELECT COUNT(*) AS n, SUM(len(l)) AS total_len FROM d),
q(query_id, term) AS (VALUES
  {qvals}
),
df AS (
  SELECT q.term, COUNT(*) AS df
  FROM (SELECT DISTINCT term FROM q) q
  JOIN d ON list_contains(d.l, q.term)
  GROUP BY q.term
),
tf AS (
  SELECT q.query_id, q.term, d.doc_id,
         CAST(len(list_filter(d.l, x -> x = q.term)) AS DOUBLE) AS tf,
         CAST(len(d.l) AS DOUBLE) AS dl
  FROM q JOIN d ON list_contains(d.l, q.term)
),
score AS (
  SELECT tf.query_id, tf.doc_id,
         ROUND(SUM(
           ln((CAST(s.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({k1} + 1.0)
           / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl
                              / (CAST(s.total_len AS DOUBLE) / s.n)))
         ), 6) AS score
  FROM tf JOIN df ON df.term = tf.term CROSS JOIN stats s
  GROUP BY tf.query_id, tf.doc_id
),
r AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM score WHERE score > 0
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rank AS BIGINT) AS rank,
       score
FROM r WHERE rank <= {k}
"""


def char_entropy(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document character-level Shannon entropy — the classic cheap
    quality gate (Gopher/RefinedWeb-style rules drop near-zero-entropy
    boilerplate and high-entropy binary junk).

    Fully vectorized across the BATCH, not per doc: all texts' bytes are
    concatenated once, and one ``bincount`` over ``doc_ordinal*256 + byte``
    yields every document's character histogram in a single kernel — a pure
    map stage, no shuffle, embarrassingly parallel at any corpus size. Byte
    histogram == character histogram for ASCII corpora (this corpus is
    ASCII; the character-based SQL oracle assumes it, as in
    ``_distinct_char_grams``).

    Output: doc_id, n_chars:int64, char_entropy:float64 (bits, round 6;
    ``+ 0.0`` forces IEEE -0.0 -> +0.0 on single-character documents so the
    value hash matches the oracle). Empty/null texts are absent.
    """

    def ent(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        batch = batch[batch["text"].str.len() > 0]
        n = len(batch)
        if n == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_chars": pd.Series([], dtype="int64"),
                    "char_entropy": pd.Series([], dtype="float64"),
                }
            )
        enc = [t.encode("utf-8") for t in batch["text"]]
        lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
        idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        allb = np.frombuffer(b"".join(enc), dtype=np.uint8)
        counts = np.bincount(idx * 256 + allb, minlength=n * 256).reshape(n, 256)
        p = counts / lens[:, None]
        term = np.where(counts > 0, p * np.log2(np.where(counts > 0, p, 1.0)), 0.0)
        e = -term.sum(axis=1) + 0.0
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_chars": lens,
                "char_entropy": np.round(e, 6),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        ent, batch_format="pandas", batch_size=4096
    )


CHAR_ENTROPY_SQL = """
WITH c AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM documents, unnest(range(1, len(text) + 1)) AS t(i)
  WHERE text IS NOT NULL AND len(text) > 0
  GROUP BY doc_id, ch
),
tot AS (SELECT doc_id, SUM(n) AS nt FROM c GROUP BY doc_id)
SELECT c.doc_id,
       CAST(tot.nt AS BIGINT) AS n_chars,
       ROUND(0.0 - SUM((c.n / tot.nt) * log2(c.n / tot.nt)), 6) AS char_entropy
FROM c JOIN tot ON c.doc_id = tot.doc_id
GROUP BY c.doc_id, tot.nt
"""


def zipf_slope_by_source(docs: ray.data.Dataset, top_n: int = 50) -> ray.data.Dataset:
    """Per-source Zipf fit: OLS slope of ln(frequency) on ln(rank) over the
    top-N words — the corpus-health diagnostic (natural text sits near -1;
    boilerplate-heavy or synthetic sources drift off it; Piantadosi 2014
    reviews the law).

    Scale shape: (source, word) occurrence counts reduce with the same
    pre-shuffle combiner + SALTED exchange as ``vocab_by_source`` (a
    stopword whale never lands in one task); per-source top-N is two-phase
    (per-block head-N per source, then one driver merge bounded by
    N × sources × blocks); the regression itself runs over <= N points per
    source — sources are dimension-bounded (the stated bound of every
    per-source report here). The slope is tie-ORDER-invariant: equal
    frequencies contribute identical (ln n) terms whichever word takes
    which rank, so the deterministic (n desc, w asc) tie-break is cosmetic,
    not load-bearing.

    Output: source, n_top:int64 (= min(top_n, vocabulary)), zipf_slope
    (round 6).
    """
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    def explode_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        words = batch["text"].str.lower().str.split(" ")
        df = pd.DataFrame({"source": batch["source"], "w": words}).explode("w")
        df = df[df["w"].notna() & (df["w"] != "")]
        return df.groupby(["source", "w"], sort=False).size().reset_index(name="n")

    def merge_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source", "w"], sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    counts = salted_group_apply(
        docs.select_columns(["source", "text"]).map_batches(
            explode_partial, batch_format="pandas", batch_size=4096
        ),
        ["source", "w"],
        partial_fn=merge_pairs,
        merge_fn=merge_pairs,
    )

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(["source", "n", "w"], ascending=[True, False, True])
            .groupby("source", sort=False)
            .head(top_n)
        )

    cand = counts.map_batches(local_top, batch_format="pandas").to_pandas()
    if not len(cand):
        # empty corpus: the collected frame may arrive column-less (Ray
        # drops empty blocks), so return the typed empty frame directly
        return pd.DataFrame(
            {"source": pd.Series([], dtype="object"),
             "n_top": pd.Series([], dtype="int64"),
             "zipf_slope": pd.Series([], dtype="float64")}
        )
    top = (
        cand.sort_values(["source", "n", "w"], ascending=[True, False, True])
        .groupby("source", sort=False)
        .head(top_n)
    )

    out = []
    for src, g in top.groupby("source", sort=False):
        y = np.log(g["n"].to_numpy(dtype="float64"))
        m = y.size
        x = np.log(np.arange(1, m + 1, dtype="float64"))
        denom = m * np.sum(x * x) - np.sum(x) ** 2
        slope = (m * np.sum(x * y) - np.sum(x) * np.sum(y)) / denom
        out.append((src, m, float(np.round(slope, 6))))
    df = pd.DataFrame(out, columns=["source", "n_top", "zipf_slope"])
    df["n_top"] = df["n_top"].astype("int64")
    df["zipf_slope"] = df["zipf_slope"].astype("float64")
    if not len(df):
        # typed empty PANDAS frame (house pattern, heavy_hitter_words):
        # an empty Dataset loses its schema at to_pandas()
        return df
    return ray.data.from_pandas(df)


ZIPF_SLOPE_SQL_TEMPLATE = """
WITH w AS (
  SELECT source,
         unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
  FROM documents WHERE text IS NOT NULL
),
c AS (SELECT source, w, COUNT(*) AS n FROM w GROUP BY source, w),
r AS (SELECT source, n,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, w) AS rnk
      FROM c),
t AS (SELECT source, ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
      FROM r WHERE rnk <= {top_n})
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_top,
       ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
             / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 6) AS zipf_slope
FROM t GROUP BY source
"""


def length_percent_rank(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Distributional CALIBRATION of a per-doc metric: the exact
    PERCENT_RANK of every document's token count — the normalization that
    turns raw quality/length scores into corpus-relative [0,1] scores for
    threshold-free filtering (``length_deciles``' NTILE gives coarse
    buckets; this is the continuous CDF transform).

    Exactly SQL's (RANK()-1)/(n-1) with RANK = min rank over ties.
    Distributed as a count-of-counts: per-batch token-count histograms
    partial-merge (combiner — the value domain is bounded by the longest
    document, NOT the corpus), the driver prefix-sums the tiny histogram
    into cum_below per distinct count, and a broadcast lookup maps every
    doc. One double division + round 6 on both sides; n == 1 degenerates
    to 0.0 (SQL's 0/0 guard).

    Output: doc_id, n_tokens:int64, pr:float64.
    """
    import pyarrow as pa
    import ray as _ray

    from tcx2graph_jl_ray.functions.arrowutil import with_schema

    def ntok(batch: pd.DataFrame) -> pd.DataFrame:
        # non-empty single-space-split tokens == maximal [^ ]+ runs: one
        # vectorized regex count, no per-row Python over token lists
        n = batch["text"].str.count(r"[^ ]+").fillna(0)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].astype("int64"),
             "n_tokens": n.astype("int64")}
        )

    counts = docs.select_columns(["doc_id", "text"]).map_batches(
        ntok, batch_format="pandas", batch_size=65536
    ).materialize()

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("n_tokens", sort=False).size()
        return pd.DataFrame(
            {"n_tokens": g.index.to_numpy(), "c": g.to_numpy().astype("int64")}
        )

    # histogram rows are one per DISTINCT token count — bounded by the
    # longest doc, so the driver merge is constant-size at any corpus scale
    h = counts.map_batches(hist, batch_format="pandas").to_pandas()
    h = h.groupby("n_tokens", sort=True)["c"].sum()
    total = int(h.sum())
    cum_below = (h.cumsum() - h).astype("int64")
    lut_ref = _ray.put(dict(zip(h.index.astype("int64"), cum_below)))

    class _Rank:
        def __init__(self, ref, n):
            self.lut = _ray.get(ref)
            self.n = n

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            below = batch["n_tokens"].map(self.lut).astype("int64")
            pr = (
                np.round(below.to_numpy() / float(self.n - 1), 6)
                if self.n > 1
                else np.zeros(len(batch))
            )
            return pd.DataFrame(
                {"doc_id": batch["doc_id"].astype("int64"),
                 "n_tokens": batch["n_tokens"].astype("int64"),
                 "pr": pr.astype("float64")}
            )

    out = counts.map_batches(
        _Rank,
        fn_constructor_args=(lut_ref, total),
        batch_format="pandas",
        batch_size=65536,
        concurrency=(1, 8),
    )
    return with_schema(
        out,
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("pr", pa.float64())],
    )


LENGTH_PERCENT_RANK_SQL = """
WITH d AS (
  SELECT doc_id,
         CAST(CASE WHEN text IS NULL THEN 0
              ELSE len(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) END AS BIGINT) AS n_tokens
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
       ROUND(CASE WHEN COUNT(*) OVER () = 1 THEN 0.0
             ELSE CAST(RANK() OVER (ORDER BY n_tokens) - 1 AS DOUBLE)
                  / (COUNT(*) OVER () - 1) END, 6) AS pr
FROM d
"""


def rrf_fusion(
    docs: ray.data.Dataset,
    queries=BM25_QUERIES,
    k: int = 10,
    rrf_k: int = 60,
) -> ray.data.Dataset:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR'09) of the
    BM25 lexical ranking with a query-independent QUALITY PRIOR ranking
    (stopword-ratio, the natural-prose signal from ``quality_stats``) — the
    standard two-ranker fusion a retrieval stack runs when it has no
    trained re-ranker:

        rrf(q, d) = 1/(rrf_k + rank_bm25(q, d)) + 1/(rrf_k + rank_prior(d))

    with a list absence contributing 0. Both inputs are top-``k`` lists, so
    the fusion operates on (|queries| + 1) · k rows — RANK-BOUNDED, never
    corpus-bounded: bm25_topk's two distributed passes produce the lexical
    lists, the prior list reduces via per-batch local top-k + one bounded
    merge, and the fuse itself is a driver join over <= (nq+1)·k rows (the
    dimension-bounded-driver convention, bound stated here). The two
    reciprocal terms are one double expression on both sides; ties break on
    doc_id. Output: query_id, doc_id, rrf:float64, rank:int64 (1..k).
    """
    import pyarrow as pa

    from tcx2graph_jl_ray.functions.arrowutil import with_schema

    bm = bm25_topk(docs, queries, k)
    bm_df = bm.to_pandas() if not isinstance(bm, pd.DataFrame) else bm
    # bm25_topk's empty-corpus path returns a typed empty pandas frame

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_frame(batch)
        q = q[q["n_tokens"] > 0]
        q = q.sort_values(
            ["stopword_ratio", "doc_id"], ascending=[False, True],
            kind="mergesort",
        ).head(k)
        return q[["doc_id", "stopword_ratio"]]

    prior = docs.select_columns(["doc_id", "text"]).map_batches(
        local_top, batch_format="pandas", batch_size=65536
    ).to_pandas()  # batches x k rows, k-bounded merge
    prior = prior.sort_values(
        ["stopword_ratio", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k).reset_index(drop=True)
    prior["rank_prior"] = np.arange(1, len(prior) + 1, dtype="int64")

    out_rows = []
    for qid in sorted(bm_df["query_id"].unique()) if len(bm_df) else []:
        lex = bm_df[bm_df["query_id"] == qid][["doc_id", "rank"]]
        m = lex.merge(prior[["doc_id", "rank_prior"]], on="doc_id", how="outer")
        r1 = m["rank"].to_numpy(dtype="float64", na_value=np.inf)
        r2 = m["rank_prior"].to_numpy(dtype="float64", na_value=np.inf)
        rrf = np.round(
            np.where(np.isinf(r1), 0.0, 1.0 / (rrf_k + r1))
            + np.where(np.isinf(r2), 0.0, 1.0 / (rrf_k + r2)),
            6,
        )
        f = pd.DataFrame(
            {"query_id": qid, "doc_id": m["doc_id"].astype("int64"),
             "rrf": rrf}
        ).sort_values(["rrf", "doc_id"], ascending=[False, True],
                      kind="mergesort").head(k).reset_index(drop=True)
        f["rank"] = np.arange(1, len(f) + 1, dtype="int64")
        out_rows.append(f)
    fused = (
        pd.concat(out_rows, ignore_index=True)
        if out_rows
        else pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "doc_id": pd.Series([], dtype="int64"),
             "rrf": pd.Series([], dtype="float64"),
             "rank": pd.Series([], dtype="int64")}
        )
    )
    fused["query_id"] = fused["query_id"].astype("int64")
    return with_schema(
        ray.data.from_pandas(fused) if len(fused) else ray.data.from_arrow(
            pa.schema(
                [("query_id", pa.int64()), ("doc_id", pa.int64()),
                 ("rrf", pa.float64()), ("rank", pa.int64())]
            ).empty_table()
        ),
        [("query_id", pa.int64()), ("doc_id", pa.int64()),
         ("rrf", pa.float64()), ("rank", pa.int64())],
    )


def rrf_fusion_sql(k: int = 10, rrf_k: int = 60) -> str:
    """DuckDB oracle for ``rrf_fusion``: bm25_sql()'s ranked lists FULL
    OUTER JOIN the stopword-ratio prior top-k, one shared reciprocal
    expression, re-ranked per query."""
    return f"""
WITH bm AS ({bm25_sql()}),
prior AS (
  SELECT doc_id, ROW_NUMBER() OVER (
           ORDER BY stopword_ratio DESC, doc_id) AS rank_prior
  FROM ({QUALITY_SQL})
  WHERE n_tokens > 0
  ORDER BY stopword_ratio DESC, doc_id
  LIMIT {k}
),
qids AS (SELECT DISTINCT query_id FROM bm),
cand AS (
  SELECT query_id, doc_id FROM bm
  UNION
  SELECT q.query_id, p.doc_id FROM qids q CROSS JOIN prior p
),
fused AS (
  SELECT c.query_id, c.doc_id,
         ROUND(COALESCE(1.0 / ({rrf_k} + b.rank), 0)
               + COALESCE(1.0 / ({rrf_k} + p.rank_prior), 0), 6) AS rrf
  FROM cand c
  LEFT JOIN bm b ON b.query_id = c.query_id AND b.doc_id = c.doc_id
  LEFT JOIN prior p ON p.doc_id = c.doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id, rrf,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT query_id, doc_id, rrf,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, doc_id) AS rank
  FROM fused
)
WHERE rank <= {k}
"""


def doc_keywords(docs: ray.data.Dataset, k_top: int = 3) -> ray.data.Dataset:
    """Per-DOCUMENT keyword extraction: the ``k_top`` terms of each doc by
    linear-idf TF-IDF (score = tf * n_docs / df — ONE IEEE division, the
    ``tfidf_top_terms`` bit-exactness discipline), ties broken by term. The
    per-doc counterpart of the per-source characteristic vocabulary: what a
    retrieval index or dataset card stores per document.

    Shape: documents are one row per doc, so per-batch tokenization yields
    FINAL (doc, term) tf counts with no combine shuffle; document frequency
    is the group size inside a term-bucketed apply (no vocab broadcast, no
    join); per-doc top-k is one doc-bucketed apply with a vectorized
    cumcount rank — never a Python loop over docs. The only driver scalar is
    n_docs. Output: doc_id, term, tf, df, score, rank."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    nn = docs.select_columns(["doc_id", "text"]).map_batches(
        _nonnull_text, batch_format="pandas", batch_size=8192
    )
    n_docs = nn.count()

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split(" ")
        toks = toks.map(lambda ws: [w for w in ws if w])
        n = toks.str.len().astype("int64")
        did = np.repeat(batch["doc_id"].to_numpy(), n.to_numpy())
        term = [t for ws in toks for t in ws]
        df = pd.DataFrame({"doc_id": did, "term": term})
        g = df.groupby(["doc_id", "term"], sort=False).size().reset_index(
            name="tf"
        )
        g["doc_id"] = g["doc_id"].astype("int64")
        g["tf"] = g["tf"].astype("int64")
        return g

    def score(bucket: pd.DataFrame) -> pd.DataFrame:
        # one row per (doc, term) already, so rows-per-term IS the df
        bucket = bucket.copy()
        bucket["df"] = bucket.groupby("term", sort=False)["doc_id"].transform(
            "size"
        ).astype("int64")
        bucket["score"] = (bucket["tf"] * n_docs).astype("float64") / bucket[
            "df"
        ].astype("float64")
        return bucket

    def topk(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.assign(
            rank=(g.groupby("doc_id", sort=False).cumcount() + 1).astype(
                "int64"
            )
        )
        return g[g["rank"] <= k_top].reset_index(drop=True)

    counts = nn.map_batches(partial, batch_format="pandas", batch_size=4096)
    scored = bucketed_group_apply(counts, ["term"], score)
    return bucketed_group_apply(scored, ["doc_id"], topk)


DOC_KEYWORDS_SQL_TEMPLATE = """
WITH tk AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
t AS (SELECT doc_id, unnest(l) AS term FROM tk),
c AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM t GROUP BY doc_id, term),
d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM c GROUP BY term),
n AS (SELECT COUNT(*) AS ndoc FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT c.doc_id, c.term, c.tf, d.df,
         CAST(c.tf * n.ndoc AS DOUBLE) / CAST(d.df AS DOUBLE) AS score
  FROM c JOIN d USING (term), n
),
r AS (
  SELECT doc_id, term, tf, df, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM s
)
SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k_top}
"""


def readability(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document Flesch-style readability from three regex-countable
    signals — words (non-space runs), sentence marks ([.!?]+ runs, clamped
    to >= 1), and syllables (vowel-group runs [aeiouy]+ on the lowered
    text, the standard public heuristic) — the reading-ease quality score a
    curation funnel bins corpora by.

    score = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words),
    written as the IDENTICAL IEEE expression on both sides and rounded to 6
    (house float discipline). Embarrassingly parallel: one vectorized
    map_batches, no shuffle. Zero-word docs drop (mirrored by the oracle's
    WHERE). Output: doc_id, n_words, n_sentences, n_syllables, flesch."""

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        words = b["text"].str.count(r"[^ ]+").astype("int64")
        sents = b["text"].str.count(r"[.!?]+").astype("int64")
        syl = b["text"].str.lower().str.count(r"[aeiouy]+").astype("int64")
        k = (words > 0).to_numpy()
        w = words.to_numpy(dtype="float64")[k]
        s = np.maximum(sents.to_numpy(dtype="float64")[k], 1.0)
        y = syl.to_numpy(dtype="float64")[k]
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy()[k],
                "n_words": words.to_numpy()[k],
                "n_sentences": sents.to_numpy()[k],
                "n_syllables": syl.to_numpy()[k],
                "flesch": np.round(flesch, 6),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        per_batch, batch_format="pandas", batch_size=8192
    )


READABILITY_SQL = """
WITH m AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       ROUND(206.835
             - 1.015 * (CAST(n_words AS DOUBLE)
                        / GREATEST(CAST(n_sentences AS DOUBLE), 1.0))
             - 84.6 * (CAST(n_syllables AS DOUBLE)
                       / CAST(n_words AS DOUBLE)), 6) AS flesch
FROM m WHERE n_words > 0
"""


def hapax_ratio(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source hapax legomena ratio: the share of each source's
    vocabulary that occurs exactly once — the classic lexical-richness /
    OCR-noise signal next to ``vocab_by_source``'s Heaps gauge (a spike in
    hapaxes flags garbled text; a collapse flags boilerplate).

    Same scale shape as ``vocab_by_source``: per-batch (source, word)
    partials, one SALTED (source, word) exact reduce (stopword whales
    split), then a salted per-source rollup counting n == 1 rows. The
    ratio is one division of exact ints, rounded 6. Output: source,
    n_hapax, n_distinct_words, hapax_ratio."""
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    def explode_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        words = batch["text"].str.lower().str.split(" ")
        df = pd.DataFrame({"source": batch["source"], "w": words}).explode("w")
        df = df[df["w"].notna() & (df["w"] != "")]
        return df.groupby(["source", "w"], sort=False).size().reset_index(
            name="n"
        )

    pairs = docs.select_columns(["source", "text"]).map_batches(
        explode_partial, batch_format="pandas", batch_size=4096
    )

    def merge_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby(["source", "w"], sort=False)["n"].sum()\
            .reset_index()

    per_word = salted_group_apply(
        pairs, ["source", "w"], partial_fn=merge_pairs, merge_fn=merge_pairs
    )

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.assign(h=(batch["n"] == 1).astype("int64")).groupby(
            "source", sort=False
        ).agg(n_hapax=("h", "sum"), n_distinct_words=("h", "size"))
        return g.reset_index()

    def merge_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False).agg(
            n_hapax=("n_hapax", "sum"),
            n_distinct_words=("n_distinct_words", "sum"),
        ).reset_index()
        h = g["n_hapax"].astype("int64")
        v = g["n_distinct_words"].astype("int64")
        return pd.DataFrame({
            "source": g["source"],
            "n_hapax": h,
            "n_distinct_words": v,
            "hapax_ratio": np.round(
                h.to_numpy(dtype="float64") / v.to_numpy(dtype="float64"), 6
            ),
        })

    return salted_group_apply(
        per_word.map_batches(partial_counts, batch_format="pandas"),
        ["source"],
        partial_fn=lambda b: b.groupby("source", sort=False).agg(
            n_hapax=("n_hapax", "sum"),
            n_distinct_words=("n_distinct_words", "sum"),
        ).reset_index(),
        merge_fn=merge_counts,
    )


HAPAX_SQL = """
WITH w AS (
  SELECT source,
         unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
  FROM documents WHERE text IS NOT NULL
),
c AS (SELECT source, w, COUNT(*) AS n FROM w GROUP BY source, w)
SELECT source,
       CAST(COUNT(*) FILTER (n = 1) AS BIGINT) AS n_hapax,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       ROUND(CAST(COUNT(*) FILTER (n = 1) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio
FROM c GROUP BY source
"""


def collocations(
    docs: ray.data.Dataset,
    min_n: int = 5,
    k_top: int = 50,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Corpus collocations: the ``k_top`` word bigrams (count >= ``min_n``)
    ranked by LIFT — n_ab·N / (n_a·n_b), the linear association measure
    (the log of it is PMI; staying linear keeps the score ONE exact-int
    division, the ``rel_basket_lift`` discipline — libm-free). "new york"
    scores high, "of the" scores ~1. Ties break by bigram text.

    Shape: unigram and bigram counts each reduce through per-batch partials
    + a bucketed exact sum; the two unigram attachments are co-partitioned
    ``hash_join``s on the word (no vocab broadcast); the global top-k is a
    per-bucket local head-k + one <= n_buckets*k_top-row driver merge
    (``events_busy_minutes``). int64 bound: n_ab·N must fit (any corpus
    under ~2^31 tokens with bigram counts under ~2^31 does; beyond that,
    scale N down by documented sampling). Output: w1, w2, n_ab, n_a, n_b,
    lift, rank."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    nn = docs.select_columns(["text"]).map_batches(
        _nonnull_text, batch_format="pandas", batch_size=8192
    ).materialize()

    def uni_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split(" ")
        words = [w for ws in toks for w in ws if w]
        c = pd.Series(words).value_counts()
        return pd.DataFrame({"w": c.index, "n": c.to_numpy().astype("int64")})

    def bi_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split(" ").map(
            lambda ws: [w for w in ws if w]
        )
        pairs = [
            (ws[i], ws[i + 1])
            for ws in toks for i in range(len(ws) - 1)
        ]
        if not pairs:
            return pd.DataFrame({
                "w1": pd.Series([], dtype="object"),
                "w2": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            })
        df = pd.DataFrame(pairs, columns=["w1", "w2"])
        g = df.groupby(["w1", "w2"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    def sum_uni(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("w", sort=False)["n"].sum()
        return pd.DataFrame({"w": g.index,
                             "n": g.to_numpy().astype("int64")})

    def sum_bi(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()
        g = g[g["n"] >= min_n]
        g["n"] = g["n"].astype("int64")
        return g

    uni = bucketed_group_apply(
        nn.map_batches(uni_partial, batch_format="pandas", batch_size=4096),
        ["w"], sum_uni, n_buckets=n_buckets,
    ).materialize()
    n_total = int(uni.sum("n"))
    bi = bucketed_group_apply(
        nn.map_batches(bi_partial, batch_format="pandas", batch_size=4096),
        ["w1", "w2"], sum_bi, n_buckets=n_buckets,
    )

    j1 = hash_join(
        bi.map_batches(
            lambda b: b.rename(columns={"n": "n_ab", "w1": "w"}),
            batch_format="pandas",
        ),
        uni.map_batches(
            lambda b: b.rename(columns={"n": "n_a"}), batch_format="pandas",
        ),
        on="w",
        n_buckets=n_buckets,
    ).map_batches(
        lambda b: b.rename(columns={"w": "w1", "w2": "w"}),
        batch_format="pandas",
    )
    j2 = hash_join(
        j1,
        uni.map_batches(
            lambda b: b.rename(columns={"n": "n_b"}), batch_format="pandas",
        ),
        on="w",
        n_buckets=n_buckets,
    )

    def local_top(bucket: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame({
            "w1": bucket["w1"], "w2": bucket["w"],
            "n_ab": bucket["n_ab"].astype("int64"),
            "n_a": bucket["n_a"].astype("int64"),
            "n_b": bucket["n_b"].astype("int64"),
        })
        b["lift"] = np.round(
            (b["n_ab"].to_numpy() * np.int64(n_total)).astype("float64")
            / (b["n_a"].to_numpy() * b["n_b"].to_numpy()).astype("float64"),
            6,
        )
        return b.sort_values(["lift", "w1", "w2"],
                             ascending=[False, True, True],
                             kind="mergesort").head(k_top)

    cands = bucketed_group_apply(
        j2, ["w1", "w"], local_top, n_buckets=8
    ).to_pandas()  # <= 8 * k_top rows
    if not len(cands):
        return pd.DataFrame({
            "w1": pd.Series([], dtype="object"),
            "w2": pd.Series([], dtype="object"),
            "n_ab": pd.Series([], dtype="int64"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "lift": pd.Series([], dtype="float64"),
            "rank": pd.Series([], dtype="int64"),
        })
    top = cands.sort_values(
        ["lift", "w1", "w2"], ascending=[False, True, True], kind="mergesort"
    ).head(k_top).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype="int64")
    return ray.data.from_pandas(top)


COLLOCATIONS_SQL_TEMPLATE = """
WITH tk AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
uni AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(l) AS w FROM tk) GROUP BY w
),
nn AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM uni),
bi AS (
  SELECT l[i] AS w1, l[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM tk, unnest(range(1, len(l))) AS t(i)
  WHERE len(l) >= 2
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_n}
),
s AS (
  SELECT b.w1, b.w2, b.n_ab, ua.n AS n_a, ub.n AS n_b,
         ROUND(CAST(b.n_ab * nn.n AS DOUBLE)
               / CAST(ua.n * ub.n AS DOUBLE), 6) AS lift
  FROM bi b JOIN uni ua ON ua.w = b.w1
  JOIN uni ub ON ub.w = b.w2
  CROSS JOIN nn
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, w1, w2) AS rank
  FROM s
)
SELECT w1, w2, n_ab, n_a, n_b, lift, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k_top}
"""


def dup_sentences(
    docs: ray.data.Dataset,
    min_docs: int = 2,
    k_top: int = 50,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Boilerplate sentence detection: sentences (maximal [.!?]-delimited,
    whitespace-trimmed, lowercased) that appear in at least ``min_docs``
    DISTINCT documents, top-``k_top`` by reach — the repeated-footer /
    template-paragraph signal that gram-level dedup
    (``dedup_substring_grams``) pays k-gram granularity for.

    Shape: per-batch explode + (sentence, doc) dedup (documents are one
    row per doc, so per-batch pairs are final), one sentence-bucketed
    exact distinct-doc count (a boilerplate whale's rows split across the
    dedup partial first), per-bucket local head-k, bounded driver merge
    (``events_busy_minutes``). Output: sentence, n_docs, rank."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        parts = b["text"].str.lower().str.split(r"[.!?]+", regex=True)
        df = pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"), "sentence": parts,
        }).explode("sentence")
        df["sentence"] = df["sentence"].str.strip()
        df = df[df["sentence"].notna() & (df["sentence"] != "")]
        return df.drop_duplicates()

    pairs = docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pandas", batch_size=4096
    )

    def count_docs(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()
        s = d.groupby("sentence", sort=False).size()
        g = pd.DataFrame({"sentence": s.index,
                          "n_docs": s.to_numpy().astype("int64")})
        g = g[g["n_docs"] >= min_docs]
        return g.sort_values(["n_docs", "sentence"],
                             ascending=[False, True],
                             kind="mergesort").head(k_top)

    cands = bucketed_group_apply(
        pairs, ["sentence"], count_docs, n_buckets=n_buckets
    ).to_pandas()  # <= n_buckets * k_top rows
    if not len(cands):
        return pd.DataFrame({
            "sentence": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64"),
        })
    top = cands.sort_values(
        ["n_docs", "sentence"], ascending=[False, True], kind="mergesort"
    ).head(k_top).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype="int64")
    return ray.data.from_pandas(top)


DUP_SENTENCES_SQL_TEMPLATE = """
WITH s AS (
  SELECT DISTINCT doc_id,
         trim(unnest(string_split_regex(lower(text), '[.!?]+'))) AS sentence
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT sentence, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM s WHERE sentence <> ''
  GROUP BY sentence HAVING COUNT(*) >= {min_docs}
),
r AS (
  SELECT sentence, n_docs,
         ROW_NUMBER() OVER (ORDER BY n_docs DESC, sentence) AS rank
  FROM c
)
SELECT sentence, n_docs, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k_top}
"""


def oov_rate(
    docs: ray.data.Dataset, k_vocab: int = 1000, n_buckets: int = 32
) -> ray.data.Dataset:
    """Per-document out-of-vocabulary rate against the corpus top-``k_vocab``
    words (deterministic ties: count desc, word asc) — the
    tokenizer-coverage / domain-shift signal a data mixer reads per doc.

    Shape: corpus word counts reduce exact (per-batch partials + bucketed
    sums), the top-k resolves via per-bucket local head-k + a bounded
    driver merge (``events_busy_minutes``), the k-word set broadcasts once
    (ray.put — bounded by k, never the vocabulary), and the per-doc rate
    is one vectorized isin + one division, rounded 6. Zero-token docs
    drop (mirrored in the oracle). Output: doc_id, n_tokens, n_oov,
    oov_rate."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    nn = docs.select_columns(["doc_id", "text"]).map_batches(
        _nonnull_text, batch_format="pandas", batch_size=8192
    ).materialize()

    def wc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split(" ")
        words = [w for ws in toks for w in ws if w]
        c = pd.Series(words).value_counts()
        return pd.DataFrame({"w": c.index,
                             "n": c.to_numpy().astype("int64")})

    def local_top(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("w", sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype("int64")
        return g.sort_values(["n", "w"], ascending=[False, True],
                             kind="mergesort").head(k_vocab)

    cands = bucketed_group_apply(
        nn.map_batches(wc_partial, batch_format="pandas", batch_size=4096),
        ["w"], local_top, n_buckets=n_buckets,
    ).to_pandas()  # <= n_buckets * k_vocab rows
    top = set(
        cands.sort_values(["n", "w"], ascending=[False, True],
                          kind="mergesort").head(k_vocab)["w"]
    )
    top_ref = ray.put(top)

    class _Rate:
        def __init__(self, ref):
            self.top = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.lower().str.split(" ").map(
                lambda ws: [w for w in ws if w]
            )
            n = toks.str.len().astype("int64")
            k = (n > 0).to_numpy()
            if not k.any():
                return pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "n_oov": pd.Series([], dtype="int64"),
                    "oov_rate": pd.Series([], dtype="float64"),
                })
            top = self.top
            oov = toks[k].map(
                lambda ws: sum(1 for w in ws if w not in top)
            ).astype("int64")
            nt = n[k]
            return pd.DataFrame({
                "doc_id": batch["doc_id"].astype("int64")[k],
                "n_tokens": nt,
                "n_oov": oov,
                "oov_rate": np.round(
                    oov.to_numpy(dtype="float64")
                    / nt.to_numpy(dtype="float64"), 6
                ),
            })

    return nn.map_batches(
        _Rate, fn_constructor_args=(top_ref,), batch_format="pandas",
        batch_size=8192, concurrency=(1, 8),
    )


OOV_RATE_SQL_TEMPLATE = """
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x != '') AS l
  FROM documents WHERE text IS NOT NULL
),
w AS (SELECT doc_id, unnest(l) AS w FROM tk),
c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY w),
top AS (
  SELECT w FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS r FROM c
  ) WHERE r <= {k_vocab}
)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (t.w IS NULL) AS BIGINT) AS n_oov,
       ROUND(CAST(COUNT(*) FILTER (t.w IS NULL) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM w LEFT JOIN top t USING (w)
GROUP BY w.doc_id
"""


def source_median_length(
    docs: ray.data.Dataset, n_buckets: int = 8
) -> ray.data.Dataset:
    """Per-source exact median token length + doc count — the length
    calibration per domain (``docs_length_percent_rank``'s CDF collapsed
    to the one number a mixing config stores). Groups co-locate whole in
    source buckets (the ``events_median_value`` exact-median shape; at
    10^12 docs per source this becomes the count-of-counts histogram —
    token lengths are value-domain-bounded). Output: source, median_len,
    n_docs."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        return pd.DataFrame({
            "source": b["source"],
            "ntok": b["text"].str.count(r"[^ ]+").astype("int64"),
        })

    def per_source(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False)["ntok"]
        out = g.agg(median_len="median", n_docs="size").reset_index()
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return bucketed_group_apply(
        docs.select_columns(["source", "text"]).map_batches(
            prep, batch_format="pandas", batch_size=8192
        ),
        ["source"],
        per_source,
        n_buckets=n_buckets,
    )


SOURCE_MEDIAN_LEN_SQL = """
WITH m AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ntok
  FROM documents WHERE text IS NOT NULL
)
SELECT source, MEDIAN(ntok) AS median_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM m GROUP BY source
"""


def quality_by_source(
    docs: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Per-source corpus hygiene profile: exact character-class totals
    (punctuation, digits, uppercase) and their ratios of all characters,
    plus docs and tokens — the domain-level quality dashboard over the
    per-doc ``text_quality`` flags. Every ratio is one division of exact
    int sums, rounded 6 (ratios of MEANS, not means of ratios — the
    aggregate a mixer thresholds on). Combiner partials bound the
    exchange to source cardinality. Output: source, n_docs, n_tokens,
    n_chars, punct_ratio, digit_ratio, upper_ratio."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        if not len(b):
            return pd.DataFrame({
                "source": pd.Series([], dtype="object"),
                "n_docs": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "n_chars": pd.Series([], dtype="int64"),
                "punct": pd.Series([], dtype="int64"),
                "digit": pd.Series([], dtype="int64"),
                "upper": pd.Series([], dtype="int64"),
            })
        d = pd.DataFrame({
            "source": b["source"],
            "n_docs": np.int64(1),
            "n_tokens": b["text"].str.count(r"[^ ]+").astype("int64"),
            "n_chars": b["text"].str.len().astype("int64"),
            "punct": b["text"].str.count(r"[.,;:!?]").astype("int64"),
            "digit": b["text"].str.count(r"[0-9]").astype("int64"),
            "upper": b["text"].str.count(r"[A-Z]").astype("int64"),
        })
        return d.groupby("source", sort=False).sum().reset_index()

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False).sum().reset_index()
        ch = g["n_chars"].astype("int64").to_numpy(dtype="float64")
        return pd.DataFrame({
            "source": g["source"],
            "n_docs": g["n_docs"].astype("int64"),
            "n_tokens": g["n_tokens"].astype("int64"),
            "n_chars": g["n_chars"].astype("int64"),
            "punct_ratio": np.round(
                g["punct"].to_numpy(dtype="float64") / ch, 6
            ),
            "digit_ratio": np.round(
                g["digit"].to_numpy(dtype="float64") / ch, 6
            ),
            "upper_ratio": np.round(
                g["upper"].to_numpy(dtype="float64") / ch, 6
            ),
        })

    return bucketed_group_apply(parts, ["source"], merge,
                                n_buckets=n_buckets)


QUALITY_BY_SOURCE_SQL = """
WITH m AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ntok,
         CAST(len(text) AS BIGINT) AS nch,
         CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS pc,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS dg,
         CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS up
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST(SUM(nch) AS BIGINT) AS n_chars,
       ROUND(CAST(SUM(pc) AS DOUBLE) / CAST(SUM(nch) AS DOUBLE), 6)
         AS punct_ratio,
       ROUND(CAST(SUM(dg) AS DOUBLE) / CAST(SUM(nch) AS DOUBLE), 6)
         AS digit_ratio,
       ROUND(CAST(SUM(up) AS DOUBLE) / CAST(SUM(nch) AS DOUBLE), 6)
         AS upper_ratio
FROM m GROUP BY source
"""


def stopword_profile(
    docs: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Per-(source, stopword) usage profile: total occurrences, documents
    containing the word, and the word's share of all stopword occurrences
    in that source — which function words dominate each domain (the
    style/register fingerprint next to ``quality_by_source``'s
    character-class dashboard; reference's marker-frequency analysis,
    src/TCXReader.jl:141-163, applied per corpus slice).

    Shape: per-batch partials bounded by |sources| x |STOPWORDS| rows
    (occurrence sums + per-doc presence counts — exact because each doc
    row lives in exactly one batch); one source-bucketed merge computes
    the per-source total and shares. All counts exact int64; share is one
    division, rounded 6. Output: source, word, n_occ, n_docs, occ_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    stop = set(STOPWORDS)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        toks = b["text"].str.lower().str.split(" ")
        tf = pd.DataFrame({
            "row": np.repeat(np.arange(len(b)), toks.str.len()),
            "word": [t for ws in toks for t in ws],
        })
        tf = tf[tf["word"].isin(stop)]
        tf["source"] = b["source"].to_numpy()[tf["row"].to_numpy()]
        occ = tf.groupby(["source", "word"], sort=False).agg(
            n_occ=("row", "size"), n_docs=("row", "nunique")
        ).reset_index()
        occ["n_occ"] = occ["n_occ"].astype("int64")
        occ["n_docs"] = occ["n_docs"].astype("int64")
        return occ

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source", "word"], sort=False).agg(
            n_occ=("n_occ", "sum"), n_docs=("n_docs", "sum")
        ).reset_index()
        tot = g.groupby("source", sort=False)["n_occ"].transform("sum")
        return pd.DataFrame({
            "source": g["source"],
            "word": g["word"],
            "n_occ": g["n_occ"].astype("int64"),
            "n_docs": g["n_docs"].astype("int64"),
            "occ_share": np.round(
                g["n_occ"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["source"], merge, n_buckets=n_buckets)


STOPWORD_PROFILE_SQL = f"""
WITH e AS (
  SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS word
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT source, word,
         CAST(COUNT(*) AS BIGINT) AS n_occ,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM e WHERE word IN {STOPWORDS}
  GROUP BY source, word
)
SELECT source, word, n_occ, n_docs,
       ROUND(CAST(n_occ AS DOUBLE)
             / SUM(CAST(n_occ AS DOUBLE)) OVER (PARTITION BY source), 6)
         AS occ_share
FROM g
"""


def simpson_diversity(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source Simpson concentration of the word distribution:
    D = sum_w n_w(n_w-1) / (N(N-1)) — the probability two tokens drawn
    without replacement are the same word (1/D is the "effective
    vocabulary size"; a rising D flags boilerplate/templated text the way
    a falling ``hapax_ratio`` does, from the other end of the frequency
    spectrum).

    Shape: the ``hapax_ratio`` pipeline with a different rollup — one
    SALTED (source, word) exact reduce (stopword whales split), then
    per-source sufficient statistics S2 = sum n(n-1), N = sum n in the
    ``corr_value_hour`` exactness discipline: per-batch int64 partials
    (safe while no single word exceeds ~3e9 occurrences in one source —
    n(n-1) < 2^63; the documented bound), PYTHON-int final merge
    (HUGEINT-equal), one double division rounded 6. Sources with N < 2
    drop (oracle HAVING). Output: source, n_tokens, n_types, simpson."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )

    def explode_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        words = batch["text"].str.lower().str.split(" ")
        df = pd.DataFrame({"source": batch["source"], "w": words}).explode("w")
        df = df[df["w"].notna() & (df["w"] != "")]
        return df.groupby(["source", "w"], sort=False).size().reset_index(
            name="n"
        )

    pairs = docs.select_columns(["source", "text"]).map_batches(
        explode_partial, batch_format="pandas", batch_size=4096
    )

    def merge_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby(["source", "w"], sort=False)["n"].sum()\
            .reset_index()

    per_word = salted_group_apply(
        pairs, ["source", "w"], partial_fn=merge_pairs, merge_fn=merge_pairs
    )

    def suff_partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"].astype("int64")
        d = pd.DataFrame({
            "source": batch["source"],
            "s2": (n * (n - 1)).to_numpy(),
            "nn": n.to_numpy(),
            "v": np.ones(len(batch), dtype="int64"),
        })
        return d.groupby("source", sort=False).sum().reset_index()

    def merge_suff(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src_key, g in bucket.groupby("source", sort=False):
            s2 = sum(int(x) for x in g["s2"])
            nn = sum(int(x) for x in g["nn"])
            v = sum(int(x) for x in g["v"])
            if nn < 2:
                continue
            out.append((
                src_key,
                np.int64(nn),
                np.int64(v),
                np.round(float(s2) / (float(nn) * float(nn - 1)), 6),
            ))
        return pd.DataFrame(
            out, columns=["source", "n_tokens", "n_types", "simpson"]
        ).astype({
            "n_tokens": "int64", "n_types": "int64", "simpson": "float64",
        })

    return bucketed_group_apply(
        per_word.map_batches(
            suff_partial, batch_format="pandas", batch_size=65536
        ),
        ["source"],
        merge_suff,
        n_buckets=4,
    )


SIMPSON_SQL = """
WITH e AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
f AS (SELECT * FROM e WHERE w <> ''),
c AS (SELECT source, w, COUNT(*) AS n FROM f GROUP BY source, w),
s AS (
  SELECT source, SUM(n * (n - 1)) AS s2, SUM(n) AS nn, COUNT(*) AS v
  FROM c GROUP BY source HAVING SUM(n) >= 2
)
SELECT source, CAST(nn AS BIGINT) AS n_tokens, CAST(v AS BIGINT) AS n_types,
       ROUND(CAST(s2 AS DOUBLE)
             / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)), 6) AS simpson
FROM s
"""


def source_vocab_overlap(
    docs: ray.data.Dataset, n_buckets: int = 16
) -> ray.data.Dataset:
    """Pairwise source-vocabulary Jaccard matrix: for every pair of
    sources, the shared distinct-word count and |A∩B| / |A∪B| — the
    domain-similarity map a mixture designer reads before reweighting
    corpus slices (two sources with near-identical vocabularies are one
    domain; reference's cross-file property overlap,
    src/OverlappingSegmentsUtils.jl:51-100, lifted to the lexical axis).

    Shape: one SALTED (source, word) distinct reduce (stopword whales
    split); the pair counting is word-bucketed with each bucket folding
    its words into an S x S co-occurrence count matrix (np.add.at over
    triu indices — never a pair-row exchange: the exchange carries at
    most S^2 rows per bucket, not sum-over-words C(k,2) rows); one final
    (a, b) reduce sums the matrices. Per-source vocabulary sizes are a
    dimension-bounded collect (|sources| rows) closed over the final
    merge. Jaccard is one division of exact ints, rounded 6. Pairs with
    zero shared words don't emit (oracle inner-join semantics).
    Output: source_a, source_b, n_common, n_a, n_b, jaccard."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )

    def explode_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        words = batch["text"].str.lower().str.split(" ")
        df = pd.DataFrame({"source": batch["source"], "w": words}).explode("w")
        df = df[df["w"].notna() & (df["w"] != "")]
        return df.drop_duplicates(["source", "w"])

    pairs = docs.select_columns(["source", "text"]).map_batches(
        explode_distinct, batch_format="pandas", batch_size=4096
    )

    def dedup_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(["source", "w"])

    per_word = salted_group_apply(
        pairs, ["source", "w"], partial_fn=dedup_pairs, merge_fn=dedup_pairs
    ).materialize()  # consumed by the vocab-size and pair branches

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("source", sort=False).size().reset_index(
            name="nv"
        )

    def vocab_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False)["nv"].sum().reset_index()
        g["nv"] = g["nv"].astype("int64")
        return g

    # dimension-bounded small side: |sources| rows
    nv = dict(
        bucketed_group_apply(
            per_word.map_batches(vocab_partial, batch_format="pandas"),
            ["source"], vocab_merge, n_buckets=4,
        ).to_pandas().itertuples(index=False, name=None)
    )

    def pair_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        # codes in LEXICOGRAPHIC source order so triu pairs are a < b,
        # matching the oracle's a.source < b.source orientation
        uniq = np.sort(bucket["source"].unique())
        codes = np.searchsorted(uniq, bucket["source"].to_numpy())
        s = len(uniq)
        d = pd.DataFrame({"w": bucket["w"].to_numpy(), "c": codes})
        acc = np.zeros((s, s), dtype="int64")
        for _, g in d.groupby("w", sort=False):
            cs = np.sort(g["c"].to_numpy())
            if len(cs) < 2:
                continue
            ii, jj = np.triu_indices(len(cs), k=1)
            np.add.at(acc, (cs[ii], cs[jj]), 1)
        ai, bj = np.nonzero(acc)
        names = np.asarray(uniq, dtype=object)
        return pd.DataFrame({
            "source_a": names[ai],
            "source_b": names[bj],
            "inter": acc[ai, bj],
        })

    counts = bucketed_group_apply(
        per_word, ["w"], pair_counts, n_buckets=n_buckets
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source_a", "source_b"], sort=False)["inter"]\
            .sum().reset_index()
        inter = g["inter"].astype("int64")
        na = g["source_a"].map(nv).astype("int64")
        nb = g["source_b"].map(nv).astype("int64")
        union = na + nb - inter
        return pd.DataFrame({
            "source_a": g["source_a"],
            "source_b": g["source_b"],
            "n_common": inter,
            "n_a": na,
            "n_b": nb,
            "jaccard": np.round(
                inter.to_numpy(dtype="float64")
                / union.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(
        counts, ["source_a", "source_b"], final, n_buckets=4
    )


VOCAB_OVERLAP_SQL = """
WITH e AS (
  SELECT DISTINCT source, w FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS w
    FROM documents WHERE text IS NOT NULL
  ) WHERE w <> ''
),
v AS (SELECT source, COUNT(*) AS nv FROM e GROUP BY source),
c AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS inter
  FROM e a JOIN e b ON a.w = b.w AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b,
       CAST(inter AS BIGINT) AS n_common,
       CAST(va.nv AS BIGINT) AS n_a,
       CAST(vb.nv AS BIGINT) AS n_b,
       ROUND(CAST(inter AS DOUBLE)
             / CAST(va.nv + vb.nv - inter AS DOUBLE), 6) AS jaccard
FROM c
JOIN v va ON va.source = c.source_a
JOIN v vb ON vb.source = c.source_b
"""


def lang_confusion(docs: ray.data.Dataset, n_buckets: int = 4) -> ray.data.Dataset:
    """Classifier-evaluation CONFUSION MATRIX for the marker-word language
    guesser against the declared ``lang`` label: one row per
    (lang, lang_pred) cell with count and the row-normalized share — the
    aggregate view over ``lang_mismatch``'s per-doc disagreement list
    (precision/recall read straight off this table).

    Shape: per-batch (lang, pred) count partials (cell cardinality is
    |langs|^2-bounded), one bucketed merge computing per-declared-lang
    row shares. Counts exact int64; share one division rounded 6.
    Output: lang, lang_pred, n_docs, row_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        pred = _lang_id_batch(batch)
        d = pd.DataFrame({
            "lang": batch["lang"].to_numpy(),
            "lang_pred": pred["lang_pred"].to_numpy(),
        })
        g = d.groupby(["lang", "lang_pred"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = docs.select_columns(["doc_id", "lang", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["lang", "lang_pred"], sort=False)["n"].sum()\
            .reset_index()
        tot = g.groupby("lang", sort=False)["n"].transform("sum")
        return pd.DataFrame({
            "lang": g["lang"],
            "lang_pred": g["lang_pred"],
            "n_docs": g["n"].astype("int64"),
            "row_share": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["lang"], merge, n_buckets=n_buckets)


def lang_confusion_sql() -> str:
    return f"""
WITH pred AS ({LANG_ID_SQL}),
c AS (
  SELECT d.lang, p.lang_pred, COUNT(*) AS n
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
  WHERE d.text IS NOT NULL
  GROUP BY d.lang, p.lang_pred
)
SELECT lang, lang_pred, CAST(n AS BIGINT) AS n_docs,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY lang), 6)
         AS row_share
FROM c
"""


def word_length_histogram(
    docs: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Corpus word-length histogram per source: one row per
    (source, word length) with occurrence count and the source's share —
    the tokenizer-design profile (subword vocab sizing reads the tail of
    exactly this table). Length is in characters of the lower-split
    token; empty tokens drop. Counts exact; share one division, rounded
    6. Output: source, wlen, n_words, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        toks = b["text"].str.lower().str.split(" ")
        tf = pd.DataFrame({
            "row": np.repeat(np.arange(len(b)), toks.str.len()),
            "wlen": np.array(
                [len(t) for ws in toks for t in ws], dtype="int64"
            ),
        })
        tf = tf[tf["wlen"] > 0]
        tf["source"] = b["source"].to_numpy()[tf["row"].to_numpy()]
        g = tf.groupby(["source", "wlen"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source", "wlen"], sort=False)["n"].sum()\
            .reset_index()
        tot = g.groupby("source", sort=False)["n"].transform("sum")
        return pd.DataFrame({
            "source": g["source"],
            "wlen": g["wlen"].astype("int64"),
            "n_words": g["n"].astype("int64"),
            "share": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["source"], merge,
                                n_buckets=n_buckets)


WORD_LEN_HIST_SQL = """
WITH e AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT source, CAST(length(w) AS BIGINT) AS wlen, COUNT(*) AS n
  FROM e WHERE w <> '' GROUP BY source, length(w)
)
SELECT source, wlen, CAST(n AS BIGINT) AS n_words,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY source), 6)
         AS share
FROM c
"""


def split_balance(
    docs: ray.data.Dataset,
    train_cut: int = 0xCB,
    val_cut: int = 0xE5,
    n_buckets: int = 4,
) -> ray.data.Dataset:
    """Split-stratification audit: per (split, source), doc and token
    counts plus the source's WITHIN-SPLIT share — the check that the
    deterministic hash split didn't skew any domain's representation
    across train/val/test (a visibly unequal row here means the eval set
    is not measuring the training distribution; the contamination
    question's benign sibling). Composes the production ``split_assign``
    hash inline (one pass — no join back to the docs). Counts exact
    int64; share one division, rounded 6. Output: split, source, n_docs,
    n_tokens, split_share."""
    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    train_hex, val_hex = format(train_cut, "02x"), format(val_cut, "02x")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        ids = b["doc_id"].astype("int64")
        p2 = np.asarray(
            md5_hex(ids.astype(str).to_numpy()), dtype="U32"
        ).astype("U2")
        split = np.where(
            p2 <= train_hex, "train", np.where(p2 <= val_hex, "val", "test")
        )
        d = pd.DataFrame({
            "split": split,
            "source": b["source"].to_numpy(),
            "n_docs": np.int64(1),
            "n_tokens": b["text"].str.count(r"[^ ]+").astype("int64")
            .to_numpy(),
        })
        return d.groupby(["split", "source"], sort=False).sum().reset_index()

    parts = docs.select_columns(["doc_id", "source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["split", "source"], sort=False).sum()\
            .reset_index()
        tot = g.groupby("split", sort=False)["n_docs"].transform("sum")
        return pd.DataFrame({
            "split": g["split"],
            "source": g["source"],
            "n_docs": g["n_docs"].astype("int64"),
            "n_tokens": g["n_tokens"].astype("int64"),
            "split_share": np.round(
                g["n_docs"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["split"], merge,
                                n_buckets=n_buckets)


def split_balance_sql(train_hex: str = "cb", val_hex: str = "e5") -> str:
    return f"""
WITH s AS (
  SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                <= '{train_hex}' THEN 'train'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                <= '{val_hex}' THEN 'val'
              ELSE 'test' END AS split,
         source,
         len(regexp_extract_all(text, '[^ ]+')) AS ntok
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT split, source, COUNT(*) AS n_docs, SUM(ntok) AS n_tokens
  FROM s GROUP BY split, source
)
SELECT split, source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(CAST(n_docs AS DOUBLE)
             / SUM(CAST(n_docs AS DOUBLE)) OVER (PARTITION BY split), 6)
         AS split_share
FROM c
"""


def vocab_coverage_curve(
    docs: ray.data.Dataset, tops: tuple = (10, 100, 1000)
) -> pd.DataFrame:
    """Zipf coverage curve: for each N in ``tops``, the fraction of ALL
    token occurrences covered by the N most frequent words — the
    vocabulary-compression read (how big a subword/whitelist vocabulary
    must be before the tail matters; the cumulative view over
    ``text_zipf_slope``'s fit). Word counts come from the SALTED exact
    (word) reduce; the top-N selection is deterministic (count desc, word
    asc) over the N_max largest counts only (a bounded driver pull — the
    per-bucket local head-N_max pattern, never the vocabulary). Coverage
    is one division of exact ints, rounded 6. Output rows: n_top,
    covered_tokens, total_tokens, coverage."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )

    n_max = max(tops)

    def explode_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        words = batch["text"].str.lower().str.split(" ")
        df = pd.DataFrame({"w": words}).explode("w")
        df = df[df["w"].notna() & (df["w"] != "")]
        return df.groupby("w", sort=False).size().reset_index(name="n")

    pairs = docs.select_columns(["text"]).map_batches(
        explode_partial, batch_format="pandas", batch_size=4096
    )

    def merge_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby("w", sort=False)["n"].sum().reset_index()

    per_word = salted_group_apply(
        pairs, ["w"], partial_fn=merge_counts, merge_fn=merge_counts
    ).materialize()  # consumed by the total fold AND the head-N pull

    # exact total tokens (combiner scalars)
    tot_parts = per_word.map_batches(
        lambda b: pd.DataFrame({"s": [np.int64(b["n"].sum())]}),
        batch_format="pandas",
    ).to_pandas()
    total = sum(int(x) for x in tot_parts["s"])

    # bounded driver pull: per-batch local head-n_max, then one global head
    def local_head(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["n", "w"], ascending=[False, True],
                                 kind="mergesort").head(n_max)

    cand = per_word.map_batches(
        local_head, batch_format="pandas", batch_size=65536
    ).to_pandas()
    top = cand.sort_values(["n", "w"], ascending=[False, True],
                           kind="mergesort").head(n_max)
    counts = top["n"].astype("int64").to_numpy()

    rows = []
    for n_top in tops:
        cov = int(counts[:n_top].sum())
        rows.append((
            np.int64(n_top), np.int64(cov), np.int64(total),
            np.round(cov / total, 6),
        ))
    return pd.DataFrame(rows, columns=[
        "n_top", "covered_tokens", "total_tokens", "coverage"
    ]).astype({
        "n_top": "int64", "covered_tokens": "int64", "total_tokens": "int64",
    })


def vocab_coverage_sql(tops: tuple = (10, 100, 1000)) -> str:
    tops_rows = ", ".join(f"({t})" for t in tops)
    return f"""
WITH e AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
c AS (SELECT w, COUNT(*) AS n FROM e WHERE w <> '' GROUP BY w),
r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rk FROM c
),
t AS (SELECT SUM(n) AS total FROM c),
tops(n_top) AS (VALUES {tops_rows})
SELECT CAST(tops.n_top AS BIGINT) AS n_top,
       CAST(COALESCE(SUM(r.n), 0) AS BIGINT) AS covered_tokens,
       CAST(ANY_VALUE(t.total) AS BIGINT) AS total_tokens,
       ROUND(CAST(COALESCE(SUM(r.n), 0) AS DOUBLE)
             / CAST(ANY_VALUE(t.total) AS DOUBLE), 6) AS coverage
FROM tops
LEFT JOIN r ON r.rk <= tops.n_top
CROSS JOIN t
GROUP BY tops.n_top
"""


def pii_audit_by_source(
    docs: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """PII exposure audit per corpus source: totals of each detected PII
    class, the count of affected documents and the affected-doc rate — the
    compliance report a release review reads above ``pii_scrub``'s per-doc
    redactions (a source with a high hit rate gets quarantined, not
    patched row by row). Same fixed-order RE2 ∩ re patterns as the scrub
    (email counted on raw text, ip/phone on the progressively redacted
    text — the overlap discipline). Counts exact; rate one division,
    rounded 6. Output: source, n_docs, n_emails, n_ips, n_phones,
    docs_with_pii, pii_rate."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        text = b["text"]
        counts = {}
        for name, pat, tag in _PII_CLASSES:
            counts[name] = text.str.count(pat).astype("int64")
            text = text.str.replace(pat, tag, regex=True)
        tot = counts["email"] + counts["ip"] + counts["phone"]
        d = pd.DataFrame({
            "source": b["source"],
            "n_docs": np.int64(1),
            "n_emails": counts["email"].to_numpy(),
            "n_ips": counts["ip"].to_numpy(),
            "n_phones": counts["phone"].to_numpy(),
            "docs_with_pii": (tot > 0).astype("int64").to_numpy(),
        })
        return d.groupby("source", sort=False).sum().reset_index()

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False).sum().reset_index()
        for c in g.columns:
            if c != "source":
                g[c] = g[c].astype("int64")
        g["pii_rate"] = np.round(
            g["docs_with_pii"].to_numpy(dtype="float64")
            / g["n_docs"].to_numpy(dtype="float64"), 6
        )
        return g

    return bucketed_group_apply(parts, ["source"], merge,
                                n_buckets=n_buckets)


def pii_audit_sql() -> str:
    email, ip, phone = (c[1] for c in _PII_CLASSES)
    return rf"""
WITH per_doc AS (
  SELECT source,
         len(regexp_extract_all(text, '{email}')) AS ne,
         len(regexp_extract_all(regexp_replace(text, '{email}', '<EMAIL>', 'g'), '{ip}')) AS ni,
         len(regexp_extract_all(regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), '{phone}')) AS np
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ne) AS BIGINT) AS n_emails,
       CAST(SUM(ni) AS BIGINT) AS n_ips,
       CAST(SUM(np) AS BIGINT) AS n_phones,
       CAST(SUM(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_pii,
       ROUND(CAST(SUM(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS pii_rate
FROM per_doc GROUP BY source
"""


def ttr_by_length(docs: ray.data.Dataset, n_buckets: int = 4) -> ray.data.Dataset:
    """Type-token ratio BY LENGTH BIN: per log2 doc-length bucket, the
    aggregate distinct-type share — the curve that controls the classic
    TTR/length confound (raw TTR falls with length for any text; a bin
    whose TTR breaks the corpus curve is template or gibberish pressure).
    Bin = bit_length(n_tokens) - 1, pure integer arithmetic (the
    ``length_histogram`` trick); TTR = sum types / sum tokens per bin,
    exact ints, one division rounded 6 (ratio of sums — the aggregate a
    threshold reads — not mean of ratios). Output: bin, n_docs, n_tokens,
    n_types, ttr."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        tf = _token_frame(b)
        types = tf.groupby("row")["tok"].nunique()
        n_types = (
            pd.Series(0, index=range(len(b))).add(types, fill_value=0)
            .astype("int64")
        )
        n_tok = (b["text"].str.count(" ") + 1).astype("int64")
        bins = np.array(
            [int(n).bit_length() - 1 for n in n_tok], dtype="int64"
        )
        d = pd.DataFrame({
            "bin": bins,
            "n_docs": np.int64(1),
            "n_tokens": n_tok.to_numpy(),
            "n_types": n_types.to_numpy(),
        })
        return d.groupby("bin", sort=False).sum().reset_index()

    parts = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False).sum().reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        g["ttr"] = np.round(
            g["n_types"].to_numpy(dtype="float64")
            / g["n_tokens"].to_numpy(dtype="float64"), 6
        )
        return g

    return bucketed_group_apply(parts, ["bin"], merge, n_buckets=n_buckets)


TTR_BY_LENGTH_SQL = """
WITH m AS (
  SELECT len(string_split(lower(text), ' ')) AS ntok,
         len(list_distinct(string_split(lower(text), ' '))) AS ntyp
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT CAST(floor(log2(ntok)) AS BIGINT) AS bin, ntok, ntyp FROM m
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST(SUM(ntyp) AS BIGINT) AS n_types,
       ROUND(CAST(SUM(ntyp) AS DOUBLE) / CAST(SUM(ntok) AS DOUBLE), 6)
         AS ttr
FROM b GROUP BY bin
"""


def vocab_growth(docs: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """Heaps'-law VOCABULARY GROWTH curve: distinct words whose FIRST
    occurrence (minimum doc_id — doc_ids are the corpus's stable dense
    ordering) lands in each log2 doc-prefix bin, plus the cumulative
    vocabulary — the sub-linear curve whose flattening says "more data stops
    buying new words" (Heaps 1978 — public) and sizes every vocab-keyed
    structure downstream. Per-word min is an order-free bucketed reduce;
    bins and counts are exact ints; the cumulative sum runs in the single
    tiny merge bucket (<= ~40 bins). Tokenization: lowercase ' '-split,
    empty tokens preserved (house convention == DuckDB string_split).
    Output: bin, n_new_words, vocab_cum."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        toks = b["text"].str.lower().str.split(" ")
        doc = np.repeat(b["doc_id"].to_numpy(dtype="int64"),
                        toks.str.len().to_numpy())
        tf = pd.DataFrame({"tok": [t for ws in toks for t in ws],
                           "doc": doc})
        g = tf.groupby("tok", sort=False)["doc"].min().reset_index()
        return g.rename(columns={"doc": "md"})

    parts = docs.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def min_per_word(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("tok", sort=False)["md"].min().reset_index()
        md = g["md"].to_numpy(dtype="int64")
        bins = np.array(
            [int(x + 1).bit_length() - 1 for x in md], dtype="int64"
        )
        s = pd.Series(bins).groupby(bins, sort=False).size()
        return pd.DataFrame({
            "bin": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    binned = bucketed_group_apply(parts, ["tok"], min_per_word,
                                  n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum().reset_index()
        g = g.sort_values("bin").reset_index(drop=True)
        return pd.DataFrame({
            "bin": g["bin"].astype("int64"),
            "n_new_words": g["n"].astype("int64"),
            "vocab_cum": g["n"].cumsum().astype("int64"),
        })

    # single merge bucket: the cumulative sum needs every bin in order and
    # the bin space is log-bounded; partials arrive as bin-level combiners
    return bucketed_group_apply(binned, ["bin"], merge, n_buckets=1)


VOCAB_GROWTH_SQL = """
WITH tf AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
w AS (SELECT tok, MIN(doc_id) AS md FROM tf GROUP BY tok),
c AS (
  SELECT CAST(floor(log2(md + 1)) AS BIGINT) AS bin, COUNT(*) AS n
  FROM w GROUP BY 1
)
SELECT bin, CAST(n AS BIGINT) AS n_new_words,
       CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS vocab_cum
FROM c
"""


def charclass_profile(
    docs: ray.data.Dataset, n_buckets: int = 4
) -> ray.data.Dataset:
    """Per-source CHARACTER-CLASS composition: total chars and the share of
    letters / digits / spaces / other — the one-row-per-source signal that
    separates prose (high alpha, ~15% space) from tables, code and
    log spam (digit- and symbol-heavy), read before any tokenizer trusts a
    source. Class counts are vectorized ``str.count`` with compiled char
    classes, reduced as exact ints; shares are per-source divisions rounded
    6. Output: source, n_chars, alpha_share, digit_share, space_share,
    other_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        t = b["text"]
        d = pd.DataFrame({
            "source": b["source"],
            "n_chars": t.str.len().to_numpy().astype("int64"),
            "alpha": t.str.count(r"[A-Za-z]").to_numpy().astype("int64"),
            "digit": t.str.count(r"[0-9]").to_numpy().astype("int64"),
            "space": t.str.count(r" ").to_numpy().astype("int64"),
        })
        return d.groupby("source", sort=False).sum().reset_index()

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False).sum().reset_index()
        n = g["n_chars"].to_numpy(dtype="float64")
        out = pd.DataFrame({
            "source": g["source"],
            "n_chars": g["n_chars"].astype("int64"),
            "alpha_share": np.round(
                g["alpha"].to_numpy(dtype="float64") / n, 6),
            "digit_share": np.round(
                g["digit"].to_numpy(dtype="float64") / n, 6),
            "space_share": np.round(
                g["space"].to_numpy(dtype="float64") / n, 6),
        })
        out["other_share"] = np.round(
            (g["n_chars"] - g["alpha"] - g["digit"] - g["space"])
            .to_numpy(dtype="float64") / n, 6)
        return out

    return bucketed_group_apply(parts, ["source"], merge,
                                n_buckets=n_buckets)


CHARCLASS_PROFILE_SQL = """
WITH per AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text)
              - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS alpha,
         CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS digit,
         CAST(length(text) - length(replace(text, ' ', ''))
              AS BIGINT) AS space
  FROM documents WHERE text IS NOT NULL
)
SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       ROUND(CAST(SUM(alpha) AS DOUBLE) / SUM(n_chars), 6) AS alpha_share,
       ROUND(CAST(SUM(digit) AS DOUBLE) / SUM(n_chars), 6) AS digit_share,
       ROUND(CAST(SUM(space) AS DOUBLE) / SUM(n_chars), 6) AS space_share,
       ROUND(CAST(SUM(n_chars - alpha - digit - space) AS DOUBLE)
             / SUM(n_chars), 6) AS other_share
FROM per GROUP BY source
"""


def lang_profile(docs: ray.data.Dataset, n_buckets: int = 4) -> ray.data.Dataset:
    """Per-DECLARED-LANGUAGE corpus composition: doc count, corpus share,
    total tokens and mean tokens per doc — the first table a multilingual
    curation plan reads (quota sampling and per-lang quality thresholds key
    off exactly these four numbers; ``lang_confusion`` then checks whether
    the declared label is even true). Counts/token sums exact ints
    (ntok == ' '-split count, house convention); share and mean one
    division each, rounded 6. Output: lang, n_docs, share, n_tokens,
    avg_tokens."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        d = pd.DataFrame({
            "lang": b["lang"],
            "n": np.int64(1),
            "ntok": (b["text"].str.count(" ") + 1).to_numpy()
            .astype("int64"),
        })
        return d.groupby("lang", sort=False).sum().reset_index()

    parts = docs.select_columns(["lang", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("lang", sort=False).sum().reset_index()
        tot = float(g["n"].sum())
        return pd.DataFrame({
            "lang": g["lang"],
            "n_docs": g["n"].astype("int64"),
            "share": np.round(g["n"].to_numpy(dtype="float64") / tot, 6),
            "n_tokens": g["ntok"].astype("int64"),
            "avg_tokens": np.round(
                g["ntok"].to_numpy(dtype="float64")
                / g["n"].to_numpy(dtype="float64"), 6
            ),
        })

    # single merge bucket: global share denominator; lang space is tiny
    return bucketed_group_apply(parts, ["lang"], merge, n_buckets=1)


LANG_PROFILE_SQL = """
WITH c AS (
  SELECT lang, COUNT(*) AS n,
         SUM(len(text) - len(replace(text, ' ', '')) + 1) AS ntok
  FROM documents WHERE text IS NOT NULL GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share,
       CAST(ntok AS BIGINT) AS n_tokens,
       ROUND(CAST(ntok AS DOUBLE) / n, 6) AS avg_tokens
FROM c
"""


def word_freq_hist(docs: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """Word-frequency COUNT-OF-COUNTS: how many distinct words occur once,
    2-3 times, 4-7, ... (log2 bins of total corpus frequency) — the Zipf
    mass histogram behind ``zipf_slope``'s fitted line and the Good-Turing
    smoothing table's input (Gale & Sampson 1995 — public); the singleton
    bin IS the hapax count, read here in one screen against the whole
    spectrum. Per-word totals reduce through the word-bucketed combiner
    (whale-safe: partials are per-batch counts); the count-of-counts fold
    and cumulative token mass are exact ints. Output: bin, min_freq,
    n_words, token_mass."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tf = _token_frame(_nonnull_text(batch))
        s = tf.groupby("tok", sort=False).size()
        return pd.DataFrame({
            "tok": s.index,
            "c": s.to_numpy().astype("int64"),
        })

    parts = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def per_word(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("tok", sort=False)["c"].sum()
        c = g.to_numpy(dtype="int64")
        bins = np.array([int(x).bit_length() - 1 for x in c], dtype="int64")
        d = pd.DataFrame({
            "bin": bins,
            "n_words": np.int64(1),
            "token_mass": c,
        })
        return d.groupby("bin", sort=False).sum().reset_index()

    binned = bucketed_group_apply(parts, ["tok"], per_word,
                                  n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False).sum().reset_index()
        for c in g.columns:
            g[c] = g[c].astype("int64")
        g["min_freq"] = (np.int64(1) << g["bin"].to_numpy()).astype("int64")
        return g[["bin", "min_freq", "n_words", "token_mass"]]

    return bucketed_group_apply(binned, ["bin"], merge, n_buckets=4)


WORD_FREQ_HIST_SQL = """
WITH tf AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
w AS (SELECT tok, COUNT(*) AS c FROM tf GROUP BY tok),
b AS (SELECT CAST(floor(log2(c)) AS BIGINT) AS bin, c FROM w)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_freq,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(c) AS BIGINT) AS token_mass
FROM b GROUP BY bin
"""


def kwic(
    docs: ray.data.Dataset, term: str, window: int = 2
) -> ray.data.Dataset:
    """Keyword-in-context (KWIC) concordance: every occurrence of ``term``
    with ±``window`` tokens of context — the corpus-inspection primitive
    behind every "show me how this word is actually used" audit (quality
    raters read concordances, not frequency tables; Luhn 1960 — public).
    Shape: a distributed grep — tokens explode vectorized, hits filter to
    the (sparse) matching positions, and ONLY hit rows pay the per-hit
    context slice (a loop over HITS, never over rows — bounded by term
    frequency, the inspection regime this op exists for). Output: doc_id,
    pos (0-based token index), context."""

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        toks = b["text"].str.lower().str.split(" ").tolist()
        doc_ids = b["doc_id"].to_numpy(dtype="int64")
        out_doc, out_pos, out_ctx = [], [], []
        for did, ws in zip(doc_ids, toks):
            arr = np.asarray(ws, dtype=object)
            hits = np.flatnonzero(arr == term)
            for p in hits:  # loop over HITS (sparse), not rows
                lo = max(0, int(p) - window)
                out_doc.append(did)
                out_pos.append(int(p))
                out_ctx.append(" ".join(ws[lo:int(p) + window + 1]))
        return pd.DataFrame({
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "pos": pd.Series(out_pos, dtype="int64"),
            "context": pd.Series(out_ctx, dtype="object"),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        per_batch, batch_format="pandas", batch_size=8192
    )


KWIC_SQL_TEMPLATE = """
WITH tf AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
hits AS (
  SELECT doc_id, toks, CAST(i AS BIGINT) AS i
  FROM tf, unnest(range(1, len(toks) + 1)) AS t(i)
  WHERE toks[CAST(i AS INT)] = '{term}'
)
SELECT doc_id, i - 1 AS pos,
       array_to_string(
         list_slice(toks, CAST(GREATEST(1, i - {window}) AS INT),
                    CAST(i + {window} AS INT)), ' ') AS context
FROM hits
"""


def template_rate(
    docs: ray.data.Dataset, prefix_len: int = 64, n_buckets: int = 32
) -> ray.data.Dataset:
    """TEMPLATE pressure per source: the share of documents whose first
    ``prefix_len`` characters are shared with at least one other document —
    the boilerplate detector that catches mail-merge/scraper output long
    before a full near-dup pass (same prefix, different fill-ins), the
    per-SOURCE rollup next to ``dedup_prefix_pairs``' pair-level view.
    Shape: (source, prefix) partial counts; prefix buckets see each
    prefix's complete count, so "templated" resolves inside one bucket
    with no doc-level exchange; the per-source fold is a tiny second
    reduce. Exact counts; rate one division rounded 6. Output: source,
    n_docs, n_templated, template_rate."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        d = pd.DataFrame({
            "source": b["source"],
            "p": b["text"].str[:prefix_len],
            "n": np.int64(1),
        })
        return d.groupby(["source", "p"], sort=False).sum().reset_index()

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def per_prefix(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["source", "p"], sort=False)["n"].sum()\
            .reset_index()
        tot = g.groupby("p", sort=False)["n"].transform("sum")
        g["n_templated"] = np.where(tot >= 2, g["n"], np.int64(0))
        out = g.groupby("source", sort=False)[["n", "n_templated"]].sum()\
            .reset_index()
        return out.rename(columns={"n": "n_docs"})

    mid = bucketed_group_apply(parts, ["p"], per_prefix,
                               n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False)[
            ["n_docs", "n_templated"]
        ].sum().reset_index()
        return pd.DataFrame({
            "source": g["source"],
            "n_docs": g["n_docs"].astype("int64"),
            "n_templated": g["n_templated"].astype("int64"),
            "template_rate": np.round(
                g["n_templated"].to_numpy(dtype="float64")
                / g["n_docs"].to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(mid, ["source"], merge, n_buckets=4)


TEMPLATE_RATE_SQL_TEMPLATE = """
WITH d AS (
  SELECT source, substr(text, 1, {prefix_len}) AS p
  FROM documents WHERE text IS NOT NULL
),
pc AS (SELECT p, COUNT(*) AS tot FROM d GROUP BY p)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (pc.tot >= 2) AS BIGINT) AS n_templated,
       ROUND(CAST(COUNT(*) FILTER (pc.tot >= 2) AS DOUBLE)
             / COUNT(*), 6) AS template_rate
FROM d JOIN pc USING (p) GROUP BY d.source
"""


def sources_per_word_hist(
    docs: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """UNIVERSALITY spectrum of the vocabulary: for each word, how many
    distinct SOURCES use it — rolled up to (n_sources → n_words) — the
    niche-vs-universal split that separates shared language (high span:
    function words, domain staples) from source-private vocabulary (span
    1: usernames, boilerplate tokens, site furniture) before any
    cross-source model shares a tokenizer. Per-batch distinct
    (source, word) pairs shrink the exchange; word buckets see each word's
    complete source set (distinct + nunique vectorized); the
    count-of-counts fold is exact ints, share one division rounded 6.
    Output: n_sources, n_words, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        tf = _token_frame(b)
        tf["source"] = b["source"].to_numpy()[tf["row"].to_numpy()]
        return tf[["tok", "source"]].drop_duplicates()

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def per_word(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.drop_duplicates().groupby("tok", sort=False)["source"]\
            .size()
        s = g.groupby(g, sort=False).size()
        return pd.DataFrame({
            "n_sources": s.index.astype("int64"),
            "n_words": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["tok"], per_word,
                               n_buckets=n_buckets)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("n_sources", sort=False)["n_words"].sum()\
            .reset_index()
        tot = float(g["n_words"].sum())
        return pd.DataFrame({
            "n_sources": g["n_sources"].astype("int64"),
            "n_words": g["n_words"].astype("int64"),
            "share": np.round(
                g["n_words"].to_numpy(dtype="float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["n_sources"], merge, n_buckets=1)


SOURCES_PER_WORD_SQL = """
WITH raw AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
tf AS (SELECT DISTINCT source, tok FROM raw),
w AS (SELECT tok, COUNT(DISTINCT source) AS ns FROM tf GROUP BY tok),
h AS (SELECT ns, COUNT(*) AS n_words FROM w GROUP BY ns)
SELECT CAST(ns AS BIGINT) AS n_sources,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND(CAST(n_words AS DOUBLE)
             / SUM(CAST(n_words AS DOUBLE)) OVER (), 6) AS share
FROM h
"""


def quality_band_tokens(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Token BUDGET by quality band — the curation curve behind every
    keep-the-top-X%-of-docs decision: band docs by stopword density (the
    house natural-language prior, cf. ``rrf_fusion``'s ranking side) and
    report each band's document and token mass plus the cumulative token
    share walking from the most stopword-dense band down. The band is the
    PURE-INTEGER ``min(10*n_stop // n_tokens, 9)`` over the lowercase
    ' '-split tokens (QUALITY_SQL's token rule) — never a float ratio, so
    boundary docs bin identically to SQL; the rollup exchange is bounded
    by ten bands. Output: band, n_docs, n_tokens, tok_share,
    cum_tok_share (cumulative from band 9 down)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = _nonnull_text(batch)
        ntok = (d["text"].str.count(" ") + 1).astype("int64")
        tf = _token_frame(d)
        stops = tf[tf["tok"].isin(STOPWORDS)].groupby("row").size()
        n_stop = (
            pd.Series(0, index=range(len(d)))
            .add(stops, fill_value=0)
            .astype("int64")
        )
        band = np.minimum(10 * n_stop.to_numpy() // ntok.to_numpy(), 9)
        g = pd.DataFrame({"band": band, "n": np.int64(1), "ntok": ntok})\
            .groupby("band", sort=False).sum().reset_index()
        return g.astype({"band": "int64", "n": "int64", "ntok": "int64"})

    parts = docs.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("band", sort=False)[["n", "ntok"]].sum()
        g = g.sort_index(ascending=False)  # walk from band 9 down
        n = g["n"].to_numpy(dtype="int64")
        tk = g["ntok"].to_numpy(dtype="int64")
        tot = float(tk.sum())
        return pd.DataFrame({
            "band": g.index.to_numpy().astype("int64"),
            "n_docs": n,
            "n_tokens": tk,
            "tok_share": np.round(tk.astype("float64") / tot, 6),
            "cum_tok_share": np.round(
                np.cumsum(tk).astype("float64") / tot, 6),
        })

    return bucketed_group_apply(parts, ["band"], final, n_buckets=1)


QUALITY_BAND_TOKENS_SQL = f"""
WITH d AS (
  SELECT string_split(lower(text), ' ') AS t,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
           AS ntok
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT LEAST(10 * len(list_filter(t, x -> x IN {STOPWORDS})) // ntok, 9)
           AS band,
         ntok
  FROM d
),
g AS (SELECT band, COUNT(*) AS n, SUM(ntok) AS tk FROM b GROUP BY band)
SELECT CAST(band AS BIGINT) AS band, CAST(n AS BIGINT) AS n_docs,
       CAST(tk AS BIGINT) AS n_tokens,
       ROUND(CAST(tk AS DOUBLE) / SUM(CAST(tk AS DOUBLE)) OVER (), 6)
         AS tok_share,
       ROUND(CAST(SUM(tk) OVER (ORDER BY band DESC) AS DOUBLE)
             / SUM(CAST(tk AS DOUBLE)) OVER (), 6) AS cum_tok_share
FROM g
"""


def len_token_corr(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Pearson correlation between a document's CHARACTER length and its
    whitespace TOKEN count — the tokenizer sanity scalar (near-1 for
    natural prose; a drop means long unsegmented blobs arrived, the kind
    that blow up BPE later). The ``corr_value_hour`` exactness mold:
    integer sufficient statistics per batch (chars < ~1e5, tokens < ~2e4
    per doc keep Σx² int64-safe at batch_size 4096), Python-int merge,
    one shared double expression rounded 6. Null-text docs drop on both
    sides. Output: n_docs, corr_len_tokens."""
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def suff(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        x = d["text"].str.len().to_numpy(dtype="int64")
        y = d["text"].str.count(r"[^ ]+").to_numpy(dtype="int64")
        return pd.DataFrame({
            "k": ["all"],
            "n": [np.int64(len(d))],
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
                "n_docs": pd.array([], dtype="int64"),
                "corr_len_tokens": pd.array([], dtype="float64"),
            })
        corr = float(n * sxy - sx * sy) / math.sqrt(float(dx) * float(dy))
        return pd.DataFrame({
            "n_docs": pd.array([n], dtype="int64"),
            "corr_len_tokens": [float(np.round(corr, 6))],
        })

    return bucketed_group_apply(
        docs.select_columns(["doc_id", "text"]).map_batches(
            suff, batch_format="pandas", batch_size=4096
        ),
        ["k"], final, n_buckets=1,
    )


LEN_TOKEN_CORR_SQL = """
WITH d AS (
  SELECT CAST(length(text) AS BIGINT) AS x,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS y
  FROM documents WHERE text IS NOT NULL
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM d
)
SELECT n AS n_docs,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6)
         AS corr_len_tokens
FROM s WHERE n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
"""


def numeric_share_by_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """NUMERIC-token density by source: the share of whitespace tokens
    that are pure digit runs, per source — the tables-and-logs leakage
    detector for a text corpus (a source whose numeric share spikes is
    shipping CSV dumps, not prose). Exact integer token counts per batch
    (regex count of ' '-delimited digit runs, anchors included); the
    rollup exchange is source-bounded; the share is one double division
    rounded 6. Output: source, n_tokens, n_numeric, numeric_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        ntok = (d["text"].str.count(" ") + 1).astype("int64")
        # a token is numeric iff it is a non-empty all-digit run between
        # space boundaries (or string anchors)
        num = d["text"].str.count(r"(?:(?<= )|^)[0-9]+(?=(?: |$))")\
            .astype("int64")
        g = pd.DataFrame({
            "source": d["source"], "n": ntok, "num": num,
        }).groupby("source", sort=False).sum().reset_index()
        return g

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False)[["n", "num"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        num = g["num"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "source": g.index,
            "n_tokens": n,
            "n_numeric": num,
            "numeric_share": np.round(num.astype("float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["source"], final, n_buckets=1)


NUMERIC_SHARE_BY_SOURCE_SQL = """
WITH d AS (
  SELECT source, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
s AS (
  SELECT source, CAST(len(t) AS BIGINT) AS n,
         CAST(len(list_filter(t, x -> regexp_full_match(x, '[0-9]+')))
              AS BIGINT) AS num
  FROM d
),
g AS (SELECT source, SUM(n) AS n, SUM(num) AS num FROM s GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n_tokens,
       CAST(num AS BIGINT) AS n_numeric,
       ROUND(CAST(num AS DOUBLE) / n, 6) AS numeric_share
FROM g
"""


def lang_entropy_by_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Language DIVERSITY per source: Shannon entropy of the declared
    ``lang`` mix inside each source — the routing signal for
    language-specific pipeline stages (a source at entropy 0 can skip
    per-doc language dispatch entirely). (source, lang) counts are exact
    partials; entropy follows the ``hourly_entropy`` discipline
    (np.log2, round 6, ``+ 0.0`` -0.0 fold); the exchange is bounded by
    sources × languages. Output: source, n_docs, n_langs, lang_entropy."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["source", "lang"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = docs.select_columns(["source", "lang"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    def per_source(bucket: pd.DataFrame) -> pd.DataFrame:
        sl = bucket.groupby(["source", "lang"], sort=False)["n"].sum()\
            .reset_index()
        rows = []
        for s, g in sl.groupby("source", sort=False):
            n = g["n"].to_numpy(dtype="int64")
            nt = int(n.sum())
            p = n.astype("float64") / float(nt)
            ent = 0.0 - float((p * np.log2(p)).sum()) + 0.0
            rows.append((s, nt, len(n), np.round(ent, 6) + 0.0))
        if not rows:
            return pd.DataFrame({
                "source": pd.Series([], dtype="object"),
                "n_docs": pd.Series([], dtype="int64"),
                "n_langs": pd.Series([], dtype="int64"),
                "lang_entropy": pd.Series([], dtype="float64"),
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_docs", "n_langs", "lang_entropy"
        ]).astype({"n_docs": "int64", "n_langs": "int64"})

    return bucketed_group_apply(parts, ["source"], per_source,
                                n_buckets=4)


LANG_ENTROPY_BY_SOURCE_SQL = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS DOUBLE) AS n
  FROM documents GROUP BY 1, 2
),
t AS (SELECT source, SUM(n) AS nt, COUNT(*) AS nl FROM c GROUP BY source)
SELECT c.source, CAST(t.nt AS BIGINT) AS n_docs,
       CAST(t.nl AS BIGINT) AS n_langs,
       ROUND(0.0 - SUM((c.n / t.nt) * log2(c.n / t.nt)), 6) + 0.0
         AS lang_entropy
FROM c JOIN t USING (source)
GROUP BY c.source, t.nt, t.nl
"""


def size_by_lang(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus MASS by declared language: document count, exact token
    total, and half-up mean document length per lang — the table a
    multilingual sampling quota starts from (``corpus_composition``'s
    by-source view along the language axis). Exact integer partials,
    lang-bounded exchange; the doc share is one double division rounded
    6. Output: lang, n_docs, n_tokens, avg_tokens, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        ntok = d["text"].str.count(r"[^ ]+").astype("int64")
        g = pd.DataFrame({
            "lang": d["lang"], "n": np.int64(1), "ntok": ntok,
        }).groupby("lang", sort=False).sum().reset_index()
        return g.astype({"n": "int64", "ntok": "int64"})

    parts = docs.select_columns(["lang", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("lang", sort=False)[["n", "ntok"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        tk = g["ntok"].to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "lang": g.index,
            "n_docs": n,
            "n_tokens": tk,
            "avg_tokens": (2 * tk + n) // (2 * n),
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(parts, ["lang"], final, n_buckets=1)


SIZE_BY_LANG_SQL = """
WITH d AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ntok
  FROM documents WHERE text IS NOT NULL
),
s AS (SELECT lang, COUNT(*) AS n, SUM(ntok) AS tk FROM d GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_docs, CAST(tk AS BIGINT) AS n_tokens,
       CAST((2 * tk + n) // (2 * n) AS BIGINT) AS avg_tokens,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM s
"""


def token_quantiles_by_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-SOURCE exact token-count quantiles (p50/p90) — the batch-size
    planning table (a source whose p90 is 10x its p50 needs smaller
    map batches than a uniform one). Token counts are INTEGERS, so the
    grouped quantile needs no histogram descent: per-(source, ntok)
    counts reduce source-bucketed (distinct counts per source are
    bounded by the max document length), and each source's order
    statistics come from one cumulative-sum rank selection with the
    QUANTILE_CONT-identical interpolation of ``functions/quantile.py``
    (p = q·(n-1), linear between bracketing values), rounded 6.
    Output: source, n_docs, p50_tokens, p90_tokens."""
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        ntok = d["text"].str.count(r"[^ ]+").astype("int64")
        g = ntok.groupby([d["source"], ntok]).size()
        out = g.reset_index(name="n")
        out.columns = ["source", "ntok", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def per_source(bucket: pd.DataFrame) -> pd.DataFrame:
        h = bucket.groupby(["source", "ntok"], sort=False)["n"].sum()\
            .reset_index()
        rows = []
        for s, g in h.groupby("source", sort=False):
            g = g.sort_values("ntok")
            v = g["ntok"].to_numpy(dtype="int64")
            c = g["n"].to_numpy(dtype="int64")
            cum = np.cumsum(c)
            n = int(cum[-1])

            def at_rank(k: int) -> float:
                return float(v[np.searchsorted(cum, k + 1)])

            qs = []
            for q in (0.5, 0.9):
                p = q * (n - 1)
                k = int(math.floor(p))
                k2 = min(k + 1, n - 1)
                frac = p - k
                qs.append(np.round(
                    at_rank(k) + frac * (at_rank(k2) - at_rank(k)), 6))
            rows.append((s, n, qs[0], qs[1]))
        if not rows:
            return pd.DataFrame({
                "source": pd.Series([], dtype="object"),
                "n_docs": pd.Series([], dtype="int64"),
                "p50_tokens": pd.Series([], dtype="float64"),
                "p90_tokens": pd.Series([], dtype="float64"),
            })
        return pd.DataFrame(rows, columns=[
            "source", "n_docs", "p50_tokens", "p90_tokens"
        ]).astype({"n_docs": "int64"})

    return bucketed_group_apply(parts, ["source"], per_source,
                                n_buckets=4)


TOKEN_QUANTILES_BY_SOURCE_SQL = """
WITH d AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ntok
  FROM documents WHERE text IS NOT NULL
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(QUANTILE_CONT(ntok, 0.5), 6) AS p50_tokens,
       ROUND(QUANTILE_CONT(ntok, 0.9), 6) AS p90_tokens
FROM d GROUP BY source
"""


def caps_share_by_source(docs: ray.data.Dataset) -> ray.data.Dataset:
    """SHOUTING density by source: the share of multi-letter tokens
    written in ALL CAPS, per source — the forum/log-noise prior a
    quality filter combines with ``numeric_share_by_source`` (prose has
    few all-caps tokens; scraped headers and stack traces have many).
    A token counts as caps iff it is 2+ uppercase A-Z letters between
    space boundaries; both counts are exact ints and the share is one
    double division rounded 6. Output: source, n_tokens, n_caps,
    caps_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        ntok = (d["text"].str.count(" ") + 1).astype("int64")
        caps = d["text"].str.count(r"(?:(?<= )|^)[A-Z]{2,}(?=(?: |$))")\
            .astype("int64")
        return pd.DataFrame({
            "source": d["source"], "n": ntok, "caps": caps,
        }).groupby("source", sort=False).sum().reset_index()

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False)[["n", "caps"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        c = g["caps"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "source": g.index,
            "n_tokens": n,
            "n_caps": c,
            "caps_share": np.round(c.astype("float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["source"], final, n_buckets=1)


CAPS_SHARE_BY_SOURCE_SQL = """
WITH d AS (
  SELECT source, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
s AS (
  SELECT source, CAST(len(t) AS BIGINT) AS n,
         CAST(len(list_filter(t, x -> regexp_full_match(x, '[A-Z]{2,}')))
              AS BIGINT) AS caps
  FROM d
),
g AS (SELECT source, SUM(n) AS n, SUM(caps) AS caps
      FROM s GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n_tokens,
       CAST(caps AS BIGINT) AS n_caps,
       ROUND(CAST(caps AS DOUBLE) / n, 6) AS caps_share
FROM g
"""


def top_word_coverage(
    docs: ray.data.Dataset,
    ks: tuple = (10, 100, 1000),
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """Token-mass COVERAGE of the top-k vocabulary: what share of all
    tokens the k most frequent words account for, at several k — the
    one-table answer to "how big a vocab do I actually need"
    (``word_freq_hist``'s spectrum reduced to the cumulative numbers a
    tokenizer budget uses). Word counts reduce word-bucketed (lowercase
    ' '-split, the house rule); each bucket emits its own top-max(k)
    candidates plus its token-mass total (lossless head-k union); the
    driver merges max(k) × n_buckets rows with deterministic ties
    (count desc, then word). Output: k, n_tokens_top, n_tokens_total,
    coverage."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    kmax = max(ks)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        tf = _token_frame(d)
        s = tf.groupby("tok", sort=False).size()
        return pd.DataFrame({
            "tok": s.index,
            "c": s.to_numpy().astype("int64"),
        })

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("tok", sort=False)["c"].sum().reset_index()
        g = g.sort_values(["c", "tok"], ascending=[False, True],
                          kind="mergesort")
        top = g.head(kmax).copy()
        top["mass"] = np.int64(0)
        tot = pd.DataFrame({
            "tok": [""], "c": pd.array([0], dtype="int64"),
            "mass": pd.array([int(g["c"].sum())], dtype="int64"),
        })
        return pd.concat([top, tot], ignore_index=True)

    cand = bucketed_group_apply(
        docs.select_columns(["doc_id", "text"]).map_batches(
            partial, batch_format="pandas", batch_size=8192
        ),
        ["tok"], per_bucket, n_buckets=n_buckets,
    ).to_pandas()  # <= (kmax+1) x n_buckets rows — bounded

    total = int(cand["mass"].sum())
    words = cand[cand["c"] > 0].sort_values(
        ["c", "tok"], ascending=[False, True], kind="mergesort")
    rows = []
    for k in ks:
        topc = int(words.head(k)["c"].sum())
        rows.append((int(k), topc, total,
                     float(np.round(float(topc) / float(total), 6))))
    return ray.data.from_pandas(pd.DataFrame(rows, columns=[
        "k", "n_tokens_top", "n_tokens_total", "coverage"
    ]).astype({"k": "int64", "n_tokens_top": "int64",
               "n_tokens_total": "int64"}))


def top_word_coverage_sql(ks: tuple = (10, 100, 1000)) -> str:
    legs = []
    for k in ks:
        legs.append(f"""
SELECT {k} AS k,
       (SELECT CAST(SUM(c) AS BIGINT) FROM (
          SELECT c FROM w ORDER BY c DESC, tok LIMIT {k}))
         AS n_tokens_top,
       (SELECT CAST(SUM(c) AS BIGINT) FROM w) AS n_tokens_total,
       ROUND(
         CAST((SELECT SUM(c) FROM (
            SELECT c FROM w ORDER BY c DESC, tok LIMIT {k})) AS DOUBLE)
         / (SELECT CAST(SUM(c) AS DOUBLE) FROM w), 6) AS coverage""")
    return (
        """
WITH tf AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
w AS (SELECT tok, COUNT(*) AS c FROM tf GROUP BY tok)"""
        + "\nUNION ALL".join(legs)
    )


def nonascii_by_lang(docs: ray.data.Dataset) -> ray.data.Dataset:
    """NON-ASCII character density per declared language — the script
    sanity check (a 'zh' feed near zero non-ASCII is mislabeled or
    transliterated; an 'en' feed spiking is mojibake). Exact integer
    char counts per batch; lang-bounded exchange; the share is one
    double division rounded 6. Output: lang, n_chars, n_nonascii,
    nonascii_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        nch = d["text"].str.len().astype("int64")
        na = d["text"].str.count(r"[^\x00-\x7F]").astype("int64")
        return pd.DataFrame({
            "lang": d["lang"], "n": nch, "na": na,
        }).groupby("lang", sort=False).sum().reset_index()

    parts = docs.select_columns(["lang", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("lang", sort=False)[["n", "na"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        na = g["na"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "lang": g.index,
            "n_chars": n,
            "n_nonascii": na,
            "nonascii_share": np.round(na.astype("float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["lang"], final, n_buckets=1)


NONASCII_BY_LANG_SQL = """
WITH d AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS n,
         CAST(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g'))
              AS BIGINT) AS na
  FROM documents WHERE text IS NOT NULL
),
s AS (SELECT lang, SUM(n) AS n, SUM(na) AS na FROM d GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_chars,
       CAST(na AS BIGINT) AS n_nonascii,
       ROUND(CAST(na AS DOUBLE) / n, 6) AS nonascii_share
FROM s
"""


def word_entropy(docs: ray.data.Dataset, n_buckets: int = 16
                 ) -> ray.data.Dataset:
    """Corpus UNIGRAM ENTROPY: Shannon entropy of the word distribution
    (bits/token) — the single number that moves when a corpus degenerates
    toward templates (entropy falls) or noise (entropy approaches
    log2(vocab)); the word-level sibling of ``text_char_entropy``.
    Identity H = log2(T) - (Σ c·log2 c)/T makes it one pass of exact
    integer word counts: word-bucketed reduction emits per-bucket
    Σ c·log2 c (float) and Σ c / vocab (ints); the final fold is one
    double expression rounded 6 (order noise absorbed, the
    ``hourly_entropy`` discipline). Output: n_tokens, vocab_size,
    word_entropy."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        tf = _token_frame(d)
        s = tf.groupby("tok", sort=False).size()
        return pd.DataFrame({
            "tok": s.index,
            "c": s.to_numpy().astype("int64"),
        })

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("tok", sort=False)["c"].sum()
        c = g.to_numpy(dtype="int64")
        return pd.DataFrame({
            "k": ["all"],
            "t": [np.int64(c.sum())],
            "v": [np.int64(len(c))],
            "clogc": [float((c.astype("float64")
                             * np.log2(c.astype("float64"))).sum())],
        })

    mid = bucketed_group_apply(
        docs.select_columns(["doc_id", "text"]).map_batches(
            partial, batch_format="pandas", batch_size=8192
        ),
        ["tok"], per_bucket, n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        t = int(bucket["t"].sum())
        v = int(bucket["v"].sum())
        clogc = float(bucket["clogc"].sum())
        if not t:
            return pd.DataFrame({
                "n_tokens": pd.array([], dtype="int64"),
                "vocab_size": pd.array([], dtype="int64"),
                "word_entropy": pd.array([], dtype="float64"),
            })
        h = np.log2(float(t)) - clogc / float(t)
        return pd.DataFrame({
            "n_tokens": pd.array([t], dtype="int64"),
            "vocab_size": pd.array([v], dtype="int64"),
            "word_entropy": [float(np.round(h, 6)) + 0.0],
        })

    return bucketed_group_apply(mid, ["k"], final, n_buckets=1)


WORD_ENTROPY_SQL = """
WITH tf AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
w AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tf GROUP BY tok),
s AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS v,
         SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clogc
  FROM w
)
SELECT t AS n_tokens, v AS vocab_size,
       ROUND(log2(CAST(t AS DOUBLE)) - clogc / CAST(t AS DOUBLE), 6)
         + 0.0 AS word_entropy
FROM s
"""


def short_doc_share(
    docs: ray.data.Dataset, min_tokens: int = 5
) -> ray.data.Dataset:
    """SHORT-document share by source: the fraction of documents under
    ``min_tokens`` whitespace tokens — the first knob every curation
    funnel turns (fragments dominate some feeds, and dropping them
    changes the source mix downstream quotas depend on). Exact integer
    counts; source-bounded exchange; share rounds 6.
    Output: source, n_docs, n_short, short_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        ntok = d["text"].str.count(r"[^ ]+").astype("int64")
        g = pd.DataFrame({
            "source": d["source"],
            "n": np.int64(1),
            "s": (ntok < min_tokens).astype("int64"),
        }).groupby("source", sort=False).sum().reset_index()
        return g.astype({"n": "int64", "s": "int64"})

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("source", sort=False)[["n", "s"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        s = g["s"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "source": g.index,
            "n_docs": n,
            "n_short": s,
            "short_share": np.round(s.astype("float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["source"], final, n_buckets=1)


SHORT_DOC_SHARE_SQL_TEMPLATE = """
WITH d AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS ntok
  FROM documents WHERE text IS NOT NULL
),
s AS (
  SELECT source, COUNT(*) AS n,
         SUM(CASE WHEN ntok < {min_tokens} THEN 1 ELSE 0 END) AS sh
  FROM d GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_docs, CAST(sh AS BIGINT) AS n_short,
       ROUND(CAST(sh AS DOUBLE) / n, 6) AS short_share
FROM s
"""


def bigram_cond_entropy(
    docs: ray.data.Dataset, n_buckets: int = 16
) -> ray.data.Dataset:
    """Conditional WORD entropy H(w2 | w1) = H(bigram) - H(unigram-prefix)
    — the one-scalar language-model difficulty proxy (predictable
    template corpora score near 0; natural prose sits a few bits up;
    ``text_word_entropy``'s sequential sibling). Within-document adjacent
    pairs only (the ``collocations`` pair rule); both distributions
    reduce as exact integer counts in ONE bigram-bucketed shuffle (the
    prefix marginal folds from the same bigram counts); the entropies
    use the c·log2 c identity, rounded 6 at the end.
    Output: n_bigrams, bigram_entropy, cond_entropy."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        toks = d["text"].str.lower().str.split(" ")
        w1, w2 = [], []
        for ws in toks:
            w1.extend(ws[:-1])
            w2.extend(ws[1:])
        if not w1:
            return pd.DataFrame({
                "w1": pd.Series([], dtype="object"),
                "w2": pd.Series([], dtype="object"),
                "c": pd.Series([], dtype="int64"),
            })
        g = pd.DataFrame({"w1": w1, "w2": w2}).groupby(
            ["w1", "w2"], sort=False
        ).size()
        out = g.reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        return out

    # two shuffles, same partial stream: (w1,w2)-bucketed for the bigram
    # side and w1-bucketed for the exact prefix marginal
    parts = docs.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    ).materialize()

    def bi_fold(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["w1", "w2"], sort=False)["c"].sum()
        c = g.to_numpy(dtype="float64")
        return pd.DataFrame({
            "k": ["all"],
            "t": [np.int64(int(c.sum()))],
            "clogc": [float((c * np.log2(c)).sum())],
        })

    def w1_fold(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("w1", sort=False)["c"].sum()
        c = g.to_numpy(dtype="float64")
        return pd.DataFrame({
            "k": ["all"],
            "clogc": [float((c * np.log2(c)).sum())],
        })

    bi = bucketed_group_apply(parts, ["w1", "w2"], bi_fold,
                              n_buckets=n_buckets).to_pandas()
    w1m = bucketed_group_apply(parts, ["w1"], w1_fold,
                               n_buckets=n_buckets).to_pandas()

    t = int(bi["t"].sum())
    if not t:
        return pd.DataFrame({
            "n_bigrams": pd.array([], dtype="int64"),
            "bigram_entropy": pd.array([], dtype="float64"),
            "cond_entropy": pd.array([], dtype="float64"),
        })
    h_bi = np.log2(float(t)) - float(bi["clogc"].sum()) / float(t)
    h_w1 = np.log2(float(t)) - float(w1m["clogc"].sum()) / float(t)
    return ray.data.from_pandas(pd.DataFrame({
        "n_bigrams": pd.array([t], dtype="int64"),
        "bigram_entropy": [float(np.round(h_bi, 6)) + 0.0],
        "cond_entropy": [float(np.round(h_bi - h_w1, 6)) + 0.0],
    }))


BIGRAM_COND_ENTROPY_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
       FROM bg GROUP BY w1, w2),
s AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t,
         SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clogc_bi
  FROM bc
),
m AS (
  SELECT SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clogc_w1
  FROM (SELECT w1, CAST(SUM(c) AS BIGINT) AS c FROM bc GROUP BY w1)
)
SELECT s.t AS n_bigrams,
       ROUND(log2(CAST(s.t AS DOUBLE)) - s.clogc_bi / CAST(s.t AS DOUBLE),
             6) + 0.0 AS bigram_entropy,
       ROUND((log2(CAST(s.t AS DOUBLE)) - s.clogc_bi / CAST(s.t AS DOUBLE))
             - (log2(CAST(s.t AS DOUBLE))
                - m.clogc_w1 / CAST(s.t AS DOUBLE)), 6) + 0.0
         AS cond_entropy
FROM s, m
"""


def bottomk_sample(docs: ray.data.Dataset, k: int = 50) -> ray.data.Dataset:
    """Deterministic EXACT-k global sample: the ``k`` docs with the smallest
    md5(doc_id) digest corpus-wide, with their global sample rank — the
    distributed bottom-k sketch (the fixed-size uniform "reservoir" made
    reproducible: hash order is a random permutation of doc ids, so the
    bottom k of it is a uniform k-subset that is STABLE across runs, block
    orders and cluster sizes — the property a seeded reservoir loses).
    Complements ``quota_sample_by_source`` (per-group quota) with the
    global-quota form of the O5 sampling analogue (src/Visualizer.jl:192-197).

    Shape: per-batch LOCAL bottom-k combiner (at most k rows per input block
    survive), one k-row-per-block exchange, final bottom-k + rank on the
    driver-side k rows (dimension-bounded: k, never corpus-sized). Output:
    sample_rank, doc_id, source."""
    from tcx2graph_jl_ray.functions.digest import md5_hex

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        ids = batch["doc_id"].astype("int64")
        df = pd.DataFrame({
            "doc_id": ids.to_numpy(),
            "source": batch["source"].to_numpy(),
            "hx": md5_hex(ids.astype(str).to_numpy()),
        })
        return df.sort_values(["hx", "doc_id"], kind="mergesort").head(k)

    cand = docs.select_columns(["doc_id", "source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    ).to_pandas()  # <= k rows per input block: dimension-bounded
    top = cand.sort_values(["hx", "doc_id"], kind="mergesort").head(k)
    out = pd.DataFrame({
        "sample_rank": np.arange(1, len(top) + 1, dtype="int64"),
        "doc_id": top["doc_id"].to_numpy(),
        "source": top["source"].to_numpy(),
    })
    return ray.data.from_pandas(out)


BOTTOMK_SAMPLE_SQL_TEMPLATE = """
WITH h AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         md5(CAST(doc_id AS VARCHAR)) AS hx
  FROM documents WHERE text IS NOT NULL
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY hx, doc_id) AS BIGINT)
         AS sample_rank,
       doc_id, source
FROM h
ORDER BY hx, doc_id
LIMIT {k}
"""


def mixture_weights(docs: ray.data.Dataset, n_buckets: int = 8) -> ray.data.Dataset:
    """Per-source DATA-MIXING weights for temperature-based sampling
    (T = 1/2): the raw token share and the sqrt-damped weight that
    up-samples small sources / down-samples dominant ones — the knob a
    pretraining data loader turns to set corpus composition. Token count
    is the whitespace tokenization the token-counting suite uses.

    Float discipline: sqrt is IEEE-exact (correctly rounded, unlike pow/
    log), and BOTH emitted doubles divide by a function of the EXACT
    integer corpus total only — no cross-source float summation, so no
    summation-order hazard (the rel_part_pareto lesson).
    ``temp_weight = sqrt(c_s) / sqrt(c_total)`` renormalizes to the true
    T=1/2 distribution by a source-independent constant (Σ_s temp_weight),
    which the consumer applies after the (tiny) table is collected.
    Output: source, n_docs, n_tokens, raw_share, temp_weight."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        ntok = batch["text"].str.split(" ").map(len).astype("int64")
        g = pd.DataFrame({
            "source": batch["source"].to_numpy(),
            "n_docs": np.int64(1),
            "n_tokens": ntok.to_numpy(),
        }).groupby("source", sort=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum")
        ).reset_index()
        for c in ("n_docs", "n_tokens"):
            g[c] = g[c].astype("int64")
        return g

    parts = docs.select_columns(["source", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    per_source = bucketed_group_apply(
        parts, ["source"],
        lambda b: b.groupby("source", sort=False)[["n_docs", "n_tokens"]]
        .sum().astype("int64").reset_index(),
        n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        c = bucket["n_tokens"].astype("int64").to_numpy()
        total = float(np.int64(c.sum()))
        return pd.DataFrame({
            "source": bucket["source"].to_numpy(),
            "n_docs": bucket["n_docs"].astype("int64").to_numpy(),
            "n_tokens": c,
            "raw_share": np.round(c.astype("float64") / total, 6),
            "temp_weight": np.round(
                np.sqrt(c.astype("float64")) / np.sqrt(total), 6
            ),
        })

    keyed = per_source.map_batches(
        lambda b: b.assign(g=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["g"], lambda b: final(b.drop(columns=["g"])), n_buckets=1
    )


MIXTURE_WEIGHTS_SQL = """
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
              AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source
),
t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM s)
SELECT s.source, s.n_docs, s.n_tokens,
       ROUND(CAST(s.n_tokens AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
         AS raw_share,
       ROUND(sqrt(CAST(s.n_tokens AS DOUBLE))
             / sqrt(CAST(t.total AS DOUBLE)), 6) AS temp_weight
FROM s, t
"""


def snapshot_diff(docs: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """SNAPSHOT DIFF between two crawls of the same corpus — the
    incremental-processing primitive that decides how much of yesterday's
    pipeline output is reusable today. Snapshot identity is modeled
    deterministically on the one corpus the testdata provides: logical key
    = doc_id // 2, OLD snapshot = even doc_ids, NEW = odd, so a key can be
    present in one, the other, or both; "changed" compares md5(text).
    Output one row: n_added (new only), n_removed (old only), n_changed
    (both, digest differs), n_unchanged (both, digest equal), plus the
    reuse_share a delta run skips = unchanged / new-snapshot size.

    Shape: per-batch (key, side, digest) projection, one key-bucketed
    pairing reduce folded to int scalar partials, one final sum — the
    digest exchange is one row per doc, never the text."""
    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.hygiene import nonnull_text

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = nonnull_text(batch)
        ids = batch["doc_id"].astype("int64").to_numpy()
        return pd.DataFrame({
            "key": ids // 2,
            "is_new": (ids % 2 == 1),
            "dg": md5_hex(batch["text"].to_numpy()),
        })

    parts = docs.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )

    def fold_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        old = bucket[~bucket["is_new"]].set_index("key")["dg"]
        new = bucket[bucket["is_new"]].set_index("key")["dg"]
        j = old.to_frame("dg_old").join(new.to_frame("dg_new"), how="outer")
        added = j["dg_old"].isna()
        removed = j["dg_new"].isna()
        both = ~added & ~removed
        changed = both & (j["dg_old"] != j["dg_new"])
        return pd.DataFrame({
            "n_added": [np.int64(added.sum())],
            "n_removed": [np.int64(removed.sum())],
            "n_changed": [np.int64(changed.sum())],
            "n_unchanged": [np.int64((both & ~changed).sum())],
        })

    scalar_parts = bucketed_group_apply(parts, ["key"], fold_bucket,
                                        n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.sum()
        n_added = int(s["n_added"])
        n_changed = int(s["n_changed"])
        n_unchanged = int(s["n_unchanged"])
        new_total = n_added + n_changed + n_unchanged
        return pd.DataFrame({
            "n_added": [np.int64(n_added)],
            "n_removed": [np.int64(s["n_removed"])],
            "n_changed": [np.int64(n_changed)],
            "n_unchanged": [np.int64(n_unchanged)],
            "reuse_share": [np.round(float(n_unchanged) / float(new_total),
                                     6)],
        })

    keyed = scalar_parts.map_batches(
        lambda b: b.assign(g=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_apply(
        keyed, ["g"], lambda b: final(b.drop(columns=["g"])), n_buckets=1
    )


SNAPSHOT_DIFF_SQL = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) // 2 AS key,
         CAST(doc_id AS BIGINT) % 2 = 1 AS is_new,
         md5(text) AS dg
  FROM documents WHERE text IS NOT NULL
),
j AS (
  SELECT o.dg AS dg_old, n.dg AS dg_new
  FROM (SELECT key, dg FROM d WHERE NOT is_new) o
  FULL OUTER JOIN (SELECT key, dg FROM d WHERE is_new) n USING (key)
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN dg_old IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_added,
    CAST(SUM(CASE WHEN dg_new IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_removed,
    CAST(SUM(CASE WHEN dg_old IS NOT NULL AND dg_new IS NOT NULL
                   AND dg_old <> dg_new THEN 1 ELSE 0 END) AS BIGINT)
      AS n_changed,
    CAST(SUM(CASE WHEN dg_old IS NOT NULL AND dg_new IS NOT NULL
                   AND dg_old = dg_new THEN 1 ELSE 0 END) AS BIGINT)
      AS n_unchanged
  FROM j
)
SELECT n_added, n_removed, n_changed, n_unchanged,
       ROUND(CAST(n_unchanged AS DOUBLE)
             / CAST(n_added + n_changed + n_unchanged AS DOUBLE), 6)
         AS reuse_share
FROM agg
"""


def curriculum_order(docs: ray.data.Dataset, n_buckets: int = 32) -> ray.data.Dataset:
    """Global CURRICULUM ORDER for training: every doc's position in the
    deterministic schedule that walks quality bands from the most
    natural-language-dense down (band = the pure-integer stopword banding
    of ``quality_band_tokens``) and shuffles WITHIN a band by md5(doc_id)
    — the "easy-to-hard, shuffled within difficulty" data ordering a
    curriculum loader consumes, reproducible across runs and cluster
    sizes.

    A global ROW_NUMBER without a global sort: the sort-key prefix
    (band, first hex byte of the shuffle digest) linearizes into ≤2560
    chunks; order-free per-chunk counts make one tiny driver-side
    exclusive prefix (broadcast once via ray.put), then each chunk ranks
    locally — the ``pack_sequences`` two-phase discipline applied to an
    arbitrary sort key. Output: doc_id, band, curriculum_rank (int64,
    1-based)."""
    import ray as _ray

    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        d = _nonnull_text(batch)
        ntok = (d["text"].str.count(" ") + 1).astype("int64")
        tf = _token_frame(d)
        stops = tf[tf["tok"].isin(STOPWORDS)].groupby("row").size()
        n_stop = (
            pd.Series(0, index=range(len(d)))
            .add(stops, fill_value=0)
            .astype("int64")
        )
        band = np.minimum(10 * n_stop.to_numpy() // ntok.to_numpy(), 9)
        ids = d["doc_id"].astype("int64").to_numpy()
        hx = np.asarray(md5_hex(ids.astype(str)), dtype="U32")
        byte0 = np.array([int(h[:2], 16) for h in hx], dtype="int64")
        return pd.DataFrame({
            "doc_id": ids,
            "band": band.astype("int64"),
            "hx": hx,
            # (band DESC, hx ASC) linearized: lower chunk = earlier
            "chunk": (9 - band) * 256 + byte0,
        })

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        keyed, batch_format="pandas", batch_size=8192
    )

    counts = (
        rows.map_batches(
            lambda b: b.groupby("chunk", sort=False).size()
            .reset_index(name="n"),
            batch_format="pandas",
        )
        .to_pandas()  # <= 2560 chunk rows per input block
        .groupby("chunk", sort=True)["n"].sum()
    )
    offsets = (counts.cumsum() - counts).astype("int64")
    off_ref = _ray.put(offsets.to_dict())

    class _Rank:
        def __init__(self, ref):
            self.off = _ray.get(ref)

        def __call__(self, bucket: pd.DataFrame) -> pd.DataFrame:
            g = bucket.sort_values(["hx", "doc_id"], kind="mergesort")
            local = g.groupby("chunk", sort=False).cumcount()
            base = g["chunk"].map(self.off).to_numpy(dtype="int64")
            return pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(),
                "band": g["band"].to_numpy(),
                "curriculum_rank": base + local.to_numpy() + 1,
            })

    return bucketed_group_apply(
        rows, ["chunk"], _Rank(off_ref), n_buckets=n_buckets
    )


CURRICULUM_ORDER_SQL = f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         string_split(lower(text), ' ') AS t,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
           AS ntok
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id,
         LEAST(10 * len(list_filter(t, x -> x IN {STOPWORDS})) // ntok, 9)
           AS band,
         md5(CAST(doc_id AS VARCHAR)) AS hx
  FROM d
)
SELECT doc_id, CAST(band AS BIGINT) AS band,
       CAST(ROW_NUMBER() OVER (ORDER BY band DESC, hx, doc_id) AS BIGINT)
         AS curriculum_rank
FROM b
"""


def crosslang_winnow_pairs(
    docs: ray.data.Dataset,
    min_shared: int = 2,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """CROSS-LANGUAGE near-dup pairs: winnowing-fingerprint matches whose
    endpoints carry DIFFERENT language tags — the translation-leak /
    mislabeled-language detector a multilingual corpus runs after
    per-language dedup (same-language pairs are the ordinary
    ``dedup_winnow_pairs`` finding; a cross-language fingerprint match
    means either a copied passage survived translation or a lang tag is
    wrong). Composition: the winnow pair graph joined twice against the
    doc→lang dimension through the co-partitioned hash join. Output:
    a, b, lang_a, lang_b, n_shared (a < b)."""
    from tcx2graph_jl_ray.functions.join import hash_join

    pairs = winnow_neardup_pairs(docs, min_shared=min_shared)
    if pairs.schema() is None:
        # typed empty PANDAS frame (house rule: Ray drops empty blocks at
        # schema(), so an empty Dataset would come back schemaless)
        return pd.DataFrame({
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            "lang_a": pd.Series([], dtype="object"),
            "lang_b": pd.Series([], dtype="object"),
            "n_shared": pd.Series([], dtype="int64"),
        })

    def langs(batch: pd.DataFrame) -> pd.DataFrame:
        b = _nonnull_text(batch)
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "lang": b["lang"].to_numpy(),
        })

    dim = docs.select_columns(["doc_id", "lang", "text"]).map_batches(
        langs, batch_format="pandas", batch_size=8192
    )

    pa_ = pairs.map_batches(
        lambda b: b.rename(columns={"a": "doc_id"}),
        batch_format="pandas",
    )
    ja = hash_join(pa_, dim, on="doc_id", n_buckets=n_buckets).map_batches(
        lambda b: b.rename(columns={"doc_id": "a", "lang": "lang_a",
                                    "b": "doc_id"}),
        batch_format="pandas",
    )
    jb = hash_join(
        ja,
        dim.map_batches(lambda b: b.rename(columns={"lang": "lang_b"}),
                        batch_format="pandas"),
        on="doc_id", n_buckets=n_buckets,
    ).map_batches(
        lambda b: b.rename(columns={"doc_id": "b"}), batch_format="pandas"
    )

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["lang_a"] != batch["lang_b"]]
        out = out[["a", "b", "lang_a", "lang_b", "n_shared"]].copy()
        # the two inner hash_joins pass a/b/n_shared through union-conform
        # placeholders (extension Int64) — re-emit plain int64: never null
        # here, and extension dtypes are a driver-hash hazard (r4
        # events_asof_join class)
        for c in ("a", "b", "n_shared"):
            out[c] = out[c].astype("int64")
        return out

    return jb.map_batches(keep, batch_format="pandas")


CROSSLANG_PAIRS_SQL_TEMPLATE = """
WITH p AS ({winnow_pairs})
SELECT p.a, p.b, da.lang AS lang_a, db.lang AS lang_b, p.n_shared
FROM p
JOIN documents da ON da.doc_id = p.a
JOIN documents db ON db.doc_id = p.b
WHERE da.lang <> db.lang
"""


def split_ks(
    docs: ray.data.Dataset,
    train_cut: int = 0xCB,
    val_cut: int = 0xE5,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV drift check between the train and val
    splits' document-length distributions — the release gate that catches a
    split assignment accidentally correlated with content (a hash over a
    content-derived id, a time-ordered id space...). Uses the SAME
    deterministic md5-byte assignment as ``split_assign``, so the audit
    covers the split users actually get.

    EXACT INTEGER ECDF: the sup distance is selected by comparing
    |cum_train * n_val - cum_val * n_train| in int64 (cross-multiplied —
    no float ECDFs), and the float KS is one division of the selected
    integers, identical on both sides; ks_num / ks_den ship as audit
    columns. Shape: per-batch (split, n_chars) count partials, one bucketed
    exact reduce, then a DISTINCT-LENGTH-bounded driver fold (the cumsum
    runs over distinct lengths, not rows — the ``events_histogram``
    discipline). Output one row: n_train, n_val, ks_num, ks_den (int64),
    ks (float64)."""
    from tcx2graph_jl_ray.functions.digest import md5_hex
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    train_hex, val_hex = format(train_cut, "02x"), format(val_cut, "02x")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].astype("int64")
        p2 = np.asarray(
            md5_hex(ids.astype(str).to_numpy()), dtype="U32"
        ).astype("U2")
        split = np.where(
            p2 <= train_hex, "train", np.where(p2 <= val_hex, "val", "test")
        )
        d = pd.DataFrame({
            "split": split,
            "n_chars": batch["n_chars"].astype("int64").to_numpy(),
        })
        d = d[d["split"] != "test"]
        g = d.groupby(["split", "n_chars"], sort=False).size() \
            .astype("int64").reset_index(name="n")
        return g

    parts = docs.select_columns(["doc_id", "n_chars"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )

    counts = bucketed_group_apply(
        parts, ["split", "n_chars"],
        lambda b: b.groupby(["split", "n_chars"], sort=False)["n"].sum()
        .astype("int64").reset_index(),
        n_buckets=n_buckets,
    ).to_pandas()  # distinct-length bounded, not corpus bounded

    piv = counts.pivot_table(index="n_chars", columns="split", values="n",
                             aggfunc="sum", fill_value=0).sort_index()
    c1 = piv.get("train", pd.Series(0, index=piv.index)).to_numpy("int64")
    c2 = piv.get("val", pd.Series(0, index=piv.index)).to_numpy("int64")
    n1, n2 = int(c1.sum()), int(c2.sum())
    cum1, cum2 = np.cumsum(c1), np.cumsum(c2)
    diff = np.abs(cum1 * np.int64(n2) - cum2 * np.int64(n1))
    ks_num = int(diff.max()) if len(diff) else 0
    ks_den = n1 * n2
    return ray.data.from_pandas(pd.DataFrame({
        "n_train": [np.int64(n1)],
        "n_val": [np.int64(n2)],
        "ks_num": [np.int64(ks_num)],
        "ks_den": [np.int64(ks_den)],
        "ks": [float(ks_num) / float(ks_den) if ks_den else 0.0],
    }))


def split_ks_sql(train_cut: int = 0xCB, val_cut: int = 0xE5) -> str:
    train_hex, val_hex = format(train_cut, "02x"), format(val_cut, "02x")
    return f"""
WITH s AS (
  SELECT n_chars,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                   <= '{train_hex}' THEN 'train'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                   <= '{val_hex}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
c AS (
  SELECT split, n_chars, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE split IN ('train', 'val') GROUP BY split, n_chars
),
x AS (SELECT DISTINCT n_chars FROM c),
e AS (
  SELECT x.n_chars,
         COALESCE((SELECT n FROM c WHERE c.split = 'train'
                   AND c.n_chars = x.n_chars), 0) AS c1,
         COALESCE((SELECT n FROM c WHERE c.split = 'val'
                   AND c.n_chars = x.n_chars), 0) AS c2
  FROM x
),
cum AS (
  SELECT n_chars,
         SUM(c1) OVER (ORDER BY n_chars) AS cum1,
         SUM(c2) OVER (ORDER BY n_chars) AS cum2,
         (SELECT SUM(c1) FROM e) AS n1,
         (SELECT SUM(c2) FROM e) AS n2
  FROM e
),
d AS (
  SELECT MAX(ABS(cum1 * n2 - cum2 * n1)) AS ks_num,
         ANY_VALUE(n1) AS n1, ANY_VALUE(n2) AS n2
  FROM cum
)
SELECT CAST(n1 AS BIGINT) AS n_train,
       CAST(n2 AS BIGINT) AS n_val,
       CAST(ks_num AS BIGINT) AS ks_num,
       CAST(n1 * n2 AS BIGINT) AS ks_den,
       CAST(ks_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS ks
FROM d
"""


def _bpe_word_counts(docs: ray.data.Dataset) -> pd.DataFrame:
    """Distributed exact word-frequency table (lower, split-on-space,
    empties dropped — the corpus tokenization contract). Collected to the
    driver: BPE training runs over the VOCABULARY (word -> freq), which is
    Zipf-bounded, not corpus-bounded — the same structure real tokenizer
    trainers (Sennrich BPE) exploit."""
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        toks: list[str] = []
        for t in batch["text"].to_numpy():
            toks.extend(w for w in str(t).lower().split(" ") if w)
        if not toks:
            return pd.DataFrame({"word": pd.Series(dtype="object"),
                                 "freq": pd.Series(dtype="int64")})
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pd.DataFrame({"word": u, "freq": c.astype("int64")})

    parts = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )
    resum = lambda b: (  # noqa: E731
        b.groupby("word", sort=False)["freq"].sum().astype("int64")
        .reset_index()
    )
    return salted_group_apply(
        parts, ["word"], partial_fn=resum, merge_fn=resum
    ).to_pandas()


def _bpe_learn(wc: pd.DataFrame, n_merges: int):
    """Driver-side merge loop over the vocabulary (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units"): per
    round, count adjacent symbol pairs weighted by word frequency, merge
    the most frequent (ties -> lexicographically smallest pair: fully
    deterministic), stop when no pair repeats. Returns (merges, seqs) with
    merges = [(left, right, count)] and seqs the final symbol sequences."""
    from collections import Counter

    words = wc["word"].tolist()
    freqs = wc["freq"].astype(int).tolist()
    seqs = {w: tuple(w) + ("</w>",) for w in words}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, f in zip(words, freqs):
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < 2:
            break
        merges.append((l, r, int(cnt)))
        merged = l + r
        for w in words:
            s = seqs[w]
            if l not in s:
                continue
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


def bpe_train(docs: ray.data.Dataset, n_merges: int = 16) -> ray.data.Dataset:
    """BPE TOKENIZER TRAINING over the corpus — the canonical LLM-data
    operator this engine exists to serve. Distributed exact word counting
    feeds a vocabulary-bounded driver merge loop (exactly how production
    BPE trainers are structured: the corpus pass is the scale problem, the
    merge loop is Zipf-small); merges are fully deterministic (ties ->
    lexicographically smallest pair).

    Oracle-backed since round 5: ``bpe_train_sql`` unrolls the merge loop
    into fixed CTE stages (list_reduce merge application), so the driver
    value-hash-checks this query like any other; the planted hand-computed
    merges and the token-conservation invariant
    (tokens_after == tokens_before - sum(pair_count)) remain as pytest
    backstops. Output: rank (1-based int64), left, right,
    pair_count (int64)."""
    wc = _bpe_word_counts(docs)
    merges, _ = _bpe_learn(wc, n_merges)
    return ray.data.from_pandas(pd.DataFrame({
        "rank": pd.array(range(1, len(merges) + 1), dtype="int64"),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "pair_count": pd.array([m[2] for m in merges], dtype="int64"),
    }))


def bpe_compression(
    docs: ray.data.Dataset, n_merges: int = 16
) -> ray.data.Dataset:
    """Apply the trained merges back to the corpus and report the
    compression they buy: total symbols before (chars + one </w> per word
    occurrence) vs tokens after all merges. The corpus-scale work is the
    distributed word count; the before/after totals are then VOCAB-BOUNDED
    driver sums over (word, freq) — applying merges per corpus row would
    redo identical work freq times. The exact invariant
    tokens_after == tokens_before - sum(pair_count) holds by construction
    (every merge application removes exactly one token) and is asserted in
    tests. Output one row: n_merges, tokens_before, tokens_after (int64),
    compression (float64 round 6)."""
    wc = _bpe_word_counts(docs)
    merges, seqs = _bpe_learn(wc, n_merges)
    freq = wc["freq"].astype(int).to_numpy()
    words = wc["word"].tolist()
    before = int(sum((len(w) + 1) * f for w, f in zip(words, freq)))
    after = int(sum(len(seqs[w]) * f for w, f in zip(words, freq)))
    comp = float(np.round(after / before, 6)) if before else 0.0
    return ray.data.from_pandas(pd.DataFrame({
        "n_merges": [np.int64(len(merges))],
        "tokens_before": [np.int64(before)],
        "tokens_after": [np.int64(after)],
        "compression": [comp],
    }))


def bpe_train_sql(n_merges: int) -> str:
    """DuckDB oracle for ``bpe_train`` — the merge loop UNROLLED into
    ``n_merges`` CTE stages (the ``kg_kcore`` fixed-iteration trick, per
    round-4 verdict directive 5; BPE was previously declared rows-only).

    Each stage k: (p) explode adjacent symbol pairs of every word's
    current sequence weighted by freq, (m) argmax with the engine's exact
    tie rule (count DESC, then lexicographically smallest pair; HAVING
    cnt >= 2 is the stop rule — once no pair repeats, every later stage is
    an empty no-op, matching the engine's ``break``), (s) apply the merge
    via ``list_reduce`` with a VARCHAR accumulator: symbol sequences
    travel as chr(31)-joined strings, and the fold "merge when the
    accumulator's LAST symbol equals left and the incoming symbol equals
    right" reproduces greedy left-to-right non-overlapping BPE application
    exactly (verified against the engine on aaa/aaaa chains). chr(31)
    cannot occur inside a symbol for the corpus tokenization contract
    (split-on-space words; U+001F is not expected in testdata text).

    Every CTE is MATERIALIZED: stage k references stage k-1 twice, and
    DuckDB inlines plain CTEs — 16 stages would otherwise duplicate the
    scan subtree 2^16 times (observed as fd exhaustion before planning)."""
    parts = ["""WITH wc AS MATERIALIZED (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
        FROM documents WHERE text IS NOT NULL) t
  WHERE w <> '' GROUP BY w
),
s0 AS MATERIALIZED (
  SELECT word, freq,
         array_to_string(list_append(string_split(word, ''), '</w>'),
                         chr(31)) AS seq
  FROM wc
)"""]
    for k in range(1, n_merges + 1):
        parts.append(f""",
p{k} AS MATERIALIZED (
  SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt
  FROM (SELECT string_split(seq, chr(31)) AS l, freq FROM s{k - 1}) t,
       LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) u
  GROUP BY l[i], l[i+1] HAVING SUM(freq) >= 2
),
m{k} AS MATERIALIZED (
  SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1
),
s{k} AS MATERIALIZED (
  SELECT word, freq,
    CASE WHEN mk.a IS NULL THEN seq
    ELSE list_reduce(string_split(seq, chr(31)), (acc, x) -> CASE
      WHEN (acc = mk.a OR ends_with(acc, chr(31) || mk.a)) AND x = mk.b
      THEN substr(acc, 1, length(acc) - length(mk.a)) || mk.a || mk.b
      ELSE acc || chr(31) || x END)
    END AS seq
  FROM s{k - 1} LEFT JOIN (SELECT a, b FROM m{k}) mk ON TRUE
)""")
    union = "\nUNION ALL ".join(
        f'SELECT {k} AS rank, a AS "left", b AS "right",'
        f" CAST(cnt AS BIGINT) AS pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    parts.append("\n" + union)
    return "".join(parts)


def bpe_compression_sql(n_merges: int) -> str:
    """DuckDB oracle for ``bpe_compression``: reuse the unrolled trainer
    stages, then before/after totals over (word, freq) — exact integers,
    one double division ROUND 6 (both sides divide identical doubles:
    totals < 2^53 cast exactly)."""
    train = bpe_train_sql(n_merges)
    # reuse everything up to the final UNION (the CTE chain)
    ctes = train[: train.rindex("\nSELECT 1 AS rank")]
    merges_union = "\nUNION ALL ".join(
        f"SELECT a FROM m{k}" for k in range(1, n_merges + 1)
    )
    return f"""{ctes}
SELECT CAST((SELECT COUNT(*) FROM ({merges_union})) AS BIGINT) AS n_merges,
       CAST((SELECT SUM((length(word) + 1) * freq) FROM wc) AS BIGINT)
         AS tokens_before,
       CAST((SELECT SUM(len(string_split(seq, chr(31))) * freq)
             FROM s{n_merges}) AS BIGINT) AS tokens_after,
       ROUND(CAST((SELECT SUM(len(string_split(seq, chr(31))) * freq)
                   FROM s{n_merges}) AS DOUBLE)
             / CAST((SELECT SUM((length(word) + 1) * freq) FROM wc)
                    AS DOUBLE), 6) AS compression
"""


def snapshot_vocab_drift(
    docs: ray.data.Dataset, n_buckets: int = 32
) -> ray.data.Dataset:
    """VOCABULARY DRIFT between crawl snapshots: the exact TOTAL-VARIATION
    distance between the word distributions of the OLD (even doc_id) and
    NEW (odd doc_id) snapshots — ``docs_snapshot_diff``'s deterministic
    split, answering the companion question ("did the LANGUAGE move?"
    where the diff answers "did the DOCUMENTS move?"; ``docs_split_ks``
    is the same drift idea on lengths).

    EXACT INTEGER core: TV = 1/2 * sum_w |c1_w/N1 - c2_w/N2| is computed
    as tv_num = sum_w |c1_w*N2 - c2_w*N1| over 2*N1*N2 — cross-multiplied
    int64 all the way, one final division rounded 6. Shape: salted exact
    (snapshot, word) counts, a word-bucketed pairing fold to int partials,
    one scalar sum. Output one row: n_tokens_old, n_tokens_new,
    tv_num (int64), tv (float64)."""
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _nonnull_text(batch)
        snaps, toks = [], []
        for doc_id, t in zip(
            batch["doc_id"].astype("int64").to_numpy(),
            batch["text"].to_numpy(),
        ):
            ws = [w for w in str(t).lower().split(" ") if w]
            toks.extend(ws)
            snaps.extend([int(doc_id) % 2] * len(ws))
        if not toks:
            return pd.DataFrame({
                "snap": pd.Series(dtype="int64"),
                "word": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
            })
        d = pd.DataFrame({"snap": np.asarray(snaps, dtype="int64"),
                          "word": np.asarray(toks, dtype=object)})
        g = d.groupby(["snap", "word"], sort=False).size() \
            .astype("int64").reset_index(name="n")
        return g

    parts = docs.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=4096
    )
    resum = lambda b: (  # noqa: E731
        b.groupby(["snap", "word"], sort=False)["n"].sum().astype("int64")
        .reset_index()
    )
    counts = salted_group_apply(parts, ["snap", "word"],
                                partial_fn=resum, merge_fn=resum)

    # totals per snapshot (tiny)
    tot = counts.map_batches(
        lambda b: b.groupby("snap", sort=False)["n"].sum().astype("int64")
        .reset_index(),
        batch_format="pandas",
    ).to_pandas().groupby("snap")["n"].sum()
    n1 = int(tot.get(0, 0))
    n2 = int(tot.get(1, 0))

    def pair_fold(bucket: pd.DataFrame) -> pd.DataFrame:
        piv = bucket.pivot_table(index="word", columns="snap", values="n",
                                 aggfunc="sum", fill_value=0)
        c1 = piv[0].to_numpy("int64") if 0 in piv else \
            np.zeros(len(piv), dtype="int64")
        c2 = piv[1].to_numpy("int64") if 1 in piv else \
            np.zeros(len(piv), dtype="int64")
        s = int(np.abs(c1 * n2 - c2 * n1).sum())
        return pd.DataFrame({"tvp": [np.int64(s)]})

    tv_parts = bucketed_group_apply(counts, ["word"], pair_fold,
                                    n_buckets=n_buckets).to_pandas()
    tv_num = int(tv_parts["tvp"].sum()) if len(tv_parts) else 0
    tv = float(np.round(tv_num / (2.0 * n1 * n2), 6)) if n1 and n2 else 0.0
    return ray.data.from_pandas(pd.DataFrame({
        "n_tokens_old": [np.int64(n1)],
        "n_tokens_new": [np.int64(n2)],
        "tv_num": [np.int64(tv_num)],
        "tv": [tv],
    }))


SNAPSHOT_VOCAB_DRIFT_SQL = """
WITH w AS (
  SELECT CAST(doc_id % 2 AS BIGINT) AS snap,
         unnest(list_filter(string_split(lower(text), ' '), x -> x != ''))
           AS word
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT snap, word, CAST(COUNT(*) AS BIGINT) AS n
  FROM w GROUP BY snap, word
),
tot AS (
  SELECT CAST(SUM(CASE WHEN snap = 0 THEN n ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN snap = 1 THEN n ELSE 0 END) AS BIGINT) AS n2
  FROM c
),
p AS (
  SELECT word,
         CAST(SUM(CASE WHEN snap = 0 THEN n ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN snap = 1 THEN n ELSE 0 END) AS BIGINT) AS c2
  FROM c GROUP BY word
),
s AS (
  SELECT CAST(SUM(ABS(p.c1 * tot.n2 - p.c2 * tot.n1)) AS BIGINT) AS tv_num,
         ANY_VALUE(tot.n1) AS n1, ANY_VALUE(tot.n2) AS n2
  FROM p, tot
)
SELECT n1 AS n_tokens_old, n2 AS n_tokens_new, tv_num,
       ROUND(CAST(tv_num AS DOUBLE) / (2.0 * n1 * n2), 6) AS tv
FROM s
"""
