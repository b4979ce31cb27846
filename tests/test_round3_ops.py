"""Planted-truth tests for the round-2 third-batch operators (each also has
sf0.001 oracle parity via tests/test_entry_contract.py)."""

import math

import numpy as np
import pandas as pd
import ray.data


def _events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "value"])
    df["event_id"] = range(len(df))
    df["ts"] = pd.to_datetime("2024-01-01")
    df["props"] = "{}"
    return ray.data.from_pandas(df)


def _docs(texts, n_chars=None):
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "s",
        }
    )
    df["n_chars"] = (
        df["text"].str.len() if n_chars is None else pd.Series(n_chars)
    )
    return ray.data.from_pandas(df)


def test_rank_topk_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import rank_topk_per_user

    ev = _events(
        [
            (1, "a", 5.0),
            (1, "a", 9.0),
            (1, "a", 7.0),
            (1, "a", 1.0),  # rank 4: cut at k=3
            (2, "a", 3.0),  # single event: rank 1, gap NULL
        ]
    )
    out = rank_topk_per_user(ev, k=3).to_pandas()
    u1 = out[out.user_id == 1].sort_values("rank")
    assert list(u1["value"]) == [9.0, 7.0, 5.0]
    assert math.isnan(u1["gap"].iloc[0])
    assert list(u1["gap"].iloc[1:]) == [2.0, 2.0]
    u2 = out[out.user_id == 2]
    assert len(u2) == 1 and u2["rank"].iloc[0] == 1


def test_rank_topk_combiner_across_blocks(ray_session):
    """Per-batch top-k partials must still yield the global top-k when a
    user's events span many blocks."""
    from tcx2graph_jl_ray.stages.window import rank_topk_per_user

    df = pd.DataFrame(
        {
            "user_id": 7,
            "event_type": "a",
            "value": np.arange(100, dtype="float64"),
            "event_id": range(100),
            "ts": pd.to_datetime("2024-01-01"),
            "props": "{}",
        }
    )
    ev = ray.data.from_pandas(df).repartition(10)
    out = rank_topk_per_user(ev, k=3).to_pandas().sort_values("rank")
    assert list(out["value"]) == [99.0, 98.0, 97.0]


def test_top_type_per_user_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import top_type_per_user

    ev = _events(
        [
            (1, "b", 0.0),
            (1, "b", 0.0),
            (1, "a", 0.0),
            (2, "z", 0.0),
            (2, "a", 0.0),  # tie 1-1 -> lexicographically smaller "a"
        ]
    )
    out = top_type_per_user(ev).to_pandas().set_index("user_id")
    assert out.loc[1, "top_type"] == "b" and out.loc[1, "n"] == 2
    assert out.loc[2, "top_type"] == "a" and out.loc[2, "n"] == 1


def test_value_histogram_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import value_histogram

    ev = _events(
        [
            (1, "x", 0.0),    # bin 0
            (1, "x", 24.99),  # bin 0
            (1, "x", 25.0),   # bin 1 (edge goes up)
            (1, "y", -0.5),   # bin -1 (floor, not trunc)
        ]
    )
    out = value_histogram(ev, 25.0).to_pandas()
    got = {(r.event_type, r.bin): r.n for r in out.itertuples(index=False)}
    assert got == {("x", 0): 2, ("x", 1): 1, ("y", -1): 1}


def test_mad_outliers_planted(ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    from tcx2graph_jl_ray.stages.relational import mad_outliers_by_type

    df = pd.DataFrame(
        {
            "event_id": range(7),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": 1,
            "event_type": "t",
            "value": [1.0, 9.0, 10.0, 11.0, 19.0, 10.0, 1000.0],
            "props": "{}",
        }
    )
    d = tempfile.mkdtemp(prefix="mad_")
    pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "events.parquet"))
    out = mad_outliers_by_type(d, 3.0).to_pandas()
    r = out.iloc[0]
    # median 10, |dev| = [9,1,0,1,9,0,990], MAD = median = 1
    assert r["median_value"] == 10.0 and r["mad"] == 1.0
    # outliers: |dev| > 3*1 -> 9, 9, 990 -> 3
    assert r["n_outliers"] == 3 and r["n"] == 7


def test_dedup_keep_best_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import dedup_keep_best

    # same text, different recorded n_chars: keep longest then min doc_id
    docs = _docs(["aa", "aa", "aa", "bb"], n_chars=[2, 5, 5, 2])
    out = dedup_keep_best(docs).to_pandas().set_index("doc_id")
    assert set(out.index) == {1, 3}
    assert out.loc[1, "n_chars"] == 5 and out.loc[1, "n_copies"] == 3
    assert out.loc[3, "n_copies"] == 1


def test_rare_bigram_rate_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import rare_bigram_rate

    # "a b" occurs 3x in corpus (docs 0,1), "c d" once (rare at min_count=2)
    docs = _docs(["a b a b", "a b c d", "x"])
    out = rare_bigram_rate(docs, min_count=2).to_pandas().set_index("doc_id")
    # doc0 bigrams: "a b","b a","a b" -> "b a" occurs once -> rare
    assert out.loc[0, "n_bigrams"] == 3 and out.loc[0, "n_rare"] == 1
    # doc1: "a b","b c","c d" -> rare: "b c","c d"
    assert out.loc[1, "n_bigrams"] == 3 and out.loc[1, "n_rare"] == 2
    assert 2 not in out.index  # single-token doc: no bigrams


def test_lm_logprob_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import lm_logprob

    docs = _docs(["a b a b", "a c"])
    out = lm_logprob(docs).to_pandas().set_index("doc_id")
    # corpus bigrams: doc0: (a b)x2, (b a); doc1: (a c)
    # c(a b)=2, c(b a)=1, c(a c)=1; left contexts: c(a .)=3, c(b .)=1
    lp0 = 2 * math.log(2 / 3) + math.log(1 / 1)
    lp1 = math.log(1 / 3)
    assert out.loc[0, "n_bigrams"] == 3
    assert abs(out.loc[0, "logprob"] - round(lp0, 6)) < 1e-9
    assert abs(out.loc[1, "logprob"] - round(lp1, 6)) < 1e-9


def test_adamic_adar_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import adamic_adar

    # path graph a-z, b-z, a-w, b-w, plus z-q (deg(z)=3, deg(w)=2)
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": ["a", "b", "a", "b", "z"],
                "dst": ["z", "z", "w", "w", "q"],
            }
        )
    )
    out = adamic_adar(edges, min_common=2).to_pandas().set_index(["a", "b"])
    # (a,b) share pivots z (deg 3) and w (deg 2); (w,z) share pivots a and b
    # (deg 2 each)
    assert set(out.index) == {("a", "b"), ("w", "z")}
    assert (out["common"] == 2).all()
    expect_ab = 1 / math.log(3) + 1 / math.log(2)
    assert abs(out.loc[("a", "b"), "adamic_adar"] - round(expect_ab, 6)) < 1e-9
    assert abs(out.loc[("w", "z"), "adamic_adar"] - round(2 / math.log(2), 6)) < 1e-9


def test_semantic_clusters_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from tcx2graph_jl_ray.stages.ann import semantic_clusters

    # vectors: 0 and 1 identical, 2 orthogonal, 3 = 1 (so 0-1-3 one cluster)
    vecs = [
        [1.0, 0.0],
        [1.0, 0.0],
        [0.0, 1.0],
        [1.0, 0.0],
    ]
    t = pa.table(
        {
            "vec_id": pa.array(range(4), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array(["x"] * 4),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    emb = ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))
    out = (
        semantic_clusters(emb, str(tmp_path), threshold=0.9)
        .to_pandas()
        .set_index("vec_id")
    )
    assert set(out.index) == {0, 1, 3}  # vec 2 similar to nothing
    assert set(out["component_id"]) == {0}
    assert (out["component_size"] == 3).all()


def test_q4_semi_join_counts_each_order_once(ray_session, sf_dir):
    """An order with MANY returned lineitems must count once (EXISTS, not
    join multiplicity)."""
    import duckdb

    from tcx2graph_jl_ray.stages.relational import q4_order_priority

    out = q4_order_priority(sf_dir).to_pandas()
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM '{sf_dir}/orders.parquet'
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND o_orderkey IN (SELECT l_orderkey FROM '{sf_dir}/lineitem.parquet'
                             WHERE l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    ).fetchdf()
    got = out.sort_values("o_orderpriority").reset_index(drop=True)
    want = want.sort_values("o_orderpriority").reset_index(drop=True)
    assert list(got["o_orderpriority"]) == list(want["o_orderpriority"])
    assert list(got["order_count"]) == list(want["order_count"])


def test_corpus_composition_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import corpus_composition

    df = pd.DataFrame(
        {
            "doc_id": range(3),
            "text": ["the of and", "el la de", "zzz qqq"],
            "lang": "x",
            "source": ["s1", "s1", "s2"],
        }
    )
    df["n_chars"] = df["text"].str.len()
    out = corpus_composition(ray.data.from_pandas(df)).to_pandas()
    got = {
        (r.source, r.lang_pred): (r.n_docs, r.n_tokens)
        for r in out.itertuples(index=False)
    }
    assert got[("s1", "en")] == (1, 3)
    assert got[("s2", "und")] == (1, 2)
    assert len(got) == 3  # the es/other doc forms its own cell


def test_embedding_covariance_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.stages.ann import embedding_covariance

    vecs = [[1.0, 2.0], [3.0, 6.0], [5.0, 10.0]]  # dim2 = 2*dim1 exactly
    t = pa.table(
        {
            "vec_id": pa.array(range(3), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array(["x"] * 3),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    emb = ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))
    out = (
        embedding_covariance(emb).to_pandas().set_index(["i", "j"])["cov"]
    )
    # population variance of [1,3,5] = 8/3; cov(x,2x)=2*var; var(2x)=4*var
    v = 8.0 / 3.0
    assert abs(out.loc[(1, 1)] - round(v, 6)) < 1e-6
    assert abs(out.loc[(1, 2)] - round(2 * v, 6)) < 1e-6
    assert abs(out.loc[(2, 2)] - round(4 * v, 6)) < 1e-6
    assert set(out.index) == {(1, 1), (1, 2), (2, 2)}  # upper triangle only


def test_enrich_events_cached_fetches_once_per_key(ray_session, sf_dir):
    """The enrichment values are right AND the cache machinery dedups keys:
    a direct CachedEnricher drive on one batch must fetch once per key."""
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.stages.link import CachedEnricher, enrich_events_cached

    out = enrich_events_cached(sf_dir).to_pandas()
    assert (out["peak"] == out["hour"].between(8, 17)).all()
    assert (out["type_code"] == out["event_type"].str.len()).all()

    batch = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    batch["hour"] = batch["ts"].dt.hour
    enr = CachedEnricher(
        lambda b: b["event_type"] + "\x1f" + b["hour"].astype(str),
        lambda k: {"peak": 8 <= int(k.split("\x1f")[1]) <= 17},
    )
    enr(batch)
    n_keys = (batch["event_type"] + "\x1f" + batch["hour"].astype(str)).nunique()
    assert enr.fetches == n_keys


def test_event_markov_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import event_markov

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["a", "b", "a", "a", "c"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
                 "2024-01-01 00:00", "2024-01-01 01:00"]
            ),
            "event_id": range(5),
            "value": 0.0,
            "props": "{}",
        }
    )
    out = (
        event_markov(ray.data.from_pandas(df))
        .to_pandas()
        .set_index(["from_type", "to_type"])
    )
    # transitions: u1: a->b, b->a; u2: a->c. from 'a': b (1/2), c (1/2)
    assert out.loc[("a", "b"), "n"] == 1 and out.loc[("a", "b"), "p"] == 0.5
    assert out.loc[("a", "c"), "p"] == 0.5
    assert out.loc[("b", "a"), "n"] == 1 and out.loc[("b", "a"), "p"] == 1.0
    assert len(out) == 3  # no cross-user pair (u1 last -> u2 first)


def test_bigram_novelty_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import bigram_novelty

    # doc0 introduces "a b"; doc1 reuses it and introduces "b c"
    docs = _docs(["a b", "a b c"])
    out = bigram_novelty(docs).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_distinct"] == 1 and out.loc[0, "n_novel"] == 1
    assert out.loc[1, "n_distinct"] == 2 and out.loc[1, "n_novel"] == 1


def test_q7_excludes_same_nation(ray_session, sf_dir):
    from tcx2graph_jl_ray.stages.relational import q7_nation_pairs

    out = q7_nation_pairs(sf_dir).to_pandas()
    assert (out["cust_nation"] != out["supp_nation"]).all()
    assert (out["n_items"] > 0).all()


def test_never_converted_anti_join_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import never_converted

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3, 3],
            "event_type": ["signup", "purchase", "signup", "signup", "purchase"],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 11:00",  # u1: converts same day
                 "2024-01-02 10:00",                        # u2: never purchases
                 "2024-01-03 10:00", "2024-01-04 09:00"]    # u3: NEXT day only
            ),
            "event_id": range(5),
            "value": 0.0,
            "props": "{}",
        }
    )
    out = never_converted(ray.data.from_pandas(df)).to_pandas()
    got = {(r.user_id, r.day): r.n_first for r in out.itertuples(index=False)}
    assert got == {(2, "2024-01-02"): 1, (3, "2024-01-03"): 1}


def test_cross_contamination_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import cross_contamination

    docs = _docs(
        [
            "alpha beta gamma delta epsilon zeta",  # contains the leaked gram
            "one two three four five",              # clean
            "tiny",                                 # < k tokens: absent
        ]
    )
    tr = ray.data.from_pandas(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1"],
                "turn_idx": pd.array([0, 1], dtype="int32"),
                "role": "user",
                "text": [
                    "prefix alpha beta gamma delta epsilon suffix",
                    "unrelated words entirely here now",
                ],
                "tool": None,
                "ts": pd.to_datetime("2024-01-01"),
            }
        )
    )
    out = cross_contamination(docs, tr, k=5).to_pandas().set_index("doc_id")
    # doc0 grams: [alpha..epsilon], [beta..zeta]; transcript contains the first
    assert out.loc[0, "n_grams"] == 2 and out.loc[0, "n_hit"] == 1
    assert out.loc[1, "n_grams"] == 1 and out.loc[1, "n_hit"] == 0
    assert 2 not in out.index


def test_hll_error_bound_pure():
    """HLL estimate within ~3 standard errors of exact distinct, pure numpy
    (no Ray): merge of split partials must equal the single-pass sketch."""
    from tcx2graph_jl_ray.functions.hll import (
        estimate,
        merge_registers,
        register_partial,
    )

    n = 20000
    values = [f"key-{i}" for i in range(n)]
    p = 12
    one = register_partial(values, p)
    # split into 7 partials and merge: must be identical registers
    merged = register_partial([], p)
    step = len(values) // 7 + 1
    for i in range(0, len(values), step):
        merged = merge_registers(merged, register_partial(values[i:i+step], p))
    assert (one == merged).all()
    est = estimate(one)
    se = 1.04 / (1 << p) ** 0.5  # ~1.6% at p=12
    assert abs(est - n) / n < 3 * se
    # duplicates must not change the sketch
    assert (register_partial(values * 3, p) == one).all()


def test_hll_approx_distinct_dataset(ray_session, sf_dir):
    import duckdb

    from tcx2graph_jl_ray.functions.hll import approx_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    est = approx_distinct(ds, "user_id", p=12)
    exact = duckdb.connect().execute(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_label_propagation_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import label_propagation

    # chain a - b - c - d; seeds: a=X. b labels at round 1, c at round 2,
    # d stays unlabeled at rounds=2. Tie case: e adjacent to a(X) and f(W).
    linked = pd.DataFrame(
        {
            "entity_id": ["a", "f"],
            "kb_region": ["X", "W"],
        }
    )
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": ["a", "b", "c", "a", "f"],
                "dst": ["b", "c", "d", "e", "e"],
            }
        )
    )
    out = (
        label_propagation(linked, edges, rounds=2)
        .to_pandas()
        .set_index("entity_id")
    )
    assert out.loc["a", "round"] == 0 and out.loc["a", "kb_region"] == "X"
    assert out.loc["b", "round"] == 1 and out.loc["b", "kb_region"] == "X"
    assert out.loc["c", "round"] == 2 and out.loc["c", "kb_region"] == "X"
    assert "d" not in out.index  # 3 hops: unreached at rounds=2
    # e sees X and W once each at round 1: tie -> lexicographic min "W"
    assert out.loc["e", "round"] == 1 and out.loc["e", "kb_region"] == "W"


def test_lsh_eval_counts(ray_session):
    from tcx2graph_jl_ray.stages.dedup import lsh_eval

    docs = _docs(
        [
            "alpha beta gamma delta epsilon",
            "alpha beta gamma delta epsilon",  # exact dup: jaccard 1
            "zero one two three four five six",
        ]
    )
    out = lsh_eval(docs).to_pandas().iloc[0]
    assert out["tp"] >= 1          # the dup pair is found and verified
    assert out["fp"] == 0          # verify is exact: no false positives
    assert out["tp"] + out["fn"] >= 1


def test_mad_outliers_all_null_values(ray_session):
    """Dirty-input contract: a type whose every value is NULL must not crash
    and must be absent from the result (the oracle filters it the same way)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    from tcx2graph_jl_ray.stages.relational import mad_outliers_by_type

    df = pd.DataFrame(
        {
            "event_id": range(4),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": 1,
            "event_type": ["dead", "dead", "live", "live"],
            "value": [None, None, 5.0, 7.0],
            "props": "{}",
        }
    )
    d = tempfile.mkdtemp(prefix="madnull_")
    pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "events.parquet"))
    out = mad_outliers_by_type(d, 3.0).to_pandas()
    assert set(out["event_type"]) == {"live"}


def test_lsh_eval_no_pairs(ray_session):
    from tcx2graph_jl_ray.stages.dedup import lsh_eval

    docs = _docs(["completely different words", "nothing shared here at all"])
    out = lsh_eval(docs).to_pandas().iloc[0]
    assert out["tp"] == 0 and out["fp"] == 0 and out["fn"] == 0


def test_activity_islands_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import activity_islands

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "event_type": "view",
            "ts": pd.to_datetime(
                ["2024-01-01 09:00", "2024-01-01 21:00",  # same day: one active day
                 "2024-01-02 05:00",                        # consecutive: island grows
                 "2024-01-05 05:00",                        # gap: new island
                 "2024-01-02 00:00"]
            ),
            "event_id": range(5),
            "value": 0.0,
            "props": "{}",
        }
    )
    out = activity_islands(ray.data.from_pandas(df)).to_pandas()
    got = {
        (r.user_id, r.start_day): (r.end_day, r.n_days)
        for r in out.itertuples(index=False)
    }
    assert got == {
        (1, "2024-01-01"): ("2024-01-02", 2),
        (1, "2024-01-05"): ("2024-01-05", 1),
        (2, "2024-01-02"): ("2024-01-02", 1),
    }


def test_curation_funnel_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import curation_funnel

    texts = [
        "alpha beta gamma delta epsilon " * 10,   # long, unique
        "alpha beta gamma delta epsilon " * 10,   # exact dup of doc0
        None,                                     # null: dropped first
        "short",                                  # unique but fails length gate
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": texts,
            "lang": "en",
            "source": "s",
        }
    )
    df["n_chars"] = df["text"].str.len()
    out = curation_funnel(
        ray.data.from_pandas(df), min_chars=100
    ).to_pandas().iloc[0]
    assert out["n_raw"] == 4
    assert out["n_nonnull"] == 3
    assert out["n_exact_unique"] == 2      # dup collapses
    assert out["n_after_neardup"] == 2     # no near-dups beyond the exact one
    assert out["n_quality"] == 1           # "short" fails the length gate


def test_daily_pivot_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import daily_type_pivot

    df = pd.DataFrame(
        {
            "user_id": 1,
            "event_type": ["click", "click", "view", "signup"],
            "ts": pd.to_datetime(
                ["2024-01-01 01:00", "2024-01-01 02:00",
                 "2024-01-01 03:00", "2024-01-02 00:00"]
            ),
            "event_id": range(4),
            "value": 0.0,
            "props": "{}",
        }
    )
    out = daily_type_pivot(ray.data.from_pandas(df)).to_pandas().set_index("day")
    assert out.loc["2024-01-01", "click"] == 2
    assert out.loc["2024-01-01", "view"] == 1
    assert out.loc["2024-01-01", "purchase"] == 0  # absent type: zero column
    assert out.loc["2024-01-02", "signup"] == 1


def test_rolling_avg_calendar_frame(ray_session):
    """The frame is CALENDAR days: a skipped day contributes 0, it does not
    pull an older row into the window."""
    from tcx2graph_jl_ray.stages.window import rolling_daily_avg

    df = pd.DataFrame(
        {
            "user_id": 1,
            "event_type": "view",
            # 3 events on Jan 1, none Jan 2, 3 on Jan 3
            "ts": pd.to_datetime(
                ["2024-01-01"] * 3 + ["2024-01-03"] * 3
            ),
            "event_id": range(6),
            "value": 0.0,
            "props": "{}",
        }
    )
    out = (
        rolling_daily_avg(ray.data.from_pandas(df), 3)
        .to_pandas()
        .set_index("day")
    )
    assert out.loc["2024-01-01", "avg_n"] == 1.0   # 3/3
    assert out.loc["2024-01-03", "avg_n"] == 2.0   # (3+0+3)/3


def test_session_stats_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import session_stats

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "event_type": "view",
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:10",  # session A: 600 s
                 "2024-01-01 02:00",                        # gap > 1800: session B
                 "2024-01-01 00:00"]                        # user 2: session C
            ),
            "event_id": range(4),
            "value": 0.0,
            "props": "{}",
        }
    )
    out = session_stats(ray.data.from_pandas(df), 1800.0).to_pandas().iloc[0]
    assert out["n_sessions"] == 3 and out["n_events"] == 4
    # durations: [600, 0, 0] -> median 0, p95 = 0.95 interp toward 600
    assert out["median_duration_s"] == 0.0
    assert abs(out["p95_duration_s"] - 540.0) < 1e-6


def test_lang_mismatch_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import lang_mismatch

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["the of and with", "the of and with"],
            "lang": ["en", "es"],  # doc1's declared label disagrees
            "source": "s",
        }
    )
    df["n_chars"] = df["text"].str.len()
    out = lang_mismatch(ray.data.from_pandas(df)).to_pandas()
    assert list(out["doc_id"]) == [1]
    assert out["lang_pred"].iloc[0] == "en"
