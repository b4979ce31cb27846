"""Planted tests for the round-4i operator batch (LSH recall harness,
per-dimension embedding stats, centroid distance matrix)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _write_emb(tmp_path, vecs, labels):
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))


def test_dim_stats_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.ann import embedding_dim_stats

    emb = _write_emb(
        tmp_path, [[1.0, 2.0], [3.0, 6.0], [5.0, 10.0]], [0, 0, 1]
    )
    out = (
        embedding_dim_stats(emb.repartition(3))
        .to_pandas()
        .set_index("dim")
        .sort_index()
    )
    assert list(out.index) == [1, 2]
    assert out.loc[1, "vmin"] == 1.0 and out.loc[1, "vmax"] == 5.0
    assert out.loc[2, "vmin"] == 2.0 and out.loc[2, "vmax"] == 10.0
    assert out.loc[1, "mean"] == 3.0 and out.loc[2, "mean"] == 6.0
    assert (out["n_vecs"] == 3).all()


def test_centroid_dists_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.ann import centroid_distances

    # label 0 centroid (1, 0); label 1 centroid (4, 4) -> L2 dist 5
    emb = _write_emb(
        tmp_path, [[0.0, 0.0], [2.0, 0.0], [4.0, 4.0]], [0, 0, 1]
    )
    out = centroid_distances(emb).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["label_a"], r["label_b"]) == (0, 1)
    assert r["dist"] == 5.0


def test_lsh_recall_semantics(ray_session, sf_dir):
    """recall must equal |lsh top-k ∩ brute top-k| / k per query, with the
    exact list as the base (all queries emit)."""
    from tcx2graph_jl_ray.stages.ann import (
        ann_brute_topk,
        ann_lsh_topk,
        ann_recall_eval,
    )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    nq, k = 4, 5
    got = (
        ann_recall_eval(emb, sf_dir, nq, k, index="lsh")
        .to_pandas()
        .set_index("query_id")
        .sort_index()
    )
    assert list(got.index) == list(range(nq))
    brute = ann_brute_topk(emb, sf_dir, nq, k).to_pandas()
    lsh = ann_lsh_topk(emb, sf_dir, nq, k).to_pandas()
    for qid in range(nq):
        b = set(brute.loc[brute["query_id"] == qid, "vec_id"])
        a = set(lsh.loc[lsh["query_id"] == qid, "vec_id"])
        hits = len(b & a)
        assert got.loc[qid, "n_hits"] == hits
        assert got.loc[qid, "recall"] == np.round(hits / k, 6)


def test_winsorize_planted(ray_session):
    from tcx2graph_jl_ray.stages.clean import clean_winsorize

    # values 1..20 in cents-friendly form; p05/p95 (QUANTILE_CONT over
    # n=20: p05 rank = 0.05*19 = 0.95 -> 1 + 0.95*(2-1) = 1.95;
    # p95 rank = 18.05 -> 19 + 0.05*(20-19) = 19.05)
    vals = [float(i) for i in range(1, 21)]
    df = pd.DataFrame({
        "event_id": np.arange(20, dtype="int64"),
        "ts": pd.to_datetime(["2024-01-01"] * 20),
        "user_id": pd.array([1] * 20, dtype="int64"),
        "event_type": ["a"] * 20,
        "value": vals,
    })
    got = clean_winsorize(
        ray.data.from_pandas(df).repartition(4)
    ).to_pandas().iloc[0]
    assert got["n"] == 20
    assert got["p_lo"] == 1.95 and got["p_hi"] == 19.05
    assert got["n_lo"] == 1 and got["n_hi"] == 1  # 1.0 below, 20.0 above
    mid_sum = sum(range(2, 20))  # 2..19 inclusive
    want = ((mid_sum + 1.95) + 19.05) / 20
    assert got["mean_winsor"] == round(want, 6)


def test_user_gini_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import user_gini

    # counts: u1 -> 1, u2 -> 1, u3 -> 6 (sorted 1,1,6; S=1*1+2*1+3*6=21,
    # n=3, T=8 -> G = 42/24 - 4/3 = 0.416667)
    rows = [1, 2] + [3] * 6
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array(rows, dtype="int64"),
    })
    got = user_gini(ray.data.from_pandas(df).repartition(3)).to_pandas().iloc[0]
    assert got["n_users"] == 3 and got["total_events"] == 8
    assert got["gini"] == round(2.0 * 21 / (3.0 * 8.0) - 4.0 / 3.0, 6)


def test_user_gini_uniform_is_zero(ray_session):
    from tcx2graph_jl_ray.stages.window import user_gini

    df = pd.DataFrame({
        "event_id": np.arange(12, dtype="int64"),
        "user_id": pd.array([1, 2, 3, 4] * 3, dtype="int64"),
    })
    got = user_gini(ray.data.from_pandas(df)).to_pandas().iloc[0]
    assert got["gini"] == 0.0


def test_mention_gaps_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import mention_gaps

    # entity e1 mentioned at turns 1,3,8 in c1 (gaps 2,5) and 4,5 in c2
    # (gap 1); e2 mentioned once per conv -> no gaps, drops.
    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", "c2", "c1", "c2"],
        "turn_idx": pd.array([1, 3, 8, 4, 5, 2, 9], dtype="int64"),
        "entity_id": ["e1", "e1", "e1", "e1", "e1", "e2", "e2"],
    })
    got = (
        mention_gaps(ray.data.from_pandas(df).repartition(4), n_buckets=4)
        .to_pandas()
        .set_index("entity_id")
    )
    assert list(got.index) == ["e1"]
    r = got.loc["e1"]
    assert r["n_gaps"] == 3 and r["min_gap"] == 1 and r["max_gap"] == 5
    assert r["mean_gap"] == round(8 / 3, 6)


def test_customer_rfm_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import customer_rfm

    t = pa.table({
        "o_custkey": pa.array([1, 1, 2], type=pa.int64()),
        "o_orderdate": pa.array(
            ["1995-01-01", "1995-01-11", "1995-01-06"], type=pa.string()
        ),
        "o_totalprice": pa.array([10.01, 20.02, 5.55], type=pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    got = (
        customer_rfm(str(tmp_path), n_buckets=4)
        .to_pandas()
        .set_index("o_custkey")
        .sort_index()
    )
    assert got.loc[1, "recency_days"] == 0 and got.loc[2, "recency_days"] == 5
    assert got.loc[1, "frequency"] == 2 and got.loc[2, "frequency"] == 1
    assert got.loc[1, "monetary"] == 30.03 and got.loc[2, "monetary"] == 5.55


def test_stopword_profile_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.text import stopword_profile

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": pa.array(["a", "a", "b"]),
        "text": pa.array([
            "the cat and the dog", "and then some", None
        ]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = (
        stopword_profile(docs.repartition(3), n_buckets=2)
        .to_pandas()
        .set_index(["source", "word"])
        .sort_index()
    )
    # source a: the x2 (doc1), and x1+x1 (docs 1,2) -> tot 4
    assert list(got.index) == [("a", "and"), ("a", "the")]
    assert got.loc[("a", "the"), "n_occ"] == 2
    assert got.loc[("a", "the"), "n_docs"] == 1
    assert got.loc[("a", "and"), "n_occ"] == 2
    assert got.loc[("a", "and"), "n_docs"] == 2
    assert got.loc[("a", "the"), "occ_share"] == 0.5


def test_shard_manifest_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.multimodal import shard_manifest

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 8], type=pa.int64()),
        "text": pa.array(["aa", "bbb", "c", None, "dddd"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = (
        shard_manifest(docs.repartition(3), n_shards=8)
        .to_pandas()
        .set_index(["modality", "shard"])
        .sort_index()
    )
    # doc 0 -> image/0 (2B); doc 1 -> audio/1 (3B); doc 2 -> video/2 (1B);
    # doc 3 null drops; doc 8 -> video(8%3=2)/0 (4B)
    assert got.loc[("image", 0), "n_items"] == 1
    assert got.loc[("image", 0), "total_bytes"] == 2
    assert got.loc[("video", 0), "min_doc_id"] == 8
    assert got.loc[("video", 2), "total_bytes"] == 1
    assert len(got) == 4


def test_pq_recall_semantics(ray_session, sf_dir):
    """pq recall must equal |pq top-k ∩ brute top-k| / k per query."""
    from tcx2graph_jl_ray.stages.ann import (
        ann_brute_topk,
        ann_pq_topk,
        ann_recall_eval,
    )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    nq, k = 4, 5
    got = (
        ann_recall_eval(emb, sf_dir, nq, k, index="pq")
        .to_pandas()
        .set_index("query_id")
        .sort_index()
    )
    assert list(got.index) == list(range(nq))
    brute = ann_brute_topk(emb, sf_dir, nq, k).to_pandas()
    pqr = ann_pq_topk(emb, sf_dir, nq, k).to_pandas()
    for qid in range(nq):
        b = set(brute.loc[brute["query_id"] == qid, "vec_id"])
        a = set(pqr.loc[pqr["query_id"] == qid, "vec_id"])
        hits = len(b & a)
        assert got.loc[qid, "n_hits"] == hits
        assert got.loc[qid, "recall"] == np.round(hits / k, 6)


def test_simpson_diversity_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.text import simpson_diversity

    # source a: tokens the,the,cat (n_the=2, n_cat=1) -> S2=2, N=3,
    # D = 2/(3*2) = 0.333333; source b: one token -> drops (N<2)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": pa.array(["a", "a", "b"]),
        "text": pa.array(["the the", "cat", "solo"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = (
        simpson_diversity(docs.repartition(3))
        .to_pandas()
        .set_index("source")
    )
    assert list(got.index) == ["a"]
    assert got.loc["a", "n_tokens"] == 3 and got.loc["a", "n_types"] == 2
    assert got.loc["a", "simpson"] == np.round(2 / 6, 6)


def test_source_vocab_overlap_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.text import source_vocab_overlap

    # vocab a = {the, cat}, b = {the, dog}, c = {fish} ->
    # (a,b): inter 1, union 3; c shares nothing -> no rows with c
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": pa.array(["b", "a", "c"]),
        "text": pa.array(["the dog", "the cat the", "fish"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = source_vocab_overlap(docs.repartition(3), n_buckets=4).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    assert r["n_common"] == 1 and r["n_a"] == 2 and r["n_b"] == 2
    assert r["jaccard"] == np.round(1 / 3, 6)


def test_user_burstiness_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import user_burstiness

    # user 1: events at 0s, 10s, 20s -> gaps (10, 10): sigma=0, B=-1
    # user 2: events at 0s, 1s, 31s -> gaps (1, 30): mu=15.5,
    #   D = 2*901 - 31^2 = 841 -> sqrt=29, B = (29-31)/(29+31) = -2/60
    # user 3: single event -> drops
    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:00:10", "2024-01-01 00:00:20",
        "2024-01-01 00:00:00", "2024-01-01 00:00:01", "2024-01-01 00:00:31",
        "2024-01-01 00:00:00",
    ])
    df = pd.DataFrame({
        "event_id": np.arange(7, dtype="int64"),
        "user_id": pd.array([1, 1, 1, 2, 2, 2, 3], dtype="int64"),
        "ts": ts,
    })
    got = (
        user_burstiness(ray.data.from_pandas(df).repartition(3), n_buckets=4)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(got.index) == [1, 2]
    assert got.loc[1, "burstiness"] == -1.0
    assert got.loc[2, "n_gaps"] == 2
    assert got.loc[2, "mean_gap_s"] == np.round(31 / 2, 6)
    assert got.loc[2, "burstiness"] == np.round((29 - 31) / (29 + 31), 6)


def test_conv_sentiment_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import conv_sentiment

    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c3"],
        "text": [
            "purchase went fine", "then error error",
            "lookup[error] only",  # bracketed token is NOT a hit
            None,
        ],
    })
    got = (
        conv_sentiment(ray.data.from_pandas(df).repartition(2), n_buckets=2)
        .to_pandas()
        .set_index("conv_id")
    )
    # c1: pos=1 (purchase), neg=2 -> polarity (1-2)/3; c2/c3 drop
    assert list(got.index) == ["c1"]
    assert got.loc["c1", "n_pos"] == 1 and got.loc["c1", "n_neg"] == 2
    assert got.loc["c1", "polarity"] == np.round(-1 / 3, 6)


def test_payload_dedup_stats_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.multimodal import payload_dedup_stats

    # "aa" x3 (2 bytes), "bbb" x1 (3 bytes): total 9, unique 5
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["aa", "aa", "aa", "bbb"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = payload_dedup_stats(docs.repartition(3)).to_pandas().iloc[0]
    assert got["n_payloads"] == 4 and got["n_unique"] == 2
    assert got["n_dup_copies"] == 2
    assert got["bytes_total"] == 9 and got["bytes_unique"] == 5
    assert got["dedup_ratio"] == np.round(5 / 9, 6)


def test_user_type_entropy_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import user_type_entropy

    # user 1: a x2, b x2 -> entropy 1.0, top 'a' (tie -> lexicographic)
    # user 2: a x4 -> entropy 0.0
    df = pd.DataFrame({
        "event_id": np.arange(8, dtype="int64"),
        "user_id": pd.array([1, 1, 1, 1, 2, 2, 2, 2], dtype="int64"),
        "event_type": ["a", "b", "a", "b", "a", "a", "a", "a"],
    })
    got = (
        user_type_entropy(ray.data.from_pandas(df).repartition(3),
                          n_buckets=4)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert got.loc[1, "type_entropy"] == 1.0
    assert got.loc[1, "top_type"] == "a" and got.loc[1, "n_types"] == 2
    assert got.loc[2, "type_entropy"] == 0.0
    assert got.loc[2, "n_events"] == 4


def test_nation_hhi_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import nation_hhi

    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 3], type=pa.int64()),
        "o_totalprice": pa.array([10.00, 20.00, 30.00, 40.00]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
        "c_nationkey": pa.array([0, 0, 1], type=pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"]),
    }), str(tmp_path / "nation.parquet"))
    got = (
        nation_hhi(str(tmp_path), n_buckets=4)
        .to_pandas()
        .set_index("nation")
        .sort_index()
    )
    # ALPHA: customers 30, 30 -> HHI = (900+900)/3600 = 0.5
    # BETA: single customer -> HHI = 1.0
    assert got.loc["ALPHA", "n_customers"] == 2
    assert got.loc["ALPHA", "revenue"] == 60.0
    assert got.loc["ALPHA", "hhi"] == 0.5
    assert got.loc["BETA", "hhi"] == 1.0


def test_sq8_error_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.ann import sq8_quantization_error

    # dim1 range [0, 255]: integers quantize exactly (levels are exactly
    # the integers) -> err 0; dim2 constant -> err 0 by contract
    emb = _write_emb(
        tmp_path,
        [[0.0, 7.0], [100.0, 7.0], [255.0, 7.0]],
        [0, 0, 0],
    )
    got = (
        sq8_quantization_error(emb.repartition(2))
        .to_pandas()
        .set_index("dim")
        .sort_index()
    )
    assert got.loc[1, "max_abs_err"] == 0.0 and got.loc[1, "n_exact"] == 3
    assert got.loc[2, "max_abs_err"] == 0.0
    assert got.loc[1, "vmin"] == 0.0 and got.loc[1, "vmax"] == 255.0
    assert (got["n_vecs"] == 3).all()
