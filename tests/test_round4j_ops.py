"""Planted tests for the round-4j operator batch (lang confusion matrix,
word-length histogram, transition entropy, Benford profile)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def test_lang_confusion_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.text import lang_confusion

    # declared en x2 (one predicted en via marker 'the', one und),
    # declared de x1 (predicted de via 'der'); null text drops
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "lang": pa.array(["en", "en", "de", "en"]),
        "text": pa.array(["the cat", "zzz qqq", "der hund", None]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = (
        lang_confusion(docs.repartition(3), n_buckets=2)
        .to_pandas()
        .set_index(["lang", "lang_pred"])
        .sort_index()
    )
    assert got.loc[("en", "en"), "n_docs"] == 1
    assert got.loc[("en", "und"), "n_docs"] == 1
    assert got.loc[("en", "en"), "row_share"] == 0.5
    assert got.loc[("de", "de"), "row_share"] == 1.0


def test_word_length_histogram_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.text import word_length_histogram

    # source a: "ab cd efg" -> lens 2,2,3; double space yields an empty
    # token that must drop
    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "source": pa.array(["a", "a"]),
        "text": pa.array(["ab cd", "efg  x"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = (
        word_length_histogram(docs.repartition(2), n_buckets=2)
        .to_pandas()
        .set_index("wlen")
        .sort_index()
    )
    assert list(got.index) == [1, 2, 3]
    assert got.loc[2, "n_words"] == 2 and got.loc[3, "n_words"] == 1
    assert got.loc[2, "share"] == 0.5
    assert got.loc[1, "n_words"] == 1  # the 'x'


def test_transition_entropy_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import transition_entropy

    # user 1: a->b, b->a, a->b  (from a: b x2; from b: a x1)
    # user 2: a->c (from a: c x1)
    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:00:01",
        "2024-01-01 00:00:02", "2024-01-01 00:00:03",
        "2024-01-01 00:00:00", "2024-01-01 00:00:01",
    ])
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype="int64"),
        "user_id": pd.array([1, 1, 1, 1, 2, 2], dtype="int64"),
        "ts": ts,
        "event_type": ["a", "b", "a", "b", "a", "c"],
    })
    got = (
        transition_entropy(ray.data.from_pandas(df).repartition(3),
                           n_buckets=4)
        .to_pandas()
        .set_index("from_type")
        .sort_index()
    )
    # from a: {b: 2, c: 1} -> H = -(2/3 log 2/3 + 1/3 log 1/3)
    p = np.array([2 / 3, 1 / 3])
    want = np.round(-(p * np.log2(p)).sum(), 6)
    assert got.loc["a", "n_pairs"] == 3
    assert got.loc["a", "top_next"] == "b"
    assert got.loc["a", "next_entropy"] == want
    assert got.loc["b", "next_entropy"] == 0.0


def test_value_benford_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import value_benford

    # cents: 100, 1950, 25, 999, 0 (drops), null (drops)
    # leading digits: 1, 1, 2, 9
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype="int64"),
        "value": [1.00, 19.50, 0.25, 9.99, 0.0, None],
    })
    got = (
        value_benford(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("digit")
        .sort_index()
    )
    assert list(got.index) == [1, 2, 9]
    assert got.loc[1, "n_values"] == 2
    assert got.loc[1, "share"] == 0.5
    assert got.loc[1, "benford_share"] == np.round(np.log10(2.0), 6)


def test_priority_latency_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import priority_latency

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], type=pa.int64()),
        "l_shipdate": pa.array(["1995-01-05", "1995-01-10", "1995-02-01"]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_orderdate": pa.array(["1995-01-01", "1995-01-31"]),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"]),
    }), str(tmp_path / "orders.parquet"))
    got = (
        priority_latency(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    # urgent: delays 4, 9 -> avg half-up((13*2+2)/(4)) = (26+2)//4 = 7
    assert got.loc["1-URGENT", "n_items"] == 2
    assert got.loc["1-URGENT", "min_delay"] == 4
    assert got.loc["1-URGENT", "max_delay"] == 9
    assert got.loc["1-URGENT", "avg_delay"] == 7  # 6.5 rounds half-up
    assert got.loc["2-HIGH", "avg_delay"] == 1


def test_entity_persistence_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import entity_persistence

    # e1 active on 2020-01-01, 2020-01-03 (two mentions same day dedup) ->
    # span 3, active 2, persistence 2/3
    me = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pd.array([0, 1, 0], dtype="int64"),
        "entity_id": ["e1", "e1", "e1"],
    })
    tr = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pd.array([0, 1, 0], dtype="int64"),
        "ts": pd.to_datetime([
            "2020-01-01 10:00", "2020-01-03 09:00", "2020-01-03 23:00",
        ]),
    })
    got = entity_persistence(
        ray.data.from_pandas(me).repartition(2),
        ray.data.from_pandas(tr).repartition(2),
        n_buckets=4,
    ).to_pandas().set_index("entity_id")
    r = got.loc["e1"]
    assert r["first_day"] == "2020-01-01" and r["last_day"] == "2020-01-03"
    assert r["span_days"] == 3 and r["n_active_days"] == 2
    assert r["persistence"] == np.round(2 / 3, 6)


def test_jaccard_hist_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.dedup import jaccard_similarity_hist

    # docs 1,2 identical (sim 1.0 -> capped into top bin 19);
    # docs 3,4 share 1 of 3 shingles... keep simple: identical pair only
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["a b c d", "a b c d", "zz yy xx ww"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = jaccard_similarity_hist(
        docs.repartition(2), threshold=0.5
    ).to_pandas().set_index("bin")
    assert list(got.index) == [19]
    assert got.loc[19, "n_pairs"] == 1
    assert got.loc[19, "bin_lo"] == 0.95


def test_conversion_lag_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import conversion_lag

    # u1: signup at t0, purchase at t0+60s and t0+600s -> lag 60
    # u2: signup, never purchases; u3: purchase BEFORE signup only -> not
    # converted; u4: purchase only, no signup -> not a signup user
    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:10:00",
        "2024-01-01 00:00:00",
        "2024-01-01 00:05:00", "2024-01-01 00:00:00",
        "2024-01-01 00:00:00",
    ])
    df = pd.DataFrame({
        "event_id": np.arange(7, dtype="int64"),
        "user_id": pd.array([1, 1, 1, 2, 3, 3, 4], dtype="int64"),
        "ts": ts,
        "event_type": ["signup", "purchase", "purchase",
                       "signup",
                       "signup", "purchase",
                       "purchase"],
    })
    got = conversion_lag(
        ray.data.from_pandas(df).repartition(3), n_buckets=4
    ).to_pandas().iloc[0]
    assert got["n_signup_users"] == 3
    assert got["n_converted"] == 1
    assert got["conversion_rate"] == np.round(1 / 3, 6)
    assert got["min_lag_s"] == 60 and got["max_lag_s"] == 60
    assert got["avg_lag_s"] == 60


def test_split_balance_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.text import split_balance

    t = pa.table({
        "doc_id": pa.array(list(range(40)), type=pa.int64()),
        "source": pa.array((["a"] * 20) + (["b"] * 20)),
        "text": pa.array([f"w{i} x" for i in range(40)]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = split_balance(docs.repartition(3), n_buckets=2).to_pandas()
    # invariants: per-split shares sum to 1, doc total conserved, tokens =
    # 2 per doc
    assert got["n_docs"].sum() == 40
    assert (got["n_tokens"] == 2 * got["n_docs"]).all()
    for _, g in got.groupby("split"):
        assert abs(g["split_share"].sum() - 1.0) < 1e-9


def test_dow_profile_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import dow_profile

    # 2024-01-01 is a Monday (isodow 1); 2024-01-07 a Sunday (isodow 7)
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype="int64"),
        "ts": pd.to_datetime([
            "2024-01-01 10:00", "2024-01-01 11:00",
            "2024-01-07 10:00", "2024-01-06 10:00",
        ]),
        "event_type": ["a", "a", "a", "b"],
    })
    got = (
        dow_profile(ray.data.from_pandas(df).repartition(2), n_buckets=2)
        .to_pandas()
        .set_index(["event_type", "dow"])
        .sort_index()
    )
    assert got.loc[("a", 1), "n_events"] == 2
    assert got.loc[("a", 1), "share"] == np.round(2 / 3, 6)
    assert got.loc[("a", 7), "n_events"] == 1
    assert got.loc[("b", 6), "share"] == 1.0


def test_ivf_cell_purity_planted(ray_session, sf_dir):
    """Purity invariants vs a direct recomputation through the same
    assignment function."""
    from tcx2graph_jl_ray.stages.ann import _assign_cells, _ivf_anchors
    from tcx2graph_jl_ray.stages.ann import ivf_cell_purity

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    got = ivf_cell_purity(emb).to_pandas().set_index("cell").sort_index()
    pdf = emb.to_pandas()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    cells = _assign_cells(vecs, _ivf_anchors(vecs.shape[1], 16))
    ref = pd.DataFrame({"cell": cells, "label": pdf["label"].astype("int64")})
    for cell, g in ref.groupby("cell"):
        top = g.groupby("label").size().reset_index(name="n").sort_values(
            ["n", "label"], ascending=[False, True]).iloc[0]
        assert got.loc[cell, "n_vecs"] == len(g)
        assert got.loc[cell, "top_label"] == top["label"]
        assert got.loc[cell, "purity"] == np.round(top["n"] / len(g), 6)


def test_clv_percentiles_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import clv_percentiles

    # customers with CLV 10, 20, 30, 40 dollars -> p50 = 25.0
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
        "o_totalprice": pa.array([4.00, 6.00, 20.00, 30.00, 40.00]),
    }), str(tmp_path / "orders.parquet"))
    got = clv_percentiles(str(tmp_path), n_buckets=2).iloc[0]
    assert got["n_customers"] == 4
    assert got["p50"] == 25.0
    assert got["p25"] == np.round(17.5, 6)  # 10 + 0.75*(20-10)
    assert got["p95"] == np.round(38.5, 6)  # 30 + 0.85*(40-30)


def test_hamming_hist_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.dedup import (
        hamming_distance_hist,
        simhash_neardup_pairs,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta", "alpha beta gamma delta",
            "alpha beta gamma epsilon", "zz yy xx ww vv uu",
        ]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    pairs = simhash_neardup_pairs(docs, 3).to_pandas()
    got = hamming_distance_hist(docs.repartition(2)).to_pandas()
    # histogram must recount exactly the pair table
    want = pairs.groupby("hamming").size()
    assert got.set_index("hamming")["n_pairs"].to_dict() == want.to_dict()
    # identical docs 1,2 produce a hamming-0 pair
    assert got.set_index("hamming").loc[0, "n_pairs"] >= 1


def test_zscore_days_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import zscore_days

    # 9 quiet days of 10 events + 1 spike day of 100:
    # mu = 19, var = (9*81 + 81^2)/10 ... compute via the op's own math
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for d in range(9):
        rows += [t0 + pd.Timedelta(days=d)] * 10
    rows += [t0 + pd.Timedelta(days=9)] * 100
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "ts": pd.to_datetime(rows),
    })
    got = zscore_days(
        ray.data.from_pandas(df).repartition(3), z_cut=2.0, n_buckets=4
    ).to_pandas().set_index("day")
    # only the spike day is > 2 sigma
    assert list(got.index) == ["2024-01-10"]
    assert got.loc["2024-01-10", "n_events"] == 100
    import math
    k, s1, s2 = 10, 190, 9 * 100 + 10000
    mu = s1 / k
    sd = math.sqrt(float(k * s2 - s1 * s1)) / k
    assert got.loc["2024-01-10", "z"] == np.round((100 - mu) / sd, 6)


def test_resized_fingerprints_planted(ray_session, tmp_path):
    import hashlib

    from tcx2graph_jl_ray.stages.multimodal import resized_fingerprints

    t = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["abc"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = resized_fingerprints(docs, width=4, height=2).to_pandas().iloc[0]
    # resized payload: "abc" cycled to 8 bytes -> "abcabcab"
    assert got["n_bytes"] == 8
    lo = int.from_bytes(hashlib.md5(b"abcabcab").digest()[8:16], "little")
    for j in range(4):
        assert got[f"fp{j}"] == (lo >> (16 * j)) & 0xFFFF


def test_lsh_band_stats_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.dedup import DEFAULT_CONFIG, lsh_band_stats

    # 2 identical docs + 1 distinct: every band has the identical pair in
    # one bucket of size 2 (cand_pairs 1) and the loner in a singleton
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta", "alpha beta gamma delta",
            "zz yy xx ww vv",
        ]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = lsh_band_stats(docs.repartition(2)).to_pandas().set_index("band")
    assert len(got) == DEFAULT_CONFIG.minhash_bands
    assert (got["n_docs"] == 3).all()
    assert (got["n_buckets"] == 2).all()
    assert (got["max_bucket"] == 2).all()
    assert (got["singletons"] == 1).all()
    assert (got["cand_pairs"] == 1).all()


def test_role_transitions_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import role_transitions

    df = pd.DataFrame({
        "conv_id": ["c1"] * 4 + ["c2"] * 2,
        "turn_idx": pd.array([0, 1, 2, 3, 0, 1], dtype="int64"),
        "role": ["user", "assistant", "user", "assistant",
                 "user", "tool"],
    })
    got = (
        role_transitions(ray.data.from_pandas(df).repartition(2),
                         n_buckets=4)
        .to_pandas()
        .set_index(["from_role", "to_role"])
        .sort_index()
    )
    # from user: assistant x2, tool x1
    assert got.loc[("user", "assistant"), "n_pairs"] == 2
    assert got.loc[("user", "assistant"), "share"] == np.round(2 / 3, 6)
    assert got.loc[("user", "tool"), "n_pairs"] == 1
    assert got.loc[("assistant", "user"), "share"] == 1.0


def test_vocab_coverage_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.text import vocab_coverage_curve

    # counts: the x4, cat x2, dog x1, emu x1 -> total 8
    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["the the cat dog", "the the cat emu"]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = vocab_coverage_curve(
        docs.repartition(2), tops=(1, 2, 10)
    ).set_index("n_top")
    assert got.loc[1, "covered_tokens"] == 4
    assert got.loc[1, "coverage"] == 0.5
    assert got.loc[2, "covered_tokens"] == 6
    assert got.loc[10, "coverage"] == 1.0
    assert (got["total_tokens"] == 8).all()


def test_mention_positions_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import mention_position_profile

    # conv c1 has 4 turns (0..3); mentions at turns 0 and 3 ->
    # deciles (0*10)//4 = 0 and (3*10)//4 = 7
    me = pd.DataFrame({
        "conv_id": ["c1", "c1"],
        "turn_idx": pd.array([0, 3], dtype="int64"),
    })
    tr = pd.DataFrame({
        "conv_id": ["c1"] * 4,
        "turn_idx": pd.array([0, 1, 2, 3], dtype="int64"),
    })
    got = mention_position_profile(
        ray.data.from_pandas(me), ray.data.from_pandas(tr), n_buckets=2
    ).to_pandas().set_index("decile").sort_index()
    assert list(got.index) == [0, 7]
    assert (got["n_mentions"] == 1).all()
    assert (got["share"] == 0.5).all()


def test_minhash_calibration_identical_docs(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.dedup import minhash_calibration

    # identical docs: est_sim == 1.0 (all permutations agree) and
    # true_sim == 1.0
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon", "alpha beta gamma delta epsilon",
            "zz yy xx ww vv uu tt",
        ]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = minhash_calibration(docs.repartition(2)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["a"], r["b"]) == (1, 2)
    assert r["est_sim"] == 1.0 and r["true_sim"] == 1.0


def test_pii_audit_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.text import pii_audit_by_source

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "source": pa.array(["a", "a", "b"]),
        "text": pa.array([
            "mail me at bob@x.com or eve@y.org",
            "clean document here",
            "server 10.0.0.1 and +1-555-0100-99",
        ]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    docs = ray.data.read_parquet(str(tmp_path / "documents.parquet"))
    got = (
        pii_audit_by_source(docs.repartition(2), n_buckets=2)
        .to_pandas()
        .set_index("source")
    )
    assert got.loc["a", "n_emails"] == 2
    assert got.loc["a", "docs_with_pii"] == 1
    assert got.loc["a", "pii_rate"] == 0.5
    assert got.loc["b", "n_ips"] == 1 and got.loc["b", "n_phones"] == 1
    assert got.loc["b", "pii_rate"] == 1.0


def test_knn_accuracy_planted(ray_session, sf_dir):
    from tcx2graph_jl_ray.stages.ann import knn_accuracy, knn_classify

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    got = knn_accuracy(emb, sf_dir, 4, 5).iloc[0]
    preds = knn_classify(emb, sf_dir, 4, 5).to_pandas()
    truth = emb.to_pandas().set_index("vec_id")["label"]
    correct = sum(
        int(truth.loc[r["query_id"]]) == int(r["pred_label"])
        for _, r in preds.iterrows()
    )
    assert got["n_queries"] == 4
    assert got["n_correct"] == correct
    assert got["accuracy"] == np.round(correct / 4, 6)


def test_monthly_growth_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import monthly_revenue_growth

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime([
            "1995-01-05", "1995-02-05", "1995-02-20",
        ])),
        "o_totalprice": pa.array([100.00, 150.00, 150.00]),
    }), str(tmp_path / "orders.parquet"))
    got = monthly_revenue_growth(str(tmp_path), n_buckets=2)\
        .set_index("month")
    assert got.loc["1995-01", "revenue"] == 100.0
    assert pd.isna(got.loc["1995-01", "growth"])
    assert got.loc["1995-02", "revenue"] == 300.0
    assert got.loc["1995-02", "prev_revenue"] == 100.0
    assert got.loc["1995-02", "growth"] == 2.0


def test_order_status_mix_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import order_status_mix

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime([
            "1995-01-05", "1995-01-06", "1995-02-01",
        ])),
        "o_orderstatus": pa.array(["O", "F", "O"]),
    }), str(tmp_path / "orders.parquet"))
    got = (
        order_status_mix(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index(["month", "o_orderstatus"])
        .sort_index()
    )
    assert got.loc[("1995-01", "O"), "share"] == 0.5
    assert got.loc[("1995-02", "O"), "share"] == 1.0


def test_degree_histogram_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import degree_histogram

    # star: hub-x{1..5} (hub deg 5 -> bin 2; leaves deg 1 -> bin 0),
    # plus a-b-c path (a,c deg 1 -> bin 0; b deg 2 -> bin 1)
    edges = [("hub", f"x{i}") for i in range(1, 6)] + [
        ("a", "b"), ("b", "c")
    ]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    df["n_convs"] = 1
    got = (
        degree_histogram(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[0, "n_entities"] == 7  # x1..x5, a, c
    assert got.loc[0, "min_degree"] == 1
    assert got.loc[1, "n_entities"] == 1  # b (deg 2)
    assert got.loc[1, "min_degree"] == 2
    assert got.loc[2, "n_entities"] == 1  # hub (deg 5)
    assert got.loc[2, "min_degree"] == 4


def test_ttr_by_length_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import ttr_by_length

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b",              # 2 tok, 2 types -> bin 1
            "x x",              # 2 tok, 1 type  -> bin 1
            "p q r s p q r s",  # 8 tok, 4 types -> bin 3
            None,               # dropped
        ],
    })
    got = (
        ttr_by_length(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[1, "n_docs"] == 2
    assert got.loc[1, "n_tokens"] == 4
    assert got.loc[1, "n_types"] == 3
    assert got.loc[1, "ttr"] == 0.75
    assert got.loc[3, "n_docs"] == 1
    assert got.loc[3, "ttr"] == 0.5
