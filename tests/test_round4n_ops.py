"""Planted tests for the round-4n operator batch (clustering-by-degree
curve, weekday x hour calendar matrix, discount-level demand profile,
per-nation return rates)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def test_clustering_by_degree_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import clustering_by_degree

    # triangle a-b-c plus pendant d on a:
    #   degrees a=3 b=2 c=2 d=1; per-node triangles a=b=c=1, d=0
    #   bin 1 (deg 2..3): nodes a,b,c -> tri 3, wedges 3+1+1=5, cc 0.6
    #   bin 0 (deg 1):    node d      -> tri 0, wedges 0,      cc 0.0
    df = pd.DataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")],
        columns=["src", "dst"],
    )
    df["n_convs"] = 1
    got = (
        clustering_by_degree(ray.data.from_pandas(df), n_buckets=4)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[0, "n_entities"] == 1
    assert got.loc[0, "n_wedges"] == 0
    assert got.loc[0, "cc"] == 0.0
    assert got.loc[1, "n_entities"] == 3
    assert got.loc[1, "n_triangles"] == 3
    assert got.loc[1, "n_wedges"] == 5
    assert got.loc[1, "cc"] == 0.6
    assert got.loc[1, "min_degree"] == 2


def test_dow_hour_matrix_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import dow_hour_matrix

    # 2024-01-01 is a Monday (isodow 1); 2024-01-07 a Sunday (isodow 7)
    df = pd.DataFrame({
        "ts": pd.to_datetime([
            "2024-01-01 05:10:00", "2024-01-01 05:50:00",
            "2024-01-07 23:00:00",
        ]),
        "value": [1.25, 2.25, 0.02],
    })
    got = (
        dow_hour_matrix(ray.data.from_pandas(df))
        .to_pandas()
        .set_index(["dow", "hour"])
        .sort_index()
    )
    assert len(got) == 2
    assert got.loc[(1, 5), "n_events"] == 2
    assert got.loc[(1, 5), "value_sum"] == 3.5
    assert got.loc[(1, 5), "share"] == 0.666667
    assert got.loc[(7, 23), "n_events"] == 1
    assert got.loc[(7, 23), "value_sum"] == 0.02


def test_discount_effect_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import discount_effect

    pq.write_table(pa.table({
        "l_discount": pa.array([0.05, 0.05, 0.0]),
        "l_quantity": pa.array([10.0, 20.0, 7.0]),
        "l_extendedprice": pa.array([100.00, 200.00, 50.00]),
    }), str(tmp_path / "lineitem.parquet"))
    got = (
        discount_effect(str(tmp_path))
        .to_pandas()
        .set_index("l_discount")
        .sort_index()
    )
    assert got.loc[0.05, "n_lines"] == 2
    assert got.loc[0.05, "sum_qty"] == 30
    assert got.loc[0.05, "avg_qty"] == 15.0
    # (100 + 200) * 0.95 exactly in scaled ints
    assert got.loc[0.05, "revenue"] == 285.0
    assert got.loc[0.0, "revenue"] == 50.0


def test_returns_by_nation_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import returns_by_nation

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], type=pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R"]),
        "l_extendedprice": pa.array([100.00, 40.00, 30.00]),
        "l_discount": pa.array([0.10, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_custkey": pa.array([11, 22], type=pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([11, 22], type=pa.int64()),
        "c_nationkey": pa.array([0, 1], type=pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"]),
    }), str(tmp_path / "nation.parquet"))

    got = (
        returns_by_nation(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("n_name")
        .sort_index()
    )
    assert got.loc["ALPHA", "n_lines"] == 2
    assert got.loc["ALPHA", "n_returned"] == 1
    assert got.loc["ALPHA", "return_rate"] == 0.5
    assert got.loc["ALPHA", "returned_revenue"] == 90.0
    assert got.loc["BETA", "n_returned"] == 1
    assert got.loc["BETA", "return_rate"] == 1.0
    assert got.loc["BETA", "returned_revenue"] == 30.0


def test_component_size_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import component_size_hist

    # component {a,b,c} (size 3 -> bin 1), component {x,y} (size 2 ->
    # bin 1), singleton pair {p,q} ... p-q is size 2 too; use a 5-chain
    # f-g-h-i-j (size 5 -> bin 2)
    edges = [("a", "b"), ("b", "c"), ("x", "y"),
             ("f", "g"), ("g", "h"), ("h", "i"), ("i", "j")]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    df["n_convs"] = 1
    got = (
        component_size_hist(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[1, "n_components"] == 2      # sizes 3 and 2
    assert got.loc[1, "n_entities"] == 5
    assert got.loc[2, "n_components"] == 1      # size 5
    assert got.loc[2, "n_entities"] == 5
    assert got.loc[2, "min_size"] == 4


def test_cooc_weight_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import cooc_weight_hist

    df = pd.DataFrame({
        "src": ["a", "a", "b", "c"],
        "dst": ["b", "c", "c", "d"],
        "n_convs": [1, 1, 2, 5],
    })
    got = (
        cooc_weight_hist(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[0, "n_edges"] == 2           # weights 1, 1
    assert got.loc[1, "n_edges"] == 1           # weight 2
    assert got.loc[2, "n_edges"] == 1           # weight 5 (bin [4,8))
    assert got.loc[0, "share"] == 0.5
    assert got.loc[2, "min_weight"] == 4


def test_cusum_days_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import cusum_days

    # days: 1,1,1,5 events -> n_tot=8, n_days=4
    # S: max(0, 1*4-8)=0, 0, 0, max(0, 0+5*4-8)=12
    # alarm (lam=1/2): 2*S > 8*4=32 ? 24 > 32 no -> with lam 1/4: 4*12=48>32 yes
    ts = (["2024-01-01 00:00:00"] + ["2024-01-02 01:00:00"]
          + ["2024-01-03 02:00:00"] + ["2024-01-04 03:00:00"] * 5)
    df = pd.DataFrame({"ts": pd.to_datetime(ts)})
    got = (
        cusum_days(ray.data.from_pandas(df), lam_num=1, lam_den=4)
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    assert list(got["cusum_scaled"]) == [0, 0, 0, 12]
    assert list(got["alarm"]) == [0, 0, 0, 1]
    assert got.loc["2024-01-04", "n_events"] == 5


def test_vocab_growth_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import vocab_growth

    # doc 0: "a b"   -> a,b first at md=0  -> bin of (0+1)=1 -> bin 0
    # doc 1: "a c"   -> c first at md=1    -> bin of 2       -> bin 1
    # doc 3: "d b"   -> d first at md=3    -> bin of 4       -> bin 2
    docs = pd.DataFrame({
        "doc_id": [0, 1, 3],
        "text": ["a b", "a c", "d b"],
    })
    got = (
        vocab_growth(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[0, "n_new_words"] == 2
    assert got.loc[1, "n_new_words"] == 1
    assert got.loc[2, "n_new_words"] == 1
    assert list(got["vocab_cum"]) == [2, 3, 4]


def test_charclass_profile_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import charclass_profile

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["s1", "s1", "s2"],
        "text": ["ab 12", "x!", None],  # s1: 7 chars, 3 alpha, 2 digit,
    })                                  #     1 space, 1 other
    got = (
        charclass_profile(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("source")
    )
    assert len(got) == 1  # null-text s2 drops entirely
    assert got.loc["s1", "n_chars"] == 7
    assert got.loc["s1", "alpha_share"] == np.round(3 / 7, 6)
    assert got.loc["s1", "digit_share"] == np.round(2 / 7, 6)
    assert got.loc["s1", "space_share"] == np.round(1 / 7, 6)
    assert got.loc["s1", "other_share"] == np.round(1 / 7, 6)


def test_orientation_profile_planted(ray_session):
    from tcx2graph_jl_ray.stages.multimodal import orientation_profile

    df = pd.DataFrame({
        "format": ["f", "f", "f", "f"],
        "width": pd.array([100, 50, 80, 0], dtype="int32"),
        "height": pd.array([50, 100, 80, 99], dtype="int32"),
    })
    got = (
        orientation_profile(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("orientation")
    )
    assert got.loc["landscape", "n_payloads"] == 1
    assert got.loc["landscape", "sum_pixels"] == 5000
    assert got.loc["portrait", "n_payloads"] == 1
    assert got.loc["square", "n_payloads"] == 1
    assert got.loc["degenerate", "n_payloads"] == 1
    assert got.loc["degenerate", "sum_pixels"] == 0
    assert got.loc["square", "share"] == 0.25


def test_value_by_dow_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import value_by_dow

    # Monday: 0.01 + 0.02 -> avg cents (2*3+2)//4 = 2 -> 0.02 (half-up)
    df = pd.DataFrame({
        "ts": pd.to_datetime([
            "2024-01-01 01:00", "2024-01-01 02:00", "2024-01-07 03:00",
        ]),
        "value": [0.01, 0.02, 5.00],
    })
    got = (
        value_by_dow(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("dow")
        .sort_index()
    )
    assert got.loc[1, "n_events"] == 2
    assert got.loc[1, "value_sum"] == 0.03
    assert got.loc[1, "value_avg"] == 0.02
    assert got.loc[7, "value_avg"] == 5.0


def test_qty_price_corr_planted(ray_session, tmp_path):
    import math

    from tcx2graph_jl_ray.stages.relational import qty_price_corr

    # perfectly linear: price = qty * 10.00 -> corr exactly 1
    pq.write_table(pa.table({
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0]),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0]),
    }), str(tmp_path / "lineitem.parquet"))
    got = qty_price_corr(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got.loc[0, "n"] == 4
    assert got.loc[0, "corr_qty_price"] == 1.0


def test_gram_df_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import gram_df_hist

    # k=3 grams: "abc" in docs 1,2,3 (df 3 -> bin 1); "bcd" in docs 1,2
    # (df 2 -> bin 1); "xyz" only doc 3 (df 1 -> bin 0); doc 4 too short
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["abcd", "abcd", "abcxyz", "ab"],
    })
    got = (
        gram_df_hist(ray.data.from_pandas(docs), k=3)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    # grams: abc(df3), bcd(df2), bcx(1), cxy(1), xyz(1)
    assert got.loc[0, "n_grams"] == 3
    assert got.loc[1, "n_grams"] == 2
    assert got.loc[1, "min_docs"] == 2
    assert got.loc[0, "share"] == 0.6


def test_lang_profile_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import lang_profile

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en", "en", "de", "en"],
        "text": ["a b c", "d e", "f", None],  # null drops
    })
    got = (
        lang_profile(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert got.loc["en", "n_docs"] == 2
    assert got.loc["en", "n_tokens"] == 5
    assert got.loc["en", "avg_tokens"] == 2.5
    assert got.loc["en", "share"] == np.round(2 / 3, 6)
    assert got.loc["de", "n_tokens"] == 1


def test_round_value_bias_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import round_value_bias

    df = pd.DataFrame({
        "event_type": ["a"] * 4,
        "value": [5.00, 2.50, 0.30, 0.07],
    })
    got = (
        round_value_bias(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("event_type")
    )
    assert got.loc["a", "n_events"] == 4
    assert got.loc["a", "n_round_dollar"] == 1
    assert got.loc["a", "dollar_share"] == 0.25
    assert got.loc["a", "n_round_dime"] == 3   # 500, 250, 30 cents
    assert got.loc["a", "dime_share"] == 0.75


def test_word_freq_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import word_freq_hist

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a a a a b", "a c b"],   # a:5 (bin 2), b:2 (bin 1),
    })                                    # c:1 (bin 0)
    got = (
        word_freq_hist(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[0, "n_words"] == 1
    assert got.loc[0, "token_mass"] == 1
    assert got.loc[1, "n_words"] == 1
    assert got.loc[1, "token_mass"] == 2
    assert got.loc[2, "n_words"] == 1
    assert got.loc[2, "token_mass"] == 5
    assert got.loc[2, "min_freq"] == 4


def test_kwic_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import kwic

    docs = pd.DataFrame({
        "doc_id": [7, 8],
        "text": ["x y term z w", "term a term b"],
    })
    got = (
        kwic(ray.data.from_pandas(docs), "term", window=1)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    assert len(got) == 3
    assert got.loc[0, "doc_id"] == 7 and got.loc[0, "pos"] == 2
    assert got.loc[0, "context"] == "y term z"
    assert got.loc[1, "pos"] == 0        # doc 8, left-clamped window
    assert got.loc[1, "context"] == "term a"
    assert got.loc[2, "pos"] == 2
    assert got.loc[2, "context"] == "a term b"


def test_segment_aov_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import segment_aov

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_custkey": pa.array([11, 22, 11], type=pa.int64()),
        "o_totalprice": pa.array([10.01, 5.00, 10.02]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([11, 22], type=pa.int64()),
        "c_mktsegment": pa.array(["SEG_A", "SEG_B"]),
    }), str(tmp_path / "customer.parquet"))
    got = (
        segment_aov(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("c_mktsegment")
        .sort_index()
    )
    assert got.loc["SEG_A", "n_orders"] == 2
    assert got.loc["SEG_A", "total_value"] == 20.03
    # mean cents (2*2003 + 2) // 4 = 1002 -> 10.02 (half-up)
    assert got.loc["SEG_A", "avg_order_value"] == 10.02
    assert got.loc["SEG_B", "avg_order_value"] == 5.0


def test_size_diversity_corr_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import size_diversity_corr

    # convs: c1 has 1 turn / 1 entity, c2 has 2 turns / 2 entities,
    # c3 has 3 turns / 3 entities -> perfectly linear, corr = 1
    tr = pd.DataFrame({
        "conv_id": ["c1", "c2", "c2", "c3", "c3", "c3"],
        "turn_idx": [0, 0, 1, 0, 1, 2],
    })
    me = pd.DataFrame({
        "conv_id": ["c1", "c2", "c2", "c3", "c3", "c3", "c3"],
        "entity_id": ["e1", "e1", "e2", "e1", "e2", "e3", "e3"],
    })
    got = size_diversity_corr(
        ray.data.from_pandas(tr), ray.data.from_pandas(me)
    ).to_pandas()
    assert len(got) == 1
    assert got.loc[0, "n_convs"] == 3
    assert got.loc[0, "corr_turns_entities"] == 1.0


def test_edge_growth_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import edge_growth

    # conv A (Jan): entities e1,e2 -> edge (e1,e2) born 2024-01
    # conv B (Feb): e1,e2,e3 -> (e1,e2) already seen; (e1,e3),(e2,e3) new
    tr = pd.DataFrame({
        "conv_id": ["A", "A", "B"],
        "turn_idx": [0, 1, 0],
        "ts": pd.to_datetime([
            "2024-01-05 10:00", "2024-01-05 11:00", "2024-02-01 09:00",
        ]),
    })
    me = pd.DataFrame({
        "conv_id": ["A", "A", "B", "B", "B"],
        "entity_id": ["e1", "e2", "e1", "e2", "e3"],
    })
    got = (
        edge_growth(ray.data.from_pandas(me), ray.data.from_pandas(tr))
        .to_pandas()
        .set_index("month")
        .sort_index()
    )
    assert got.loc["2024-01", "n_new_edges"] == 1
    assert got.loc["2024-02", "n_new_edges"] == 2
    assert list(got["edges_cum"]) == [1, 3]


def test_gap_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import gap_hist

    # user 1, type a at t0, t0+1s, t0+1s, t0+5s: gaps 1 (bin 0),
    # 0 (bin -1), 4 (bin 2); user 2 single event -> no gap
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 1, 1, 2],
        "event_type": ["a"] * 4 + ["a"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:01",
            "2024-01-01 00:00:01", "2024-01-01 00:00:05",
            "2024-01-01 00:00:00",
        ]),
    })
    got = (
        gap_hist(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[-1, "n_gaps"] == 1
    assert got.loc[-1, "min_gap_s"] == 0
    assert got.loc[0, "n_gaps"] == 1
    assert got.loc[2, "n_gaps"] == 1
    assert got.loc[2, "min_gap_s"] == 4
    assert got.loc[0, "share"] == np.round(1 / 3, 6)


def test_open_order_aging_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import open_order_aging

    pq.write_table(pa.table({
        "o_orderdate": pa.array(pd.to_datetime([
            "2024-03-01",   # max date anchor (status F, excluded)
            "2024-02-25",   # O, age 5d  -> bucket 0
            "2024-01-01",   # O, age 60d -> bucket 2
        ])),
        "o_orderstatus": pa.array(["F", "O", "O"]),
        "o_totalprice": pa.array([1.00, 10.50, 20.25]),
    }), str(tmp_path / "orders.parquet"))
    got = (
        open_order_aging(str(tmp_path))
        .to_pandas()
        .set_index("bucket")
        .sort_index()
    )
    assert got.loc[0, "n_orders"] == 1
    assert got.loc[0, "open_value"] == 10.5
    assert got.loc[2, "age_min_days"] == 60
    assert got.loc[2, "open_value"] == 20.25


def test_hot_stability_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import hot_stability

    # 4 mentions: h1 (two earliest) mentions e1, e2; h2 mentions e1, e3
    # k=2 -> top sets {e1,e2} vs {e1,e3} -> overlap 1, stability 0.5
    tr = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c2"],
        "turn_idx": [0, 1, 0, 1],
        "ts": pd.to_datetime([
            "2024-01-01", "2024-01-02", "2024-01-09", "2024-01-10",
        ]),
    })
    me = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c2"],
        "turn_idx": [0, 1, 0, 1],
        "entity_id": ["e1", "e2", "e1", "e3"],
    })
    got = hot_stability(
        ray.data.from_pandas(me), ray.data.from_pandas(tr), k=2
    ).to_pandas()
    assert got.loc[0, "n_top_h1"] == 2
    assert got.loc[0, "n_top_h2"] == 2
    assert got.loc[0, "n_overlap"] == 1
    assert got.loc[0, "stability"] == 0.5


def test_template_rate_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import template_rate

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["s1", "s1", "s2", "s1"],
        # prefix_len=4: docs 1,3 share "dear"; doc 2 and 4 unique
        "text": ["dear alice", "hi bob", "dear carol", "yo"],
    })
    got = (
        template_rate(ray.data.from_pandas(docs), prefix_len=4)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["s1", "n_docs"] == 3
    assert got.loc["s1", "n_templated"] == 1     # only "dear alice"
    assert got.loc["s1", "template_rate"] == np.round(1 / 3, 6)
    assert got.loc["s2", "n_templated"] == 1     # "dear carol"
    assert got.loc["s2", "template_rate"] == 1.0


def test_method_agreement_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import method_agreement

    mh = pd.DataFrame({"a": [1, 1, 2], "b": [2, 3, 3]})
    sh = pd.DataFrame({"a": [1, 4], "b": [2, 5],
                       "hamming": [1, 0]})
    got = method_agreement(
        ray.data.from_pandas(mh), ray.data.from_pandas(sh)
    ).to_pandas()
    assert got.loc[0, "n_minhash"] == 3
    assert got.loc[0, "n_simhash"] == 2
    assert got.loc[0, "n_both"] == 1          # only (1,2)
    assert got.loc[0, "agreement"] == 0.25    # 1 / (3+2-1)


def test_cross_source_clusters_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import cross_source_clusters

    cl = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "cluster_id": [1, 1, 3, 3, 5],
    })
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["s1", "s2", "s1", "s1", "s9"],
        "text": ["x"] * 5,
    })
    got = (
        cross_source_clusters(
            ray.data.from_pandas(cl), ray.data.from_pandas(docs)
        )
        .to_pandas()
        .set_index("n_sources")
        .sort_index()
    )
    assert got.loc[1, "n_clusters"] == 2      # {3,4} same-source + {5}
    assert got.loc[1, "n_docs"] == 3
    assert got.loc[2, "n_clusters"] == 1      # {1,2} spans s1+s2
    assert got.loc[2, "n_docs"] == 2


def test_exact_dup_vectors_planted(ray_session):
    from tcx2graph_jl_ray.stages.ann import exact_dup_vectors

    v1, v2 = [1.0, 2.0, 3.0], [9.0, 8.0, 7.0]
    df = pd.DataFrame({
        "vec_id": [1, 2, 3, 4],
        "embedding": [v1, v1, v1, v2],
    })
    got = exact_dup_vectors(ray.data.from_pandas(df)).to_pandas()
    assert got.loc[0, "n_vectors"] == 4
    assert got.loc[0, "n_distinct"] == 2
    assert got.loc[0, "n_dup_vectors"] == 1
    assert got.loc[0, "max_multiplicity"] == 3


def test_mentions_per_turn_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import mentions_per_turn_hist

    m = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", "c2", "c2"],
        "turn_idx": [0, 0, 1, 0, 0, 0],
        "norm": ["a", "b", "a", "a", "b", "c"],
    })
    got = (
        mentions_per_turn_hist(ray.data.from_pandas(m))
        .to_pandas()
        .set_index("n_mentions")
        .sort_index()
    )
    assert got.loc[1, "n_turns"] == 1     # c1 turn 1
    assert got.loc[2, "n_turns"] == 1     # c1 turn 0
    assert got.loc[3, "n_turns"] == 1     # c2 turn 0
    assert got.loc[2, "share"] == np.round(1 / 3, 6)


def test_edge_type_overlap_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import edge_type_overlap

    cooc = pd.DataFrame({
        "src": ["a", "a", "b"],
        "dst": ["b", "c", "c"],
        "n_convs": [1, 1, 1],
    })
    # transitions: b->a (normalizes to (a,b), in cooc), c->d (not in cooc),
    # a->a self-loop dropped
    trn = pd.DataFrame({
        "from_entity": ["b", "c", "a"],
        "to_entity": ["a", "d", "a"],
        "n": [1, 1, 1],
    })
    got = edge_type_overlap(
        ray.data.from_pandas(cooc), ray.data.from_pandas(trn)
    ).to_pandas()
    assert got.loc[0, "n_cooc"] == 3
    assert got.loc[0, "n_transition_pairs"] == 2
    assert got.loc[0, "n_both"] == 1
    assert got.loc[0, "jaccard"] == 0.25


def test_supplier_acctbal_profile_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import supplier_acctbal_profile

    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
        "s_nationkey": pa.array([0, 0, 1], type=pa.int32()),
        "s_acctbal": pa.array([10.01, -20.02, 5.00]),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"]),
    }), str(tmp_path / "nation.parquet"))
    got = (
        supplier_acctbal_profile(str(tmp_path))
        .to_pandas()
        .set_index("n_name")
        .sort_index()
    )
    assert got.loc["ALPHA", "n_suppliers"] == 2
    assert got.loc["ALPHA", "total_bal"] == -10.01
    # mean cents: -1001/2 -> half-away -> -501 -> -5.01
    assert got.loc["ALPHA", "avg_bal"] == -5.01
    assert got.loc["ALPHA", "min_bal"] == -20.02
    assert got.loc["ALPHA", "max_bal"] == 10.01
    assert got.loc["BETA", "avg_bal"] == 5.0


def test_role_mix_monthly_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import role_mix_monthly

    tr = pd.DataFrame({
        "conv_id": ["c"] * 4,
        "turn_idx": [0, 1, 2, 3],
        "role": ["user", "assistant", "user", "tool"],
        "ts": pd.to_datetime([
            "2024-01-02", "2024-01-03", "2024-02-01", "2024-02-02",
        ]),
    })
    got = (
        role_mix_monthly(ray.data.from_pandas(tr))
        .to_pandas()
        .set_index(["month", "role"])
        .sort_index()
    )
    assert got.loc[("2024-01", "user"), "n_turns"] == 1
    assert got.loc[("2024-01", "user"), "share"] == 0.5
    assert got.loc[("2024-02", "tool"), "share"] == 0.5


def test_dup_rate_by_length_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import dup_rate_by_length

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        # "a b": 2 tok -> bin 1, duplicated x2; "x y z w": 4 tok -> bin 2
        "text": ["a b", "a b", "x y z w", None],
    })
    got = (
        dup_rate_by_length(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[1, "n_docs"] == 2
    assert got.loc[1, "n_dup_docs"] == 2
    assert got.loc[1, "dup_rate"] == 1.0
    assert got.loc[2, "n_dup_docs"] == 0
    assert got.loc[2, "dup_rate"] == 0.0


def test_sources_per_word_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import sources_per_word_hist

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["s1", "s2", "s1"],
        # "the": s1+s2 (2 sources); "cat": s1 only; "dog": s2 only;
        # "sat": s1 only (two docs, still 1 source)
        "text": ["the cat sat", "the dog", "sat sat"],
    })
    got = (
        sources_per_word_hist(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("n_sources")
        .sort_index()
    )
    assert got.loc[1, "n_words"] == 3     # cat, dog, sat
    assert got.loc[2, "n_words"] == 1     # the
    assert got.loc[2, "share"] == 0.25


def test_source_copy_matrix_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import source_copy_matrix

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["s1", "s2", "s3", "s1"],
        # prefix_len=4: "dear" shared by s1,s2,s3; "holm" only s1
        "text": ["dear a", "dear b", "dear c", "holmes"],
    })
    got = (
        source_copy_matrix(ray.data.from_pandas(docs), prefix_len=4)
        .to_pandas()
        .set_index(["source_a", "source_b"])
        .sort_index()
    )
    assert len(got) == 3                       # (s1,s2) (s1,s3) (s2,s3)
    assert got.loc[("s1", "s2"), "n_shared_prefixes"] == 1
    assert got.loc[("s2", "s3"), "n_shared_prefixes"] == 1


def test_tax_effect_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import tax_effect

    pq.write_table(pa.table({
        "l_tax": pa.array([0.05, 0.05, 0.0]),
        "l_extendedprice": pa.array([100.00, 200.00, 50.00]),
        "l_discount": pa.array([0.10, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    got = (
        tax_effect(str(tmp_path))
        .to_pandas()
        .set_index("l_tax")
        .sort_index()
    )
    # tax 0.05: revenue 90 + 200 = 290; charge 290 * 1.05 = 304.50
    assert got.loc[0.05, "n_lines"] == 2
    assert got.loc[0.05, "revenue"] == 290.0
    assert got.loc[0.05, "charge"] == 304.5
    assert got.loc[0.0, "charge"] == 50.0


def test_label_profile_planted(ray_session):
    from tcx2graph_jl_ray.stages.ann import label_profile

    df = pd.DataFrame({
        "vec_id": [1, 2, 3, 4],
        "label": [0, 0, 0, 7],
    })
    got = (
        label_profile(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("label")
        .sort_index()
    )
    assert got.loc[0, "n_vectors"] == 3
    assert got.loc[0, "share"] == 0.75
    assert got.loc[7, "share"] == 0.25


def test_user_activity_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import user_activity_hist

    df = pd.DataFrame({
        "user_id": [1, 2, 2, 3, 3, 3, 3, 3],   # counts 1, 2, 5
        "event_id": range(8),
    })
    got = (
        user_activity_hist(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[0, "n_users"] == 1
    assert got.loc[1, "n_users"] == 1
    assert got.loc[2, "n_users"] == 1          # 5 events -> bin 2
    assert got.loc[2, "n_events"] == 5
    assert got.loc[2, "min_events"] == 4
    assert got.loc[0, "share"] == np.round(1 / 3, 6)


def test_entity_growth_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import entity_growth

    tr = pd.DataFrame({
        "conv_id": ["A", "A", "B"],
        "turn_idx": [0, 1, 0],
        "ts": pd.to_datetime([
            "2024-01-05", "2024-02-20", "2024-02-01",
        ]),
    })
    # e1 first at A/0 (Jan); e2 first at A/1 (Feb); e1 again at B/0 (Feb)
    me = pd.DataFrame({
        "conv_id": ["A", "A", "B"],
        "turn_idx": [0, 1, 0],
        "entity_id": ["e1", "e2", "e1"],
    })
    got = (
        entity_growth(ray.data.from_pandas(me), ray.data.from_pandas(tr))
        .to_pandas()
        .set_index("month")
        .sort_index()
    )
    assert got.loc["2024-01", "n_new_entities"] == 1
    assert got.loc["2024-02", "n_new_entities"] == 1
    assert list(got["entities_cum"]) == [1, 2]


def test_lines_value_corr_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import lines_value_corr

    # orders with 1, 2, 3 lines and values 10, 20, 30 -> corr 1
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2, 3, 3, 3], type=pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0, 30.0]),
    }), str(tmp_path / "orders.parquet"))
    got = lines_value_corr(str(tmp_path)).to_pandas()
    assert got.loc[0, "n_orders"] == 3
    assert got.loc[0, "corr_lines_value"] == 1.0


def test_region_revenue_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import region_revenue

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0]),
        "l_discount": pa.array([0.0, 0.5]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_custkey": pa.array([11, 22], type=pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([11, 22], type=pa.int64()),
        "c_nationkey": pa.array([0, 1], type=pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_regionkey": pa.array([0, 1], type=pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], type=pa.int64()),
        "r_name": pa.array(["EAST", "WEST"]),
    }), str(tmp_path / "region.parquet"))
    got = (
        region_revenue(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("r_name")
        .sort_index()
    )
    assert got.loc["EAST", "revenue"] == 100.0
    assert got.loc["WEST", "revenue"] == 100.0   # 200 * 0.5
    assert got.loc["EAST", "share"] == 0.5
    assert got.loc["EAST", "n_lines"] == 1


def test_value_median_by_type_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import value_median_by_type

    ev = pd.DataFrame({
        "event_type": ["a"] * 4 + ["b"] * 3,
        "value": [1.0, 2.0, 3.0, 4.0, 10.0, None, 20.0],
    })
    got = (
        value_median_by_type(ray.data.from_pandas(ev))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    # a: [1,2,3,4] -> p50 = 2.5 (interp), p90 = 1 + 0.9*3... rank 2.7:
    # 3 + 0.7*(4-3) = 3.7 ; b: [10,20] -> p50 = 15, p90 = 19
    assert got.loc["a", "n_valued"] == 4
    assert got.loc["a", "p50"] == 2.5
    assert got.loc["a", "p90"] == np.round(3 + 0.7000000000000002 * 1, 6)
    assert got.loc["b", "n_valued"] == 2
    assert got.loc["b", "p50"] == 15.0
    assert got.loc["b", "p90"] == 19.0


def test_brand_revenue_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import brand_revenue

    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 100.0, 300.0]),
        "l_discount": pa.array([0.0, 0.0, 0.5]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], type=pa.int64()),
        "p_brand": pa.array(["B1", "B2"]),
    }), str(tmp_path / "part.parquet"))
    got = (
        brand_revenue(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("p_brand")
        .sort_index()
    )
    assert got.loc["B1", "revenue"] == 200.0
    assert got.loc["B2", "revenue"] == 150.0   # 300 * 0.5
    assert got.loc["B1", "n_lines"] == 2
    assert got.loc["B1", "share"] == np.round(200 / 350, 6)


def test_customer_nation_mix_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import customer_nation_mix

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
        "c_nationkey": pa.array([0, 0, 1], type=pa.int64()),
        "c_acctbal": pa.array([10.50, -0.50, 7.25]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["ALGERIA", "BRAZIL"]),
    }), str(tmp_path / "nation.parquet"))
    got = (
        customer_nation_mix(str(tmp_path))
        .to_pandas()
        .set_index("n_name")
        .sort_index()
    )
    assert got.loc["ALGERIA", "n_customers"] == 2
    assert got.loc["ALGERIA", "avg_acctbal"] == 5.0   # (1050-50)/200
    assert got.loc["BRAZIL", "avg_acctbal"] == 7.25
    assert got.loc["ALGERIA", "share"] == np.round(2 / 3, 6)


def test_turn_len_by_position_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import turn_len_by_position

    tr = pd.DataFrame({
        "turn_idx": [0, 0, 1, 5],
        "text": ["a b", "c", "d e f", "x y"],
    })
    got = (
        turn_len_by_position(ray.data.from_pandas(tr), cap=3)
        .to_pandas()
        .set_index("turn_pos")
        .sort_index()
    )
    assert got.loc[0, "n_turns"] == 2
    assert got.loc[0, "n_tokens"] == 3
    assert got.loc[0, "avg_tokens"] == 2     # (2*3+2)//4 = 2 half-up
    assert got.loc[1, "avg_tokens"] == 3
    assert got.loc[3, "n_turns"] == 1        # capped from turn 5


def test_neighbor_degree_curve_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import neighbor_degree_curve

    # hub h -> a, b, c (out_deg 3); a -> b (out_deg 1)
    # in-degs: a 1, b 2, c 1
    tr = pd.DataFrame({
        "from_entity": ["h", "h", "h", "a"],
        "to_entity": ["a", "b", "c", "b"],
        "n": [1, 1, 1, 1],
    })
    got = (
        neighbor_degree_curve(ray.data.from_pandas(tr), n_buckets=4)
        .to_pandas()
        .set_index("out_deg")
        .sort_index()
    )
    assert got.loc[3, "n_edges"] == 3
    assert got.loc[3, "avg_nbr_in_deg"] == np.round(4 / 3, 6)
    assert got.loc[1, "avg_nbr_in_deg"] == 2.0


def test_order_value_deciles_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import order_value_deciles

    pq.write_table(pa.table({
        "o_totalprice": pa.array([float(i) for i in range(1, 12)]),
    }), str(tmp_path / "orders.parquet"))
    got = order_value_deciles(str(tmp_path)).to_pandas()
    assert got.loc[0, "n_orders"] == 11
    assert got.loc[0, "p50"] == 6.0          # median of 1..11
    assert got.loc[0, "p10"] == 2.0          # rank 0.1*10 = 1 -> value 2


def test_alternation_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import alternation_hist

    # conv A: u,a,u -> 2 pairs, 2 alt -> ratio 1.0 -> bin 9 (clipped)
    # conv B: u,u,a -> 2 pairs, 1 alt -> 10*1//2 = 5
    # conv C: single turn -> dropped
    tr = pd.DataFrame({
        "conv_id": ["A", "A", "A", "B", "B", "B", "C"],
        "turn_idx": [0, 1, 2, 0, 1, 2, 0],
        "role": ["user", "assistant", "user",
                 "user", "user", "assistant", "user"],
    })
    got = (
        alternation_hist(ray.data.from_pandas(tr), n_buckets=4)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert list(got.index) == [5, 9]
    assert got.loc[9, "n_convs"] == 1
    assert got.loc[5, "share"] == 0.5
    assert got.loc[5, "lo"] == 0.5


def test_mention_novelty_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import mention_novelty

    tr = pd.DataFrame({
        "conv_id": ["A", "A", "B"],
        "turn_idx": [0, 1, 0],
        "ts": pd.to_datetime(["2024-01-05", "2024-02-20", "2024-02-01"]),
    })
    # e1 born Jan; Feb has 2 mentions: e1 (repeat) + e2 (new)
    me = pd.DataFrame({
        "conv_id": ["A", "A", "B"],
        "turn_idx": [0, 1, 0],
        "entity_id": ["e1", "e2", "e1"],
    })
    got = (
        mention_novelty(ray.data.from_pandas(me), ray.data.from_pandas(tr))
        .to_pandas()
        .set_index("month")
        .sort_index()
    )
    assert got.loc["2024-01", "n_repeat"] == 0
    assert got.loc["2024-02", "n_mentions"] == 2
    assert got.loc["2024-02", "n_repeat"] == 1
    assert got.loc["2024-02", "share_repeat"] == 0.5


def test_active_days_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import active_days_hist

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([
            "2024-01-01 01:00", "2024-01-01 02:00", "2024-01-02 00:00",
            "2024-01-01 00:00", "2024-01-05 00:00",
            "2024-03-01 00:00",
        ]),
    })
    got = (
        active_days_hist(ray.data.from_pandas(ev))
        .to_pandas()
        .set_index("n_days")
        .sort_index()
    )
    assert got.loc[1, "n_users"] == 1
    assert got.loc[2, "n_users"] == 2
    assert got.loc[2, "share"] == np.round(2 / 3, 6)


def test_quality_band_tokens_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import quality_band_tokens

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        # doc1: "the and" -> 2 stop / 2 tok -> band 9 (10*2//2=10 clip)
        # doc2: "the cat" -> 1/2 -> band 5 ; doc3: "x y z" -> 0 -> band 0
        "text": ["the and", "the cat", "x y z"],
    })
    got = (
        quality_band_tokens(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("band")
        .sort_index()
    )
    assert list(got.index) == [0, 5, 9]
    assert got.loc[9, "n_tokens"] == 2
    assert got.loc[9, "cum_tok_share"] == np.round(2 / 7, 6)
    assert got.loc[0, "cum_tok_share"] == 1.0
    assert got.loc[5, "tok_share"] == np.round(2 / 7, 6)


def test_entity_cooc_entropy_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import entity_cooc_entropy

    cooc = pd.DataFrame({
        "src": ["a", "a"],
        "dst": ["b", "c"],
        "n_convs": [1, 1],
    })
    got = (
        entity_cooc_entropy(ray.data.from_pandas(cooc), n_buckets=4)
        .to_pandas()
        .set_index("entity_id")
        .sort_index()
    )
    assert got.loc["a", "n_partners"] == 2
    assert got.loc["a", "partner_entropy"] == 1.0   # two equal partners
    assert got.loc["b", "partner_entropy"] == 0.0
    assert got.loc["b", "w_total"] == 1


def test_dedup_savings_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import dedup_savings

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
        "text": ["a b c", "a b c", "x y", None],
    })
    clusters = pd.DataFrame({
        "doc_id": pd.array([1, 2], dtype="int64"),
        "cluster_id": pd.array([1, 1], dtype="int64"),
    })
    got = dedup_savings(
        ray.data.from_pandas(clusters), ray.data.from_pandas(docs),
        n_buckets=2,
    ).to_pandas()
    assert got.loc[0, "n_docs"] == 3           # null-text doc excluded
    assert got.loc[0, "n_removed"] == 1        # doc 2 folds into doc 1
    assert got.loc[0, "tokens_total"] == 8
    assert got.loc[0, "tokens_removed"] == 3
    assert got.loc[0, "savings_share"] == np.round(3 / 8, 6)


def test_conv_duration_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import conv_duration_hist

    tr = pd.DataFrame({
        "conv_id": ["A", "A", "B", "C", "C"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:07",   # 7 s -> bin 3
            "2024-01-01 00:00:00",                          # 0 s -> bin 0
            "2024-01-01 00:00:00", "2024-01-01 00:00:01",   # 1 s -> bin 1
        ]),
    })
    got = (
        conv_duration_hist(ray.data.from_pandas(tr), n_buckets=4)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert list(got.index) == [0, 1, 3]
    assert got.loc[3, "lo_seconds"] == 7
    assert got.loc[0, "n_convs"] == 1
    assert got.loc[1, "share"] == np.round(1 / 3, 6)


def test_urgent_share_monthly_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import urgent_share_monthly
    import datetime

    pq.write_table(pa.table({
        "o_orderdate": pa.array([
            datetime.date(2024, 1, 1), datetime.date(2024, 1, 2),
            datetime.date(2024, 2, 1),
        ]),
        "o_orderpriority": pa.array(["1-URGENT", "3-MEDIUM", "1-URGENT"]),
    }), str(tmp_path / "orders.parquet"))
    got = (
        urgent_share_monthly(str(tmp_path))
        .to_pandas()
        .set_index("month")
        .sort_index()
    )
    assert got.loc["2024-01", "n_orders"] == 2
    assert got.loc["2024-01", "urgent_share"] == 0.5
    assert got.loc["2024-02", "urgent_share"] == 1.0


def test_norm_profile_planted(ray_session):
    from tcx2graph_jl_ray.stages.ann import norm_profile

    emb = pd.DataFrame({
        "vec_id": pd.array([1, 2, 3], dtype="int64"),
        "embedding": [[3.0, 4.0], [0.0, 1.0], [6.0, 8.0]],
    })
    got = norm_profile(ray.data.from_pandas(emb)).to_pandas()
    assert got.loc[0, "n_vecs"] == 3
    assert got.loc[0, "norm_min"] == 1.0
    assert got.loc[0, "norm_max"] == 10.0
    assert got.loc[0, "p50"] == 5.0
    assert got.loc[0, "norm_mean"] == np.round(16 / 3, 6)


def test_simhash_bit_balance_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import simhash_bit_balance

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        "text": ["alpha beta", "alpha beta", "gamma delta"],
    })
    got = simhash_bit_balance(ray.data.from_pandas(docs)).to_pandas()
    assert len(got) == 64
    assert (got["n_docs"] == 3).all()
    assert got["n_set"].between(0, 3).all()
    # identical docs hash identically -> every bit count is 0, 1, 2 or 3
    # and the two dup docs always move together (n_set != 1 impossible
    # only if doc3 sets it; check parity-of-dups instead):
    s = got.set_index("bit")["n_set"]
    assert ((s % 2 == 0) | (s == 1) | (s == 3)).all()


def test_hot_turnover_daily_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import hot_turnover_daily

    tr = pd.DataFrame({
        "conv_id": ["A", "A", "B", "B"],
        "turn_idx": [0, 1, 0, 1],
        "ts": pd.to_datetime([
            "2024-01-05", "2024-01-05", "2024-01-06", "2024-01-06",
        ]),
    })
    # day1 top-2: e1, e2 ; day2 top-2: e2, e3 -> common 1, union 3
    me = pd.DataFrame({
        "conv_id": ["A", "A", "B", "B"],
        "turn_idx": [0, 1, 0, 1],
        "entity_id": ["e1", "e2", "e2", "e3"],
    })
    got = hot_turnover_daily(
        ray.data.from_pandas(me), ray.data.from_pandas(tr), k=2
    ).to_pandas()
    assert len(got) == 1
    assert got.loc[0, "day"] == "2024-01-05"
    assert got.loc[0, "next_day"] == "2024-01-06"
    assert got.loc[0, "n_common"] == 1
    assert got.loc[0, "jaccard"] == np.round(1 / 3, 6)


def test_hot_turnover_daily_single_day_empty(ray_session):
    from tcx2graph_jl_ray.stages.analysis import hot_turnover_daily

    tr = pd.DataFrame({
        "conv_id": ["A"], "turn_idx": [0],
        "ts": pd.to_datetime(["2024-01-05"]),
    })
    me = pd.DataFrame({
        "conv_id": ["A"], "turn_idx": [0], "entity_id": ["e1"],
    })
    got = hot_turnover_daily(
        ray.data.from_pandas(me), ray.data.from_pandas(tr), k=2
    )
    # typed-empty contract: a PANDAS frame (Ray drops empty blocks) with
    # zero rows and all four columns intact
    assert isinstance(got, pd.DataFrame)
    assert list(got.columns) == ["day", "next_day", "n_common", "jaccard"]
    assert len(got) == 0


def test_part_size_profile_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import part_size_profile

    pq.write_table(pa.table({
        "p_size": pa.array([1, 1, 5], type=pa.int64()),
        "p_retailprice": pa.array([10.00, 20.01, 7.50]),
    }), str(tmp_path / "part.parquet"))
    got = (
        part_size_profile(str(tmp_path))
        .to_pandas()
        .set_index("p_size")
        .sort_index()
    )
    assert got.loc[1, "n_parts"] == 2
    assert got.loc[1, "avg_retail"] == np.round(3001 / 200, 6)
    assert got.loc[5, "avg_retail"] == 7.5


def test_len_token_corr_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import len_token_corr

    # lengths 3, 5, 7 chars with 1, 2, 3 tokens -> corr 1
    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
        "text": ["abc", "ab cd", "a bb cc", None],
    })
    got = len_token_corr(ray.data.from_pandas(docs)).to_pandas()
    assert got.loc[0, "n_docs"] == 3
    assert got.loc[0, "corr_len_tokens"] == 1.0


def test_returned_rate_monthly_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import returned_rate_monthly
    import datetime

    pq.write_table(pa.table({
        "l_shipdate": pa.array([
            datetime.date(2024, 1, 1), datetime.date(2024, 1, 2),
            datetime.date(2024, 2, 1),
        ]),
        "l_returnflag": pa.array(["R", "N", "N"]),
        "l_extendedprice": pa.array([100.0, 300.0, 50.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    got = (
        returned_rate_monthly(str(tmp_path))
        .to_pandas()
        .set_index("month")
        .sort_index()
    )
    assert got.loc["2024-01", "return_rate"] == 0.5
    assert got.loc["2024-01", "returned_rev_share"] == 0.25
    assert got.loc["2024-02", "n_returned"] == 0


def test_tool_adoption_monthly_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import tool_adoption_monthly

    tr = pd.DataFrame({
        "conv_id": ["A", "A", "B", "C"],
        "role": ["user", "tool", "user", "user"],
        "ts": pd.to_datetime([
            "2024-01-30 23:00", "2024-02-01 00:00",   # conv A starts Jan
            "2024-01-10 00:00", "2024-02-05 00:00",
        ]),
    })
    got = (
        tool_adoption_monthly(ray.data.from_pandas(tr), n_buckets=4)
        .to_pandas()
        .set_index("month")
        .sort_index()
    )
    assert got.loc["2024-01", "n_convs"] == 2        # A (first turn) + B
    assert got.loc["2024-01", "n_tool_convs"] == 1   # A has a tool turn
    assert got.loc["2024-01", "tool_share"] == 0.5
    assert got.loc["2024-02", "tool_share"] == 0.0


def test_response_time_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import response_time_hist

    tr = pd.DataFrame({
        "conv_id": ["A", "A", "A", "A", "B"],
        "turn_idx": [0, 1, 2, 3, 0],
        "role": ["user", "assistant", "user", "assistant", "user"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00.0", "2024-01-01 00:00:03.0",  # 3 s -> bin 2
            "2024-01-01 00:01:00.0", "2024-01-01 00:01:00.5",  # 0 s -> bin 0
            "2024-01-01 00:00:00.0",                           # no assistant
        ]),
    })
    got = (
        response_time_hist(ray.data.from_pandas(tr), n_buckets=4)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert list(got.index) == [0, 2]
    assert got.loc[2, "lo_seconds"] == 3
    assert got.loc[0, "n_responses"] == 1
    assert got.loc[0, "share"] == 0.5


def test_supplier_breadth_hist_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import supplier_breadth_hist

    pq.write_table(pa.table({
        # supplier 1 ships 3 distinct parts (dup row collapses),
        # supplier 2 ships 1 part
        "l_suppkey": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "l_partkey": pa.array([10, 11, 12, 12, 99], type=pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    got = (
        supplier_breadth_hist(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[0, "n_suppliers"] == 1     # breadth 1
    assert got.loc[1, "n_suppliers"] == 1     # breadth 3 -> bin 1
    assert got.loc[1, "min_parts"] == 2
    assert got.loc[0, "share"] == 0.5


def test_night_share_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import night_share_hist

    ev = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 2, 3],
        "ts": pd.to_datetime([
            "2024-01-01 23:00", "2024-01-01 23:30",     # user1 2/2 night
            "2024-01-01 12:00", "2024-01-01 13:00",
            "2024-01-01 05:00",                         # user2 1/3 night
            "2024-01-01 10:00",                         # user3 0/1
        ]),
    })
    got = (
        night_share_hist(ray.data.from_pandas(ev))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[9, "n_users"] == 1          # user1 clipped 10 -> 9
    assert got.loc[3, "n_users"] == 1          # 10*1//3 = 3
    assert got.loc[0, "n_users"] == 1
    assert got.loc[9, "share"] == np.round(1 / 3, 6)


def test_pk_audit_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import pk_audit

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 1, 2], type=pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], type=pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], type=pa.int64()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], type=pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1], type=pa.int64()),
        "l_linenumber": pa.array([1, 2, 2], type=pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    got = (
        pk_audit(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("table_name")
    )
    assert got.loc["orders", "n_rows"] == 3
    assert got.loc["orders", "n_keys"] == 2
    assert got.loc["orders", "dup_rows"] == 2      # key 1 has 2 rows
    assert got.loc["customer", "dup_rows"] == 0
    assert got.loc["lineitem", "n_keys"] == 2      # (1,1), (1,2)
    assert got.loc["lineitem", "dup_rows"] == 2    # (1,2) twice


def test_conv_repeat_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import conv_repeat_hist

    # conv A: e1,e1,e1,e2 -> 4 mentions, 2 distinct -> 10*2//4 = 5
    # conv B: e1,e2      -> repeat share 0 -> bin 0
    me = pd.DataFrame({
        "conv_id": ["A", "A", "A", "A", "B", "B"],
        "entity_id": ["e1", "e1", "e1", "e2", "e1", "e2"],
    })
    got = (
        conv_repeat_hist(ray.data.from_pandas(me), n_buckets=4)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert list(got.index) == [0, 5]
    assert got.loc[5, "n_convs"] == 1
    assert got.loc[0, "share"] == 0.5


def test_numeric_share_by_source_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import numeric_share_by_source

    docs = pd.DataFrame({
        "source": ["w", "w", "x"],
        "text": ["12 cats 34", "no digits here", "7 8a a9 10"],
    })
    got = (
        numeric_share_by_source(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["w", "n_tokens"] == 6
    assert got.loc["w", "n_numeric"] == 2          # 12, 34
    assert got.loc["x", "n_numeric"] == 2          # 7, 10 (not 8a / a9)
    assert got.loc["x", "numeric_share"] == 0.5


def test_fk_audit_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import fk_audit

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 99], type=pa.int64()),
        "l_partkey": pa.array([10, 10, 10], type=pa.int64()),
        "l_suppkey": pa.array([5, 5, 5], type=pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_custkey": pa.array([100, 200], type=pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([100], type=pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([10], type=pa.int64()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([5], type=pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    got = (
        fk_audit(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("relationship")
    )
    assert got.loc["lineitem.l_orderkey->orders", "n_orphans"] == 1
    assert got.loc["lineitem.l_orderkey->orders", "orphan_share"] == \
        np.round(1 / 3, 6)
    assert got.loc["orders.o_custkey->customer", "n_orphans"] == 1
    assert got.loc["lineitem.l_partkey->part", "n_orphans"] == 0
    assert got.loc["lineitem.l_suppkey->supplier", "orphan_share"] == 0.0


def test_alias_count_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import alias_count_hist

    # entity E1 has aliases n1, n2 (2 aliases); E2 only n3
    me = pd.DataFrame({
        "entity_id": ["E1", "E1", "E1", "E2"],
        "norm": ["n1", "n2", "n1", "n3"],
    })
    got = (
        alias_count_hist(ray.data.from_pandas(me), n_buckets=4)
        .to_pandas()
        .set_index("n_aliases")
        .sort_index()
    )
    assert got.loc[1, "n_entities"] == 1
    assert got.loc[2, "n_entities"] == 1
    assert got.loc[2, "share"] == 0.5


def test_null_share_by_type_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import null_share_by_type

    ev = pd.DataFrame({
        "event_type": ["a", "a", "a", "b"],
        "value": [1.0, None, None, 2.0],
    })
    got = (
        null_share_by_type(ray.data.from_pandas(ev))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert got.loc["a", "n_null_value"] == 2
    assert got.loc["a", "null_share"] == np.round(2 / 3, 6)
    assert got.loc["b", "null_share"] == 0.0


def test_lang_entropy_by_source_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import lang_entropy_by_source

    docs = pd.DataFrame({
        "source": ["w", "w", "w", "w", "x"],
        "lang": ["en", "en", "de", "de", "en"],
    })
    got = (
        lang_entropy_by_source(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["w", "n_langs"] == 2
    assert got.loc["w", "lang_entropy"] == 1.0   # 50/50 mix
    assert got.loc["x", "lang_entropy"] == 0.0
    assert got.loc["x", "n_docs"] == 1


def test_centroid_drift_planted(ray_session):
    from tcx2graph_jl_ray.stages.ann import centroid_drift

    emb = pd.DataFrame({
        "vec_id": pd.array([0, 2, 1, 3], dtype="int64"),
        # even centroid (1, 0); odd centroid (0, 1) -> dist sqrt(2)
        "embedding": [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]],
    })
    got = centroid_drift(ray.data.from_pandas(emb)).to_pandas()
    assert got.loc[0, "n_even"] == 2
    assert got.loc[0, "n_odd"] == 2
    assert got.loc[0, "centroid_dist"] == np.round(np.sqrt(2.0), 6)


def test_mention_strength_corr_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import mention_strength_corr

    # mentions: a x3, b x1, c x2 ; edges a-b(2), a-c(4)
    # strengths: a 6, b 2, c 4
    me = pd.DataFrame({
        "entity_id": ["a", "a", "a", "b", "c", "c"],
        "norm": ["a", "a", "a", "b", "c", "c"],
    })
    cooc = pd.DataFrame({
        "src": ["a", "a"], "dst": ["b", "c"], "n_convs": [2, 4],
    })
    got = mention_strength_corr(
        ray.data.from_pandas(me), ray.data.from_pandas(cooc), n_buckets=4
    ).to_pandas()
    assert got.loc[0, "n_entities"] == 3
    x = np.array([3, 1, 2]); y = np.array([6, 2, 4]); n = 3
    num = n * (x * y).sum() - x.sum() * y.sum()
    den = np.sqrt(float(n * (x * x).sum() - x.sum() ** 2)
                  * float(n * (y * y).sum() - y.sum() ** 2))
    assert got.loc[0, "corr_mention_strength"] == np.round(num / den, 6)


def test_conv_size_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import conv_size_hist

    tr = pd.DataFrame({
        "conv_id": ["A"] * 3 + ["B"] * 1 + ["C"] * 4,
    })
    got = (
        conv_size_hist(ray.data.from_pandas(tr), n_buckets=4)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert got.loc[0, "n_convs"] == 1          # size 1
    assert got.loc[1, "n_convs"] == 1          # size 3 -> bin 1
    assert got.loc[2, "n_convs"] == 1          # size 4 -> bin 2
    assert got.loc[1, "n_turns"] == 3
    assert got.loc[2, "min_turns"] == 4


def test_orders_dow_profile_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import orders_dow_profile
    import datetime

    pq.write_table(pa.table({
        # 2024-01-01 Monday, 2024-01-06 Saturday
        "o_orderdate": pa.array([
            datetime.date(2024, 1, 1), datetime.date(2024, 1, 1),
            datetime.date(2024, 1, 6),
        ]),
        "o_totalprice": pa.array([10.00, 30.00, 5.50]),
    }), str(tmp_path / "orders.parquet"))
    got = (
        orders_dow_profile(str(tmp_path))
        .to_pandas()
        .set_index("dow")
        .sort_index()
    )
    assert got.loc[1, "n_orders"] == 2
    assert got.loc[1, "value_sum"] == 40.0
    assert got.loc[1, "avg_value"] == 20.0
    assert got.loc[6, "value_sum"] == 5.5
    assert got.loc[1, "share"] == np.round(2 / 3, 6)


def test_size_by_lang_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import size_by_lang

    docs = pd.DataFrame({
        "lang": ["en", "en", "de", "de"],
        "text": ["a b c", "d e", None, "x"],
    })
    got = (
        size_by_lang(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert got.loc["en", "n_docs"] == 2
    assert got.loc["en", "n_tokens"] == 5
    assert got.loc["en", "avg_tokens"] == 3    # (2*5+2)//4 half-up
    assert got.loc["de", "n_docs"] == 1        # null text excluded
    assert got.loc["de", "share"] == np.round(1 / 3, 6)


def test_audit_pipeline_end_to_end(ray_session, tmp_path):
    from tcx2graph_jl_ray.pipelines.audit import run_audit_pipeline
    import datetime
    import json as _json
    import os

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_custkey": pa.array([100, 999], type=pa.int64()),  # 999 orphan
    }), str(sf / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([100], type=pa.int64()),
    }), str(sf / "customer.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([10], type=pa.int64()),
    }), str(sf / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([5], type=pa.int64()),
    }), str(sf / "supplier.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1], type=pa.int64()),
        "l_linenumber": pa.array([1, 1], type=pa.int64()),  # dup PK
        "l_partkey": pa.array([10, 10], type=pa.int64()),
        "l_suppkey": pa.array([5, 5], type=pa.int64()),
    }), str(sf / "lineitem.parquet"))
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([datetime.datetime(2024, 1, 1)] * 2),
        "user_id": pa.array([1, 1], type=pa.int64()),
        "event_type": pa.array(["a", "a"]),
        "value": pa.array([1.0, None]),
        "props": pa.array(["{}", None]),
    }), str(sf / "events.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["same", "same", "other"]),
    }), str(sf / "documents.parquet"))

    out = str(tmp_path / "mart")
    summary = run_audit_pipeline(str(sf), out, max_dup_share=0.2)

    assert summary["gates"]["pk_ok"] is False      # lineitem dup key
    assert summary["gates"]["fk_ok"] is False      # custkey 999 orphan
    assert summary["gates"]["dup_ok"] is False     # 1/3 dup > 0.2
    assert summary["doc_dup"]["n_dup_docs"] == 1
    for f in ("pk_audit.parquet", "fk_audit.parquet",
              "null_by_type.parquet", "missing_stats.parquet",
              "audit_summary.json"):
        assert os.path.exists(os.path.join(out, f))
    on_disk = _json.load(open(os.path.join(out, "audit_summary.json")))
    assert on_disk["doc_dup"]["dup_share"] == np.round(1 / 3, 6)


def test_type_dow_matrix_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import type_dow_matrix

    ev = pd.DataFrame({
        "event_type": ["a", "a", "a", "b"],
        "ts": pd.to_datetime([
            "2024-01-01 10:00", "2024-01-01 11:00",   # Monday x2
            "2024-01-06 10:00",                        # Saturday
            "2024-01-06 10:00",
        ]),
    })
    got = (
        type_dow_matrix(ray.data.from_pandas(ev))
        .to_pandas()
        .set_index(["event_type", "dow"])
        .sort_index()
    )
    assert got.loc[("a", 1), "n_events"] == 2
    assert got.loc[("a", 1), "share_in_type"] == np.round(2 / 3, 6)
    assert got.loc[("b", 6), "share_in_type"] == 1.0


def test_deadstock_by_brand_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import deadstock_by_brand

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
        "p_brand": pa.array(["B1", "B1", "B2"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 99], type=pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    got = (
        deadstock_by_brand(str(tmp_path), n_buckets=2)
        .to_pandas()
        .set_index("p_brand")
        .sort_index()
    )
    assert got.loc["B1", "n_parts"] == 2
    assert got.loc["B1", "n_dead"] == 1          # part 2 never shipped
    assert got.loc["B1", "dead_share"] == 0.5
    assert got.loc["B2", "dead_share"] == 1.0    # part 3 dead


def test_mention_coverage_by_role_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import mention_coverage_by_role

    tr = pd.DataFrame({
        "conv_id": ["A", "A", "A"],
        "turn_idx": [0, 1, 2],
        "role": ["user", "assistant", "user"],
    })
    me = pd.DataFrame({
        "conv_id": ["A", "A"],
        "turn_idx": [0, 0],        # two mentions, same turn
    })
    got = (
        mention_coverage_by_role(
            ray.data.from_pandas(tr), ray.data.from_pandas(me),
            n_buckets=2,
        )
        .to_pandas()
        .set_index("role")
        .sort_index()
    )
    assert got.loc["user", "n_turns"] == 2
    assert got.loc["user", "n_with_mention"] == 1
    assert got.loc["user", "coverage"] == 0.5
    assert got.loc["assistant", "coverage"] == 0.0


def test_label_cohesion_planted(ray_session):
    from tcx2graph_jl_ray.stages.ann import label_cohesion

    emb = pd.DataFrame({
        "vec_id": pd.array([1, 2, 3], dtype="int64"),
        "label": ["a", "a", "b"],
        # label a: centroid (1, 0); dists^2 = 1 each (vectors (0,0),(2,0))
        "embedding": [[0.0, 0.0], [2.0, 0.0], [5.0, 5.0]],
    })
    got = (
        label_cohesion(ray.data.from_pandas(emb))
        .to_pandas()
        .set_index("label")
        .sort_index()
    )
    assert got.loc["a", "n_vecs"] == 2
    assert got.loc["a", "mean_dist2"] == 1.0
    assert got.loc["b", "mean_dist2"] == 0.0


def test_token_quantiles_by_source_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import token_quantiles_by_source

    docs = pd.DataFrame({
        "source": ["w"] * 4 + ["x"],
        # token counts 1, 2, 3, 4 -> p50 = 2.5; p90 = 3.7
        "text": ["a", "a b", "a b c", "a b c d", "z z"],
    })
    got = (
        token_quantiles_by_source(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["w", "n_docs"] == 4
    assert got.loc["w", "p50_tokens"] == 2.5
    assert got.loc["w", "p90_tokens"] == np.round(
        3 + (0.9 * 3 - 2) * 1, 6)
    assert got.loc["x", "p50_tokens"] == 2.0


def test_entity_gini_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import entity_gini

    # counts: e1 x4, e2 x1, e3 x1 -> sorted (1,1,4), n=3, T=6
    # S = 1*1 + 2*1 + 3*4 = 15 ; gini = 2*15/(3*6) - 4/3 = 1/3
    me = pd.DataFrame({
        "entity_id": ["e1"] * 4 + ["e2", "e3"],
    })
    got = entity_gini(ray.data.from_pandas(me)).to_pandas()
    assert got.loc[0, "n_entities"] == 3
    assert got.loc[0, "total_mentions"] == 6
    assert got.loc[0, "gini"] == np.round(1 / 3, 6)


def test_customer_concentration_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import customer_concentration

    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
        "o_totalprice": pa.array([50.0, 50.0, 30.0, 15.0, 5.0]),
    }), str(tmp_path / "orders.parquet"))
    got = customer_concentration(str(tmp_path), k=2, n_buckets=3)\
        .to_pandas()
    # top-2 customers: cust1 (100) + cust2 (30) = 130 of 150
    assert got.loc[0, "n_top"] == 2
    assert got.loc[0, "top_value"] == 130.0
    assert got.loc[0, "total_value"] == 150.0
    assert got.loc[0, "cr"] == np.round(130 / 150, 6)


def test_value_by_activity_band_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import value_by_activity_band

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "value": [10.0, 10.0, None, 5.0],
    })
    got = (
        value_by_activity_band(ray.data.from_pandas(ev))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    # user1: 3 events -> bin 1, 20.00 ; user2: 1 event -> bin 0, 5.00
    assert got.loc[1, "value_sum"] == 20.0
    assert got.loc[0, "value_sum"] == 5.0
    assert got.loc[1, "value_share"] == 0.8
    assert got.loc[1, "user_share"] == 0.5


def test_top_cooc_pairs_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import top_cooc_pairs

    cooc = pd.DataFrame({
        "src": ["a", "a", "b", "a"],
        "dst": ["b", "c", "c", "d"],
        "n_convs": [5, 3, 5, 1],
    })
    got = top_cooc_pairs(
        ray.data.from_pandas(cooc), k=3, n_buckets=2
    ).to_pandas()
    # ties at 5: (a,b) before (b,c) lexically
    assert list(got["rank"]) == [1, 2, 3]
    assert (got.loc[0, "src"], got.loc[0, "dst"]) == ("a", "b")
    assert (got.loc[1, "src"], got.loc[1, "dst"]) == ("b", "c")
    assert got.loc[2, "n_convs"] == 3


def test_caps_share_by_source_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import caps_share_by_source

    docs = pd.DataFrame({
        "source": ["w", "w"],
        "text": ["NASA sent A probe", "the END"],
    })
    got = (
        caps_share_by_source(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("source")
    )
    # tokens: NASA(caps) sent A(1 letter, no) probe | the END(caps)
    assert got.loc["w", "n_tokens"] == 6
    assert got.loc["w", "n_caps"] == 2
    assert got.loc["w", "caps_share"] == np.round(2 / 6, 6)


def test_dup_rate_by_source_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import dup_rate_by_source

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
        "source": ["w", "w", "w", "x"],
    })
    clusters = pd.DataFrame({
        "doc_id": pd.array([1, 2], dtype="int64"),
        "cluster_id": pd.array([1, 1], dtype="int64"),
    })
    got = (
        dup_rate_by_source(
            ray.data.from_pandas(clusters), ray.data.from_pandas(docs),
            n_buckets=2,
        )
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["w", "n_docs"] == 3
    assert got.loc["w", "n_clustered"] == 2
    assert got.loc["w", "n_removable"] == 1
    assert got.loc["w", "dup_share"] == np.round(1 / 3, 6)
    assert got.loc["x", "n_clustered"] == 0


def test_session_count_sensitivity_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import session_count_sensitivity

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:20:00",  # 1200 s gap
            "2024-01-01 01:20:00",                          # 3600 s gap
            "2024-01-01 00:00:00",
        ]),
    })
    got = (
        session_count_sensitivity(
            ray.data.from_pandas(ev), gaps_s=(900, 1800, 3600)
        )
        .to_pandas()
        .set_index("gap_s")
        .sort_index()
    )
    # gap 900: both gaps split -> 2 + 2 = 4 sessions
    # gap 1800: only the 3600 s gap splits -> 3
    # gap 3600: 3600 > 3600 false -> 2
    assert got.loc[900, "n_sessions"] == 4
    assert got.loc[1800, "n_sessions"] == 3
    assert got.loc[3600, "n_sessions"] == 2
    assert (got["n_users"] == 2).all()


def test_top_word_coverage_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import top_word_coverage

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2], dtype="int64"),
        "text": ["a a a b b c", "a d"],
    })
    got = (
        top_word_coverage(
            ray.data.from_pandas(docs), ks=(1, 2), n_buckets=2
        )
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    # counts: a 4, b 2, c 1, d 1 ; total 8
    assert got.loc[1, "n_tokens_top"] == 4
    assert got.loc[1, "coverage"] == 0.5
    assert got.loc[2, "n_tokens_top"] == 6
    assert got.loc[2, "coverage"] == 0.75


def test_last_seen_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import last_seen_hist

    ev = pd.DataFrame({
        "user_id": [1, 1, 2, 3],
        "ts": pd.to_datetime([
            "2024-01-05 00:00", "2024-03-01 00:00",   # user1 last Mar
            "2024-01-20 00:00",                        # user2 last Jan
            "2024-03-09 00:00",                        # user3 last Mar
        ]),
    })
    got = (
        last_seen_hist(ray.data.from_pandas(ev))
        .to_pandas()
        .set_index("month")
        .sort_index()
    )
    assert got.loc["2024-01", "n_users_last_seen"] == 1
    assert got.loc["2024-03", "n_users_last_seen"] == 2
    assert got.loc["2024-03", "share"] == np.round(2 / 3, 6)


def test_question_share_by_role_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import question_share_by_role

    tr = pd.DataFrame({
        "role": ["user", "user", "assistant"],
        "text": ["really?", "do it", "done."],
    })
    got = (
        question_share_by_role(ray.data.from_pandas(tr))
        .to_pandas()
        .set_index("role")
        .sort_index()
    )
    assert got.loc["user", "n_questions"] == 1
    assert got.loc["user", "question_share"] == 0.5
    assert got.loc["assistant", "question_share"] == 0.0


def test_nonascii_by_lang_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import nonascii_by_lang

    docs = pd.DataFrame({
        "lang": ["zh", "en"],
        "text": ["的是ab", "plain"],
    })
    got = (
        nonascii_by_lang(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert got.loc["zh", "n_chars"] == 4
    assert got.loc["zh", "n_nonascii"] == 2
    assert got.loc["zh", "nonascii_share"] == 0.5
    assert got.loc["en", "nonascii_share"] == 0.0


def test_word_entropy_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import word_entropy

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2], dtype="int64"),
        "text": ["a b", "a b"],   # uniform over 2 words -> H = 1 bit
    })
    got = word_entropy(ray.data.from_pandas(docs)).to_pandas()
    assert got.loc[0, "n_tokens"] == 4
    assert got.loc[0, "vocab_size"] == 2
    assert got.loc[0, "word_entropy"] == 1.0


def test_status_priority_matrix_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import status_priority_matrix

    pq.write_table(pa.table({
        "o_orderstatus": pa.array(["O", "F", "O"]),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "3-MEDIUM"]),
    }), str(tmp_path / "orders.parquet"))
    got = (
        status_priority_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["o_orderpriority", "o_orderstatus"])
        .sort_index()
    )
    assert got.loc[("1-URGENT", "O"), "share_in_priority"] == 0.5
    assert got.loc[("1-URGENT", "F"), "n_orders"] == 1
    assert got.loc[("3-MEDIUM", "O"), "share_in_priority"] == 1.0


def test_value_sign_audit_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import value_sign_audit

    ev = pd.DataFrame({
        "event_type": ["a", "a", "a", "a", "b"],
        "value": [1.0, 0.0, -2.5, None, 3.0],
    })
    got = (
        value_sign_audit(ray.data.from_pandas(ev))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert got.loc["a", "n_valued"] == 3
    assert got.loc["a", "n_zero"] == 1
    assert got.loc["a", "n_negative"] == 1
    assert got.loc["a", "neg_share"] == np.round(1 / 3, 6)
    assert got.loc["b", "neg_share"] == 0.0


def test_short_doc_share_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import short_doc_share

    docs = pd.DataFrame({
        "source": ["w", "w", "x"],
        "text": ["a b", "one two three four five six", "tiny"],
    })
    got = (
        short_doc_share(ray.data.from_pandas(docs), min_tokens=5)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["w", "n_short"] == 1
    assert got.loc["w", "short_share"] == 0.5
    assert got.loc["x", "short_share"] == 1.0


def test_dim_variance_planted(ray_session):
    from tcx2graph_jl_ray.stages.ann import dim_variance

    emb = pd.DataFrame({
        "embedding": [[0.0, 5.0], [2.0, 5.0], [4.0, 5.0]],
    })
    got = (
        dim_variance(ray.data.from_pandas(emb), n_buckets=2)
        .to_pandas()
        .set_index("dim")
        .sort_index()
    )
    # dim1: values 0,2,4 -> pop var 8/3 ; dim2: constant -> 0
    assert got.loc[1, "variance"] == np.round(8 / 3, 6)
    assert got.loc[2, "variance"] == 0.0
    assert (got["n_vecs"] == 3).all()


def test_pair_len_ratio_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import pair_len_ratio_hist

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        "text": ["a b c d", "a b", "a b c d"],   # 4, 2, 4 tokens
    })
    pairs = pd.DataFrame({
        "a": pd.array([1, 1], dtype="int64"),
        "b": pd.array([2, 3], dtype="int64"),
    })
    got = (
        pair_len_ratio_hist(
            ray.data.from_pandas(pairs), ray.data.from_pandas(docs),
            n_buckets=2,
        )
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    # pair (1,2): 2/4 -> bin 5 ; pair (1,3): 4/4 -> clip bin 9
    assert list(got.index) == [5, 9]
    assert got.loc[5, "n_pairs"] == 1
    assert got.loc[9, "share"] == 0.5
    assert got.loc[5, "lo"] == 0.5


def test_bigram_cond_entropy_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import bigram_cond_entropy

    # bigrams: (a,b) x2, (a,c) x2 -> H(bigram)=1; prefix always 'a' ->
    # H(w1)=0 -> cond = 1
    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2], dtype="int64"),
        "text": ["a b", "a c a b a c"],
    })
    got = bigram_cond_entropy(ray.data.from_pandas(docs)).to_pandas()
    # doc2 bigrams: (a,c),(c,a),(a,b),(b,a),(a,c); doc1: (a,b)
    # counts: (a,b)2 (a,c)2 (c,a)1 (b,a)1, t=6
    import math
    c = np.array([2.0, 2.0, 1.0, 1.0])
    t = 6.0
    h_bi = math.log2(t) - float((c * np.log2(c)).sum()) / t
    w1 = np.array([4.0, 1.0, 1.0])   # a:4, c:1, b:1
    h_w1 = math.log2(t) - float((w1 * np.log2(w1)).sum()) / t
    assert got.loc[0, "n_bigrams"] == 6
    assert got.loc[0, "bigram_entropy"] == np.round(h_bi, 6)
    assert got.loc[0, "cond_entropy"] == np.round(h_bi - h_w1, 6)


def test_ship_before_order_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import ship_before_order
    import datetime

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], type=pa.int64()),
        "l_shipdate": pa.array([
            datetime.date(2024, 1, 5),
            datetime.date(2023, 12, 31),   # before order date -> bad
            datetime.date(2024, 2, 1),
        ]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_orderdate": pa.array([
            datetime.date(2024, 1, 1), datetime.date(2024, 2, 1),
        ]),
    }), str(tmp_path / "orders.parquet"))
    got = ship_before_order(str(tmp_path), n_buckets=2).to_pandas()
    assert got.loc[0, "n_lines"] == 3
    assert got.loc[0, "n_bad"] == 1
    assert got.loc[0, "bad_share"] == np.round(1 / 3, 6)


def test_payload_size_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.multimodal import payload_size_hist

    docs = pd.DataFrame({
        # doc 0 -> image, 3 -> image, 1 -> audio
        "doc_id": pd.array([0, 3, 1], dtype="int64"),
        "text": ["abc", "abcdefg", "xy"],   # 3, 7, 2 bytes
    })
    got = (
        payload_size_hist(ray.data.from_pandas(docs))
        .to_pandas()
        .set_index(["modality", "bin"])
        .sort_index()
    )
    # image: 3 bytes -> bin 2 ; 7 bytes -> bin 3 ; audio: 2 -> bin 1
    assert got.loc[("image", 2), "n_payloads"] == 1
    assert got.loc[("image", 3), "total_bytes"] == 7
    assert got.loc[("image", 2), "share_in_modality"] == 0.5
    assert got.loc[("audio", 1), "share_in_modality"] == 1.0
    assert got.loc[("image", 3), "min_bytes"] == 7


def test_type_first_seen_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import type_first_seen

    ev = pd.DataFrame({
        "event_type": ["a", "a", "b"],
        "ts": pd.to_datetime([
            "2024-01-05 00:00", "2024-03-01 00:00", "2024-02-10 00:00",
        ]),
    })
    got = (
        type_first_seen(ray.data.from_pandas(ev))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert got.loc["a", "first_month"] == "2024-01"
    assert got.loc["a", "last_month"] == "2024-03"
    assert got.loc["b", "n_events"] == 1


def test_customer_repeat_rate_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import customer_repeat_rate

    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 3, 3, 3], type=pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    got = customer_repeat_rate(str(tmp_path), n_buckets=2).to_pandas()
    assert got.loc[0, "n_customers"] == 3
    assert got.loc[0, "n_repeat"] == 2
    assert got.loc[0, "repeat_share"] == np.round(2 / 3, 6)


def test_connectivity_ratio_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import connectivity_ratio

    # components: {a,b,c} and {x,y} -> n=5, pairs = 3*2 + 2*1 = 8
    # share = 8 / (5*4) = 0.4
    edges = pd.DataFrame({
        "src": ["a", "b", "x"],
        "dst": ["b", "c", "y"],
        "n_convs": [1, 1, 1],
    })
    got = connectivity_ratio(ray.data.from_pandas(edges)).to_pandas()
    assert got.loc[0, "n_entities"] == 5
    assert got.loc[0, "n_components"] == 2
    assert got.loc[0, "reachable_pair_share"] == 0.4


def test_docs_missing_sql_matches(ray_session, tmp_path):
    import duckdb
    from tcx2graph_jl_ray.stages.clean import missing_sql_for, missing_stats

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        "text": ["a", None, "c"],
        "lang": ["en", "en", None],
    })
    got = (
        missing_stats(ray.data.from_pandas(docs),
                      ["doc_id", "text", "lang"])
        .to_pandas()
        .sort_values("column")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(
        missing_sql_for("documents", ["doc_id", "text", "lang"])
    ).df().sort_values("column").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)],
        check_exact=True, check_dtype=False,
    )
