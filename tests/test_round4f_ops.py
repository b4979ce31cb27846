"""Planted tests for the round-4f operator batch (user growth, order gaps,
attribution, per-doc keywords, readability, directed triads, HITS,
per-user anomalies)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def test_user_growth_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import user_growth

    # u1 first on d1 (active d1,d2); u2 first on d1; u3 first on d2; one
    # whale user (u9) with many same-day events must count once per day
    rows = [
        (1, "2024-01-01 10:00"), (1, "2024-01-01 11:00"),
        (1, "2024-01-02 09:00"),
        (2, "2024-01-01 23:59"),
        (3, "2024-01-02 00:00"),
    ]
    rows += [(9, f"2024-01-02 03:{m:02d}") for m in range(50)]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array([r[0] for r in rows], dtype="int64"),
        "ts": pd.to_datetime([r[1] for r in rows]),
    })
    got = (
        user_growth(ray.data.from_pandas(df).repartition(4))
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    assert list(got["day"]) == ["2024-01-01", "2024-01-02"]
    assert list(got["new_users"]) == [2, 2]      # {1,2} then {3,9}
    assert list(got["active_users"]) == [2, 3]   # {1,2} then {1,3,9}
    assert list(got["cum_users"]) == [2, 4]
    assert got["new_users"].dtype == "int64"
    assert got["cum_users"].dtype == "int64"


def test_user_growth_empty(ray_session):
    from tcx2graph_jl_ray.stages.window import user_growth

    df = pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
    })
    got = user_growth(ray.data.from_pandas(df))
    assert isinstance(got, pd.DataFrame) and len(got) == 0
    assert list(got.columns) == ["day", "new_users", "active_users",
                                 "cum_users"]


def test_order_gaps_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import order_gaps

    df = pd.DataFrame({
        "o_orderkey": pd.array([11, 10, 12, 20], dtype="int64"),
        "o_custkey": pd.array([1, 1, 1, 2], dtype="int64"),
        "o_orderstatus": ["F"] * 4,
        # same-day tie broken by orderkey; 2-day gap to the third order
        "o_orderdate": pd.to_datetime(
            ["2024-03-01", "2024-03-01", "2024-03-03", "2024-05-01"]
        ),
        "o_totalprice": [9.99, 10.00, 10.00, 5.00],
        "o_orderpriority": ["1-URGENT"] * 4,
    })
    df.to_parquet(tmp_path / "orders.parquet", index=False)
    got = (
        order_gaps(str(tmp_path))
        .to_pandas()
        .sort_values(["o_custkey", "order_rank"])
        .reset_index(drop=True)
    )
    # cust 1 order: key 10 (10.00) -> 11 (9.99) -> 12 (10.00)
    assert list(got["o_orderkey"]) == [10, 11, 12, 20]
    assert list(got["order_rank"]) == [1, 2, 3, 1]
    assert list(got["gap_days"]) == [-1, 0, 2, -1]
    # 10.00 sets the record; 9.99 doesn't; the equal 10.00 is NOT a record
    assert list(got["record_price"]) == [1, 0, 0, 1]
    assert got["gap_days"].dtype == "int64"


def test_first_touch_attribution_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import first_touch_attribution

    rows = [
        # u1: view exactly at the 7-day boundary (IN window), click later;
        # purchase credits the view
        (1, "2024-01-01 00:00:00", "view", None),
        (1, "2024-01-05 00:00:00", "click", None),
        (1, "2024-01-08 00:00:00", "purchase", 10.00),
        # u2: only touch is OUTSIDE the window -> direct
        (2, "2024-01-01 00:00:00", "view", None),
        (2, "2024-01-09 00:00:01", "purchase", 3.50),
        # u3: purchase with no prior events at all -> direct (null value)
        (3, "2024-02-01 00:00:00", "purchase", None),
    ]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array([r[0] for r in rows], dtype="int64"),
        "ts": pd.to_datetime([r[1] for r in rows]),
        "event_type": [r[2] for r in rows],
        "value": [r[3] for r in rows],
    })
    got = (
        first_touch_attribution(ray.data.from_pandas(df).repartition(3))
        .to_pandas().sort_values("first_touch").reset_index(drop=True)
    )
    want = pd.DataFrame({
        "first_touch": ["direct", "view"],
        "n_conversions": pd.array([2, 1], dtype="int64"),
        "value": [3.50, 10.00],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_doc_keywords_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import doc_keywords

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        # "rare" appears in one doc, "shared" in all three
        "text": ["rare shared shared", "shared only two", None],
        "lang": ["en"] * 3,
        "source": ["a", "a", "b"],
        "n_chars": pd.array([18, 15, 0], dtype="int64"),
    })
    got = (
        doc_keywords(ray.data.from_pandas(df).repartition(2), k_top=2)
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )
    # n_docs = 2 (null text dropped). doc 1: rare tf=1 df=1 -> 2.0;
    # shared tf=2 df=2 -> 2.0; tie broken by term ('rare' < 'shared')
    d1 = got[got["doc_id"] == 1]
    assert list(d1["term"]) == ["rare", "shared"]
    assert list(d1["score"]) == [2.0, 2.0]
    assert list(d1["rank"]) == [1, 2]
    d2 = got[got["doc_id"] == 2]
    # doc 2: only/two tf=1 df=1 -> 2.0; shared tf=1 df=2 -> 1.0
    assert list(d2["term"]) == ["only", "two"]
    assert 3 not in set(got["doc_id"])


def test_readability_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import readability

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        # doc 1: 4 words, "Hi there. Go now!" -> 2 sentence runs,
        # syllables: hi(1) there(2: e+e... vowel runs 'e','e') go(1) now(1)
        "text": ["Hi there. Go now!", "", None],
        "lang": ["en"] * 3,
        "source": ["a"] * 3,
        "n_chars": pd.array([17, 0, 0], dtype="int64"),
    })
    got = readability(ray.data.from_pandas(df)).to_pandas()
    assert list(got["doc_id"]) == [1]          # empty + null drop
    assert int(got["n_words"].iloc[0]) == 4
    assert int(got["n_sentences"].iloc[0]) == 2
    syl = int(got["n_syllables"].iloc[0])
    want = np.round(206.835 - 1.015 * (4 / 2) - 84.6 * (syl / 4), 6)
    assert got["flesch"].iloc[0] == want


def test_directed_triads_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import directed_triads

    edges = [("a", "b"), ("b", "c"), ("a", "c"),   # transitive triangle
             ("d", "e"), ("e", "f"), ("f", "d"),   # 3-cycle
             ("a", "b"),                           # duplicate drops
             ("g", "g")]                           # self-loop drops
    df = pd.DataFrame({
        "from_entity": [e[0] for e in edges],
        "to_entity": [e[1] for e in edges],
        "n": pd.array([1] * len(edges), dtype="int64"),
    })
    got = directed_triads(
        ray.data.from_pandas(df).repartition(3)
    ).to_pandas().iloc[0]
    assert got["n_edges"] == 6
    assert got["n_wedges"] == 4        # abc + 3 rotations of def
    assert got["n_transitive"] == 1
    assert got["n_cyclic"] == 1


def test_hits_dual_paths_agree(ray_session):
    from tcx2graph_jl_ray.stages.analysis import entity_hits

    rng = np.random.default_rng(7)
    n_nodes = 30
    src = rng.integers(0, n_nodes, 200)
    dst = rng.integers(0, n_nodes, 200)
    k = src != dst
    df = pd.DataFrame({
        "from_entity": [f"e{i}" for i in src[k]],
        "to_entity": [f"e{i}" for i in dst[k]],
        "n": pd.array(rng.integers(1, 5, int(k.sum())), dtype="int64"),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    small = entity_hits(ds).to_pandas().sort_values("entity_id")
    big = entity_hits(ds, small_graph_threshold=0).to_pandas().sort_values(
        "entity_id"
    )
    pd.testing.assert_frame_equal(
        small.reset_index(drop=True), big.reset_index(drop=True)
    )
    # authorities and hubs are L1-normalized distributions
    assert abs(small["authority"].sum() - 1.0) < 1e-4
    assert abs(small["hub"].sum() - 1.0) < 1e-4


def test_user_value_anomalies_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import user_value_anomalies

    # user 1: sixteen 10.00s and one 100.00 -> a lone spike among n-1
    # constants scores z = sqrt(n-1) = 4 > 3 (at n=10 it is EXACTLY 3 and
    # the strict inequality excludes it)
    # user 2: constant values -> zero variance, nothing flags
    # user 3: too few events (min_n) -> skipped entirely
    vals = [10.0] * 16 + [100.0] + [5.0] * 6 + [42.0]
    users = [1] * 17 + [2] * 6 + [3]
    df = pd.DataFrame({
        "event_id": np.arange(len(vals), dtype="int64"),
        "user_id": pd.array(users, dtype="int64"),
        "value": vals,
    })
    got = user_value_anomalies(
        ray.data.from_pandas(df).repartition(3), z=3.0, min_n=5
    ).to_pandas()
    assert len(got) == 1
    assert int(got["user_id"].iloc[0]) == 1
    assert got["value"].iloc[0] == 100.0
    assert int(got["n_user"].iloc[0]) == 17


def test_power_users_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import power_users

    # 10 users: counts 1..10; p50 of counts = 5.5 -> users with >= 5.5
    rows = []
    for u in range(1, 11):
        rows += [u] * u
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array(rows, dtype="int64"),
    })
    got = power_users(
        ray.data.from_pandas(df).repartition(4), q=0.5
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    assert list(got["user_id"]) == [6, 7, 8, 9, 10]
    assert list(got["n_events"]) == [6, 7, 8, 9, 10]
    assert (got["threshold"] == 5.5).all()


def test_cohort_ltv_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import cohort_ltv

    df = pd.DataFrame({
        "o_orderkey": pd.array([1, 2, 3, 4], dtype="int64"),
        "o_custkey": pd.array([1, 1, 2, 3], dtype="int64"),
        "o_orderstatus": ["F"] * 4,
        # cust 1 acquired Jan (second order Mar still counts to Jan);
        # cust 2 Jan; cust 3 Feb
        "o_orderdate": pd.to_datetime(
            ["2024-01-05", "2024-03-01", "2024-01-20", "2024-02-02"]
        ),
        "o_totalprice": [10.00, 20.01, 5.00, 7.77],
        "o_orderpriority": ["1-URGENT"] * 4,
    })
    df.to_parquet(tmp_path / "orders.parquet", index=False)
    got = cohort_ltv(str(tmp_path)).to_pandas().sort_values(
        "cohort_month"
    ).reset_index(drop=True)
    assert list(got["cohort_month"]) == ["2024-01", "2024-02"]
    assert list(got["n_customers"]) == [2, 1]
    assert list(got["revenue"]) == [35.01, 7.77]
    # Jan avg = 3501 cents / 2 = 1750.5 -> half-up 1751 cents = 17.51
    assert list(got["avg_ltv"]) == [17.51, 7.77]


def test_label_propagation_dual_paths_agree(ray_session):
    from tcx2graph_jl_ray.stages.analysis import label_propagation

    rng = np.random.default_rng(11)
    nodes = [f"n{i}" for i in range(40)]
    src = rng.integers(0, 40, 120)
    dst = rng.integers(0, 40, 120)
    k = src != dst
    cooc = pd.DataFrame({
        "src": [nodes[i] for i in src[k]],
        "dst": [nodes[i] for i in dst[k]],
    })
    ents = pd.DataFrame({
        "entity_id": nodes,
        "kb_region": [("R" + str(i % 3)) if i < 8 else None
                      for i in range(40)],
    })
    ents_ds = ray.data.from_pandas(ents).repartition(3)
    cooc_ds = ray.data.from_pandas(cooc).repartition(3)

    def norm(ds):
        return (
            ds.to_pandas()
            .sort_values(["entity_id"]).reset_index(drop=True)
        )

    fast = norm(label_propagation(ents_ds, cooc_ds, rounds=2))
    slow = norm(label_propagation(
        ents_ds, cooc_ds, rounds=2, small_graph_threshold=0
    ))
    pd.testing.assert_frame_equal(fast, slow)
    assert (fast["round"] == 0).sum() == 8
    assert (fast["round"] >= 1).any()


def test_prefix_pairs_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import prefix_pairs

    base = "x" * 30 + "ab"                      # exactly min_len = 32
    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
        "text": [
            base,                               # 1: prefix of 2 and 3
            base + " more words here",          # 2: also prefix of 3
            base + " more words here tail",     # 3
            base,                               # 4: equal to 1 -> 1<4 once
            "y" * 40,                           # 5: unrelated block
        ],
        "lang": ["en"] * 5,
        "source": ["a"] * 5,
        "n_chars": pd.array([32, 48, 53, 32, 40], dtype="int64"),
    })
    got = (
        prefix_pairs(ray.data.from_pandas(df).repartition(3), min_len=32)
        .to_pandas().sort_values(["sub_id", "sup_id"]).reset_index(drop=True)
    )
    pairs = set(zip(got["sub_id"], got["sup_id"]))
    assert pairs == {(1, 2), (1, 3), (1, 4), (2, 3), (4, 2), (4, 3)}
    assert (got.loc[got["sub_id"] == 1, "sub_len"] == 32).all()


def test_basket_lift_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import basket_lift

    # 4 baskets; parts 10 & 20 co-occur in 3 -> min_support met;
    # part 30 appears in 2 baskets but never pairs 3x
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20), (3, 10),  # dup line in same order dedupes
        (4, 30),
    ]
    df = pd.DataFrame({
        "l_orderkey": pd.array([r[0] for r in rows], dtype="int64"),
        "l_partkey": pd.array([r[1] for r in rows], dtype="int64"),
    })
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    got = basket_lift(str(tmp_path), min_support=3).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["part_a"], r["part_b"]) == (10, 20)
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (3, 3, 3)
    # lift = n_ab*N / (n_a*n_b) = 3*4/9
    assert r["lift"] == np.round(12.0 / 9.0, 6)
    assert r["conf_ab"] == 1.0 and r["conf_ba"] == 1.0


def test_interarrival_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import interarrival_stats

    rows = [
        # u1 clicks at t=0s, 10s, 13s -> gaps 10s, 3s
        (1, "click", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 00:00:10"),
        (1, "click", "2024-01-01 00:00:13"),
        # u2 single click -> no gap; u2 views 0s and 4s -> gap 4s
        (2, "click", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 00:01:00"),
        (2, "view", "2024-01-01 00:01:04"),
    ]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array([r[0] for r in rows], dtype="int64"),
        "event_type": [r[1] for r in rows],
        "ts": pd.to_datetime([r[2] for r in rows]),
    })
    got = interarrival_stats(
        ray.data.from_pandas(df).repartition(3)
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    M = 1_000_000
    assert list(got["event_type"]) == ["click", "view"]
    assert list(got["n_gaps"]) == [2, 1]
    assert list(got["min_gap_us"]) == [3 * M, 4 * M]
    assert list(got["max_gap_us"]) == [10 * M, 4 * M]
    # click avg = 6.5s -> half-up 6500001? no: (2*13M+2)//4 = 6500000 (int us)
    assert list(got["avg_gap_us"]) == [(2 * 13 * M + 2) // 4, 4 * M]


def test_response_latency_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import response_latency

    rows = [
        # c1: user@0 -> assistant@5s (lat 5s); tool between doesn't count;
        # user@10s -> assistant@12s (lat 2s); trailing user has no answer
        ("c1", 0, "user", "2024-01-01 00:00:00"),
        ("c1", 1, "tool", "2024-01-01 00:00:01"),
        ("c1", 2, "assistant", "2024-01-01 00:00:05"),
        ("c1", 3, "user", "2024-01-01 00:00:10"),
        ("c1", 4, "assistant", "2024-01-01 00:00:12"),
        ("c1", 5, "user", "2024-01-01 00:00:20"),
        # c2: assistant-first then lone user -> no responses at all
        ("c2", 0, "assistant", "2024-01-01 00:00:00"),
        ("c2", 1, "user", "2024-01-01 00:00:03"),
    ]
    df = pd.DataFrame({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pd.array([r[1] for r in rows], dtype="int32"),
        "role": [r[2] for r in rows],
        "ts": pd.to_datetime([r[3] for r in rows]),
    })
    got = response_latency(
        ray.data.from_pandas(df).repartition(3)
    ).to_pandas()
    assert list(got["conv_id"]) == ["c1"]
    M = 1_000_000
    r = got.iloc[0]
    assert r["n_responses"] == 2
    assert r["min_latency_us"] == 2 * M
    assert r["max_latency_us"] == 5 * M
    # mean 3.5s -> half-up on us: (2*7M + 2)//4 = 3500000 + 0 (exact .5 on
    # us scale never occurs here; value is 3.5M us exactly)
    assert r["avg_latency_us"] == 3_500_000


def test_reciprocity_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import reciprocity

    edges = [("a", "b"), ("b", "a"),      # reciprocated pair
             ("a", "c"),                  # one-way
             ("c", "c")]                  # self-loop drops
    df = pd.DataFrame({
        "from_entity": [e[0] for e in edges],
        "to_entity": [e[1] for e in edges],
        "n": pd.array([1] * len(edges), dtype="int64"),
    })
    got = reciprocity(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas().sort_values("entity_id").reset_index(drop=True)
    assert list(got["entity_id"]) == ["a", "b"]
    assert list(got["out_deg"]) == [2, 1]
    assert list(got["n_recip"]) == [1, 1]
    assert list(got["reciprocity"]) == [0.5, 1.0]


def test_hapax_ratio_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import hapax_ratio

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2], dtype="int64"),
        # source a: words {x:2, y:1, z:1} -> hapax 2 of 3
        "text": ["x y x", "z"],
        "lang": ["en"] * 2,
        "source": ["a", "a"],
        "n_chars": pd.array([5, 1], dtype="int64"),
    })
    got = hapax_ratio(ray.data.from_pandas(df).repartition(2)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["n_hapax"], r["n_distinct_words"]) == (2, 3)
    assert r["hapax_ratio"] == np.round(2 / 3, 6)


def test_role_stats_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import role_stats

    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pd.array([0, 1, 0], dtype="int32"),
        "role": ["user", "assistant", "user"],
        "text": ["a b c", "d e", "f g h i"],
    })
    got = role_stats(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas().sort_values("role").reset_index(drop=True)
    assert list(got["role"]) == ["assistant", "user"]
    assert list(got["n_turns"]) == [1, 2]
    assert list(got["n_convs"]) == [1, 2]
    assert list(got["n_tokens"]) == [2, 7]
    # user avg = 7/2 = 3.5 -> half-up 4
    assert list(got["avg_tokens"]) == [2, 4]


def test_dup_degree_hist_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import dup_degree_hist

    pairs = pd.DataFrame({
        "a": pd.array([1, 1, 2], dtype="int64"),
        "b": pd.array([2, 3, 3], dtype="int64"),
    })
    got = dup_degree_hist(
        ray.data.from_pandas(pairs).repartition(2)
    ).to_pandas().sort_values("degree").reset_index(drop=True)
    # every doc participates in exactly 2 pairs -> one histogram row
    assert list(got["degree"]) == [2]
    assert list(got["n_docs"]) == [3]


def test_busy_minutes_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import busy_minutes

    ts = (["2024-01-01 10:00:%02d" % s for s in range(5)]  # 5 in 10:00
          + ["2024-01-01 10:01:00"] * 3                    # 3 in 10:01
          + ["2024-01-01 09:59:59"] * 3)                   # 3 in 09:59 (tie)
    df = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype="int64"),
        "ts": pd.to_datetime(ts),
    })
    got = busy_minutes(
        ray.data.from_pandas(df).repartition(3), k=2
    ).to_pandas()
    assert list(got["minute"]) == ["2024-01-01 10:00", "2024-01-01 09:59"]
    assert list(got["n_events"]) == [5, 3]
    assert list(got["rank"]) == [1, 2]


def test_analytics_pipeline_end_to_end(ray_session, tmp_path):
    from tcx2graph_jl_ray.pipelines.analytics import run_analytics_pipeline

    out = str(tmp_path / "mart")
    s1 = run_analytics_pipeline("/root/testdata/sf0.001", out, n_parts=4)
    assert s1["rows"]["sessions"] > 0
    assert s1["rows"]["growth"] > 0
    assert s1["rows"]["busy_minutes"] > 0
    import pyarrow.parquet as pq
    g = pq.read_table(f"{out}/growth.parquet").to_pandas()
    assert list(g.columns) == ["day", "new_users", "active_users",
                               "cum_users"]
    # resume: a second run over identical input writes nothing new for the
    # manifested row-scale tables (manifest skips finished partitions)
    s2 = run_analytics_pipeline("/root/testdata/sf0.001", out, n_parts=4)
    assert s2["rows"]["sessions"] == s1["rows"]["sessions"]
    assert s2["fingerprint"] == s1["fingerprint"]


def test_graph_summary_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import graph_summary

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "b"), ("c", "c")]
    df = pd.DataFrame({
        "from_entity": [e[0] for e in edges],
        "to_entity": [e[1] for e in edges],
        "n": pd.array([1] * len(edges), dtype="int64"),
    })
    got = graph_summary(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas().iloc[0]
    assert got["n_nodes"] == 3 and got["n_edges"] == 3
    assert got["max_out_degree"] == 2
    assert got["density"] == np.round(3 / 6, 6)


def test_monthly_mix_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import monthly_type_mix

    ts = ["2024-01-05", "2024-01-06", "2024-01-07", "2024-02-01"]
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype="int64"),
        "ts": pd.to_datetime(ts),
        "event_type": ["click", "click", "view", "view"],
    })
    got = monthly_type_mix(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas().sort_values(["month", "event_type"]).reset_index(drop=True)
    assert list(got["n_events"]) == [2, 1, 1]
    assert list(got["share"]) == [np.round(2 / 3, 6), np.round(1 / 3, 6), 1.0]


def test_session_overlap_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import session_overlap_join

    # u1 session spans 10:00-12:30 (crosses 3 hourly cells);
    # u2 session 12:00-12:10 overlaps it (10 min); u3 at 15:00 overlaps
    # nothing; same-user overlap never happens by construction
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:20:00"),
        (1, "2024-01-01 10:45:00"), (1, "2024-01-01 11:10:00"),
        (1, "2024-01-01 11:40:00"), (1, "2024-01-01 12:05:00"),
        (1, "2024-01-01 12:30:00"),
        (2, "2024-01-01 12:00:00"), (2, "2024-01-01 12:10:00"),
        (3, "2024-01-01 15:00:00"),
    ]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array([r[0] for r in rows], dtype="int64"),
        "ts": pd.to_datetime([r[1] for r in rows]),
    })
    got = session_overlap_join(
        ray.data.from_pandas(df).repartition(3)
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["user_a"], r["user_b"]) == (1, 2)
    assert r["overlap_us"] == 10 * 60 * 1_000_000


def test_collocations_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import collocations

    # "new york" always adjacent (lift high); "of the" adjacent but both
    # words everywhere (lift ~ 1)
    texts = ["new york of the"] * 5 + ["of it the end"] * 5
    df = pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="int64"),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["a"] * len(texts),
        "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
    })
    got = collocations(
        ray.data.from_pandas(df).repartition(3), min_n=5, k_top=3
    ).to_pandas()
    assert list(got["rank"]) == [1, 2, 3]
    r1 = got.iloc[0]
    # N = 40 tokens; new:5 york:5 ab:5 -> lift = 5*40/25 = 8
    assert (r1["w1"], r1["w2"]) == ("new", "york")
    assert r1["lift"] == 8.0


def test_dup_sentences_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import dup_sentences

    texts = [
        "Unique opening. All rights reserved. Something else!",
        "Another doc here. All rights reserved.",
        "all rights reserved. Totally different? All rights reserved.",
        None,
    ]
    df = pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="int64"),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["a"] * len(texts),
        "n_chars": pd.array(
            [len(t) if t else 0 for t in texts], dtype="int64"
        ),
    })
    got = dup_sentences(
        ray.data.from_pandas(df).repartition(2), min_docs=2, k_top=5
    ).to_pandas()
    # "all rights reserved" reaches 3 docs (doc 2's double counts once)
    assert got.iloc[0]["sentence"] == "all rights reserved"
    assert got.iloc[0]["n_docs"] == 3
    assert (got["n_docs"] >= 2).all()
    assert len(got) == 1


def test_type_affinity_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import type_affinity

    # 4 users: u1 {a,b}, u2 {a,b}, u3 {a}, u4 {b} -> n_a=3, n_b=3, both=2
    rows = [(1, "a"), (1, "b"), (1, "a"),
            (2, "a"), (2, "b"), (3, "a"), (4, "b")]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array([r[0] for r in rows], dtype="int64"),
        "event_type": [r[1] for r in rows],
    })
    got = type_affinity(
        ray.data.from_pandas(df).repartition(3)
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert (r["n_both"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["lift"] == np.round(2 * 4 / 9, 6)


def test_daily_autocorr_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import daily_autocorr

    # type "up": counts 1,2,3,4,5 over 5 days -> autocorr 1.0
    # type "gap": events on day 1 and day 3 only -> dense series 1,0,1 ->
    # pairs (1,0),(0,1): corr = -1.0
    rows = []
    for d in range(5):
        rows += [("up", f"2024-01-0{d+1}")] * (d + 1)
    rows += [("gap", "2024-02-01"), ("gap", "2024-02-03")]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "event_type": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows]),
    })
    got = daily_autocorr(
        ray.data.from_pandas(df).repartition(3)
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    assert list(got["event_type"]) == ["gap", "up"]
    assert list(got["n_days"]) == [3, 5]
    assert got.loc[1, "autocorr"] == 1.0
    assert got.loc[0, "autocorr"] == -1.0


def test_tool_chains_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import tool_chains

    rows = [
        # c1 tools in order: grep -> read -> grep (assistant between
        # doesn't break the chain)
        ("c1", 0, "user", None),
        ("c1", 1, "tool", "grep"),
        ("c1", 2, "assistant", None),
        ("c1", 3, "tool", "read"),
        ("c1", 4, "tool", "grep"),
        # c2: single tool, no chain
        ("c2", 0, "tool", "read"),
    ]
    df = pd.DataFrame({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pd.array([r[1] for r in rows], dtype="int32"),
        "role": [r[2] for r in rows],
        "tool": [r[3] for r in rows],
    })
    got = tool_chains(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas().sort_values(["tool_a", "tool_b"]).reset_index(drop=True)
    assert list(zip(got["tool_a"], got["tool_b"])) == [
        ("grep", "read"), ("read", "grep")
    ]
    assert list(got["n"]) == [1, 1]


def test_user_lifetimes_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import user_lifetimes

    rows = [(1, "2024-01-01 10:00"), (1, "2024-01-01 11:00"),
            (1, "2024-01-05 09:00"), (2, "2024-03-01 00:00")]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array([r[0] for r in rows], dtype="int64"),
        "ts": pd.to_datetime([r[1] for r in rows]),
    })
    got = user_lifetimes(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    assert list(got["first_day"]) == ["2024-01-01", "2024-03-01"]
    assert list(got["span_days"]) == [5, 1]
    assert list(got["active_days"]) == [2, 1]
    assert list(got["n_events"]) == [3, 1]


def test_stickiness_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import stickiness

    # day1: users {1,2}; day2: {1}; day9: {3} (outside day2's window)
    rows = [(1, "2024-01-01"), (2, "2024-01-01"), (1, "2024-01-02"),
            (3, "2024-01-09")]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "user_id": pd.array([r[0] for r in rows], dtype="int64"),
        "ts": pd.to_datetime([r[1] for r in rows]),
    })
    got = stickiness(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas()
    assert list(got["day"]) == ["2024-01-01", "2024-01-02", "2024-01-09"]
    assert list(got["n_dau"]) == [2, 1, 1]
    # trailing-7d AU: day1 {1,2}=2; day2 {1,2}=2; day9 {3}=1
    assert list(got["n_wau"]) == [2, 2, 1]
    assert list(got["stickiness"]) == [1.0, 0.5, 1.0]


def test_oov_rate_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import oov_rate

    # vocab top-2 = {"the" (4x), "cat" (3x)}; "zebra"/"xylophone" are OOV
    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        "text": ["the cat the cat", "the zebra xylophone cat the", ""],
        "lang": ["en"] * 3,
        "source": ["a"] * 3,
        "n_chars": pd.array([15, 27, 0], dtype="int64"),
    })
    got = oov_rate(
        ray.data.from_pandas(df).repartition(2), k_vocab=2
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [1, 2]       # empty doc drops
    assert list(got["n_oov"]) == [0, 2]
    assert got.loc[1, "oov_rate"] == np.round(2 / 5, 6)


def test_source_median_len_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import source_median_length

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
        "text": ["a b c", "a b c d e", "one two", None],
        "lang": ["en"] * 4,
        "source": ["s1", "s1", "s2", "s2"],
        "n_chars": pd.array([5, 9, 7, 0], dtype="int64"),
    })
    got = source_median_length(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas().sort_values("source").reset_index(drop=True)
    # s1: lengths {3,5} -> median 4.0; s2: {2} (null drops)
    assert list(got["median_len"]) == [4.0, 2.0]
    assert list(got["n_docs"]) == [2, 1]


def test_entity_trend_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import entity_trend

    # entity E mentioned 1x on day0, 3x on day2 -> slope = 1.0 per day
    me = pd.DataFrame({
        "conv_id": ["c1", "c2", "c2", "c2"],
        "turn_idx": pd.array([0, 0, 1, 2], dtype="int32"),
        "surface": ["e"] * 4,
        "norm": ["e"] * 4,
        "n_occurrences": pd.array([1] * 4, dtype="int64"),
        "entity_id": ["E"] * 4,
    })
    ts = pd.DataFrame({
        "conv_id": ["c1", "c2", "c2", "c2"],
        "turn_idx": pd.array([0, 0, 1, 2], dtype="int32"),
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-03 09:00",
                              "2024-01-03 10:00", "2024-01-03 11:00"]),
    })
    got = entity_trend(
        ray.data.from_pandas(me).repartition(2),
        ray.data.from_pandas(ts).repartition(2),
    ).to_pandas()
    assert list(got["entity_id"]) == ["E"]
    assert got["n_days"].iloc[0] == 2
    assert got["slope"].iloc[0] == 1.0


def test_hourly_entropy_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import hourly_entropy

    # "bot": all at hour 3 -> entropy 0, peak 3
    # "spread": 2 events at h1, 2 at h2 -> entropy 1.0, peak tie -> h1
    ts = (["2024-01-01 03:00"] * 4
          + ["2024-01-01 01:00", "2024-01-02 01:30",
             "2024-01-01 02:00", "2024-01-02 02:30"])
    df = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype="int64"),
        "event_type": ["bot"] * 4 + ["spread"] * 4,
        "ts": pd.to_datetime(ts),
    })
    got = hourly_entropy(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    assert list(got["event_type"]) == ["bot", "spread"]
    assert list(got["hour_entropy"]) == [0.0, 1.0]
    assert list(got["peak_hour"]) == [3, 1]


def test_value_by_type_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import value_by_type

    df = pd.DataFrame({
        "event_id": np.arange(4, dtype="int64"),
        "event_type": ["a", "a", "b", "b"],
        "value": [1.25, 0.75, 6.00, None],
    })
    got = value_by_type(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    assert list(got["n_valued"]) == [2, 1]
    assert list(got["value_sum"]) == [2.00, 6.00]
    assert list(got["share"]) == [0.25, 0.75]


def test_len_dup_corr_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import len_dup_corr

    # degrees: docs 1-3 each sit in 2 pairs, doc4 in none; lengths 4,3,2,1
    pairs = pd.DataFrame({
        "a": pd.array([1, 1, 2], dtype="int64"),
        "b": pd.array([2, 3, 3], dtype="int64"),
    })
    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
        "text": ["w w w w", "w w w", "w w", "w"],
        "lang": ["en"] * 4,
        "source": ["s"] * 4,
        "n_chars": pd.array([7, 5, 3, 1], dtype="int64"),
    })
    got = len_dup_corr(
        ray.data.from_pandas(pairs).repartition(2),
        ray.data.from_pandas(docs).repartition(2),
    ).to_pandas()
    x = np.array([4, 3, 2, 1], dtype=float)
    y = np.array([2, 2, 2, 0], dtype=float)
    want = np.corrcoef(x, y)[0, 1]
    assert got["n_docs"].iloc[0] == 4
    assert abs(got["corr"].iloc[0] - want) < 1e-6


def test_quality_by_source_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import quality_by_source

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3], dtype="int64"),
        "text": ["Ab c.", "x 9!", None],   # s1: 2 docs; null drops
        "lang": ["en"] * 3,
        "source": ["s1", "s1", "s1"],
        "n_chars": pd.array([5, 4, 0], dtype="int64"),
    })
    got = quality_by_source(
        ray.data.from_pandas(df).repartition(2)
    ).to_pandas()
    r = got.iloc[0]
    assert r["n_docs"] == 2 and r["n_tokens"] == 4
    assert r["n_chars"] == 9
    # punct: '.' and '!' = 2; digits: '9' = 1; upper: 'A' = 1
    assert r["punct_ratio"] == np.round(2 / 9, 6)
    assert r["digit_ratio"] == np.round(1 / 9, 6)
    assert r["upper_ratio"] == np.round(1 / 9, 6)
