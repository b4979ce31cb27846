"""Planted-truth tests for the round-2 window/docs/relational operators
(each also has sf0.001 oracle parity via tests/test_entry_contract.py)."""

import hashlib

import pandas as pd
import ray.data


def _events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["event_id"] = range(len(df))
    df["ts"] = pd.to_datetime(df["ts"])
    df["value"] = 1.0
    df["props"] = "{}"
    return ray.data.from_pandas(df)


def test_retention_cohorts_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import retention_cohorts

    ev = _events(
        [
            (1, "view", "2024-01-01 10:00"),
            (1, "view", "2024-01-01 23:00"),  # same day: one activity row
            (1, "view", "2024-01-03 01:00"),  # offset 2
            (2, "view", "2024-01-01 05:00"),
            (2, "view", "2024-01-02 05:00"),  # offset 1
            (3, "view", "2024-01-02 09:00"),  # its own cohort
        ]
    )
    out = retention_cohorts(ev, n_buckets=4).to_pandas()
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in out.itertuples(index=False)
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_conversion_funnel_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import conversion_funnel

    ev = _events(
        [
            (1, "signup", "2024-01-01 00:00"),
            (1, "purchase", "2024-01-02 00:00"),  # exactly 24h: counts (<=)
            (2, "signup", "2024-01-01 00:00"),
            (2, "purchase", "2024-01-02 00:01"),  # past 24h: no
            (3, "purchase", "2024-01-01 00:00"),  # purchase BEFORE signup
            (3, "signup", "2024-01-01 01:00"),
            (4, "signup", "2024-01-01 00:00"),   # never purchases
        ]
    )
    out = conversion_funnel(ev, n_buckets=4).to_pandas()
    assert out["n_first"].iloc[0] == 4
    assert out["n_converted"].iloc[0] == 1
    assert out["conversion_rate"].iloc[0] == 0.25


def test_event_type_trend_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import event_type_trend

    # type "up": daily counts 1,2,3 on days 0,1,2 -> slope 1, intercept 1
    rows = []
    for day, n in [(1, 1), (2, 2), (3, 3)]:
        rows += [(9, "up", f"2024-01-0{day} 12:00")] * n
    rows += [(9, "flat", "2024-01-01 00:00")]  # single day: excluded
    out = event_type_trend(_events(rows), n_buckets=4).to_pandas()
    assert set(out["event_type"]) == {"up"}
    r = out.iloc[0]
    assert r["n_days"] == 3 and r["slope"] == 1.0 and r["intercept"] == 1.0


def test_sliding_distinct_users_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import sliding_distinct_users

    ev = _events(
        [
            (1, "v", "2024-01-01 10:10"),
            (1, "v", "2024-01-01 10:50"),  # same hour, same user: once
            (1, "v", "2024-01-01 11:10"),  # next hour too: window 10 still 1
            (2, "v", "2024-01-01 11:30"),
        ]
    )
    out = sliding_distinct_users(ev, width_hours=2, n_buckets=4).to_pandas()
    got = {
        str(r.window_start): r.n_users for r in out.itertuples(index=False)
    }
    assert got["2024-01-01 10:00:00"] == 2  # covers 10:00-12:00: users 1,2
    assert got["2024-01-01 11:00:00"] == 2
    assert got["2024-01-01 09:00:00"] == 1  # covers 09:00-11:00: user 1 only


def test_chunk_documents_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import chunk_documents

    words = [f"w{i}" for i in range(10)]
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.array([1, 2], dtype="int64"),
                "text": [" ".join(words), ""],
            }
        )
    )
    out = chunk_documents(docs, chunk_tokens=4, stride=3).to_pandas()
    # starts at 0,3,6,9 -> lengths 4,4,4,1
    assert list(out["doc_id"].unique()) == [1]
    assert list(out["start_tok"]) == [0, 3, 6, 9]
    assert list(out["n_tokens"]) == [4, 4, 4, 1]
    first = " ".join(words[0:4])
    assert out["chunk_md5"].iloc[0] == hashlib.md5(first.encode()).hexdigest()


def test_pack_sequences_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import pack_sequences

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
                "text": ["a b c", "d e", None, "f g h i"],
            }
        )
    )
    # tokens: 3, 2, 0, 4 -> offsets 0, 3, 5, 5 -> seq (S=4): 0, 0, 1, 1
    out = (
        pack_sequences(docs, seq_tokens=4, chunk_docs=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["n_tokens"]) == [3, 2, 0, 4]
    assert list(out["offset"]) == [0, 3, 5, 5]
    assert list(out["seq_id"]) == [0, 0, 1, 1]


def test_winnow_neardup_pairs_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import winnow_neardup_pairs

    shared = " ".join(f"s{i}" for i in range(12))
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.array([1, 2, 3], dtype="int64"),
                "text": [
                    f"open one {shared} tail one",
                    f"other open {shared} different end",
                    "nothing shared here with those documents at all okay",
                ],
            }
        )
    )
    out = winnow_neardup_pairs(docs, min_shared=2, n_buckets=4).to_pandas()
    assert list(out["a"]) == [1] and list(out["b"]) == [2]
    assert out["n_shared"].iloc[0] >= 2


def test_copurchase_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import copurchase_pairs

    li = pd.DataFrame(
        {
            "l_orderkey": pd.array(
                [1, 1, 1, 2, 2, 3, 3, 3, 3], dtype="int64"
            ),
            "l_partkey": pd.array(
                [10, 20, 30, 10, 20, 10, 20, 20, 40], dtype="int64"
            ),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet")
    out = copurchase_pairs(str(tmp_path), min_support=2, n_buckets=4).to_pandas()
    got = {(r.part_a, r.part_b): r.n_orders for r in out.itertuples(index=False)}
    # (10,20) in orders 1,2,3 (dup 20 in order 3 counted once)
    assert got == {(10, 20): 3}


def test_length_deciles_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import length_deciles

    # 7 docs, 3 tiles -> NTILE sizes 3,2,2; lengths tie-broken by doc_id
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.array([0, 1, 2, 3, 4, 5, 6], dtype="int64"),
                "text": ["a", "a b", "a b", None, "a b c", "a", "a b c d"],
            }
        )
    )
    out = (
        length_deciles(docs, n_tiles=3, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    # global order by (n_tokens, doc_id): 3(0), 0(1), 5(1), 1(2), 2(2), 4(3), 6(4)
    # tiles: first 3 -> 1, next 2 -> 2, last 2 -> 3
    expect = {3: 1, 0: 1, 5: 1, 1: 2, 2: 2, 4: 3, 6: 3}
    got = dict(zip(out["doc_id"], out["tile"]))
    assert got == expect


def test_bfs_levels_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import bfs_levels

    # source is min entity "a"; chain a->b->c with a cycle c->a and an
    # unreachable island x->y; shortcut a->c must NOT override dist 1 for b
    trans = ray.data.from_pandas(
        pd.DataFrame(
            {
                "from_entity": ["a", "b", "c", "x", "a"],
                "to_entity": ["b", "c", "a", "y", "c"],
                "n": pd.array([1, 1, 1, 1, 1], dtype="int64"),
            }
        )
    )
    out = bfs_levels(trans, max_rounds=10, n_buckets=4).to_pandas()
    got = dict(zip(out["entity_id"], out["dist"]))
    assert got == {"a": 0, "b": 1, "c": 1}
