"""Planted tests for the round-4o operator batch (temporal triple
validity intervals, exact-k global bottom-k sample, chunk-level payload
dedup)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data


def test_triple_intervals_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import triple_intervals

    # fact F1 asserted twice in conv A (t=10s, 30s) and once in conv B
    # (t=20s); fact F2 once in conv A (t=40s)
    triples = pd.DataFrame({
        "conv_id": ["A", "A", "B", "A"],
        "turn_idx": pd.array([0, 2, 1, 3], dtype="int32"),
        "subj": ["s1", "s1", "s1", "s2"],
        "pred": ["p", "p", "p", "p"],
        "obj": ["o1", "o1", "o1", "o2"],
    })
    transcripts = pd.DataFrame({
        "conv_id": ["A", "A", "A", "A", "B", "B"],
        "turn_idx": pd.array([0, 1, 2, 3, 0, 1], dtype="int32"),
        "ts": pd.to_datetime(
            [10_000_000, 15_000_000, 30_000_000, 40_000_000,
             5_000_000, 20_000_000],
            unit="us",
        ),
    })
    got = (
        triple_intervals(
            ray.data.from_pandas(triples),
            ray.data.from_pandas(transcripts),
            n_buckets=4,
        )
        .to_pandas()
        .set_index(["subj", "obj"])
        .sort_index()
    )
    f1 = got.loc[("s1", "o1")]
    assert f1["first_us"] == 10_000_000
    assert f1["last_us"] == 30_000_000
    assert f1["span_us"] == 20_000_000
    assert f1["n_mentions"] == 3
    assert f1["n_convs"] == 2
    f2 = got.loc[("s2", "o2")]
    assert f2["span_us"] == 0
    assert f2["n_mentions"] == 1
    assert f2["n_convs"] == 1
    # all-int64 output (the driver hash is bit-stable)
    for c in ("first_us", "last_us", "span_us", "n_mentions", "n_convs"):
        assert got[c].dtype == np.int64


def test_bottomk_sample_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import bottomk_sample

    docs = pd.DataFrame({
        "doc_id": np.arange(100, dtype="int64"),
        "source": ["s%d" % (i % 3) for i in range(100)],
        "text": ["body %d" % i for i in range(100)],
    })
    # null-text rows must not be sampled (documents-boundary contract)
    docs.loc[7, "text"] = None
    k = 10
    got = bottomk_sample(ray.data.from_pandas(docs), k=k).to_pandas()
    assert list(got["sample_rank"]) == list(range(1, k + 1))

    want = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i)
        for i in range(100)
        if i != 7
    )[:k]
    assert list(got["doc_id"]) == [i for _, i in want]
    # stable across block layouts: 1-row blocks give the identical sample
    got2 = bottomk_sample(
        ray.data.from_pandas(docs).repartition(20), k=k
    ).to_pandas()
    pd.testing.assert_frame_equal(got, got2)


def test_chunk_dedup_planted(ray_session):
    from tcx2graph_jl_ray.stages.multimodal import chunk_dedup_stats

    # chunk_chars=4: doc0 = AAAA|BBBB, doc1 = AAAA|CC -> chunks
    # {AAAA: 2, BBBB: 1, CC: 1}; doc2 is empty (0 chunks, still a payload)
    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2], dtype="int64"),
        "text": ["AAAABBBB", "AAAACC", ""],
        "source": ["x", "x", "x"],
    })
    got = chunk_dedup_stats(
        ray.data.from_pandas(docs), chunk_chars=4
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["n_payloads"] == 3
    assert r["n_chunks"] == 4
    assert r["n_unique_chunks"] == 3
    assert r["n_dup_chunks"] == 1
    assert r["bytes_total"] == 14  # 4+4 + 4+2
    assert r["bytes_unique"] == 10  # AAAA + BBBB + CC
    assert r["dedup_ratio"] == np.round(10 / 14, 6)


def test_late_arrivals_planted(ray_session):
    import hashlib

    from tcx2graph_jl_ray.stages.window import late_arrivals

    # two users; user 9 gets a far-future event that MUST NOT leak into
    # user 1's watermark (segmented running max regression)
    rows = [
        (0, 1, "2024-01-01 00:00:10", "a"),
        (1, 1, "2024-01-01 00:00:20", "a"),
        (2, 1, "2024-01-01 00:00:30", "b"),
        (3, 1, "2024-01-01 00:00:40", "b"),
        (4, 9, "2030-01-01 00:00:00", "a"),
        (5, 9, "2030-01-01 00:00:01", "a"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])

    # pure-python reference: per user, arrive in md5(event_id) order
    want: dict[str, dict[str, int]] = {}
    for _, u in df.groupby("user_id"):
        u = u.assign(
            hx=[hashlib.md5(str(i).encode()).hexdigest()
                for i in u["event_id"]]
        ).sort_values("hx")
        hi = None
        for _, r in u.iterrows():
            t = r["ts"].value // 1000  # ns -> us
            w = want.setdefault(r["event_type"], {"n": 0, "late": 0,
                                                  "lat": 0})
            w["n"] += 1
            if hi is not None and t < hi:
                w["late"] += 1
                w["lat"] = max(w["lat"], hi - t)
            hi = t if hi is None else max(hi, t)

    got = (
        late_arrivals(ray.data.from_pandas(df), n_buckets=4)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    for et, w in want.items():
        assert got.loc[et, "n_events"] == w["n"]
        assert got.loc[et, "n_late"] == w["late"]
        assert got.loc[et, "max_lateness_us"] == w["lat"]
        assert got.loc[et, "late_share"] == np.round(w["late"] / w["n"], 6)


def test_k_anonymity_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import k_anonymity_audit

    # QI = (type, isodow, hour). 2024-01-01 = Monday (dow 1).
    # class (x,1,5): 3 rows; class (x,1,6): 1 row; class (y,1,5): 2 rows
    df = pd.DataFrame({
        "event_type": ["x", "x", "x", "x", "y", "y"],
        "ts": pd.to_datetime([
            "2024-01-01 05:00", "2024-01-01 05:10", "2024-01-01 05:20",
            "2024-01-01 06:00", "2024-01-01 05:30", "2024-01-01 05:40",
        ]),
    })
    got = (
        k_anonymity_audit(ray.data.from_pandas(df), ks=(2, 3), n_buckets=4)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    assert (got["n_classes"] == 3).all()
    # k=2: only the singleton class (1 row) is below
    assert got.loc[2, "n_classes_below"] == 1
    assert got.loc[2, "n_rows_below"] == 1
    # k=3: singleton + the 2-row class
    assert got.loc[3, "n_classes_below"] == 2
    assert got.loc[3, "n_rows_below"] == 3
    assert got.loc[3, "rows_below_share"] == 0.5


def test_mixture_weights_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import mixture_weights

    # source a: 9 tokens over 2 docs; source b: 16 tokens over 1 doc
    df = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2], dtype="int64"),
        "source": ["a", "a", "b"],
        "text": ["w x y z q", "a b c d", " ".join(["t"] * 16)],
    })
    got = (
        mixture_weights(ray.data.from_pandas(df), n_buckets=2)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["a", "n_docs"] == 2
    assert got.loc["a", "n_tokens"] == 9
    assert got.loc["b", "n_tokens"] == 16
    assert got.loc["a", "raw_share"] == np.round(9 / 25, 6)
    assert got.loc["a", "temp_weight"] == np.round(np.sqrt(9.0)
                                                   / np.sqrt(25.0), 6)
    assert got.loc["b", "temp_weight"] == np.round(np.sqrt(16.0)
                                                   / np.sqrt(25.0), 6)


def test_latest_state_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import latest_state

    # user 1 / type a: ties on ts broken by event_id (id 3 wins over id 2)
    df = pd.DataFrame({
        "event_id": pd.array([0, 2, 3, 5], dtype="int64"),
        "user_id": pd.array([1, 1, 1, 2], dtype="int64"),
        "event_type": ["a", "a", "a", "a"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-02 00:00", "2024-01-02 00:00",
            "2024-01-01 00:00",
        ]),
        "value": [1.5, 2.5, 3.5, 9.0],
    })
    got = (
        latest_state(ray.data.from_pandas(df), n_buckets=4)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert len(got) == 2
    assert got.loc[1, "last_event_id"] == 3
    assert got.loc[1, "last_value"] == 3.5
    assert got.loc[2, "last_event_id"] == 5
    # argmax carry-through across block layouts too
    got2 = (
        latest_state(ray.data.from_pandas(df).repartition(4), n_buckets=4)
        .to_pandas().set_index("user_id").sort_index()
    )
    pd.testing.assert_frame_equal(got, got2)


def test_ingest_idempotency_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import ingest_idempotency

    # natural key (user, type, ts): one triple delivered 3x, one 2x, two 1x
    df = pd.DataFrame({
        "user_id": pd.array([1, 1, 1, 1, 1, 2, 2], dtype="int64"),
        "event_type": ["a", "a", "a", "b", "b", "a", "b"],
        "ts": pd.to_datetime([
            "2024-01-01", "2024-01-01", "2024-01-01",
            "2024-01-02", "2024-01-02", "2024-01-01", "2024-01-01",
        ]),
    })
    got = ingest_idempotency(
        ray.data.from_pandas(df), n_buckets=4
    ).to_pandas().iloc[0]
    assert got["n_rows"] == 7
    assert got["n_keys"] == 4
    assert got["n_dup_keys"] == 2
    assert got["n_dup_rows"] == 3
    assert got["max_multiplicity"] == 3


def test_snapshot_diff_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import snapshot_diff

    # keys: 0 unchanged (ids 0/1 same text), 1 changed (2/3 differ),
    # 2 removed (only even id 4), 3 added (only odd id 7)
    df = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2, 3, 4, 7], dtype="int64"),
        "text": ["same", "same", "old", "new", "gone", "fresh"],
    })
    got = snapshot_diff(
        ray.data.from_pandas(df), n_buckets=4
    ).to_pandas().iloc[0]
    assert got["n_unchanged"] == 1
    assert got["n_changed"] == 1
    assert got["n_removed"] == 1
    assert got["n_added"] == 1
    assert got["reuse_share"] == np.round(1 / 3, 6)


def test_curriculum_order_planted(ray_session):
    import hashlib

    from tcx2graph_jl_ray.stages.text import STOPWORDS, curriculum_order

    # band 9-ish docs (all stopwords) must rank before band-0 docs; within
    # a band, order is md5(doc_id)
    texts = {
        0: "the and of the",          # all stopwords -> band 9
        1: "the of a in is",          # band 9
        2: "quark gluon plasma",      # band 0
        3: "tensor core kernel",      # band 0
        4: None,                      # dropped (null text)
    }
    df = pd.DataFrame({
        "doc_id": pd.array(list(texts), dtype="int64"),
        "text": list(texts.values()),
    })

    def band(t):
        ws = t.lower().split(" ")
        return min(10 * sum(w in STOPWORDS for w in ws) // len(ws), 9)

    want = sorted(
        (
            (-band(t), hashlib.md5(str(i).encode()).hexdigest(), i)
            for i, t in texts.items() if t is not None
        )
    )
    got = (
        curriculum_order(ray.data.from_pandas(df).repartition(3),
                         n_buckets=4)
        .to_pandas()
        .sort_values("curriculum_rank")
    )
    assert list(got["curriculum_rank"]) == [1, 2, 3, 4]
    assert list(got["doc_id"]) == [i for _, _, i in want]
    assert list(got["band"]) == [-b for b, _, _ in want]


def test_l_diversity_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import l_diversity_audit

    # class (x,1,5): users {1,2,3} (div 3, 4 rows);
    # class (y,1,5): user {1} only (div 1, 2 rows)
    df = pd.DataFrame({
        "event_type": ["x", "x", "x", "x", "y", "y"],
        "user_id": pd.array([1, 1, 2, 3, 1, 1], dtype="int64"),
        "ts": pd.to_datetime(["2024-01-01 05:00"] * 6),
    })
    got = (
        l_diversity_audit(ray.data.from_pandas(df), ls=(2, 4), n_buckets=4)
        .to_pandas().set_index("l").sort_index()
    )
    assert (got["n_classes"] == 2).all()
    assert got.loc[2, "n_classes_below"] == 1  # only the single-user class
    assert got.loc[2, "n_rows_below"] == 2
    assert got.loc[4, "n_classes_below"] == 2  # both below 4 distinct users
    assert got.loc[4, "n_rows_below"] == 6
    assert got.loc[2, "rows_below_share"] == np.round(2 / 6, 6)


def test_deletion_impact_planted(ray_session):
    import hashlib

    from tcx2graph_jl_ray.stages.window import deletion_impact

    users = list(range(200))
    flagged = {u for u in users
               if hashlib.md5(str(u).encode()).hexdigest()[:2] <= "0f"}
    assert flagged  # the planted cohort must be non-empty
    df = pd.DataFrame({
        "event_id": pd.array(range(400), dtype="int64"),
        "user_id": pd.array([users[i % 200] for i in range(400)],
                            dtype="int64"),
        "event_type": ["a" if i % 2 == 0 else "b" for i in range(400)],
        "ts": pd.to_datetime(["2024-01-01"] * 400),
        "value": [0.0] * 400,
    })
    got = (
        deletion_impact(ray.data.from_pandas(df), hex_max="0f", n_buckets=4)
        .to_pandas().set_index("event_type").sort_index()
    )
    for et in ("a", "b"):
        sub = df[df["event_type"] == et]
        n_flag_rows = int(sub["user_id"].isin(flagged).sum())
        n_flag_users = sub[sub["user_id"].isin(flagged)]["user_id"].nunique()
        assert got.loc[et, "n_rows"] == len(sub)
        assert got.loc[et, "n_flagged_rows"] == n_flag_rows
        assert got.loc[et, "n_flagged_users"] == n_flag_users
        assert got.loc[et, "flagged_share"] == np.round(
            n_flag_rows / len(sub), 6)


def test_truncation_profile_planted(ray_session):
    from tcx2graph_jl_ray.stages.ann import truncation_profile

    # vec A: all energy in the head (r=1.0 -> bin 9 capped);
    # vec B: half head / half tail (r=0.5 -> bin 5);
    # vec C: all energy in the tail (r=0.0 -> bin 0)
    vecs = [
        [1.0, 1.0, 0.0, 0.0],
        [1.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0, 1.0],
    ]
    df = pd.DataFrame({
        "vec_id": pd.array([0, 1, 2], dtype="int64"),
        "embedding": [np.asarray(v, dtype="float32") for v in vecs],
    })
    got = (
        truncation_profile(ray.data.from_pandas(df), keep_dims=2)
        .to_pandas().set_index("bin").sort_index()
    )
    assert list(got.index) == [0, 5, 9]
    assert (got["n_vecs"] == 1).all()
    assert got.loc[5, "bin_lo"] == 0.5
    assert (got["share"] == np.round(1 / 3, 6)).all()


def test_transit_backlog_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from tcx2graph_jl_ray.stages.relational import transit_backlog

    # orders: A placed d1 ships d3 (open d1,d2); B placed d2 ships d2
    # (zero-length: never open); C placed d2 ships d4 (open d2,d3);
    # D non-physical (ships before placed) -> excluded entirely
    orders = pd.DataFrame({
        "o_orderkey": pd.array([1, 2, 3, 4], dtype="int64"),
        "o_orderdate": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-02", "2024-01-05"]
        ),
    })
    lineitem = pd.DataFrame({
        "l_orderkey": pd.array([1, 1, 2, 3, 4], dtype="int64"),
        "l_shipdate": pd.to_datetime(
            ["2024-01-02", "2024-01-03", "2024-01-02", "2024-01-04",
             "2024-01-04"]
        ),
    })
    pq_.write_table(pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet"))
    pq_.write_table(pa.Table.from_pandas(lineitem),
                    str(tmp_path / "lineitem.parquet"))
    got = (
        transit_backlog(str(tmp_path), n_buckets=4)
        .to_pandas().set_index("day").sort_index()
    )
    # grid = distinct order dates of physical orders: d1, d2
    assert list(got.index) == ["2024-01-01", "2024-01-02"]
    assert got.loc["2024-01-01", "n_open"] == 1          # A only
    assert got.loc["2024-01-02", "n_open"] == 2          # A and C (not B)


def test_value_cusum_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import value_cusum

    # type x daily cents: [100, 100, 700] -> mean 300;
    # cusum: max(0,-200)=0, 0, max(0,0+400)=400 -> peak 400 on day 3
    df = pd.DataFrame({
        "event_type": ["x"] * 3,
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
        "value": [1.0, 1.0, 7.0],
    })
    got = value_cusum(ray.data.from_pandas(df)).to_pandas().iloc[0]
    assert got["n_days"] == 3
    assert got["mean_cents"] == 300
    assert got["peak_cusum_cents"] == 400
    assert got["peak_day"] == "2024-01-03"
    assert got["n_pos_days"] == 1


def test_value_changepoint_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import value_changepoint

    # type x: days [100, 100, 900, 900] cents -> best split after day 2
    # (score |200*2 - 1800*2| = 3200); type y single day -> no split row
    df = pd.DataFrame({
        "event_type": ["x"] * 4 + ["y"],
        "ts": pd.to_datetime([
            "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
            "2024-01-01",
        ]),
        "value": [1.0, 1.0, 9.0, 9.0, 5.0],
    })
    got = value_changepoint(ray.data.from_pandas(df)).to_pandas()
    assert list(got["event_type"]) == ["x"]
    r = got.iloc[0]
    assert r["n_days"] == 4
    assert r["split_day"] == "2024-01-02"
    assert r["score"] == abs(200 * 2 - 1800 * 2)


def test_crosslang_pairs_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import crosslang_winnow_pairs

    # docs 0/1 share their full text but differ in lang -> cross-lang pair;
    # docs 2/3 share text with the SAME lang -> filtered out. Texts are
    # long enough that winnowing selects >= 2 fingerprints per doc.
    shared = " ".join("tok%d" % i for i in range(40))
    same_lang = " ".join("word%d" % i for i in range(40))
    df = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
        "text": [shared, shared, same_lang, same_lang],
        "lang": ["en", "de", "fr", "fr"],
        "source": ["s"] * 4,
    })
    got = crosslang_winnow_pairs(
        ray.data.from_pandas(df), min_shared=2
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["a"], r["b"]) == (0, 1)
    assert {r["lang_a"], r["lang_b"]} == {"en", "de"}
    assert r["n_shared"] >= 2


def test_fact_conflicts_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import fact_conflicts

    # (s1,p): o1 x2, o2 x1 -> conflicted, top o1 share 2/3;
    # (s2,p): o1 only -> consistent, must not emit;
    # (s3,p): o1 x1, o2 x1 -> tie broken to lexicographic min (o1)
    df = pd.DataFrame({
        "subj": ["s1", "s1", "s1", "s2", "s3", "s3"],
        "pred": ["p"] * 6,
        "obj": ["o1", "o1", "o2", "o1", "o2", "o1"],
    })
    got = (
        fact_conflicts(ray.data.from_pandas(df), n_buckets=4)
        .to_pandas().set_index("subj").sort_index()
    )
    assert list(got.index) == ["s1", "s3"]
    assert got.loc["s1", "n_objects"] == 2
    assert got.loc["s1", "n_assertions"] == 3
    assert got.loc["s1", "top_obj"] == "o1"
    assert got.loc["s1", "top_share"] == np.round(2 / 3, 6)
    assert got.loc["s3", "top_obj"] == "o1"  # tie -> lexicographic min
    assert got.loc["s3", "top_share"] == 0.5


def test_benford_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import benford_audit

    # cents: 150 (digit 1), 150 (1), 999 (9), 25 (2); zero excluded
    df = pd.DataFrame({
        "value": [1.50, 1.50, 9.99, 0.25, 0.0],
    })
    got = (
        benford_audit(ray.data.from_pandas(df))
        .to_pandas().set_index("digit").sort_index()
    )
    assert list(got.index) == [1, 2, 9]
    assert got.loc[1, "n"] == 2
    assert got.loc[1, "share"] == 0.5
    assert got.loc[1, "benford_p"] == np.round(np.log10(2.0), 6)
    assert got.loc[9, "excess"] == np.round(
        0.25 - np.round(np.log10(1 + 1 / 9), 6), 6)


def test_ab_readout_planted(ray_session):
    import hashlib

    from tcx2graph_jl_ray.stages.window import ab_readout

    users = list(range(60))
    arm_a = {u for u in users
             if hashlib.md5(str(u).encode()).hexdigest()[0] <= "7"}
    assert arm_a and set(users) - arm_a  # both arms populated
    df = pd.DataFrame({
        "event_type": ["x"] * 60,
        "user_id": pd.array(users, dtype="int64"),
        "value": [1.0 if u in arm_a else 3.0 for u in users],
    })
    got = ab_readout(ray.data.from_pandas(df), n_buckets=4).to_pandas()
    r = got.iloc[0]
    na, nb = len(arm_a), 60 - len(arm_a)
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["users_a"] == na and r["users_b"] == nb
    assert r["cents_a"] == 100 * na and r["cents_b"] == 300 * nb
    assert r["mean_diff_cents"] == np.round(100.0 - 300.0, 6)


def test_phash_dups_planted(ray_session):
    from tcx2graph_jl_ray.stages.multimodal import phash_dup_groups

    base = "".join(chr(65 + (i % 26)) for i in range(64))
    other = "".join(chr(90 - (i % 26)) for i in range(64))
    df = pd.DataFrame({
        "doc_id": pd.array([3, 7, 9, 11], dtype="int64"),
        # docs 3 and 7 share the same 64-char prefix (same fingerprint);
        # doc 9 differs; doc 11 is too short for a stable fingerprint
        "text": [base + " tail one", base + " other tail", other, "short"],
        "source": ["s"] * 4,
    })
    got = phash_dup_groups(
        ray.data.from_pandas(df), n_cells=64, n_buckets=4
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["n_payloads"] == 2
    assert r["min_doc_id"] == 3
