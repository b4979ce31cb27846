"""Round-4d late operators: Ed-Join edit-distance pairs + 2-D skyline.

Planted-input tests against brute-force references — the oracle-parity
tests in test_entry_contract.py cover the registry wiring separately.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from tcx2graph_jl_ray.functions.editdist import banded_edit_distances
from tcx2graph_jl_ray.stages.dedup import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        nd = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            nd[j] = min(d[j] + 1, nd[j - 1] + 1,
                        d[j - 1] + (a[i - 1] != b[j - 1]))
        d = nd
    return d[len(b)]


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcX ", max_size=12),
    st.text(alphabet="abcX ", max_size=12),
    st.integers(min_value=1, max_value=3),
)
def test_banded_dp_matches_reference(a, b, k):
    got = banded_edit_distances([a], [b], k)[0]
    assert got == min(_lev(a, b), k + 1)


def _brute_pairs(strings, k):
    uniq = sorted({s for s in strings if s})
    rows = []
    for i, a in enumerate(uniq):
        for b in uniq[i + 1:]:
            d = _lev(a, b)
            if d <= k:
                rows.append((a, b, d))
    return pd.DataFrame(rows, columns=["surf_a", "surf_b", "dist"]).astype(
        {"dist": "int64"}
    )


def _run_pairs(strings, k, **kw):
    ds = ray.data.from_pandas(pd.DataFrame({"surf": strings}))
    res = edit_distance_pairs(ds, col="surf", k=k, **kw)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    return res.sort_values(["surf_a", "surf_b"]).reset_index(drop=True)


def test_edit_pairs_planted(ray_session):
    """Distance boundaries, duplicates, and the degenerate-short channel
    (strings below q*k+1 distinct grams MUST still pair — the lossless
    SHORT-block guarantee)."""
    strings = [
        "acme corporation", "acme corporation",  # dup input, not a pair
        "acme corporatio",        # d=1
        "acme corp",              # d>2 from the above
        "acme corp.",             # d=1 vs acme corp
        "ab", "ba", "b", "",      # short channel: d(ab,ba)=2, d(ab,b)=1
        None,
        "zzzzzzzzzzzzzzzzzzzzzz",  # isolated
    ]
    got = _run_pairs(strings, k=2)
    want = _brute_pairs([s for s in strings if s], 2)
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    # the short strings genuinely paired
    assert (("ab" == got["surf_a"]) & (got["surf_b"] == "ba")).any()


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="abcd", max_size=8), min_size=0, max_size=40),
    st.integers(min_value=1, max_value=2),
)
def test_edit_pairs_random_vs_brute(ray_session, strings, k):
    got = _run_pairs(strings, k, n_buckets=8)
    want = _brute_pairs(strings, k)
    assert len(got) == len(want)
    if len(got):
        pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def _brute_skyline(df):
    keep = []
    for _, r in df.iterrows():
        dominated = (
            (df["o_orderdate"] <= r["o_orderdate"])
            & (df["o_totalprice"] >= r["o_totalprice"])
            & (
                (df["o_orderdate"] < r["o_orderdate"])
                | (df["o_totalprice"] > r["o_totalprice"])
            )
        ).any()
        keep.append(not dominated)
    return df[np.array(keep)]


def test_skyline_planted_vs_brute(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype="int64"),
        "o_orderdate": pd.to_datetime("1995-01-01")
        + pd.to_timedelta(rng.integers(0, 60, n), unit="D"),
        "o_totalprice": np.round(rng.uniform(10, 1000, n), 2),
    })
    # plant exact ties at one date so tie-survival is exercised
    df.loc[0, ["o_orderdate", "o_totalprice"]] = [
        pd.Timestamp("1995-01-05"), 999.99]
    df.loc[1, ["o_orderdate", "o_totalprice"]] = [
        pd.Timestamp("1995-01-05"), 999.99]
    df.to_parquet(tmp_path / "orders.parquet", index=False)

    from tcx2graph_jl_ray.stages.relational import order_skyline

    got = (
        order_skyline(str(tmp_path)).to_pandas()
        .sort_values(["o_orderkey"]).reset_index(drop=True)
    )
    want = (
        _brute_skyline(df).sort_values(["o_orderkey"])
        .reset_index(drop=True)[got.columns.tolist()]
    )
    pd.testing.assert_frame_equal(
        got.astype({"o_orderdate": "datetime64[us]"}),
        want.astype({"o_orderdate": "datetime64[us]"}),
    )
    # both planted ties survived
    assert set(got["o_orderkey"]) >= {0, 1} or (
        (want["o_totalprice"] > 999.99)
        & (want["o_orderdate"] <= pd.Timestamp("1995-01-05"))
    ).any()


def test_temporal_reach_planted(ray_session):
    """The defining property: a static path through a time-DECREASING edge
    pair must NOT count. a->b at t=10 (conv 1), b->c at t=5 (conv 2): c is
    statically reachable from a but NOT temporally; d is reachable via
    b->d at t=12."""
    from tcx2graph_jl_ray.stages.analysis import temporal_reach

    def conv(cid, turns):  # turns: [(turn_idx, entity, ts_sec)]
        me = pd.DataFrame({
            "conv_id": [cid] * len(turns),
            "turn_idx": [t[0] for t in turns],
            "entity_id": [t[1] for t in turns],
        })
        tr = pd.DataFrame({
            "conv_id": [cid] * len(turns),
            "turn_idx": [t[0] for t in turns],
            "ts": pd.to_datetime([t[2] for t in turns], unit="s"),
        })
        return me, tr

    me1, tr1 = conv("c1", [(0, "a", 8), (1, "b", 10)])
    me2, tr2 = conv("c2", [(0, "b", 4), (1, "c", 5)])
    me3, tr3 = conv("c3", [(0, "b", 11), (1, "d", 12)])
    mentions = ray.data.from_pandas(pd.concat([me1, me2, me3]))
    transcripts = ray.data.from_pandas(pd.concat([tr1, tr2, tr3]))

    res = temporal_reach(mentions, transcripts, max_turn_gap=5)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    got = dict(zip(res["entity_id"], res["first_reach"]))
    assert set(got) == {"a", "b", "d"}  # c unreachable in time order
    assert got["a"] == pd.Timestamp("1970-01-01")
    assert got["b"] == pd.Timestamp(10, unit="s")
    assert got["d"] == pd.Timestamp(12, unit="s")


# --- sorted-neighborhood blocking --------------------------------------------

def _snm_brute(df: pd.DataFrame, window: int, threshold: float,
               key_len: int) -> pd.DataFrame:
    import re
    d = df[df["text"].notna() & (df["text"].str.len() > 0)].copy()
    d["key"] = d["text"].str.lower().map(
        lambda t: re.sub(r"[^a-z0-9]", "", t)[:key_len]
    )
    d = d.sort_values(["key", "doc_id"], kind="mergesort").reset_index(drop=True)
    rows = []
    for i in range(len(d)):
        for j in range(i + 1, min(i + window, len(d))):
            sa, sb = set(d["text"].iloc[i].encode()), set(d["text"].iloc[j].encode())
            sim = len(sa & sb) / len(sa | sb)
            if sim >= threshold:
                rows.append((int(d["doc_id"].iloc[i]), int(d["doc_id"].iloc[j]),
                             j - i, sim))
    out = pd.DataFrame(rows, columns=["a", "b", "rank_dist", "sim"])
    return out.astype({"a": "int64", "b": "int64", "rank_dist": "int64"})


def _sorted_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    cols = sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_exact=True)


def test_sorted_neighborhood_matches_brute(ray_session):
    from tcx2graph_jl_ray.stages.dedup import sorted_neighborhood_pairs

    rng = np.random.default_rng(7)
    base = ["alpha beta gamma", "alpha beta gamm", "Zeta-9 test!",
            "zeta 9 TEST", "quick brown fox", "quick brown fax",
            "lorem ipsum", "LOREM ipsum.", "unrelated xyz", ""]
    texts, ids = [], []
    for i in range(120):
        t = base[int(rng.integers(0, len(base)))]
        if rng.random() < 0.3:
            t = t + " " + "pad" * int(rng.integers(0, 3))
        texts.append(t if rng.random() > 0.05 else None)
        ids.append(i)
    df = pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"), "text": texts})

    # bucket_rows=16 << 120 rows: forces many ghost boundaries; every
    # in-window pair must still appear exactly once
    got = sorted_neighborhood_pairs(
        ray.data.from_pandas(df), window=5, threshold=0.6, key_len=8,
        bucket_rows=16,
    ).to_pandas()
    want = _snm_brute(df, window=5, threshold=0.6, key_len=8)
    assert len(want) > 0
    _sorted_frames_equal(got, want)


def test_sorted_neighborhood_empty_corpus(ray_session):
    from tcx2graph_jl_ray.stages.dedup import sorted_neighborhood_pairs

    df = pd.DataFrame({"doc_id": pd.array([1, 2], dtype="int64"),
                       "text": [None, ""]})
    out = sorted_neighborhood_pairs(ray.data.from_pandas(df))
    assert out.count() == 0
    assert set(out.schema().names) == {"a", "b", "rank_dist", "sim"}


# --- set-containment join -----------------------------------------------------

def _containment_brute(df: pd.DataFrame, min_words: int) -> pd.DataFrame:
    sets = {}
    for did, t in zip(df["doc_id"], df["text"]):
        if t is None or not isinstance(t, str):
            continue
        ws = {w for w in t.lower().split(" ") if w}
        if len(ws) >= min_words:
            sets[int(did)] = ws
    rows = [
        (a, b, len(sa), len(sb))
        for a, sa in sets.items()
        for b, sb in sets.items()
        if a != b and sa <= sb
    ]
    return pd.DataFrame(
        rows, columns=["sub_id", "sup_id", "n_sub", "n_sup"]
    ).astype({"sub_id": "int64", "sup_id": "int64",
              "n_sub": "int64", "n_sup": "int64"})


def test_containment_pairs_matches_brute(ray_session):
    from tcx2graph_jl_ray.stages.dedup import containment_pairs

    rng = np.random.default_rng(11)
    vocab = ["apple", "banana", "cherry", "date", "elder", "fig", "grape"]
    texts, ids = [], []
    for i in range(60):
        k = int(rng.integers(1, 6))
        ws = list(rng.choice(vocab, size=k, replace=True))
        texts.append(" ".join(ws))
        ids.append(i)
    # planted exact subset / equal-set / empty / null rows
    texts += ["apple banana", "apple banana cherry", "apple banana", "", None]
    ids += [100, 101, 102, 103, 104]
    df = pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"), "text": texts})

    got = containment_pairs(
        ray.data.from_pandas(df), min_words=2
    ).to_pandas()
    want = _containment_brute(df, min_words=2)
    assert len(want) > 0
    # equal sets must appear in both directions
    assert ((want["sub_id"] == 100) & (want["sup_id"] == 102)).any()
    assert ((want["sub_id"] == 102) & (want["sup_id"] == 100)).any()
    _sorted_frames_equal(got, want)


# --- per-user OLS trend --------------------------------------------------------

def _trend_brute(df: pd.DataFrame, min_n: int) -> pd.DataFrame:
    anchor = pd.Timestamp("2020-01-01")
    d = df[df["value"].notna() & df["ts"].notna()]
    rows = []
    for uid, g in d.groupby("user_id"):
        x = [int((t.floor("h") - anchor) / pd.Timedelta(hours=1)) for t in g["ts"]]
        y = [int(round(v * 100)) for v in g["value"]]
        n = len(g)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sx2 = sum(a * a for a in x)
        den = n * sx2 - sx * sx
        if n < min_n or den <= 0:
            continue
        rows.append((int(uid), n,
                     float(np.round(float(n * sxy - sx * sy) / float(den), 6)),
                     float(np.round(float(sy * sx2 - sx * sxy) / float(den), 6))))
    return pd.DataFrame(rows, columns=["user_id", "n", "slope", "intercept"]).astype(
        {"user_id": "int64", "n": "int64"}
    )


def test_user_value_trend_matches_brute_any_layout(ray_session):
    from tcx2graph_jl_ray.stages.window import user_value_trend

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "user_id": pd.array(rng.integers(0, 12, n), dtype="int64"),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400 * 30, n), unit="s"),
        "value": np.round(rng.uniform(0, 500, n), 2),
    })
    # plant a single-timestamp user (den == 0 -> dropped) and nulls
    df.loc[df["user_id"] == 3, "ts"] = pd.Timestamp("2024-01-05 12:30:00")
    df.loc[:4, "value"] = None

    want = _trend_brute(df, min_n=2)
    assert (df["user_id"] == 3).any() and not (want["user_id"] == 3).any()
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = user_value_trend(ds, min_n=2).to_pandas()
        _sorted_frames_equal(got, want)


# --- k-truss ------------------------------------------------------------------

def test_ktruss_dual_paths_agree(ray_session):
    from tcx2graph_jl_ray.stages.analysis import ktruss_edges

    rng = np.random.default_rng(5)
    # a 6-clique (stays in any truss up to k=6) + a sparse random periphery
    nodes = list(range(6))
    edges = {(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]}
    while len(edges) < 120:
        a, b = int(rng.integers(0, 40)), int(rng.integers(0, 40))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = pd.DataFrame(sorted(edges), columns=["src", "dst"]).astype("int64")
    ds = ray.data.from_pandas(df)

    for k in (3, 4, 6):
        driver = ktruss_edges(ds, k=k).to_pandas()
        dist = ktruss_edges(ds, k=k, small_graph_threshold=0).to_pandas()
        assert len(driver) > 0  # the 6-clique survives k<=6
        _sorted_frames_equal(dist, driver)
        # every clique edge must be present with support >= k-2
        clique = driver[(driver["src"] < 6) & (driver["dst"] < 6)]
        assert len(clique) == 15 and (clique["support"] >= k - 2).all()


# --- value band join ------------------------------------------------------------

def test_value_band_join_matches_brute(ray_session):
    from tcx2graph_jl_ray.stages.window import value_band_join

    rng = np.random.default_rng(13)
    n = 300
    df = pd.DataFrame({
        "event_id": pd.array(np.arange(n), dtype="int64"),
        "event_type": rng.choice(["x", "y"], n),
        # dense integer-cent grid so exact-boundary pairs (|d| == eps) occur
        "value": np.round(rng.integers(0, 60, n) / 100.0, 2),
    })
    df.loc[:3, "value"] = None
    eps = 0.02

    rows = []
    d = df[df["value"].notna()]
    c = {int(i): int(round(v * 100)) for i, v in zip(d["event_id"], d["value"])}
    t = dict(zip(d["event_id"].astype(int), d["event_type"]))
    ids = sorted(c)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if t[a] == t[b] and abs(c[a] - c[b]) <= 2:
                rows.append((t[a], a, b, abs(c[a] - c[b])))
    want = pd.DataFrame(rows, columns=["event_type", "a", "b", "diff_cents"]).astype(
        {"a": "int64", "b": "int64", "diff_cents": "int64"}
    )
    assert (want["diff_cents"] == 2).any()  # boundary pairs exercised

    got = value_band_join(ray.data.from_pandas(df), eps=eps).to_pandas()
    _sorted_frames_equal(got, want)


# --- split leakage + percent rank ----------------------------------------------

def test_split_leakage_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import split_leakage

    pairs = ray.data.from_pandas(pd.DataFrame(
        {"a": pd.array([1, 2, 5], dtype="int64"),
         "b": pd.array([2, 3, 6], dtype="int64")}
    ))
    splits = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": pd.array([1, 2, 3, 5, 6], dtype="int64"),
         "split": ["train", "test", "test", "val", "val"]}
    ))
    got = split_leakage(pairs, splits).to_pandas()
    want = pd.DataFrame(
        {"a": pd.array([1], dtype="int64"), "b": pd.array([2], dtype="int64"),
         "split_a": ["train"], "split_b": ["test"]}
    )
    _sorted_frames_equal(got, want)


def test_length_percent_rank_ties_and_nulls(ray_session):
    from tcx2graph_jl_ray.stages.text import length_percent_rank

    df = pd.DataFrame({
        "doc_id": pd.array(range(6), dtype="int64"),
        "text": ["a b c", "a b c", None, "", "x", "x y z w"],
    })
    got = length_percent_rank(ray.data.from_pandas(df)).to_pandas()
    got = got.set_index("doc_id")
    # counts: doc0=3, doc1=3, doc2(null)=0, doc3(empty)=0, doc4=1, doc5=4
    # sorted: [0,0,1,3,3,4]; min-rank-1: 0,0,2,3,3,5; /5
    assert got.loc[2, "pr"] == 0.0 and got.loc[3, "pr"] == 0.0
    assert got.loc[4, "pr"] == 0.4
    assert got.loc[0, "pr"] == 0.6 and got.loc[1, "pr"] == 0.6
    assert got.loc[5, "pr"] == 1.0


def test_event_type_trigrams_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import event_type_trigrams

    # user 1: A B A B A -> trigrams ABA, BAB, ABA; user 2: A B A -> ABA
    # tie timestamps resolved by event_id
    df = pd.DataFrame({
        "event_id": pd.array(range(8), dtype="int64"),
        "user_id": pd.array([1, 1, 1, 1, 1, 2, 2, 2], dtype="int64"),
        "ts": pd.to_datetime(
            ["2024-01-01"] * 2 + ["2024-01-02"] * 3 + ["2024-01-01"] * 3
        ),
        "event_type": ["A", "B", "A", "B", "A", "A", "B", "A"],
    })
    got = event_type_trigrams(
        ray.data.from_pandas(df).repartition(3), min_n=2
    ).to_pandas()
    want = pd.DataFrame(
        {"t1": ["A"], "t2": ["B"], "t3": ["A"],
         "n": pd.array([3], dtype="int64")}
    )
    # ABA x3 (2 from user1 + 1 from user2); BAB occurs once -> below min_n
    _sorted_frames_equal(got, want)


def test_rrf_fusion_hand_checked(ray_session):
    from tcx2graph_jl_ray.stages.text import rrf_fusion

    # one query ["apple"]; doc 0 matches lexically; doc 1 is stopword-rich
    # (prior top); doc 2 both
    df = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2], dtype="int64"),
        "text": ["apple apple apple orchard",
                 "the and is of to in it the and is",
                 "the apple and the is of"],
    })
    got = rrf_fusion(
        ray.data.from_pandas(df), queries=[(0, ["apple"])], k=2, rrf_k=60
    ).to_pandas().set_index("doc_id")
    # bm25 list: docs {0, 2}; prior list (stopword ratio desc): doc1=1.0,
    # doc2=4/6 -> prior ranks [1, 2]
    assert set(got.index) == {2, 1} or set(got.index) == {2, 0}
    # doc 2 is in both lists, must rank first
    assert got.loc[2, "rank"] == 1
    r = got.loc[2, "rrf"]
    import numpy as np
    assert r > 1.0 / 61  # two contributions


def test_containment_hot_word_cap_drops_with_warning(ray_session, caplog):
    import logging

    from tcx2graph_jl_ray.stages.dedup import containment_pairs

    # every doc shares the hot word; with max_posting below the corpus size
    # the only anchor word is capped away -> zero candidates, plus a warning
    df = pd.DataFrame({
        "doc_id": pd.array(range(8), dtype="int64"),
        "text": ["common"] * 8,
    })
    with caplog.at_level(logging.WARNING):
        out = containment_pairs(
            ray.data.from_pandas(df), min_words=1, max_posting=4
        ).to_pandas()
    assert len(out) == 0
    # uncapped, equal singleton sets contain each other in both directions
    full = containment_pairs(ray.data.from_pandas(df), min_words=1).to_pandas()
    assert len(full) == 8 * 7


def test_edit_clusters_planted(ray_session):
    from tcx2graph_jl_ray.stages.dedup import edit_clusters

    df = pd.DataFrame({"norm": [
        "acme corp", "acme corp.", "acme corpx",   # chain -> one cluster
        "zebra", "zebro",                           # pair cluster
        "isolated thing",                           # similar to nothing
        None, "",
    ]})
    got = edit_clusters(ray.data.from_pandas(df), col="norm", k=2).to_pandas()
    want = pd.DataFrame({
        "surf": ["acme corp", "acme corp.", "acme corpx", "zebra", "zebro"],
        "cluster_id": ["acme corp"] * 3 + ["zebra"] * 2,
        "cluster_size": pd.array([3, 3, 3, 2, 2], dtype="int64"),
    })
    _sorted_frames_equal(got, want)


def test_tool_stats_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import tool_stats

    df = pd.DataFrame({
        "conv_id": ["c1"] * 4 + ["c2"] * 3,
        "turn_idx": pd.array([0, 1, 2, 3, 0, 1, 2], dtype="int32"),
        "role": ["user", "tool", "assistant", "tool",
                 "tool", "tool", "assistant"],
        "text": ["q", "r", "a", "r2", "r", "r", "a"],
        "tool": [None, "search", None, "search", "calc", "search", None],
    })
    got = tool_stats(ray.data.from_pandas(df).repartition(2)).to_pandas()
    got = got.set_index("tool")
    # search: 3 calls (c1 x2, c2 x1); followed-by-assistant: c1 turn1 ->
    # assistant, c1 turn3 -> end (no), c2 turn1 -> assistant = 2
    assert got.loc["search", "n_calls"] == 3
    assert got.loc["search", "n_convs"] == 2
    assert got.loc["search", "n_followed_by_assistant"] == 2
    # calc: 1 call followed by another tool turn -> 0
    assert got.loc["calc", "n_calls"] == 1
    assert got.loc["calc", "n_followed_by_assistant"] == 0


def test_events_profile_nulls_and_distincts(ray_session):
    from tcx2graph_jl_ray.stages.clean import events_profile

    df = pd.DataFrame({
        "event_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
        "ts": pd.to_datetime(
            ["2024-01-01", "2024-01-01", None, "2024-01-02", "2024-01-02"]
        ),
        "user_id": pd.array([7, 7, None, 9, 9], dtype="Int64"),
        "event_type": ["a", "a", "b", None, "b"],
        "value": [1.5, 1.5, None, -0.0, 0.0],
        "props": [None, None, None, None, None],
    })
    got = events_profile(
        ray.data.from_pandas(df).repartition(3)
    ).to_pandas().set_index("column")
    assert (got["n_rows"] == 5).all()
    assert got.loc["ts", "n_null"] == 1 and got.loc["ts", "n_distinct"] == 2
    assert got.loc["user_id", "n_distinct"] == 2
    assert got.loc["event_type", "n_null"] == 1
    # SQL DISTINCT semantics: -0.0 == 0.0, so {1.5, ±0.0} counts 2
    assert got.loc["value", "n_distinct"] == 2
    assert got.loc["props", "n_null"] == 5 and got.loc["props", "n_distinct"] == 0


def test_temporal_reach_dual_paths_agree(ray_session):
    from tcx2graph_jl_ray.stages.analysis import temporal_reach

    rng = np.random.default_rng(17)
    rows_me, rows_tr = [], []
    for c in range(12):
        n = int(rng.integers(2, 7))
        ents = [f"e{int(rng.integers(0, 9))}" for _ in range(n)]
        base = int(rng.integers(0, 1000))
        for i, ent in enumerate(ents):
            rows_me.append({"conv_id": f"c{c}", "turn_idx": i,
                            "entity_id": ent})
            rows_tr.append({"conv_id": f"c{c}", "turn_idx": i,
                            "ts": pd.Timestamp(base + i * 7, unit="s")})
    me = ray.data.from_pandas(pd.DataFrame(rows_me))
    tr = ray.data.from_pandas(pd.DataFrame(rows_tr))

    def as_df(r):
        return (r if isinstance(r, pd.DataFrame) else r.to_pandas())

    driver = as_df(temporal_reach(me, tr, max_turn_gap=3))
    dist = as_df(temporal_reach(me, tr, max_turn_gap=3,
                                small_graph_threshold=0))
    assert len(driver) > 1
    _sorted_frames_equal(dist, driver)
