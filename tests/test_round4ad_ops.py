"""Planted tests for the round-4ad batch (trimmed mean, A/B SRM check,
weekday chi-square)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data


def _events(rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts_us", "user_id", "event_type", "value"]
    )
    return pd.DataFrame({
        "event_id": df["event_id"].astype("int64"),
        "ts": pd.to_datetime(df["ts_us"], unit="us"),
        "user_id": df["user_id"].astype("int64"),
        "event_type": df["event_type"],
        "value": df["value"].astype("float64"),
    })


def test_trimmed_mean_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import trimmed_mean_value

    # 10 values: 0.01, 1..8 dollars, 1000.00 -> 10% trim drops one from
    # each side -> mean of 1..8 dollars = 4.50; the whale disappears
    vals = [0.01] + [float(i) for i in range(1, 9)] + [1000.00]
    df = _events([(i, i, 1, "a", v) for i, v in enumerate(vals)])
    got = trimmed_mean_value(
        ray.data.from_pandas(df).repartition(3), trim=0.1, n_buckets=4
    ).to_pandas().iloc[0]
    assert got["n"] == 10
    assert got["n_trimmed_each_side"] == 1
    assert got["trimmed_mean"] == 4.5


def test_ab_srm_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import ab_srm_check

    # engineer a grossly imbalanced arm split: 20 users all in arm A
    a_users = [u for u in range(2000)
               if hashlib.md5(str(u).encode()).hexdigest()[0] <= "7"][:20]
    df = _events([(i, i, u, "a", 0.0) for i, u in enumerate(a_users)])
    got = ab_srm_check(ray.data.from_pandas(df), n_buckets=4) \
        .to_pandas().iloc[0]
    assert got["n_a"] == 20 and got["n_b"] == 0
    # (20-0)^2 = 400 > 9*20 -> flagged
    assert got["srm_flag"] == 1
    assert got["z2"] == 20.0

    # balanced arms -> no flag
    b_users = [u for u in range(2000)
               if hashlib.md5(str(u).encode()).hexdigest()[0] > "7"][:20]
    df2 = _events([(i, i, u, "a", 0.0)
                   for i, u in enumerate(a_users + b_users)])
    got2 = ab_srm_check(ray.data.from_pandas(df2), n_buckets=4) \
        .to_pandas().iloc[0]
    assert got2["n_a"] == 20 and got2["n_b"] == 20
    assert got2["srm_flag"] == 0 and got2["z2"] == 0.0


def test_dow_chi2_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import dow_chi2

    DAY = 86_400_000_000
    # 1970-01-01 was a Thursday; put 7 events on one weekday and 1 on the
    # next: counts (7, 1) -> chi2_num = 7*(49+1) - 64 = 286, chi2 = 35.75
    rows = [(i, 0 * DAY + i, 1, "a", 0.0) for i in range(7)]
    rows += [(7, 1 * DAY, 1, "a", 0.0)]
    df = _events(rows)
    got = dow_chi2(ray.data.from_pandas(df).repartition(2), n_buckets=4) \
        .to_pandas().iloc[0]
    assert got["n"] == 8
    assert got["chi2_num"] == 286
    assert got["chi2"] == 35.75

    # perfectly uniform week -> chi2 0
    rows = [(i, i * DAY, 1, "b", 0.0) for i in range(7)]
    got2 = dow_chi2(ray.data.from_pandas(_events(rows)), n_buckets=4) \
        .to_pandas().iloc[0]
    assert got2["chi2_num"] == 0 and got2["chi2"] == 0.0


def test_community_modularity_planted(ray_session):
    from tcx2graph_jl_ray.stages.analysis import community_modularity

    # two clean communities: {a1,a2,a3} fully wired (3 edges), {b1,b2}
    # (1 edge), one cross edge a1-b1. m=5.
    # A: e_in=3, d = 2+2+3=7 -> q_num = 4*5*3 - 49 = 11
    # B: e_in=1, d = 3+... b1 deg 2 (b2 + a1), b2 deg 1 -> d=3 ->
    #    q_num = 20 - 9 = 11
    # Q = 22/100 = 0.22
    labels = pd.DataFrame({
        "entity_id": ["a1", "a2", "a3", "b1", "b2"],
        "kb_region": ["A", "A", "A", "B", "B"],
        "round": pd.array([0] * 5, dtype="int64"),
    })
    edges = pd.DataFrame({
        "src": ["a1", "a1", "a2", "b1", "a1"],
        "dst": ["a2", "a3", "a3", "b2", "b1"],
    })
    got = community_modularity(
        ray.data.from_pandas(labels), ray.data.from_pandas(edges),
        n_buckets=4,
    ).to_pandas().set_index("kb_region")
    assert got.loc["A", "e_in"] == 3 and got.loc["A", "d_sum"] == 7
    assert got.loc["B", "e_in"] == 1 and got.loc["B", "d_sum"] == 3
    assert got.loc["A", "q_num_c"] == 11 and got.loc["B", "q_num_c"] == 11
    assert (got["modularity"] == 0.22).all()
    assert got.loc["A", "n_nodes"] == 3 and got.loc["B", "n_nodes"] == 2


def test_ivf_probe_curve_monotone(ray_session):
    """Recall must be non-decreasing in nprobe and hit 1.0 when every cell
    is probed (probing all cells == brute force)."""
    from tcx2graph_jl_ray.stages.ann import ivf_probe_curve

    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = ivf_probe_curve(
        ds, "/root/testdata/sf0.001", n_queries=4, k=5,
        nprobes=(1, 4, 16),
    ).to_pandas().sort_values("nprobe").reset_index(drop=True)
    r = got["recall"].to_numpy()
    assert (np.diff(r) >= 0).all()
    assert r[-1] == 1.0  # nprobe = n_cells probes everything
    assert got["n_hits"].dtype == np.int64


def test_peak_concurrency_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import peak_concurrency

    US = 1_000_000
    # three users, gap 10s => each user one session:
    #   u1: [0, 20s], u2: [10s, 15s], u3: [30s, 31s]
    # concurrency: 1 at 0; 2 at 10s..15s; 1 after; peak 2 at t=10s
    rows = [
        (0, 0, 1, "a", 0.0), (1, 20 * US, 1, "a", 0.0),
        (2, 10 * US, 2, "a", 0.0), (3, 15 * US, 2, "a", 0.0),
        (4, 30 * US, 3, "a", 0.0), (5, 31 * US, 3, "a", 0.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                     "event_type", "value"])
    df = pd.DataFrame({
        "event_id": df["event_id"].astype("int64"),
        "ts": pd.to_datetime(df["ts_us"], unit="us"),
        "user_id": df["user_id"].astype("int64"),
        "event_type": df["event_type"],
        "value": df["value"].astype("float64"),
    })
    got = peak_concurrency(
        ray.data.from_pandas(df).repartition(3), gap_s=25.0, n_buckets=4
    ).to_pandas().iloc[0]
    assert got["n_sessions"] == 3
    assert got["peak_concurrency"] == 2
    assert got["peak_at_us"] == 10 * US


def test_snapshot_vocab_drift_planted(ray_session):
    from tcx2graph_jl_ray.stages.text import snapshot_vocab_drift

    # old snapshot (even ids): "a a b"; new (odd ids): "a c"
    # N1=3, N2=2; per word |c1*N2 - c2*N1|: a |4-3|=1, b |2-0|=2, c |0-3|=3
    # tv_num = 6; TV = 6/(2*3*2) = 0.5
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype="int64"),
        "text": ["a a b", "a c"],
        "lang": ["en"] * 2,
        "source": ["s"] * 2,
        "n_chars": np.array([5, 3], dtype="int64"),
    })
    got = snapshot_vocab_drift(
        ray.data.from_pandas(docs).repartition(2), n_buckets=4
    ).to_pandas().iloc[0]
    assert got["n_tokens_old"] == 3 and got["n_tokens_new"] == 2
    assert got["tv_num"] == 6
    assert got["tv"] == 0.5

    # identical distributions -> TV 0
    docs2 = docs.copy()
    docs2["text"] = ["a b", "a b"]
    got2 = snapshot_vocab_drift(ray.data.from_pandas(docs2), n_buckets=4) \
        .to_pandas().iloc[0]
    assert got2["tv_num"] == 0 and got2["tv"] == 0.0
