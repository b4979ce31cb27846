"""Planted-whale tests for every production `salted_group_apply` call site.

Round-4 wiring: each site below used to run `bucketed_group_apply`, which
lands EVERY row of a key in one task — a whale key (one conversation / user /
entity / surface / window with most of the rows) sinks that task at corpus
scale. Each test plants one key with rows ≫ the others, runs the production
operator, and checks the output is identical to a plain pandas reference —
the salted two-level split must be invisible in the result.

(The per-task row bound itself is asserted by
test_round4_ops.test_salted_group_apply_matches_unsalted_and_bounds_partials
against the primitive; these tests pin the correctness of each site's
partial/merge factoring.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

N_WHALE = 20_000


def _ds(df: pd.DataFrame, parts: int = 8) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parts)


def test_tumbling_counts_whale_window(ray_session):
    from tcx2graph_jl_ray.stages.window import tumbling_counts

    base = pd.Timestamp("2024-01-01 05:00:00")
    whale_ts = base + pd.to_timedelta(
        np.random.default_rng(7).integers(0, 3600, N_WHALE), unit="s"
    )
    df = pd.DataFrame(
        {
            "event_type": ["click"] * N_WHALE + ["view", "view", "buy"],
            "ts": list(whale_ts)
            + [base + pd.Timedelta(hours=2), base + pd.Timedelta(hours=2, minutes=30),
               base + pd.Timedelta(hours=3)],
            "value": np.round(
                np.random.default_rng(8).uniform(0.01, 5.0, N_WHALE + 3), 2
            ),
        }
    )
    out = (
        tumbling_counts(_ds(df))
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    ref = (
        df.assign(w=df["ts"].dt.floor("h"),
                  c=np.rint(df["value"] * 100).astype("int64"))
        .groupby(["event_type", "w"], as_index=False)
        .agg(n=("c", "size"), c=("c", "sum"))
        .sort_values(["event_type", "w"])
        .reset_index(drop=True)
    )
    assert len(out) == len(ref)
    whale = out[out["event_type"] == "click"]
    assert int(whale["n"].sum()) == N_WHALE
    np.testing.assert_array_equal(
        out["n"].to_numpy(), ref["n"].to_numpy()
    )
    np.testing.assert_array_equal(
        np.rint(out["sum_value"].to_numpy() * 100).astype("int64"),
        ref["c"].to_numpy(),
    )


def test_sliding_counts_whale_window(ray_session):
    from tcx2graph_jl_ray.stages.window import sliding_counts

    base = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame(
        {
            "event_type": ["click"] * N_WHALE,
            "ts": base + pd.to_timedelta(
                np.random.default_rng(3).integers(0, 4 * 3600, N_WHALE),
                unit="s",
            ),
            "value": np.round(
                np.random.default_rng(4).uniform(0.01, 2.0, N_WHALE), 2
            ),
        }
    )
    out = sliding_counts(_ds(df), width_hours=2).to_pandas()
    # every event lands in exactly width_hours windows
    assert int(out["n"].sum()) == 2 * N_WHALE
    # exact-cents reconstruction: total across windows = 2x the cent total
    total_c = int(np.rint(df["value"] * 100).astype("int64").sum())
    assert int(np.rint(out["sum_value"] * 100).astype("int64").sum()) == 2 * total_c


def test_top_event_per_user_whale_user(ray_session):
    from tcx2graph_jl_ray.stages.window import top_event_per_user

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "user_id": [1] * N_WHALE + [2, 3],
            "event_id": np.arange(N_WHALE + 2, dtype="int64"),
            "event_type": ["x"] * (N_WHALE + 2),
            "value": np.concatenate(
                [rng.uniform(0, 100, N_WHALE), [7.5, 3.25]]
            ),
        }
    )
    # plant an exact tie at the max so the event_id tiebreak is exercised
    vmax = df.loc[df["user_id"] == 1, "value"].max()
    df.loc[100, "value"] = vmax
    df.loc[200, "value"] = vmax
    out = top_event_per_user(_ds(df)).to_pandas().sort_values("user_id")
    ref = (
        df.sort_values(["value", "event_id"], ascending=[False, True],
                       kind="mergesort")
        .drop_duplicates("user_id")
        .sort_values("user_id")
    )
    np.testing.assert_array_equal(
        out["event_id"].to_numpy(), ref["event_id"].to_numpy()
    )
    np.testing.assert_array_equal(
        out["value"].to_numpy(), ref["value"].to_numpy()
    )


def test_conv_stats_whale_conversation(ray_session):
    from tcx2graph_jl_ray.stages.analysis import conv_stats

    base = pd.Timestamp("2024-03-01")
    roles = np.array(["user", "assistant", "tool"])
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "conv_id": ["whale"] * N_WHALE + ["tiny"] * 3,
            "turn_idx": np.concatenate(
                [np.arange(N_WHALE), np.arange(3)]
            ).astype("int32"),
            "role": np.concatenate(
                [roles[rng.integers(0, 3, N_WHALE)], ["user", "assistant", "user"]]
            ),
            "text": "t",
            "tool": "",
            "ts": base + pd.to_timedelta(
                np.concatenate([rng.integers(0, 10**6, N_WHALE), [1, 2, 3]]),
                unit="s",
            ),
        }
    )
    out = conv_stats(_ds(df)).to_pandas().set_index("conv_id")
    assert int(out.loc["whale", "n_turns"]) == N_WHALE
    assert int(out.loc["whale", "n_user"]) == int((df["role"][:N_WHALE] == "user").sum())
    w_ts = df["ts"][:N_WHALE]
    assert out.loc["whale", "first_ts"] == w_ts.min()
    assert out.loc["whale", "last_ts"] == w_ts.max()
    assert int(out.loc["whale", "duration_us"]) == int(
        (w_ts.max() - w_ts.min()).value // 1000
    )
    assert int(out.loc["tiny", "n_turns"]) == 3


def test_hot_entities_whale_entity(ray_session):
    from tcx2graph_jl_ray.stages.analysis import hot_entities

    rng = np.random.default_rng(9)
    convs = rng.integers(0, 500, N_WHALE)
    df = pd.DataFrame(
        {
            "entity_id": ["whale"] * N_WHALE + ["cold", "cold"],
            "conv_id": [f"c{i}" for i in convs] + ["c0", "c1"],
        }
    )
    out = hot_entities(_ds(df), min_convs=2).to_pandas().set_index("entity_id")
    assert int(out.loc["whale", "n_convs"]) == len(np.unique(convs))
    assert int(out.loc["whale", "n_turns"]) == N_WHALE
    assert int(out.loc["cold", "n_convs"]) == 2


def test_entity_feature_stats_whale_entity(ray_session):
    from tcx2graph_jl_ray.stages.analysis import entity_feature_stats

    rng = np.random.default_rng(13)
    occ = rng.integers(1, 5, N_WHALE)
    turns = rng.integers(0, 10**6, N_WHALE)
    df = pd.DataFrame(
        {
            "entity_id": ["whale"] * N_WHALE + ["cold"],
            "turn_idx": np.concatenate([turns, [42]]).astype("int32"),
            "n_occurrences": np.concatenate([occ, [2]]).astype("int64"),
        }
    )
    out = entity_feature_stats(_ds(df)).to_pandas().set_index("entity_id")
    assert int(out.loc["whale", "n_rows"]) == N_WHALE
    assert int(out.loc["whale", "min_turn"]) == int(turns.min())
    assert int(out.loc["whale", "max_turn"]) == int(turns.max())
    assert out.loc["whale", "mean_occurrences"] == pytest.approx(
        occ.sum() / N_WHALE, abs=0
    )


def test_distinct_surfaces_whale_norm(ray_session):
    from tcx2graph_jl_ray.stages.canonicalize import distinct_surfaces

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "norm": ["acme corp"] * N_WHALE + ["tiny co"],
            "n_occurrences": np.concatenate(
                [rng.integers(1, 4, N_WHALE), [1]]
            ).astype("int64"),
        }
    )
    out = distinct_surfaces(_ds(df)).to_pandas().set_index("norm")
    assert int(out.loc["acme corp", "n_turns"]) == N_WHALE
    assert int(out.loc["acme corp", "n_mentions"]) == int(
        df["n_occurrences"][:N_WHALE].sum()
    )
    assert int(out.loc["tiny co", "n_turns"]) == 1


def test_vocab_by_source_whale_word(ray_session):
    from tcx2graph_jl_ray.stages.text import vocab_by_source

    # one source whose texts are dominated by a single stopword whale
    texts = ["the the the alpha"] * 2000 + ["beta the"]
    df = pd.DataFrame({"source": ["web"] * len(texts), "text": texts})
    out = vocab_by_source(_ds(df, parts=6)).to_pandas().set_index("source")
    # distinct: the, alpha, beta
    assert int(out.loc["web", "n_distinct_words"]) == 3
    assert int(out.loc["web", "n_words"]) == 2000 * 4 + 2


def test_vocab_approx_within_hll_bound(ray_session):
    """The HLL approximate vocabulary must land within 3x the advertised
    ±1.04/sqrt(2^p) relative error of the exact per-source distinct count
    (and n_words must be exact — it is a plain integer sum)."""
    from tcx2graph_jl_ray.stages.text import vocab_approx_by_source, vocab_by_source

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(5000)]
    texts = [
        " ".join(rng.choice(vocab, size=40)) for _ in range(800)
    ]
    df = pd.DataFrame(
        {"source": ["web"] * 400 + ["books"] * 400, "text": texts}
    )
    ds = _ds(df, parts=6)
    exact = vocab_by_source(ds).to_pandas().set_index("source")
    approx = vocab_approx_by_source(ds, p=14).to_pandas().set_index("source")
    for src in ["web", "books"]:
        e = int(exact.loc[src, "n_distinct_words"])
        a = int(approx.loc[src, "n_distinct_words_approx"])
        bound = float(approx.loc[src, "rel_err_bound"])
        assert abs(a - e) / e <= 3.0 * bound, (src, a, e, bound)
        assert int(approx.loc[src, "n_words"]) == int(exact.loc[src, "n_words"])
