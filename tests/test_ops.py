"""ANN, windows, cleaning, relational operators."""

import numpy as np
import pandas as pd
import ray.data

from tcx2graph_jl_ray.sources.transcripts import TRANSCRIPTS_SQL, derive_transcripts
from tcx2graph_jl_ray.stages.ann import (
    ANN_BRUTE_SQL_TEMPLATE,
    ann_brute_topk,
    ann_lsh_topk,
)
from tcx2graph_jl_ray.stages.clean import (
    clean_impute,
    missing_stats,
    transcripts_missing_sql,
)
from tcx2graph_jl_ray.stages.relational import (
    Q1_SQL,
    REVENUE_BY_NATION_SQL,
    TOP_CUSTOMERS_SQL_TEMPLATE,
    q1_pricing_summary,
    revenue_by_nation,
    top_customers,
)
from tcx2graph_jl_ray.stages.window import (
    SESSIONIZE_SQL_TEMPLATE,
    TUMBLING_SQL,
    sessionize,
    tumbling_counts,
)
from tests.parity import assert_parity, to_pandas


def _embeddings(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _events(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def test_ann_brute_oracle(ray_session, duck, sf_dir):
    ds = ann_brute_topk(_embeddings(sf_dir), sf_dir, n_queries=8, k=10)
    assert_parity(ds, ANN_BRUTE_SQL_TEMPLATE.format(n_queries=8, k=10), duck)


def test_ann_lsh_oracle(ray_session, duck, sf_dir):
    """The LSH top-k is value-exact vs SQL (deterministic hyperplanes are
    inlined as literals; accept set = buckets within hamming<=2)."""
    from tcx2graph_jl_ray.stages.ann import ann_lsh_sql

    ds = ann_lsh_topk(_embeddings(sf_dir), sf_dir, 8, 10)
    assert_parity(ds, ann_lsh_sql(8, 10), duck)


def test_ann_lsh_recall(ray_session, sf_dir):
    """LSH variant: valid shape, deterministic, and recall vs brute force
    above a floor (it searches only matching buckets)."""
    brute = to_pandas(ann_brute_topk(_embeddings(sf_dir), sf_dir, 8, 10))
    approx = to_pandas(ann_lsh_topk(_embeddings(sf_dir), sf_dir, 8, 10))
    bs = set(map(tuple, brute[["query_id", "vec_id"]].itertuples(index=False)))
    as_ = set(map(tuple, approx[["query_id", "vec_id"]].itertuples(index=False)))
    recall = len(bs & as_) / len(bs)
    assert recall >= 0.2, f"recall {recall}"
    # self-match: every query is its own nearest neighbor in both
    for q in range(8):
        assert (q, q) in as_
    again = to_pandas(ann_lsh_topk(_embeddings(sf_dir), sf_dir, 8, 10))
    assert as_ == set(map(tuple, again[["query_id", "vec_id"]].itertuples(index=False)))


def test_sessionize_oracle(ray_session, duck, sf_dir):
    ds = sessionize(_events(sf_dir), gap_s=1800.0)
    assert_parity(ds, SESSIONIZE_SQL_TEMPLATE.format(gap_s=1800), duck)


def test_tumbling_oracle(ray_session, duck, sf_dir):
    assert_parity(tumbling_counts(_events(sf_dir)), TUMBLING_SQL, duck)


def test_missing_stats_oracle(ray_session, duck, sf_dir):
    ds = missing_stats(
        derive_transcripts(sf_dir),
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    assert_parity(ds, transcripts_missing_sql(TRANSCRIPTS_SQL), duck)


def test_q1_oracle(ray_session, duck, sf_dir):
    assert_parity(q1_pricing_summary(sf_dir), Q1_SQL, duck)


def test_revenue_by_nation_oracle(ray_session, duck, sf_dir):
    assert_parity(revenue_by_nation(sf_dir), REVENUE_BY_NATION_SQL, duck)


def test_top_customers_oracle(ray_session, duck, sf_dir):
    assert_parity(
        top_customers(sf_dir, k=10), TOP_CUSTOMERS_SQL_TEMPLATE.format(k=10), duck
    )


def test_clean_impute_dirty_fixture(ray_session):
    """Dirty transcripts variant (FIXTURES.md §3): all-null column dropped,
    >threshold-null column dropped, all-'unknown' column dropped, per-group
    median/mode impute, final coalesce."""
    n = 40
    df = pd.DataFrame(
        {
            "conv_id": ["a"] * 20 + ["b"] * 20,
            "score": [1.0, None] * 10 + [5.0, None] * 10,  # 50% null numeric
            "label": (["x", None, "x", "x"] * 5) + (["y", None, "y", "y"] * 5),
            "dead": [None] * n,                      # all-null -> dropped
            "mostly_null": [None] * 39 + [1.0],      # 97% null -> dropped
            "unk": ["unknown"] * n,                  # all-unknown -> dropped
        }
    )
    ds = ray.data.from_pandas(df)
    cleaned, report = clean_impute(ds, group_col="conv_id", drop_threshold=0.6)
    out = to_pandas(cleaned)
    assert set(report["dropped"]) == {"dead", "mostly_null", "unk"}
    assert set(out.columns) == {"conv_id", "score", "label"}
    assert out["score"].notna().all() and out["label"].notna().all()
    # per-group medians: group a -> 1.0, group b -> 5.0
    assert (out.loc[out.conv_id == "a", "score"] == 1.0).all()
    assert (out.loc[out.conv_id == "b", "score"] == 5.0).all()
    assert (out.loc[out.conv_id == "a", "label"] == "x").all()
    assert (out.loc[out.conv_id == "b", "label"] == "y").all()


def test_clean_impute_global_fallback_all_null_group(ray_session):
    """Regression for the large-input KeyError: a group whose numeric column
    is entirely null (and whose string column is entirely 'unknown') must fall
    back to the GLOBAL median/mode — computed distributedly, never from a
    driver collect — not crash."""
    df = pd.DataFrame(
        {
            "grp": ["a"] * 4 + ["b"] * 4,
            "score": [None, None, None, None, 2.0, 4.0, 6.0, None],
            "label": ["unknown", None, "unknown", None, "t", "t", "u", None],
        }
    )
    cleaned, report = clean_impute(
        ray.data.from_pandas(df), group_col="grp", drop_threshold=0.9
    )
    out = to_pandas(cleaned).sort_values(["grp", "score"]).reset_index(drop=True)
    # global median of {2,4,6} = 4.0 fills group a; group b's own median fills
    # its null; global mode 't' fills group a's unknowns-only labels
    assert (out.loc[out.grp == "a", "score"] == 4.0).all()
    assert (out.loc[out.grp == "b", "score"].to_numpy() == [2.0, 4.0, 4.0, 6.0]).all()
    assert (out.loc[out.grp == "a", "label"].isin(["unknown", "t"])).all()
    assert (out.loc[out.grp == "a", "label"] == "t").sum() == 2  # the nulls
    assert report["global_fill"]["score"] == 4.0
    assert report["global_fill"]["label"] == "t"


def test_clean_impute_even_count_median_interpolates(ray_session):
    """The distributed global median must interpolate on even counts exactly
    like pandas/DuckDB (mean of the two middle values)."""
    df = pd.DataFrame(
        {
            "grp": ["g1", "g2", "g3", "g4"],
            "score": [1.0, 2.0, 10.0, None],
        }
    )
    _, report = clean_impute(
        ray.data.from_pandas(df), group_col="grp", drop_threshold=0.9
    )
    assert report["global_fill"]["score"] == 2.0  # median of {1,2,10}
    df2 = df.copy()
    df2.loc[3, "score"] = 20.0
    df2["extra"] = [None, None, None, None]
    df2["extra"] = df2["extra"].astype("float64")
    _, report2 = clean_impute(
        ray.data.from_pandas(df2[["grp", "score"]]), group_col="grp",
        drop_threshold=0.9,
    )
    assert report2["global_fill"]["score"] == 6.0  # (2 + 10) / 2


# --- IVF ANN -----------------------------------------------------------------

def test_ann_ivf_oracle(ray_session, duck, sf_dir):
    """Seeded-anchor IVF is value-exact vs the inlined-centroid DuckDB oracle."""
    from tcx2graph_jl_ray.stages.ann import ann_ivf_sql, ann_ivf_topk

    ds = ann_ivf_topk(_embeddings(sf_dir), sf_dir, 8, 10)
    assert_parity(ds, ann_ivf_sql(8, 10), duck)


def test_ann_ivf_full_probe_equals_brute(ray_session, sf_dir):
    """Probing every cell must reproduce the exact brute-force ranking —
    the IVF machinery's correctness invariant independent of cell quality."""
    from tcx2graph_jl_ray.stages.ann import ann_ivf_topk

    brute = to_pandas(ann_brute_topk(_embeddings(sf_dir), sf_dir, 8, 10))
    full = to_pandas(
        ann_ivf_topk(_embeddings(sf_dir), sf_dir, 8, 10, n_cells=16, nprobe=16)
    )
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        brute.sort_values(key).reset_index(drop=True),
        full.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_ann_ivf_trained_centroids_recall(ray_session, sf_dir):
    """Distributed k-means centroids give usable recall at nprobe=4/16, and
    training is deterministic."""
    from tcx2graph_jl_ray.stages.ann import ann_ivf_topk, train_ivf_centroids

    emb = _embeddings(sf_dir)
    cent = train_ivf_centroids(emb, n_cells=16, n_iters=3)
    cent2 = train_ivf_centroids(emb, n_cells=16, n_iters=3)
    assert np.allclose(cent, cent2)
    brute = to_pandas(ann_brute_topk(emb, sf_dir, 8, 10))
    ivf = to_pandas(ann_ivf_topk(emb, sf_dir, 8, 10, centroids=cent, nprobe=4))
    bs = set(zip(brute["query_id"], brute["vec_id"]))
    vs = set(zip(ivf["query_id"], ivf["vec_id"]))
    assert len(bs & vs) / len(bs) >= 0.4


def test_revenue_rollup_oracle(ray_session, duck, sf_dir):
    from tcx2graph_jl_ray.stages.relational import REVENUE_ROLLUP_SQL, revenue_rollup

    assert_parity(revenue_rollup(sf_dir), REVENUE_ROLLUP_SQL, duck)


def test_asof_join_oracle(ray_session, duck, sf_dir):
    from tcx2graph_jl_ray.stages.window import ASOF_JOIN_SQL_TEMPLATE, asof_join_events

    assert_parity(
        asof_join_events(_events(sf_dir)),
        ASOF_JOIN_SQL_TEMPLATE.format(left_type="purchase", right_type="click"),
        duck,
    )


def test_range_join_oracle(ray_session, duck, sf_dir):
    from tcx2graph_jl_ray.stages.window import RANGE_JOIN_SQL_TEMPLATE, range_join_counts

    assert_parity(
        range_join_counts(_events(sf_dir)),
        RANGE_JOIN_SQL_TEMPLATE.format(
            left_type="signup", right_type="error", window_s=600
        ),
        duck,
    )


def test_range_join_boundary_semantics(ray_session):
    """Window is [ts, ts+w): a right event exactly at ts counts, exactly at
    ts+w does not; a window crossing a bucket boundary still counts rights
    in the next bucket."""
    from tcx2graph_jl_ray.stages.window import range_join_counts

    base = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": [
                base + pd.Timedelta(seconds=550),   # L: window 550..1150
                base + pd.Timedelta(seconds=550),   # R at ts -> counts
                base + pd.Timedelta(seconds=700),   # R next bucket -> counts
                base + pd.Timedelta(seconds=1150),  # R at ts+w -> excluded
                base + pd.Timedelta(seconds=400),   # R before -> excluded
            ],
            "event_type": ["signup", "error", "error", "error", "error"],
        }
    )
    out = range_join_counts(
        ray.data.from_pandas(df), "signup", "error", window_s=600
    ).to_pandas()
    assert list(out["event_id"]) == [1] and int(out["n_matches"].iloc[0]) == 2
