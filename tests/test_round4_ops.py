"""Planted-truth tests for the round-3 scale-hardening work: the exact
distributed global-quantile primitive, whale-key salting, frontier caps,
and budget-switched rank vectors."""

import numpy as np
import pandas as pd
import ray.data


# --- exact_global_quantiles -------------------------------------------------


def _vals_ds(values):
    return ray.data.from_pandas(
        pd.DataFrame({"v": np.asarray(values, dtype="float64")})
    )


def test_quantiles_match_numpy_under_tiny_budget(ray_session):
    """collect_budget far below n forces histogram-refinement rounds; the
    result must still be the exact linearly-interpolated order statistic."""
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [rng.gamma(2.0, 100.0, 5000), rng.normal(1e6, 1.0, 37)]
    )
    n, got = exact_global_quantiles(
        _vals_ds(vals), "v", [0.0, 0.5, 0.95, 1.0], collect_budget=16, n_bins=32
    )
    assert n == len(vals)
    for q in [0.0, 0.5, 0.95, 1.0]:
        want = float(np.quantile(vals, q))
        assert got[q] == want, (q, got[q], want)


def test_quantiles_duplicate_heavy_cannot_split(ray_session):
    """A value repeated beyond the budget cannot be split by bisection; the
    interval-collapse short-circuit must return it exactly."""
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    vals = np.concatenate([np.full(4000, 42.5), [1.0, 99.0]])
    n, got = exact_global_quantiles(
        _vals_ds(vals), "v", [0.5], collect_budget=8, n_bins=16
    )
    assert n == 4002
    assert got[0.5] == 42.5


def test_quantiles_empty_and_single(ray_session):
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    n, got = exact_global_quantiles(_vals_ds([]), "v", [0.5])
    assert n == 0 and np.isnan(got[0.5])
    n, got = exact_global_quantiles(_vals_ds([3.25]), "v", [0.5, 0.95])
    assert n == 1 and got[0.5] == 3.25 and got[0.95] == 3.25


def test_session_stats_budget_path_matches_collected(ray_session, sf_dir):
    """session_stats forced through the refinement path (budget=4) must equal
    the same computation done the collected way."""
    from tcx2graph_jl_ray.stages.window import session_stats, sessionize

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    got = session_stats(ev, 1800.0, collect_budget=4).to_pandas()

    sess = sessionize(ev, 1800.0).to_pandas()
    dur = (
        pd.to_datetime(sess["last_ts"]) - pd.to_datetime(sess["first_ts"])
    ).dt.total_seconds()
    assert int(got["n_sessions"].iloc[0]) == len(sess)
    assert int(got["n_events"].iloc[0]) == int(sess["n_events"].sum())
    assert float(got["median_duration_s"].iloc[0]) == round(
        float(dur.quantile(0.5)), 6
    )
    assert float(got["p95_duration_s"].iloc[0]) == round(
        float(dur.quantile(0.95)), 6
    )
