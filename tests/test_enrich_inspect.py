"""Cached enrichment actor (ST3), zone-map semi-join (J5), inspection sink
(S7), and the pipeline over a user-provided transcripts parquet."""

import json
import os

import pandas as pd
import ray.data

from tcx2graph_jl_ray.stages.link import CachedEnricher
from tcx2graph_jl_ray.state.manifest import load_manifest


def test_cached_enricher_fetches_once_per_key():
    calls = []

    def fetch(key):
        calls.append(key)
        return {"enriched": f"v_{key}"}

    enricher = CachedEnricher(
        key_fn=lambda b: b["x"] % 3,  # quantized cache key
        fetch_fn=fetch,
    )
    b1 = pd.DataFrame({"x": [0, 1, 2, 3, 4, 5, 6]})
    out1 = enricher(b1)
    assert list(out1["enriched"]) == [f"v_{x % 3}" for x in b1["x"]]
    assert enricher.fetches == 3  # one fetch per distinct key
    # second batch with the same keys: cache hit, no new fetches
    enricher(pd.DataFrame({"x": [7, 8, 9]}))
    assert enricher.fetches == 3
    assert len(calls) == 3


def test_convs_in_window_is_selective(ray_session):
    """Zone-map semi-join must actually drop conversations outside the
    window (at sf scale every conversation spans any window, so selectivity
    is pinned here on synthetic spans)."""
    from tcx2graph_jl_ray.stages.analysis import convs_in_window

    df = pd.DataFrame(
        {
            "conv_id": ["early"] * 2 + ["late"] * 2 + ["spanning"] * 2,
            "turn_idx": pd.array([0, 1] * 3, dtype="int32"),
            "role": ["user"] * 6,
            "text": ["t"] * 6,
            "tool": [None] * 6,
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02",      # early only
                 "2024-06-01", "2024-06-02",      # late only
                 "2024-01-01", "2024-06-02"]      # spans both
            ),
        }
    )
    out = convs_in_window(
        ray.data.from_pandas(df), "2024-03-01", "2024-03-31"
    ).to_pandas()
    assert set(out["conv_id"]) == {"spanning"}
    out2 = convs_in_window(
        ray.data.from_pandas(df), "2024-01-01", "2024-01-03"
    ).to_pandas()
    assert set(out2["conv_id"]) == {"early", "spanning"}


def test_pipeline_drops_null_text_turns(ray_session, tmp_path):
    """Dirty input (FIXTURES.md §3): null-text turns are dropped at the
    normalize stage; the rest of the pipeline runs clean."""
    from tcx2graph_jl_ray.pipelines.kg import run_kg_pipeline

    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": pd.array([0, 1, 2, 3], dtype="int32"),
            "role": ["user", "assistant", "user", "user"],
            "text": ["please look up X and report go", None,
                     "plain words", None],
            "tool": [None] * 4,
            "ts": pd.to_datetime(["2024-01-01"] * 4),
        }
    )
    out = str(tmp_path / "dirty")
    summary = run_kg_pipeline(ray.data.from_pandas(df), out, n_parts=2)
    assert summary["turns"] == 2          # nulls dropped
    assert summary["nodes"] == 2 and summary["edges"] == 1
    assert summary["triples"] == 1        # only the matching user turn


def test_pipeline_on_user_transcripts_parquet(ray_session, tmp_path):
    """A reference user's path: their own transcripts parquet (not derived
    from the sf tables) through the flagship pipeline, plus the inspection
    summary sink."""
    from tcx2graph_jl_ray.pipelines.kg import read_transcripts, run_kg_pipeline

    df = pd.DataFrame(
        {
            "conv_id": ["u1"] * 3 + ["u2"] * 2,
            "turn_idx": pd.array([0, 1, 2, 0, 1], dtype="int32"),
            "role": ["user", "assistant", "tool", "user", "assistant"],
            "text": [
                "please look up Ada Lovelace and report signup",
                "Ada Lovelace is located in LONDON ; Ada Lovelace reported signup",
                "lookup[view] -> ada lovelace k=7",
                "please look up Grace Hopper and report click",
                "Grace Hopper is located in NYC ; Grace Hopper reported click",
            ],
            "tool": [None, None, "view", None, None],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:02",
                 "2024-02-01 00:00", "2024-02-01 00:01"]
            ),
        }
    )
    src = str(tmp_path / "user_transcripts.parquet")
    df.to_parquet(src, index=False)

    out = str(tmp_path / "kg")
    summary = run_kg_pipeline(read_transcripts(src), out, n_parts=4)
    assert summary["turns"] == 5
    assert summary["nodes"] == 5 and summary["edges"] == 3
    # 'Ada Lovelace' + 'ada lovelace' merge; 'Grace Hopper' separate
    assert summary["entities"] == 2
    assert summary["triples"] == 1 + 2 + 1 + 1 + 2  # per-turn template yields

    # inspection summary exists and matches the manifests
    with open(os.path.join(out, "_inspection.json")) as f:
        insp = json.load(f)
    assert insp["triples"]["total_rows"] == summary["triples"]
    assert insp["nodes"]["total_rows"] == 5
    assert load_manifest(os.path.join(out, "nodes"))["lineage"] == {}


def test_cached_enricher_retry_backoff(ray_session):
    """Transient fetch failures are retried with backoff (the reference's
    3-attempt weather fetch); persistent failures propagate."""
    import pandas as pd

    from tcx2graph_jl_ray.stages.link import CachedEnricher

    calls = {"n": 0}

    def flaky(key):
        calls["n"] += 1
        if calls["n"] < 3:  # first two attempts fail
            raise RuntimeError("transient")
        return {"feature": f"v_{key}"}

    enr = CachedEnricher(lambda b: b["k"], flaky, max_attempts=3,
                         backoff_s=0.0)
    out = enr(pd.DataFrame({"k": ["a", "a", "a"]}))
    assert (out["feature"] == "v_a").all()
    assert enr.fetches == 1 and enr.attempts == 3  # 2 failures + 1 success

    def always_fails(key):
        raise RuntimeError("down")

    enr2 = CachedEnricher(lambda b: b["k"], always_fails, max_attempts=2,
                          backoff_s=0.0)
    import pytest

    with pytest.raises(RuntimeError, match="down"):
        enr2(pd.DataFrame({"k": ["x"]}))
    assert enr2.attempts == 2


def test_write_debug_csv_roundtrip(ray_session, tmp_path):
    """S6 CSV/debug sink: directory layout and single-file layout both round-
    trip the data exactly."""
    import pandas as pd
    import ray.data

    from tcx2graph_jl_ray.state.manifest import write_debug_csv

    df = pd.DataFrame({"a": [3, 1, 2], "b": ["x", "y", "z"]})
    ds = ray.data.from_pandas(df)

    d1 = write_debug_csv(ds, str(tmp_path / "csvdir"))
    back = pd.concat(
        [pd.read_csv(os.path.join(d1, f)) for f in sorted(os.listdir(d1))],
        ignore_index=True,
    ).sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df.sort_values("a").reset_index(drop=True))

    p2 = write_debug_csv(ds, str(tmp_path / "csvone"), single_file=True)
    back2 = pd.read_csv(p2).sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(back2, df.sort_values("a").reset_index(drop=True))
