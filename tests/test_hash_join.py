"""Generic co-partitioned hash join: SQL semantics (null keys never match),
inner/left/right parity against DuckDB on planted frames, schema conformance
across the two-sided union, and the error contract."""

import duckdb
import pandas as pd
import pytest
import ray.data

from tcx2graph_jl_ray.functions.join import hash_join


@pytest.fixture()
def frames():
    left = pd.DataFrame(
        {
            "k": pd.array([1, 2, 2, 3, None, 5], dtype="Int64"),
            "lx": list("abcdef"),
            "lv": [1.5, 2.5, 3.5, 4.5, 5.5, 6.5],
        }
    )
    right = pd.DataFrame(
        {
            "k": pd.array([2, 2, 3, 4, None], dtype="Int64"),
            "ry": [10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    return left, right


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str).replace(
            {"nan": "NA", "None": "NA", "<NA>": "NA", "NaT": "NA"}
        )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how,sql_how", [
    ("inner", "JOIN"), ("left", "LEFT JOIN"), ("right", "RIGHT JOIN"),
])
def test_join_matches_duckdb(ray_session, frames, how, sql_how):
    left, right = frames
    got = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), "k",
        how=how, n_buckets=4,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute(
        f"SELECT COALESCE(l.k, r.k) AS k, lx, lv, ry FROM l {sql_how} r USING (k)"
        if how != "inner"
        else f"SELECT l.k AS k, lx, lv, ry FROM l {sql_how} r USING (k)"
    ).fetchdf()
    # outer-join USING in DuckDB keeps the null-key rows of the outer side,
    # same as hash_join's re-emit; compare as strings (NA representations)
    a, b = _norm(got), _norm(exp)
    assert a.columns.tolist() == b.columns.tolist()
    assert len(a) == len(b)
    # nullable-int vs float renderings of k can differ; compare per column
    for c in ("lx", "ry", "lv"):
        assert sorted(a[c]) == sorted(b[c])


def test_join_multi_key_and_dtypes(ray_session):
    left = pd.DataFrame(
        {"a": [1, 1, 2], "b": ["x", "y", "x"], "when": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-03"
             ]).astype("datetime64[us]")}
    )
    right = pd.DataFrame({"a": [1, 2, 2], "b": ["x", "x", "z"], "v": [7, 8, 9]})
    got = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), ["a", "b"],
        n_buckets=2,
    ).to_pandas()
    exp = left.merge(right, on=["a", "b"])
    assert len(got) == len(exp) == 2
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    exp = exp.sort_values(["a", "b"]).reset_index(drop=True)
    assert got["v"].astype("int64").tolist() == exp["v"].tolist()
    # timestamp payload survives the conform/union/shuffle round trip
    assert pd.to_datetime(got["when"]).tolist() == exp["when"].tolist()


def test_join_rejects_overlapping_payload(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    with pytest.raises(ValueError, match="non-key"):
        hash_join(l, r, "k")
    with pytest.raises(ValueError, match="how"):
        hash_join(
            l, r.map_batches(
                lambda b: b.rename(columns={"v": "w"}), batch_format="pandas"
            ), "k", how="outer",
        )
