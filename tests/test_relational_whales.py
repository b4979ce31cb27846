"""Planted-whale tests for the round-4c relational salted call sites.

q13/q15/q18 reduce a fact table with `salted_group_apply` before any join;
each test plants one key with rows ≫ the others in a tiny parquet fixture
dir and checks the production operator's output is identical to a plain
pandas reference — the salted two-level split must be invisible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

N_WHALE = 20_000


def _write(tmp_path, name: str, df: pd.DataFrame) -> None:
    df.to_parquet(tmp_path / f"{name}.parquet", index=False)


def test_q18_whale_order(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import q18_large_volume

    li = pd.DataFrame(
        {
            "l_orderkey": [1] * N_WHALE + [2, 2, 3],
            "l_quantity": [1.0] * N_WHALE + [10.0, 20.0, 400.0],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [7, 8, 7],
            "o_orderdate": pd.to_datetime(
                ["1996-01-01", "1996-02-01", "1996-03-01"]
            ),
            "o_totalprice": [100.5, 200.25, 300.75],
        }
    )
    cust = pd.DataFrame({"c_custkey": [7, 8], "c_name": ["ann", "bob"]})
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "customer", cust)

    out = (
        q18_large_volume(str(tmp_path), min_qty=300)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    # whale order 1: 20000 qty > 300; order 3: 400 > 300; order 2: 30 no
    assert out["o_orderkey"].tolist() == [1, 3]
    assert out["total_qty"].tolist() == [N_WHALE, 400]
    assert out["c_name"].tolist() == ["ann", "ann"]
    assert out["o_orderdate"].tolist() == ["1996-01-01", "1996-03-01"]
    assert out["o_totalprice"].tolist() == [100.5, 300.75]


def test_q15_whale_supplier_and_ties(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import q15_top_supplier

    # whale supplier 1: N_WHALE rows of 1.00 at 0% discount = N_WHALE dollars
    # supplier 2 ties exactly with one big row; supplier 3 is below
    li = pd.DataFrame(
        {
            "l_suppkey": [1] * N_WHALE + [2, 3],
            "l_shipdate": pd.to_datetime(["1996-02-01"] * (N_WHALE + 2)),
            "l_extendedprice": [1.0] * N_WHALE + [float(N_WHALE), 5.0],
            "l_discount": [0.0] * (N_WHALE + 2),
        }
    )
    sup = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_name": ["s1", "s2", "s3"]}
    )
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "supplier", sup)

    out = (
        q15_top_supplier(
            str(tmp_path), date_from="1996-01-01", date_to="1996-04-01"
        )
        .to_pandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    assert out["s_suppkey"].tolist() == [1, 2]  # exact tie kept
    assert out["total_revenue"].tolist() == [float(N_WHALE)] * 2


def test_q13_whale_customer_and_zero_bucket(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import q13_order_counts

    orders = pd.DataFrame(
        {"o_custkey": [1] * N_WHALE + [2, 2, 2]}
    ).assign(o_orderkey=lambda d: np.arange(len(d), dtype="int64"))
    cust = pd.DataFrame({"c_custkey": [1, 2, 3]})  # 3 has no orders
    _write(tmp_path, "orders", orders[["o_custkey"]])
    _write(tmp_path, "customer", cust)

    out = (
        q13_order_counts(str(tmp_path))
        .to_pandas()
        .sort_values("n_orders")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "n_orders": pd.array([0, 3, N_WHALE], dtype="int64"),
            "n_customers": pd.array([1, 1, 1], dtype="int64"),
        }
    )
    pd.testing.assert_frame_equal(
        out.astype({"n_orders": "int64", "n_customers": "int64"}), want
    )


def test_q11_whale_part(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import q11_important_parts

    # whale part 1: N_WHALE rows of $1.00; part 2: one $5.00 row.
    # total = N_WHALE + 5, ppm=1000 -> threshold ~ $20 -> only part 1 kept.
    li = pd.DataFrame(
        {
            "l_partkey": [1] * N_WHALE + [2],
            "l_suppkey": [1] * (N_WHALE + 1),
            "l_extendedprice": [1.0] * N_WHALE + [5.0],
            "l_discount": [0.0] * (N_WHALE + 1),
        }
    )
    sup = pd.DataFrame({"s_suppkey": [1], "s_nationkey": [0]})
    nat = pd.DataFrame({"n_nationkey": [0], "n_name": ["NATION_X"]})
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "supplier", sup)
    _write(tmp_path, "nation", nat)

    out = (
        q11_important_parts(str(tmp_path), nation="NATION_X",
                            fraction_ppm=1000)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert out["p_partkey"].tolist() == [1]
    assert out["value"].tolist() == [float(N_WHALE)]


def test_q20_whale_supplier(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import q20_promo_suppliers

    li = pd.DataFrame(
        {
            "l_partkey": [1] * (N_WHALE + 2),
            "l_suppkey": [1] * N_WHALE + [2, 3],
            "l_quantity": [1.0] * N_WHALE + [400.0, 10.0],
            "l_shipdate": pd.to_datetime(["1997-06-01"] * (N_WHALE + 2)),
        }
    )
    part = pd.DataFrame({"p_partkey": [1], "p_name": ["red bolt"]})
    sup = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_name": ["s1", "s2", "s3"]}
    )
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "part", part)
    _write(tmp_path, "supplier", sup)

    out = (
        q20_promo_suppliers(str(tmp_path), min_qty=300)
        .to_pandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["promo_qty"].tolist() == [N_WHALE, 400]
    assert out["s_name"].tolist() == ["s1", "s2"]


def test_q21_whale_order(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import q21_waiting_suppliers

    # whale order 1: N_WHALE on-time lines from supplier 1 + ONE late line
    # from supplier 2 -> supplier 2 waits. order 2: two late suppliers ->
    # excluded. order 3: single-supplier late -> excluded (needs >= 2).
    li = pd.DataFrame(
        {
            "l_orderkey": [1] * (N_WHALE + 1) + [2, 2, 3],
            "l_suppkey": [1] * N_WHALE + [2, 1, 2, 3],
            "l_shipdate": pd.to_datetime(
                ["1996-01-10"] * N_WHALE
                + ["1996-06-01", "1996-06-01", "1996-06-01", "1996-06-01"]
            ),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_orderstatus": ["F", "F", "F"],
            "o_orderdate": pd.to_datetime(
                ["1996-01-01", "1996-01-01", "1996-01-01"]
            ),
        }
    )
    sup = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_name": ["s1", "s2", "s3"]}
    )
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "supplier", sup)

    out = (
        q21_waiting_suppliers(str(tmp_path), late_days=60)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert out["s_suppkey"].tolist() == [2]
    assert out["numwait"].tolist() == [1]
