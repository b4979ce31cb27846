"""Planted tests for the round-4w operator batch (dynamic-threshold
alerts, order header/line billing reconciliation)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def test_dynamic_threshold_planted(ray_session):
    from tcx2graph_jl_ray.stages.window import dynamic_threshold_alerts

    DAY = 86_400_000_000
    # type a: days 0..9 at 1.00/day, day 10 at 50.00 -> day 10 alerts
    # (prior window = 10 days of 100 cents; p95 selection = 100 < 5000);
    # days 1..9 never alert (equal to threshold, strict >); day 11 back at
    # 1.00 does not alert
    rows = []
    for dday in range(10):
        rows.append((dday, dday * DAY, 1, "a", 1.00))
    rows.append((10, 10 * DAY, 1, "a", 50.00))
    rows.append((11, 11 * DAY, 1, "a", 1.00))
    df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                     "event_type", "value"])
    df = pd.DataFrame({
        "event_id": df["event_id"].astype("int64"),
        "ts": pd.to_datetime(df["ts_us"], unit="us"),
        "user_id": df["user_id"].astype("int64"),
        "event_type": df["event_type"],
        "value": df["value"].astype("float64"),
    })
    got = dynamic_threshold_alerts(
        ray.data.from_pandas(df).repartition(3),
        lookback_days=28, min_prior=8, q=0.95, n_buckets=4,
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["day"] == "1970-01-11"
    assert r["value_cents"] == 5000
    assert r["thr_cents"] == 100
    assert r["n_prior"] == 10
    for c in ("value_cents", "thr_cents", "n_prior"):
        assert got[c].dtype == np.int64


def test_header_line_reconcile_planted(ray_session, tmp_path):
    from tcx2graph_jl_ray.stages.relational import header_line_reconcile

    # order 1 (status F): one line 10.00, 10% disc, 5% tax ->
    #   lines_s6 = 1000 * 90 * 105 = 9_450_000 (= $9.45); header 9.45 ->
    #   gap 0, within $1
    # order 2 (status F): header 100.00, line worth $9.45 -> gap $90.55
    # order 3 (status O): header 5.00, NO lines -> orphan
    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2, 3], dtype="int64"),
        "o_custkey": np.array([1, 1, 1], dtype="int64"),
        "o_orderstatus": ["F", "F", "O"],
        "o_totalprice": np.array([9.45, 100.00, 5.00], dtype="float64"),
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
        "o_orderpriority": ["1-URGENT"] * 3,
    })
    lineitem = pd.DataFrame({
        "l_orderkey": np.array([1, 2], dtype="int64"),
        "l_partkey": np.array([1, 1], dtype="int64"),
        "l_suppkey": np.array([1, 1], dtype="int64"),
        "l_linenumber": np.array([1, 1], dtype="int32"),
        "l_quantity": np.array([1.0, 1.0], dtype="float64"),
        "l_extendedprice": np.array([10.00, 10.00], dtype="float64"),
        "l_discount": np.array([0.10, 0.10], dtype="float64"),
        "l_tax": np.array([0.05, 0.05], dtype="float64"),
        "l_returnflag": ["N", "N"],
        "l_linestatus": ["O", "O"],
        "l_shipdate": pd.to_datetime(["2024-01-02"] * 2),
    })
    orders.to_parquet(tmp_path / "orders.parquet")
    lineitem.to_parquet(tmp_path / "lineitem.parquet")
    got = header_line_reconcile(str(tmp_path), n_buckets=4) \
        .to_pandas().set_index("o_orderstatus")
    f = got.loc["F"]
    assert f["n_orders"] == 2 and f["n_with_lines"] == 2
    assert f["n_orphan"] == 0
    assert f["n_within_1usd"] == 1
    # gap for order 2: header 100.00*10^6 - 9.45*10^6 = 90_550_000
    assert f["sum_abs_gap_s6"] == 90_550_000
    assert f["mean_abs_gap_usd"] == np.round(90_550_000 / 2 / 1e6, 6)
    o = got.loc["O"]
    assert o["n_orders"] == 1 and o["n_orphan"] == 1
    assert o["n_with_lines"] == 0 and o["sum_abs_gap_s6"] == 0
    assert o["mean_abs_gap_usd"] == 0.0
