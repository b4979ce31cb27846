"""General relational operators over the TPC-H-ish tables: grouped pricing
aggregate, broadcast-join rollups, top-k.

These demonstrate the engine's generic aggregation/join/top-k surface (the
reference's feature-stat aggregates A2/A3 and sort/top-k O1/O2 recast over
relational inputs). Money sums run in EXACT scaled-int64 on both the engine
and oracle sides (``functions/money.py``) so summation order can never flip a
cent at the half-cent boundary; quantities are integral-valued doubles so
their sums and averages are exact in IEEE double.

Patterns: per-batch partial aggregation before every groupby (combiner);
dimension tables broadcast once via ``ray.put``; top-k = grouped partial
top-k + a driver-side final merge of one small table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from tcx2graph_jl_ray.functions.money import (
    cents_i64,
    money_from_cents,
    money_from_scaled4,
    money_from_scaled4_series,
    money_from_scaled4_signed,
    money_from_scaled4_signed_series,
    mul_scaled4,
    rev_scaled4,
    sql_cents,
    sql_money_from_cents_sum,
    sql_money_from_scaled4,
    sql_money_from_scaled4_sum,
    sql_money_from_scaled4_sum_signed,
    sql_mul_scaled4,
    sql_rev_scaled4,
)


def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """Pricing summary by (returnflag, linestatus) over lineitem with
    shipdate <= 1998-09-02 — the classic wide aggregate, pre-aggregated
    per batch. Output: l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, avg_qty, n."""
    cutoff = pd.Timestamp("1998-09-02")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["l_shipdate"] <= cutoff]
        g = pd.DataFrame(
            {
                "l_returnflag": keep["l_returnflag"],
                "l_linestatus": keep["l_linestatus"],
                "qty": keep["l_quantity"],
                "base_c": cents_i64(keep["l_extendedprice"]),
                "disc_s": rev_scaled4(
                    keep["l_extendedprice"], keep["l_discount"]
                ),
            }
        ).groupby(["l_returnflag", "l_linestatus"], sort=False)
        agg = g.agg(
            sum_qty=("qty", "sum"), base_c=("base_c", "sum"),
            disc_s=("disc_s", "sum"), n=("qty", "size"),
        )
        return agg.reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        sum_qty = float(g["sum_qty"].sum())
        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "l_linestatus": [g["l_linestatus"].iloc[0]],
                "sum_qty": [sum_qty],
                "sum_base_price": [money_from_cents(g["base_c"].sum())],
                "sum_disc_price": [money_from_scaled4(g["disc_s"].sum())],
                "avg_qty": [sum_qty / n],
                "n": pd.array([n], dtype="int64"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(final, batch_format="pandas")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  SUM(l_quantity) AS sum_qty,
  {sql_money_from_cents_sum(sql_cents('l_extendedprice'))} AS sum_base_price,
  {sql_money_from_scaled4_sum(sql_rev_scaled4())} AS sum_disc_price,
  SUM(l_quantity) / COUNT(*) AS avg_qty,
  CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Order revenue rolled up to the customer's nation: the dimension chain
    customer->nation (small) is broadcast; only orders stream. Output:
    n_name, revenue, n_orders."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    lookup_ref = ray.put(dict(zip(dim["c_custkey"], dim["n_name"])))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    class _Partial:
        def __init__(self, ref):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n_name = batch["o_custkey"].map(self.lookup)
            g = pd.DataFrame(
                {"n_name": n_name, "price_c": cents_i64(batch["o_totalprice"])}
            ).groupby("n_name", sort=False)
            agg = g.agg(rev_c=("price_c", "sum"), n_orders=("price_c", "size"))
            return agg.reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": [g["n_name"].iloc[0]],
                "revenue": [money_from_cents(g["rev_c"].sum())],
                "n_orders": pd.array([int(g["n_orders"].sum())], dtype="int64"),
            }
        )

    return (
        orders.map_batches(
            _Partial, fn_constructor_args=(lookup_ref,), batch_format="pandas",
            batch_size=65536, concurrency=(1, 4),
        )
        .groupby("n_name")
        .map_groups(final, batch_format="pandas")
    )


REVENUE_BY_NATION_SQL = f"""
SELECT n.n_name AS n_name,
  {sql_money_from_cents_sum(sql_cents('o.o_totalprice'))} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by order spend, with names attached from the broadcast
    dimension. Distributed grouped sum -> small sorted head on the driver
    (the O1/O2 sort-and-keep-top pattern). Output: c_custkey, c_name, spend."""
    import pyarrow.parquet as pq

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(spend_c=cents_i64(batch["o_totalprice"]))
        g = b.groupby("o_custkey", sort=False)["spend_c"].sum()
        return pd.DataFrame(
            {"c_custkey": g.index.to_numpy(), "spend_c": g.to_numpy()}
        )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("c_custkey", sort=False)["spend_c"].sum().reset_index()
        g["c_custkey"] = g["c_custkey"].astype("int64")
        return g

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    spend = bucketed_group_apply(
        orders.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["c_custkey"],
        merge,
    ).to_pandas()  # one row per customer: small
    spend["spend"] = spend["spend_c"].to_numpy(dtype="int64") / 100.0
    top = spend.sort_values(
        ["spend", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    names = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()
    out = top.merge(names, on="c_custkey")
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out[["c_custkey", "c_name", "spend"]].reset_index(drop=True)


def revenue_by_segment(sf_dir: str) -> ray.data.Dataset:
    """Order revenue by customer market segment: the 3-table rollup
    (orders ⋈ customer ⋈ segment) with the dimension chain broadcast.
    Output: c_mktsegment, revenue, n_orders."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    class _Partial:
        def __init__(self, ref):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            seg = batch["o_custkey"].map(self.lookup)
            g = pd.DataFrame(
                {"c_mktsegment": seg, "price_c": cents_i64(batch["o_totalprice"])}
            ).groupby("c_mktsegment", sort=False)
            return g.agg(
                rev_c=("price_c", "sum"), n_orders=("price_c", "size")
            ).reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": [g["c_mktsegment"].iloc[0]],
                "revenue": [money_from_cents(g["rev_c"].sum())],
                "n_orders": pd.array([int(g["n_orders"].sum())], dtype="int64"),
            }
        )

    return (
        orders.map_batches(
            _Partial, fn_constructor_args=(lookup_ref,), batch_format="pandas",
            batch_size=65536, concurrency=(1, 4),
        )
        .groupby("c_mktsegment")
        .map_groups(final, batch_format="pandas")
    )


REVENUE_BY_SEGMENT_SQL = f"""
SELECT c.c_mktsegment AS c_mktsegment,
  {sql_money_from_cents_sum(sql_cents('o.o_totalprice'))} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def median_value_by_type(sf_dir: str) -> ray.data.Dataset:
    """Exact per-group median of event value — the non-decomposable aggregate
    (the reference's median impute stats, src/DataPreprocessing.jl:101-135):
    groups are co-located whole by the bucketed shuffle so the median is
    exact, not sketched (at 10^12 rows per group this becomes a t-digest).
    Output: event_type, median_value, n."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("event_type", sort=False)["value"]
        out = g.agg(median_value="median", n="size").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    return bucketed_group_apply(events, ["event_type"], per_bucket)


MEDIAN_VALUE_SQL = """
SELECT event_type,
       MEDIAN(value) AS median_value,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""


TOP_CUSTOMERS_SQL_TEMPLATE = f"""
WITH spend AS (
  SELECT o_custkey AS c_custkey,
         {sql_money_from_cents_sum(sql_cents('o_totalprice'))} AS spend
  FROM orders GROUP BY o_custkey
)
SELECT CAST(s.c_custkey AS BIGINT) AS c_custkey, c.c_name AS c_name, s.spend
FROM spend s JOIN customer c ON s.c_custkey = c.c_custkey
ORDER BY s.spend DESC, s.c_custkey
LIMIT {{k}}
"""


def revenue_rollup(sf_dir: str) -> ray.data.Dataset:
    """Order revenue at three grains in one result — (region, nation),
    per-region subtotal, grand total — the ROLLUP shape. The combiner runs
    once at the finest grain (one streaming pass over orders, broadcast
    dimension chain); coarser grains are re-aggregated from the tiny
    finest-grain table (25 rows), never from a second scan. 'ALL' marks the
    rolled-up level. Output: r_name, n_name, revenue, n_orders."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    lookup_ref = ray.put(
        {
            "n": dict(zip(dim["c_custkey"], dim["n_name"])),
            "r": dict(zip(dim["c_custkey"], dim["r_name"])),
        }
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    class _Partial:
        def __init__(self, ref):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            g = pd.DataFrame(
                {
                    "r_name": batch["o_custkey"].map(self.lookup["r"]),
                    "n_name": batch["o_custkey"].map(self.lookup["n"]),
                    "price_c": cents_i64(batch["o_totalprice"]),
                }
            ).groupby(["r_name", "n_name"], sort=False)
            return g.agg(
                rev_c=("price_c", "sum"), n_orders=("price_c", "size")
            ).reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "r_name": [g["r_name"].iloc[0]],
                "n_name": [g["n_name"].iloc[0]],
                "rev_c": pd.array([int(g["rev_c"].sum())], dtype="int64"),
                "n_orders": pd.array([int(g["n_orders"].sum())], dtype="int64"),
            }
        )

    leaf = (
        orders.map_batches(
            _Partial, fn_constructor_args=(lookup_ref,), batch_format="pandas",
            batch_size=65536, concurrency=(1, 4),
        )
        .groupby(["r_name", "n_name"])
        .map_groups(final, batch_format="pandas")
    ).to_pandas()  # finest grain: |regions| x |nations| rows — tiny

    # coarser grains re-aggregate the tiny leaf in EXACT integer cents —
    # the display double is produced once per row, identically on both sides
    leaf = leaf.sort_values(["r_name", "n_name"], kind="mergesort")
    by_region = (
        leaf.groupby("r_name", sort=True, as_index=False)
        .agg(rev_c=("rev_c", "sum"), n_orders=("n_orders", "sum"))
        .assign(n_name="ALL")
    )
    grand = pd.DataFrame(
        {
            "r_name": ["ALL"],
            "n_name": ["ALL"],
            "rev_c": pd.array([int(by_region["rev_c"].sum())], dtype="int64"),
            "n_orders": pd.array([int(by_region["n_orders"].sum())], dtype="int64"),
        }
    )
    out = pd.concat(
        [leaf, by_region[["r_name", "n_name", "rev_c", "n_orders"]], grand],
        ignore_index=True,
    )
    out["revenue"] = out["rev_c"].to_numpy(dtype="int64") / 100.0
    out["n_orders"] = out["n_orders"].astype("int64")
    return ray.data.from_pandas(
        out[["r_name", "n_name", "revenue", "n_orders"]].reset_index(drop=True)
    )


REVENUE_ROLLUP_SQL = f"""
SELECT COALESCE(r.r_name, 'ALL') AS r_name,
       COALESCE(n.n_name, 'ALL') AS n_name,
       {sql_money_from_cents_sum(sql_cents('o.o_totalprice'))} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


def value_percentiles_by_type(sf_dir: str) -> ray.data.Dataset:
    """Exact p25/p50/p75/p95 of event value per event_type. Percentiles are
    non-decomposable, so groups compute exact after co-location — the
    median discipline (A9, src/DataPreprocessing.jl:101-135) extended to a
    quantile vector; event_type cardinality is tiny so the shuffle moves a
    handful of groups. Rounded to 6 decimals (pandas' and DuckDB's linear
    interpolation differ in the last ulp).
    Output: event_type, p25, p50, p75, p95."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].dropna()
        qs = v.quantile([0.25, 0.5, 0.75, 0.95], interpolation="linear")
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p25": [float(np.round(qs.loc[0.25], 6))],
                "p50": [float(np.round(qs.loc[0.5], 6))],
                "p75": [float(np.round(qs.loc[0.75], 6))],
                "p95": [float(np.round(qs.loc[0.95], 6))],
            }
        )

    return events.groupby("event_type").map_groups(
        per_type, batch_format="pandas"
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.25), 6) AS p25,
       ROUND(quantile_cont(value, 0.50), 6) AS p50,
       ROUND(quantile_cont(value, 0.75), 6) AS p75,
       ROUND(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY event_type
"""


def q3_shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
) -> pd.DataFrame:
    """TPC-H Q3 shape: top-k urgent orders by pending-lineitem revenue for
    one market segment. The point of this query is the join plan — neither
    orders nor lineitem is a broadcastable side, so BOTH joins run through
    the generic co-partitioned ``hash_join`` (one shuffle each, no driver
    materialization of any input): customer(filtered) ⋈ orders(filtered) on
    custkey, then ⋈ lineitem(filtered) on orderkey. Filters are pushed to
    the reads; revenue aggregates per order inside a bucketed apply; top-k
    is a per-bucket head + a k*n_buckets driver merge.
    Output: l_orderkey, o_orderdate (yyyy-mm-dd), o_orderpriority, revenue."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    cut = pd.Timestamp(cutoff)

    # all three filters are vectorized masks inside the projection
    # map_batches (a per-row .filter() lambda would be the slow Python path)
    def cust_proj(b: pd.DataFrame) -> pd.DataFrame:
        kept = b[b["c_mktsegment"] == segment]
        return pd.DataFrame({"o_custkey": kept["c_custkey"].astype("int64")})

    def orders_proj(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["o_orderdate"] < cut].reset_index(drop=True)

    def line_proj(b: pd.DataFrame) -> pd.DataFrame:
        kept = b[b["l_shipdate"] > cut]
        return pd.DataFrame(
            {
                "l_orderkey": kept["l_orderkey"].astype("int64"),
                "rev_s": rev_scaled4(
                    kept["l_extendedprice"], kept["l_discount"]
                ),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_proj, batch_format="pandas")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_proj, batch_format="pandas")
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(line_proj, batch_format="pandas")

    seg_orders = hash_join(orders, cust, on="o_custkey").map_batches(
        lambda b: pd.DataFrame(
            {
                "l_orderkey": b["o_orderkey"].astype("int64"),
                "o_orderdate": b["o_orderdate"],
                "o_orderpriority": b["o_orderpriority"],
            }
        ),
        batch_format="pandas",
    )
    joined = hash_join(seg_orders, lineitem, on="l_orderkey")

    def per_order(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(
                ["l_orderkey", "o_orderdate", "o_orderpriority"], sort=False
            )["rev_s"]
            .sum()
            .reset_index(name="rev_s")
        )
        g["revenue"] = money_from_scaled4_series(g["rev_s"])
        g = g.drop(columns=["rev_s"])
        # per-bucket head: only k rows per bucket reach the driver
        return g.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    tops = bucketed_group_apply(joined, ["l_orderkey"], per_order).to_pandas()
    out = tops.sort_values(
        ["revenue", "l_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pd.DataFrame(
        {
            "l_orderkey": out["l_orderkey"].astype("int64").to_numpy(),
            "o_orderdate": pd.to_datetime(out["o_orderdate"]).dt.strftime(
                "%Y-%m-%d"
            ).to_numpy(),
            "o_orderpriority": out["o_orderpriority"].to_numpy(),
            "revenue": out["revenue"].astype("float64").to_numpy(),
        }
    ).reset_index(drop=True)


Q3_SQL_TEMPLATE = f"""
WITH agg AS (
  SELECT l.l_orderkey,
         strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o.o_orderpriority,
         {sql_money_from_scaled4_sum(sql_rev_scaled4('l.l_extendedprice', 'l.l_discount'))} AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = '{{segment}}'
    AND o.o_orderdate < TIMESTAMP '{{cutoff}}'
    AND l.l_shipdate > TIMESTAMP '{{cutoff}}'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rn
  FROM agg
)
SELECT l_orderkey, o_orderdate, o_orderpriority, revenue
FROM r WHERE rn <= {{k}}
"""


def copurchase_pairs(
    sf_dir: str, min_support: int = 3, n_buckets: int = 64,
    max_basket: int = 1000,
) -> ray.data.Dataset:
    """Basket analysis over lineitem: pairs of parts appearing in the same
    order at least ``min_support`` times — the same blocked pair-generation
    shape as the entity co-occurrence graph (order = basket = blocking
    key), pruned at the read to the two join columns. Baskets larger than
    ``max_basket`` items are skipped for pair generation (hot-basket guard;
    TPC-H baskets are <= 7 items, so oracle parity is unconditional there).

    Output: part_a, part_b (part_a < part_b), n_orders:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def partial_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates()

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()
        sizes = d.groupby("l_orderkey", sort=False)["l_partkey"].transform("size")
        d = d[sizes <= max_basket]
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame(
            {"part_a": m["l_partkey_x"], "part_b": m["l_partkey_y"]}
        )

    def count_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["part_a", "part_b"], sort=False)
            .size()
            .reset_index(name="n_orders")
        )
        g = g[g["n_orders"] >= min_support]
        g["n_orders"] = g["n_orders"].astype("int64")
        g["part_a"] = g["part_a"].astype("int64")
        g["part_b"] = g["part_b"].astype("int64")
        return g

    distinct = li.map_batches(
        partial_distinct, batch_format="pandas", batch_size=65536
    )
    pairs = bucketed_group_apply(
        distinct, ["l_orderkey"], pairs_in_bucket, n_buckets=n_buckets
    )
    return bucketed_group_apply(
        pairs, ["part_a", "part_b"], count_pairs, n_buckets=n_buckets
    )


COPURCHASE_SQL_TEMPLATE = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT CAST(x.l_partkey AS BIGINT) AS part_a,
       CAST(y.l_partkey AS BIGINT) AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b x JOIN b y
  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
GROUP BY x.l_partkey, y.l_partkey
HAVING COUNT(*) >= {min_support}
"""


def q5_local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H-Q5 shape: revenue from lineitems where the customer and the
    supplier sit in the same nation of one region, grouped by that nation.
    The two BIG joins (orders ⋈ customer on custkey, then ⋈ lineitem on
    orderkey) run through the co-partitioned ``hash_join`` — customer is
    1.5M rows/SF and must not be broadcast at scale. Only supplier→nation
    (10x smaller, the classic small side) plus the nation/region filter
    ship once via ``ray.put``. Reads are pruned to join/filter columns;
    dates filter at the orders read. Revenue rounds to 2 decimals on both
    engine and oracle sides (the repo's float-aggregate convention).

    Output: n_name, revenue:float64, n_items:int64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    nat = nat.merge(
        reg[reg["r_name"] == region], left_on="n_regionkey",
        right_on="r_regionkey",
    )[["n_nationkey", "n_name"]]
    sup_ref = ray.put(
        (
            dict(zip(sup["s_suppkey"], sup["s_nationkey"])),
            dict(zip(nat["n_nationkey"], nat["n_name"])),
        )
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda b: b.loc[
            (b["o_orderdate"] >= pd.Timestamp(date_from))
            & (b["o_orderdate"] < pd.Timestamp(date_to)),
            ["o_orderkey", "o_custkey"],
        ].rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    oc = hash_join(orders, cust, on="c_custkey", n_buckets=n_buckets).map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"})[
            ["l_orderkey", "c_nationkey"]
        ],
        batch_format="pandas",
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    ocl = hash_join(li, oc, on="l_orderkey", n_buckets=n_buckets)

    class _Partial:
        def __init__(self, ref):
            self.sup_nat, self.nat_name = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            s_nat = batch["l_suppkey"].map(self.sup_nat)
            keep = s_nat == batch["c_nationkey"]
            b = batch[keep]
            name = b["c_nationkey"].map(self.nat_name)
            ok = name.notna()
            b, name = b[ok], name[ok]
            rev_s = rev_scaled4(b["l_extendedprice"], b["l_discount"])
            g = pd.DataFrame({"n_name": name, "rev_s": rev_s}).groupby(
                "n_name", sort=False
            )
            agg = g.agg(rev_part=("rev_s", "sum"), n_part=("rev_s", "size"))
            return agg.reset_index()

    parts = ocl.map_batches(
        _Partial, fn_constructor_args=(sup_ref,), batch_format="pandas",
        batch_size=65536, concurrency=(1, 8),
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("n_name", sort=False).agg(
            rev_s=("rev_part", "sum"), n_items=("n_part", "sum")
        ).reset_index()
        g["revenue"] = money_from_scaled4_series(g["rev_s"])
        g["n_items"] = g["n_items"].astype("int64")
        return g[["n_name", "revenue", "n_items"]]

    return bucketed_group_apply(parts, ["n_name"], final, n_buckets=8)


Q5_SQL_TEMPLATE = f"""
SELECT n_name,
       {sql_money_from_scaled4_sum(sql_rev_scaled4())} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = '{{region}}'
  AND o_orderdate >= TIMESTAMP '{{date_from}}'
  AND o_orderdate <  TIMESTAMP '{{date_to}}'
GROUP BY n_name
"""


def q4_order_priority(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H-Q4 shape: orders in a quarter that have AT LEAST ONE returned
    lineitem, counted by priority — the EXISTS semi-join. (The synthetic
    lineitem table has no commit/receipt dates, so the EXISTS predicate is
    ``l_returnflag = 'R'``; the join/dedup shape is Q4's.)

    100 TB shape: the matching lineitems reduce to DISTINCT orderkeys
    per-batch + bucket-side (a combiner, so the shuffle moves unique keys,
    not lineitems), then meet the date-filtered orders in the co-partitioned
    ``hash_join`` — neither fact side is broadcast or driver-materialized.
    The per-priority count is a per-batch partial + tiny final groupby.
    Reference analogue: the bbox semi-join prefilter
    (src/OverlappingSegmentsUtils.jl:126-137) — qualify by existence, then
    aggregate the qualifying set.

    Output: o_orderpriority, order_count:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    ).map_batches(
        lambda b: b.loc[b["l_returnflag"] == "R", ["l_orderkey"]]
        .drop_duplicates()
        .rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
        batch_size=65536,
    )
    keys = bucketed_group_apply(
        li,
        ["o_orderkey"],
        lambda bucket: bucket.drop_duplicates("o_orderkey"),
        n_buckets=n_buckets,
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: b.loc[
            (b["o_orderdate"] >= pd.Timestamp(date_from))
            & (b["o_orderdate"] < pd.Timestamp(date_to)),
            ["o_orderkey", "o_orderpriority"],
        ],
        batch_format="pandas",
    )
    qualified = hash_join(orders, keys, on="o_orderkey", n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("o_orderpriority", sort=False).size()
        return pd.DataFrame(
            {"o_orderpriority": s.index, "n_part": s.to_numpy()}
        )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("o_orderpriority", sort=False)["n_part"].sum()
        return pd.DataFrame(
            {
                "o_orderpriority": s.index,
                "order_count": s.astype("int64").to_numpy(),
            }
        )

    return bucketed_group_apply(
        qualified.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority"],
        final,
        n_buckets=8,
    )


Q4_SQL_TEMPLATE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{date_from}'
  AND o_orderdate <  TIMESTAMP '{date_to}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def mad_outliers_by_type(
    sf_dir: str, k_mad: float = 3.0
) -> ray.data.Dataset:
    """Robust outlier screen per event type: median, MAD (median absolute
    deviation), and the count of values beyond ``k_mad`` MADs — the
    robust-statistics cousin of the mean/std burst screen
    (``entity_bursts``), insensitive to the very outliers it flags. Two
    exact medians per group (non-decomposable, src/DataPreprocessing.jl:
    101-135's impute medians): groups co-locate whole in the bucketed
    shuffle, so both are computed in one vectorized in-group pass (at 10^12
    rows/group this becomes a t-digest pair). The outlier gate compares the
    same IEEE doubles on both sides; medians interpolate identically
    (mid-average) in pandas and DuckDB.

    Output: event_type, median_value, mad, n_outliers:int64, n:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket[bucket["value"].notna()]
        rows = []
        for etype, g in bucket.groupby("event_type", sort=False):
            v = g["value"].to_numpy(dtype="float64")
            med = float(np.median(v))
            dev = np.abs(v - med)
            mad = float(np.median(dev))
            rows.append(
                {
                    "event_type": etype,
                    "median_value": med,
                    "mad": mad,
                    "n_outliers": int((dev > k_mad * mad).sum()),
                    "n": len(v),
                }
            )
        if not rows:  # a bucket whose every value was NULL (dirty inputs)
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype="object"),
                    "median_value": pd.Series([], dtype="float64"),
                    "mad": pd.Series([], dtype="float64"),
                    "n_outliers": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        out = pd.DataFrame(rows)
        out["n_outliers"] = out["n_outliers"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    return bucketed_group_apply(events, ["event_type"], per_bucket, n_buckets=8)


MAD_OUTLIERS_SQL_TEMPLATE = """
WITH med AS (
  SELECT event_type, MEDIAN(value) AS m
  FROM events WHERE value IS NOT NULL GROUP BY event_type
),
mad AS (
  SELECT e.event_type, MEDIAN(ABS(e.value - med.m)) AS mad
  FROM events e JOIN med USING (event_type)
  WHERE e.value IS NOT NULL GROUP BY e.event_type
)
SELECT e.event_type,
       ANY_VALUE(med.m) AS median_value,
       ANY_VALUE(mad.mad) AS mad,
       CAST(SUM(CASE WHEN ABS(e.value - med.m) > {k_mad} * mad.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
WHERE e.value IS NOT NULL
GROUP BY e.event_type
"""


def q7_nation_pairs(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H-Q7 shape: trade volume between DIFFERENT customer/supplier
    nations — revenue per ordered (cust_nation, supp_nation) pair. Same
    join spine as ``q5_local_supplier_volume`` (orders ⋈ customer through
    the co-partitioned ``hash_join``, then ⋈ lineitem; supplier→nation and
    nation names broadcast once as the declared small sides) with the
    EQUALITY filter replaced by an INEQUALITY pair grouping — the
    cross-community edge aggregation of the KG world (PMI edges between
    different components). Revenue rounds to 2 decimals (float-aggregate
    convention).

    Output: cust_nation, supp_nation, revenue:float64, n_items:int64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    sup_ref = ray.put(
        (
            dict(zip(sup["s_suppkey"], sup["s_nationkey"])),
            dict(zip(nat["n_nationkey"], nat["n_name"])),
        )
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda b: b.loc[
            (b["o_orderdate"] >= pd.Timestamp(date_from))
            & (b["o_orderdate"] < pd.Timestamp(date_to)),
            ["o_orderkey", "o_custkey"],
        ].rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    oc = hash_join(orders, cust, on="c_custkey", n_buckets=n_buckets).map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"})[
            ["l_orderkey", "c_nationkey"]
        ],
        batch_format="pandas",
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    ocl = hash_join(li, oc, on="l_orderkey", n_buckets=n_buckets)

    class _Partial:
        def __init__(self, ref):
            self.sup_nat, self.nat_name = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            s_nat = batch["l_suppkey"].map(self.sup_nat)
            keep = s_nat.notna() & (s_nat != batch["c_nationkey"])
            b = batch[keep]
            d = pd.DataFrame(
                {
                    "cust_nation": b["c_nationkey"].map(self.nat_name),
                    "supp_nation": s_nat[keep].map(self.nat_name),
                    "rev_s": rev_scaled4(b["l_extendedprice"], b["l_discount"]),
                }
            )
            g = d.groupby(["cust_nation", "supp_nation"], sort=False)
            agg = g.agg(rev_part=("rev_s", "sum"), n_part=("rev_s", "size"))
            return agg.reset_index()

    parts = ocl.map_batches(
        _Partial, fn_constructor_args=(sup_ref,), batch_format="pandas",
        batch_size=65536, concurrency=(1, 8),
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["cust_nation", "supp_nation"], sort=False).agg(
            rev_s=("rev_part", "sum"), n_items=("n_part", "sum")
        ).reset_index()
        g["revenue"] = money_from_scaled4_series(g["rev_s"])
        g["n_items"] = g["n_items"].astype("int64")
        return g[["cust_nation", "supp_nation", "revenue", "n_items"]]

    return bucketed_group_apply(
        parts, ["cust_nation", "supp_nation"], final, n_buckets=8
    )


Q7_SQL_TEMPLATE = f"""
SELECT cn.n_name AS cust_nation,
       sn.n_name AS supp_nation,
       {sql_money_from_scaled4_sum(sql_rev_scaled4())} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE c_nationkey <> s_nationkey
  AND o_orderdate >= TIMESTAMP '{{date_from}}'
  AND o_orderdate <  TIMESTAMP '{{date_to}}'
GROUP BY cn.n_name, sn.n_name
"""


def revenue_cube(sf_dir: str) -> ray.data.Dataset:
    """Order revenue at ALL FOUR grains of (region, nation) — (r, n), (r,
    ALL), (ALL, n), (ALL, ALL) — the CUBE extension of ``revenue_rollup``
    (which omits the nation-only grain). Identical scale shape: the
    combiner runs ONCE at the finest grain (one streaming pass, broadcast
    dimension chain); every coarser grain re-aggregates the tiny
    finest-grain table, never a rescan.

    Output: r_name, n_name, revenue:float64, n_orders:int64.
    """
    leaf = revenue_rollup(sf_dir).to_pandas()
    # the rollup's revenue doubles are exact cents/100.0, so cents round-trip
    # losslessly; all cube grains then aggregate in exact integer cents
    leaf = leaf.assign(rev_c=cents_i64(leaf["revenue"]))
    fine = leaf[(leaf["r_name"] != "ALL") & (leaf["n_name"] != "ALL")]
    by_nation = (
        fine.groupby("n_name", sort=True, as_index=False)
        .agg(rev_c=("rev_c", "sum"), n_orders=("n_orders", "sum"))
        .assign(r_name="ALL")
    )[["r_name", "n_name", "rev_c", "n_orders"]]
    out = pd.concat(
        [leaf[["r_name", "n_name", "rev_c", "n_orders"]], by_nation],
        ignore_index=True,
    )
    out["revenue"] = out["rev_c"].to_numpy(dtype="int64") / 100.0
    out["n_orders"] = out["n_orders"].astype("int64")
    return ray.data.from_pandas(
        out[["r_name", "n_name", "revenue", "n_orders"]].reset_index(drop=True)
    )


REVENUE_CUBE_SQL = f"""
WITH leaf AS (
  SELECT r.r_name AS r_name, n.n_name AS n_name,
         SUM({sql_cents('o.o_totalprice')}) AS rev_c,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT r_name, n_name, CAST(rev_c AS DOUBLE) / 100.0 AS revenue, n_orders
FROM leaf
UNION ALL
SELECT r_name, 'ALL', CAST(SUM(rev_c) AS DOUBLE) / 100.0,
       CAST(SUM(n_orders) AS BIGINT)
FROM leaf GROUP BY r_name
UNION ALL
SELECT 'ALL', n_name, CAST(SUM(rev_c) AS DOUBLE) / 100.0,
       CAST(SUM(n_orders) AS BIGINT)
FROM leaf GROUP BY n_name
UNION ALL
SELECT 'ALL', 'ALL', CAST(SUM(rev_c) AS DOUBLE) / 100.0,
       CAST(SUM(n_orders) AS BIGINT)
FROM leaf
"""


def q6_forecast_revenue(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.04,
    max_qty: float = 24.0,
) -> ray.data.Dataset:
    """TPC-H-Q6 shape: revenue increase from dropping small discounts — a
    pure filter + global SUM, the simplest pipeline in the suite and the
    one whose whole cost is the pruned scan: only the four filter/measure
    columns leave storage, each batch reduces to one partial, the driver
    sums a handful of floats. Output: revenue:float64, n_items:int64.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    d0, d1 = pd.Timestamp(date_from), pd.Timestamp(date_to)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (
            (batch["l_shipdate"] >= d0)
            & (batch["l_shipdate"] < d1)
            & (batch["l_discount"] >= disc_lo)
            & (batch["l_discount"] <= disc_hi)
            & (batch["l_quantity"] < max_qty)
        )
        b = batch[keep]
        rev_s = mul_scaled4(b["l_extendedprice"], b["l_discount"])
        return pd.DataFrame({"rev_s": [int(rev_s.sum())], "n": [len(b)]})

    parts = ds.map_batches(
        partial, batch_format="pandas", batch_size=65536
    ).to_pandas()  # one row per batch: bounded by batch count, tiny
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "revenue": [money_from_scaled4(parts["rev_s"].sum())],
                "n_items": pd.array([int(parts["n"].sum())], dtype="int64"),
            }
        )
    )


Q6_SQL_TEMPLATE = f"""
SELECT {sql_money_from_scaled4_sum(sql_mul_scaled4('l_extendedprice', 'l_discount'))} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{{date_from}}'
  AND l_shipdate <  TIMESTAMP '{{date_to}}'
  AND l_discount BETWEEN {{disc_lo}} AND {{disc_hi}}
  AND l_quantity < {{max_qty}}
"""


def order_size_distribution(sf_dir: str, n_buckets: int = 16) -> ray.data.Dataset:
    """Distribution of order sizes: how many orders have exactly k
    lineitems — the two-level count (count per key, then histogram of
    counts) behind capacity planning and the degree-distribution shape of
    graph audits. Per-order counts reduce in orderkey buckets (combiner),
    then the tiny count-of-counts reduces again — the second level moves
    one row per distinct size per bucket.

    Output: n_items:int64 (order size), n_orders:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.groupby("l_orderkey", sort=False).size()
        return pd.DataFrame({"l_orderkey": s.index, "c_part": s.to_numpy()})

    def per_order(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("l_orderkey", sort=False)["c_part"].sum()
        h = s.value_counts()
        return pd.DataFrame(
            {"n_items": h.index.astype("int64"), "h_part": h.to_numpy()}
        )

    def hist(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("n_items", sort=False)["h_part"].sum()
        return pd.DataFrame(
            {
                "n_items": s.index.astype("int64"),
                "n_orders": s.astype("int64").to_numpy(),
            }
        )

    per = bucketed_group_apply(
        li.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["l_orderkey"],
        per_order,
        n_buckets=n_buckets,
    )
    return bucketed_group_apply(per, ["n_items"], hist, n_buckets=4)


ORDER_SIZES_SQL = """
WITH c AS (SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem
           GROUP BY l_orderkey)
SELECT CAST(n_items AS BIGINT) AS n_items,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM c GROUP BY n_items
"""


def part_pareto(sf_dir: str, k_top: int = 100, n_buckets: int = 64) -> ray.data.Dataset:
    """Pareto concentration of revenue over parts: rank parts by lineitem
    revenue (desc, partkey tiebreak) and report each top part's cumulative
    revenue share — the 80/20 analysis behind inventory and sampling
    decisions, and the global ORDERED CUMSUM pattern over a REDUCED table.
    Per-part revenue reduces distributed (combiner + partkey buckets); the
    ranked cumsum runs over that reduced table, which is bounded by the
    part DIMENSION, not lineitem volume — the documented driver-side class
    (at 10^9 parts the whale-safe two-phase chunked prefix sum replaces
    it, as in ``docs_pack_sequences``).

    Output: rank:int64, l_partkey:int64, revenue:float64, cum_share:float64
    (top ``k_top`` parts; revenue cents-rounded, share rounded to 6).
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev_s = rev_scaled4(batch["l_extendedprice"], batch["l_discount"])
        s = pd.DataFrame(
            {"l_partkey": batch["l_partkey"], "rev_s": rev_s}
        ).groupby("l_partkey", sort=False)["rev_s"].sum()
        return pd.DataFrame({"l_partkey": s.index, "r_part": s.to_numpy()})

    def reduce_rev(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("l_partkey", sort=False)["r_part"].sum()
        return pd.DataFrame({"l_partkey": s.index, "rev_s": s.to_numpy()})

    per_part = bucketed_group_apply(
        li.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["l_partkey"],
        reduce_rev,
        n_buckets=n_buckets,
    ).to_pandas()  # dimension-bounded: one row per part

    # rank + cumsum run on EXACT scaled ints; the three floats (revenue,
    # cum_share, the division) are each produced once from exact ints, so
    # both sides see bit-identical doubles whatever the summation order was
    total = int(per_part["rev_s"].sum())
    d = per_part.sort_values(
        ["rev_s", "l_partkey"], ascending=[False, True], kind="mergesort"
    ).head(k_top)
    cum = d["rev_s"].to_numpy(dtype="int64").cumsum()
    d = d.assign(
        rank=pd.array(range(1, len(d) + 1), dtype="int64"),
        revenue=money_from_scaled4_series(d["rev_s"]),
        cum_share=np.round(cum / total, 6),
    )
    d["l_partkey"] = d["l_partkey"].astype("int64")
    return ray.data.from_pandas(
        d[["rank", "l_partkey", "revenue", "cum_share"]].reset_index(drop=True)
    )


PART_PARETO_SQL_TEMPLATE = f"""
WITH p AS (
  SELECT l_partkey, SUM({sql_rev_scaled4()}) AS rev_s
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT SUM(rev_s) AS total FROM p),
r AS (
  SELECT l_partkey, rev_s,
         ROW_NUMBER() OVER (ORDER BY rev_s DESC, l_partkey) AS rank,
         SUM(rev_s) OVER (ORDER BY rev_s DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM p
)
SELECT CAST(rank AS BIGINT) AS rank,
       CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST((rev_s + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
       ROUND(CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS cum_share
FROM r, t WHERE rank <= {{k_top}}
"""


def part_min_price_supplier(sf_dir: str) -> ray.data.Dataset:
    """Correlated-min (argmin) join, the TPC-H Q2 shape: for every part, the
    minimum lineitem price and the lowest-keyed supplier that achieves it.

    The textbook plan is MIN-per-part then a join back on
    (partkey, price = min_price); here both passes COLLAPSE into one
    algebraic combiner — each partial keeps, per part, its local
    (min_price, min suppkey at that price), and the salted merge re-applies
    the same rule, so a whale part (one partkey dominating the fact table)
    splits across salt tasks and only one small row per (part, salt) ever
    shuffles. MIN is order-free and exact on the 2-dp money doubles (no
    summation — no scaled-int needed). The part-name dimension broadcasts
    once via ``ray.put``; only lineitem streams.

    Output: p_partkey:int64, p_name, min_price:float64, min_suppkey:int64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).to_pandas()
    name_ref = ray.put(dict(zip(part["p_partkey"], part["p_name"])))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_suppkey"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mp = b.groupby("l_partkey", sort=False)["l_extendedprice"].transform("min")
        at_min = b[b["l_extendedprice"] == mp]
        return (
            at_min.groupby("l_partkey", sort=False)
            .agg(min_price=("l_extendedprice", "min"),
                 min_suppkey=("l_suppkey", "min"))
            .reset_index()
        )

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        mp = b.groupby("l_partkey", sort=False)["min_price"].transform("min")
        at_min = b[b["min_price"] == mp]
        g = (
            at_min.groupby("l_partkey", sort=False)
            .agg(min_price=("min_price", "min"),
                 min_suppkey=("min_suppkey", "min"))
            .reset_index()
        )
        g["min_suppkey"] = g["min_suppkey"].astype("int64")
        return g

    reduced = salted_group_apply(
        li, ["l_partkey"], partial_fn=partial, merge_fn=merge
    )

    class _AttachName:
        def __init__(self, ref):
            self.names = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            # INNER-join semantics like the oracle: a partkey absent from
            # the part dimension drops the row (no-op on FK-clean TPC-H)
            keep = b["l_partkey"].isin(self.names)
            b = b[keep]
            return pd.DataFrame(
                {
                    "p_partkey": b["l_partkey"].astype("int64"),
                    "p_name": b["l_partkey"].map(self.names),
                    "min_price": b["min_price"],
                    "min_suppkey": b["min_suppkey"],
                }
            )

    return reduced.map_batches(
        _AttachName, fn_constructor_args=(name_ref,),
        batch_format="pandas", concurrency=(1, 4),
    )


PART_MIN_PRICE_SQL = """
WITH m AS (
  SELECT l_partkey, MIN(l_extendedprice) AS min_price
  FROM lineitem GROUP BY l_partkey
)
SELECT m.l_partkey AS p_partkey,
       p.p_name AS p_name,
       m.min_price AS min_price,
       CAST(MIN(l.l_suppkey) AS BIGINT) AS min_suppkey
FROM m
JOIN lineitem l
  ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
JOIN part p ON p.p_partkey = m.l_partkey
GROUP BY m.l_partkey, p.p_name, m.min_price
"""


def q10_returned_revenue(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
    k: int = 20,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H-Q10 shape: the top-k customers by revenue lost to RETURNED
    items in a window — the returned-item reporting query. Fact × fact
    (lineitem ⋈ orders) through the co-partitioned ``hash_join``, the
    per-customer revenue reduced by a salted combiner BEFORE customer
    attributes join in (so the shuffle moves per-customer partials, never
    lineitems), customer attached via a second co-partitioned join (the
    customer table is a fact at corpus scale), nation names broadcast.
    Top-k = per-batch head-k partials merged once on the driver (each
    partial is <= k rows; the merge input is k × n_batches, tiny).
    Revenue is exact scaled-int64 (functions/money.py).

    Reference analogue: hotspot argmax over qualified runs
    (src/GPSAnalysis.jl:61-118) — qualify, reduce per key, rank.

    Output: c_custkey, c_name, n_name, revenue:float64, n_items:int64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_ref = ray.put(dict(zip(nat["n_nationkey"], nat["n_name"])))

    d0, d1 = pd.Timestamp(date_from), pd.Timestamp(date_to)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda b: b.loc[
            (b["o_orderdate"] >= d0) & (b["o_orderdate"] < d1),
            ["o_orderkey", "o_custkey"],
        ].rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_returnflag"] == "R"]
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"],
                "rev_s": rev_scaled4(b["l_extendedprice"], b["l_discount"]),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pandas", batch_size=65536)

    joined = hash_join(li, orders, on="l_orderkey", n_buckets=n_buckets)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", sort=False).agg(
            rev_part=("rev_s", "sum"), n_part=("rev_s", "size")
        )
        return g.reset_index().rename(columns={"o_custkey": "c_custkey"})

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("c_custkey", sort=False).agg(
            rev_s=("rev_part", "sum"), n_items=("n_part", "sum")
        ).reset_index()
        g["c_custkey"] = g["c_custkey"].astype("int64")
        g["n_items"] = g["n_items"].astype("int64")
        return g

    per_cust = bucketed_group_apply(
        joined.map_batches(partial, batch_format="pandas"),
        ["c_custkey"],
        merge,
        n_buckets=n_buckets,
    )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    with_name = hash_join(per_cust, cust, on="c_custkey", n_buckets=n_buckets)

    def topk_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["rev_s", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    # <= k rows per batch; the concat is k x n_batches — driver-bounded
    cand = with_name.map_batches(
        topk_partial, batch_format="pandas"
    ).to_pandas()
    top = cand.sort_values(
        ["rev_s", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    nmap = ray.get(nat_ref)
    return pd.DataFrame(
        {
            "c_custkey": top["c_custkey"].astype("int64").to_numpy(),
            "c_name": top["c_name"].to_numpy(),
            "n_name": top["c_nationkey"].map(nmap).to_numpy(),
            "revenue": money_from_scaled4_series(top["rev_s"]),
            "n_items": top["n_items"].astype("int64").to_numpy(),
        }
    ).reset_index(drop=True)


Q10_SQL_TEMPLATE = f"""
SELECT c_custkey,
       c_name,
       n_name,
       {sql_money_from_scaled4_sum(sql_rev_scaled4())} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{{date_from}}'
  AND o_orderdate <  TIMESTAMP '{{date_to}}'
GROUP BY c_custkey, c_name, n_name
ORDER BY SUM({sql_rev_scaled4()}) DESC, c_custkey
LIMIT {{k}}
"""


def q12_late_lines(
    sf_dir: str, late_days: int = 90, n_buckets: int = 64
) -> ray.data.Dataset:
    """TPC-H-Q12 shape: shipping-latency accounting per order priority.
    (The synthetic lineitem has no l_shipmode/l_commitdate, so the Q12
    split is recast as ship-after-order latency: a line is LATE when it
    shipped more than ``late_days`` after the order date.) Fact × fact
    join through the co-partitioned ``hash_join``, then a per-batch
    conditional-count combiner — the shuffle after the join moves one
    partial row per (batch, priority), never lines.

    late_frac is a single double division of two exact int64 counts,
    rounded to 6 — deterministic on both sides regardless of task layout.

    Output: o_orderpriority, late_lines, total_lines:int64, late_frac.
    """
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    joined = hash_join(li, orders, on="l_orderkey", n_buckets=n_buckets)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        late = (
            (b["l_shipdate"] - b["o_orderdate"]).dt.days > late_days
        ).astype("int64")
        g = (
            pd.DataFrame({"o_orderpriority": b["o_orderpriority"], "late": late})
            .groupby("o_orderpriority", sort=False)
            .agg(late_part=("late", "sum"), n_part=("late", "size"))
        )
        return g.reset_index()

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("o_orderpriority", sort=False).agg(
            late_lines=("late_part", "sum"), total_lines=("n_part", "sum")
        ).reset_index()
        g["late_lines"] = g["late_lines"].astype("int64")
        g["total_lines"] = g["total_lines"].astype("int64")
        g["late_frac"] = np.round(
            g["late_lines"].to_numpy(dtype="float64")
            / g["total_lines"].to_numpy(dtype="float64"),
            6,
        )
        return g

    return bucketed_group_apply(
        joined.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority"],
        final,
        n_buckets=8,
    )


Q12_SQL_TEMPLATE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > {late_days}
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
       CAST(COUNT(*) AS BIGINT) AS total_lines,
       ROUND(CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > {late_days}
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS late_frac
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


def q13_order_counts(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """TPC-H-Q13 shape: the customer order-count DISTRIBUTION, including
    the zero bucket — customer LEFT JOIN orders, per-customer count, then
    count-of-counts. The per-customer count is a salted combiner (order
    rows reduce to per-customer partials before any shuffle); the zero
    bucket comes from the co-partitioned LEFT join's null side (customer
    is a fact at corpus scale — never broadcast); the final distribution
    is a tiny second-level groupby over <= max-count distinct keys.

    Output: n_orders:int64, n_customers:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import (
        bucketed_group_apply,
        salted_group_apply,
    )
    from tcx2graph_jl_ray.functions.join import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def o_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("o_custkey", sort=False).size()
        return pd.DataFrame(
            {"c_custkey": s.index.to_numpy(), "cnt_part": s.to_numpy()}
        )

    def o_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("c_custkey", sort=False)["cnt_part"].sum()
        return pd.DataFrame(
            {
                "c_custkey": g.index.to_numpy(),
                "n_orders": g.to_numpy(dtype="int64"),
            }
        )

    counts = salted_group_apply(
        orders.map_batches(o_partial, batch_format="pandas", batch_size=65536),
        ["c_custkey"],
        partial_fn=lambda b: pd.DataFrame(
            {
                "c_custkey": (g := b.groupby("c_custkey", sort=False)[
                    "cnt_part"
                ].sum()).index.to_numpy(),
                "cnt_part": g.to_numpy(),
            }
        ),
        merge_fn=o_merge,
    )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    with_cnt = hash_join(cust, counts, on="c_custkey", how="left",
                         n_buckets=n_buckets)

    def dist_partial(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_orders"].fillna(0).astype("int64")
        s = n.value_counts()
        return pd.DataFrame(
            {"n_orders": s.index.to_numpy(dtype="int64"),
             "nc_part": s.to_numpy()}
        )

    def dist_final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("n_orders", sort=False)["nc_part"].sum()
        return pd.DataFrame(
            {
                "n_orders": g.index.to_numpy(dtype="int64"),
                "n_customers": g.to_numpy(dtype="int64"),
            }
        )

    return bucketed_group_apply(
        with_cnt.map_batches(dist_partial, batch_format="pandas"),
        ["n_orders"],
        dist_final,
        n_buckets=4,
    )


Q13_SQL = """
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
"""


def q14_promo_revenue(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1996-02-01",
) -> ray.data.Dataset:
    """TPC-H-Q14 shape: the promotion-revenue share of one month — what
    fraction of discounted revenue came from PROMO-type parts. The part
    dimension reduces to the promo-partkey SET broadcast once (``ray.put``
    — parts are the declared small side, like q5/q7's supplier map); the
    pruned lineitem scan folds each batch into ONE (promo_s, total_s, n)
    partial in exact scaled-int64, and the driver sums a handful of
    Python ints (arbitrary precision — no double-accumulation even at
    corpus scale). promo_pct is one double expression over the two exact
    totals, identical on both sides.

    Output (one row): promo_revenue, total_revenue, promo_pct, n_items.
    """
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    # partkey -> is_promo; inner-join semantics like the oracle (a partkey
    # absent from the dimension drops the line — no-op on FK-clean TPC-H)
    promo_ref = ray.put(
        dict(zip(part["p_partkey"], (part["p_type"] == "PROMO").tolist()))
    )
    d0, d1 = pd.Timestamp(date_from), pd.Timestamp(date_to)

    class _Partial:
        def __init__(self, ref):
            self.promo = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[(b["l_shipdate"] >= d0) & (b["l_shipdate"] < d1)]
            flag = b["l_partkey"].map(self.promo)
            b = b[flag.notna()]
            is_promo = flag.dropna().astype(bool).to_numpy()
            rev_s = rev_scaled4(b["l_extendedprice"], b["l_discount"])
            return pd.DataFrame(
                {
                    "promo_s": [int(rev_s[is_promo].sum())],
                    "total_s": [int(rev_s.sum())],
                    "n": [len(b)],
                }
            )

    parts = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        _Partial, fn_constructor_args=(promo_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 8),
    ).to_pandas()  # one row per batch — bounded by batch count

    promo_s = int(parts["promo_s"].sum())
    total_s = int(parts["total_s"].sum())
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "promo_revenue": [money_from_scaled4(promo_s)],
                "total_revenue": [money_from_scaled4(total_s)],
                "promo_pct": [
                    float(np.round(100.0 * float(promo_s) / float(total_s), 6))
                    if total_s
                    else 0.0
                ],
                "n_items": pd.array([int(parts["n"].sum())], dtype="int64"),
            }
        )
    )


Q14_SQL_TEMPLATE = f"""
SELECT {sql_money_from_scaled4_sum("CASE WHEN p_type = 'PROMO' THEN " + sql_rev_scaled4() + " ELSE 0 END")} AS promo_revenue,
       {sql_money_from_scaled4_sum(sql_rev_scaled4())} AS total_revenue,
       ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {sql_rev_scaled4()} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({sql_rev_scaled4()}) AS DOUBLE), 6) AS promo_pct,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '{{date_from}}'
  AND l_shipdate <  TIMESTAMP '{{date_to}}'
"""


def q15_top_supplier(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H-Q15 shape: the top supplier(s) by revenue in a quarter, TIES
    KEPT — the grouped-max-then-equality pattern (revenue view + MAX
    subquery). Per-supplier revenue reduces via a salted combiner in
    exact scaled-int64; the global max is a per-batch max partial merged
    on the driver (one int per batch) and broadcast back as a plain
    closure constant; supplier names broadcast once (declared dimension).
    The tie comparison happens on the EXACT scaled ints, so no float
    boundary can split a genuine tie.

    Output: s_suppkey:int64, s_name, total_revenue:float64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    d0, d1 = pd.Timestamp(date_from), pd.Timestamp(date_to)

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= d0) & (b["l_shipdate"] < d1)]
        g = (
            pd.DataFrame(
                {
                    "s_suppkey": b["l_suppkey"],
                    "rev_s": rev_scaled4(b["l_extendedprice"], b["l_discount"]),
                }
            )
            .groupby("s_suppkey", sort=False)["rev_s"]
            .sum()
        )
        return pd.DataFrame(
            {"s_suppkey": g.index.to_numpy(), "rev_s": g.to_numpy()}
        )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("s_suppkey", sort=False)["rev_s"].sum()
        return pd.DataFrame(
            {
                "s_suppkey": g.index.to_numpy(dtype="int64"),
                "rev_s": g.to_numpy(dtype="int64"),
            }
        )

    rev = salted_group_apply(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ).map_batches(li_partial, batch_format="pandas", batch_size=65536),
        ["s_suppkey"],
        partial_fn=merge,
        merge_fn=merge,
    ).materialize()  # consumed twice: max scan + equality filter

    # global max: one int per batch to the driver
    maxes = rev.map_batches(
        lambda b: pd.DataFrame({"m": [int(b["rev_s"].max())]})
        if len(b)
        else pd.DataFrame({"m": pd.array([], dtype="int64")}),
        batch_format="pandas",
    ).to_pandas()
    if not len(maxes):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "s_suppkey": pd.array([], dtype="int64"),
                    "s_name": pd.array([], dtype="string"),
                    "total_revenue": pd.array([], dtype="float64"),
                }
            )
        )
    best = int(maxes["m"].max())

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    name_ref = ray.put(dict(zip(sup["s_suppkey"], sup["s_name"])))

    class _Winners:
        def __init__(self, ref):
            self.names = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["rev_s"] == best]
            # inner-join semantics: suppkey absent from the dimension drops
            b = b[b["s_suppkey"].isin(self.names)]
            return pd.DataFrame(
                {
                    "s_suppkey": b["s_suppkey"].astype("int64"),
                    "s_name": b["s_suppkey"].map(self.names),
                    "total_revenue": money_from_scaled4_series(b["rev_s"]),
                }
            )

    return rev.map_batches(
        _Winners, fn_constructor_args=(name_ref,),
        batch_format="pandas", concurrency=(1, 4),
    )


Q15_SQL_TEMPLATE = f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey, SUM({sql_rev_scaled4()}) AS rev_s
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{{date_from}}'
    AND l_shipdate <  TIMESTAMP '{{date_to}}'
  GROUP BY l_suppkey
)
SELECT rev.s_suppkey,
       s_name,
       {sql_money_from_scaled4("rev_s")} AS total_revenue
FROM rev
JOIN supplier ON supplier.s_suppkey = rev.s_suppkey
WHERE rev_s = (SELECT MAX(rev_s) FROM rev)
"""


def q18_large_volume(
    sf_dir: str, min_qty: int = 300, n_buckets: int = 64
) -> ray.data.Dataset:
    """TPC-H-Q18 shape: large-volume orders — orders whose total lineitem
    quantity exceeds ``min_qty``, with customer identity attached. The
    per-order quantity sum is a salted combiner over exact int64
    (quantities are integral-valued doubles); the HAVING gate fires on the
    reduced table, so only qualifying orderkeys (a vanishing fraction)
    enter the two co-partitioned ``hash_join``s against orders and
    customer — both facts at corpus scale, neither broadcast.

    Output: c_custkey, c_name, o_orderkey, o_orderdate(str),
    o_totalprice, total_qty:int64.
    """
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    def qty_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"],
                    "qty": np.rint(b["l_quantity"].to_numpy()).astype("int64"),
                }
            )
            .groupby("o_orderkey", sort=False)["qty"]
            .sum()
        )
        return pd.DataFrame(
            {"o_orderkey": g.index.to_numpy(), "qty": g.to_numpy()}
        )

    def qty_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("o_orderkey", sort=False)["qty"].sum()
        return pd.DataFrame(
            {
                "o_orderkey": g.index.to_numpy(dtype="int64"),
                "qty": g.to_numpy(dtype="int64"),
            }
        )

    qual = salted_group_apply(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        ).map_batches(qty_partial, batch_format="pandas", batch_size=65536),
        ["o_orderkey"],
        partial_fn=qty_merge,
        merge_fn=qty_merge,
    ).map_batches(
        lambda b: b[b["qty"] > min_qty].rename(columns={"qty": "total_qty"}),
        batch_format="pandas",
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    with_orders = hash_join(qual, orders, on="o_orderkey", n_buckets=n_buckets)
    with_orders = with_orders.map_batches(
        lambda b: b.rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    out = hash_join(with_orders, cust, on="c_custkey", n_buckets=n_buckets)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].astype("int64"),
                "c_name": b["c_name"],
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_orderdate": b["o_orderdate"].dt.strftime("%Y-%m-%d"),
                "o_totalprice": b["o_totalprice"],
                "total_qty": b["total_qty"].astype("int64"),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


Q18_SQL_TEMPLATE = """
SELECT c_custkey,
       c_name,
       o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > {min_qty}
"""


def q22_idle_customers(
    sf_dir: str, cutoff: str = "2000-01-01", n_buckets: int = 64
) -> ray.data.Dataset:
    """TPC-H-Q22 shape: well-funded customers gone idle — customers whose
    balance exceeds the positive-balance average and who placed NO order
    on/after ``cutoff``, grouped by nation. (The synthetic customer has no
    phone country code, so Q22's prefix grouping is recast over nation.)
    Three scale disciplines in one query: the global average is a
    two-int partial (sum of exact cents + count) merged on the driver and
    compared as ONE deterministic double expression; the recent-orderer
    key set reduces by a distinct combiner and ANTI-joins through the
    co-partitioned LEFT join's null side (customer and orders are both
    facts — no broadcast); the per-nation rollup sums exact cents.

    Output: n_name, n_custs:int64, total_acctbal:float64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    # pass 1: global positive-balance average from exact-cent partials
    bal_parts = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_acctbal"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "sum_c": [int(cents_i64(b.loc[b["c_acctbal"] > 0.0,
                                              "c_acctbal"]).sum())],
                "n": [int((b["c_acctbal"] > 0.0).sum())],
            }
        ),
        batch_format="pandas",
        batch_size=65536,
    ).to_pandas()  # one row per batch
    n_pos = int(bal_parts["n"].sum())
    if n_pos == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "n_name": pd.array([], dtype="string"),
                    "n_custs": pd.array([], dtype="int64"),
                    "total_acctbal": pd.array([], dtype="float64"),
                }
            )
        )
    # same expression shape as the oracle: (double(sum_cents)/100.0)/n
    avg_bal = float(int(bal_parts["sum_c"].sum())) / 100.0 / float(n_pos)

    # recent-orderer distinct keys (combiner: unique per batch + per bucket)
    recent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.loc[
            b["o_orderdate"] >= pd.Timestamp(cutoff), ["o_custkey"]
        ].drop_duplicates().rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas",
        batch_size=65536,
    )
    recent_keys = bucketed_group_apply(
        recent,
        ["c_custkey"],
        lambda bucket: bucket.drop_duplicates("c_custkey").assign(
            has_recent=np.int64(1)
        ),
        n_buckets=n_buckets,
    )

    rich = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(
        lambda b: b[b["c_acctbal"] > avg_bal],
        batch_format="pandas",
    )
    marked = hash_join(rich, recent_keys, on="c_custkey", how="left",
                       n_buckets=n_buckets)

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_ref = ray.put(dict(zip(nat["n_nationkey"], nat["n_name"])))

    class _Partial:
        def __init__(self, ref):
            self.names = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["has_recent"].isna()]
            d = pd.DataFrame(
                {
                    "n_name": b["c_nationkey"].map(self.names),
                    "bal_c": cents_i64(b["c_acctbal"]),
                }
            )
            g = d.groupby("n_name", sort=False).agg(
                n_part=("bal_c", "size"), bal_part=("bal_c", "sum")
            )
            return g.reset_index()

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("n_name", sort=False).agg(
            n_custs=("n_part", "sum"), bal_c=("bal_part", "sum")
        ).reset_index()
        g["n_custs"] = g["n_custs"].astype("int64")
        g["total_acctbal"] = g["bal_c"].to_numpy(dtype="int64") / 100.0
        return g[["n_name", "n_custs", "total_acctbal"]]

    return bucketed_group_apply(
        marked.map_batches(
            _Partial, fn_constructor_args=(nat_ref,),
            batch_format="pandas", concurrency=(1, 4),
        ),
        ["n_name"],
        final,
        n_buckets=8,
    )


Q22_SQL_TEMPLATE = """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_acctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '{cutoff}'
      )
GROUP BY n_name
"""


def q8_market_share(
    sf_dir: str,
    region: str = "EUROPE",
    supp_nation: str = "NATION_7",
    p_type: str = "STANDARD",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H-Q8 shape: one supplier nation's market share, per order year,
    of a part type sold into one region's market. The region's nation-key
    set, the type-filtered partkey set and the supplier->nation map are the
    declared small sides (broadcast once via ``ray.put``); orders⋈customer
    and lineitem⋈orders are co-partitioned ``hash_join``s — both facts at
    corpus scale. Numerator and denominator accumulate in exact scaled
    int64, so the share is ONE double expression over two exact ints —
    identical on both sides regardless of partial-sum order.

    Output: o_year:int64, mkt_share:float64 (round 6),
    total_revenue:float64, n_items:int64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.join import hash_join

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    region_keys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    market_nations = set(
        nat.loc[nat["n_regionkey"].isin(region_keys), "n_nationkey"]
    )
    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    type_parts = set(part.loc[part["p_type"] == p_type, "p_partkey"])
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    target_key = nat.loc[nat["n_name"] == supp_nation, "n_nationkey"]
    target = int(target_key.iloc[0]) if len(target_key) else -1
    dims_ref = ray.put(
        (market_nations, type_parts, dict(zip(sup["s_suppkey"], sup["s_nationkey"])))
    )
    d0, d1 = pd.Timestamp(date_from), pd.Timestamp(date_to)

    class _OrdFilter:
        def __init__(self, ref):
            self.market, _, _ = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[(b["o_orderdate"] >= d0) & (b["o_orderdate"] < d1)]
            return pd.DataFrame(
                {
                    "o_orderkey": b["o_orderkey"],
                    "c_custkey": b["o_custkey"],
                    "o_year": b["o_orderdate"].dt.year.astype("int64"),
                }
            )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        _OrdFilter, fn_constructor_args=(dims_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 4),
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    oc = hash_join(orders, cust, on="c_custkey", n_buckets=n_buckets)

    class _MarketOnly:
        def __init__(self, ref):
            self.market, _, _ = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["c_nationkey"].isin(self.market)]
            return pd.DataFrame(
                {"l_orderkey": b["o_orderkey"], "o_year": b["o_year"]}
            )

    oc = oc.map_batches(
        _MarketOnly, fn_constructor_args=(dims_ref,),
        batch_format="pandas", concurrency=(1, 4),
    )

    class _LiFilter:
        def __init__(self, ref):
            _, self.type_parts, _ = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["l_partkey"].isin(self.type_parts)]
            return b[["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]]

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(
        _LiFilter, fn_constructor_args=(dims_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 4),
    )
    joined = hash_join(li, oc, on="l_orderkey", n_buckets=n_buckets)

    class _Partial:
        def __init__(self, ref):
            _, _, self.sup_nat = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            s_nat = b["l_suppkey"].map(self.sup_nat)
            b = b[s_nat.notna()]
            is_target = (s_nat.dropna() == target).to_numpy()
            rev_s = rev_scaled4(b["l_extendedprice"], b["l_discount"])
            d = pd.DataFrame(
                {
                    # inner join keeps no nulls; coerce any nullable Int64
                    "o_year": np.asarray(b["o_year"], dtype="int64"),
                    "num_s": np.where(is_target, rev_s, 0),
                    "den_s": rev_s,
                }
            )
            g = d.groupby("o_year", sort=False).agg(
                num_s=("num_s", "sum"), den_s=("den_s", "sum"),
                n=("den_s", "size"),
            )
            return g.reset_index()

    parts = joined.map_batches(
        _Partial, fn_constructor_args=(dims_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 4),
    ).to_pandas()  # one row per (batch, year): years are calendar-bounded

    if not len(parts):
        return ray.data.from_pandas(pd.DataFrame({
            "o_year": pd.array([], dtype="int64"),
            "mkt_share": pd.array([], dtype="float64"),
            "total_revenue": pd.array([], dtype="float64"),
            "n_items": pd.array([], dtype="int64"),
        }))
    g = parts.groupby("o_year", sort=True).agg(
        num_s=("num_s", "sum"), den_s=("den_s", "sum"), n=("n", "sum")
    ).reset_index()
    return ray.data.from_pandas(pd.DataFrame({
        "o_year": g["o_year"].astype("int64"),
        "mkt_share": np.round(
            g["num_s"].to_numpy(dtype="float64")
            / g["den_s"].to_numpy(dtype="float64"), 6
        ),
        "total_revenue": money_from_scaled4_series(g["den_s"]),
        "n_items": g["n"].astype("int64"),
    }))


Q8_SQL_TEMPLATE = f"""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN sn.n_name = '{{supp_nation}}'
                           THEN {sql_rev_scaled4()} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({sql_rev_scaled4()}) AS DOUBLE), 6) AS mkt_share,
       {sql_money_from_scaled4_sum(sql_rev_scaled4())} AS total_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = cn.n_regionkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE r_name = '{{region}}'
  AND p_type = '{{p_type}}'
  AND o_orderdate >= TIMESTAMP '{{date_from}}'
  AND o_orderdate <  TIMESTAMP '{{date_to}}'
GROUP BY 1
"""


def q9_profit(
    sf_dir: str,
    name_suffix: str = " gear",
    n_buckets: int = 8,
) -> ray.data.Dataset:
    """TPC-H-Q9 shape: profit by supplier nation and (ship) year for one
    product family. The synthetic schema has no partsupp, so unit cost is
    the documented stand-in ``0.1 * p_retailprice`` (1-dp retail price ->
    exact cents; x0.1 at 1e-4 scale is cents*qty*10, an exact int):
    ``amount = extprice*(1-disc) - 0.1*retail*qty`` in scaled int64, which
    CAN be negative — summed exactly and displayed with the signed
    half-away-from-zero rule shared with the oracle. Part cost map and
    supplier->nation map broadcast once; the (nation, year) rollup is
    calendar-x-dimension bounded.

    Output: nation, o_year:int64, profit:float64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_retailprice"],
    ).to_pandas()
    fam = part[part["p_name"].str.endswith(name_suffix)]
    cost_map = dict(zip(fam["p_partkey"], cents_i64(fam["p_retailprice"])))
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    dims_ref = ray.put((
        cost_map,
        dict(zip(sup["s_suppkey"], sup["s_nationkey"])),
        dict(zip(nat["n_nationkey"], nat["n_name"])),
    ))

    class _Partial:
        def __init__(self, ref):
            self.cost, self.sup_nat, self.nat_name = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            retail_c = b["l_partkey"].map(self.cost)
            nation = b["l_suppkey"].map(self.sup_nat).map(self.nat_name)
            keep = retail_c.notna() & nation.notna()
            b, retail_c, nation = b[keep], retail_c[keep], nation[keep]
            qty = np.rint(b["l_quantity"].to_numpy()).astype("int64")
            amount_s = (
                rev_scaled4(b["l_extendedprice"], b["l_discount"])
                - retail_c.to_numpy(dtype="int64") * qty * 10
            )
            d = pd.DataFrame({
                "nation": nation.to_numpy(),
                "o_year": b["l_shipdate"].dt.year.astype("int64").to_numpy(),
                "amount_s": amount_s,
            })
            g = d.groupby(["nation", "o_year"], sort=False)["amount_s"].sum()
            return g.reset_index()

    parts = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        _Partial, fn_constructor_args=(dims_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 8),
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["nation", "o_year"], sort=False)["amount_s"].sum()
        g = g.reset_index()
        return pd.DataFrame({
            "nation": g["nation"],
            "o_year": g["o_year"].astype("int64"),
            "profit": money_from_scaled4_signed_series(g["amount_s"]),
        })

    return bucketed_group_apply(parts, ["nation", "o_year"], final,
                                n_buckets=n_buckets)


Q9_SQL_TEMPLATE = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS o_year,
       {sql_money_from_scaled4_sum_signed(
           sql_rev_scaled4()
           + " - " + sql_cents("p_retailprice")
           + " * CAST(ROUND(l_quantity) AS BIGINT) * 10"
       )} AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%{{name_suffix}}'
GROUP BY 1, 2
"""


def q11_important_parts(
    sf_dir: str,
    nation: str = "NATION_3",
    fraction_ppm: int = 1000,
) -> ray.data.Dataset:
    """TPC-H-Q11 shape: the parts carrying a disproportionate share of one
    nation's supply value (no partsupp in the synthetic schema, so value is
    shipped revenue from that nation's suppliers). Per-part value reduces
    via a salted combiner in exact scaled int64; the global total is a
    per-batch int partial merged as PYTHON ints on the driver (arbitrary
    precision); the HAVING gate ``value*1e6 > total*ppm`` is rewritten to
    the overflow-proof integer form ``value > (total*ppm) // 1e6`` (exact:
    v*1e6 > T  <=>  v > T//1e6 for positive ints), so no per-row product
    can overflow int64 at corpus scale.

    Output: p_partkey:int64, value:float64.
    """
    from tcx2graph_jl_ray.functions.grouping import salted_group_apply
    import pyarrow.parquet as pq

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nkey = nat.loc[nat["n_name"] == nation, "n_nationkey"]
    nation_supps = set(
        sup.loc[sup["s_nationkey"] == int(nkey.iloc[0]), "s_suppkey"]
    ) if len(nkey) else set()
    supp_ref = ray.put(nation_supps)

    class _Partial:
        def __init__(self, ref):
            self.supps = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["l_suppkey"].isin(self.supps)]
            g = pd.DataFrame({
                "p_partkey": b["l_partkey"],
                "value_s": rev_scaled4(b["l_extendedprice"], b["l_discount"]),
            }).groupby("p_partkey", sort=False)["value_s"].sum()
            return pd.DataFrame({
                "p_partkey": g.index.to_numpy(), "value_s": g.to_numpy()
            })

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("p_partkey", sort=False)["value_s"].sum()
        return pd.DataFrame({
            "p_partkey": g.index.to_numpy(dtype="int64"),
            "value_s": g.to_numpy(dtype="int64"),
        })

    values = salted_group_apply(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(
            _Partial, fn_constructor_args=(supp_ref,),
            batch_format="pandas", batch_size=65536, concurrency=(1, 4),
        ),
        ["p_partkey"],
        partial_fn=merge,
        merge_fn=merge,
    ).materialize()  # consumed twice: total scan + threshold filter

    totals = values.map_batches(
        lambda b: pd.DataFrame({"t": [int(b["value_s"].sum())]}),
        batch_format="pandas",
    ).to_pandas()
    total_s = int(totals["t"].sum()) if len(totals) else 0
    thr = (total_s * fraction_ppm) // 1_000_000  # keep iff value_s > thr

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value_s"] > thr]
        return pd.DataFrame({
            "p_partkey": b["p_partkey"].astype("int64"),
            "value": money_from_scaled4_series(b["value_s"]),
        })

    return values.map_batches(finish, batch_format="pandas")


Q11_SQL_TEMPLATE = f"""
WITH v AS (
  SELECT l_partkey AS p_partkey, SUM({sql_rev_scaled4()}) AS value_s
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = '{{nation}}'
  GROUP BY 1
)
SELECT p_partkey,
       {sql_money_from_scaled4("value_s")} AS value
FROM v
WHERE value_s > (SELECT SUM(value_s) * {{fraction_ppm}} // 1000000 FROM v)
"""


def q16_supplier_counts(
    sf_dir: str,
    exclude_brand: str = "Brand#5",
    exclude_type: str = "PROMO",
    sizes: tuple = (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49),
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H-Q16 shape: how many distinct suppliers ship each retained
    (brand, type, size) combo, excluding one brand, one type and
    "complained-about" suppliers (no comment column — negative account
    balance is the documented stand-in). The part-attribute map and the
    excluded-supplier set broadcast once; the COUNT(DISTINCT) reduces by a
    per-batch (combo, suppkey) drop_duplicates combiner, then one bucketed
    shuffle keyed on the combo so each task counts its combos' supplier
    sets vectorized (supplier sets are dimension-bounded).

    Output: p_brand, p_type, p_size:int64, supplier_cnt:int64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).to_pandas()
    keep = part[
        (part["p_brand"] != exclude_brand)
        & (part["p_type"] != exclude_type)
        & (part["p_size"].isin(sizes))
    ]
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    ).to_pandas()
    bad_supps = set(sup.loc[sup["s_acctbal"] < 0.0, "s_suppkey"])
    dims_ref = ray.put((
        dict(zip(keep["p_partkey"], keep["p_brand"])),
        dict(zip(keep["p_partkey"], keep["p_type"])),
        dict(zip(keep["p_partkey"], keep["p_size"])),
        bad_supps,
    ))

    class _Partial:
        def __init__(self, ref):
            self.brand, self.type, self.size, self.bad = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            brand = b["l_partkey"].map(self.brand)
            ok = brand.notna() & ~b["l_suppkey"].isin(self.bad)
            b, brand = b[ok], brand[ok]
            if not len(b):
                return pd.DataFrame({
                    "p_brand": pd.array([], dtype="string"),
                    "p_type": pd.array([], dtype="string"),
                    "p_size": pd.array([], dtype="int64"),
                    "s_suppkey": pd.array([], dtype="int64"),
                })
            d = pd.DataFrame({
                "p_brand": brand.to_numpy(),
                "p_type": b["l_partkey"].map(self.type).to_numpy(),
                "p_size": b["l_partkey"].map(self.size)
                .to_numpy(dtype="int64"),
                "s_suppkey": b["l_suppkey"].to_numpy(),
            })
            return d.drop_duplicates()

    parts = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(
        _Partial, fn_constructor_args=(dims_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 4),
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.drop_duplicates()
            .groupby(["p_brand", "p_type", "p_size"], sort=False)["s_suppkey"]
            .size()
            .reset_index(name="supplier_cnt")
        )
        g["p_size"] = g["p_size"].astype("int64")
        g["supplier_cnt"] = g["supplier_cnt"].astype("int64")
        return g

    return bucketed_group_apply(
        parts, ["p_brand", "p_type", "p_size"], final, n_buckets=n_buckets
    )


Q16_SQL_TEMPLATE = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{exclude_brand}'
  AND p_type <> '{exclude_type}'
  AND p_size IN ({sizes_csv})
  AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
GROUP BY p_brand, p_type, p_size
"""


def q17_small_qty_revenue(
    sf_dir: str,
    brand: str = "Brand#3",
    max_size: int = 10,
) -> ray.data.Dataset:
    """TPC-H-Q17 shape: average yearly revenue lost to small-quantity
    orders of one brand's small parts (no container column — ``p_size <
    max_size`` is the stand-in). Two passes over the partkey-pruned
    lineitem scan: pass 1 reduces per-part (sum_qty, count) — bounded by
    the brand-slice of the part dimension — and broadcasts it; pass 2
    keeps lines with ``qty < 0.2 * avg`` via the EXACT integer cross-
    multiplication ``5*qty*count < sum_qty`` (quantities are integral) and
    sums exact cents. ``avg_yearly = round_half_up(cents/7)`` happens in
    integer space: ``(2*total + 7) // 14`` — bit-identical to the oracle.

    Output (one row): avg_yearly:float64, n_items:int64.
    """
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    pk = set(part.loc[
        (part["p_brand"] == brand) & (part["p_size"] < max_size), "p_partkey"
    ])
    pk_ref = ray.put(pk)

    class _QtyPartial:
        def __init__(self, ref):
            self.pk = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["l_partkey"].isin(self.pk)]
            g = pd.DataFrame({
                "p_partkey": b["l_partkey"],
                "qty": np.rint(b["l_quantity"].to_numpy()).astype("int64"),
            }).groupby("p_partkey", sort=False)["qty"].agg(["sum", "size"])
            return pd.DataFrame({
                "p_partkey": g.index.to_numpy(),
                "sum_qty": g["sum"].to_numpy(),
                "cnt": g["size"].to_numpy(),
            })

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=li_cols[:2]
    ).map_batches(
        _QtyPartial, fn_constructor_args=(pk_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 4),
    ).to_pandas()  # bounded by the brand/size slice of the part dimension
    if len(stats):
        stats = stats.groupby("p_partkey", sort=False).agg(
            sum_qty=("sum_qty", "sum"), cnt=("cnt", "sum")
        )
        thr_ref = ray.put((
            dict(zip(stats.index, stats["sum_qty"])),
            dict(zip(stats.index, stats["cnt"])),
        ))
    else:
        thr_ref = ray.put(({}, {}))

    class _RevPartial:
        def __init__(self, ref):
            self.sum_qty, self.cnt = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            sq = b["l_partkey"].map(self.sum_qty)
            b = b[sq.notna()]
            sq = sq.dropna().to_numpy(dtype="int64")
            cnt = b["l_partkey"].map(self.cnt).to_numpy(dtype="int64")
            qty = np.rint(b["l_quantity"].to_numpy()).astype("int64")
            small = 5 * qty * cnt < sq
            return pd.DataFrame({
                "rev_c": [int(cents_i64(b["l_extendedprice"])[small].sum())],
                "n": [int(small.sum())],
            })

    parts = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=li_cols
    ).map_batches(
        _RevPartial, fn_constructor_args=(thr_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 4),
    ).to_pandas()  # one row per batch
    total_c = int(parts["rev_c"].sum()) if len(parts) else 0
    n = int(parts["n"].sum()) if len(parts) else 0
    return ray.data.from_pandas(pd.DataFrame({
        "avg_yearly": [((2 * total_c + 7) // 14) / 100.0],
        "n_items": pd.array([n], dtype="int64"),
    }))


Q17_SQL_TEMPLATE = f"""
WITH pp AS (
  SELECT p_partkey FROM part
  WHERE p_brand = '{{brand}}' AND p_size < {{max_size}}
),
s AS (
  SELECT l_partkey AS pk,
         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem JOIN pp ON p_partkey = l_partkey
  GROUP BY 1
)
SELECT CAST((2 * COALESCE(SUM({sql_cents('l_extendedprice')}), 0) + 7) // 14
            AS DOUBLE) / 100.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN s ON s.pk = l_partkey
WHERE 5 * CAST(ROUND(l_quantity) AS BIGINT) * cnt < sum_qty
"""


def q19_discounted_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H-Q19 shape: revenue from three OR'd (brand, size-range,
    quantity-range) arm predicates — the disjunctive broadcast-filter sum.
    Part attributes broadcast once; each batch folds to ONE exact
    scaled-int partial; the driver sums Python ints.

    Output (one row): revenue:float64, n_items:int64.
    """
    import pyarrow.parquet as pq

    arms = (
        ("Brand#12", 1, 5, 1, 11),
        ("Brand#20", 1, 10, 10, 20),
        ("Brand#24", 1, 15, 20, 30),
    )
    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    dims_ref = ray.put((
        dict(zip(part["p_partkey"], part["p_brand"])),
        dict(zip(part["p_partkey"], part["p_size"])),
    ))

    class _Partial:
        def __init__(self, ref):
            self.brand, self.size = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            brand = b["l_partkey"].map(self.brand)
            size = b["l_partkey"].map(self.size).to_numpy(dtype="float64")
            qty = np.rint(b["l_quantity"].to_numpy()).astype("int64")
            hit = np.zeros(len(b), dtype=bool)
            for arm_brand, s0, s1, q0, q1 in arms:
                hit |= (
                    (brand == arm_brand).to_numpy()
                    & (size >= s0) & (size <= s1)
                    & (qty >= q0) & (qty <= q1)
                )
            rev_s = rev_scaled4(b["l_extendedprice"], b["l_discount"])
            return pd.DataFrame({
                "rev_s": [int(rev_s[hit].sum())], "n": [int(hit.sum())],
            })

    parts = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(
        _Partial, fn_constructor_args=(dims_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 4),
    ).to_pandas()  # one row per batch
    rev_s = int(parts["rev_s"].sum()) if len(parts) else 0
    n = int(parts["n"].sum()) if len(parts) else 0
    return ray.data.from_pandas(pd.DataFrame({
        "revenue": [money_from_scaled4(rev_s)],
        "n_items": pd.array([n], dtype="int64"),
    }))


Q19_SQL = f"""
SELECT {sql_money_from_scaled4(
    "COALESCE(SUM(" + sql_rev_scaled4() + "), 0)")} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
       AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND CAST(ROUND(l_quantity) AS BIGINT) BETWEEN 20 AND 30)
"""


def q20_promo_suppliers(
    sf_dir: str,
    name_prefix: str = "red ",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    min_qty: int = 300,
) -> ray.data.Dataset:
    """TPC-H-Q20 shape: suppliers who shipped a large volume of one part
    family in a window (no partsupp availqty in the synthetic schema, so
    the gate is shipped quantity > ``min_qty``). The name-prefix partkey
    set broadcasts once; per-supplier quantity reduces via a salted
    combiner in exact int64; the survivor set is supplier-dimension
    bounded, so names attach via one broadcast map.

    Output: s_suppkey:int64, s_name, promo_qty:int64.
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import salted_group_apply

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).to_pandas()
    pk = set(part.loc[part["p_name"].str.startswith(name_prefix), "p_partkey"])
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    dims_ref = ray.put((pk, dict(zip(sup["s_suppkey"], sup["s_name"]))))
    d0, d1 = pd.Timestamp(date_from), pd.Timestamp(date_to)

    class _Partial:
        def __init__(self, ref):
            self.pk, _ = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[
                b["l_partkey"].isin(self.pk)
                & (b["l_shipdate"] >= d0) & (b["l_shipdate"] < d1)
            ]
            g = pd.DataFrame({
                "s_suppkey": b["l_suppkey"],
                "qty": np.rint(b["l_quantity"].to_numpy()).astype("int64"),
            }).groupby("s_suppkey", sort=False)["qty"].sum()
            return pd.DataFrame({
                "s_suppkey": g.index.to_numpy(), "qty": g.to_numpy()
            })

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("s_suppkey", sort=False)["qty"].sum()
        return pd.DataFrame({
            "s_suppkey": g.index.to_numpy(dtype="int64"),
            "qty": g.to_numpy(dtype="int64"),
        })

    qty = salted_group_apply(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        ).map_batches(
            _Partial, fn_constructor_args=(dims_ref,),
            batch_format="pandas", batch_size=65536, concurrency=(1, 4),
        ),
        ["s_suppkey"],
        partial_fn=merge,
        merge_fn=merge,
    )

    class _Finish:
        def __init__(self, ref):
            _, self.names = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[(b["qty"] > min_qty) & b["s_suppkey"].isin(self.names)]
            return pd.DataFrame({
                "s_suppkey": b["s_suppkey"].astype("int64"),
                "s_name": b["s_suppkey"].map(self.names),
                "promo_qty": b["qty"].astype("int64"),
            })

    return qty.map_batches(
        _Finish, fn_constructor_args=(dims_ref,),
        batch_format="pandas", concurrency=(1, 4),
    )


Q20_SQL_TEMPLATE = """
SELECT s_suppkey,
       s_name,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS promo_qty
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN part     ON p_partkey = l_partkey
WHERE p_name LIKE '{name_prefix}%'
  AND l_shipdate >= TIMESTAMP '{date_from}'
  AND l_shipdate <  TIMESTAMP '{date_to}'
GROUP BY 1, 2
HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > {min_qty}
"""


def q21_waiting_suppliers(
    sf_dir: str,
    late_days: int = 60,
    k: int = 20,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H-Q21 shape: suppliers who alone held up multi-supplier orders.
    No commit/receipt dates in the synthetic lineitem, so "late" is
    ``l_shipdate > o_orderdate + late_days``. Finalized ('F') orders join
    lineitem through the co-partitioned ``hash_join`` (both facts); a
    per-batch (order, supplier) dedup combiner feeds ONE bucketed shuffle
    keyed on the order, where each task finds orders with >= 2 distinct
    suppliers of which EXACTLY ONE was late and emits that supplier; the
    per-supplier wait count reduces by a second combiner and the top-k —
    supplier-dimension bounded — sorts on the driver with a deterministic
    (numwait DESC, s_name) tie-break shared with the oracle.

    Output: s_suppkey:int64, s_name, numwait:int64 (top k).
    """
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
    ).map_batches(
        lambda b: b.loc[b["o_orderstatus"] == "F",
                        ["o_orderkey", "o_orderdate"]]
        .rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
        batch_size=65536,
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    joined = hash_join(li, orders, on="l_orderkey", n_buckets=n_buckets)
    lag = pd.Timedelta(days=late_days)

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "late": (b["l_shipdate"] > b["o_orderdate"] + lag).astype("int64"),
        })
        g = d.groupby(["l_orderkey", "l_suppkey"], sort=False)["late"].max()
        return g.reset_index()

    pairs = joined.map_batches(
        pair_partial, batch_format="pandas", batch_size=65536,
    )

    def order_final(bucket: pd.DataFrame) -> pd.DataFrame:
        # re-dedup across batches, then the exactly-one-late gate per order
        g = bucket.groupby(["l_orderkey", "l_suppkey"], sort=False)["late"].max()
        g = g.reset_index()
        stats = g.groupby("l_orderkey", sort=False)["late"].agg(
            ["size", "sum"]
        )
        ok = set(stats.index[(stats["size"] >= 2) & (stats["sum"] == 1)])
        hit = g[(g["late"] == 1) & g["l_orderkey"].isin(ok)]
        cnt = hit.groupby("l_suppkey", sort=False).size()
        return pd.DataFrame({
            "s_suppkey": cnt.index.to_numpy(dtype="int64"),
            "numwait": cnt.to_numpy(dtype="int64"),
        })

    waits = bucketed_group_apply(
        pairs, ["l_orderkey"], order_final, n_buckets=n_buckets
    )

    def wait_merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("s_suppkey", sort=False)["numwait"].sum()
        return pd.DataFrame({
            "s_suppkey": g.index.to_numpy(dtype="int64"),
            "numwait": g.to_numpy(dtype="int64"),
        })

    per_supp = bucketed_group_apply(
        waits, ["s_suppkey"], wait_merge, n_buckets=8
    ).to_pandas()  # supplier-dimension bounded

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = per_supp.merge(sup, on="s_suppkey", how="inner")
    out = out.sort_values(
        ["numwait", "s_name"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return ray.data.from_pandas(pd.DataFrame({
        "s_suppkey": out["s_suppkey"].astype("int64").to_numpy(),
        "s_name": out["s_name"].to_numpy(),
        "numwait": out["numwait"].astype("int64").to_numpy(),
    }))


Q21_SQL_TEMPLATE = """
WITH f AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL {late_days} DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
),
g AS (
  SELECT l_orderkey FROM f
  GROUP BY 1
  HAVING COUNT(*) >= 2 AND SUM(late) = 1
)
SELECT s_suppkey,
       s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM f
JOIN g USING (l_orderkey)
JOIN supplier ON s_suppkey = f.l_suppkey
WHERE late = 1
GROUP BY 1, 2
ORDER BY numwait DESC, s_name
LIMIT {k}
"""


def order_skyline(sf_dir: str) -> ray.data.Dataset:
    """2-D Pareto skyline of orders: the dominance frontier of
    (earlier o_orderdate, higher o_totalprice) — an order survives iff no
    other order is at least as early AND at least as valuable with one
    strict. The classic two-phase distributed skyline (Borzsonyi/Kossmann/
    Stocker, "The Skyline Operator", ICDE'01) specialised to 2-D, where the
    merge step degenerates to a prefix-max staircase:

    (1) one map_batches pass folds each batch to its per-date max price —
        dates are CALENDAR-BOUNDED (the synthetic order span is ~2.4k
        distinct days at ANY scale factor), so every partial is
        dimension-bounded;
    (2) the driver merges partials, sorts the <=2.4k dates once, and takes
        the shifted running max as the staircase (prev_max(d) = best price
        strictly before d);
    (3) the staircase broadcasts via ray.put and a second streaming pass
        keeps rows with price == max_of_own_date AND prev_max < price —
        exact dominance, no all-pairs, no full-table shuffle.

    Survivor semantics: duplicate (date, price) maxima all survive
    (dominance needs one strict coordinate). Comparisons are pure float64
    comparisons (no arithmetic), so engine and DuckDB agree bit-exactly.

    Output: o_orderkey, o_orderdate, o_totalprice.

    Reference analogue: the per-cell best-candidate reduction of the
    overlap grid (src/GraphUtils.jl:46-88) with the grid replaced by the
    date axis and "best" by Pareto dominance.
    """
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def per_date_max(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_orderdate", sort=False)["o_totalprice"].max()
        return pd.DataFrame({
            "o_orderdate": g.index, "my": g.to_numpy(dtype="float64")
        })

    partials = orders.map_batches(
        per_date_max, batch_format="pandas", batch_size=65536
    ).to_pandas()  # <= n_batches x 2.4k rows: calendar-bounded
    if not len(partials):
        return ray.data.from_pandas(pd.DataFrame({
            "o_orderkey": pd.array([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "o_totalprice": pd.array([], dtype="float64"),
        }))
    agg = (
        partials.groupby("o_orderdate", sort=False)["my"].max()
        .sort_index()
    )
    my = agg.to_numpy()
    prev_max = np.empty_like(my)
    prev_max[0] = -np.inf
    np.maximum.accumulate(my[:-1], out=prev_max[1:])
    stair_ref = ray.put({
        d: (m, p) for d, m, p in zip(agg.index, my, prev_max)
    })

    class _Keep:
        def __init__(self, ref):
            self.stair = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            mp = b["o_orderdate"].map(self.stair)
            my_b = np.fromiter(
                (t[0] for t in mp), dtype="float64", count=len(b)
            )
            pm_b = np.fromiter(
                (t[1] for t in mp), dtype="float64", count=len(b)
            )
            y = b["o_totalprice"].to_numpy()
            return b[(y == my_b) & (pm_b < y)]

    return orders.map_batches(
        _Keep, fn_constructor_args=(stair_ref,),
        batch_format="pandas", batch_size=65536, concurrency=(1, 4),
    )


ORDER_SKYLINE_SQL = """
WITH pts AS (
  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
),
agg AS (
  SELECT o_orderdate AS x, MAX(o_totalprice) AS my FROM pts GROUP BY x
),
cum AS (
  SELECT x, my,
         MAX(my) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pm
  FROM agg
)
SELECT p.o_orderkey, p.o_orderdate, p.o_totalprice
FROM pts p JOIN cum c ON p.o_orderdate = c.x
WHERE p.o_totalprice = c.my AND (c.pm IS NULL OR c.pm < p.o_totalprice)
"""


def order_gaps(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """Per-customer order-sequence window statistics — the LAG/ROW_NUMBER/
    running-MAX window-function family over the orders fact: each order's
    rank within its customer, days since the customer's previous order
    (-1 for the first), and whether it set a new personal spend record.

    Scale shape: ONE keyed shuffle (customer streams co-locate whole in
    custkey hash buckets via ``bucketed_group_apply``), then every window
    derives from vectorized in-group shift/cumcount/cummax — the
    ``sessionize``/``tool_stats`` discipline on the relational side. Record
    detection compares exact integer cents (functions/money.py), never
    floats. Output: o_custkey, o_orderkey, order_rank, gap_days,
    record_price (all int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def per_cust(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        g = d.groupby("o_custkey", sort=False)
        day = pd.to_datetime(d["o_orderdate"]).dt.floor("D")
        prev_day = day.groupby(d["o_custkey"], sort=False).shift()
        gap = (day - prev_day).dt.days
        price_c = pd.Series(cents_i64(d["o_totalprice"]), index=d.index)
        prior_max = (
            price_c.groupby(d["o_custkey"], sort=False).cummax()
            .groupby(d["o_custkey"], sort=False).shift()
        )
        return pd.DataFrame(
            {
                "o_custkey": d["o_custkey"].astype("int64"),
                "o_orderkey": d["o_orderkey"].astype("int64"),
                "order_rank": (g.cumcount() + 1).astype("int64"),
                "gap_days": gap.fillna(-1).astype("int64"),
                "record_price": (
                    prior_max.isna() | (price_c > prior_max)
                ).astype("int64"),
            }
        )

    return bucketed_group_apply(
        orders, ["o_custkey"], per_cust, n_buckets=n_buckets
    )


ORDER_GAPS_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_custkey, o_orderkey,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_rank,
  CAST(COALESCE(
    date_diff('day', LAG(o_orderdate) OVER w, o_orderdate), -1
  ) AS BIGINT) AS gap_days,
  CAST(CASE WHEN MAX(cents) OVER (
         w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ) IS NULL
       OR cents > MAX(cents) OVER (
         w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       )
       THEN 1 ELSE 0 END AS BIGINT) AS record_price
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def cohort_ltv(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """Customer lifetime value by acquisition cohort: customers grouped by
    the month of their FIRST order, with cohort size, exact total revenue,
    and average LTV — the cohort economics table next to
    ``events_retention``'s engagement cohorts.

    Shape: one custkey-keyed shuffle (first month + lifetime cents per
    customer, both order-free reductions), then a month-cardinality-bounded
    cohort reduce. Revenue sums in exact integer cents; avg_ltv is ONE
    shared double expression (cents / n / 100, rounded 2) on both sides.
    Output: cohort_month, n_customers, revenue, avg_ltv."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64, money_from_cents

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "o_custkey": batch["o_custkey"],
            "first_dt": pd.to_datetime(batch["o_orderdate"]),
            "cents": cents_i64(batch["o_totalprice"]),
        })
        g = d.groupby("o_custkey", sort=False).agg(
            first_dt=("first_dt", "min"), cents=("cents", "sum")
        )
        return g.reset_index()

    def per_cust(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("o_custkey", sort=False).agg(
            first_dt=("first_dt", "min"), cents=("cents", "sum")
        ).reset_index()
        return pd.DataFrame({
            "cohort_month": g["first_dt"].dt.strftime("%Y-%m"),
            "cents": g["cents"].astype("int64"),
        })

    per_customer = bucketed_group_apply(
        orders.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["o_custkey"],
        per_cust,
        n_buckets=n_buckets,
    )

    def per_cohort(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("cohort_month", sort=False)["cents"].agg(
            ["size", "sum"]
        )
        n = g["size"].to_numpy(dtype="int64")
        tc = g["sum"].to_numpy(dtype="int64")
        # avg rounded HALF-UP in integer cents ((2*tc + n) // (2*n)) — a
        # float round here straddles half-even vs half-away at exact .xx5
        # boundaries (measured: 2 of 51 cohorts at sf0.01)
        rc = (2 * tc + n) // (2 * n)
        return pd.DataFrame({
            "cohort_month": g.index,
            "n_customers": n,
            "revenue": [money_from_cents(c) for c in tc],
            "avg_ltv": rc.astype("float64") / 100.0,
        })

    return bucketed_group_apply(
        per_customer, ["cohort_month"], per_cohort, n_buckets=8
    )


COHORT_LTV_SQL = """
WITH pc AS (
  SELECT o_custkey,
         strftime(MIN(o_orderdate), '%Y-%m') AS cohort_month,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
)
SELECT cohort_month,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue,
       CAST((2 * SUM(cents) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
         / 100.0 AS avg_ltv
FROM pc GROUP BY cohort_month
"""


def basket_lift(
    sf_dir: str, min_support: int = 3, n_buckets: int = 64
) -> ray.data.Dataset:
    """Association-rule metrics over the copurchase pairs: lift and both
    directed confidences for every part pair co-purchased at least
    ``min_support`` times (Agrawal-Srikant support/confidence/lift,
    public) — the market-basket layer on top of ``rel_copurchase``.

    Exactness: every metric is ONE division of two exact int64 products
    (n_ab*N / n_a*n_b etc.), rounded 6 — bit-identical to the oracle.
    Scale shape: pair counts come from the blocked ``copurchase_pairs``;
    per-part basket counts reduce distributed and ship once via ray.put
    (part is the dimension-bounded side, the ``rel_part_min_price``
    broadcast discipline); the basket total is one distinct-count
    aggregate. Output: part_a, part_b, n_ab, n_a, n_b, lift, conf_ab,
    conf_ba."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    baskets = bucketed_group_apply(
        li.map_batches(
            lambda b: b.drop_duplicates(), batch_format="pandas",
            batch_size=65536,
        ),
        ["l_orderkey", "l_partkey"],
        lambda b: b.drop_duplicates(),
        n_buckets=n_buckets,
    ).materialize()

    def part_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        s = bucket.groupby("l_partkey", sort=False).size()
        return pd.DataFrame({"l_partkey": s.index.astype("int64"),
                             "n_p": s.to_numpy().astype("int64")})

    pc = bucketed_group_apply(
        baskets, ["l_partkey"], part_counts, n_buckets=n_buckets
    ).to_pandas()  # part-dimension-bounded (the broadcast small side)
    n_baskets = int(
        bucketed_group_apply(
            baskets.select_columns(["l_orderkey"]),
            ["l_orderkey"],
            lambda b: b.drop_duplicates(),
            n_buckets=n_buckets,
        ).count()
    )
    np_ref = ray.put(dict(zip(pc["l_partkey"], pc["n_p"])))

    pairs = copurchase_pairs(sf_dir, min_support=min_support,
                             n_buckets=n_buckets)

    class _Lift:
        def __init__(self, ref, n):
            self.n_p = ray.get(ref)
            self.n = np.int64(n)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            na = batch["part_a"].map(self.n_p).to_numpy(dtype="int64")
            nb = batch["part_b"].map(self.n_p).to_numpy(dtype="int64")
            nab = batch["n_orders"].to_numpy(dtype="int64")
            return pd.DataFrame({
                "part_a": batch["part_a"].astype("int64"),
                "part_b": batch["part_b"].astype("int64"),
                "n_ab": nab,
                "n_a": na,
                "n_b": nb,
                "lift": np.round(
                    (nab * self.n).astype("float64")
                    / (na * nb).astype("float64"), 6
                ),
                "conf_ab": np.round(
                    nab.astype("float64") / na.astype("float64"), 6
                ),
                "conf_ba": np.round(
                    nab.astype("float64") / nb.astype("float64"), 6
                ),
            })

    return pairs.map_batches(
        _Lift, fn_constructor_args=(np_ref, n_baskets),
        batch_format="pandas", batch_size=65536, concurrency=(1, 4),
    )


BASKET_LIFT_SQL_TEMPLATE = """
WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_p
       FROM b GROUP BY l_partkey),
nn AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM b),
pairs AS (
  SELECT CAST(x.l_partkey AS BIGINT) AS part_a,
         CAST(y.l_partkey AS BIGINT) AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY x.l_partkey, y.l_partkey
  HAVING COUNT(*) >= {min_support}
)
SELECT p.part_a, p.part_b, p.n_ab,
       pa.n_p AS n_a, pb.n_p AS n_b,
       ROUND(CAST(p.n_ab * nn.n AS DOUBLE)
             / CAST(pa.n_p * pb.n_p AS DOUBLE), 6) AS lift,
       ROUND(CAST(p.n_ab AS DOUBLE) / CAST(pa.n_p AS DOUBLE), 6) AS conf_ab,
       ROUND(CAST(p.n_ab AS DOUBLE) / CAST(pb.n_p AS DOUBLE), 6) AS conf_ba
FROM pairs p
JOIN pc pa ON pa.l_partkey = p.part_a
JOIN pc pb ON pb.l_partkey = p.part_b
CROSS JOIN nn
"""


def ship_delay_hist(sf_dir: str, n_buckets: int = 8) -> ray.data.Dataset:
    """Histogram of shipping delay (l_shipdate - o_orderdate in whole
    days) over all lineitems — the fulfillment-latency distribution behind
    ``q12_late_lines``' binary late/ontime cut. The order date attaches
    through the co-partitioned ``hash_join`` on orderkey (orders is a fact,
    never broadcast); day buckets reduce exact. Output: delay_days,
    n_items (int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )
    j = hash_join(li, orders, on="l_orderkey", n_buckets=64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = (
            pd.to_datetime(batch["l_shipdate"]).dt.floor("D")
            - pd.to_datetime(batch["o_orderdate"]).dt.floor("D")
        ).dt.days.astype("int64")
        s = d.groupby(d, sort=False).size()
        return pd.DataFrame({"delay_days": s.index.astype("int64"),
                             "n_part": s.to_numpy().astype("int64")})

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("delay_days", sort=False)["n_part"].sum()
        return pd.DataFrame({"delay_days": g.index.astype("int64"),
                             "n_items": g.to_numpy().astype("int64")})

    return bucketed_group_apply(
        j.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["delay_days"],
        merge,
        n_buckets=n_buckets,
    )


SHIP_DELAY_HIST_SQL = """
SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
         AS delay_days,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


def trade_balance(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Per-nation trade balance: revenue its customers SPENT vs revenue its
    suppliers EARNED over the same lineitems, and the signed balance — the
    two-role rollup that exercises BOTH dimension paths of the schema at
    once (customer->nation via orders, supplier->nation directly).

    Exactness: revenue accumulates in 1e-4-scaled int64
    (price x (1-discount) is exact there — functions/money.py); the
    balance is a difference of the two HALF-UP-rounded cent totals, so
    bought - sold == balance holds to the cent by construction. Scale
    shape: lineitem joins orders through the co-partitioned ``hash_join``
    (fact x fact); the two nation attachments broadcast (bounded dims);
    partial per-nation sums reduce through a nation-bounded shuffle.
    Output: n_name, bought, sold, balance."""
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.money import (
        money_from_scaled4,
        rev_scaled4,
    )

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    n_names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    cust_nation = ray.put({
        k: n_names[v] for k, v in zip(cust["c_custkey"], cust["c_nationkey"])
    })
    supp_nation = ray.put({
        k: n_names[v] for k, v in zip(supp["s_suppkey"], supp["s_nationkey"])
    })

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )
    j = hash_join(li, orders, on="l_orderkey", n_buckets=n_buckets)

    class _Partial:
        def __init__(self, cref, sref):
            self.cn = ray.get(cref)
            self.sn = ray.get(sref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rev = rev_scaled4(batch["l_extendedprice"], batch["l_discount"])
            buy = pd.DataFrame({
                "n_name": batch["o_custkey"].map(self.cn),
                "bought_s": rev, "sold_s": np.int64(0),
            })
            sell = pd.DataFrame({
                "n_name": batch["l_suppkey"].map(self.sn),
                "bought_s": np.int64(0), "sold_s": rev,
            })
            both = pd.concat([buy, sell], ignore_index=True)
            g = both.groupby("n_name", sort=False).agg(
                bought_s=("bought_s", "sum"), sold_s=("sold_s", "sum")
            )
            return g.reset_index()

    parts = j.map_batches(
        _Partial, fn_constructor_args=(cust_nation, supp_nation),
        batch_format="pandas", batch_size=65536, concurrency=(1, 8),
    )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("n_name", sort=False).agg(
            bought_s=("bought_s", "sum"), sold_s=("sold_s", "sum")
        ).reset_index()
        bought = [money_from_scaled4(v) for v in g["bought_s"]]
        sold = [money_from_scaled4(v) for v in g["sold_s"]]
        return pd.DataFrame({
            "n_name": g["n_name"],
            "bought": bought,
            "sold": sold,
            # difference of the two rounded cent totals: add in cents, not
            # dollars, so no float subtraction error can appear
            "balance": [
                (round(b * 100) - round(s * 100)) / 100.0
                for b, s in zip(bought, sold)
            ],
        })

    return bucketed_group_apply(parts, ["n_name"], merge, n_buckets=4)


TRADE_BALANCE_SQL = f"""
WITH buy AS (
  SELECT n.n_name, SUM({sql_rev_scaled4('l.l_extendedprice', 'l.l_discount')}) AS s
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name
),
sell AS (
  SELECT n.n_name, SUM({sql_rev_scaled4('l.l_extendedprice', 'l.l_discount')}) AS s
  FROM lineitem l
  JOIN supplier sp ON sp.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = sp.s_nationkey
  GROUP BY n.n_name
)
SELECT COALESCE(b.n_name, s.n_name) AS n_name,
       CAST((COALESCE(b.s, 0) + 50) // 100 AS DOUBLE) / 100.0 AS bought,
       CAST((COALESCE(s.s, 0) + 50) // 100 AS DOUBLE) / 100.0 AS sold,
       CAST((COALESCE(b.s, 0) + 50) // 100
            - (COALESCE(s.s, 0) + 50) // 100 AS DOUBLE) / 100.0 AS balance
FROM buy b FULL OUTER JOIN sell s USING (n_name)
"""


def priority_mix(sf_dir: str, n_buckets: int = 8) -> ray.data.Dataset:
    """Monthly order-priority mix: counts and within-month share per
    o_orderpriority — the ``events_monthly_mix`` composition series on the
    orders fact (is the urgent share drifting?). Share is one division of
    exact ints, rounded 6; per-batch (month, priority) partials bound the
    exchange. Output: month, o_orderpriority, n_orders, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderpriority"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = pd.to_datetime(batch["o_orderdate"]).dt.strftime("%Y-%m")
        g = pd.DataFrame({
            "month": m, "o_orderpriority": batch["o_orderpriority"],
        }).groupby(["month", "o_orderpriority"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    def per_month(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["month", "o_orderpriority"], sort=False)["n"]\
            .sum().reset_index(name="n_orders")
        tot = g.groupby("month", sort=False)["n_orders"].transform("sum")
        return pd.DataFrame({
            "month": g["month"],
            "o_orderpriority": g["o_orderpriority"],
            "n_orders": g["n_orders"].astype("int64"),
            "share": np.round(
                g["n_orders"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(
        orders.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["month"],
        per_month,
        n_buckets=n_buckets,
    )


PRIORITY_MIX_SQL = """
WITH c AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT month, o_orderpriority, n_orders,
       ROUND(CAST(n_orders AS DOUBLE)
             / CAST(SUM(n_orders) OVER (PARTITION BY month) AS DOUBLE), 6)
         AS share
FROM c
"""


def customer_rfm(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """Per-customer RFM profile — Recency (days from the customer's last
    order to the corpus max order date), Frequency (order count), Monetary
    (lifetime revenue in exact integer cents) — the segmentation base table
    of every CRM / importance-sampling pipeline.

    Shape: one custkey-keyed shuffle of order-free per-customer reductions
    (max date, count, cent sum — all combiner partials); the global max
    order date is a one-value aggregate pulled once and closed over (the
    declared small side, the ``part_pareto`` discipline). Monetary stays a
    display double derived from exact cents; no quantile cuts (ties under
    NTILE are engine-order-dependent — deliberately out of contract).
    Output: o_custkey, recency_days, frequency, monetary."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64, money_from_cents

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    max_date = orders.max("o_orderdate")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "o_custkey": batch["o_custkey"],
            "last_dt": pd.to_datetime(batch["o_orderdate"]),
            "n": np.int64(1),
            "cents": cents_i64(batch["o_totalprice"]),
        })
        return d.groupby("o_custkey", sort=False).agg(
            last_dt=("last_dt", "max"), n=("n", "sum"),
            cents=("cents", "sum"),
        ).reset_index()

    def per_cust(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("o_custkey", sort=False).agg(
            last_dt=("last_dt", "max"), n=("n", "sum"),
            cents=("cents", "sum"),
        ).reset_index()
        rec = (
            pd.Timestamp(max_date).floor("D") - g["last_dt"].dt.floor("D")
        ).dt.days.astype("int64")
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].astype("int64"),
            "recency_days": rec,
            "frequency": g["n"].astype("int64"),
            "monetary": [money_from_cents(c) for c in g["cents"]],
        })

    return bucketed_group_apply(
        orders.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["o_custkey"],
        per_cust,
        n_buckets=n_buckets,
    )


CUSTOMER_RFM_SQL = """
WITH mx AS (SELECT MAX(o_orderdate) AS md FROM orders),
c AS (
  SELECT o_custkey,
         date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                   CAST((SELECT md FROM mx) AS DATE)) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(recency_days AS BIGINT) AS recency_days, frequency,
       CAST(cents AS DOUBLE) / 100.0 AS monetary
FROM c
"""


def nation_hhi(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """Per-nation revenue concentration: the Herfindahl–Hirschman index of
    customer revenue shares (HHI = sum_i share_i^2; 1/k = perfectly even,
    1.0 = one customer owns the market) — the antitrust-style
    concentration gauge over the customer ⋈ orders axis, next to
    ``customer_rfm``'s per-customer view.

    Exactness: HHI = S2 / C^2 with S2 = sum cents_i^2 and C = sum cents_i
    both EXACT integers. Per-customer cents fold in one custkey-keyed
    shuffle (int64-safe, money.py headroom note); the per-nation second
    moment is accumulated in CHUNKED int64 (chunks sized so
    chunk * max(c^2) < 2^63) then carried as Python ints, shipped across
    the exchange as (hi, lo) base-2^62 limbs and re-merged in Python ints
    (HUGEINT-equal — a nation's S2 passes int64 at ~2.5k whale
    customers). The index is one double division, rounded 6. Nation names
    are the 25-row broadcast dim. Output: nation, n_customers, revenue,
    hhi."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.money import cents_i64, money_from_cents

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation_names = dict(
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).to_pandas().itertuples(index=False, name=None)
    )

    def cust_partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "o_custkey": batch["o_custkey"].astype("int64"),
            "cents": cents_i64(batch["o_totalprice"]),
        })
        return d.groupby("o_custkey", sort=False)["cents"].sum()\
            .reset_index()

    per_cust = bucketed_group_apply(
        orders.map_batches(cust_partial, batch_format="pandas",
                           batch_size=65536),
        ["o_custkey"],
        lambda b: b.groupby("o_custkey", sort=False)["cents"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    )

    joined = hash_join(
        per_cust,
        customer.map_batches(
            lambda b: b.rename(columns={"c_custkey": "o_custkey"}),
            batch_format="pandas",
        ),
        on="o_custkey",
        n_buckets=n_buckets,
    )

    _LIMB = 1 << 62

    def nation_partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, g in batch.groupby("c_nationkey", sort=False):
            c = g["cents"].to_numpy(dtype="int64")
            sq = c * c  # each fits int64 (cents < 3e9 per customer)
            mx = int(sq.max()) if len(sq) else 0
            step = max(1, (1 << 62) // max(mx, 1))
            s2 = 0
            for i in range(0, len(sq), step):
                s2 += int(sq[i:i + step].sum())
            rows.append((
                int(nk), len(g), int(c.sum()),
                np.int64(s2 // _LIMB), np.int64(s2 % _LIMB),
            ))
        return pd.DataFrame(
            rows, columns=["nk", "k", "c", "s2_hi", "s2_lo"]
        ).astype({
            "nk": "int64", "k": "int64", "c": "int64",
            "s2_hi": "int64", "s2_lo": "int64",
        })

    parts = joined.map_batches(
        nation_partial, batch_format="pandas", batch_size=65536
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for nk, g in bucket.groupby("nk", sort=False):
            s2 = sum(
                int(h) * _LIMB + int(lo)
                for h, lo in zip(g["s2_hi"], g["s2_lo"])
            )
            ctot = sum(int(x) for x in g["c"])
            k = int(g["k"].sum())
            out.append((
                nation_names[int(nk)],
                np.int64(k),
                money_from_cents(ctot),
                np.round(float(s2) / float(ctot * ctot), 6),
            ))
        return pd.DataFrame(
            out, columns=["nation", "n_customers", "revenue", "hhi"]
        ).astype({"n_customers": "int64"})

    return bucketed_group_apply(parts, ["nk"], final, n_buckets=4)


NATION_HHI_SQL = """
WITH c AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT cu.c_nationkey AS nk, c.cents
  FROM c JOIN customer cu ON cu.c_custkey = c.o_custkey
),
s AS (
  SELECT nk, COUNT(*) AS k, SUM(cents) AS ctot,
         SUM(cents * cents) AS s2
  FROM j GROUP BY nk
)
SELECT n.n_name AS nation, CAST(k AS BIGINT) AS n_customers,
       CAST(ctot AS DOUBLE) / 100.0 AS revenue,
       ROUND(CAST(s2 AS DOUBLE) / CAST(ctot * ctot AS DOUBLE), 6) AS hhi
FROM s JOIN nation n ON n.n_nationkey = s.nk
"""


def priority_latency(sf_dir: str, n_buckets: int = 8) -> ray.data.Dataset:
    """Fulfillment latency BY ORDER PRIORITY: per o_orderpriority the
    lineitem count and min/max/half-up-mean ship delay in whole days —
    does the priority flag actually buy faster shipping (the SLA
    compliance rollup over ``ship_delay_hist``'s global distribution).

    Shape: the same orderkey-co-partitioned join as ``ship_delay_hist``,
    then priority-keyed combiner partials (n, sum, min, max — all exact
    int64 day counts; delay*rows is far under int64) and a tiny
    priority-bounded reduce with the ``rel_cohort_ltv`` half-up integer
    mean. Output: o_orderpriority, n_items, min_delay, max_delay,
    avg_delay (all int64)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )
    j = hash_join(li, orders, on="l_orderkey", n_buckets=64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = (
            pd.to_datetime(batch["l_shipdate"]).dt.floor("D")
            - pd.to_datetime(batch["o_orderdate"]).dt.floor("D")
        ).dt.days.astype("int64")
        g = pd.DataFrame({
            "o_orderpriority": batch["o_orderpriority"],
            "d": d,
        }).groupby("o_orderpriority", sort=False)["d"].agg(
            ["size", "sum", "min", "max"]
        )
        return pd.DataFrame({
            "o_orderpriority": g.index,
            "n": g["size"].astype("int64").to_numpy(),
            "s": g["sum"].astype("int64").to_numpy(),
            "mn": g["min"].astype("int64").to_numpy(),
            "mx": g["max"].astype("int64").to_numpy(),
        })

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("o_orderpriority", sort=False).agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"),
            mx=("mx", "max"),
        ).reset_index()
        n = g["n"].astype("int64")
        s = g["s"].astype("int64")
        return pd.DataFrame({
            "o_orderpriority": g["o_orderpriority"],
            "n_items": n,
            "min_delay": g["mn"].astype("int64"),
            "max_delay": g["mx"].astype("int64"),
            "avg_delay": (2 * s + n) // (2 * n),
        })

    return bucketed_group_apply(
        j.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["o_orderpriority"],
        merge,
        n_buckets=n_buckets,
    )


PRIORITY_LATENCY_SQL = """
WITH d AS (
  SELECT o.o_orderpriority,
         CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
           AS delay
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(MIN(delay) AS BIGINT) AS min_delay,
       CAST(MAX(delay) AS BIGINT) AS max_delay,
       CAST((2 * SUM(delay) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
         AS avg_delay
FROM d GROUP BY o_orderpriority
"""


def clv_percentiles(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Customer-lifetime-value distribution: exact p25/p50/p75/p95 of
    per-customer total order value — the spend curve a pricing or
    importance-sampling decision reads (one row; pairs with
    ``customer_rfm``'s per-customer table). Per-customer cents fold in
    one custkey-keyed shuffle; the percentiles come from
    ``exact_global_quantiles`` over the INTEGER cents column
    (QUANTILE_CONT-identical, driver memory bounded by collect_budget)
    and convert to display dollars once, rounded 6. Output: n_customers,
    p25, p50, p75, p95."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "o_custkey": batch["o_custkey"].astype("int64"),
            "cents": cents_i64(batch["o_totalprice"]),
        })
        return d.groupby("o_custkey", sort=False)["cents"].sum()\
            .reset_index()

    per_cust = bucketed_group_apply(
        orders.map_batches(partial, batch_format="pandas",
                           batch_size=65536),
        ["o_custkey"],
        lambda b: b.groupby("o_custkey", sort=False)["cents"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    )
    n, qv = exact_global_quantiles(
        per_cust, "cents", [0.25, 0.5, 0.75, 0.95]
    )
    return pd.DataFrame({
        "n_customers": [np.int64(n)],
        "p25": [np.round(qv[0.25] / 100.0, 6)],
        "p50": [np.round(qv[0.5] / 100.0, 6)],
        "p75": [np.round(qv[0.75] / 100.0, 6)],
        "p95": [np.round(qv[0.95] / 100.0, 6)],
    })


CLV_PERCENTILES_SQL = """
WITH c AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(QUANTILE_CONT(cents, 0.25) / 100.0, 6) AS p25,
       ROUND(QUANTILE_CONT(cents, 0.50) / 100.0, 6) AS p50,
       ROUND(QUANTILE_CONT(cents, 0.75) / 100.0, 6) AS p75,
       ROUND(QUANTILE_CONT(cents, 0.95) / 100.0, 6) AS p95
FROM c
"""


def monthly_revenue_growth(sf_dir: str, n_buckets: int = 8) -> pd.DataFrame:
    """Month-over-month revenue growth: per month the exact-cents order
    revenue, the previous month's, and the growth rate — the trend table
    every finance dashboard opens with (the time-series DERIVATIVE of
    ``revenue_rollup``'s levels). Monthly cents are one month-keyed
    combiner reduce (month cardinality bounds everything after);
    the LAG/growth step runs on the month-bounded driver frame. Growth is
    one division of exact ints, rounded 6; the first month emits NULL
    growth (oracle LAG semantics). Output: month, revenue, prev_revenue,
    growth."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64, money_from_cents

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "month": pd.to_datetime(batch["o_orderdate"])
            .dt.strftime("%Y-%m"),
            "cents": cents_i64(batch["o_totalprice"]),
        })
        return d.groupby("month", sort=False)["cents"].sum().reset_index()

    months = bucketed_group_apply(
        orders.map_batches(partial, batch_format="pandas",
                           batch_size=65536),
        ["month"],
        lambda b: b.groupby("month", sort=False)["cents"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    ).to_pandas()  # month-bounded

    months = months.sort_values("month").reset_index(drop=True)
    cents = [int(x) for x in months["cents"]]
    prev = [None] + cents[:-1]
    growth = [
        None if p is None else np.round((c - p) / p, 6)
        for c, p in zip(cents, prev)
    ]
    return pd.DataFrame({
        "month": months["month"],
        "revenue": [money_from_cents(c) for c in cents],
        "prev_revenue": [
            None if p is None else money_from_cents(p) for p in prev
        ],
        "growth": growth,
    })


MONTHLY_GROWTH_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
l AS (
  SELECT month, cents, LAG(cents) OVER (ORDER BY month) AS pc FROM m
)
SELECT month,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(pc AS DOUBLE) / 100.0 AS prev_revenue,
       ROUND(CAST(cents - pc AS DOUBLE) / CAST(pc AS DOUBLE), 6) AS growth
FROM l
"""


def order_status_mix(sf_dir: str, n_buckets: int = 4) -> ray.data.Dataset:
    """Order-status composition per month: counts and within-month share
    of each o_orderstatus — the fulfillment-backlog trend (a rising 'O'
    share is unshipped work piling up; the reference's run-state
    accounting, src/TCXReader.jl activity states, on the order axis).
    Bounded (month x status) rollup, exact counts, share one division
    rounded 6. Output: month, o_orderstatus, n_orders, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderstatus"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "month": pd.to_datetime(batch["o_orderdate"])
            .dt.strftime("%Y-%m"),
            "o_orderstatus": batch["o_orderstatus"],
        })
        g = d.groupby(["month", "o_orderstatus"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = orders.map_batches(partial, batch_format="pandas",
                               batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["month", "o_orderstatus"], sort=False)["n"]\
            .sum().reset_index()
        tot = g.groupby("month", sort=False)["n"].transform("sum")
        return pd.DataFrame({
            "month": g["month"],
            "o_orderstatus": g["o_orderstatus"],
            "n_orders": g["n"].astype("int64"),
            "share": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6
            ),
        })

    return bucketed_group_apply(parts, ["month"], merge,
                                n_buckets=n_buckets)


ORDER_STATUS_MIX_SQL = """
WITH c AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT month, o_orderstatus, CAST(n AS BIGINT) AS n_orders,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY month), 6)
         AS share
FROM c
"""


def discount_effect(sf_dir: str, n_buckets: int = 1) -> ray.data.Dataset:
    """Per-DISCOUNT-LEVEL demand profile: line count, total/average quantity
    and exact-cent net revenue per distinct l_discount — the elasticity
    read-out (does a deeper discount actually move more units per line?)
    that generalizes Q6's single-band forecast to the whole discount grid.
    11 levels — a bounded rollup; quantities are integral doubles (summed
    as int64), revenue in 1e-4-scaled ints (``rev_scaled4``), avg one
    division rounded 6. The discount key stays the raw 2-dp double both
    sides read from parquet (bit-identical grouping).
    Output: l_discount, n_lines, sum_qty, avg_qty, revenue."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import (
        money_from_scaled4_series,
        rev_scaled4,
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "l_discount": batch["l_discount"],
            "n": np.int64(1),
            "qty": np.rint(batch["l_quantity"].to_numpy(dtype="float64"))
            .astype("int64"),
            "rev_s": rev_scaled4(batch["l_extendedprice"],
                                 batch["l_discount"]),
        }).groupby("l_discount", sort=False).sum().reset_index()
        return g

    parts = li.map_batches(partial, batch_format="pandas", batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("l_discount", sort=False).sum().reset_index()
        return pd.DataFrame({
            "l_discount": g["l_discount"],
            "n_lines": g["n"].astype("int64"),
            "sum_qty": g["qty"].astype("int64"),
            "avg_qty": np.round(
                g["qty"].to_numpy(dtype="float64")
                / g["n"].to_numpy(dtype="float64"), 6
            ),
            "revenue": money_from_scaled4_series(g["rev_s"]),
        })

    return bucketed_group_apply(parts, ["l_discount"], merge,
                                n_buckets=n_buckets)


DISCOUNT_EFFECT_SQL = """
SELECT l_discount,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / COUNT(*), 6) AS avg_qty,
       CAST((SUM(CAST(ROUND((l_extendedprice) * 100) AS BIGINT)
                 * (100 - CAST(ROUND((l_discount) * 100) AS BIGINT)))
             + 50) // 100 AS DOUBLE) / 100.0 AS revenue
FROM lineitem GROUP BY l_discount
"""


def returns_by_nation(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Per-NATION return rate: of each customer nation's lineitems, the
    share carrying l_returnflag = 'R' and the exact-cent net revenue those
    returns gave back — the quality-of-trade companion to Q5/Q10 (Q10 ranks
    customers by returned revenue; this rolls the same flag up the
    geography axis). Shape: lineitem pre-aggregates PER ORDER inside the
    map (3 ints + a scaled-int), the order⋈customer chain runs through two
    co-partitioned ``hash_join``s (customer is 150k×SF — never broadcast),
    only the 25-row nation name map ships via ``ray.put``. Rate is one
    division rounded 6; revenue half-up from 1e-4-scaled ints.
    Output: n_name, n_lines, n_returned, return_rate, returned_revenue."""
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.money import (
        money_from_scaled4_series,
        rev_scaled4,
    )

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_ref = ray.put(dict(zip(nat["n_nationkey"], nat["n_name"])))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"],
    )

    def per_order(batch: pd.DataFrame) -> pd.DataFrame:
        ret = (batch["l_returnflag"] == "R").to_numpy()
        rev_s = rev_scaled4(batch["l_extendedprice"], batch["l_discount"])
        g = pd.DataFrame({
            "o_orderkey": batch["l_orderkey"],
            "n": np.int64(1),
            "n_ret": ret.astype("int64"),
            "ret_rev_s": np.where(ret, rev_s, np.int64(0)),
        }).groupby("o_orderkey", sort=False).sum().reset_index()
        return g

    li_per_order = li.map_batches(per_order, batch_format="pandas",
                                  batch_size=65536)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    lo = hash_join(li_per_order, orders, on="o_orderkey",
                   n_buckets=n_buckets)

    def per_cust(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("o_custkey", sort=False)[
            ["n", "n_ret", "ret_rev_s"]
        ].sum().reset_index().rename(columns={"o_custkey": "c_custkey"})

    lo_per_cust = lo.map_batches(per_cust, batch_format="pandas",
                                 batch_size=65536)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    lc = hash_join(lo_per_cust, cust, on="c_custkey", n_buckets=n_buckets)

    def per_nation(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("c_nationkey", sort=False)[
            ["n", "n_ret", "ret_rev_s"]
        ].sum().reset_index()

    parts = lc.map_batches(per_nation, batch_format="pandas",
                           batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        nat_name = ray.get(nat_ref)  # 25 entries, 4 tasks — cheap
        g = bucket.groupby("c_nationkey", sort=False)[
            ["n", "n_ret", "ret_rev_s"]
        ].sum().reset_index()
        return pd.DataFrame({
            "n_name": g["c_nationkey"].map(nat_name),
            "n_lines": g["n"].astype("int64"),
            "n_returned": g["n_ret"].astype("int64"),
            "return_rate": np.round(
                g["n_ret"].to_numpy(dtype="float64")
                / g["n"].to_numpy(dtype="float64"), 6
            ),
            "returned_revenue": money_from_scaled4_series(g["ret_rev_s"]),
        })

    return bucketed_group_apply(parts, ["c_nationkey"], final, n_buckets=4)


RETURNS_BY_NATION_SQL = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(*) FILTER (l.l_returnflag = 'R') AS BIGINT)
         AS n_returned,
       ROUND(CAST(COUNT(*) FILTER (l.l_returnflag = 'R') AS DOUBLE)
             / COUNT(*), 6) AS return_rate,
       CAST((COALESCE(SUM(CASE WHEN l.l_returnflag = 'R'
                 THEN CAST(ROUND((l.l_extendedprice) * 100) AS BIGINT)
                      * (100 - CAST(ROUND((l.l_discount) * 100) AS BIGINT))
                 ELSE 0 END), 0)
             + 50) // 100 AS DOUBLE) / 100.0 AS returned_revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


def qty_price_corr(sf_dir: str) -> ray.data.Dataset:
    """Global Pearson correlation between line quantity and extended price
    — the pricing-model sanity scalar (TPC-H prices are qty × part price,
    so the corr is strongly positive; a drift toward 0 in a real feed means
    unit prices started absorbing volume). The ``corr_value_hour`` mold on
    the lineitem axis: per-batch EXACT integer sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²; x = qty, y = price cents), Python-int merge
    (== the oracle's HUGEINT sums), ONE shared double expression for the
    corr, rounded 6. batch_size 8192 bounds the per-batch Σy² partial:
    price cents < 1.1e7 → y² < 1.3e14 → 8192 rows < 1.1e18 (int64-safe).
    Output: n, corr_qty_price."""
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(b["l_quantity"].to_numpy(dtype="float64"))\
            .astype("int64")
        y = cents_i64(b["l_extendedprice"])
        return pd.DataFrame({
            "k": ["all"],
            "n": [np.int64(len(b))],
            "sx": [x.sum()],
            "sy": [y.sum()],
            "sxy": [(x * y).sum()],
            "sx2": [(x * x).sum()],
            "sy2": [(y * y).sum()],
        })

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        n = sum(int(v) for v in bucket["n"])
        sx = sum(int(v) for v in bucket["sx"])
        sy = sum(int(v) for v in bucket["sy"])
        sxy = sum(int(v) for v in bucket["sxy"])
        sx2 = sum(int(v) for v in bucket["sx2"])
        sy2 = sum(int(v) for v in bucket["sy2"])
        dx, dy = n * sx2 - sx * sx, n * sy2 - sy * sy
        if n == 0 or dx <= 0 or dy <= 0:
            return pd.DataFrame({
                "n": pd.array([], dtype="int64"),
                "corr_qty_price": pd.array([], dtype="float64"),
            })
        corr = float(n * sxy - sx * sy) / math.sqrt(float(dx) * float(dy))
        return pd.DataFrame({
            "n": pd.Series([n], dtype="int64"),
            "corr_qty_price": [float(np.round(corr, 6))],
        })

    return bucketed_group_apply(
        li.map_batches(partial, batch_format="pandas", batch_size=8192),
        ["k"],
        final,
        n_buckets=1,
    )


QTY_PRICE_CORR_SQL = """
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS sx,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
         SUM(CAST(l_quantity AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sxy,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
           AS sx2,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy2
  FROM lineitem
)
SELECT n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6)
         AS corr_qty_price
FROM s WHERE n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
"""


def segment_aov(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Average order value per MARKET SEGMENT: order count, exact-cent
    revenue total and HALF-UP cent mean per c_mktsegment — the segment
    P&L one-liner (Q3 filters one segment's urgency; this compares all
    of them). orders ⋈ customer is the co-partitioned ``hash_join``
    (both fact-sized — never broadcast); o_totalprice reduces in exact
    cents; the mean is the house half-up integer division. Output:
    c_mktsegment, n_orders, total_value, avg_order_value."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.money import cents_i64

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: pd.DataFrame({
            "c_custkey": b["o_custkey"],
            "cents": cents_i64(b["o_totalprice"]),
        }),
        batch_format="pandas", batch_size=65536,
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    oc = hash_join(orders, cust, on="c_custkey", n_buckets=n_buckets)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "c_mktsegment": batch["c_mktsegment"],
            "n": np.int64(1),
            "cents": batch["cents"].astype("int64"),
        })
        return d.groupby("c_mktsegment", sort=False).sum().reset_index()

    parts = oc.map_batches(partial, batch_format="pandas",
                           batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("c_mktsegment", sort=False).sum().reset_index()
        rows = []
        for _, r in g.iterrows():  # <= #segments rows
            n, s = int(r["n"]), int(r["cents"])  # Python ints: exact
            rows.append((r["c_mktsegment"], n, s / 100.0,
                         ((2 * s + n) // (2 * n)) / 100.0))
        return pd.DataFrame(rows, columns=[
            "c_mktsegment", "n_orders", "total_value", "avg_order_value"
        ]).astype({"n_orders": "int64"})

    return bucketed_group_apply(parts, ["c_mktsegment"], merge, n_buckets=4)


SEGMENT_AOV_SQL = """
WITH s AS (
  SELECT c.c_mktsegment, COUNT(*) AS n,
         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment
)
SELECT c_mktsegment, CAST(n AS BIGINT) AS n_orders,
       CAST(cents AS DOUBLE) / 100.0 AS total_value,
       CAST((2 * cents + n) // (2 * n) AS DOUBLE) / 100.0
         AS avg_order_value
FROM s
"""


def open_order_aging(sf_dir: str, bucket_days: int = 30) -> ray.data.Dataset:
    """BACKLOG AGING of open orders: orders still in status 'O', bucketed
    by age in ``bucket_days``-day steps against the corpus's latest order
    date — the fulfillment queue's survival table (``rel_status_mix`` says
    the backlog GROWS; this says how STALE it is). The anchor date is one
    global max (an order-free combiner scalar); ages are exact integer
    day differences (dates are midnight-aligned, so day diff == calendar
    days); buckets integer-divide. Exact counts; cent-exact value at risk.
    Output: bucket, age_min_days, n_orders, open_value."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_orderstatus", "o_totalprice"],
    ).materialize()  # two consumers: max-date scan + aging scan

    maxd = orders.map_batches(
        lambda b: pd.DataFrame({"m": [pd.to_datetime(b["o_orderdate"]).max()]}),
        batch_format="pandas", batch_size=65536,
    ).to_pandas()["m"].max()  # tiny: one row per batch

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["o_orderstatus"] == "O"]
        age = (maxd - pd.to_datetime(b["o_orderdate"])).dt.days\
            .to_numpy().astype("int64")
        d = pd.DataFrame({
            "bucket": age // bucket_days,
            "n": np.int64(1),
            "cents": cents_i64(b["o_totalprice"]),
        })
        return d.groupby("bucket", sort=False).sum().reset_index()

    parts = orders.map_batches(partial, batch_format="pandas",
                               batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bucket", sort=False).sum().reset_index()
        return pd.DataFrame({
            "bucket": g["bucket"].astype("int64"),
            "age_min_days": (g["bucket"] * bucket_days).astype("int64"),
            "n_orders": g["n"].astype("int64"),
            "open_value": g["cents"].to_numpy(dtype="int64") / 100.0,
        })

    return bucketed_group_apply(parts, ["bucket"], merge, n_buckets=4)


OPEN_ORDER_AGING_SQL_TEMPLATE = """
WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
a AS (
  SELECT date_diff('day', o_orderdate, mx.maxd) // {bucket_days}
           AS bucket,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders, mx WHERE o_orderstatus = 'O'
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(bucket * {bucket_days} AS BIGINT) AS age_min_days,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS open_value
FROM a GROUP BY bucket
"""


def supplier_acctbal_profile(sf_dir: str) -> ray.data.Dataset:
    """Supplier ACCOUNT-BALANCE health per nation: count, exact-cent
    min / max / total and the signed HALF-AWAY cent mean of s_acctbal —
    the credit-exposure table (a nation whose mean balance goes negative
    is a payables risk before any order does). Balances are 2-dp SIGNED
    money: cents reduce exactly; the mean uses half-away-from-zero integer
    division (floor division would drag negative means toward -inf — the
    ``money_from_scaled4_signed`` discipline at cent scale). Broadcast:
    only the 25-row nation map. Output: n_name, n_suppliers, min_bal,
    max_bal, total_bal, avg_bal."""
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_ref = ray.put(dict(zip(nat["n_nationkey"], nat["n_name"])))

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = cents_i64(batch["s_acctbal"])
        d = pd.DataFrame({
            "s_nationkey": batch["s_nationkey"].astype("int64"),
            "n": np.int64(1),
            "s": c, "mn": c, "mx": c,
        })
        return d.groupby("s_nationkey", sort=False).agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"),
            mx=("mx", "max"),
        ).reset_index()

    parts = sup.map_batches(partial, batch_format="pandas",
                            batch_size=65536)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        nat_name = ray.get(nat_ref)
        g = bucket.groupby("s_nationkey", sort=False).agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"),
            mx=("mx", "max"),
        ).reset_index()
        rows = []
        for _, r in g.iterrows():  # <= 25 nations
            n, s = int(r["n"]), int(r["s"])
            avg_c = (2 * s + n) // (2 * n) if s >= 0 \
                else -((2 * (-s) + n) // (2 * n))
            rows.append((
                nat_name[int(r["s_nationkey"])], n,
                int(r["mn"]) / 100.0, int(r["mx"]) / 100.0,
                s / 100.0, avg_c / 100.0,
            ))
        return pd.DataFrame(rows, columns=[
            "n_name", "n_suppliers", "min_bal", "max_bal", "total_bal",
            "avg_bal",
        ]).astype({"n_suppliers": "int64"})

    return bucketed_group_apply(parts, ["s_nationkey"], merge, n_buckets=4)


SUPPLIER_ACCTBAL_SQL = """
WITH s AS (
  SELECT n.n_name, COUNT(*) AS n,
         SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS cents,
         MIN(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS mn,
         MAX(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS mx
  FROM supplier JOIN nation n ON n.n_nationkey = s_nationkey
  GROUP BY n.n_name
)
SELECT n_name, CAST(n AS BIGINT) AS n_suppliers,
       CAST(mn AS DOUBLE) / 100.0 AS min_bal,
       CAST(mx AS DOUBLE) / 100.0 AS max_bal,
       CAST(cents AS DOUBLE) / 100.0 AS total_bal,
       CAST(CASE WHEN cents >= 0 THEN (2 * cents + n) // (2 * n)
                 ELSE -((2 * (-cents) + n) // (2 * n)) END AS DOUBLE)
         / 100.0 AS avg_bal
FROM s
"""


def tax_effect(sf_dir: str, n_buckets: int = 1) -> ray.data.Dataset:
    """Per-TAX-LEVEL charge profile: line count, net revenue and the full
    Q1-style CHARGE price·(1−disc)·(1+tax) per distinct l_tax — the tax
    incidence table (what each tax band actually collects on top of net).
    The triple product is EXACT in 1e-6-scaled int64
    (cents × (100−disc_c) × (100+tax_c); < 1.2e11 per row, batch-bounded
    partials), summed as integers and converted once with the half-up rule
    — the ``functions/money`` discipline extended one factor deeper.
    Output: l_tax, n_lines, revenue, charge."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import (
        cents_i64,
        money_from_scaled4_series,
        rev_scaled4,
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_tax", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev4 = rev_scaled4(batch["l_extendedprice"], batch["l_discount"])
        chg6 = rev4 * (100 + cents_i64(batch["l_tax"]))
        g = pd.DataFrame({
            "l_tax": batch["l_tax"],
            "n": np.int64(1),
            "rev4": rev4,
            "chg6": chg6,
        }).groupby("l_tax", sort=False).sum().reset_index()
        return g

    # batch 8192 bounds the chg6 partial: < 1.2e11 per row -> < 1e15
    parts = li.map_batches(partial, batch_format="pandas", batch_size=8192)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        # Python-int sums: the 1e-6-scaled charge partials are ~100x the
        # rev4 scale, so the corpus total must not ride pandas int64
        # (the oracle's SUM(BIGINT) is HUGEINT for the same reason)
        rows = []
        for tax, grp in bucket.groupby("l_tax", sort=False):
            n = sum(int(v) for v in grp["n"])
            r4 = sum(int(v) for v in grp["rev4"])
            c6 = sum(int(v) for v in grp["chg6"])
            rows.append((
                tax, n,
                ((r4 + 50) // 100) / 100.0,
                ((c6 + 5000) // 10000) / 100.0,
            ))
        return pd.DataFrame(
            rows, columns=["l_tax", "n_lines", "revenue", "charge"]
        ).astype({"n_lines": "int64"})

    return bucketed_group_apply(parts, ["l_tax"], merge,
                                n_buckets=n_buckets)


TAX_EFFECT_SQL = """
WITH s AS (
  SELECT l_tax, COUNT(*) AS n,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev4,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
             * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS chg6
  FROM lineitem GROUP BY l_tax
)
SELECT l_tax, CAST(n AS BIGINT) AS n_lines,
       CAST((rev4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
       CAST((chg6 + 5000) // 10000 AS DOUBLE) / 100.0 AS charge
FROM s
"""


def lines_value_corr(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Pearson correlation between an order's LINE COUNT and its header
    TOTAL VALUE — the fan-out sanity scalar for the orders⋈lineitem pair
    (near-1 says totalprice is line-driven as TPC-H intends; a drop in a
    real feed means header-only adjustments arrived). Per-order line
    counts reduce through the order-bucketed combiner and meet the header
    through the co-partitioned ``hash_join``; then the ``corr_value_hour``
    exactness mold — integer sufficient statistics (x = lines, y = cents),
    Python-int merge, one shared double expression rounded 6. batch_size
    8192 bounds the Σy² partial (o_totalprice < 6e5 → y² < 3.6e15... cents
    < 6e7 → y² < 3.6e15 → 8192 rows < 3e19? No: totalprice tops ~5.6e5
    dollars = 5.6e7 cents, y² ≈ 3.2e15, so 256 rows per partial keep it
    < 8.2e17 — int64-safe). Output: n_orders, corr_lines_value."""
    import math

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.money import cents_i64

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["l_orderkey"].groupby(batch["l_orderkey"],
                                        sort=False).size()
        return pd.DataFrame({
            "o_orderkey": s.index.astype("int64"),
            "nl": s.to_numpy().astype("int64"),
        })

    per_order = bucketed_group_apply(
        li.map_batches(count_partial, batch_format="pandas",
                       batch_size=65536),
        ["o_orderkey"],
        lambda b: b.groupby("o_orderkey", sort=False)["nl"].sum()
        .reset_index(),
        n_buckets=n_buckets,
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    j = hash_join(per_order, orders, on="o_orderkey", n_buckets=n_buckets)

    def suff(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["nl"].to_numpy(dtype="int64")
        y = cents_i64(batch["o_totalprice"])
        return pd.DataFrame({
            "k": ["all"],
            "n": [np.int64(len(batch))],
            "sx": [x.sum()], "sy": [y.sum()], "sxy": [(x * y).sum()],
            "sx2": [(x * x).sum()], "sy2": [(y * y).sum()],
        })

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        n = sum(int(v) for v in bucket["n"])
        sx = sum(int(v) for v in bucket["sx"])
        sy = sum(int(v) for v in bucket["sy"])
        sxy = sum(int(v) for v in bucket["sxy"])
        sx2 = sum(int(v) for v in bucket["sx2"])
        sy2 = sum(int(v) for v in bucket["sy2"])
        dx, dy = n * sx2 - sx * sx, n * sy2 - sy * sy
        if n == 0 or dx <= 0 or dy <= 0:
            return pd.DataFrame({
                "n_orders": pd.array([], dtype="int64"),
                "corr_lines_value": pd.array([], dtype="float64"),
            })
        corr = float(n * sxy - sx * sy) / math.sqrt(float(dx) * float(dy))
        return pd.DataFrame({
            "n_orders": pd.Series([n], dtype="int64"),
            "corr_lines_value": [float(np.round(corr, 6))],
        })

    return bucketed_group_apply(
        j.map_batches(suff, batch_format="pandas", batch_size=256),
        ["k"],
        final,
        n_buckets=1,
    )


LINES_VALUE_CORR_SQL = """
WITH po AS (
  SELECT l_orderkey AS o_orderkey, COUNT(*) AS nl
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT po.nl AS x,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y
  FROM po JOIN orders o USING (o_orderkey)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM j
)
SELECT n AS n_orders,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6)
         AS corr_lines_value
FROM s WHERE n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
"""


def region_revenue(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Net revenue by CUSTOMER REGION: the full lineitem→orders→customer
    geography rollup without Q5's one-region filter or same-nation
    constraint — the five-row world map of where the money comes from.
    Lineitems pre-aggregate PER ORDER in the map (one scaled-int + count),
    the two big joins are co-partitioned ``hash_join``s, and only the
    25-row nation→region map ships via ``ray.put``. Exact 1e-4-scaled
    ints; share one division rounded 6. Output: r_name, n_lines, revenue,
    share."""
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.money import rev_scaled4

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    nat_ref = ray.put(dict(zip(nat["n_nationkey"], nat["r_name"])))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def per_order(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "o_orderkey": batch["l_orderkey"],
            "n": np.int64(1),
            "rev4": rev_scaled4(batch["l_extendedprice"],
                                batch["l_discount"]),
        }).groupby("o_orderkey", sort=False).sum().reset_index()
        return g

    lo = hash_join(
        li.map_batches(per_order, batch_format="pandas", batch_size=65536),
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ),
        on="o_orderkey",
        n_buckets=n_buckets,
    ).map_batches(
        lambda b: b.groupby("o_custkey", sort=False)[["n", "rev4"]].sum()
        .astype("int64").reset_index()
        .rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas", batch_size=65536,
    )
    lc = hash_join(
        lo,
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        ),
        on="c_custkey",
        n_buckets=n_buckets,
    )

    def per_nation(batch: pd.DataFrame) -> pd.DataFrame:
        # the join side can arrive as nullable Int64 -> pandas sums to
        # Float64; force plain int64 so cents stay exact at any scale
        return batch.groupby("c_nationkey", sort=False)[["n", "rev4"]]\
            .sum().astype("int64").reset_index()

    parts = lc.map_batches(per_nation, batch_format="pandas",
                           batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        region = bucket["c_nationkey"].map(ray.get(nat_ref))
        g = bucket.groupby(region, sort=False)[["n", "rev4"]].sum()
        rows = []
        for rname, r in g.iterrows():  # <= 5 regions per bucket
            rows.append((rname, int(r["n"]),
                         ((int(r["rev4"]) + 50) // 100) / 100.0,
                         int(r["rev4"])))
        out = pd.DataFrame(rows, columns=["r_name", "n_lines", "revenue",
                                          "_rev4"])
        tot = float(out["_rev4"].sum())
        out["share"] = np.round(out["_rev4"].to_numpy(dtype="float64")
                                / tot, 6)
        return out.drop(columns=["_rev4"]).astype({"n_lines": "int64"})

    # ONE bucket: the share denominator is global and regions are 5 rows
    return bucketed_group_apply(parts, ["c_nationkey"], final, n_buckets=1)


REGION_REVENUE_SQL = """
WITH s AS (
  SELECT r.r_name, COUNT(*) AS n,
         SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS rev4
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nt ON nt.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nt.n_regionkey
  GROUP BY r.r_name
)
SELECT r_name, CAST(n AS BIGINT) AS n_lines,
       CAST((rev4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
       ROUND(CAST(rev4 AS DOUBLE) / SUM(CAST(rev4 AS DOUBLE)) OVER (), 6)
         AS share
FROM s
"""


def brand_revenue(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Net revenue by PART BRAND — ``region_revenue``'s product-side twin
    (which brands carry the catalogue). Unlike the 25-row nation map, the
    part table is fact-sized at scale, so the brand attribute arrives
    through the co-partitioned ``hash_join`` on partkey, never a
    broadcast; lineitems pre-aggregate per part in the map first (one
    scaled-int + count per partkey per batch). Exact 1e-4-scaled ints;
    share is one division rounded 6. Output: p_brand, n_lines, revenue,
    share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.money import rev_scaled4

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def per_part(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_partkey": batch["l_partkey"],
            "n": np.int64(1),
            "rev4": rev_scaled4(batch["l_extendedprice"],
                                batch["l_discount"]),
        }).groupby("p_partkey", sort=False).sum().astype("int64")\
            .reset_index()

    lp = hash_join(
        li.map_batches(per_part, batch_format="pandas", batch_size=65536),
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        ),
        on="p_partkey",
        n_buckets=n_buckets,
    )

    def per_brand(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("p_brand", sort=False)[["n", "rev4"]]\
            .sum().astype("int64").reset_index()

    parts = lp.map_batches(per_brand, batch_format="pandas",
                           batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("p_brand", sort=False)[["n", "rev4"]].sum()
        rows = []
        for brand, r in g.iterrows():  # brand set is enum-bounded (~25)
            rows.append((brand, int(r["n"]),
                         ((int(r["rev4"]) + 50) // 100) / 100.0,
                         int(r["rev4"])))
        out = pd.DataFrame(rows, columns=["p_brand", "n_lines", "revenue",
                                          "_rev4"])
        tot = float(out["_rev4"].sum())
        out["share"] = np.round(out["_rev4"].to_numpy(dtype="float64")
                                / tot, 6)
        return out.drop(columns=["_rev4"]).astype({"n_lines": "int64"})

    # ONE bucket: the share denominator is global, brands are ~25 rows
    return bucketed_group_apply(parts, ["p_brand"], final, n_buckets=1)


BRAND_REVENUE_SQL = """
WITH s AS (
  SELECT p.p_brand, COUNT(*) AS n,
         SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS rev4
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
)
SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
       CAST((rev4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
       ROUND(CAST(rev4 AS DOUBLE) / SUM(CAST(rev4 AS DOUBLE)) OVER (), 6)
         AS share
FROM s
"""


def customer_nation_mix(sf_dir: str, n_buckets: int = 8) -> ray.data.Dataset:
    """Customer headcount and mean account balance by NATION — the
    demographic base rate behind ``returns_by_nation``/``nation_hhi``
    (is a nation's revenue share just its customer share?). Per-batch
    partials bound the exchange to nation cardinality; the 25-row
    nation-name map ships via ``ray.put``. Balances sum in exact int
    cents (acctbal can be negative — plain int sum, no half-up needed);
    the mean and share are each one deterministic double division
    rounded 6. Output: n_name, n_customers, avg_acctbal, share."""
    import pyarrow.parquet as pq

    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_ref = ray.put(dict(zip(nat["n_nationkey"], nat["n_name"])))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_nationkey": batch["c_nationkey"].astype("int64"),
            "n": np.int64(1),
            "cents": cents_i64(batch["c_acctbal"]),
        }).groupby("c_nationkey", sort=False).sum().astype("int64")\
            .reset_index()

    parts = cust.map_batches(partial, batch_format="pandas",
                             batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("c_nationkey", sort=False)[["n", "cents"]]\
            .sum()
        name = pd.Series(g.index, index=g.index).map(ray.get(nat_ref))
        n = g["n"].to_numpy(dtype="int64")
        cents = g["cents"].to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "n_name": name.to_numpy(),
            "n_customers": n,
            "avg_acctbal": np.round(
                cents.astype("float64") / (100.0 * n), 6),
            "share": np.round(n.astype("float64") / tot, 6),
        })

    # ONE bucket: the share denominator is global, nations are 25 rows
    return bucketed_group_apply(parts, ["c_nationkey"], final, n_buckets=1)


CUSTOMER_NATION_MIX_SQL = """
WITH s AS (
  SELECT c_nationkey, COUNT(*) AS n,
         SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS cents
  FROM customer GROUP BY c_nationkey
)
SELECT n.n_name, CAST(s.n AS BIGINT) AS n_customers,
       ROUND(CAST(s.cents AS DOUBLE) / (100.0 * s.n), 6) AS avg_acctbal,
       ROUND(CAST(s.n AS DOUBLE) / SUM(CAST(s.n AS DOUBLE)) OVER (), 6)
         AS share
FROM s JOIN nation n ON n.n_nationkey = s.c_nationkey
"""


def order_value_deciles(
    sf_dir: str, collect_budget: int = 65536
) -> ray.data.Dataset:
    """Exact DECILES of the order header value — the distributional view
    behind ``segment_aov``'s means (where the mass of order sizes actually
    sits). One histogram-refinement descent (functions/quantile.py —
    driver memory bounded by ``collect_budget`` at any order count) over
    the single pruned column; all nine ranks share the descent's scans.
    QUANTILE_CONT-identical interpolation, np.round 6.
    Output: one row — n_orders, p10..p90."""
    from tcx2graph_jl_ray.functions.quantile import exact_global_quantiles

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )
    qs = [i / 10.0 for i in range(1, 10)]
    n, qv = exact_global_quantiles(
        orders, "o_totalprice", qs, collect_budget
    )
    out = {"n_orders": pd.array([n], dtype="int64")}
    for q in qs:
        out[f"p{int(q * 100)}"] = [float(np.round(qv[q], 6))]
    return ray.data.from_pandas(pd.DataFrame(out))


ORDER_VALUE_DECILES_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(QUANTILE_CONT(o_totalprice, 0.1), 6) AS p10,
       ROUND(QUANTILE_CONT(o_totalprice, 0.2), 6) AS p20,
       ROUND(QUANTILE_CONT(o_totalprice, 0.3), 6) AS p30,
       ROUND(QUANTILE_CONT(o_totalprice, 0.4), 6) AS p40,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 6) AS p50,
       ROUND(QUANTILE_CONT(o_totalprice, 0.6), 6) AS p60,
       ROUND(QUANTILE_CONT(o_totalprice, 0.7), 6) AS p70,
       ROUND(QUANTILE_CONT(o_totalprice, 0.8), 6) AS p80,
       ROUND(QUANTILE_CONT(o_totalprice, 0.9), 6) AS p90
FROM orders
"""


def urgent_share_monthly(sf_dir: str, n_buckets: int = 8) -> ray.data.Dataset:
    """URGENT-priority order share by MONTH — ``priority_mix``'s static
    composition put on the time axis (a drifting urgent share is an
    upstream feed change every SLA dashboard needs first). Monthly
    partials bound the exchange to the month count; the share is one
    double division of exact counts, rounded 6.
    Output: month, n_orders, n_urgent, urgent_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        month = pd.to_datetime(batch["o_orderdate"]).dt.strftime("%Y-%m")
        urgent = batch["o_orderpriority"].str.startswith("1-")\
            .astype("int64")
        g = urgent.groupby(month, sort=False).agg(["size", "sum"])
        return pd.DataFrame({
            "month": g.index,
            "n": g["size"].to_numpy().astype("int64"),
            "u": g["sum"].to_numpy().astype("int64"),
        })

    parts = orders.map_batches(partial, batch_format="pandas",
                               batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("month", sort=False)[["n", "u"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        u = g["u"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "month": g.index,
            "n_orders": n,
            "n_urgent": u,
            "urgent_share": np.round(u.astype("float64") / n, 6),
        })

    return bucketed_group_apply(parts, ["month"], final, n_buckets=4)


URGENT_SHARE_MONTHLY_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_urgent,
       ROUND(CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0
                      END) AS DOUBLE) / COUNT(*), 6) AS urgent_share
FROM orders GROUP BY 1
"""


def part_size_profile(sf_dir: str, n_buckets: int = 8) -> ray.data.Dataset:
    """Catalogue profile by PART SIZE: part count and mean retail price
    per size class — the assortment view next to ``brand_revenue``'s
    sales view. Size classes are enum-bounded so partials bound the
    exchange; retail prices sum in exact int cents and the mean is one
    deterministic double division rounded 6.
    Output: p_size, n_parts, avg_retail."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_size", "p_retailprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_size": batch["p_size"].astype("int64"),
            "n": np.int64(1),
            "cents": cents_i64(batch["p_retailprice"]),
        }).groupby("p_size", sort=False).sum().astype("int64")\
            .reset_index()

    parts = part.map_batches(partial, batch_format="pandas",
                             batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("p_size", sort=False)[["n", "cents"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        cents = g["cents"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "p_size": g.index.to_numpy().astype("int64"),
            "n_parts": n,
            "avg_retail": np.round(
                cents.astype("float64") / (100.0 * n), 6),
        })

    return bucketed_group_apply(parts, ["p_size"], final, n_buckets=1)


PART_SIZE_PROFILE_SQL = """
WITH s AS (
  SELECT p_size, COUNT(*) AS n,
         SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS cents
  FROM part GROUP BY p_size
)
SELECT CAST(p_size AS BIGINT) AS p_size, CAST(n AS BIGINT) AS n_parts,
       ROUND(CAST(cents AS DOUBLE) / (100.0 * n), 6) AS avg_retail
FROM s
"""


def returned_rate_monthly(
    sf_dir: str, n_buckets: int = 8
) -> ray.data.Dataset:
    """RETURN RATE by ship month: the share of lineitems flagged 'R',
    with the returned revenue share alongside — ``returns_by_nation``'s
    geography view put on the calendar (a climbing return rate is a
    quality regression; the revenue-weighted version says whether it is
    the big tickets coming back). Monthly partials bound the exchange;
    counts and scaled-int revenue are exact; each share is one double
    division rounded 6. Output: month, n_lines, n_returned, return_rate,
    returned_rev_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import rev_scaled4

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_returnflag", "l_extendedprice",
                 "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        month = pd.to_datetime(batch["l_shipdate"]).dt.strftime("%Y-%m")
        ret = (batch["l_returnflag"] == "R").to_numpy()
        rev4 = rev_scaled4(batch["l_extendedprice"], batch["l_discount"])
        g = pd.DataFrame({
            "month": month,
            "n": np.int64(1),
            "r": ret.astype("int64"),
            "rev4": rev4,
            "rrev4": np.where(ret, rev4, np.int64(0)),
        }).groupby("month", sort=False).sum().reset_index()
        for c in ("n", "r", "rev4", "rrev4"):
            g[c] = g[c].astype("int64")
        return g

    parts = li.map_batches(partial, batch_format="pandas",
                           batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("month", sort=False)[
            ["n", "r", "rev4", "rrev4"]
        ].sum()
        n = g["n"].to_numpy(dtype="int64")
        r = g["r"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "month": g.index,
            "n_lines": n,
            "n_returned": r,
            "return_rate": np.round(r.astype("float64") / n, 6),
            "returned_rev_share": np.round(
                g["rrev4"].to_numpy(dtype="float64")
                / g["rev4"].to_numpy(dtype="float64"), 6),
        })

    return bucketed_group_apply(parts, ["month"], final, n_buckets=4)


RETURNED_RATE_MONTHLY_SQL = """
WITH s AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         COUNT(*) AS n,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev4,
         SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                  ELSE 0 END) AS rrev4
  FROM lineitem GROUP BY 1
)
SELECT month, CAST(n AS BIGINT) AS n_lines,
       CAST(r AS BIGINT) AS n_returned,
       ROUND(CAST(r AS DOUBLE) / n, 6) AS return_rate,
       ROUND(CAST(rrev4 AS DOUBLE) / CAST(rev4 AS DOUBLE), 6)
         AS returned_rev_share
FROM s
"""


def supplier_breadth_hist(
    sf_dir: str, n_buckets: int = 32
) -> ray.data.Dataset:
    """Catalogue BREADTH per supplier: how many DISTINCT parts each
    supplier actually shipped, rolled into a log2 histogram — the
    supply-chain concentration view next to ``supplier_acctbal``'s
    finance view (a corpus of single-part suppliers joins very
    differently from one of broad-line distributors). (supp, part)
    dedups per batch then exactly in the supplier-bucketed reduce; the
    bin is the PURE-INTEGER ``bit_length`` rule; the count-of-counts
    fold bounds the final exchange. Output: bin, min_parts, n_suppliers,
    share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["l_suppkey", "l_partkey"]].drop_duplicates()

    parts = li.map_batches(partial, batch_format="pandas",
                           batch_size=65536)

    def per_supp(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("l_suppkey", sort=False)["l_partkey"].nunique()
        c = g.to_numpy(dtype="int64")
        bins = np.array([int(x).bit_length() - 1 for x in c],
                        dtype="int64")
        s = pd.Series(bins).groupby(bins).size()
        return pd.DataFrame({
            "bin": s.index.to_numpy().astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    mid = bucketed_group_apply(parts, ["l_suppkey"], per_supp,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("bin", sort=False)["n"].sum()
        n = g.to_numpy(dtype="int64")
        tot = float(n.sum())
        b = g.index.to_numpy().astype("int64")
        return pd.DataFrame({
            "bin": b,
            "min_parts": (np.int64(1) << b).astype("int64"),
            "n_suppliers": n,
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(mid, ["bin"], final, n_buckets=1)


SUPPLIER_BREADTH_HIST_SQL = """
WITH s AS (
  SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS np
  FROM lineitem GROUP BY l_suppkey
),
h AS (
  SELECT CAST(floor(log2(np)) AS BIGINT) AS bin, COUNT(*) AS n
  FROM s GROUP BY 1
)
SELECT bin, CAST(POWER(2, bin) AS BIGINT) AS min_parts,
       CAST(n AS BIGINT) AS n_suppliers,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM h
"""


_PK_SPECS = (
    ("orders", ("o_orderkey",)),
    ("customer", ("c_custkey",)),
    ("part", ("p_partkey",)),
    ("supplier", ("s_suppkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
)


def pk_audit(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """PRIMARY-KEY uniqueness audit across the relational tables: row
    count, distinct declared-key count, and duplicate-key rows per table
    — the ingest gate every warehouse load runs first (a single
    double-loaded partition silently doubles revenue downstream). Each
    table streams only its key columns; per-batch (key) dedup partials
    reduce exactly in the key-bucketed apply (count + duplicate count are
    order-free); per-table results are 5 rows total.
    Output: table_name, n_rows, n_keys, dup_rows."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    frames = []
    for tname, keys in _PK_SPECS:
        ds = ray.data.read_parquet(
            f"{sf_dir}/{tname}.parquet", columns=list(keys)
        )

        def partial(batch: pd.DataFrame, keys=keys) -> pd.DataFrame:
            g = batch.groupby(list(keys), sort=False).size()
            out = g.reset_index(name="n")
            out["n"] = out["n"].astype("int64")
            return out

        def per_key(bucket: pd.DataFrame, keys=keys) -> pd.DataFrame:
            g = bucket.groupby(list(keys), sort=False)["n"].sum()
            c = g.to_numpy(dtype="int64")
            return pd.DataFrame({
                "n_rows": pd.array([int(c.sum())], dtype="int64"),
                "n_keys": pd.array([len(c)], dtype="int64"),
                "dup_rows": pd.array(
                    [int((c[c > 1]).sum())], dtype="int64"),
            })

        red = bucketed_group_apply(
            ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536),
            list(keys), per_key, n_buckets=n_buckets,
        ).to_pandas()  # <= n_buckets rows per table — bounded
        frames.append(pd.DataFrame({
            "table_name": [tname],
            "n_rows": pd.array([int(red["n_rows"].sum())], dtype="int64"),
            "n_keys": pd.array([int(red["n_keys"].sum())], dtype="int64"),
            "dup_rows": pd.array(
                [int(red["dup_rows"].sum())], dtype="int64"),
        }))
    return ray.data.from_pandas(pd.concat(frames, ignore_index=True))


PK_AUDIT_SQL = """
SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       CAST(COUNT(*) - (SELECT COUNT(*) FROM (
         SELECT 1 FROM orders GROUP BY o_orderkey HAVING COUNT(*) = 1
       )) AS BIGINT) AS dup_rows
FROM orders
UNION ALL
SELECT 'customer', COUNT(*), COUNT(DISTINCT c_custkey),
       COUNT(*) - (SELECT COUNT(*) FROM (
         SELECT 1 FROM customer GROUP BY c_custkey HAVING COUNT(*) = 1))
FROM customer
UNION ALL
SELECT 'part', COUNT(*), COUNT(DISTINCT p_partkey),
       COUNT(*) - (SELECT COUNT(*) FROM (
         SELECT 1 FROM part GROUP BY p_partkey HAVING COUNT(*) = 1))
FROM part
UNION ALL
SELECT 'supplier', COUNT(*), COUNT(DISTINCT s_suppkey),
       COUNT(*) - (SELECT COUNT(*) FROM (
         SELECT 1 FROM supplier GROUP BY s_suppkey HAVING COUNT(*) = 1))
FROM supplier
UNION ALL
SELECT 'lineitem', COUNT(*),
       (SELECT COUNT(*) FROM (
          SELECT 1 FROM lineitem GROUP BY l_orderkey, l_linenumber)),
       COUNT(*) - (SELECT COUNT(*) FROM (
         SELECT 1 FROM lineitem GROUP BY l_orderkey, l_linenumber
         HAVING COUNT(*) = 1))
FROM lineitem
"""


_FK_SPECS = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
)


def fk_audit(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """FOREIGN-KEY audit across the star schema: per declared
    relationship, the child row count and how many child rows reference
    a parent key that does not exist — ``pk_audit``'s referential twin
    (orphans silently vanish from every inner join downstream). Each
    side streams only its key column; child-side per-key count partials
    and the parent key set co-locate in one key-bucketed tagged union
    (an anti-join with no driver set and no broadcast); 4 rows out.
    Output: relationship, n_child_rows, n_orphans, orphan_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    frames = []
    for rel, child_t, child_k, parent_t, parent_k in _FK_SPECS:
        child = ray.data.read_parquet(
            f"{sf_dir}/{child_t}.parquet", columns=[child_k]
        )
        parent = ray.data.read_parquet(
            f"{sf_dir}/{parent_t}.parquet", columns=[parent_k]
        )

        def c_part(batch: pd.DataFrame, k=child_k) -> pd.DataFrame:
            s = batch[k].groupby(batch[k], sort=False).size()
            return pd.DataFrame({
                "key": s.index.to_numpy().astype("int64"),
                "n": s.to_numpy().astype("int64"),
                "is_parent": np.int64(0),
            })

        def p_part(batch: pd.DataFrame, k=parent_k) -> pd.DataFrame:
            u = batch[k].drop_duplicates()
            return pd.DataFrame({
                "key": u.to_numpy().astype("int64"),
                "n": np.int64(0),
                "is_parent": np.int64(1),
            })

        both = child.map_batches(
            c_part, batch_format="pandas", batch_size=65536
        ).union(parent.map_batches(
            p_part, batch_format="pandas", batch_size=65536
        ))

        def per_key(bucket: pd.DataFrame) -> pd.DataFrame:
            g = bucket.groupby("key", sort=False).agg(
                n=("n", "sum"), p=("is_parent", "max")
            )
            n = g["n"].to_numpy(dtype="int64")
            orphan = n[(g["p"].to_numpy() == 0)]
            return pd.DataFrame({
                "n_child": pd.array([int(n.sum())], dtype="int64"),
                "n_orphans": pd.array(
                    [int(orphan.sum())], dtype="int64"),
            })

        red = bucketed_group_apply(
            both, ["key"], per_key, n_buckets=n_buckets
        ).to_pandas()  # <= n_buckets rows — bounded
        nc = int(red["n_child"].sum())
        no = int(red["n_orphans"].sum())
        frames.append(pd.DataFrame({
            "relationship": [rel],
            "n_child_rows": pd.array([nc], dtype="int64"),
            "n_orphans": pd.array([no], dtype="int64"),
            "orphan_share": [float(np.round(no / nc, 6))],
        }))
    return ray.data.from_pandas(pd.concat(frames, ignore_index=True))


FK_AUDIT_SQL = """
SELECT 'lineitem.l_orderkey->orders' AS relationship,
       CAST(COUNT(*) AS BIGINT) AS n_child_rows,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans,
       ROUND(CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS orphan_share
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'orders.o_custkey->customer', COUNT(*),
       SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END),
       ROUND(CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6)
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL
SELECT 'lineitem.l_partkey->part', COUNT(*),
       SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END),
       ROUND(CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6)
FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
UNION ALL
SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
       SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END),
       ROUND(CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6)
FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
"""


def orders_dow_profile(sf_dir: str, n_buckets: int = 8) -> ray.data.Dataset:
    """Order flow by ISO WEEKDAY: order count and exact header value per
    day-of-week — the relational calendar clock next to the events-side
    ``dow_profile`` (a B2B feed goes quiet on weekends; a consumer feed
    peaks there). Counts and cents are exact partials bounded to seven
    rows per batch; the value mean is one deterministic double division
    rounded 6. Output: dow, n_orders, value_sum, avg_value, share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        dow = pd.to_datetime(batch["o_orderdate"]).dt.dayofweek\
            .astype("int64") + 1  # ISO: Monday = 1
        return pd.DataFrame({
            "dow": dow,
            "n": np.int64(1),
            "cents": cents_i64(batch["o_totalprice"]),
        }).groupby("dow", sort=False).sum().astype("int64").reset_index()

    parts = orders.map_batches(partial, batch_format="pandas",
                               batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("dow", sort=False)[["n", "cents"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        cents = g["cents"].to_numpy(dtype="int64")
        tot = float(n.sum())
        return pd.DataFrame({
            "dow": g.index.to_numpy().astype("int64"),
            "n_orders": n,
            # exact int cents -> one deterministic double division
            "value_sum": cents.astype("float64") / 100.0,
            "avg_value": np.round(
                cents.astype("float64") / (100.0 * n), 6),
            "share": np.round(n.astype("float64") / tot, 6),
        })

    return bucketed_group_apply(parts, ["dow"], final, n_buckets=1)


ORDERS_DOW_PROFILE_SQL = """
WITH s AS (
  SELECT isodow(o_orderdate) AS dow, COUNT(*) AS n,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n_orders,
       CAST(cents AS DOUBLE) / 100.0 AS value_sum,
       ROUND(CAST(cents AS DOUBLE) / (100.0 * n), 6) AS avg_value,
       ROUND(CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER (), 6)
         AS share
FROM s
"""


def deadstock_by_brand(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """DEAD STOCK by brand: how many catalogue parts never appear on a
    lineitem, per brand — the inventory-health anti-join (a brand whose
    catalogue is half dead is a ranging mistake). The shipped-part key
    set and the part table meet in one partkey-bucketed tagged union
    (the ``fk_audit`` anti-join shape — no driver set, no broadcast);
    brand partials then bound the final exchange to the brand enum.
    Output: p_brand, n_parts, n_dead, dead_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
    )

    def p_tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": batch["p_partkey"].astype("int64"),
            "brand": batch["p_brand"],
            "shipped": np.int64(0),
        })

    def l_tag(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["l_partkey"].drop_duplicates()
        return pd.DataFrame({
            "key": u.to_numpy().astype("int64"),
            # "" = missing sentinel: max("", brand) keeps the real brand
            # (object max chokes on str-vs-NaN)
            "brand": "",
            "shipped": np.int64(1),
        })

    both = part.map_batches(
        p_tag, batch_format="pandas", batch_size=65536
    ).union(li.map_batches(
        l_tag, batch_format="pandas", batch_size=65536
    ))

    def per_key(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("key", sort=False).agg(
            shipped=("shipped", "max"), brand=("brand", "max")
        )
        g = g[g["brand"] != ""]  # keys with no part row are FK noise
        out = pd.DataFrame({
            "p_brand": g["brand"],
            "n": np.int64(1),
            "dead": (g["shipped"].to_numpy() == 0).astype("int64"),
        }).groupby("p_brand", sort=False).sum().reset_index()
        return out.astype({"n": "int64", "dead": "int64"})

    mid = bucketed_group_apply(both, ["key"], per_key,
                               n_buckets=n_buckets)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("p_brand", sort=False)[["n", "dead"]].sum()
        n = g["n"].to_numpy(dtype="int64")
        d = g["dead"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "p_brand": g.index,
            "n_parts": n,
            "n_dead": d,
            "dead_share": np.round(d.astype("float64") / n, 6),
        })

    return bucketed_group_apply(mid, ["p_brand"], final, n_buckets=1)


DEADSTOCK_BY_BRAND_SQL = """
WITH shipped AS (SELECT DISTINCT l_partkey FROM lineitem),
s AS (
  SELECT p.p_brand, COUNT(*) AS n,
         SUM(CASE WHEN sh.l_partkey IS NULL THEN 1 ELSE 0 END) AS dead
  FROM part p LEFT JOIN shipped sh ON sh.l_partkey = p.p_partkey
  GROUP BY p.p_brand
)
SELECT p_brand, CAST(n AS BIGINT) AS n_parts,
       CAST(dead AS BIGINT) AS n_dead,
       ROUND(CAST(dead AS DOUBLE) / n, 6) AS dead_share
FROM s
"""


def customer_concentration(
    sf_dir: str, k: int = 10, n_buckets: int = 64
) -> ray.data.Dataset:
    """Revenue CONCENTRATION scalar CR-k: the share of total order value
    held by the top-``k`` customers — ``top_customers``' leaderboard
    reduced to the one number an account-risk dashboard tracks. Exact
    cents throughout: per-customer sums reduce customer-bucketed, each
    bucket emits its own top-k candidates plus its full-bucket total
    (lossless: the global top-k is inside the union of per-bucket
    top-ks), and the driver merges k x n_buckets candidate rows (ties
    break to the smaller custkey). The share is one double division
    rounded 6. Output: one row — n_top, top_value, total_value, cr."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.money import cents_i64

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": batch["o_custkey"].astype("int64"),
            "cents": cents_i64(batch["o_totalprice"]),
        }).groupby("o_custkey", sort=False).sum().astype("int64")\
            .reset_index()

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("o_custkey", sort=False)["cents"].sum()\
            .reset_index()
        g = g.sort_values(["cents", "o_custkey"],
                          ascending=[False, True], kind="mergesort")
        top = g.head(k).copy()
        top["bucket_total"] = np.int64(0)
        tot = pd.DataFrame({
            "o_custkey": pd.array([-1], dtype="int64"),
            "cents": pd.array([0], dtype="int64"),
            "bucket_total": pd.array(
                [int(g["cents"].sum())], dtype="int64"),
        })
        return pd.concat([top, tot], ignore_index=True)

    cand = bucketed_group_apply(
        orders.map_batches(partial, batch_format="pandas",
                           batch_size=65536),
        ["o_custkey"], per_bucket, n_buckets=n_buckets,
    ).to_pandas()  # <= (k+1) x n_buckets rows — bounded

    total = int(cand["bucket_total"].sum())
    tops = cand[cand["o_custkey"] >= 0].sort_values(
        ["cents", "o_custkey"], ascending=[False, True],
        kind="mergesort").head(k)
    top_cents = int(tops["cents"].sum())
    return ray.data.from_pandas(pd.DataFrame({
        "n_top": pd.array([len(tops)], dtype="int64"),
        "top_value": [float(top_cents) / 100.0],
        "total_value": [float(total) / 100.0],
        # float() each side BEFORE dividing: the oracle casts both to
        # DOUBLE, and past 2^53 cents Python's exact big-int quotient
        # would differ from the double/double one
        "cr": [float(np.round(float(top_cents) / float(total), 6))],
    }))


def customer_concentration_sql(k: int = 10) -> str:
    return f"""
WITH u AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
t AS (SELECT SUM(cents) AS total FROM u),
tp AS (
  SELECT cents FROM u
  ORDER BY cents DESC, o_custkey LIMIT {k}
),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
             SUM(cents) AS top_cents FROM tp)
SELECT n_top,
       CAST(top_cents AS DOUBLE) / 100.0 AS top_value,
       CAST(t.total AS DOUBLE) / 100.0 AS total_value,
       ROUND(CAST(top_cents AS DOUBLE) / t.total, 6) AS cr
FROM s, t
"""


def status_priority_matrix(
    sf_dir: str, n_buckets: int = 4
) -> ray.data.Dataset:
    """Order STATUS × PRIORITY contingency table with within-priority
    shares — the fulfilment-health cross-tab behind ``status_mix`` and
    ``priority_mix`` (urgent orders stuck in 'O' is the row an ops
    review looks for). Per-batch (status, priority) partials bound the
    exchange to the tiny enum product; the share divides two exact ints,
    rounded 6. Output: o_orderstatus, o_orderpriority, n_orders,
    share_in_priority."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["o_orderstatus", "o_orderpriority"],
                          sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = orders.map_batches(partial, batch_format="pandas",
                               batch_size=65536)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["o_orderstatus", "o_orderpriority"],
                           sort=False)["n"].sum().reset_index()
        tot = g.groupby("o_orderpriority", sort=False)["n"]\
            .transform("sum")
        return pd.DataFrame({
            "o_orderstatus": g["o_orderstatus"],
            "o_orderpriority": g["o_orderpriority"],
            "n_orders": g["n"].astype("int64"),
            "share_in_priority": np.round(
                g["n"].to_numpy(dtype="float64")
                / tot.to_numpy(dtype="float64"), 6),
        })

    # ONE bucket: the within-priority denominator needs every status of a
    # priority; the enum product is constant-size
    return bucketed_group_apply(parts, ["o_orderpriority"], final,
                                n_buckets=1)


STATUS_PRIORITY_MATRIX_SQL = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus, o_orderpriority, CAST(n AS BIGINT) AS n_orders,
       ROUND(CAST(n AS DOUBLE)
             / SUM(CAST(n AS DOUBLE))
               OVER (PARTITION BY o_orderpriority), 6)
         AS share_in_priority
FROM c
"""


def ship_before_order(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """TEMPORAL integrity check: lineitems whose ship date precedes
    their order's order date — the impossible-timeline detector that
    belongs next to ``pk_audit``/``fk_audit`` in any ingest gate (clock
    skew or a partial reload shows up here first). The two fact tables
    meet in the co-partitioned ``hash_join`` on orderkey; per-batch
    partials fold to three exact ints; one-row output.
    Output: n_lines, n_bad, bad_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    j = hash_join(
        li.map_batches(
            lambda b: pd.DataFrame({
                "o_orderkey": b["l_orderkey"].astype("int64"),
                "l_shipdate": b["l_shipdate"],
            }),
            batch_format="pandas", batch_size=65536,
        ),
        orders, on="o_orderkey", n_buckets=n_buckets,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bad = (
            pd.to_datetime(batch["l_shipdate"])
            < pd.to_datetime(batch["o_orderdate"])
        )
        return pd.DataFrame({
            "k": ["all"],
            "n": [np.int64(len(batch))],
            "bad": [np.int64(int(bad.sum()))],
        })

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        n = int(bucket["n"].sum())
        bad = int(bucket["bad"].sum())
        return pd.DataFrame({
            "n_lines": pd.array([n], dtype="int64"),
            "n_bad": pd.array([bad], dtype="int64"),
            "bad_share": [float(np.round(float(bad) / float(n), 6))],
        })

    return bucketed_group_apply(
        j.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["k"], final, n_buckets=1,
    )


SHIP_BEFORE_ORDER_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bad,
       ROUND(CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS bad_share
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
"""


def customer_repeat_rate(
    sf_dir: str, n_buckets: int = 32
) -> ray.data.Dataset:
    """REPEAT-customer rate: the share of ordering customers with two or
    more orders — the single retention scalar behind
    ``q13_order_counts``' full distribution (every commerce dashboard's
    first number). Per-customer counts reduce customer-bucketed; each
    bucket folds to three exact ints; the share is one double division
    rounded 6. Output: n_customers, n_repeat, repeat_share."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["o_custkey"].groupby(batch["o_custkey"],
                                       sort=False).size()
        return pd.DataFrame({
            "o_custkey": s.index.astype("int64"),
            "n": s.to_numpy().astype("int64"),
        })

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("o_custkey", sort=False)["n"].sum()
        c = g.to_numpy(dtype="int64")
        return pd.DataFrame({
            "k": ["all"],
            "nc": [np.int64(len(c))],
            "nr": [np.int64(int((c >= 2).sum()))],
        })

    mid = bucketed_group_apply(
        orders.map_batches(partial, batch_format="pandas",
                           batch_size=65536),
        ["o_custkey"], per_bucket, n_buckets=n_buckets,
    )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        nc = int(bucket["nc"].sum())
        nr = int(bucket["nr"].sum())
        return pd.DataFrame({
            "n_customers": pd.array([nc], dtype="int64"),
            "n_repeat": pd.array([nr], dtype="int64"),
            "repeat_share": [float(np.round(float(nr) / float(nc), 6))],
        })

    return bucketed_group_apply(mid, ["k"], final, n_buckets=1)


CUSTOMER_REPEAT_RATE_SQL = """
WITH u AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       ROUND(CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS repeat_share
FROM u
"""


def transit_backlog(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """OPEN-ORDER BACKLOG curve — the sweep-line interval-count primitive:
    for every distinct order date d, how many orders are open (placed on
    or before d, last line not yet shipped: orderdate <= d < max shipdate).
    Orders whose last ship precedes their order date (3093 at sf0.01 —
    the `rel_ship_integrity` finding) are excluded as non-physical
    intervals in BOTH engine and oracle.

    Shape: per-order last-ship (orderkey-bucketed max) co-partition-joined
    to orders, per-batch +1/-1 day-delta partials, one day-keyed exact
    reduce, then a DAY-BOUNDED driver cumsum (the calendar is thousands of
    rows at any corpus size — the `events_user_growth` fallback pattern).
    Output: day, n_open."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "orderkey": batch["l_orderkey"].astype("int64").to_numpy(),
            "ship_day": (
                pd.to_datetime(batch["l_shipdate"]).dt.floor("D")
                - pd.Timestamp("1970-01-01")
            ).dt.days.astype("int64").to_numpy(),
        })
        return d.groupby("orderkey", sort=False)["ship_day"].max()\
            .reset_index()

    lastship = bucketed_group_apply(
        lineitem.map_batches(
            li_partial, batch_format="pandas", batch_size=65536
        ),
        ["orderkey"],
        lambda b: b.groupby("orderkey", sort=False)["ship_day"].max()
        .reset_index(),
        n_buckets=n_buckets,
    )

    def o_prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "orderkey": batch["o_orderkey"].astype("int64").to_numpy(),
            "start_day": (
                pd.to_datetime(batch["o_orderdate"]).dt.floor("D")
                - pd.Timestamp("1970-01-01")
            ).dt.days.astype("int64").to_numpy(),
        })

    o = orders.map_batches(o_prep, batch_format="pandas", batch_size=65536)
    j = hash_join(o, lastship, on="orderkey", n_buckets=n_buckets)

    def deltas(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["ship_day"] >= batch["start_day"]]
        start = b["start_day"].to_numpy(dtype="int64")
        end = b["ship_day"].to_numpy(dtype="int64")
        d = pd.DataFrame({
            "day": np.concatenate([start, end]),
            "delta": np.concatenate([
                np.ones(len(b), dtype="int64"),
                -np.ones(len(b), dtype="int64"),
            ]),
            # order-date days define the output grid
            "is_start": np.concatenate([
                np.ones(len(b), dtype="int64"),
                np.zeros(len(b), dtype="int64"),
            ]),
        })
        return d.groupby("day", sort=False).agg(
            delta=("delta", "sum"), is_start=("is_start", "sum")
        ).reset_index()

    per_day = bucketed_group_apply(
        j.map_batches(deltas, batch_format="pandas", batch_size=65536),
        ["day"],
        lambda b: b.groupby("day", sort=False)
        .agg(delta=("delta", "sum"), is_start=("is_start", "sum"))
        .reset_index(),
        n_buckets=8,
    ).to_pandas()  # day-bounded: one row per calendar day with activity

    per_day = per_day.sort_values("day", kind="mergesort")
    # inclusive cumsum: at day d, +1 for starts <= d, -1 for ends <= d
    # == count(start <= d AND d < end)
    open_at = per_day["delta"].cumsum().astype("int64")
    keep = per_day["is_start"] > 0
    out = pd.DataFrame({
        "day": (
            pd.Timestamp("1970-01-01")
            + pd.to_timedelta(per_day.loc[keep, "day"], unit="D")
        ).dt.strftime("%Y-%m-%d"),
        "n_open": open_at[keep].to_numpy(),
    })
    return ray.data.from_pandas(out.reset_index(drop=True))


TRANSIT_BACKLOG_SQL = """
WITH ls AS (
  SELECT l_orderkey AS orderkey, MAX(CAST(l_shipdate AS DATE)) AS lastship
  FROM lineitem GROUP BY 1
),
o AS (
  SELECT CAST(o_orderdate AS DATE) AS start_d, ls.lastship
  FROM orders JOIN ls ON o_orderkey = ls.orderkey
  WHERE ls.lastship >= CAST(o_orderdate AS DATE)
),
days AS (SELECT DISTINCT start_d AS d FROM o)
SELECT strftime(days.d, '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN o.start_d <= days.d AND days.d < o.lastship
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_open
FROM days, o
GROUP BY days.d
"""


def header_line_reconcile(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """BILLING RECONCILIATION audit: does each order header's
    ``o_totalprice`` equal the sum of its lines' extended price after
    discount and tax — the denormalization-integrity check every warehouse
    runs between a fact header and its detail table (TPC-H defines
    o_totalprice as exactly that sum; the audit REPORTS the gap profile
    rather than assuming the invariant holds). Reference parity: the
    per-file node/edge count assertions of the reference's tests
    (test/runtests.jl) are the same header-vs-detail conservation idea.

    All arithmetic exact: line value in 1e-6-dollar scaled int64
    (cents x (100-disc) x (100+tax)), header cents x 10^4 on the same
    scale; gaps, tolerance counts and sums stay integer; the one float
    (mean absolute gap in dollars) is the identical division chain on both
    sides. Shape: column-pruned reads, per-batch per-order partials, one
    orderkey-bucketed reduce, co-partitioned LEFT join to headers (orphan
    headers = orders with no lines), one status-keyed fold.

    Output per o_orderstatus: n_orders, n_with_lines, n_orphan,
    n_within_1usd, sum_abs_gap_s6 (int64), mean_abs_gap_usd (float64
    round 6, over orders WITH lines)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.functions.join import hash_join
    from tcx2graph_jl_ray.functions.money import cents_i64

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        s6 = (
            cents_i64(batch["l_extendedprice"].to_numpy())
            * (100 - cents_i64(batch["l_discount"].to_numpy()))
            * (100 + cents_i64(batch["l_tax"].to_numpy()))
        )
        g = pd.DataFrame({
            "o_orderkey": batch["l_orderkey"].astype("int64").to_numpy(),
            "lines_s6": s6,
        }).groupby("o_orderkey", sort=False)["lines_s6"].sum()
        return g.astype("int64").reset_index()

    line_sums = bucketed_group_apply(
        li.map_batches(li_partial, batch_format="pandas", batch_size=65536),
        ["o_orderkey"],
        lambda b: b.groupby("o_orderkey", sort=False)["lines_s6"].sum()
        .astype("int64").reset_index(),
        n_buckets=n_buckets,
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    ).map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64").to_numpy(),
            "o_orderstatus": b["o_orderstatus"].to_numpy(),
            "header_s6": cents_i64(b["o_totalprice"].to_numpy()) * 10_000,
        }),
        batch_format="pandas", batch_size=65536,
    )

    joined = hash_join(orders, line_sums, on="o_orderkey", how="left",
                       n_buckets=n_buckets)

    def status_fold(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for st, g in bucket.groupby("o_orderstatus", sort=False):
            has = g["lines_s6"].notna().to_numpy()
            gap = np.abs(
                g.loc[has, "header_s6"].astype("int64").to_numpy()
                - g.loc[has, "lines_s6"].astype("int64").to_numpy()
            )
            n_with = int(has.sum())
            sum_abs = int(gap.sum()) if n_with else 0
            mean_usd = (
                float(np.round(sum_abs / n_with / 1_000_000.0, 6))
                if n_with else 0.0
            )
            rows.append((
                st, np.int64(len(g)), np.int64(n_with),
                np.int64(len(g) - n_with),
                np.int64(int((gap <= 1_000_000).sum()) if n_with else 0),
                np.int64(sum_abs), mean_usd,
            ))
        return pd.DataFrame(
            rows,
            columns=["o_orderstatus", "n_orders", "n_with_lines", "n_orphan",
                     "n_within_1usd", "sum_abs_gap_s6", "mean_abs_gap_usd"],
        )

    return bucketed_group_apply(joined, ["o_orderstatus"], status_fold,
                                n_buckets=4)


HEADER_LINE_RECONCILE_SQL = """
WITH l AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
             * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS lines_s6
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderstatus,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * 10000 AS header_s6,
         l.lines_s6
  FROM orders o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN lines_s6 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_lines,
       CAST(SUM(CASE WHEN lines_s6 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan,
       CAST(SUM(CASE WHEN lines_s6 IS NOT NULL
                      AND ABS(header_s6 - lines_s6) <= 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1usd,
       CAST(COALESCE(SUM(CASE WHEN lines_s6 IS NOT NULL
                              THEN ABS(header_s6 - lines_s6) END), 0)
            AS BIGINT) AS sum_abs_gap_s6,
       CASE WHEN SUM(CASE WHEN lines_s6 IS NOT NULL THEN 1 ELSE 0 END) > 0
            THEN ROUND(
              CAST(SUM(CASE WHEN lines_s6 IS NOT NULL
                            THEN ABS(header_s6 - lines_s6) END) AS DOUBLE)
              / CAST(SUM(CASE WHEN lines_s6 IS NOT NULL THEN 1 ELSE 0 END)
                     AS DOUBLE)
              / 1000000.0, 6)
            ELSE 0.0 END AS mean_abs_gap_usd
FROM j GROUP BY o_orderstatus
"""
