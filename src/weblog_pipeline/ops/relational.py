"""Relational analytics over the warehouse tables (orders / lineitem /
customer) — the classic star-schema side of the engine, here to prove
the join machinery a log pipeline's enrichment stages depend on:

* pricing_rollup — the TPC-H Q1 shape: one map-side-combined aggregate
  over the fact table, a handful of output groups. The canonical
  "does partial aggregation actually absorb the scan" benchmark.
* shipping_topk — the TPC-H Q3 shape: a BROADCAST dimension filter
  (customer segment), a key-partitioned fact-fact join
  (orders ⋈ lineitem on orderkey), and a bounded top-k. The canonical
  "did the planner pick broadcast for the dim and shuffle for the
  fact" benchmark.

Money stays engine-exact the repo's way: every per-row float expression
is floored ONCE to integer cents — floor(price * (1-disc) * 100) is the
same IEEE double product in any engine, and integer sums are
order-free — so the aggregates hash-match bit-for-bit. Date pivots
derive from the data (epoch-day midpoint via a broadcast one-row
aggregate), never from a wall clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DAY = "CAST(unix_timestamp(date_trunc('day', {c})) AS BIGINT) DIV 86400"


def _day(col: str):
    return F.expr(_DAY.format(c=col))


def pricing_rollup(lineitem: DataFrame, ship_lag_days: int = 7) -> DataFrame:
    """Pricing summary per (returnflag, linestatus) over lineitems
    shipped up to `ship_lag_days` before the newest shipment (the Q1
    'as of' cut, derived from the data). Quantities and money are
    per-row floored cents; averages are integer DIV in cents/bp.

    Output: l_returnflag, l_linestatus, n_rows, sum_qty_c, sum_base_c,
    sum_disc_c, sum_charge_c, avg_qty_c, avg_price_c, avg_disc_bp.
    """
    dmax = lineitem.agg(F.max(_day("l_shipdate")).alias("_dmax"))
    rows = (
        lineitem.crossJoin(F.broadcast(dmax))
        .where(_day("l_shipdate") <= F.col("_dmax") - ship_lag_days)
        .select(
            "l_returnflag",
            "l_linestatus",
            F.floor(F.col("l_quantity") * 100).cast("long").alias("q_c"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("base_c"),
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            )
            .cast("long")
            .alias("disc_c"),
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            )
            .cast("long")
            .alias("charge_c"),
            F.floor(F.col("l_discount") * 10000).cast("long").alias(
                "disc_bp"
            ),
        )
    )
    agg = rows.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("q_c").alias("sum_qty_c"),
        F.sum("base_c").alias("sum_base_c"),
        F.sum("disc_c").alias("sum_disc_c"),
        F.sum("charge_c").alias("sum_charge_c"),
        F.sum("disc_bp").alias("_disc_bp"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        "sum_qty_c",
        "sum_base_c",
        "sum_disc_c",
        "sum_charge_c",
        F.expr("sum_qty_c DIV n_rows").alias("avg_qty_c"),
        F.expr("sum_base_c DIV n_rows").alias("avg_price_c"),
        F.expr("_disc_bp DIV n_rows").alias("avg_disc_bp"),
    )


def shipping_topk(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    k: int = 10,
) -> DataFrame:
    """Unshipped-revenue top-k (the Q3 shape): orders placed before the
    data's epoch-day midpoint by customers in `segment`, revenue from
    lineitems shipped after it. customer is explicitly broadcast (a
    dimension never shuffles the fact); orders ⋈ lineitem shuffles once
    on orderkey; the final top-k is TakeOrderedAndProject.

    Output: l_orderkey, order_day, revenue_c (floored cents).
    """
    pivot = orders.agg(
        (
            (F.min(_day("o_orderdate")) + F.max(_day("o_orderdate")))
            / 2
        )
        .cast("long")
        .alias("_mid")
    )
    cust = customer.where(F.col("c_mktsegment") == segment).select(
        "c_custkey"
    )
    o = (
        orders.crossJoin(F.broadcast(pivot))
        .where(_day("o_orderdate") < F.col("_mid"))
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "o_orderkey", _day("o_orderdate").alias("order_day"), "_mid"
        )
    )
    li = lineitem.select(
        "l_orderkey",
        _day("l_shipdate").alias("_sday"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("rev_c"),
    )
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"]).where(
        F.col("_sday") > F.col("_mid")
    )
    rev = joined.groupBy("l_orderkey", "order_day").agg(
        F.sum("rev_c").alias("revenue_c")
    )
    order = [F.col("revenue_c").desc(), F.col("l_orderkey").asc()]
    return (
        rev.orderBy(*order)
        .limit(k)
        .select("l_orderkey", "order_day", "revenue_c")
    )


def segment_activity(
    events: DataFrame, customer: DataFrame
) -> DataFrame:
    """Event-stream enrichment against the customer dimension — the
    bread-and-butter fact ⋈ dim rollup ("activity by market segment")
    every log pipeline runs before a dashboard: events join customer on
    user key, aggregate per (segment, event_type).

    The dimension is explicitly broadcast: a 10^9-row event fact never
    shuffles for a dimension lookup — the join lives in the scan stage
    and the only exchange is the final small-group aggregate (itself
    map-side combined). Money is per-row floored cents (the
    pricing_rollup rule).

    Output: c_mktsegment, event_type, n_events, n_users, sum_value_c.
    """
    dim = customer.select("c_custkey", "c_mktsegment")
    joined = events.join(
        F.broadcast(dim), events["user_id"] == dim["c_custkey"]
    )
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.floor(F.col("value") * 100).cast("long")
        ).alias("sum_value_c"),
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Revenue by region/nation through the full dimension chain — the
    Q5-shape five-table star join: region -> nation -> customer fold
    into ONE broadcast lookup (dims join dims BEFORE touching any
    fact), orders picks up the region label broadcast-side, and the
    only real shuffle in the plan is orders ⋈ lineitem on orderkey.
    Joining dims first is the difference between one fact shuffle and
    three at 100 TB.

    Money is per-row floored cents (the pricing_rollup rule).

    Output: r_name, n_name, n_orders, revenue_c.
    """
    dim = (
        customer.join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == region["r_regionkey"],
        )
        .select("c_custkey", "n_name", "r_name")
    )
    o = orders.join(
        F.broadcast(dim), orders["o_custkey"] == dim["c_custkey"]
    ).select("o_orderkey", "n_name", "r_name")
    li = lineitem.select(
        "l_orderkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("rev_c"),
    )
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    return joined.groupBy("r_name", "n_name").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.sum("rev_c").alias("revenue_c"),
    )
