"""Headline analytical queries (flagship + TPC-H-style) — SURVEY.md §7A.

The flagship is the reference's `cmd_query` analog (src/main.rs:186-195):
a Druid-style time-bucketed filtered rollup over a join, exercising scan,
filter, projection, broadcast join, multi-agg groupBy, order-by and limit
in one Catalyst plan.

Scale notes (100 TB posture):
- broadcast hints only on BOUNDED relations (region/nation: fixed 5/25
  rows). Linearly-scaling tables (orders, customer, part, supplier) carry
  NO hint: AQE's size-based planning broadcasts them while they fit under
  autoBroadcastJoinThreshold (they do at bench scale) and falls back to
  shuffle join at 100 TB where a forced hint would OOM executors;
- aggregates are partial+final two-phase hash aggregates (map-side combine)
  by construction — groupBy on the already-filtered scan;
- all filters sit directly on scan columns => parquet row-group pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query
from .exact import (
    RATE_DEC2,
    REVENUE_SQL,
    dec,
    disc_price_narrow,
    exact_avg,
    exact_sum,
    money,
    revenue_col,
    sql_avg,
    sql_sum,
)

# Exact decimal operand for rates in [0,2): products stay within decimal(38,_).
RATE_DEC = "decimal(8,4)"


@query(
    "flagship_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           o_orderpriority,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_customers,
           {sql_sum('l_quantity', 'sum_qty')},
           {REVENUE_SQL} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2
    ORDER BY ship_month, o_orderpriority
    """,
)
def flagship_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed filtered rollup over a join — the Druid signature
    query shape (granularity rollup, SURVEY §2.4 A12) on TPC-H tables."""
    li = table(spark, sf_dir, "lineitem", heavy_scan=True)
    orders = table(spark, sf_dir, "orders")
    joined = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).join(
        orders.select("o_orderkey", "o_custkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "inner",
    )
    # COUNT(DISTINCT x) alongside other aggs makes Spark plan an Expand
    # (every input row doubled before the shuffle). The two-level form —
    # partial-aggregate per (bucket, dim, custkey), then roll customers
    # up with COUNT — shuffles only the distinct combinations and
    # measures ~25% faster at sf0.1; identical results (decimal sums
    # are exact, so sum-of-sums == sum).
    prod = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,4)") - dec("l_discount")
    )
    lvl1 = joined.groupBy(
        F.date_trunc("month", "l_shipdate").alias("ship_month"),
        "o_orderpriority",
        "o_custkey",
    ).agg(
        F.count("*").alias("_c"),
        F.sum(F.col("l_quantity").cast("decimal(38,4)")).alias("_q"),
        F.sum(prod).alias("_r"),
    )
    return (
        lvl1.groupBy("ship_month", "o_orderpriority")
        .agg(
            F.sum("_c").alias("n_rows"),
            F.count("o_custkey").alias("n_customers"),
            F.sum("_q").cast("double").alias("sum_qty"),
            money(F.sum("_r").cast("decimal(38,8)"), "revenue"),
        )
        .orderBy("ship_month", "o_orderpriority")
    )


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_sum('l_quantity', 'sum_qty')},
           {sql_sum('l_extendedprice', 'sum_base_price')},
           CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
                AS DECIMAL(38,8)), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) *
                    (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4))))
                AS DECIMAL(38,12)), 2) AS DOUBLE) AS sum_charge,
           {sql_avg('l_quantity', 'avg_qty')},
           {sql_avg('l_extendedprice', 'avg_price')},
           {sql_avg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical wide-aggregate scan (A2/A3 reference
    delegation, src/main.rs:191). Exact decimal arithmetic — the
    products use the NARROW operands from exact.py (price(9,2) x
    rate(3,2) -> (13,4) -> x rate(3,2) -> (17,6)), which stay on
    Spark's long-backed decimal fast path (precision <= 18); the money
    columns are exactly 2-decimal so the narrow casts lose nothing and
    the values are bit-identical to the oracle's wider-operand SQL."""
    li = table(spark, sf_dir, "lineitem", heavy_scan=True)
    one = F.lit(1).cast(RATE_DEC2)
    disc_price = disc_price_narrow()
    charge = disc_price * (one + F.col("l_tax").cast(RATE_DEC2))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            money(F.sum(disc_price).cast("decimal(38,8)"), "sum_disc_price"),
            money(F.sum(charge).cast("decimal(38,12)"), "sum_charge"),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {REVENUE_SQL} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1996-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filter, grouped revenue, top-k.
    Dim sides broadcast; top-k compiles to TakeOrderedAndProject."""
    cu = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-01").cast("timestamp")
    )
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cu.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue_col("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {REVENUE_SQL} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. Bounded dims (nation/region)
    broadcast by hint; orders/customer/supplier are left to AQE — at
    100 TB lineitem x orders shuffle-joins (co-partitioned on orderkey)
    while the sub-threshold sides still broadcast."""
    cu = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            su.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(na.select("n_nationkey", "n_regionkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(revenue_col("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(38,8)), 2)
                AS DOUBLE) AS promo_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filtered scan-aggregate; all predicates push to
    parquet (row-group pruning at scale)."""
    li = table(spark, sf_dir, "lineitem", heavy_scan=True)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money(
                F.sum(
                    dec("l_extendedprice") * F.col("l_discount").cast(RATE_DEC)
                ).cast("decimal(38,8)"),
                "promo_revenue",
            )
        )
    )
