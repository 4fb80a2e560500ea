"""Window functions W1-W4 (SURVEY.md §2.5) — DELEGATED in the reference
(src/main.rs:191), expressed as Spark window specs.

Determinism rules for the oracle gate: ranking windows either order by a
unique key (row_number) or are tie-stable by definition (rank/dense_rank/
percent_rank/cume_dist); running sums aggregate exact decimals.
Scale note: every window here partitions by a key before ordering —
no global (unpartitioned) ORDER BY windows, which would single-task at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from . import query
from .exact import dec


@query(
    "w1_ranking",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag
                              ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn,
           RANK()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
           DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk,
           PERCENT_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS prnk,
           CUME_DIST()  OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
    FROM lineitem
    """,
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", heavy_scan=True)
    w_unique = W.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber", "l_quantity")
    w_qty = W.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.row_number().over(w_unique).cast("long").alias("rn"),
        F.rank().over(w_qty).cast("long").alias("rnk"),
        F.dense_rank().over(w_qty).cast("long").alias("drnk"),
        F.percent_rank().over(w_qty).alias("prnk"),
        F.cume_dist().over(w_qty).alias("cd"),
    )


@query(
    "w2_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@query(
    "w3_agg_over_window",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_qty,
           COUNT(*) OVER (PARTITION BY l_suppkey) AS supp_rows
    FROM lineitem
    """,
)
def w3_agg_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running SUM over an ordered frame + partition-total COUNT (W3).
    l_quantity is integral (w4b relies on the same invariant), so the
    running sum accumulates in a long — exact, order-independent, and
    an unboxed primitive in the window frame's accumulator (a decimal
    sum here promotes past precision 18 and runs on boxed Decimal128,
    measured ~2x slower on the full 600k-row output — round-3 verdict
    perf item). The partition-total count comes from a separate
    map-side-combined aggregate joined back (no hint: AQE broadcasts
    the tiny count table locally and shuffle-joins at scale) rather
    than a second unordered-window pass, which would re-buffer every
    partition's full row stream; measured ~20% faster at sf0.1."""
    li = table(spark, sf_dir, "lineitem")
    w_run = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cnt = li.groupBy("l_suppkey").agg(F.count("*").alias("supp_rows"))
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("bigint")).over(w_run).cast("double").alias("running_qty"),
    ).join(cnt, "l_suppkey")


@query(
    "w4_frame_rows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum3,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt3
    FROM orders
    """,
)
def w4_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS BETWEEN frame (W4); moving 3-row sum/count."""
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("sum3"),
        F.count("*").over(w).alias("cnt3"),
    )


@query(
    "o1_orderby_multi",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    ORDER BY c_nationkey ASC, c_acctbal DESC NULLS LAST, c_custkey
    """,
)
def o1_orderby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with pinned null placement (O1).
    (Order-insensitive hash still verifies content; sort exercised in plan.)"""
    cu = table(spark, sf_dir, "customer")
    return cu.select("c_custkey", "c_nationkey", "c_acctbal").orderBy(
        F.col("c_nationkey").asc(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey"),
    )


@query(
    "o2_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 5
    """,
)
def o2_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(5).limit(20)


@query(
    "o3_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def o3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (Druid TopN analog) — Catalyst fuses to TakeOrderedAndProject:
    per-partition heap + driver merge, no global sort (O3)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@query(
    "o3b_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey, l_linenumber) AS rn
      FROM lineitem) t
    WHERE rn <= 3
    """,
)
def o3b_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the distributed TopN pattern (window + filter;
    Spark pushes a per-partition WindowGroupLimit at scale)."""
    li = table(spark, sf_dir, "lineitem", heavy_scan=True)
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "w4b_frame_range",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
             PARTITION BY l_returnflag ORDER BY l_quantity
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_band_sum,
           COUNT(*) OVER (
             PARTITION BY l_returnflag ORDER BY l_quantity
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS qty_band_cnt
    FROM lineitem
    WHERE l_orderkey <= 3000
    """,
)
def w4b_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN frame (W4, value-based bounds): peers are rows
    whose quantity lies within 5 units below the current row's — frame
    membership depends on ORDER BY *values*, so ties in the ordering
    don't make the result order-sensitive (an exact oracle needs no
    tiebreak column, unlike ROWS frames). Quantities are integral, so
    BIGINT sums are exact."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 3000)
    w = (
        W.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(-5, W.currentRow)
    )
    q = F.col("l_quantity").cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(q).over(w).alias("qty_band_sum"),
        F.count("*").over(w).alias("qty_band_cnt"),
    )


@query(
    "w5_distribution_fns",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM orders
    WHERE o_orderkey <= 2000
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def w5_distribution_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (W1's statistical siblings):
    ntile/percent_rank/cume_dist per status partition. The o_orderkey
    tiebreak makes every rank deterministic; percent_rank/cume_dist
    are exact rational arithmetic on row positions, identical across
    engines."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "w2b_ignore_nulls",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CASE WHEN o_orderstatus = 'O' THEN NULL
                  ELSE o_totalprice END AS settled_price
      FROM orders)
    SELECT o_custkey, o_orderkey, settled_price,
           LAST_VALUE(settled_price IGNORE NULLS) OVER w AS last_settled,
           FIRST_VALUE(settled_price IGNORE NULLS) OVER w2 AS first_settled
    FROM o
    WINDOW
      w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w2b_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS navigation (W2 family): carry the last settled
    price forward past open (NULL) orders — the gap-filling
    last-observation-carried-forward idiom — plus the partition's first
    settled value. O(1) frame state; same shuffle profile as any
    per-customer window."""
    orders = table(spark, sf_dir, "orders")
    settled = F.when(F.col("o_orderstatus") == "O", None).otherwise(
        F.col("o_totalprice")
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w2 = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        settled.alias("settled_price"),
        F.last(settled, ignorenulls=True).over(w).alias("last_settled"),
        F.first(settled, ignorenulls=True).over(w2).alias("first_settled"),
    )


@query(
    "w4c_time_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS trailing_7d_total,
           COUNT(*) OVER w AS trailing_7d_orders
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate
      RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    """,
)
def w4c_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame (W4 family): each order's trailing-7-day
    order total and count for its customer — the time-decayed feature
    window every event-driven feature store computes. RANGE over an
    INTERVAL bound means same-date peers aggregate together and the
    frame is defined by time distance, not row position (ROWS frames
    cannot express this). Money through the decimal pattern; the frame
    state is bounded by the 7-day span per key."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr(
            """
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate
              RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
            AS DOUBLE)
            """
        ).alias("trailing_7d_total"),
        F.expr(
            """
            COUNT(*) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate
              RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
            """
        ).alias("trailing_7d_orders"),
    )
