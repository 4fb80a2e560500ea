"""Scan / projection / filter operators (SURVEY.md §2.1, §2.2).

Reference parity:
- S1/S4 projected scan: reference decodes only requested columns
  (src/datafusion_ext/execution_plan.rs:95-110). Spark: ``df.select`` —
  Catalyst ColumnPruning pushes the projection into the parquet reader
  (visible as ReadSchema in .explain).
- P3 filters: the reference ignores pushed filters and evaluates a
  FilterExec above the scan (src/datafusion_ext/table_provider.rs:64);
  Spark pushes them into the scan (PushedFilters), strictly better.
- S7 dump-with-limit: reference slices the batch (src/main.rs:158-163);
  Spark: orderBy + limit -> TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query
from .exact import MUL_DEC, dec, exact_sum, sql_sum


@query(
    "s1_scan_project",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def s1_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected+filtered scan; both projection and predicate reach the
    parquet reader (check: PushedFilters + ReadSchema in explain)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")).select(
        "l_orderkey", "l_extendedprice"
    )


@query(
    "s7_dump_limit",
    oracle="""
    SELECT * FROM lineitem ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber,
      l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      l_shipdate LIMIT 10
    """,
)
def s7_dump_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLI `dump` analog: full-width rows, deterministic order, limit."""
    li = table(spark, sf_dir, "lineitem")
    return li.orderBy(*li.columns).limit(10)


@query(
    "p2_projection_expr",
    oracle=f"""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
           AS DOUBLE) AS net_price,
      l_returnflag || '|' || l_linestatus AS flag_status,
      l_quantity * 2 AS double_qty
    FROM lineitem
    """,
)
def p2_projection_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns / aliases (reference: DELEGATED via SQL,
    src/main.rs:191)."""
    li = table(spark, sf_dir, "lineitem")
    net = (dec("l_extendedprice") * (F.lit(1).cast(MUL_DEC) - dec("l_discount"))).cast(
        "double"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        F.concat_ws("|", "l_returnflag", "l_linestatus").alias("flag_status"),
        (F.col("l_quantity") * 2).alias("double_qty"),
    )


@query(
    "p3_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'N')
      AND l_quantity BETWEEN 10 AND 20
      AND NOT (l_linestatus = 'F' AND l_discount > 0.05)
    """,
)
def p3_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / boolean composition predicates (P3)."""
    li = table(spark, sf_dir, "lineitem")
    cond = (
        F.col("l_returnflag").isin("A", "N")
        & F.col("l_quantity").between(10, 20)
        & ~((F.col("l_linestatus") == "F") & (F.col("l_discount") > 0.05))
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "p3b_filter_like_null",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_name LIKE '%1%'
      AND c_mktsegment IS NOT NULL
      AND regexp_matches(c_name, '[0-9]$')
    """,
)
def p3b_filter_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IS NULL / regexp predicates (P3)."""
    cu = table(spark, sf_dir, "customer")
    return cu.filter(
        F.col("c_name").like("%1%")
        & F.col("c_mktsegment").isNotNull()
        & F.col("c_name").rlike("[0-9]$")
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "p4_time_filter",
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           COUNT(*) AS n_rows,
           {sql_sum('l_quantity', 'sum_qty')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def p4_time_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval predicate on the time column — the Druid segment
    interval-pruning analog (reference parses the interval at
    src/segment/metadata.rs:59-67 but never prunes; Spark prunes via
    parquet min/max stats + partition pruning when time-partitioned)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(F.count("*").alias("n_rows"), exact_sum("l_quantity", "sum_qty"))
    )


@query(
    "p5_hash_sample",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                 CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT) % 10 = 0
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def p5_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% hash sample (md5 of the row key). THE sampling
    primitive for reproducible pipeline runs at scale: engine- and
    run-independent, no RNG state, pushes down like any filter."""
    li = table(spark, sf_dir, "lineitem")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % 10
    )
    return (
        li.filter(bucket == 0)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(38,4)")).cast("double").alias(
                "sum_qty"
            ),
        )
        .orderBy("l_returnflag")
    )
