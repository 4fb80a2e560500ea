"""Scalar function families (SURVEY.md §2.8) — string / date / math /
conditional / cast, all DELEGATED in the reference (src/main.rs:191).
The one NATIVE scalar in the reference is epoch-millis -> civil datetime
formatting for CLI display (src/main.rs:197-230) — covered here by
date_format in f_date_functions.

Oracle-exactness notes: libm functions (exp/log/pow) can differ by 1 ulp
across engines, so transcendental outputs are rounded to 9 significant
decimals; sqrt and arithmetic are IEEE-exact and left unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query


@query(
    "f_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           trim(c_name) AS tname,
           substr(c_name, 1, 8) AS prefix8,
           c_name || '::' || c_mktsegment AS joined,
           replace(c_name, '#', '-') AS repl,
           length(c_name) AS name_len,
           CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END AS is_cust,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           array_to_string(str_split(c_name, '#'), '|') AS parts,
           reverse(c_mktsegment) AS rseg,
           lpad(c_mktsegment, 12, '_') AS padded
    FROM customer
    """,
)
def f_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.trim("c_name").alias("tname"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.concat(F.col("c_name"), F.lit("::"), F.col("c_mktsegment")).alias("joined"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.length("c_name").cast("long").alias("name_len"),
        F.when(F.col("c_name").like("Customer%"), 1).otherwise(0).alias("is_cust"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        # serialized: array outputs crash the driver's pandas canonicalizer
        F.array_join(F.split("c_name", "#"), "|").alias("parts"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.lpad("c_mktsegment", 12, "_").alias("padded"),
    )


@query(
    "f_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           dayofweek(o_orderdate) AS dow,
           extract(quarter FROM o_orderdate) AS q,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95
    FROM orders
    """,
)
def f_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family; includes the reference's native epoch->civil
    formatting (src/main.rs:197-230) as date_format."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1.
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        # surfaced as midnight TIMESTAMP: pandas keeps DATE as python
        # objects on the Spark side but datetime64 on the DuckDB side —
        # the driver's value-hash would differ (round-2 harness finding)
        F.col("o_orderdate").cast("date").cast("timestamp").alias("order_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )


@query(
    "f_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS abs_dev,
           CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_disc,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           sqrt(l_quantity) AS sqrt_qty,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS dev_sign,
           round(ln(l_extendedprice) * 1e9) / 1e9 AS ln_price,
           round(exp(l_discount) * 1e9) / 1e9 AS exp_disc,
           greatest(l_quantity, 10.0) AS qty_floor10,
           least(l_quantity, 40.0) AS qty_cap40
    FROM lineitem
    """,
)
def f_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("abs_dev"),
        F.ceil(F.col("l_discount") * 100).alias("ceil_disc"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_quantity") - 25).alias("dev_sign"),
        (F.round(F.log(F.col("l_extendedprice")) * 1e9) / 1e9).alias("ln_price"),
        (F.round(F.exp("l_discount") * 1e9) / 1e9).alias("exp_disc"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qty_floor10"),
        F.least(F.col("l_quantity"), F.lit(40.0)).alias("qty_cap40"),
    )


@query(
    "f_conditional_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice
                ELSE 0.0 END AS urgent_price,
           nullif(o_orderstatus, o_orderstatus) AS always_null
    FROM orders
    """,
)
def f_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
        .otherwise(F.lit(0.0))
        .alias("urgent_price"),
        F.nullif(F.col("o_orderstatus"), F.col("o_orderstatus")).alias("always_null"),
    )


@query(
    "f_cast_functions",
    oracle="""
    SELECT p_partkey,
           CAST(p_partkey AS VARCHAR) AS key_str,
           CAST(CAST(p_partkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(p_size AS BIGINT) AS size_long,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor_int,
           TRY_CAST(p_name AS BIGINT) AS name_as_int,
           CAST(CAST('2024-06-01' AS DATE) AS TIMESTAMP) AS const_date,
           CAST('2024-06-01 12:30:00' AS TIMESTAMP) AS const_ts
    FROM part
    """,
)
def f_cast_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST/TRY_CAST family. double->int goes through floor() because
    Spark truncates while DuckDB rounds — floor pins one semantic."""
    pa = table(spark, sf_dir, "part")
    return pa.select(
        "p_partkey",
        F.col("p_partkey").cast("string").alias("key_str"),
        F.col("p_partkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("p_size").cast("long").alias("size_long"),
        # decimal surfaced as double (scale-2 value, exact in both engines):
        # raw decimal output hashes as object vs float64 in the harness
        F.col("p_retailprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.floor(F.col("p_retailprice")).cast("long").alias("price_floor_int"),
        F.col("p_name").try_cast("long").alias("name_as_int"),
        F.lit("2024-06-01").cast("date").cast("timestamp").alias("const_date"),
        F.lit("2024-06-01 12:30:00").cast("timestamp").alias("const_ts"),
    )


@query(
    "f_json_functions",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def f_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events props column (§2.8 json
    family): get_json_object -> typed aggregation."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "f_bitwise_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS b_and,
           l_orderkey | 15 AS b_or,
           xor(l_orderkey, l_linenumber) AS b_xor,
           l_orderkey << 2 AS b_shl,
           l_orderkey >> 3 AS b_shr,
           CAST(bit_count(l_orderkey) AS INT) AS b_popcount,
           ~l_orderkey AS b_not
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)
def f_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (Druid BITWISE_* analogs): and/or/xor/shifts/
    popcount/complement over integer keys — all whole-stage-codegen
    built-ins on both engines."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_orderkey & 255").alias("b_and"),
        F.expr("l_orderkey | 15").alias("b_or"),
        F.expr("l_orderkey ^ l_linenumber").alias("b_xor"),
        F.expr("shiftleft(l_orderkey, 2)").alias("b_shl"),
        F.expr("shiftright(l_orderkey, 3)").alias("b_shr"),
        F.bit_count(F.col("l_orderkey")).alias("b_popcount"),
        F.expr("~l_orderkey").alias("b_not"),
    )
