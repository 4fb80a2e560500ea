"""Data-quality profiling operators (training-pipeline extension).

Kept in their own module (loaded late in the registry rotation) so the
driver's first-50 sample positions for the r4 front-loaded modules stay
stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query


@query(
    "prof_column_stats",
    oracle="""
    SELECT * FROM (
      SELECT 'l_orderkey' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS null_count,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
             CAST(MIN(l_orderkey) AS VARCHAR) AS min_value,
             CAST(MAX(l_orderkey) AS VARCHAR) AS max_value
      FROM lineitem
      UNION ALL
      SELECT 'l_suppkey', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(l_suppkey) AS BIGINT),
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
             CAST(MIN(l_suppkey) AS VARCHAR), CAST(MAX(l_suppkey) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
             CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
             MIN(l_returnflag), MAX(l_returnflag)
      FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(l_linestatus) AS BIGINT),
             CAST(COUNT(DISTINCT l_linestatus) AS BIGINT),
             MIN(l_linestatus), MAX(l_linestatus)
      FROM lineitem)
    ORDER BY column_name
    """,
)
def prof_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler (the data-quality pass every
    large-scale ingest pipeline runs before training): per column —
    row count, null count, exact distinct count, min, max — one row
    per profiled column.

    ONE scan, ONE aggregate: all per-column statistics are expressions
    of the same Aggregate node, then the 1-row wide result is pivoted
    to long form with explode over literal structs (driver-side-free).
    The multi-column exact COUNT(DISTINCT) makes Catalyst plan an
    Expand (input rows x n_profiled_columns before the exchange) —
    the standard single-pass trade; at 100 TB swap the exact distinct
    for approx_count_distinct and the Expand disappears (kept exact
    here for the bit-exact oracle). min/max serialize to strings so
    heterogeneous column types share one output schema; only integer
    and varchar columns are profiled so Spark and DuckDB render
    identical text."""
    import os

    li = table(spark, sf_dir, "lineitem", heavy_scan=True)
    cols = ["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"]
    if os.environ.get("SPARK_GRAFT_OPT_PROF", "1") == "0":
        # pre-r13 single Aggregate, kept for A/B: the multi-column
        # COUNT(DISTINCT) plans an Expand — every scan row duplicated
        # once per profiled column before the exchange
        aggs = [F.count("*").alias("n_rows")]
        for c in cols:
            aggs += [
                (F.count("*") - F.count(c)).alias(f"nulls_{c}"),
                F.count_distinct(F.col(c)).alias(f"nd_{c}"),
                F.min(c).cast("string").alias(f"min_{c}"),
                F.max(c).cast("string").alias(f"max_{c}"),
            ]
        wide = li.agg(*aggs)
    else:
        # r13 (a9's rewrite generalized): the non-distinct statistics
        # stay one Expand-free Aggregate; each exact distinct count is
        # its OWN dedup-then-count aggregation (partial aggregation
        # folds duplicates map-side, the exchange carries distinct
        # values only) and the four 1-row results attach by broadcast
        # cross join. Counts identical: COUNT(c) over DISTINCT c rows
        # == COUNT(DISTINCT c) (the NULL row survives dedup but COUNT
        # skips it). Same scan count in wall-clock terms — the five
        # aggregate subtrees are independent stages over the same
        # mirror scan and schedule concurrently.
        aggs = [F.count("*").alias("n_rows")]
        for c in cols:
            aggs += [
                (F.count("*") - F.count(c)).alias(f"nulls_{c}"),
                F.min(c).cast("string").alias(f"min_{c}"),
                F.max(c).cast("string").alias(f"max_{c}"),
            ]
        wide = li.agg(*aggs)
        for c in cols:
            nd = li.select(c).distinct().agg(
                F.count(c).alias(f"nd_{c}")
            )
            wide = wide.crossJoin(F.broadcast(nd))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                F.col(f"nulls_{c}").alias("null_count"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"min_{c}").alias("min_value"),
                F.col(f"max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(rows).alias("s"))
        .select("s.*")
        .orderBy("column_name")
    )


@query(
    "prof_column_stats_approx",
    oracle="""
    SELECT * FROM (
      SELECT 'l_orderkey' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS null_count,
             TRUE AS approx_within_rsd,
             CAST(MIN(l_orderkey) AS VARCHAR) AS min_value,
             CAST(MAX(l_orderkey) AS VARCHAR) AS max_value
      FROM lineitem
      UNION ALL
      SELECT 'l_suppkey', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(l_suppkey) AS BIGINT),
             TRUE, CAST(MIN(l_suppkey) AS VARCHAR),
             CAST(MAX(l_suppkey) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
             TRUE, MIN(l_returnflag), MAX(l_returnflag)
      FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(l_linestatus) AS BIGINT),
             TRUE, MIN(l_linestatus), MAX(l_linestatus)
      FROM lineitem)
    ORDER BY column_name
    """,
)
def prof_column_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profiler: prof_column_stats with HLL approx distinct
    counts — the profile aggregate compiles WITHOUT Expand (input rows
    cross the exchange once, not once per profiled column; plan-pinned
    on the bare operator in tests/test_plans.py). Deterministic columns
    (counts/nulls/min/max) are exactly oracled; the approximate
    distinct count is checked through its error CONTRACT — the HLL
    estimate (rsd=0.02) must land within 3*rsd of the exact count,
    emitted as a flag DuckDB asserts as literal TRUE. The exact counts
    feeding the flag are verification scaffolding a production run
    drops (that branch is where the Expand lives)."""
    from ..operators.profiling import approx_column_profile

    li = table(spark, sf_dir, "lineitem", heavy_scan=True)
    cols = ["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"]
    prof = approx_column_profile(li, cols, rsd=0.02)
    exact = li.agg(*[F.countDistinct(c).alias(c) for c in cols])
    exact_long = exact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).alias("nd_exact"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    flag = (
        F.abs(F.col("nd_approx") - F.col("nd_exact")) / F.col("nd_exact")
        <= 0.06
    )
    return (
        prof.join(F.broadcast(exact_long), "column_name")
        .select(
            "column_name",
            "n_rows",
            "null_count",
            flag.alias("approx_within_rsd"),
            "min_value",
            "max_value",
        )
        .orderBy("column_name")
    )
