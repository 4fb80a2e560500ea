"""Druid native query types TopN and Search as registry queries.

With these, every Druid native query type has an analog here:
timeseries (a12_time_bucket / dm_rollup_*), groupBy (a3 et al.), scan
(p2/p3/s7), timeBoundary (dm_time_boundary), search (dm_search_dims),
topN (tn_*). The reference exposes none of them natively — its users
get SQL only (src/main.rs:186-195) — so these are the Druid-parity
surface the reference's README aspires to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.topn import topn_approximate, topn_exact
from . import query


@query(
    "tn_topn_exact",
    oracle="""
    SELECT l_suppkey, CAST(SUM(l_quantity) AS DOUBLE) AS value
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY value DESC, l_suppkey
    LIMIT 10
    """,
)
def tn_topn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid TopN, exact form: top suppliers by shipped quantity.
    Catalyst plans partial/final agg + TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    return topn_exact(li, "l_suppkey", F.sum("l_quantity").cast("double"), 10)


@query(
    "tn_topn_two_phase",
    oracle="""
    SELECT l_suppkey, CAST(SUM(l_quantity) AS DOUBLE) AS value
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY value DESC, l_suppkey
    LIMIT 10
    """,
)
def tn_topn_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid TopN, two-phase form (bounded per-partition candidates).
    On this data the dimension cardinality (100 suppliers) is below the
    default K'=1000, so the result is provably exact and shares the
    exact oracle; at ultra-high cardinality the same code is Druid's
    approximation. The summed metric is integral, so double partial
    sums are exact in any order."""
    li = table(spark, sf_dir, "lineitem")
    return topn_approximate(li, "l_suppkey", "l_quantity", 10)


@query(
    "dm_search_dims",
    oracle="""
    SELECT dimension, value, n FROM (
      SELECT 'p_brand' AS dimension, p_brand AS value, COUNT(*) AS n
      FROM part WHERE contains(lower(p_brand), '1') GROUP BY p_brand
      UNION ALL
      SELECT 'p_type', p_type, COUNT(*) FROM part
      WHERE contains(lower(p_type), '1') GROUP BY p_type
      UNION ALL
      SELECT 'p_name', p_name, COUNT(*) FROM part
      WHERE contains(lower(p_name), '1') GROUP BY p_name)
    ORDER BY dimension, value
    """,
)
def dm_search_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid `search` native query: case-insensitive substring match
    across several string dimensions, returning (dimension, value,
    count). One scan feeds all dimensions via an explode of
    (name, value) structs — not one scan per dimension."""
    part = table(spark, sf_dir, "part")
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("dimension"), F.col(d).alias("value"))
            for d in ["p_brand", "p_type", "p_name"]
        ]
    )
    return (
        part.select(F.explode(pairs).alias("dv"))
        .select("dv.dimension", "dv.value")
        .filter(F.lower(F.col("value")).contains("1"))
        .groupBy("dimension", "value")
        .agg(F.count("*").alias("n"))
        .orderBy("dimension", "value")
    )
