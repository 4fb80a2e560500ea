"""Druid query-time LOOKUP queries (capability extension).

The reference's SQL surface is DataFusion-delegated and has no lookup
registration, but LOOKUP is core day-to-day Druid SQL; these entries
give the Spark rebuild the same surface with Druid's exact semantics
(NULL for unmapped keys / retainMissingValue; ReverseLookupRule filter
rewrite into the segment bitmap index). See operators/lookup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from .exact import exact_sum
from ..operators.lookup import apply_lookup, reverse_lookup_keys


@query(
    "lk_lookup_enrich",
    oracle="""
    SELECT m.n_name AS nation_name,
           COALESCE(m.n_name, CAST(c.c_nationkey AS VARCHAR)) AS retained,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS acctbal_sum
    FROM customer c
    LEFT JOIN (
      SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name
      FROM nation WHERE n_regionkey < 2
    ) m ON CAST(c.c_nationkey AS VARCHAR) = m.k
    GROUP BY nation_name, retained
    ORDER BY retained
    """,
)
def lk_lookup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOOKUP(dim, 'nation_names') with a PARTIAL map (only regions 0-1
    are loaded), so both Druid missing-key behaviors show in one result:
    the default NULL column and the retainMissingValue column that
    falls back to the key. The lookup broadcasts (<=25 rows); the
    customer side never shuffles for the join."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    mapping = (
        nation.filter(F.col("n_regionkey") < 2)
        .select(
            F.col("n_nationkey").cast("string").alias("k"),
            F.col("n_name").alias("v"),
        )
    )
    fact = customer.select(
        F.col("c_nationkey").cast("string").alias("nation_key"),
        "c_acctbal",
    )
    enriched = apply_lookup(fact, "nation_key", mapping, "nation_name")
    enriched = apply_lookup(
        enriched, "nation_key", mapping, "retained", retain_missing=True
    )
    return (
        enriched.groupBy("nation_name", "retained")
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum("c_acctbal", "acctbal_sum"),
        )
        .orderBy("retained")
    )


@query(
    "lk_reverse_lookup_filter",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n.n_nationkey) AS BIGINT) AS sum_key
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'AMERICA')
    """,
)
def lk_reverse_lookup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's ReverseLookupRule end-to-end: LOOKUP(n_name) IN ('ASIA',
    'AMERICA') rewrites to n_name IN (inverse image) — 10 names pulled
    from the heap-resident lookup — and THAT IN-list is answered by the
    segment DataSource's inverted-index bitmap union (the s1f path)
    before any value column decodes. Filter on a mapped value, pay
    index cost only."""
    import json as _json

    from .druid_source import _ensure_segments

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    # the lookup: nation name -> region name (25 heap-resident entries)
    mapping = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_name").alias("k"), F.col("r_name").alias("v"))
    keys = reverse_lookup_keys(mapping, ["ASIA", "AMERICA"])

    root = _ensure_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("dim_eq", _json.dumps({"n_name": keys}))
        .load()
    )
    return df.filter(F.col("n_name").isin(keys)).agg(
        F.count("*").alias("n"),
        F.sum("n_nationkey").alias("sum_key"),
    )
