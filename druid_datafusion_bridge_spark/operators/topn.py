"""Druid TopN: ranked dimension values by an aggregated metric.

Druid's TopN is its signature query type: each segment computes a local
top-K' (K' = max(1000, K) by default), the broker merges the candidate
lists, and the result is approximate when a value's true total is
spread thinly across many segments. The reference reaches top-k only
through SQL ORDER BY + LIMIT (DELEGATED, SURVEY §2.6 O3); this module
provides both the exact Spark form and a faithful two-phase
approximation for when exact is too expensive.

When to use which, at 100 TB:

- ``topn_exact`` — the default. groupBy + orderBy + limit; Catalyst
  plans partial/final hash aggregation and TakeOrderedAndProject, and
  map-side combine already bounds shuffle volume by the number of
  DISTINCT dimension values per task. Right up to ~10^7 distinct
  values.
- ``topn_approximate`` — Druid's trade, for ultra-high-cardinality
  dimensions (user IDs, URLs): each input partition contributes only
  its local top-``candidates_per_partition`` aggregates to the final
  merge, so the merge input is partitions x K' rows regardless of
  cardinality. Entirely JVM-side (spark_partition_id + partial agg +
  per-partition window cap) — no Python worker in the path. Same error
  model as Druid: a value missing from every partition's local top-K'
  is lost; with additive metrics the true top-1 is always found if it
  is a local top-1 anywhere... increase K' to tighten, as Druid does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topn_exact(
    df: DataFrame, dim: str, metric: Column, k: int, value_name: str = "value"
) -> DataFrame:
    """Exact TopN: full aggregate, then fused top-k (Catalyst rewrites
    orderBy+limit to TakeOrderedAndProject — no global sort)."""
    return (
        df.groupBy(dim)
        .agg(metric.alias(value_name))
        .orderBy(F.col(value_name).desc(), F.col(dim))
        .limit(k)
    )


def topn_approximate(
    df: DataFrame,
    dim: str,
    metric_col: str,
    k: int,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """Two-phase Druid-style TopN over SUM(metric_col), all JVM-side.

    Phase 1: per-(input partition, dim) sums via
    ``groupBy(spark_partition_id(), dim)`` — the map-side partial
    aggregate is already the complete per-partition total because the
    partition id is constant within a task, so the exchange carries one
    row per (partition, dim) pair, pre-aggregated. A per-partition
    window then keeps the local top-K' (row_number <= K'). Phase 2:
    exact merge of <= partitions x K' candidates. Mirrors Druid's
    segment->broker merge (druid TopNQuery semantics; reference reaches
    top-k via SQL only, src/main.rs:191). No Python worker anywhere —
    the whole plan is hash-agg + window + TakeOrderedAndProject inside
    whole-stage codegen."""
    kprime = candidates_per_partition or max(1000, k)
    local = df.groupBy(
        F.spark_partition_id().alias("_pid"), F.col(dim)
    ).agg(F.sum(metric_col).cast("double").alias("_v"))
    cap = Window.partitionBy("_pid").orderBy(F.col("_v").desc(), F.col(dim))
    candidates = (
        local.withColumn("_rn", F.row_number().over(cap))
        .filter(F.col("_rn") <= kprime)
        .drop("_rn", "_pid")
    )
    return (
        candidates.groupBy(dim)
        .agg(F.sum("_v").alias("value"))
        .orderBy(F.col("value").desc(), F.col(dim))
        .limit(k)
    )
