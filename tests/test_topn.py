"""Tests for the Druid-style TopN operator (operators/topn.py):
exactness below the candidate bound, heavy-hitter recall under skew
with a deliberately tiny bound, and null-dimension handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from druid_datafusion_bridge_spark.operators.topn import (
    topn_approximate,
    topn_exact,
)


def _rows(df):
    return [(r[0], r[1]) for r in df.collect()]


def test_two_phase_equals_exact_below_candidate_bound(spark):
    """Cardinality (50 keys) < K' (1000) => provably exact."""
    df = spark.range(20_000).select(
        (F.col("id") % 50).alias("k"), (F.col("id") % 7).cast("double").alias("v")
    ).repartition(8)
    exact = _rows(topn_exact(df, "k", F.sum("v"), 10))
    approx = _rows(topn_approximate(df, "k", "v", 10))
    assert exact == approx


def test_heavy_hitters_survive_tiny_candidate_bound(spark):
    """Zipf-ish skew: the true top-3 must be found even when each
    partition forwards only 5 candidates from 1000 distinct keys."""
    df = spark.range(100_000).select(
        F.when(F.col("id") % 4 == 0, F.lit(100001))    # ~25k rows
        .when(F.col("id") % 8 == 1, F.lit(100002))     # ~12.5k rows
        .when(F.col("id") % 16 == 2, F.lit(100003))    # ~6.25k rows
        .otherwise(F.col("id") % 1000)                 # tail: ~56 rows/key
        .alias("k"),
        F.lit(1.0).alias("v"),
    ).repartition(16)
    exact_top3 = {r[0] for r in _rows(topn_exact(df, "k", F.sum("v"), 3))}
    approx_top3 = {
        r[0]
        for r in _rows(
            topn_approximate(df, "k", "v", 3, candidates_per_partition=5)
        )
    }
    assert exact_top3 == approx_top3


def test_null_dimension_value_is_one_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), (None, 3.0), ("b", 1.0)], "k string, v double"
    ).repartition(4)
    rows = _rows(topn_approximate(df, "k", "v", 3))
    assert (None, 5.0) in rows
    assert rows[0] == (None, 5.0)  # nulls aggregated once, ranked first
