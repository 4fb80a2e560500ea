"""Column-profiling operators (training-pipeline extension).

The exact profiler lives in queries/profiling.py (multi-column exact
COUNT(DISTINCT) — correct, but Catalyst plans an Expand that multiplies
scan rows by the number of profiled columns before the exchange). This
module holds the 100 TB path: the same single-scan single-aggregate
profile with HLL approx distinct counts, which compiles WITHOUT Expand
(plan-pinned in tests/test_plans.py) — the shape to run on a petabyte
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_column_profile(
    df: DataFrame, cols: list[str], rsd: float = 0.02
) -> DataFrame:
    """Per-column profile in ONE scan and ONE Expand-free aggregate:
    (column_name, n_rows, null_count, nd_approx, min_value, max_value).

    approx_count_distinct keeps each column's distinct state in a fixed
    HLL register set, so the aggregate needs no per-column row
    replication — input rows cross the exchange once regardless of how
    many columns are profiled (the exact profiler's Expand multiplies
    them by len(cols)). min/max serialize to strings so heterogeneous
    column types share one long-form output schema.
    """
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"nulls_{c}"),
            F.approx_count_distinct(F.col(c), rsd).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                F.col(f"nulls_{c}").alias("null_count"),
                F.col(f"nd_{c}").alias("nd_approx"),
                F.col(f"min_{c}").alias("min_value"),
                F.col(f"max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("s")).select("s.*")
