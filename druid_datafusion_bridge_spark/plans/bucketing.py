"""Bucketed (pre-partitioned) tables for co-located, exchange-free joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
both tables bucketed + sorted on the join key means every join between
them is a SortMergeJoin with ZERO exchanges — the work happens where the
data already lives. This is the Spark analog of the co-located join the
reference can't express (its scan is a single partition,
reference src/datafusion_ext/execution_plan.rs:42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as an external parquet table bucketed (and sorted)
    on `bucket_cols`. Joins/aggregations on those columns between tables
    with the same bucket count require no exchange."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table_name)
