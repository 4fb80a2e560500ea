"""Streaming ingestion into Druid segments — the reference's parent
system's core real-time path (stream -> time-partitioned immutable
segments), absent from the reference itself (strictly batch/bounded,
SURVEY §1.7), re-expressed as Structured Streaming + foreachBatch.

Each micro-batch runs the same distributed segment writer as batch
ingestion (sources/ingest.py); segment directories are namespaced by
batch id, so a restart re-running batch N overwrites N's own segments
instead of duplicating data (foreachBatch's replay contract =>
idempotent sink). Downstream, the 'druidsegment' reader scans the
accumulating segment forest with one partition per segment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.ingest import write_druid_segments


def stream_to_segments(
    stream_df: DataFrame,
    path: str,
    granularity: str = "PT1H",
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming query writing each micro-batch as Druid
    segments under `path`. `stream_df` must carry a `__time` timestamp
    column. Returns the StreamingQuery (caller stops/awaits)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_dir = os.path.join(path, f"batch_{batch_id:06d}")
        write_druid_segments(batch_df, batch_dir, granularity=granularity).collect()

    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_segment_forest(spark, path: str) -> DataFrame:
    """Scan every segment under a streaming output tree (batch_*/seg_*)."""
    from ..sources.datasource import find_segment_dirs  # noqa: F401

    roots = sorted(
        os.path.join(path, d)
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
    )
    dfs = [
        spark.read.format("druidsegment").option("path", r).load() for r in roots
    ]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
