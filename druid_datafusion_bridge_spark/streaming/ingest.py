"""Streaming ingestion into Druid v9 segments — the realtime-node path.

Druid's realtime ingestion model: events stream in, accumulate briefly,
and are periodically handed off as immutable, versioned segments that
historical queries then serve. Structured Streaming reproduces that
split exactly: ``foreachBatch`` is the handoff boundary — each
micro-batch runs the engine's own distributed segment writer
(sources/ingest.py write_druid_segments: one granularity-bucket shuffle,
hot-interval sharding, executor-side encode) with the batch id stamped
as the segment VERSION, so successive batches land beside each other in
one datasource root and a retried batch overwrites its own files
(idempotent handoff — exactly-once on top of the checkpointed source).

Late batches leave many small same-interval segments; that is by design
(Druid appending mode) — ``sources/ingest.py compact_segments`` restores
the one-segment-per-interval layout, exactly like Druid compaction after
realtime handoff.

The reference has no write path at all (read-only mmap,
src/segment/mod.rs:19-24); this composes the repo's beyond-parity writer
with the streaming mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_segments(
    stream_df: DataFrame,
    out_root: str,
    checkpoint_dir: str,
    granularity: str = "P1D",
    dimensions: list[str] | None = None,
    max_rows_per_segment: int = 5_000_000,
) -> StreamingQuery:
    """Start a streaming query that hands every micro-batch off as
    Druid segments under ``out_root``. The input stream must already
    carry the Druid ``__time`` column. Returns the StreamingQuery;
    callers pick the trigger cadence via the builder default
    (availableNow semantics come from the source running dry)."""
    from ..sources.ingest import write_druid_segments

    def handoff(batch_df: DataFrame, batch_id: int) -> None:
        write_druid_segments(
            batch_df,
            out_root,
            granularity=granularity,
            dimensions=dimensions,
            max_rows_per_segment=max_rows_per_segment,
            version=f"b{batch_id}",
        ).collect()  # driver sees only the tiny manifest

    return (
        stream_df.writeStream.foreachBatch(handoff)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
