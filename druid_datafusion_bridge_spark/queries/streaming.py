"""Registry entries for the Structured Streaming operators (§2.10 /
Phase E): each runs the stream over the finite events file source to
completion (availableNow trigger) and returns the materialized result,
so the driver can diff complete-mode streaming aggregates against plain
batch SQL oracles — proving the streaming rollup computes exactly the
ingest-time rollup semantics it mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import query
from ..streaming.events import (
    dedup_within_watermark,
    run_to_memory,
    session_rollup,
    stream_events,
    tumbling_rollup,
)


def _finish(stream_df: DataFrame, spark: SparkSession, name: str, mode: str) -> DataFrame:
    q = run_to_memory(stream_df, name, mode)
    q.stop()
    return spark.table(name)


@query(
    "st_tumbling_rollup",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP)
             AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def st_tumbling_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-min tumbling-window streaming rollup, run to completion; in
    complete mode the final answer must equal the batch rollup exactly."""
    return _finish(
        tumbling_rollup(stream_events(spark, sf_dir)),
        spark, "st_tumble_out", "complete",
    )


@query(
    "st_session_rollup",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def st_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (5-min gap) via session_window; the
    oracle rebuilds identical sessions with a gap-and-island window
    query (session_end = last event + gap, Spark's definition; the
    split condition is STRICT > — an event at exactly last_ts + gap
    merges in session_window, verified empirically)."""
    return _finish(
        session_rollup(stream_events(spark, sf_dir)),
        spark, "st_session_out", "complete",
    )


@query(
    "st_dedup_within_watermark",
    oracle="""
    SELECT event_id, MIN(event_type) AS event_type
    FROM events GROUP BY event_id
    """,
)
def st_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on event_id (bounded state); event_ids
    are unique per row in the testdata, so MIN() in the oracle is exact."""
    out = _finish(
        dedup_within_watermark(stream_events(spark, sf_dir)),
        spark, "st_dedup_out", "append",
    )
    return out.select("event_id", "event_type")


@query(
    "st_sliding_rollup",
    oracle="""
    SELECT CAST(to_timestamp((floor(epoch(ts) / 600) - k.o) * 600) AS TIMESTAMP)
             AS bucket_start,
           event_type,
           COUNT(*) AS n_events
    FROM events, (VALUES (0), (1), (2)) k(o)
    GROUP BY 1, 2
    """,
)
def st_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min windows sliding by 10: every event lands in exactly three
    overlapping windows — the oracle reproduces them by cross-joining
    the three slide offsets."""
    from ..streaming.events import sliding_rollup

    return _finish(
        sliding_rollup(stream_events(spark, sf_dir)),
        spark, "st_slide_out", "complete",
    )


@query(
    "st_stateful_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def st_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) run to
    completion. Updates are monotone (running totals), so the final
    per-user row — the max n_events per user in the update stream —
    must equal the batch aggregate exactly: state accumulates integer
    cents, immune to batch boundaries and float order."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from ..streaming.events import stateful_running_totals

    out = _finish(
        stateful_running_totals(stream_events(spark, sf_dir)),
        spark, "st_stateful_out", "update",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("user_id", "n_events", "total_value")
    )


@query(
    "st_stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           n.n_name AS user_nation
    FROM events e
    LEFT JOIN nation n ON n.n_nationkey = e.user_id % 25
    """,
)
def st_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (the Druid lookup-join analog):
    the event stream joins a static dimension keyed off user_id.
    Stateless per micro-batch; the final materialized rows must equal
    the batch join exactly."""
    from pyspark.sql import functions as F
    from ..catalog import table

    dim = (
        table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("_nk"),
            F.col("n_name").alias("user_nation"),
        )
    )
    ev = stream_events(spark, sf_dir).withColumn(
        "_nk", F.pmod(F.col("user_id"), F.lit(25))
    )
    joined = ev.join(dim, "_nk", "left")
    out = _finish(
        joined.select("event_id", "user_id", "event_type", "user_nation"),
        spark, "st_enrich_out", "append",
    )
    return out


@query(
    "st_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS p_user, p.ts AS purchase_ts, c.ts AS click_ts
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 10 MINUTE
    """,
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join with bounded state: purchases
    matched to the same user's clicks within the preceding 10 minutes,
    both sides watermarked. Run to completion, the result must equal
    the batch interval self-join exactly."""
    from ..streaming.events import stream_stream_click_purchase

    return _finish(
        stream_stream_click_purchase(stream_events(spark, sf_dir)),
        spark, "st_ssjoin_out", "append",
    )


@query(
    "st_batch_sessionize",
    oracle="""
    WITH laged AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events),
    marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_break
      FROM laged),
    numbered AS (
      SELECT user_id, ts,
             CAST(SUM(is_break) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM marked)
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def st_batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gaps-and-islands sessionization (30-min inactivity gap) —
    the backfill counterpart of st_session_rollup's streaming session
    window, over the same events table, with the same gap convention
    (strict >: a gap of exactly the threshold merges, Spark's
    session_window semantics — tests/test_temporal.py). One
    shuffle on user_id, two linear window passes; see
    operators/temporal.sessionize for the scale shape."""
    from ..catalog import table
    from ..operators.temporal import sessionize

    return sessionize(
        table(spark, sf_dir, "events"), key_col="user_id", gap_seconds=1800
    )


@query(
    "st_topn_rollup",
    oracle="""
    WITH agg AS (
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY user_id)
    SELECT user_id, n_events, sum_value
    FROM agg ORDER BY sum_value DESC, user_id LIMIT 10
    """,
)
def st_topn_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard: complete-mode per-user rollup over the
    stream, with the final top-10 by accumulated value taken on the
    materialized complete-mode table (Structured Streaming cannot sort
    an unbounded aggregate mid-stream; the top-N is a query over the
    result table, mirroring how Druid brokers serve topN over
    ingest-time rollups). Run to completion it must equal the batch
    top-10 exactly; the tie-break on user_id makes the cut
    deterministic."""
    from pyspark.sql import functions as F

    from ..queries.exact import exact_sum

    ev = stream_events(spark, sf_dir)
    rollup = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), exact_sum("value", "sum_value")
    )
    done = _finish(rollup, spark, "st_topn_out", "complete")
    return done.orderBy(F.col("sum_value").desc(), "user_id").limit(10)


@query(
    "st_segment_handoff_query",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def st_segment_handoff_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full realtime-ingestion lifecycle as one registry entry: stream
    the events source, hand every micro-batch off as versioned Druid
    segments (foreachBatch -> the engine's own distributed segment
    writer; the reference has no write path at all, read-only mmap per
    src/segment/mod.rs:19-24), then serve an hourly rollup FROM THE
    SEGMENTS through the druidsegment DataSource. Exactly-once handoff
    (checkpointed source + batch-id-versioned segments, so a retried
    batch overwrites its own files) means the segment-side rollup must
    equal the batch rollup over the raw parquet bit-for-bit — which is
    what the oracle checks. The handoff is cached per testdata
    generation (same fingerprint discipline as the other segment
    builds); the serving query itself never touches raw events."""
    import os

    from pyspark.sql import functions as F

    from ..streaming.ingest import stream_to_segments
    from .druid_source import (
        _cached_build,
        _ensure_registered,
        _segment_root,
    )

    _ensure_registered(spark)
    root = _segment_root(sf_dir, "events_rt_handoff")
    data = os.path.join(root, "data")

    def _build() -> None:
        ev = stream_events(spark, sf_dir).select(
            F.col("ts").alias("__time"), "event_type", "value"
        )
        q = stream_to_segments(
            ev, data, os.path.join(root, "ckpt"), granularity="P1D"
        )
        if not q.awaitTermination(300):
            # availableNow didn't drain in time: stop the writer and
            # fail loudly — a raise here means _cached_build never
            # stamps the PARTIAL handoff as complete.
            q.stop()
            raise RuntimeError(
                "segment handoff stream did not terminate within 300s; "
                "refusing to mark the partial segment root complete"
            )

    _cached_build(root, sf_dir, "events", _build)
    back = spark.read.format("druidsegment").option("path", data).load()
    return (
        back.groupBy(
            F.date_trunc("hour", "__time").alias("bucket_hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("bucket_hour", "event_type")
    )


@query(
    "st_supervisor_ingest",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def st_supervisor_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's streaming-ingestion supervisor lifecycle as one registry
    entry: stage the events table as parquet drops (the sandbox's
    stand-in for a topic), submit an index_kafka-shaped supervisor spec
    whose dataSchema rolls up to hourly (count + doubleSum through the
    decimal-accumulating aggregator compiler), drain it, terminate, and
    serve the rollup FROM THE HANDED-OFF SEGMENTS. The supervisor runs
    batch ingestion's exact row pipeline inside foreachBatch
    (ingestion_spec.transform_rows), so the segment-side result must
    equal plain SQL over raw events bit-for-bit — the oracle. Real
    Druid's realtime path (the reference reads only what that path
    wrote; it has no ingestion at all, src/segment/mod.rs:19-24), built
    from Structured Streaming + the distributed segment writer. Build
    is cached per testdata fingerprint; the serving query never touches
    raw events."""
    import os

    from pyspark.sql import functions as F

    from ..catalog import table
    from ..streaming.supervisor import StreamingSupervisor
    from .druid_source import (
        _cached_build,
        _ensure_registered,
        _segment_root,
    )

    _ensure_registered(spark)
    root = _segment_root(sf_dir, "events_supervisor")
    deep = os.path.join(root, "deep")

    def _build() -> None:
        drop = os.path.join(root, "drop")
        table(spark, sf_dir, "events").select(
            "ts", "event_type", "value"
        ).write.parquet(drop)
        sup = StreamingSupervisor(
            spark,
            {
                "type": "kafka",
                "spec": {
                    "dataSchema": {
                        "dataSource": "events_sup",
                        "timestampSpec": {"column": "ts", "format": "iso"},
                        "dimensionsSpec": {"dimensions": ["event_type"]},
                        "metricsSpec": [
                            {"type": "count", "name": "n_events"},
                            {
                                "type": "doubleSum",
                                "name": "sum_value",
                                "fieldName": "value",
                            },
                        ],
                        "granularitySpec": {
                            "segmentGranularity": "day",
                            "queryGranularity": "hour",
                            "rollup": True,
                        },
                    },
                    "ioConfig": {
                        "inputSource": {"type": "local", "baseDir": drop},
                        "inputFormat": {"type": "parquet"},
                    },
                },
            },
            deep,
        ).start()
        try:
            sup.process_available()
        finally:
            sup.terminate()
        if sup.recent_errors:
            # raising skips the completion stamp, so a failed ingest
            # can never serve as a complete cache
            raise RuntimeError(
                f"supervisor ingest failed: {sup.recent_errors}"
            )

    _cached_build(root, sf_dir, "events", _build)
    back = (
        spark.read.format("druidsegment")
        .option("path", os.path.join(deep, "events_sup"))
        .load()
    )
    return (
        back.groupBy(
            F.col("__time").alias("bucket_hour"), "event_type"
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum(F.col("sum_value").cast("decimal(38,8)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("bucket_hour", "event_type")
    )
