"""Streaming extension tests: run each streaming operator over the
finite events file source to completion and diff against the batch
answer on the same data (complete-mode aggregates must equal batch;
append-mode dedup must equal batch dropDuplicates)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from druid_datafusion_bridge_spark.catalog import table
from druid_datafusion_bridge_spark.streaming.events import (
    dedup_within_watermark,
    run_to_memory,
    session_rollup,
    sliding_rollup,
    stream_events,
    tumbling_rollup,
)

from .conftest import SF_DIR


def _rows(df):
    return sorted([tuple(str(x) for x in r) for r in df.collect()])


@pytest.fixture(scope="module")
def batch_events(spark):
    return table(spark, SF_DIR, "events")


def test_tumbling_rollup_matches_batch(spark, batch_events):
    q = run_to_memory(tumbling_rollup(stream_events(spark, SF_DIR)), "t_tumble")
    try:
        got = _rows(spark.sql("SELECT * FROM t_tumble"))
        want = _rows(
            batch_events.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("sum_value"),
            )
            .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events", "sum_value")
        )
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_sliding_rollup_matches_batch(spark, batch_events):
    q = run_to_memory(sliding_rollup(stream_events(spark, SF_DIR)), "t_slide")
    try:
        got = _rows(spark.sql("SELECT * FROM t_slide"))
        want = _rows(
            batch_events.groupBy(
                F.window("ts", "30 minutes", "10 minutes").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events")
        )
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_session_rollup_runs(spark, batch_events):
    q = run_to_memory(session_rollup(stream_events(spark, SF_DIR)), "t_sess")
    try:
        got = spark.sql("SELECT * FROM t_sess")
        n_sessions = got.count()
        n_users = batch_events.select("user_id").distinct().count()
        # at least one session per active user; session count bounded by events
        assert n_sessions >= n_users
        assert n_sessions <= batch_events.count()
        # every event is in exactly one session
        total = got.agg(F.sum("n_events")).collect()[0][0]
        assert total == batch_events.count()
    finally:
        q.stop()


def test_dedup_within_watermark(spark, batch_events):
    q = run_to_memory(
        dedup_within_watermark(stream_events(spark, SF_DIR)), "t_dedup", "append"
    )
    try:
        got = spark.sql("SELECT COUNT(*) FROM t_dedup").collect()[0][0]
        want = batch_events.dropDuplicates(["event_id"]).count()
        assert got == want
    finally:
        q.stop()


def test_stateful_running_totals_match_batch(spark, batch_events):
    """applyInPandasWithState custom stateful operator: the last update
    per user must equal the batch aggregate exactly (state accumulates
    integer cents, so no float-order drift)."""
    from druid_datafusion_bridge_spark.streaming.events import (
        stateful_running_totals,
    )

    q = run_to_memory(
        stateful_running_totals(stream_events(spark, SF_DIR)), "t_state", "update"
    )
    try:
        got = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.sql(
                "SELECT user_id, n_events, total_value FROM t_state"
            ).collect()
            # in update mode each user may appear once per batch; keep max
        }
        final = spark.sql(
            """SELECT user_id, max(n_events) n, max(total_value) v
               FROM t_state GROUP BY user_id"""
        ).collect()
        want = {
            r.user_id: (r.n, round(r.v, 2))
            for r in batch_events.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("v"),
            )
            .collect()
        }
        assert {r.user_id: (r.n, round(r.v, 2)) for r in final} == want
        assert len(got) == len(want)
    finally:
        q.stop()


def test_stream_definable_before_source_exists(spark, tmp_path):
    """A stream over a not-yet-populated directory must be definable
    (schema falls back to the canonical events schema) and must pick up
    files that land after definition — the normal streaming deployment
    shape, where the source directory fills over time."""
    src = tmp_path / "incoming"
    src.mkdir()
    stream = stream_events(spark, str(src))
    assert [f.name for f in stream.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]
    batch = table(spark, SF_DIR, "events")
    batch.write.mode("overwrite").parquet(str(tmp_path / "staged"))
    import shutil

    staged = next((tmp_path / "staged").glob("*.parquet"))
    shutil.copy(staged, src / "events.parquet")
    q = run_to_memory(tumbling_rollup(stream), "t_late_source")
    try:
        got = spark.sql("SELECT SUM(n_events) FROM t_late_source").collect()[0][0]
        assert got == batch.count()
    finally:
        q.stop()


def test_checkpoint_restart_exactly_once(spark, batch_events, tmp_path):
    """Kill-and-resume semantics: the same aggregation restarted from
    its checkpoint after a partial run must converge to exactly the
    batch answer — no dropped or double-counted micro-batches. The
    events table is re-staged as multiple files with
    maxFilesPerTrigger=1 so the first run genuinely stops mid-stream."""
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    batch_events.repartition(5).write.parquet(str(src))

    def stream():
        ev = (
            spark.readStream.schema(batch_events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        return ev.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )

    # phase 1: process a strict prefix of the files, then stop
    q1 = (
        stream()
        .writeStream.format("memory")
        .queryName("ckpt_phase1")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    import time as _t

    while len(q1.recentProgress) < 2:  # at least 2 of 5 micro-batches
        _t.sleep(0.2)
    q1.stop()
    q1.awaitTermination()

    # phase 2: resume from the SAME checkpoint, drain to the end
    q2 = (
        stream()
        .writeStream.format("memory")
        .queryName("ckpt_phase2")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    got = _rows(spark.table("ckpt_phase2"))
    want = _rows(
        batch_events.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    assert got == want


def test_stream_to_segments_realtime_handoff(spark, tmp_path):
    """Realtime-node path: stream events -> foreachBatch handoff ->
    versioned Druid segments -> the druidsegment DataSource serves the
    same totals the batch table gives. Exactly-once: re-running the
    stream from the same checkpoint must hand off nothing new."""
    import pyspark.sql.functions as F

    from druid_datafusion_bridge_spark.catalog import table as cat_table
    from druid_datafusion_bridge_spark.sources.datasource import (
        register_druid_datasource,
    )
    from druid_datafusion_bridge_spark.streaming.events import stream_events
    from druid_datafusion_bridge_spark.streaming.ingest import stream_to_segments

    register_druid_datasource(spark)
    out = str(tmp_path / "rt_segments")
    ckpt = str(tmp_path / "ckpt")

    def start():
        ev = stream_events(spark, SF_DIR).select(
            F.col("ts").alias("__time"),
            "event_type",
            F.col("user_id").cast("long").alias("user_id"),
            "value",
        )
        return stream_to_segments(ev, out, ckpt, granularity="P1D")

    q = start()
    q.awaitTermination(120)

    back = spark.read.format("druidsegment").option("path", out).load()
    batch = cat_table(spark, SF_DIR, "events")
    got = back.agg(
        F.count("*").alias("n"),
        F.sum("user_id").alias("su"),
        F.sum(F.col("value").cast("decimal(38,4)")).alias("sv"),
    ).collect()[0]
    want = batch.agg(
        F.count("*").alias("n"),
        F.sum("user_id").alias("su"),
        F.sum(F.col("value").cast("decimal(38,4)")).alias("sv"),
    ).collect()[0]
    assert tuple(got) == tuple(want)
    # every segment dir carries its handoff version tag
    import os

    # segment DIRS only: planning the verification scan above writes
    # the root's _planmeta.json manifest beside them
    segs = sorted(
        d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))
    )
    assert segs and all("_b" in s for s in segs)

    # restart from the same checkpoint: source is dry, no new segments
    q2 = start()
    q2.awaitTermination(120)
    assert sorted(
        d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))
    ) == segs


def test_watermark_drops_late_rows(spark, tmp_path):
    """Watermark semantics end-to-end: a row arriving after its window
    was finalized must be dropped, and the finalized aggregate never
    re-emits. Three parquet files processed as separate micro-batches
    (maxFilesPerTrigger=1, mtime-ordered): batch 0 builds window
    [00:00, 00:15) = 3 rows and advances the watermark to 00:50,
    batch 1 finalizes and emits it, batch 2 smuggles a late 00:05 row —
    append mode must drop it (a late row landing in the SAME batch as
    finalization still merges; the emission boundary is what seals the
    window, which is why the schedule separates them)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    src = tmp_path / "events_late"
    src.mkdir()
    base = 1704067200000  # 2024-01-01T00:00Z, ms

    def write(name, times_ms, mtime):
        t = pa.table(
            {
                "ts": pa.array(times_ms, pa.timestamp("ms")),
                "v": pa.array([1] * len(times_ms), pa.int64()),
            }
        )
        p = str(src / name)
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    m = lambda mins: base + mins * 60_000  # noqa: E731
    # batch 0: three on-time rows + 01:00 -> watermark becomes 00:50
    write("a.parquet", [m(1), m(5), m(9), m(60)], 1_000_000)
    # batch 1: 01:10 -> [00:00, 00:15) (end 00:15 < 00:50) finalizes
    write("b.parquet", [m(70)], 2_000_000)
    # batch 2: LATE 00:05 row (window already emitted) + 02:00
    write("c.parquet", [m(5), m(120)], 3_000_000)

    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_drop")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM late_drop").collect()
    got = {r["bucket"].isoformat(): r["n"] for r in rows}
    assert len(rows) == len(got), "a finalized window re-emitted"
    # [00:00, 00:15) sealed at 3 — the late row dropped; [01:00, 01:15)
    # carries the 01:00 and 01:10 rows
    assert got.get("2024-01-01T00:00:00") == 3, got
    assert got.get("2024-01-01T01:00:00") == 2, got


def test_supervisor_starts_before_data_arrives(spark, tmp_path):
    """A streaming supervisor submitted against an EMPTY drop directory
    derives its input schema from the dataSchema (like a Kafka topic
    with no sample available) and ingests files that arrive later —
    Druid's start-supervisor-then-stream order."""
    import json as _json

    from druid_datafusion_bridge_spark.sources.datasource import (
        find_segment_dirs,
    )
    from druid_datafusion_bridge_spark.streaming.supervisor import (
        StreamingSupervisor,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    sup = StreamingSupervisor(
        spark,
        {"type": "kafka", "spec": {
            "dataSchema": {
                "dataSource": "late",
                "timestampSpec": {"column": "time", "format": "iso"},
                "dimensionsSpec": {"dimensions": ["channel"]},
                "metricsSpec": [{"type": "longSum", "name": "delta_sum",
                                 "fieldName": "delta"}],
                "granularitySpec": {"segmentGranularity": "day",
                                    "queryGranularity": "hour"},
            },
            "ioConfig": {
                "inputSource": {"type": "local", "baseDir": str(drop)},
                "inputFormat": {"type": "json"},
            },
        }},
        str(tmp_path / "deep"),
    ).start()
    try:
        sup.process_available()
        assert sup.segments_published == 0
        with open(drop / "later.json", "w") as f:
            f.write(_json.dumps({"time": "2024-01-01T00:10:00Z",
                                 "channel": "en", "delta": 7}) + "\n")
        sup.process_available()
        assert sup.segments_published == 1, sup.status()
        assert len(find_segment_dirs(str(tmp_path / "deep" / "late"))) == 1
    finally:
        sup.terminate()
    assert sup.status()["state"] == "TERMINATED"


def test_supervisor_minute_period_and_terminated_is_final(spark, tmp_path):
    """Review regressions: (1) ioConfig.period parses as a real ISO
    clock period (PT1M used to become an invalid Spark trigger and kill
    the submission); (2) an empty drop dir with a marker file whose
    rows carry no fields still falls back to the dataSchema-derived
    schema; (3) TERMINATED is final — suspend/resume can't resurrect."""
    import json as _json

    from druid_datafusion_bridge_spark.streaming.supervisor import (
        StreamingSupervisor,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    with open(drop / "marker.json", "w") as f:
        f.write("{}\n")  # schemaless heartbeat file
    spec = {"type": "kafka", "spec": {
        "dataSchema": {
            "dataSource": "minute",
            "timestampSpec": {"column": "time", "format": "iso"},
            "dimensionsSpec": {"dimensions": ["channel"]},
            "metricsSpec": [{"type": "longSum", "name": "delta_sum",
                             "fieldName": "delta"}],
            "granularitySpec": {"segmentGranularity": "day",
                                "queryGranularity": "hour"},
        },
        "ioConfig": {
            "inputSource": {"type": "local", "baseDir": str(drop)},
            "inputFormat": {"type": "json"},
            "period": "PT1M",
        },
    }}
    sup = StreamingSupervisor(spark, spec, str(tmp_path / "deep")).start()
    try:
        assert sup.state == "RUNNING"
        with open(drop / "one.json", "w") as f:
            f.write(_json.dumps({"time": "2024-01-01T00:10:00Z",
                                 "channel": "en", "delta": 3}) + "\n")
        sup.process_available()
        assert sup.segments_published == 1, sup.status()
    finally:
        sup.terminate()
    assert sup.status()["state"] == "TERMINATED"
    sup.suspend()
    assert sup.status()["state"] == "TERMINATED"  # final, not SUSPENDED
    sup.resume()
    assert sup.status()["state"] == "TERMINATED"
    # calendar periods are rejected loudly, not mis-parsed
    import pytest as _pytest

    bad = {"type": "kafka", "spec": {
        "dataSchema": spec["spec"]["dataSchema"] | {"dataSource": "cal"},
        "ioConfig": dict(spec["spec"]["ioConfig"], period="P1M"),
    }}
    with _pytest.raises(ValueError, match="clock period"):
        StreamingSupervisor(spark, bad, str(tmp_path / "deep2")).start()


def test_supervisor_reset_clears_offsets_and_reingests(spark, tmp_path):
    """POST .../reset semantics (supervisor-api.md): stop, clear the
    stored offsets (checkpoint), restart from the input's beginning.
    After reset the already-processed file is read AGAIN (offsets are
    gone) — the recover-a-wedged-stream operation, carrying real
    Druid's documented duplicate-data hazard. TERMINATED stays final."""
    import json as _json
    import os

    from druid_datafusion_bridge_spark.streaming.supervisor import (
        StreamingSupervisor,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    with open(drop / "a.json", "w") as f:
        f.write(_json.dumps({"time": "2024-01-01T00:10:00Z",
                             "channel": "en", "delta": 7}) + "\n")
    sup = StreamingSupervisor(
        spark,
        {"type": "kafka", "spec": {
            "dataSchema": {
                "dataSource": "resettable",
                "timestampSpec": {"column": "time", "format": "iso"},
                "dimensionsSpec": {"dimensions": ["channel"]},
                "metricsSpec": [{"type": "longSum", "name": "delta_sum",
                                 "fieldName": "delta"}],
                "granularitySpec": {"segmentGranularity": "day",
                                    "queryGranularity": "hour"},
            },
            "ioConfig": {
                "inputSource": {"type": "local", "baseDir": str(drop)},
                "inputFormat": {"type": "json"},
            },
        }},
        str(tmp_path / "deep"),
    ).start()
    try:
        sup.process_available()
        assert sup.batches_processed >= 1
        before = sup.batches_processed
        assert os.path.isdir(sup.checkpoint)
        sup.reset()
        assert sup.state == "RUNNING"
        sup.process_available()
        # offsets were cleared: the SAME file produced a fresh batch
        assert sup.batches_processed > before
    finally:
        sup.terminate()
    # reset on a terminated supervisor is a no-op (final state)
    sup.reset()
    assert sup.state == "TERMINATED"


def test_reset_keeps_suspended_supervisor_suspended(spark, tmp_path):
    """Review regression: reset on a SUSPENDED supervisor clears the
    offsets but must NOT resume ingestion the operator paused."""
    import json as _json
    import os

    from druid_datafusion_bridge_spark.streaming.supervisor import (
        StreamingSupervisor,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    with open(drop / "a.json", "w") as f:
        f.write(_json.dumps({"time": "2024-01-01T00:10:00Z",
                             "channel": "en", "delta": 7}) + "\n")
    sup = StreamingSupervisor(
        spark,
        {"type": "kafka", "spec": {
            "dataSchema": {
                "dataSource": "suspreset",
                "timestampSpec": {"column": "time", "format": "iso"},
                "dimensionsSpec": {"dimensions": ["channel"]},
                "metricsSpec": [],
                "granularitySpec": {"segmentGranularity": "day",
                                    "queryGranularity": "hour"},
            },
            "ioConfig": {
                "inputSource": {"type": "local", "baseDir": str(drop)},
                "inputFormat": {"type": "json"},
            },
        }},
        str(tmp_path / "deep"),
    ).start()
    try:
        sup.process_available()
        sup.suspend()
        assert sup.state == "SUSPENDED"
        sup.reset()
        assert sup.state == "SUSPENDED"
        assert not os.path.isdir(sup.checkpoint)  # offsets cleared
        sup.resume()  # resumes from the beginning when THEY choose
        assert sup.state == "RUNNING"
    finally:
        sup.terminate()
