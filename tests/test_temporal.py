"""Unit tests for the as-of and banded range join operators on crafted
frames: tie semantics, before-first-match NULLs, band boundaries."""

from __future__ import annotations

import datetime as dt

from druid_datafusion_bridge_spark.operators.temporal import asof_join, range_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_basic_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(1)), (3, 20, _ts(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(3), 100.0), (10, _ts(5), 200.0), (20, _ts(30), 999.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: (r["value_right"], r["ts_right"])
        for r in asof_join(left, right, on="user_id").collect()
    }
    # equal timestamps match (at-or-before): event 1 takes the ts=5 purchase
    assert got[1] == (200.0, _ts(5))
    # before any right row: NULLs
    assert got[2] == (None, None)
    # right row is after the left row: NULLs
    assert got[3] == (None, None)


def test_asof_picks_latest_not_first(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(50))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _ts(10), 1.0), (7, _ts(40), 2.0), (7, _ts(45), 3.0)],
        "user_id long, ts timestamp, value double",
    )
    row = asof_join(left, right, on="user_id").collect()[0]
    assert row["value_right"] == 3.0


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 5, _ts(10)), (101, 5, _ts(40)), (102, 5, _ts(41)), (103, 5, _ts(9)),
         (104, 6, _ts(20))],
        "event_id long, user_id long, ts timestamp",
    )
    got = sorted(
        r["event_id_right"]
        for r in range_join(
            left, right, on="user_id", lower_seconds=0, upper_seconds=30
        ).collect()
    )
    # inclusive [0, 30]: ts 10 (gap 0) and ts 40 (gap 30); 41 is out,
    # 9 is before, 104 is another user
    assert got == [100, 101]


def test_range_join_crosses_band_boundary(spark):
    # matches must survive when left and right fall in adjacent bands
    left = spark.createDataFrame(
        [(1, 5, _ts(29))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(200, 5, _ts(31))], "event_id long, user_id long, ts timestamp"
    )
    got = range_join(
        left, right, on="user_id", lower_seconds=0, upper_seconds=30
    ).collect()
    assert [r["event_id_right"] for r in got] == [200]


def test_sessionize_matches_spark_session_window(spark):
    """The batch gaps-and-islands operator must reproduce Spark's own
    session_window partitioning exactly: same sessions, same starts,
    same event counts — so a batch backfill and the streaming session
    rollup agree on every boundary. The planted edge rows pin the
    subtle case: an event at precisely last_ts + gap MERGES into the
    running session (session_window merges while next_start <=
    prev_end), so the break test must be strict >."""
    from pyspark.sql import functions as F

    from druid_datafusion_bridge_spark.catalog import table
    from druid_datafusion_bridge_spark.operators.temporal import sessionize

    from .conftest import SF_DIR

    ev = table(spark, SF_DIR, "events")
    # exact-boundary rows: user 999999 with events exactly 300 s apart
    edge = spark.createDataFrame(
        [(10**9 + i, dt.datetime(2024, 1, 1, 0, 5 * i), 999999, "x", 0.0, "{}")
         for i in range(3)],
        ev.schema,
    )
    ev = ev.unionByName(edge)
    ours = sessionize(ev, gap_seconds=300)
    want = (
        ev.groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    a = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in ours.collect()
    )
    b = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in want.collect()
    )
    assert a == b


def test_asof_join_ignores_null_right_timestamps(spark):
    """A right row with a NULL timestamp can never be 'at or before'
    any left row (DuckDB ASOF agrees) — it must not be carried as a
    match, and it must not desynchronize the value/ts carries."""
    from druid_datafusion_bridge_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("k", 5)], "k string, ts long")
    right = spark.createDataFrame(
        [("k", None, "ghost"), ("k", 3, "real")],
        "k string, ts long, val string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["val_right"] == "real" and row["ts_right"] == 3

    # only a null-ts right row => no match at all
    right2 = spark.createDataFrame(
        [("k", None, "ghost")], "k string, ts long, val string"
    )
    row2 = asof_join(left, right2, on="k").collect()[0]
    assert row2["val_right"] is None and row2["ts_right"] is None
