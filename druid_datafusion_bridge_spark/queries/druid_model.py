"""Druid data-model query registrations: granularity rollup (the Druid
signature operation) on the events table, oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query
from ..model.druid_model import DruidTable


@query(
    "dm_rollup_pt15m",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP) AS __time,
           event_type,
           COUNT(*) AS rollup_count,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def dm_rollup_pt15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid ingestion rollup at PT15M granularity, grouped by the
    event_type dimension, sum aggregator on value (metadata.drd
    aggregators/queryGranularity semantics — reference
    tests/wikipedia_segment_test.rs:99-110)."""
    ev = table(spark, sf_dir, "events").select(
        F.col("ts").alias("__time"), "event_type", "value"
    )
    dt = DruidTable(ev)
    return dt.rollup("PT15M", dims=["event_type"], aggs={"value": "sum"})


@query(
    "dm_rollup_hour_multi",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket,
           user_id % 10 AS user_shard,
           COUNT(*) AS n,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def dm_rollup_hour_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup with min/max aggregators and a computed shard dim."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            (F.col("user_id") % 10).alias("user_shard"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "dm_time_boundary",
    oracle="""
    SELECT MIN(ts) AS interval_start, MAX(ts) AS interval_end,
           COUNT(*) AS num_rows
    FROM events
    """,
)
def dm_time_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid timeBoundary query / segment interval metadata
    (reference src/segment/metadata.rs:59-67, src/main.rs:115-124)."""
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.min("ts").alias("interval_start"),
        F.max("ts").alias("interval_end"),
        F.count("*").alias("num_rows"),
    )


@query(
    "dm_info",
    oracle="""
    SELECT column_name AS "column",
           CASE WHEN column_type LIKE 'TIMESTAMP%' THEN 'timestamp'
                WHEN column_type = 'VARCHAR' THEN 'string'
                WHEN column_type = 'BIGINT' THEN 'bigint'
                WHEN column_type = 'DOUBLE' THEN 'double'
                ELSE lower(column_type) END AS type,
           CASE WHEN column_name = '__time' THEN 'time'
                WHEN column_type = 'VARCHAR' THEN 'dimension'
                ELSE 'metric' END AS role
    FROM (DESCRIBE SELECT ts AS __time, event_type, props, user_id, value
          FROM events)
    """,
)
def dm_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`druid-segment info` analog (reference src/main.rs:97-126):
    column name/type/role table for the events table. The oracle
    derives the same table from DuckDB's own schema introspection
    (DESCRIBE) with the identical role rule — string columns are
    dimensions, numerics are metrics, __time is time."""
    ev = table(spark, sf_dir, "events").select(
        F.col("ts").alias("__time"), "event_type", "props", "user_id", "value"
    )
    dt = DruidTable(ev)
    rows = [
        (name, typ, "time" if name == "__time" else
         ("dimension" if name in dt.dimensions else "metric"))
        for name, typ in [(f.name, f.dataType.simpleString()) for f in ev.schema.fields]
    ]
    return spark.createDataFrame(rows, "column string, type string, role string")


@query(
    "dm_rollup_zerofill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS t0, date_trunc('hour', MAX(ts)) AS t1
      FROM events),
    buckets AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
      FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    rolled AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sv
      FROM events GROUP BY 1, 2)
    SELECT b.bucket, t.event_type,
           COALESCE(r.n, 0) AS n_events,
           COALESCE(r.sv, 0.0) AS sum_value
    FROM buckets b
    CROSS JOIN types t
    LEFT JOIN rolled r ON r.bucket = b.bucket AND r.event_type = t.event_type
    """,
)
def dm_rollup_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid timeseries semantics: the timeseries query type ZERO-FILLS
    empty time buckets (a plain GROUP BY drops them). The dense
    (bucket x dimension) grid is generated from the data's own hour
    bounds via sequence/explode — a tiny relation that left-joins the
    rollup and coalesces misses to zero. At 100 TB the grid stays
    buckets x dims (thousands of rows) while only the rollup aggregate
    touches the data."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    buckets = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    rolled = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("sv"),
    )
    return (
        buckets.crossJoin(types)
        .join(rolled, ["bucket", "event_type"], "left")
        .select(
            "bucket",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
        )
    )


@query(
    "dm_rollup_interpolate",
    oracle="""
    WITH ev AS (SELECT ts, value FROM events WHERE event_type = 'purchase'),
    bounds AS (
      SELECT time_bucket(INTERVAL 5 MINUTE, MIN(ts)) AS t0,
             time_bucket(INTERVAL 5 MINUTE, MAX(ts)) AS t1
      FROM ev),
    buckets AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL 5 MINUTE)) AS bucket
      FROM bounds),
    rolled AS (
      SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
               AS v
      FROM ev GROUP BY 1),
    grid AS (
      SELECT b.bucket, COALESCE(r.n, 0) AS n_events, r.v
      FROM buckets b LEFT JOIN rolled r ON r.bucket = b.bucket),
    ctx AS (
      SELECT bucket, n_events, v,
        last_value(v IGNORE NULLS) OVER
          (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN epoch_us(bucket) END
                   IGNORE NULLS) OVER
          (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS pt,
        first_value(v IGNORE NULLS) OVER
          (ORDER BY bucket ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
          AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN epoch_us(bucket) END
                    IGNORE NULLS) OVER
          (ORDER BY bucket ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
          AS nt
      FROM grid)
    SELECT bucket, CAST(n_events AS BIGINT) AS n_events,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN pv + (nv - pv)
                     * (CAST(epoch_us(bucket) - pt AS DOUBLE)
                        / CAST(nt - pt AS DOUBLE))
                ELSE NULL END AS avg_value,
           v IS NULL AS interpolated
    FROM ctx ORDER BY bucket
    """,
)
def dm_rollup_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries gap fill by LINEAR INTERPOLATION (the companion to
    dm_rollup_zerofill's zero fill): sparse purchase events rolled to a
    5-minute grain, empty buckets filled by interpolating between the
    nearest populated neighbors; leading/trailing gaps stay NULL.

    Scale shape: the heavy data passes through ONE rollup aggregate;
    the interpolation windows run over the bucket GRID, whose row count
    is time-range / granularity — independent of data volume (8,640
    rows per month at PT5M), so the global-ordered window is over a
    tiny axis, never over events. Arithmetic is exact-long epoch
    micros with a fixed double expression tree, bit-identical to the
    DuckDB oracle."""
    from ..functions.druid_sql import time_floor
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    bounds = ev.agg(
        time_floor(F.min("ts"), "PT5M").alias("t0"),
        time_floor(F.max("ts"), "PT5M").alias("t1"),
    )
    buckets = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 5 MINUTES"))
        ).alias("bucket")
    )
    rolled = ev.groupBy(time_floor(F.col("ts"), "PT5M").alias("bucket")).agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("value").cast("decimal(38,4)")).cast("double")
            / F.count("*")
        ).alias("v"),
    )
    grid = buckets.join(rolled, "bucket", "left").select(
        "bucket", F.coalesce("n", F.lit(0)).alias("n_events"), "v"
    )
    t_us = F.when(F.col("v").isNotNull(), F.unix_micros("bucket"))
    w_prev = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    # "next populated neighbor" as a running LAST over the REVERSED
    # order, not FIRST over a (1, unboundedFollowing) frame: Spark
    # evaluates an UnboundedFollowing frame by re-scanning the
    # remainder of the partition for EVERY row — O(grid^2); the
    # reversed running frame is the same value in O(grid) (r12:
    # 4.6 s -> ~1 s on an 8,640-bucket grid). Identical semantics:
    # the first non-null after the current bucket ascending IS the
    # last non-null seen before it descending.
    w_next = W.orderBy(F.col("bucket").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    ctx = grid.select(
        "bucket",
        "n_events",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(t_us, ignorenulls=True).over(w_prev).alias("pt"),
        F.last("v", ignorenulls=True).over(w_next).alias("nv"),
        F.last(t_us, ignorenulls=True).over(w_next).alias("nt"),
    )
    ratio = (F.unix_micros("bucket") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * ratio,
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return ctx.select(
        "bucket",
        "n_events",
        filled.alias("avg_value"),
        F.col("v").isNull().alias("interpolated"),
    ).orderBy("bucket")


@query(
    "dm_segment_metadata",
    oracle="""
    WITH g AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS interval_start,
             COUNT(*) AS n_rows,
             COUNT(*) - COUNT(user_id) AS nulls_user_id,
             COUNT(DISTINCT user_id) AS nd_user_id,
             CAST(MIN(user_id) AS VARCHAR) AS min_user_id,
             CAST(MAX(user_id) AS VARCHAR) AS max_user_id,
             SUM(length(CAST(user_id AS VARCHAR))) AS sz_user_id,
             COUNT(*) - COUNT(event_type) AS nulls_event_type,
             COUNT(DISTINCT event_type) AS nd_event_type,
             MIN(event_type) AS min_event_type,
             MAX(event_type) AS max_event_type,
             SUM(length(event_type)) AS sz_event_type
      FROM events GROUP BY 1)
    SELECT interval_start, column_name,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(null_count AS BIGINT) AS null_count,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           min_value, max_value,
           CAST(byte_size AS BIGINT) AS byte_size
    FROM (
      SELECT interval_start, 'user_id' AS column_name, n_rows,
             nulls_user_id AS null_count, nd_user_id AS n_distinct,
             min_user_id AS min_value, max_user_id AS max_value,
             sz_user_id AS byte_size
      FROM g
      UNION ALL
      SELECT interval_start, 'event_type', n_rows,
             nulls_event_type, nd_event_type,
             min_event_type, max_event_type, sz_event_type
      FROM g)
    ORDER BY interval_start, column_name
    """,
)
def dm_segment_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid segmentMetadata query analog: per time chunk (day = the
    segment granularity s11b writes), per column — row count, null
    count, exact cardinality, min/max, and the UTF-8 size of the
    rendered values (Druid reports per-column size estimates the same
    spirit). The reference exposes segment metadata only through its
    info CLI (src/main.rs:97-127, mirrored by dm_info); this is the
    queryable per-interval form a Druid broker serves.

    One scan, one aggregate: every column's statistics are expressions
    of the same per-day Aggregate node, pivoted long with an explode
    over literal structs. The two exact COUNT(DISTINCT)s cost one
    Expand (rows x columns) — swap for approx_count_distinct at 100 TB
    (kept exact for the bit-exact oracle); byte sizes render integers
    and strings identically in both engines."""
    ev = table(spark, sf_dir, "events")
    cols = ["user_id", "event_type"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
            F.sum(F.length(F.col(c).cast("string"))).alias(f"sz_{c}"),
        ]
    wide = ev.groupBy(F.date_trunc("day", "ts").alias("interval_start")).agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                F.col(f"nulls_{c}").alias("null_count"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"min_{c}").alias("min_value"),
                F.col(f"max_{c}").alias("max_value"),
                F.col(f"sz_{c}").alias("byte_size"),
            )
            for c in cols
        ]
    )
    return (
        wide.select("interval_start", F.explode(rows).alias("s"))
        .select("interval_start", "s.*")
        .orderBy("interval_start", "column_name")
    )
