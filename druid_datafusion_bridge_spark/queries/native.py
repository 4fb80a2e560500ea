"""Registry queries for the Druid NATIVE query JSON surface
(native_query.py): each entry feeds a literal native spec — the JSON a
Druid user POSTs to /druid/v2 — through the interpreter over the
events table, with an exact DuckDB oracle mirroring the semantics.

The reference answers SQL over one segment (src/main.rs:186-195); real
Druid's primary API is these JSON specs. Every spec here compiles to a
declarative Catalyst plan (see native_query.py's scale notes); nothing
below runs Python per row.

Determinism: doubleSum aggregations accumulate in decimal(38,8) (see
_numeric_agg), so value hashes match DuckDB bit-for-bit regardless of
partitioning; every limit/topN cut orders by a UNIQUE key combination
(metric + dimension) so both engines cut identically."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..native_query import native_query
from . import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events")


@query(
    "nq_timeseries_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS "timestamp",
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*)
             AS avg_value
    FROM events
    WHERE event_type = 'click'
      AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
    GROUP BY 1
    """,
)
def nq_timeseries_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native timeseries: hourly rollup of click value inside an
    interval, with an arithmetic postAggregation."""
    spec = {
        "queryType": "timeseries",
        "granularity": "hour",
        "intervals": ["2024-01-05T00:00:00Z/2024-01-12T00:00:00Z"],
        "filter": {"type": "selector", "dimension": "event_type",
                   "value": "click"},
        "aggregations": [
            {"type": "count", "name": "n_rows"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
        "postAggregations": [
            {"type": "arithmetic", "name": "avg_value", "fn": "quotient",
             "fields": [{"type": "fieldAccess", "fieldName": "total"},
                        {"type": "fieldAccess", "fieldName": "n_rows"}]},
        ],
        # data buckets only here; the zero-filled default is its own
        # registry entry (nq_timeseries_zerofill) with a grid oracle
        "context": {"skipEmptyBuckets": True},
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_timeseries_zerofill",
    oracle="""
    WITH grid AS (
      SELECT ts AS "timestamp"
      FROM generate_series(TIMESTAMP '2024-01-05',
                           TIMESTAMP '2024-01-12' - INTERVAL 1 HOUR,
                           INTERVAL 1 HOUR) AS t(ts)),
    agg AS (
      SELECT date_trunc('hour', ts) AS h,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(38,8))) AS s
      FROM events
      WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
      GROUP BY 1)
    SELECT g."timestamp",
           COALESCE(a.n, 0) AS n_rows,
           CAST(COALESCE(a.s, 0) AS DOUBLE) AS total
    FROM grid g LEFT JOIN agg a ON a.h = g."timestamp"
    """,
)
def nq_timeseries_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native timeseries DEFAULT semantics: empty buckets inside
    the queried interval zero-fill (count and sums get their identity).
    The bucket grid is literal-built — bounded by bucket count, no
    second data scan."""
    spec = {
        "queryType": "timeseries",
        "granularity": "hour",
        "intervals": ["2024-01-05T00:00:00Z/2024-01-12T00:00:00Z"],
        "filter": {"type": "selector", "dimension": "event_type",
                   "value": "purchase"},
        "aggregations": [
            {"type": "count", "name": "n_rows"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_groupby_subtotals",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total
    FROM events
    GROUP BY GROUPING SETS ((day, event_type), (day), ())
    """,
)
def nq_groupby_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native groupBy subtotalsSpec == GROUPING SETS: detail rows
    per (day, event_type), per-day subtotals, and the grand total from
    ONE Expand pass — with a timeFormat extraction dimension."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "dimensions": [
            {"type": "extraction", "dimension": "ts", "outputName": "day",
             "extractionFn": {"type": "timeFormat", "format": "yyyy-MM-dd"}},
            "event_type",
        ],
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
        "subtotalsSpec": [["day", "event_type"], ["day"], []],
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_groupby_filtered_limit",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN value >= 100
                         THEN CAST(value AS DECIMAL(38,8)) END)
                AS DOUBLE) AS big_total,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY event_type
    HAVING COUNT(*) > 10
    ORDER BY n DESC, event_type ASC
    LIMIT 3
    """,
)
def nq_groupby_filtered_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native groupBy: filtered aggregator + exact cardinality +
    having + limitSpec with numeric ordering (cut is deterministic —
    the order columns (n desc, event_type asc) form a unique key)."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "dimensions": ["event_type"],
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "filtered",
             "filter": {"type": "bound", "dimension": "value",
                        "lower": "100", "ordering": "numeric"},
             "aggregator": {"type": "doubleSum", "name": "big_total",
                            "fieldName": "value"}},
            {"type": "cardinality", "name": "users",
             "fieldNames": ["user_id"]},
        ],
        "having": {"type": "greaterThan", "aggregation": "n", "value": 10},
        "limitSpec": {
            "type": "default", "limit": 3,
            "columns": [
                {"dimension": "n", "direction": "descending",
                 "dimensionOrder": {"type": "numeric"}},
                {"dimension": "event_type", "direction": "ascending"},
            ],
        },
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_topn_daily_revenue",
    oracle="""
    WITH a AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS "timestamp",
             event_type,
             CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase')
      GROUP BY 1, 2),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY "timestamp"
        ORDER BY total DESC, event_type ASC) AS rk
      FROM a)
    SELECT "timestamp", event_type, total FROM r WHERE rk <= 2
    """,
)
def nq_topn_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native topN: top-2 event types by exact-decimal value sum
    per day (ties break by dimension ascending, Druid's rule)."""
    spec = {
        "queryType": "topN",
        "granularity": "day",
        "dimension": "event_type",
        "metric": "total",
        "threshold": 2,
        "filter": {"type": "in", "dimension": "event_type",
                   "values": ["click", "view", "purchase"]},
        "aggregations": [
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_scan_filtered",
    oracle="""
    SELECT ts, event_type, value,
           CAST(floor(value / 100) AS BIGINT) AS value_bucket
    FROM events
    WHERE value >= 480
      AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
    """,
)
def nq_scan_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native scan with an expression virtualColumn: projected
    filtered row read (the unordered form — an ordered+limit scan's
    cut on non-unique timestamps is engine-dependent, pinned instead by
    tests/test_native_query.py on unique-time data)."""
    spec = {
        "queryType": "scan",
        "virtualColumns": [
            {"type": "expression", "name": "value_bucket",
             "expression": "CAST(floor(value / 100) AS BIGINT)"},
        ],
        "columns": ["ts", "event_type", "value", "value_bucket"],
        "intervals": ["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
        "filter": {"type": "bound", "dimension": "value", "lower": "480",
                   "ordering": "numeric"},
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_search_digits",
    oracle="""
    WITH pairs AS (
      SELECT 'event_type' AS dimension, event_type AS value FROM events
      UNION ALL
      SELECT 'props' AS dimension, props AS value FROM events)
    SELECT dimension, value, COUNT(*) AS n
    FROM pairs
    WHERE contains(lower(value), '2')
    GROUP BY dimension, value
    """,
)
def nq_search_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native search: case-insensitive substring match across two
    dimensions, returning per-value match counts from ONE scan."""
    spec = {
        "queryType": "search",
        "searchDimensions": ["event_type", "props"],
        "query": {"type": "insensitive_contains", "value": "2"},
    }
    out = native_query(_events(spark, sf_dir), spec, time_col="ts")
    return out.withColumnRenamed("count", "n")


@query(
    "nq_join_datasource",
    oracle="""
    WITH lut(etype, category) AS (VALUES
      ('click', 'engage'), ('view', 'engage'), ('purchase', 'convert'),
      ('signup', 'convert'), ('error', 'ops'))
    SELECT lut.category AS "l.category",
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total
    FROM events JOIN lut ON events.event_type = lut.etype
    GROUP BY 1
    """,
)
def nq_join_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native JOIN datasource: events joined to an inline
    category lookup, grouped by the prefixed right column (Druid's
    addressing contract). The inline side is tiny and broadcast by
    AQE — the only join shape Druid itself allows (right side must be
    broadcastable), so this plan is Druid's own, distributed."""
    spec = {
        "queryType": "groupBy",
        "dataSource": {
            "type": "join",
            "left": "events",
            "right": {
                "type": "inline",
                "columnNames": ["etype", "category"],
                "rows": [["click", "engage"], ["view", "engage"],
                         ["purchase", "convert"], ["signup", "convert"],
                         ["error", "ops"]],
            },
            "rightPrefix": "l.",
            "condition": '"event_type" == "l.etype"',
        },
        "granularity": "all",
        "dimensions": ["l.category"],
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
    }
    return native_query(
        None, spec, time_col="ts",
        tables={"events": _events(spark, sf_dir)},
    )


@query(
    "nq_ingest_spec_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
    GROUP BY event_type
    """,
)
def nq_ingest_spec_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full keep-your-specs lifecycle: a Druid index_parallel task JSON
    ingests events.parquet into REAL v9 segments (hourly rollup, day
    segmentGranularity), then the rollup re-aggregates per event_type
    from the stored metrics — and matches the direct aggregation over
    the raw parquet exactly.

    Exactness: values carry <= 2 fractional digits, so every stored
    per-(hour, type) doubleSum is an exact decimal; casting the stored
    double back to decimal(38,8) recovers it bit-exactly (double
    round-trip error ~1e-12 absolute, far under the 0.5e-8 rounding
    step), so the sum of stored metrics equals DuckDB's direct decimal
    sum. Segments cache under /tmp with the standard source
    fingerprint discipline (druid_source._cached_build)."""
    import os

    from ..ingestion_spec import ingest
    from .druid_source import _cached_build, _ensure_registered, _segment_root

    root = _segment_root(sf_dir, "ingest_spec")
    spec = {
        "type": "index_parallel",
        "spec": {
            "dataSchema": {
                "dataSource": "events_rollup",
                "timestampSpec": {"column": "ts", "format": "auto"},
                "dimensionsSpec": {"dimensions": ["event_type"]},
                "transformSpec": {
                    "filter": {"type": "in", "dimension": "event_type",
                               "values": ["click", "view", "purchase"]},
                },
                "metricsSpec": [
                    {"type": "count", "name": "n"},
                    {"type": "doubleSum", "name": "total",
                     "fieldName": "value"},
                ],
                "granularitySpec": {"segmentGranularity": "day",
                                    "queryGranularity": "hour",
                                    "rollup": True},
            },
            "ioConfig": {
                "inputSource": {"type": "local", "baseDir": sf_dir,
                                "filter": "events.parquet"},
                "inputFormat": {"type": "parquet"},
            },
        },
    }
    _ensure_registered(spark)
    _cached_build(
        root, sf_dir, "events",
        lambda: ingest(spark, spec, root).collect(),
    )
    segs = (
        spark.read.format("druidsegment")
        .option("path", os.path.join(root, "events_rollup"))
        .load()
    )
    return segs.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.sum(F.col("total").cast("decimal(38,8)")).cast("double").alias(
            "total"
        ),
    )


@query(
    "nq_time_boundary",
    oracle="""
    SELECT MIN(ts) AS minTime, MAX(ts) AS maxTime
    FROM events WHERE event_type = 'signup'
    """,
)
def nq_time_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native timeBoundary under a filter."""
    spec = {
        "queryType": "timeBoundary",
        "filter": {"type": "selector", "dimension": "event_type",
                   "value": "signup"},
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_period_granularity_tz",
    oracle="""
    SELECT CAST((date_trunc('day',
             (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/Los_Angeles')
             AT TIME ZONE 'America/Los_Angeles') AT TIME ZONE 'UTC'
             AS TIMESTAMP) AS "timestamp",
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total
    FROM events GROUP BY 1
    """,
)
def nq_period_granularity_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid period granularity with a timeZone (granularities.md):
    daily buckets on America/Los_Angeles's LOCAL chronology — each
    bucket starts at LA midnight (08:00 UTC in winter, 07:00 in
    summer), returned as the UTC instant of that boundary, exactly as
    real Druid reports tz-bucketed timeseries. The oracle mirrors the
    round trip with DuckDB's AT TIME ZONE chain."""
    spec = {
        "queryType": "timeseries",
        "granularity": {"type": "period", "period": "P1D",
                        "timeZone": "America/Los_Angeles"},
        "aggregations": [
            {"type": "count", "name": "n_rows"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
        "context": {"skipEmptyBuckets": True},
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_union_datasource",
    oracle="""
    WITH unioned AS (
      SELECT event_type, value FROM events WHERE user_id % 2 = 0
      UNION ALL
      SELECT event_type, value FROM events WHERE user_id % 2 = 1)
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total
    FROM unioned GROUP BY event_type
    """,
)
def nq_union_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native UNION datasource (datasource.md): one query over
    several same-schema tables — the per-tenant / per-region datasource
    layout. Members resolve from the table map and append with
    unionByName; Spark plans one scan per member with the groupBy's
    partial aggregation pushed below the union, so the shape stays a
    single shuffle at any member count."""
    ev = _events(spark, sf_dir)
    spec = {
        "queryType": "groupBy",
        "dataSource": {"type": "union",
                       "dataSources": ["events_even", "events_odd"]},
        "granularity": "all",
        "dimensions": ["event_type"],
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
    }
    return native_query(
        None, spec, time_col="ts",
        tables={
            "events_even": ev.filter(F.col("user_id") % 2 == 0),
            "events_odd": ev.filter(F.col("user_id") % 2 == 1),
        },
    )


@query(
    "nq_datasource_metadata",
    oracle="""
    SELECT MAX(ts) AS maxIngestedEventTime FROM events
    """,
)
def nq_datasource_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native dataSourceMetadata query
    (querying/datasourcemetadataquery.md): the latest ingested event
    time for a datasource — what ingestion monitors poll to confirm a
    stream is advancing. One MAX aggregate; no scan wider than the
    time column after pruning."""
    spec = {"queryType": "dataSourceMetadata"}
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_groupby_having_subtotals_limit",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(user_id % 3 AS VARCHAR) AS lvl,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
      UNION ALL
      SELECT event_type, CAST(NULL AS VARCHAR), COUNT(*)
      FROM events GROUP BY 1
      UNION ALL
      SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), COUNT(*)
      FROM events HAVING COUNT(*) > 0
    )
    SELECT event_type, lvl, n FROM g
    WHERE n > 600 OR lvl = '0'
    ORDER BY n DESC, event_type ASC NULLS FIRST, lvl ASC NULLS FIRST
    LIMIT 8
    """,
)
def nq_groupby_having_subtotals_limit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full native groupBy post-aggregation pipeline COMPOSED —
    subtotalsSpec (grouping sets over an expression virtualColumn
    dimension), then a compound having tree over the subtotal rows,
    then a DefaultLimitSpec ordered cut — in one spec, the order Druid
    applies them. The r9 hypothesis fuzz walks this composition over
    random specs; this row is its driver-visible witness. The oracle
    renders the subtotals as per-set UNION ALL (the grand-total set
    guards HAVING COUNT(*) > 0: Druid and Spark return ZERO rows for
    a groupBy over no rows where standard SQL's () set yields one) and
    the limit cut is deterministic — the order columns plus dims form
    a unique key across subtotal rows."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "virtualColumns": [
            {"type": "expression", "name": "lvl",
             "expression": "CAST(user_id % 3 AS STRING)"},
        ],
        "dimensions": ["event_type", "lvl"],
        "aggregations": [{"type": "count", "name": "n"}],
        "subtotalsSpec": [["event_type", "lvl"], ["event_type"], []],
        "having": {"type": "or", "havingSpecs": [
            {"type": "greaterThan", "aggregation": "n", "value": 600},
            {"type": "dimSelector", "dimension": "lvl", "value": "0"},
        ]},
        "limitSpec": {
            "type": "default", "limit": 8,
            "columns": [
                {"dimension": "n", "direction": "descending",
                 "dimensionOrder": {"type": "numeric"}},
                {"dimension": "event_type", "direction": "ascending"},
                {"dimension": "lvl", "direction": "ascending"},
            ],
        },
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_unnest_datasource",
    oracle="""
    SELECT tag,
           COUNT(*) AS n,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')[1:3]) AS tag
          FROM documents)
    WHERE tag IN ('spark', 'scan', 'join', 'table')
    GROUP BY tag
    """,
)
def nq_unnest_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native UNNEST datasource (datasource.md's 6th form, Druid
    26+): the multi-value ``tags`` dimension of a REAL v9 segment root
    explodes one row per element under the virtualColumn's output name,
    the ``unnestFilter`` keeps only the probed tags, and the outer
    groupBy counts rows and distinct docs per tag. Compiles to one
    narrow Generate over the segment scan feeding a single hash
    aggregate — no shuffle before the explode, no Python anywhere. The
    SQL twin (fd_unnest, r6) fixed the semantics; this is the native
    JSON entry a Druid-26 array user POSTs."""
    from .druid_source import _ensure_mvd_segments

    root = _ensure_mvd_segments(spark, sf_dir)
    mvd = spark.read.format("druidsegment").option("path", root).load()
    spec = {
        "queryType": "groupBy",
        "dataSource": {
            "type": "unnest",
            "base": "documents_mvd",
            "virtualColumn": {"type": "expression", "name": "tag",
                              "expression": '"tags"'},
            "unnestFilter": {"type": "in", "dimension": "tag",
                             "values": ["spark", "scan", "join", "table"]},
        },
        "granularity": "all",
        "dimensions": ["tag"],
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "cardinality", "name": "n_docs",
             "fields": ["doc_id"]},
        ],
    }
    return native_query(
        None, spec, time_col="__time", tables={"documents_mvd": mvd}
    )


@query(
    "nq_lookup_datasource",
    oracle="""
    WITH lut(k, v) AS (VALUES
      ('click', 'engage'), ('view', 'engage'), ('purchase', 'convert'),
      ('signup', 'convert'), ('error', 'ops'))
    SELECT lut.v AS "l.v",
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total
    FROM events JOIN lut ON events.event_type = lut.k
    GROUP BY 1
    """,
)
def nq_lookup_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid native LOOKUP datasource as a join right side: the managed
    lookup surfaces as Druid's fixed (k, v) two-column relation and the
    groupBy addresses the joined value through the rightPrefix. The
    lookup map is heap-resident by Druid's own contract (lookups load
    whole onto every historical), so building it driver-side and
    letting AQE broadcast the 5-row side is the reference plan at any
    scale. The broker path resolves the same form against its managed
    lookup store with the lookup VERSION in the result-cache key."""
    lut = {"click": "engage", "view": "engage", "purchase": "convert",
           "signup": "convert", "error": "ops"}
    spec = {
        "queryType": "groupBy",
        "dataSource": {
            "type": "join",
            "left": "events",
            "right": {"type": "lookup", "lookup": "event_category"},
            "rightPrefix": "l.",
            "condition": '"event_type" == "l.k"',
        },
        "granularity": "all",
        "dimensions": ["l.v"],
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
    }
    return native_query(
        None, spec, time_col="ts",
        tables={"events": _events(spark, sf_dir)},
        lookups={"event_category": lut},
    )


@query(
    "nq_timeseries_grand_total",
    oracle="""
    WITH f AS (
      SELECT ts, CAST(value AS DECIMAL(38,8)) AS v FROM events
      WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12')
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS "timestamp",
           COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS total
    FROM f GROUP BY 1
    UNION ALL
    SELECT NULL, COUNT(*), CAST(SUM(v) AS DOUBLE) FROM f
    """,
)
def nq_timeseries_grand_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's timeseries context.grandTotal (timeseries.md): the
    per-day buckets PLUS one final timestamp-null row aggregating the
    whole queried span. The grand total re-aggregates the filtered base
    at 'all' granularity (lawful for every aggregator where merging
    bucket outputs is not, e.g. count_distinct) and Catalyst reuses the
    scan across the two aggregates; row ORDER (grand total last, also
    under descending) is pinned by tests/test_native_query.py — the
    driver's hash compare is order-insensitive."""
    spec = {
        "queryType": "timeseries",
        "granularity": "day",
        "intervals": ["2024-01-05T00:00:00Z/2024-01-12T00:00:00Z"],
        "filter": {"type": "selector", "dimension": "event_type",
                   "value": "purchase"},
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
        "context": {"skipEmptyBuckets": True, "grandTotal": True},
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_expression_filter_family",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total
    FROM events
    WHERE value > 100 AND user_id % 2 = 0
      AND list_contains(string_split(props, ':'), '{"k"')
    GROUP BY event_type
    """,
)
def nq_expression_filter_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 native filter kinds composed in one spec: an expression
    filter (boolean Druid expression over quoted identifiers), a
    columnComparison (null-safe equality of a dimension against a
    virtualColumn of itself — always true, pinning the compile path on
    real data), and arrayContainsElement over a split virtualColumn
    (every events.props is '{"k": N}', so splitting on ':' yields
    '{"k"' as the first element — the filter proves arrays flow
    through). All three compile into ONE Catalyst predicate evaluated
    inside the scan stage."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "virtualColumns": [
            {"type": "expression", "name": "etype_copy",
             "expression": '"event_type"'},
            {"type": "expression", "name": "props_toks",
             "expression": "split(\"props\", ':')"},
        ],
        "dimensions": ["event_type"],
        "filter": {"type": "and", "fields": [
            {"type": "expression",
             "expression": '"value" > 100 AND "user_id" % 2 = 0'},
            {"type": "columnComparison",
             "dimensions": ["event_type", "etype_copy"]},
            {"type": "arrayContainsElement", "column": "props_toks",
             "elementMatchValueType": "STRING",
             "elementMatchValue": '{"k"'},
        ]},
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_sketch_aggregators",
    oracle="""
    WITH b AS (
      SELECT event_type, user_id, value,
             LEAST(GREATEST(CAST(FLOOR(value / 100.0) AS BIGINT), 0), 5)
               AS pos
      FROM events)
    SELECT event_type,
           COUNT(value) AS vsketch,
           COUNT(DISTINCT user_id) AS hll_users,
           array_to_string([
             COUNT(*) FILTER (WHERE value IS NOT NULL AND pos = 0),
             COUNT(*) FILTER (WHERE value IS NOT NULL AND pos = 1),
             COUNT(*) FILTER (WHERE value IS NOT NULL AND pos = 2),
             COUNT(*) FILTER (WHERE value IS NOT NULL AND pos = 3),
             COUNT(*) FILTER (WHERE value IS NOT NULL AND pos = 4),
             COUNT(*) FILTER (WHERE value IS NOT NULL AND pos = 5)
           ], ',') AS vhist,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.25) AS q25,
           quantile_cont(value, 0.9) AS q90,
           array_to_string([
             COUNT(*) FILTER (WHERE value < 100),
             COUNT(*) FILTER (WHERE value >= 100 AND value < 300),
             COUNT(*) FILTER (WHERE value >= 300)
           ], ',') AS hist3,
           AVG(CASE WHEN value < 250 THEN 1.0
                    WHEN value >= 250 THEN 0.0 END) AS rank250,
           COUNT(DISTINCT user_id) AS users_est
    FROM b GROUP BY event_type
    """,
)
def nq_sketch_aggregators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch aggregator specs Druid's console emits
    (datasketches-quantiles.md / datasketches-hll.md /
    fixed-buckets-histogram.md) in ONE native groupBy:
    quantilesDoublesSketch (finalizes to the stream length) with all
    four consumer post-aggregators (ToQuantile / ToQuantiles /
    ToHistogram / ToRank — each compiled to an exact aggregate in the
    SAME single groupBy pass, one shuffle total), HLLSketchBuild with a
    rounded HLLSketchEstimate, and a clip-mode fixedBucketsHistogram
    (6 x 100-wide buckets over value). Arrays are serialized for the
    driver's canonicalizer (integer counts via array_join — exact;
    the ToQuantiles doubles surface as scalar columns)."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "dimensions": ["event_type"],
        "aggregations": [
            {"type": "quantilesDoublesSketch", "name": "vsketch",
             "fieldName": "value", "k": 128},
            {"type": "HLLSketchBuild", "name": "hll_users",
             "fieldName": "user_id"},
            {"type": "fixedBucketsHistogram", "name": "vhist",
             "fieldName": "value", "lowerLimit": 0, "upperLimit": 600,
             "numBuckets": 6, "outlierHandlingMode": "clip"},
        ],
        "postAggregations": [
            {"type": "quantilesDoublesSketchToQuantile", "name": "p50",
             "field": {"type": "fieldAccess", "fieldName": "vsketch"},
             "fraction": 0.5},
            {"type": "quantilesDoublesSketchToQuantiles", "name": "q_arr",
             "field": {"type": "fieldAccess", "fieldName": "vsketch"},
             "fractions": [0.25, 0.9]},
            {"type": "quantilesDoublesSketchToHistogram", "name": "hist3",
             "field": {"type": "fieldAccess", "fieldName": "vsketch"},
             "splitPoints": [100, 300]},
            {"type": "quantilesDoublesSketchToRank", "name": "rank250",
             "field": {"type": "fieldAccess", "fieldName": "vsketch"},
             "value": 250},
            {"type": "HLLSketchEstimate", "name": "users_est",
             "field": {"type": "fieldAccess", "fieldName": "hll_users"},
             "round": True},
        ],
    }
    out = native_query(_events(spark, sf_dir), spec, time_col="ts")
    join_longs = lambda c: F.array_join(  # noqa: E731
        F.transform(F.col(c), lambda x: x.cast("long").cast("string")), ","
    )
    return out.select(
        "event_type", "vsketch", "hll_users",
        join_longs("vhist").alias("vhist"),
        "p50",
        F.col("q_arr")[0].alias("q25"),
        F.col("q_arr")[1].alias("q90"),
        join_longs("hist3").alias("hist3"),
        "rank250", "users_est",
    )


@query(
    "nq_extraction_cascade",
    oracle="""
    SELECT '<' || substr(upper(event_type), 1, 2) || '>' AS etype_fmt,
           CAST(FLOOR((value - 10) / 50) * 50 + 10 AS VARCHAR) AS vbucket,
           strftime(ts, '%Y-%m') AS month_label,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def nq_extraction_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r11 extractionFn tail composed over real dimensions
    (dimensionspecs.md): a cascade folding upper -> substring ->
    stringFormat on event_type, a numeric bucket (size 50, offset 10)
    on value, and a cascade round-tripping the timestamp through a
    foreign rendering (timeFormat dd/MM/yyyy, then the `time` parsing
    fn re-rendering yyyy-MM). Every extraction is a Column composition
    inside the scan's own project — the groupBy still shuffles once on
    the extracted keys."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "dimensions": [
            {"type": "extraction", "dimension": "event_type",
             "outputName": "etype_fmt",
             "extractionFn": {"type": "cascade", "extractionFns": [
                 {"type": "upper"},
                 {"type": "substring", "index": 0, "length": 2},
                 {"type": "stringFormat", "format": "<%s>"},
             ]}},
            {"type": "extraction", "dimension": "value",
             "outputName": "vbucket",
             "extractionFn": {"type": "bucket", "size": 50,
                              "offset": 10}},
            {"type": "extraction", "dimension": "ts",
             "outputName": "month_label",
             "extractionFn": {"type": "cascade", "extractionFns": [
                 {"type": "timeFormat", "format": "dd/MM/yyyy"},
                 {"type": "time", "timeFormat": "dd/MM/yyyy",
                  "resultFormat": "yyyy-MM"},
             ]}},
        ],
        "aggregations": [{"type": "count", "name": "n"}],
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_grouping_aggregator",
    oracle="""
    SELECT event_type,
           CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
           COUNT(*) AS n,
           CAST(GROUPING(event_type) * 2 + GROUPING(
             CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END)
             AS BIGINT) AS g
    FROM events
    GROUP BY GROUPING SETS ((1, 2), (1), ())
    """,
)
def nq_grouping_aggregator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `grouping` aggregator (aggregations.md) over a
    subtotalsSpec: per-grouping-set bitmask, MSB-first over the listed
    dimensions, 1 = not grouped — exactly SQL GROUPING_ID, which is
    what the oracle computes. The mask disambiguates a genuinely-NULL
    dimension value from a subtotal row, which is the aggregator's
    whole purpose. Compiles into the SAME single Expand pass as the
    grouping sets (F.grouping over the set keys; no extra shuffle)."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "virtualColumns": [
            {"type": "expression", "name": "parity",
             "expression": "CASE WHEN \"user_id\" % 2 = 0 "
                           "THEN 'even' ELSE 'odd' END"},
        ],
        "dimensions": ["event_type", "parity"],
        "subtotalsSpec": [["event_type", "parity"], ["event_type"], []],
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "grouping", "name": "g",
             "groupings": ["event_type", "parity"]},
        ],
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_spatial_filter",
    oracle="""
    WITH c AS (
      SELECT user_id % 50 AS x,
             CAST(FLOOR(value) AS BIGINT) % 50 AS y
      FROM events)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE x BETWEEN 5 AND 20
                                   AND y BETWEEN 10 AND 30) AS BIGINT)
             AS n_rect,
           CAST(COUNT(*) FILTER (WHERE (x-25)*(x-25) + (y-25)*(y-25)
                                       <= 100) AS BIGINT) AS n_radius,
           CAST(COUNT(*) FILTER (WHERE x >= 1 AND y >= 1
                                   AND x + y <= 41) AS BIGINT) AS n_poly
    FROM c
    """,
)
def nq_spatial_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spatial filter family (development/geo.md) over a
    coordinate virtualColumn ("x,y" strings, Druid's ingest-time
    spatial-dimension encoding): one filtered aggregator per bound —
    rectangular (inclusive), radius (euclidean), and a ray-cast
    polygon whose half-open vertices (0.5-shifted) keep every lattice
    point strictly off the edges, so the oracle reduces each bound to
    integer arithmetic. All three compile into ONE aggregation pass
    (filtered aggregators share the scan); the coordinate parse is
    try-cast column arithmetic inside codegen — no UDF, unparsable
    coordinates never match."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "dimensions": [],
        "virtualColumns": [
            {"type": "expression", "name": "loc",
             "expression": 'concat(CAST("user_id" % 50 AS STRING), '
                           "',', "
                           'CAST(CAST(FLOOR("value") AS BIGINT) % 50 '
                           "AS STRING))"},
        ],
        "aggregations": [
            {"type": "count", "name": "n_total"},
            {"type": "filtered",
             "filter": {"type": "spatial", "dimension": "loc",
                        "bound": {"type": "rectangular",
                                  "minCoords": [5, 10],
                                  "maxCoords": [20, 30]}},
             "aggregator": {"type": "count", "name": "n_rect"}},
            {"type": "filtered",
             "filter": {"type": "spatial", "dimension": "loc",
                        "bound": {"type": "radius",
                                  "coords": [25, 25], "radius": 10}},
             "aggregator": {"type": "count", "name": "n_radius"}},
            {"type": "filtered",
             "filter": {"type": "spatial", "dimension": "loc",
                        "bound": {"type": "polygon",
                                  "abscissa": [0.5, 41, 0.5],
                                  "ordinate": [0.5, 0.5, 41]}},
             "aggregator": {"type": "count", "name": "n_poly"}},
        ],
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_nested_field_vc",
    oracle="""
    WITH k AS (
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv,
             value
      FROM events)
    SELECT kv % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS total,
           MAX(kv) AS max_k
    FROM k WHERE kv >= 5 GROUP BY 1
    """,
)
def nq_nested_field_vc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nested-field virtualColumn (nested-columns.md — the form
    Druid's console emits for JSON columns): JSONPath extraction from
    the events props payload with expectedType LONG coercion, used as
    a FILTER, a grouping expression (via a second expression vc over
    it), and an aggregate input — proving the extracted column behaves
    like any other. The extraction is one get_json_object in the
    scan's project; unparsable values go NULL (try_cast), never
    error."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "virtualColumns": [
            {"type": "nested-field", "name": "kv",
             "columnName": "props", "path": "$.k",
             "expectedType": "LONG"},
            {"type": "expression", "name": "k_mod",
             "expression": '"kv" % 10'},
        ],
        "dimensions": ["k_mod"],
        "filter": {"type": "bound", "dimension": "kv", "lower": "5",
                   "ordering": "numeric"},
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
            {"type": "longMax", "name": "max_k", "fieldName": "kv"},
        ],
    }
    return native_query(_events(spark, sf_dir), spec, time_col="ts")


@query(
    "nq_sketch_tocdf",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(value) AS vs,
           AVG(CASE WHEN value < 100 THEN 1.0
                    WHEN value >= 100 THEN 0.0 END) AS cdf100,
           AVG(CASE WHEN value < 250 THEN 1.0
                    WHEN value >= 250 THEN 0.0 END) AS cdf250,
           AVG(CASE WHEN value < 400 THEN 1.0
                    WHEN value >= 400 THEN 0.0 END) AS cdf400,
           CAST(1.0 AS DOUBLE) AS cdf_end,
           CAST(COUNT(*) AS DOUBLE) / 2 AS half_n,
           printf('### ExactQuantilesSketch SUMMARY: n=%d, min=%s, max=%s',
                  COUNT(value),
                  CAST(CAST(MIN(value) AS DECIMAL(38,6)) AS VARCHAR),
                  CAST(CAST(MAX(value) AS DECIMAL(38,6)) AS VARCHAR))
             AS summ
    FROM events GROUP BY event_type
    """,
)
def nq_sketch_tocdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 sketch-consumer tail (datasketches-quantiles.md):
    quantilesDoublesSketchToCDF (strictly-below ranks at each split
    point plus the closing 1.0 — the cumulative variant of
    ToHistogram's count ladder) and quantilesDoublesSketchToString
    (the exact-upgrade summary string: n/min/max at decimal(38,6),
    replacing the DataSketches debug dump with a deterministic exact
    rendering). The postAggregations deliberately INTERLEAVE an
    arithmetic post-agg between the two consumers to pin the
    spec-order output contract (_postagg_ordered — ADVICE r11 #2):
    result columns follow the listed post-agg order cdf, half_n, summ
    even though consumers compile into the groupBy pass itself. One
    shuffle total; CDF doubles surface as scalar columns for the
    driver's canonicalizer."""
    spec = {
        "queryType": "groupBy",
        "granularity": "all",
        "dimensions": ["event_type"],
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "quantilesDoublesSketch", "name": "vs",
             "fieldName": "value", "k": 128},
        ],
        "postAggregations": [
            {"type": "quantilesDoublesSketchToCDF", "name": "cdf",
             "field": {"type": "fieldAccess", "fieldName": "vs"},
             "splitPoints": [100, 250, 400]},
            {"type": "arithmetic", "name": "half_n", "fn": "/",
             "fields": [
                 {"type": "fieldAccess", "fieldName": "n"},
                 {"type": "constant", "value": 2},
             ]},
            {"type": "quantilesDoublesSketchToString", "name": "summ",
             "field": {"type": "fieldAccess", "fieldName": "vs"}},
        ],
    }
    out = native_query(_events(spark, sf_dir), spec, time_col="ts")
    assert out.columns == [
        "event_type", "n", "vs", "cdf", "half_n", "summ",
    ], out.columns  # the spec-order contract this query exists to pin
    return out.select(
        "event_type", "n", "vs",
        F.col("cdf")[0].alias("cdf100"),
        F.col("cdf")[1].alias("cdf250"),
        F.col("cdf")[2].alias("cdf400"),
        F.col("cdf")[3].alias("cdf_end"),
        "half_n", "summ",
    )


@query(
    "nq_window_operator",
    oracle="""
    WITH f AS (SELECT * FROM events WHERE user_id < 20)
    SELECT event_type, event_id, user_id, value,
           ROW_NUMBER() OVER ws AS rn,
           RANK() OVER wv AS rk,
           PERCENT_RANK() OVER wv AS prk,
           LAG(value, 1) OVER ws AS prev_v,
           FIRST_VALUE(value) OVER wfull AS top_v,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) OVER wcum AS DOUBLE)
             AS run_total,
           COUNT(*) OVER (PARTITION BY event_type) AS n_part
    FROM f
    WINDOW
      ws AS (PARTITION BY event_type
             ORDER BY value DESC, event_id ASC),
      wv AS (PARTITION BY event_type ORDER BY value DESC),
      wfull AS (PARTITION BY event_type
                ORDER BY value DESC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING),
      wcum AS (PARTITION BY event_type
               ORDER BY value DESC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def nq_window_operator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 native windowOperatorQuery (window-functions.md — the
    JSON the Druid SQL planner emits for window functions; the last
    queryType-shaped surface): naivePartition on event_type, naiveSort
    by value DESC with the unique event_id tiebreaker (rn/lag are
    order-determined, so the sort must totally order each partition
    for cross-engine determinism), then one window operator carrying
    the common processor set — rowNumber, rank and percent-rank over
    the value peer group, lag via the offset processor, first,
    a cumulative ROWS framedAgg (decimal-accumulated doubleSum), and a
    whole-partition count via the aggregate processor. Compiles to
    Spark native Window: ONE shuffle on event_type, every processor
    rides the same sorted exchange (no per-processor exchange —
    plan-pinned in tests/test_plans.py)."""
    spec = {
        "queryType": "windowOperatorQuery",
        "filter": {"type": "expression",
                   "expression": '"user_id" < 20'},
        "operators": [
            {"type": "naivePartition",
             "partitionColumns": ["event_type"]},
            {"type": "naiveSort", "columns": [
                {"column": "event_type", "direction": "ASC"},
                {"column": "value", "direction": "DESC"},
                {"column": "event_id", "direction": "ASC"},
            ]},
            {"type": "window", "processors": [
                {"type": "rowNumber", "outputColumn": "rn"},
                {"type": "rank", "group": ["value"],
                 "outputColumn": "rk"},
                {"type": "rank", "group": ["value"], "asPercent": True,
                 "outputColumn": "prk"},
                {"type": "offset", "inputColumn": "value",
                 "outputColumn": "prev_v", "offset": -1},
                {"type": "first", "inputColumn": "value",
                 "outputColumn": "top_v"},
                {"type": "framedAgg",
                 "frame": {"peerType": "ROWS", "lowerUnbounded": True,
                           "upperOffset": 0},
                 "aggregations": [
                     {"type": "doubleSum", "name": "run_total",
                      "fieldName": "value"}]},
                {"type": "aggregate", "aggregations": [
                    {"type": "count", "name": "n_part"}]},
            ]},
        ],
    }
    out = native_query(_events(spark, sf_dir), spec, time_col="ts")
    return out.select(
        "event_type", "event_id", "user_id", "value",
        "rn", "rk", "prk", "prev_v", "top_v", "run_total", "n_part",
    )
