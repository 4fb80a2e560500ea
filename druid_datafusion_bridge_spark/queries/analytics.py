"""Sessionized-workload analytics: ordered funnels and retention
cohorts — the two classic Druid event-analytics workloads (beyond the
reference's surface, which delegates all SQL and ships no event
analytics; delegation point `/root/reference/src/main.rs:186-195`).

Both are pure built-in compositions:
- the funnel is three filtered scans joined on the user key (each
  filter pushed to the parquet scan; every join and aggregate keys on
  the high-cardinality skew-free user_id);
- retention is one user-keyed first-seen aggregate joined back to the
  event stream, then a distinct + count on (cohort, offset).
Lag averages are computed as exact long microsecond sums with a single
final division, so results are bit-identical to the DuckDB oracle
(a distributed double sum would not be order-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query


def _funnel_level(
    df: DataFrame, step: int, name: str, a: str, b: str | None
) -> DataFrame:
    """One funnel step's summary row: user count plus mean lag from the
    previous step's timestamp (NULL for the entry step). Shared by both
    funnel variants so the lag arithmetic can't drift between them."""
    lag = (
        (F.sum(F.unix_micros(F.col(a)) - F.unix_micros(F.col(b)))
         .cast("double") / F.count("*"))
        if b is not None
        else F.lit(None).cast("double")
    )
    return df.agg(
        F.lit(step).cast("int").alias("step"),
        F.lit(name).alias("step_name"),
        F.count("*").alias("n_users"),
        lag.alias("avg_lag_us"),
    )


@query(
    "an_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3, min(c.t2) AS t2
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id)
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS step_name,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(NULL AS DOUBLE) AS avg_lag_us
      FROM v
      UNION ALL
      SELECT 2, 'view>click', CAST(count(*) AS BIGINT),
             CAST(SUM(epoch_us(t2) - epoch_us(t1)) AS DOUBLE) / count(*)
      FROM c
      UNION ALL
      SELECT 3, 'view>click>purchase', CAST(count(*) AS BIGINT),
             CAST(SUM(epoch_us(t3) - epoch_us(t2)) AS DOUBLE) / count(*)
      FROM p)
    ORDER BY step
    """,
)
def an_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel view -> click -> purchase: users
    counted at each step only if the step's FIRST qualifying event
    strictly follows the previous step's, plus the average conversion
    lag in microseconds (exact long sum, one final division)."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t2").alias("t2"))
    )

    return (
        _funnel_level(v, 1, "view", "t1", None)
        .unionByName(_funnel_level(c, 2, "view>click", "t2", "t1"))
        .unionByName(_funnel_level(p, 3, "view>click>purchase", "t3", "t2"))
        .orderBy("step")
    )


@query(
    "an_retention_cohorts",
    oracle="""
    WITH fs AS (
      SELECT user_id,
             CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS cohort_day
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT e.user_id, fs.cohort_day,
             date_diff('day', fs.cohort_day,
                       CAST(date_trunc('day', e.ts) AS TIMESTAMP))
               AS day_offset
      FROM events e JOIN fs ON e.user_id = fs.user_id)
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM act WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def an_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users cohorted by first-seen day, then
    counted as active per (cohort, day-offset) for the first week —
    Druid's canonical retention query, expressed as first-seen agg +
    user-keyed join-back + distinct count."""
    ev = table(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    act = (
        ev.join(fs, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
    )
    return (
        act.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "an_funnel_windowed",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 72 HOUR
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3, min(c.t2) AS t2
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 72 HOUR
      GROUP BY e.user_id)
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS step_name,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(NULL AS DOUBLE) AS avg_lag_us
      FROM v
      UNION ALL
      SELECT 2, 'view>click<=72h', CAST(count(*) AS BIGINT),
             CAST(SUM(epoch_us(t2) - epoch_us(t1)) AS DOUBLE) / count(*)
      FROM c
      UNION ALL
      SELECT 3, 'view>click>purchase<=72h', CAST(count(*) AS BIGINT),
             CAST(SUM(epoch_us(t3) - epoch_us(t2)) AS DOUBLE) / count(*)
      FROM p)
    ORDER BY step
    """,
)
def an_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel (the Amplitude/Mixpanel semantics Druid
    deployments build on top of its event rollups): each step counts
    only if its first qualifying event falls within 72 hours of the
    previous step's. Identical plan shape to an_funnel_steps — three
    pushed-filter scans joined on the skew-free user key — the window
    is one extra predicate per level, evaluated inside the same join
    filter (no new exchange)."""
    ev = table(spark, sf_dir, "events")
    win = F.expr("INTERVAL 72 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t2").alias("t2"))
    )

    return (
        _funnel_level(v, 1, "view", "t1", None)
        .unionByName(_funnel_level(c, 2, "view>click<=72h", "t2", "t1"))
        .unionByName(_funnel_level(p, 3, "view>click>purchase<=72h", "t3", "t2"))
        .orderBy("step")
    )


@query(
    "an_anomaly_zscore",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(38,4))) * 10000 AS BIGINT) AS vu
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    s AS (
      SELECT event_type, count(*) AS nb,
             SUM(vu) AS sv, SUM(vu * vu) AS ssv
      FROM b GROUP BY event_type),
    z AS (
      SELECT b.event_type, b.bucket, b.vu,
             (CAST(b.vu AS DOUBLE) - CAST(s.sv AS DOUBLE) / s.nb)
               / sqrt(greatest(
                   (CAST(s.ssv AS DOUBLE)
                    - (CAST(s.sv AS DOUBLE) * CAST(s.sv AS DOUBLE)) / s.nb)
                   / s.nb,
                   CAST(0 AS DOUBLE))) AS zscore
      FROM b JOIN s ON b.event_type = s.event_type
      WHERE s.nb > 1)
    SELECT event_type, bucket, CAST(vu AS DOUBLE) / 10000 AS bucket_value,
           zscore
    FROM z WHERE abs(zscore) > 2
    """,
)
def an_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket anomaly detection: hourly value totals per event
    type whose population z-score exceeds |2|.

    Exactness contract: per-bucket totals accumulate as DECIMAL(38,4)
    (order-independent) and convert to integer 1e-4 units, so the
    mean/variance inputs are exact int64 sums and every double op after
    them (div, mul, sub, sqrt) is correctly-rounded IEEE — bit-identical
    to the DuckDB oracle with the same expression shape. Range contract:
    unit totals < ~3e9 keep squares and their int64 sums exact (holds
    through sf1; widen to DECIMAL(38,0) beyond).

    Scale shape: map-side-combined (type, hour) rollup -> tiny per-type
    stats table (one row per event type) joined back broadcast — no
    window over the full bucket stream, no global sort.
    """
    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            (F.sum(F.col("value").cast("decimal(38,4)")) * 10000)
            .cast("bigint")
            .alias("vu")
        )
    )
    s = b.groupBy("event_type").agg(
        F.count("*").alias("nb"),
        F.sum("vu").alias("sv"),
        F.sum(F.col("vu") * F.col("vu")).alias("ssv"),
    )
    mean = F.col("sv").cast("double") / F.col("nb")
    var = (
        F.col("ssv").cast("double")
        - (F.col("sv").cast("double") * F.col("sv").cast("double")) / F.col("nb")
    ) / F.col("nb")
    zscore = (F.col("vu").cast("double") - mean) / F.sqrt(
        F.greatest(var, F.lit(0.0))
    )
    return (
        b.join(F.broadcast(s.filter(F.col("nb") > 1)), "event_type")
        .select(
            "event_type",
            "bucket",
            (F.col("vu").cast("double") / 10000).alias("bucket_value"),
            zscore.alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 2)
    )


@query(
    "an_weighted_moving_avg",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(38,4))) * 10000 AS BIGINT) AS vu
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    l AS (
      SELECT event_type, bucket, vu,
             lag(vu, 1) OVER w AS x1,
             lag(vu, 2) OVER w AS x2,
             lag(vu, 3) OVER w AS x3
      FROM b
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
    SELECT event_type, bucket,
           CAST(vu AS DOUBLE) / 10000 AS bucket_value,
           CAST(4 * vu + 3 * COALESCE(x1, 0)
                + 2 * COALESCE(x2, 0) + 1 * COALESCE(x3, 0) AS DOUBLE)
             / ((4 + CASE WHEN x1 IS NULL THEN 0 ELSE 3 END
                   + CASE WHEN x2 IS NULL THEN 0 ELSE 2 END
                   + CASE WHEN x3 IS NULL THEN 0 ELSE 1 END) * 10000) AS wma
    FROM l
    """,
)
def an_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted moving average (weights 4:3:2:1 over the last
    four observed buckets) of hourly value totals per event type — the
    trend-smoothing twin of an_anomaly_zscore.

    Exactness: numerator and denominator are pure int64 arithmetic on
    the exact bucket units; ONE double division at the end, so results
    are bit-identical to the DuckDB oracle (a float EWMA would leak
    libm pow() differences). Series heads shrink the window (weights of
    absent lags drop out of the denominator) rather than zero-padding.

    Scale: O(1) window state (three lags, no frame buffering);
    partitions are event types — bounded; for a corpus whose per-key
    series outgrows one task, sub-partition by coarse time range and
    stitch the 3-row boundaries."""
    ev = table(spark, sf_dir, "events")
    b = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket")).agg(
        (F.sum(F.col("value").cast("decimal(38,4)")) * 10000)
        .cast("bigint")
        .alias("vu")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("bucket")
    x1, x2, x3 = (F.lag("vu", k).over(w) for k in (1, 2, 3))
    num = (
        F.lit(4) * F.col("vu")
        + F.lit(3) * F.coalesce(x1, F.lit(0))
        + F.lit(2) * F.coalesce(x2, F.lit(0))
        + F.lit(1) * F.coalesce(x3, F.lit(0))
    )
    den = (
        F.lit(4)
        + F.when(x1.isNull(), 0).otherwise(3)
        + F.when(x2.isNull(), 0).otherwise(2)
        + F.when(x3.isNull(), 0).otherwise(1)
    ) * 10000
    return b.select(
        "event_type",
        "bucket",
        (F.col("vu").cast("double") / 10000).alias("bucket_value"),
        (num.cast("double") / den).alias("wma"),
    )


@query(
    "an_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type) AS p
    FROM t
    """,
)
def an_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: consecutive (event_type -> next) pairs per user (lead over
    a unique ts+event_id ordering), counted globally, with row-
    normalized transition probabilities. One user-keyed shuffle for the
    sequence pass, one type-keyed aggregation — both linear; the window
    carries O(1) state per row. The probability divides two exact
    counts, identical IEEE division in both engines."""
    from pyspark.sql import Window as W

    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    t = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    return t.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("from_type"))
        ).alias("p"),
    )

@query(
    "an_top_paths",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3 GROUP BY user_id)
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path LIMIT 20
    """,
)
def an_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first three events (unique
    (ts, event_id) order) joined into a path string, ranked by how
    many users share the path — the sequence-analysis complement of
    an_event_transitions (which is first-order and forgets position).

    Scale shape: one user-keyed window with O(1) state assigns the
    ordinal and the rn <= 3 filter drops everything past the prefix
    BEFORE any list exists, so the per-user collect is bounded at 3
    structs; the path aggregate then groups on a low-cardinality
    string (at most |event_types|^3 paths) and the top-20 is a
    TakeOrdered, never a global sort. Path assembly sorts the
    collected (rn, event_type) structs — rn leads the struct, so the
    order is exact, not collect_list's arrival order."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = (
        ev.select(
            "user_id", "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(20)
    )
