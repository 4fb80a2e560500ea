"""Temporal join registry queries: as-of join and banded range join over
the events table (extension operators — SURVEY §2.3 J9 is out of the
reference's scope; DuckDB's native ASOF JOIN provides the exact oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query
from ..operators.temporal import asof_join, range_join


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )


@query(
    "j9_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.ts,
           p.value AS value_right, p.ts AS ts_right
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def j9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent purchase at or
    before it (NULL before the first purchase). One shuffle on user_id +
    a window pass — no nested-loop join. The right side dedupes per
    (user, ts) so tie-breaking is engine-independent."""
    ev = table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(
        _clicks(spark, sf_dir), purchases, on="user_id",
        left_ts="ts", right_ts="ts", right_cols=["value"],
    )


@query(
    "j9b_range_join",
    oracle="""
    SELECT l.event_id AS click_id, r.event_id AS error_id, l.user_id,
           epoch(r.ts) - epoch(l.ts) AS gap_seconds
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') l
    JOIN (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'error') r
      ON l.user_id = r.user_id
     AND epoch(r.ts) - epoch(l.ts) BETWEEN 0 AND 3600
    """,
)
def j9b_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: error events within one hour after a click by
    the same user. Time-bucket equi-join keeps it a hash join (a plain
    inequality join would be a nested-loop cross product)."""
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pairs = range_join(
        _clicks(spark, sf_dir), errors, on="user_id",
        left_ts="ts", right_ts="ts", lower_seconds=0.0, upper_seconds=3600.0,
    )
    return pairs.select(
        F.col("event_id").alias("click_id"),
        F.col("event_id_right").alias("error_id"),
        "user_id",
        (F.col("ts_right").cast("double") - F.col("ts").cast("double")).alias(
            "gap_seconds"
        ),
    )
