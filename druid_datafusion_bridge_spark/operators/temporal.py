"""Temporal join operators Spark lacks natively: as-of join and
banded range join (SURVEY §2.3 J9 marks these out of the reference's
scope — they're part of this engine's extension surface).

Both are compositions of shuffles Spark already optimizes, NOT
nested-loop joins:

- as-of join: union the two sides, one window pass per key carries the
  latest right-side row forward — one shuffle on the key, linear scan
  per partition. The naive formulation (non-equi join + per-row max) is
  a BroadcastNestedLoopJoin that dies at scale.
- range join: band (bucket) the time axis so candidate pairs meet
  through an equi-join on (key, bucket) and its neighbor, then filter
  the exact predicate. Cost is O(pairs actually within the band),
  never |L| x |R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts and the same `on` key (NULLs when none).

    Implementation: tag + union + last_value(ignoreNulls) over a
    (key, ts) window — ties (equal ts) resolve to the right row
    (at-or-before semantics), matching DuckDB's ASOF JOIN.
    """
    from pyspark.sql.types import StructType

    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    l_struct_t = StructType([left.schema[c] for c in left.columns])
    r_struct_t = StructType([right.schema[c] for c in right_cols])

    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct_t).alias("__r"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    # a right row with a NULL timestamp can never be "at or before" any
    # left timestamp (DuckDB ASOF agrees: no match) — unfiltered it
    # would sort nulls-first into every window AND desynchronize the two
    # last(ignorenulls) carries (__r non-null, __rts null)
    rhs = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_struct_t).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
        F.col(right_ts).alias("__rts"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "__side",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__rcarried"),
        F.last("__rts", ignorenulls=True).over(w).alias("__rts_carried"),
    )
    picked = carried.filter(F.col("__side") == 1).select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col("__rcarried")[c].alias(c + suffix) for c in right_cols],
        F.col("__rts_carried").alias(right_ts + suffix),
    )
    return picked


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 60.0,
    suffix: str = "_right",
) -> DataFrame:
    """All (left, right) pairs with the same key and
    right.ts - left.ts in [lower_seconds, upper_seconds].

    Banded equi-join: both sides bucket their timestamps by the band
    width; a right row can only match left rows in its own or the
    adjacent bucket, so candidates come from TWO hash joins' worth of
    keys (bucket, bucket-1) instead of a cross product.
    """
    width = max(upper_seconds - lower_seconds, 1e-9)
    lb = F.floor((F.col(left_ts).cast("double") + F.lit(lower_seconds)) / width)
    rb = F.floor(F.col(right_ts).cast("double") / width)

    lhs = left.select(
        F.col(on).alias("__k"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.explode(F.array(lb.cast("long"), lb.cast("long") + 1)).alias("__b"),
    )
    r_cols = [c for c in right.columns if c != on]
    rhs = right.select(
        F.col(on).alias("__k"),
        F.struct(*[F.col(c) for c in right.columns]).alias("__r"),
        rb.cast("long").alias("__b"),
    )
    dt = F.col("__r")[right_ts].cast("double") - F.col("__l")[left_ts].cast("double")
    return (
        lhs.join(rhs, ["__k", "__b"])
        .filter((dt >= lower_seconds) & (dt <= upper_seconds))
        .select(
            *[F.col("__l")[c].alias(c) for c in left.columns],
            *[F.col("__r")[c].alias(c + suffix) for c in r_cols],
        )
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): within each key, a new
    session starts when the gap to the previous event EXCEEDS
    ``gap_seconds`` (strict >: an event at exactly last_ts + gap merges
    into the running session — verified against Spark's own
    session_window, which merges while next_start <= prev_end, in
    tests/test_temporal.py; so this operator is a drop-in batch
    backfill for the streaming session rollup); the session id is the
    running count of such breaks.
    The batch counterpart of Structured Streaming's session window
    (streaming/events.py), for backfills over historical data.

    Scale shape: ONE shuffle on the key, then two linear window passes
    per partition (lag -> break flag, running sum -> session ordinal).
    Per-key state is a single row; key cardinality (users) provides the
    parallelism, so the plan survives 100x data with the same shape.
    Returns one row per (key, session) with start/end/count.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    mic = F.unix_micros(F.col(ts_col))
    gap = mic - F.lag(mic).over(w)
    is_break = F.when(
        gap.isNull() | (gap > F.lit(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    sessions = events.withColumn(
        "session_seq",
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy(key_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy(key_col, "session_seq")
    )
