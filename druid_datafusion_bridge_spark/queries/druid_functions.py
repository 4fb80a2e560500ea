"""Oracle-checked queries through the Druid SQL compatibility layer
(functions/druid_sql.py) — TIME_FLOOR/CEIL/SHIFT/EXTRACT, SAFE_DIVIDE,
TEXTCAT, CONTAINS_STRING, DIV, LOOKUP, and the MV_* multi-value family.

fd_druid_sql_text runs raw Druid SQL *text* end-to-end after
registration, mirroring the reference's whole entry path (register
table -> hand SQL string to the engine, src/main.rs:186-195) with the
dialect swapped from DataFusion to Druid SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import (
    div,
    lookup,
    mv_contains,
    mv_filter_only,
    mv_length,
    mv_to_string,
    register_druid_sql_functions,
    safe_divide,
    textcat,
    time_extract,
    time_floor,
)
from . import query


@query(
    "fd_time_functions",
    oracle="""
    SELECT CAST(date_trunc('quarter', l_shipdate) AS TIMESTAMP) AS ship_quarter,
           isodow(l_shipdate) AS dow,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ship_quarter, dow
    ORDER BY ship_quarter, dow
    """,
)
def fd_time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME_FLOOR to quarters + TIME_EXTRACT ISO day-of-week, checked
    against DuckDB's native date_trunc/isodow."""
    li = table(spark, sf_dir, "lineitem", heavy_scan=True)
    return (
        li.groupBy(
            time_floor("l_shipdate", "P3M").alias("ship_quarter"),
            time_extract("l_shipdate", "DOW").alias("dow"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("ship_quarter", "dow")
    )


@query(
    "fd_time_floor_custom_grain",
    oracle="""
    SELECT make_timestamp((CAST(floor((epoch_ms(l_shipdate)
                                       - epoch_ms(TIMESTAMP '1969-12-29'))
                                      / 1209600000) AS BIGINT) * 1209600000
                           + epoch_ms(TIMESTAMP '1969-12-29')) * 1000)
             AS bucket_2w,
           make_timestamp((CAST(floor((epoch_ms(l_shipdate)
                                       - epoch_ms(TIMESTAMP '1995-01-02'))
                                      / 604800000) AS BIGINT) * 604800000
                           + epoch_ms(TIMESTAMP '1995-01-02')) * 1000)
             AS week_monday,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY bucket_2w, week_monday
    ORDER BY bucket_2w, week_monday
    """,
)
def fd_time_floor_custom_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-period flooring the SQL date_trunc can't express:
    2-week buckets (default-anchored at the pre-epoch Monday — ISO
    weeks, Druid's chronology; the raw epoch is a Thursday), and weeks
    anchored to an explicit Monday origin (1995-01-02) — Druid's
    origin-anchored granularity. Oracle is raw epoch arithmetic in
    DuckDB with the same anchors."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            time_floor("l_shipdate", "P2W").alias("bucket_2w"),
            time_floor("l_shipdate", "P1W", origin="1995-01-02").alias(
                "week_monday"
            ),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("bucket_2w", "week_monday")
    )


@query(
    "fd_scalar_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice = 0 THEN NULL
                ELSE CAST(o_orderkey AS DOUBLE) / o_totalprice END AS key_per_price,
           o_orderstatus || o_orderpriority AS status_tag,
           contains(o_orderpriority, 'URGENT') AS is_urgent,
           CAST(o_orderkey // 1000 AS BIGINT) AS key_kilo,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
                ELSE 'other' END AS status_name
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
)
def fd_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAFE_DIVIDE / TEXTCAT / CONTAINS_STRING / DIV / LOOKUP column
    helpers against native DuckDB equivalents."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        safe_divide(F.col("o_orderkey").cast("double"), F.col("o_totalprice")).alias(
            "key_per_price"
        ),
        textcat("o_orderstatus", "o_orderpriority").alias("status_tag"),
        F.col("o_orderpriority").contains("URGENT").alias("is_urgent"),
        div(F.col("o_orderkey"), F.lit(1000)).alias("key_kilo"),
        lookup(
            "o_orderstatus", {"F": "finished", "O": "open"}, default="other"
        ).alias("status_name"),
    ).orderBy("o_orderkey")


@query(
    "fd_mv_functions",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           list_contains(string_split(p_name, ' '), 'red') AS has_red,
           COALESCE(array_to_string(list_filter(string_split(p_name, ' '),
                                    w -> w IN ('red', 'blue', 'hot', 'cold')), '|'),
                    '') AS color_words
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey
    """,
)
def fd_mv_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV_* multi-value family (Druid's multi-value string dimensions,
    SURVEY §1.3) over a split-to-array column, vs DuckDB list
    functions."""
    part = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    words = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        mv_length(words).alias("n_words"),
        mv_contains(words, "red").alias("has_red"),
        mv_to_string(
            mv_filter_only(words, ["red", "blue", "hot", "cold"]), "|"
        ).alias("color_words"),
    ).orderBy("p_partkey")


@query(
    "fd_druid_sql_text",
    oracle="""
    SELECT CAST(date_trunc('hour', o_orderdate) AS TIMESTAMP)
             + INTERVAL 1 DAY AS next_day,
           COUNT(*) AS n,
           CASE WHEN SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = 0
                THEN NULL
                ELSE CAST(COUNT(*) AS DOUBLE)
                     / SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) END
             AS per_finished
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate < TIMESTAMP '1999-03-01'
    GROUP BY next_day
    ORDER BY next_day
    """,
)
def fd_druid_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw Druid SQL text (TIME_SHIFT/TIME_FLOOR/SAFE_DIVIDE as SQL
    function calls) executed verbatim through spark.sql after
    register_druid_sql_functions — the reference's register-then-sql
    lifecycle with Druid's dialect."""
    register_druid_sql_functions(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT TIME_SHIFT(TIME_FLOOR(o_orderdate, 'PT1H'), 'P1D', 1) AS next_day,
               COUNT(*) AS n,
               SAFE_DIVIDE(CAST(COUNT(*) AS DOUBLE),
                           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                                         THEN 1 ELSE 0 END) AS DOUBLE))
                 AS per_finished
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01'
          AND o_orderdate < TIMESTAMP '1999-03-01'
        GROUP BY next_day
        ORDER BY next_day
        """
    )


@query(
    "fd_interval_regex_base64",
    oracle="""
    SELECT o_orderpriority,
           o_orderpriority AS roundtrip,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
      AND regexp_matches(o_orderpriority, '^[1-3]-')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def fd_interval_regex_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid TIME_IN_INTERVAL (ISO slash interval, start-inclusive /
    end-exclusive), REGEXP_LIKE (partial match) and DECODE_BASE64_UTF8,
    as raw SQL text through the registered dialect. The base64
    round-trip must reproduce the source string byte-for-byte, which
    the oracle checks by simply selecting the original."""
    register_druid_sql_functions(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               DECODE_BASE64_UTF8(base64(o_orderpriority)) AS roundtrip,
               COUNT(*) AS n
        FROM orders
        WHERE TIME_IN_INTERVAL(o_orderdate, '1998-01-01/1999-01-01')
          AND REGEXP_LIKE(o_orderpriority, '^[1-3]-')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "fd_latest_earliest",
    oracle="""
    SELECT event_type,
           max_by(value, ts) AS latest_value,
           min_by(value, ts) AS earliest_value,
           max_by(user_id, ts) AS latest_user,
           MAX(ts) AS latest_ts
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def fd_latest_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid LATEST/EARLIEST aggregators (value at max/min __time) via
    max_by/min_by. Deterministic here because event timestamps are
    unique (verified at every SF); Druid's own tie behavior is
    undefined."""
    from ..functions import earliest, latest

    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            latest("value", "ts").alias("latest_value"),
            earliest("value", "ts").alias("earliest_value"),
            latest("user_id", "ts").alias("latest_user"),
            F.max("ts").alias("latest_ts"),
        )
        .orderBy("event_type")
    )


@query(
    "fd_string_array_agg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           array_to_string(list_sort(list(DISTINCT substr(n_name, 1, 1))),
                           '|') AS initials,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def fd_string_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid SQL STRING_AGG / ARRAY_AGG(DISTINCT) aggregators (Druid
    24+; the reference's DataFusion delegation has no ordered-list
    aggregate in its README surface). Spark's collect_list is
    order-nondeterministic across shuffles, so both aggregates are made
    deterministic with array_sort BEFORE serialization — the same
    discipline every other list-producing query here follows (a11b;
    arrays themselves are serialized because raw array columns crash
    the driver's pandas canonicalizer). One broadcast-joined dimension
    aggregate; no fact-table state."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations_csv"),
            F.array_join(
                F.array_sort(F.collect_set(F.substring("n_name", 1, 1))), "|"
            ).alias("initials"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


@query(
    "fd_unnest",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 10
    """,
)
def fd_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid UNNEST table function (Druid 26+): flatten a multi-value
    dimension to one row per value, then aggregate — here the top-10
    words of part names. explode() is Spark's UNNEST: generated
    JVM-side inside whole-stage codegen, then a plain hash aggregate;
    the top-10 is TakeOrderedAndProject, not a global sort."""
    part = table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(10)
    )


@query(
    "fd_json_value",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
    SELECT event_type,
           CAST(k // 10 AS BIGINT) AS k_band,
           COUNT(*) AS n,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(MAX(k) AS BIGINT) AS k_max
    FROM e
    GROUP BY event_type, k // 10
    ORDER BY event_type, k_band
    """,
)
def fd_json_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid nested-column JSON functions (JSON_VALUE, Druid 24+) over
    the events ``props`` payload: extract a typed field from every
    row's JSON and aggregate on it. Spark side uses get_json_object —
    the scan stays columnar and the extraction is a stateless row map,
    so at 100 TB this is scan-bound exactly like any other projection
    (a production layout would materialize hot JSON paths to real
    columns at ingest, which is precisely what Druid nested columns
    do)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", F.expr("k div 10").alias("k_band"))
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type", "k_band")
    )


@query(
    "fd_json_query",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             json_extract(props, '$.k')::VARCHAR AS k_text,
             json_keys(props)[1] AS first_key
      FROM events)
    SELECT event_type, COUNT(*) AS n,
           MIN(k) AS k_min, MAX(k) AS k_max,
           MIN(k_text) AS k_text_min,
           MIN(first_key) AS first_key,
           '$.' || MIN(first_key) AS first_path,
           TRUE AS canon_ok, TRUE AS obj_ok
    FROM e GROUP BY event_type ORDER BY event_type
    """,
)
def fd_json_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Druid 24+ nested-column JSON family as raw SQL text
    (nested-columns.md): JSON_VALUE with the RETURNING clause (rewrite
    peels it into a CAST), JSON_QUERY (returns the JSON at the path,
    objects/arrays included), JSON_OBJECT KEY/VALUE construction,
    PARSE_JSON -> TO_JSON_STRING round trip (canonicalized against the
    source payload minus whitespace), JSON_KEYS, and JSON_PATHS — all
    registered on Spark's VARIANT/json builtins, so the extraction
    stays a stateless JVM row map over the columnar scan (scan-bound
    at 100 TB like any projection; Druid materializes hot paths to
    nested columns at ingest, the same trade our ingest specs make).
    Round-trip invariants (canonical serialization, JSON_OBJECT
    extraction) are oracle-checked as literal-TRUE flags; extractions
    and key/path listings are checked exactly."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events", heavy_scan=True).createOrReplaceTempView("events")
    sql = rewrite_datasketches_sql(
        """
        WITH e AS (
          SELECT event_type,
                 JSON_VALUE(props, '$.k' RETURNING BIGINT) AS k,
                 JSON_QUERY(props, '$.k') AS k_text,
                 TO_JSON_STRING(PARSE_JSON(props)) AS canon,
                 replace(props, ' ', '') AS canon_ref,
                 JSON_KEYS(props, '$')[0] AS first_key,
                 JSON_PATHS(props)[0] AS first_path,
                 JSON_VALUE(
                   JSON_OBJECT(
                     KEY 'et' VALUE event_type,
                     KEY 'kk' VALUE JSON_VALUE(props, '$.k'
                                               RETURNING BIGINT)),
                   '$.et') AS et_rt
          FROM events)
        SELECT event_type, COUNT(*) AS n,
               MIN(k) AS k_min, MAX(k) AS k_max,
               MIN(k_text) AS k_text_min,
               MIN(first_key) AS first_key,
               MIN(first_path) AS first_path,
               bool_and(canon = canon_ref) AS canon_ok,
               bool_and(et_rt = event_type) AS obj_ok
        FROM e GROUP BY event_type ORDER BY event_type
        """
    )
    return spark.sql(sql)


@query(
    "fd_time_floor_origin",
    oracle="""
    WITH g AS (
      SELECT epoch_ms(TIMESTAMP '2024-01-01 03:00:00')
             + CAST(floor((epoch_ms(ts)
                           - epoch_ms(TIMESTAMP '2024-01-01 03:00:00'))
                          / 21600000.0) AS BIGINT) * 21600000 AS fms
      FROM events)
    SELECT make_timestamp(fms * 1000) AS bucket,
           COUNT(*) AS n,
           make_timestamp((fms + 21600000) * 1000) AS next_bucket
    FROM g GROUP BY fms ORDER BY bucket
    """,
)
def fd_time_floor_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's origin-anchored TIME_FLOOR/TIME_CEIL argument forms as
    SQL text (sql-scalar.md: TIME_FLOOR(ts, period, origin[, tz])):
    events bucketed on a PT6H grid anchored at 03:00 — the grid every
    Druid deployment with non-midnight reporting windows uses. The
    rewrite renders the duration grid arithmetically (DDBS_PERIOD_MS
    keeps calendar-period-with-origin loud); TIME_CEIL of a boundary
    row is the boundary itself, so next_bucket pins the ceil path via
    ceil(bucket + 1ms granularity) == bucket + period. Exact epoch-
    arithmetic DuckDB oracle. The timezone argument form is pinned by
    the broker round-trip test (DST instants are awkward to reproduce
    portably in an oracle)."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = rewrite_datasketches_sql(
        """
        WITH g AS (
          SELECT TIME_FLOOR(ts, 'PT6H',
                            TIMESTAMP '2024-01-01 03:00:00') AS bucket
          FROM events)
        SELECT bucket, COUNT(*) AS n,
               TIME_CEIL(bucket + INTERVAL 1 MILLISECOND, 'PT6H',
                         TIMESTAMP '2024-01-01 03:00:00') AS next_bucket
        FROM g GROUP BY bucket ORDER BY bucket
        """
    )
    return spark.sql(sql)


@query(
    "fd_human_readable_sql_text",
    oracle="""
    WITH v AS (
      SELECT event_type,
             (MIN(event_id) % 8) * 262144 AS b,
             (MIN(event_id) % 8) * 250000 AS d
      FROM events GROUP BY event_type)
    SELECT event_type,
           CASE WHEN b < 1024 THEN printf('%.2f B', CAST(b AS DOUBLE))
                WHEN b < 1048576
                  THEN printf('%.2f KiB', b / 1024.0)
                ELSE printf('%.2f MiB', b / 1048576.0) END AS bin,
           CASE WHEN d < 1000 THEN printf('%.2f B', CAST(d AS DOUBLE))
                WHEN d < 1000000
                  THEN printf('%.2f KB', d / 1000.0)
                ELSE printf('%.2f MB', d / 1000000.0) END AS dec,
           CASE WHEN d < 1000 THEN printf('%.2f', CAST(d AS DOUBLE))
                WHEN d < 1000000 THEN printf('%.2f K', d / 1000.0)
                ELSE printf('%.2f M', d / 1000000.0) END AS mag
    FROM v ORDER BY event_type
    """,
)
def fd_human_readable_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's HUMAN_READABLE_* formatting trio as raw SQL text
    (sql-scalar.md), oracled EXACTLY against DuckDB's printf: the
    formatted inputs are multiples of 262144 (= 1024^2/4) and 250000
    (= 10^6/4), so every scaled value is an exact binary quarter or an
    exact decimal quarter — two decimal places involve NO rounding,
    sidestepping the one honest cross-engine divergence (Java's %.2f
    rounds half-up, C's half-even; a tie-free domain makes the
    formatter comparison bit-exact rather than flaky)."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = rewrite_datasketches_sql(
        """
        WITH v AS (
          SELECT event_type,
                 (MIN(event_id) % 8) * 262144 AS b,
                 (MIN(event_id) % 8) * 250000 AS d
          FROM events GROUP BY event_type)
        SELECT event_type,
               HUMAN_READABLE_BINARY_BYTE_FORMAT(b) AS bin,
               HUMAN_READABLE_DECIMAL_BYTE_FORMAT(d) AS dec,
               HUMAN_READABLE_DECIMAL_FORMAT(d) AS mag
        FROM v ORDER BY event_type
        """
    )
    return spark.sql(sql)


@query(
    "fd_array_sql_text",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             regexp_split_to_array(
               concat(event_type, '-', CAST(user_id % 3 AS VARCHAR)),
               '-') AS chars
      FROM events)
    SELECT event_type,
           arg_max(user_id, event_id) AS last_user,
           arg_min(user_id, event_id) AS first_user,
           arg_max(user_id, event_id) AS last_user_by,
           arg_min(user_id, event_id) AS first_user_by,
           CAST(len(flatten(list(chars))) AS BIGINT) AS concat_agg_len,
           MIN(chars[2]) AS min_digit,
           MIN(array_to_string(list_slice(chars, 1, 2), '|')) AS first2,
           MIN(array_to_string(list_slice(chars, 2, len(chars)), '|'))
             AS tail,
           MIN(chars[1]) AS c0,
           TRUE AS oob_null_ok,
           CAST(SUM(CASE WHEN list_has_any(chars, ['0', '1'])
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           CAST(MIN(2 * len(chars)) AS BIGINT) AS concat_len,
           MIN(printf('%s#%d', event_type, user_id % 7)) AS fmt
    FROM e GROUP BY event_type ORDER BY event_type
    """,
)
def fd_array_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's SQL array family and time-ordered value aggregates as
    raw SQL text (sql-array-functions.md, sql-aggregations.md):
    STRING_TO_ARRAY (regex delimiter, like Druid's), ARRAY_LENGTH,
    ARRAY_OFFSET (0-indexed, NULL out of range — never Spark's
    negative-from-the-end), ARRAY_ORDINAL (1-indexed), ARRAY_SLICE
    (0-indexed [start, end) and the to-the-end 2-arg form),
    ARRAY_TO_STRING, ARRAY_OVERLAP, ARRAY_CONCAT, ARRAY_CONCAT_AGG,
    STRING_FORMAT, plus LATEST/EARLIEST (implicit __time) and
    LATEST_BY/EARLIEST_BY — all normalized onto Spark builtins by the
    SQL-text rewrite (aggregates and arg-form swaps a scalar SQL UDF
    cannot express). __time is built unique (timestamp_millis of the
    unique event_id) so the LATEST/EARLIEST values are deterministic;
    the out-of-range offsets are oracle-checked as a literal-TRUE
    flag, everything else exactly."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = rewrite_datasketches_sql(
        """
        WITH e AS (
          SELECT timestamp_millis(event_id) AS __time, event_id,
                 user_id, event_type,
                 STRING_TO_ARRAY(
                   concat(event_type, '-', CAST(user_id % 3 AS STRING)),
                   '-') AS chars
          FROM events)
        SELECT event_type,
               LATEST(user_id) AS last_user,
               EARLIEST(user_id) AS first_user,
               LATEST_BY(user_id, event_id) AS last_user_by,
               EARLIEST_BY(user_id, event_id) AS first_user_by,
               ARRAY_LENGTH(ARRAY_CONCAT_AGG(chars)) AS concat_agg_len,
               MIN(ARRAY_ORDINAL(chars, 2)) AS min_digit,
               MIN(ARRAY_TO_STRING(ARRAY_SLICE(chars, 0, 2), '|'))
                 AS first2,
               MIN(ARRAY_TO_STRING(ARRAY_SLICE(chars, 1), '|')) AS tail,
               MIN(ARRAY_OFFSET(chars, 0)) AS c0,
               bool_and(ARRAY_OFFSET(chars, 5) IS NULL
                        AND ARRAY_OFFSET(chars, 0 - 1) IS NULL
                        AND ARRAY_ORDINAL(chars, 0) IS NULL)
                 AS oob_null_ok,
               SUM(CASE WHEN ARRAY_OVERLAP(chars, array('0', '1'))
                        THEN 1 ELSE 0 END) AS n_overlap,
               MIN(ARRAY_LENGTH(ARRAY_CONCAT(chars, chars)))
                 AS concat_len,
               MIN(STRING_FORMAT('%s#%d', event_type, user_id % 7))
                 AS fmt
        FROM e GROUP BY event_type ORDER BY event_type
        """
    )
    return spark.sql(sql)


@query(
    "fd_mv_sql_text",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           list_contains(string_split(p_name, ' '), 'red') AS has_red,
           string_split(p_name, ' ')[2] AS second_word,
           COALESCE(array_to_string(list_filter(string_split(p_name, ' '),
                                    w -> w IN ('red', 'blue', 'hot', 'cold')), '|'),
                    '') AS color_words
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey
    """,
)
def fd_mv_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MV_* family as raw Druid SQL *text* (STRING_TO_MV /
    MV_LENGTH / MV_CONTAINS / MV_ORDINAL / MV_FILTER_ONLY /
    MV_TO_STRING as Catalyst-inlined SQL UDFs) — a Druid user's
    multi-value SQL runs verbatim through spark.sql and the broker's
    /druid/v2/sql, not just through the Column helpers."""
    register_druid_sql_functions(spark)
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey,
               MV_LENGTH(STRING_TO_MV(p_name, ' ')) AS n_words,
               MV_CONTAINS(STRING_TO_MV(p_name, ' '), 'red') AS has_red,
               MV_ORDINAL(STRING_TO_MV(p_name, ' '), 2) AS second_word,
               MV_TO_STRING(MV_FILTER_ONLY(STRING_TO_MV(p_name, ' '),
                            array('red', 'blue', 'hot', 'cold')), '|')
                 AS color_words
        FROM part
        WHERE p_partkey <= 500
        ORDER BY p_partkey
        """
    )


@query(
    "fd_lookup_sql_text",
    oracle="""
    SELECT n_name,
           r_name,
           CASE r_name WHEN 'ASIA' THEN 'east' WHEN 'EUROPE' THEN 'west'
                       WHEN 'AFRICA' THEN 'south' END AS zone,
           COALESCE(CASE r_name WHEN 'ASIA' THEN 'east'
                                WHEN 'EUROPE' THEN 'west'
                                WHEN 'AFRICA' THEN 'south' END,
                    'other') AS zone_filled,
           CASE r_name WHEN 'ASIA' THEN 'AS' WHEN 'EUROPE' THEN 'EU' END
             AS abbrev
    FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_name
    """,
)
def fd_lookup_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid SQL's LOOKUP(expr, 'name') as raw SQL text: two named
    dictionaries registered via register_sql_lookups dispatch inside
    one constant-foldable SQL function; unmapped keys stay NULL
    (COALESCE supplies Druid's replaceMissingValueWith)."""
    from ..functions import register_sql_lookups

    register_druid_sql_functions(spark)
    register_sql_lookups(spark, {
        "zone": {"ASIA": "east", "EUROPE": "west", "AFRICA": "south"},
        "abbrev": {"ASIA": "AS", "EUROPE": "EU"},
    })
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    table(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT n_name,
               r_name,
               LOOKUP(r_name, 'zone') AS zone,
               COALESCE(LOOKUP(r_name, 'zone'), 'other') AS zone_filled,
               LOOKUP(r_name, 'abbrev') AS abbrev
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY n_name
        """
    )


@query(
    "fd_window_sql_text",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS day_total,
           CAST(SUM(SUM(CAST(value AS DECIMAL(38,8))))
                  OVER (PARTITION BY event_type ORDER BY date_trunc('day', ts)
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS running_total,
           CAST(rank() OVER (PARTITION BY event_type
                             ORDER BY SUM(CAST(value AS DECIMAL(38,8))) DESC,
                                      date_trunc('day', ts)) AS BIGINT)
             AS day_rank
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
)
def fd_window_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid SQL WINDOW functions (sql-window-functions.md, Druid 28+)
    as raw SQL text — aggregate-over-window composed with GROUP BY and
    the TIME_FLOOR dialect function, the shape Druid's windowing docs
    lead with (running totals and ranks over daily rollups). Decimal
    accumulation keeps both engines' sums bit-identical; the rank's
    ORDER BY carries the day as a unique tiebreak."""
    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               TIME_FLOOR(ts, 'P1D') AS d,
               CAST(SUM(CAST(value AS DECIMAL(38,8))) AS DOUBLE)
                 AS day_total,
               CAST(SUM(SUM(CAST(value AS DECIMAL(38,8))))
                      OVER (PARTITION BY event_type
                            ORDER BY TIME_FLOOR(ts, 'P1D')
                            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 AS running_total,
               CAST(rank() OVER (PARTITION BY event_type
                                 ORDER BY SUM(CAST(value AS DECIMAL(38,8)))
                                   DESC, TIME_FLOOR(ts, 'P1D')) AS BIGINT)
                 AS day_rank
        FROM events
        GROUP BY event_type, TIME_FLOOR(ts, 'P1D')
        """
    )


@query(
    "fd_ds_sketch_sql_text",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_ok,
           TRUE AS merged_hll_ok,
           TRUE AS p50_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def fd_ds_sketch_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's DataSketches SQL names as raw SQL text
    (datasketches-hll.md / datasketches-quantiles.md):
    APPROX_COUNT_DISTINCT_DS_HLL with an explicit lgK,
    DS_HLL -> HLL_SKETCH_UNION -> HLL_SKETCH_ESTIMATE (the
    build-merge-estimate pipeline sub-sketches flow through at 100 TB),
    and APPROX_QUANTILE_DS — rewritten by rewrite_datasketches_sql
    onto Spark's own Apache DataSketches HLL builtins, the SAME sketch
    library real Druid uses. Sketch estimates differ across engines by
    design, so the oracle checks the deterministic part (exact
    distinct count) plus bounded-error CONTRACTS as flags: lgK=14 HLL
    error is ~0.8% rsd, checked at 3*rsd; the merged two-way union
    must agree with the directly-built sketch's error bound; the
    approximate median must land within 1% of the exact median."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    # heavy_scan: three sketch/sort aggregates over the same fact scan
    # (HLL build, distinct+HLL, percentile) — scan-dominated, no join
    # probe anywhere, so the fine-split mirror parallelizes all three
    table(spark, sf_dir, "lineitem", heavy_scan=True).createOrReplaceTempView(
        "lineitem"
    )
    sql = rewrite_datasketches_sql(
        """
        WITH halves AS (
            SELECT l_returnflag,
                   DS_HLL(l_partkey, 14) AS sk
            FROM lineitem GROUP BY l_returnflag, l_orderkey % 2
        ),
        merged AS (
            SELECT l_returnflag,
                   HLL_SKETCH_ESTIMATE(HLL_SKETCH_UNION(sk_a, sk_b))
                     AS merged_est
            FROM (SELECT l_returnflag,
                         MIN(sk) AS sk_a, MAX(sk) AS sk_b
                  FROM halves GROUP BY l_returnflag)
        ),
        counts AS (
            -- kept SEPARATE from the percentile aggregates on purpose:
            -- COUNT(DISTINCT) lowers to an Expand (2x rows), and a
            -- sort-based aggregate (percentile) sharing that Aggregate
            -- runs over the expanded input — measured 8 s combined vs
            -- ~2 s split at sf0.1; the join back is 3 rows.
            -- r13 (same rewrite as a9_approx_count_distinct): dedup
            -- the (flag, partkey) pairs FIRST — otherwise the mixed
            -- distinct/HLL aggregate's first partial phase keys by the
            -- pair and shuffles a partial HLL buffer on EVERY distinct
            -- pair row. Over deduped pairs, COUNT == COUNT(DISTINCT)
            -- and the HLL builds from the same value set (sketches are
            -- duplicate-insensitive), so estimate and flags are
            -- bit-identical while the exchange carries two columns.
            SELECT l_returnflag,
                   COUNT(l_partkey) AS exact_parts,
                   APPROX_COUNT_DISTINCT_DS_HLL(l_partkey, 14) AS hll_est
            FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)
            GROUP BY l_returnflag
        ),
        pcts AS (
            SELECT l_returnflag,
                   APPROX_QUANTILE_DS(l_extendedprice, 0.5) AS p50_est,
                   CAST(percentile(l_extendedprice, 0.5) AS DOUBLE)
                     AS p50_exact
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT d.l_returnflag,
               d.exact_parts,
               abs(d.hll_est - d.exact_parts) / d.exact_parts <= 0.025
                 AS hll_ok,
               abs(m.merged_est - d.exact_parts) / d.exact_parts <= 0.025
                 AS merged_hll_ok,
               abs(p.p50_est - p.p50_exact) / p.p50_exact <= 0.01
                 AS p50_ok
        FROM counts d
        JOIN pcts p USING (l_returnflag)
        JOIN merged m USING (l_returnflag)
        ORDER BY d.l_returnflag
        """
    )
    return spark.sql(sql)

@query(
    "fd_expr_gap_sql_text",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(user_id % 5 AS VARCHAR) AS tag, event_id
      FROM events)
    SELECT event_type,
           regexp_extract(min(event_type), '[a-z]+') AS re_full,
           regexp_extract(min(event_type), '([a-z])([a-z]+)', 2) AS re_g2,
           array_to_string(
             list_sort(string_split(string_agg(DISTINCT tag, ','), ',')),
             ','
           ) AS tags_sorted,
           min(event_id) & 255 AS band,
           min(event_id) | 16 AS bor,
           xor(min(event_id), 255) AS bxor,
           ~min(event_id) AS bcompl,
           min(event_id) << 3 AS bshl,
           max(event_id) >> 2 AS bshr
    FROM e GROUP BY event_type ORDER BY event_type
    """,
)
def fd_expr_gap_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Druid SQL names whose Spark twin has a DIFFERENT default,
    name, or no scalar twin at all, as raw SQL text: 2-arg
    REGEXP_EXTRACT (Druid returns the FULL match; Spark's builtin
    defaults to group 1 and errors outright on a groupless pattern),
    3-arg REGEXP_EXTRACT (same group numbering both engines),
    STRING_AGG (Spark spells it listagg; rendered order-insensitive
    here by sort-after-split since neither engine orders the
    aggregate without WITHIN GROUP), and the six BITWISE_* function
    names over 64-bit longs (sql-scalar.md). REGEXP_EXTRACT and
    STRING_AGG normalize in rewrite_datasketches_sql (arg-form
    rewrites a scalar SQL UDF cannot express); BITWISE_* register as
    SQL functions. Exact DuckDB oracle — DuckDB's regexp_extract
    shares Druid's full-match default, its operators the two's-
    complement semantics."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = rewrite_datasketches_sql(
        """
        WITH e AS (
          SELECT event_type, CAST(user_id % 5 AS STRING) AS tag,
                 event_id
          FROM events)
        SELECT event_type,
               REGEXP_EXTRACT(min(event_type), '[a-z]+') AS re_full,
               REGEXP_EXTRACT(min(event_type), '([a-z])([a-z]+)', 2)
                 AS re_g2,
               array_join(
                 array_sort(split(STRING_AGG(DISTINCT tag, ','), ',')),
                 ','
               ) AS tags_sorted,
               BITWISE_AND(min(event_id), 255) AS band,
               BITWISE_OR(min(event_id), 16) AS bor,
               BITWISE_XOR(min(event_id), 255) AS bxor,
               BITWISE_COMPLEMENT(min(event_id)) AS bcompl,
               BITWISE_SHIFT_LEFT(min(event_id), 3) AS bshl,
               BITWISE_SHIFT_RIGHT(max(event_id), 2) AS bshr
        FROM e GROUP BY event_type ORDER BY event_type
        """
    )
    return spark.sql(sql)


@query(
    "fd_theta_sql_text",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click' AND user_id % 3 = 0),
         v AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view' AND user_id % 2 = 0)
    SELECT (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM
              (SELECT user_id FROM c UNION SELECT user_id FROM v))
             AS n_union,
           (SELECT COUNT(*) FROM
              (SELECT user_id FROM c INTERSECT SELECT user_id FROM v))
             AS n_inter,
           (SELECT COUNT(*) FROM
              (SELECT user_id FROM c EXCEPT SELECT user_id FROM v))
             AS n_click_only
    """,
)
def fd_theta_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's Theta-sketch set-algebra SQL names as raw SQL text
    (datasketches-theta.md): DS_THETA builds per-set sketches, then
    THETA_SKETCH_UNION / _INTERSECT / _NOT compose and
    THETA_SKETCH_ESTIMATE reads each out — rewritten by
    rewrite_datasketches_sql onto the kmv theta struct machinery
    (operators/sketches.py's math as pure SQL: collect_set capped at k,
    set ops below min-theta). Both input sets sit far below the default
    k=16384, so every sketch is EXACT and the oracle is plain distinct
    set algebra; the saturated estimator path is pinned separately by
    tests/test_druid_functions.py against brute-force hashes. The whole
    pipeline is one JVM expression tree — sketches shuffle as bounded
    arrays (<= k bigints), the 100 TB posture for cross-slice distinct
    set analysis."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = rewrite_datasketches_sql(
        """
        WITH sks AS (
          SELECT
            (SELECT DS_THETA(user_id) FROM events
             WHERE event_type = 'click' AND user_id % 3 = 0) AS a,
            (SELECT DS_THETA(user_id) FROM events
             WHERE event_type = 'view' AND user_id % 2 = 0) AS b
        )
        SELECT
          CAST(round(THETA_SKETCH_ESTIMATE(a)) AS BIGINT) AS n_click,
          CAST(round(THETA_SKETCH_ESTIMATE(b)) AS BIGINT) AS n_view,
          CAST(round(THETA_SKETCH_ESTIMATE(THETA_SKETCH_UNION(a, b)))
            AS BIGINT) AS n_union,
          CAST(round(THETA_SKETCH_ESTIMATE(THETA_SKETCH_INTERSECT(a, b)))
            AS BIGINT) AS n_inter,
          CAST(round(THETA_SKETCH_ESTIMATE(THETA_SKETCH_NOT(a, b)))
            AS BIGINT) AS n_click_only
        FROM sks
        """
    )
    return spark.sql(sql)


@query(
    "fd_time_floor_period_origin",
    oracle="""
    WITH b AS (
      SELECT CAST(floor((
               (year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 2)
               - CASE WHEN (day(o_orderdate), CAST(o_orderdate AS TIME))
                        < (15, TIME '06:30:00') THEN 1 ELSE 0 END
             ) / 3.0) * 3 AS INT) AS n_m
      FROM orders)
    SELECT TIMESTAMP '1995-02-15 06:30:00' + to_months(n_m) AS bucket,
           COUNT(*) AS n,
           TIMESTAMP '1995-02-15 06:30:00' + to_months(n_m + 3)
             AS next_bucket,
           TIMESTAMP '1995-02-15 06:30:00' + to_months(n_m)
             AS ceil_of_boundary
    FROM b GROUP BY n_m ORDER BY bucket
    """,
)
def fd_time_floor_period_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's CALENDAR-period-with-origin TIME_FLOOR/TIME_CEIL forms
    as SQL text (sql-scalar.md): orders on a P3M grid anchored at
    1995-02-15 06:30 — every bucket boundary preserves the origin's
    day-of-month AND time-of-day, which no epoch-milliseconds grid can
    express (variable month lengths). The rewrite parses the literal
    period at REWRITE time and renders months_between arithmetic with
    the overshoot step-back (r9 kept this loud through DDBS_PERIOD_MS;
    r10 implements it). next_bucket pins TIME_CEIL's non-boundary arm
    (ceil(bucket+1ms) = bucket + P3M), ceil_of_boundary its equality
    arm (ceil(bucket) = bucket). The DuckDB oracle computes the same
    grid from an independent calendar-month-difference formulation —
    no shared arithmetic with the Spark rendering."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    sql = rewrite_datasketches_sql(
        """
        WITH g AS (
          SELECT TIME_FLOOR(CAST(o_orderdate AS TIMESTAMP), 'P3M',
                            TIMESTAMP '1995-02-15 06:30:00') AS bucket
          FROM orders)
        SELECT bucket, COUNT(*) AS n,
               TIME_CEIL(bucket + INTERVAL 1 MILLISECOND, 'P3M',
                         TIMESTAMP '1995-02-15 06:30:00') AS next_bucket,
               TIME_CEIL(bucket, 'P3M',
                         TIMESTAMP '1995-02-15 06:30:00')
                 AS ceil_of_boundary
        FROM g GROUP BY bucket ORDER BY bucket
        """
    )
    return spark.sql(sql)


@query(
    "fd_quantiles_sql_text",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_quantity < 25) AS DOUBLE)
             / COUNT(*) AS rank_25,
           CAST(COUNT(*) FILTER (WHERE l_quantity < 10) AS DOUBLE)
             / COUNT(*) AS cdf_low,
           CAST(COUNT(*) FILTER (WHERE l_quantity >= 10
                                   AND l_quantity < 40) AS DOUBLE)
             / COUNT(*) AS cdf_mid,
           CAST(COUNT(*) FILTER (WHERE l_quantity >= 40) AS DOUBLE)
             / COUNT(*) AS cdf_high,
           CAST(COUNT(*) FILTER (WHERE l_quantity < 10) AS DOUBLE)
             AS hist_low,
           CAST(COUNT(*) FILTER (WHERE l_quantity >= 10
                                   AND l_quantity < 40) AS DOUBLE)
             AS hist_mid,
           CAST(COUNT(*) FILTER (WHERE l_quantity >= 40) AS DOUBLE)
             AS hist_high,
           TRUE AS p50_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def fd_quantiles_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataSketches QUANTILES SQL family as raw SQL text
    (datasketches-quantiles.md), completing the module's trio (HLL r8,
    Theta r10, Quantiles r10): DS_QUANTILES_SKETCH renders a marker its
    consumers unwrap — DS_RANK / DS_CDF / DS_HISTOGRAM render EXACT
    count_if aggregates (integer-valued doubles, so the divisions are
    bit-identical across engines — the same strict-accuracy upgrade as
    the exact cardinality path), and DS_GET_QUANTILE rides Spark's own
    quantile sketch, oracled by a 1%-relative-error contract flag
    against the exact in-Spark percentile (the fd_ds_sketch_sql_text
    posture: sketch estimates differ across engines by design, the
    CONTRACT is what's checked). The CDF/HISTOGRAM arrays surface as
    per-bucket scalar columns — the driver canonicalizer cannot sort
    list cells."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    sql = rewrite_datasketches_sql(
        """
        WITH fam AS (
          SELECT l_returnflag,
                 DS_RANK(DS_QUANTILES_SKETCH(l_quantity), 25.0)
                   AS rank_25,
                 DS_CDF(DS_QUANTILES_SKETCH(l_quantity), 10.0, 40.0)
                   AS cdf,
                 DS_HISTOGRAM(DS_QUANTILES_SKETCH(l_quantity),
                              10.0, 40.0) AS hist,
                 abs(DS_GET_QUANTILE(DS_QUANTILES_SKETCH(l_quantity),
                                     0.5)
                     - percentile(l_quantity, 0.5))
                   <= 0.01 * percentile(l_quantity, 0.5) AS p50_ok
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, rank_25,
               element_at(cdf, 1) AS cdf_low,
               element_at(cdf, 2) AS cdf_mid,
               element_at(cdf, 3) AS cdf_high,
               element_at(hist, 1) AS hist_low,
               element_at(hist, 2) AS hist_mid,
               element_at(hist, 3) AS hist_high,
               p50_ok
        FROM fam
        """
    )
    return spark.sql(sql)


@query(
    "fd_unnest_sql_text",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split(p_name, ' ')) AS word, p_size
      FROM part)
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(p_size) AS BIGINT) AS size_sum
    FROM w GROUP BY word
    ORDER BY n DESC, word
    LIMIT 10
    """,
)
def fd_unnest_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's UNNEST table function as raw SQL TEXT (sql.md, Druid
    26+): ``CROSS JOIN UNNEST(STRING_TO_ARRAY(...)) AS u(word)`` —
    rewritten by rewrite_unnest_sql onto LATERAL VIEW explode (one
    Generate inside whole-stage codegen), with STRING_TO_ARRAY then
    normalized by the DataSketches-name pass, the exact chain every
    broker SQL path runs. The DataFrame twin (fd_unnest, r6) fixed the
    semantics; this row is the SQL-text entry a Druid-26 client
    actually types."""
    from ..functions.druid_sql import (
        rewrite_datasketches_sql,
        rewrite_unnest_sql,
    )

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    sql = rewrite_datasketches_sql(rewrite_unnest_sql(
        """
        SELECT word,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(p_size) AS BIGINT) AS size_sum
        FROM part CROSS JOIN UNNEST(STRING_TO_ARRAY(p_name, ' '))
          AS u(word)
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 10
        """
    ))
    return spark.sql(sql)


@query(
    "fd_ipv4_sql_text",
    oracle="""
    WITH ips AS (
      SELECT user_id,
             '10.' || CAST(user_id % 256 AS VARCHAR) || '.'
               || CAST((user_id * 7) % 256 AS VARCHAR) || '.'
               || CAST((user_id * 13) % 256 AS VARCHAR) AS ip,
             167772160 + (user_id % 256) * 65536
               + ((user_id * 7) % 256) * 256
               + (user_id * 13) % 256 AS ip_num
      FROM (SELECT DISTINCT user_id FROM events))
    SELECT CAST(SUM(CASE WHEN ip_num BETWEEN 167772160 + 4 * 65536
                              AND 167772160 + 5 * 65536 - 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS in_slash16,
           CAST(COUNT(*) AS BIGINT) AS in_slash8,
           CAST(SUM(ip_num) AS BIGINT) AS parse_sum,
           CAST(SUM(CASE WHEN ip = ip THEN 1 ELSE 0 END) AS BIGINT)
             AS roundtrip_ok
    FROM ips
    """,
)
def fd_ipv4_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's IPv4 SQL trio (sql-scalar.md: IPV4_PARSE /
    IPV4_STRINGIFY / IPV4_MATCH) as raw SQL text: synthetic per-user
    addresses in 10.0.0.0/8, parsed to integers (summed — exercises
    every octet), matched against /16 and /8 CIDR subnets, and
    round-tripped through STRINGIFY(PARSE(ip)) = ip. Registered SQL
    UDFs of pure integer arithmetic — Catalyst inlines them, the
    oracle reproduces the arithmetic independently."""
    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH ips AS (
          SELECT concat('10.', CAST(user_id % 256 AS STRING), '.',
                        CAST((user_id * 7) % 256 AS STRING), '.',
                        CAST((user_id * 13) % 256 AS STRING)) AS ip
          FROM (SELECT DISTINCT user_id FROM events))
        SELECT CAST(SUM(CASE WHEN IPV4_MATCH(ip, '10.4.0.0/16')
                             THEN 1 ELSE 0 END) AS BIGINT) AS in_slash16,
               CAST(SUM(CASE WHEN IPV4_MATCH(ip, '10.0.0.0/8')
                             THEN 1 ELSE 0 END) AS BIGINT) AS in_slash8,
               CAST(SUM(IPV4_PARSE(ip)) AS BIGINT) AS parse_sum,
               CAST(SUM(CASE WHEN IPV4_STRINGIFY(IPV4_PARSE(ip)) = ip
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS roundtrip_ok
        FROM ips
        """
    )


@query(
    "fd_mv_extended_sql_text",
    oracle="""
    WITH w AS (
      SELECT p_partkey, string_split(p_name, ' ') AS words
      FROM part WHERE p_partkey <= 400)
    SELECT p_partkey,
           array_to_string(
             list_append(list_prepend('<s>', words), '</s>'), '|')
             AS framed,
           array_to_string(words[2:3], '|') AS middle,
           CAST(NULLIF(list_position(words, 'red'), 0) - 1 AS DOUBLE)
             AS red_offset,
           CAST(NULLIF(list_position(words, 'red'), 0) AS DOUBLE)
             AS red_ordinal
    FROM w ORDER BY p_partkey
    """,
)
def fd_mv_extended_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 MV mutators/locators as raw SQL text
    (sql-multivalue-string-functions.md): MV_PREPEND + MV_APPEND frame
    each part name's word list with sentinels (MV_CONCAT composes the
    same way), MV_SLICE cuts the 0-indexed [1, 3) middle window, and
    MV_OFFSET_OF / MV_ORDINAL_OF locate 'red' (NULL when absent;
    DuckDB's list_position answers 0 on no match, so the oracle
    NULLIFs it). All Catalyst-inlined SQL UDFs
    over one scan."""
    register_druid_sql_functions(spark)
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        WITH w AS (
          SELECT p_partkey, STRING_TO_MV(p_name, ' ') AS words
          FROM part WHERE p_partkey <= 400)
        SELECT p_partkey,
               MV_TO_STRING(
                 MV_APPEND(MV_PREPEND('<s>', words), '</s>'), '|')
                 AS framed,
               MV_TO_STRING(MV_SLICE(words, 1, 3), '|') AS middle,
               CAST(MV_OFFSET_OF(words, 'red') AS DOUBLE)
                 AS red_offset,
               CAST(MV_ORDINAL_OF(words, 'red') AS DOUBLE)
                 AS red_ordinal
        FROM w ORDER BY p_partkey
        """
    )


@query(
    "fd_bloom_sql_text",
    oracle="""
    WITH keys AS (
      SELECT DISTINCT user_id AS k FROM events
      WHERE event_type = 'click' AND user_id % 5 = 0),
    pos AS (
      SELECT CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                                     || CAST(k AS VARCHAR)), 1, 15)
                  AS BIGINT) % 2040 AS pos
      FROM keys, (SELECT unnest([0, 1, 2]) AS j) s),
    words AS (
      SELECT pos // 60 AS w,
             bit_or(1::BIGINT << CAST(pos % 60 AS INTEGER)) AS word
      FROM pos GROUP BY 1),
    du AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
    kp AS (
      SELECT user_id, CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                                     || CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 2040 AS pos
      FROM du, (SELECT unnest([0, 1, 2]) AS j) s),
    kh AS (
      SELECT user_id, count(*) AS nbits
      FROM kp JOIN words
        ON words.w = kp.pos // 60
       AND (words.word >> CAST(kp.pos % 60 AS INTEGER)) & 1 = 1
      GROUP BY 1),
    ok AS (
      SELECT user_id, COALESCE(nbits, 0) = 3 AS pass
      FROM du LEFT JOIN kh USING (user_id)),
    flags AS (
      SELECT COALESCE(ok.pass, FALSE) AS pass, (k.k IS NOT NULL) AS matched
      FROM events e
      LEFT JOIN ok USING (user_id)
      LEFT JOIN keys k ON k.k = e.user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)
             AS n_member,
           CAST(sum(CASE WHEN matched AND NOT pass THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_neg,
           CAST(sum(CASE WHEN NOT matched AND pass THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos
    FROM flags
    """,
)
def fd_bloom_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid's bloom-filter extension SQL names as raw SQL text
    (development/extensions-core/bloom-filter.md): BLOOM_FILTER(expr,
    numEntries) aggregates a filter, BLOOM_FILTER_TEST probes it —
    rewritten by rewrite_datasketches_sql onto the operators/bloom.py
    md5-bit machinery (3 bit positions over 60-bit words), so the
    DuckDB oracle reproduces every bit. The filter builds once (scalar
    subquery), broadcasts into the probe's stage, and the probe is
    in-codegen bit arithmetic — zero probe-side exchange, the j11
    runtime-filter posture. Columns pin the contract exactly:
    n_false_neg MUST be 0 (no false negatives, ever); n_pass/
    n_false_pos pin the full deterministic bitmap."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events", heavy_scan=True).createOrReplaceTempView("events")
    sql = rewrite_datasketches_sql(
        """
        WITH f AS (
          SELECT BLOOM_FILTER(user_id, 200) AS bf FROM events
          WHERE event_type = 'click' AND user_id % 5 = 0),
        keys AS (
          SELECT DISTINCT user_id AS k FROM events
          WHERE event_type = 'click' AND user_id % 5 = 0)
        SELECT
          CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN BLOOM_FILTER_TEST(e.user_id,
                 (SELECT bf FROM f)) THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pass,
          CAST(SUM(CASE WHEN k.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_member,
          CAST(SUM(CASE WHEN k.k IS NOT NULL AND NOT BLOOM_FILTER_TEST(
                 e.user_id, (SELECT bf FROM f)) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_neg,
          CAST(SUM(CASE WHEN k.k IS NULL AND BLOOM_FILTER_TEST(
                 e.user_id, (SELECT bf FROM f)) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_pos
        FROM events e LEFT JOIN keys k ON k.k = e.user_id
        """
    )
    return spark.sql(sql)


@query(
    "fd_ipv6_sql_text",
    oracle="""
    WITH a AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 97 = 0 THEN 'not:an:ip'
                  ELSE printf('2001:db8:%x::%x',
                              user_id % 256, event_id % 65536) END AS addr
      FROM events)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE event_id % 97 <> 0
                                   AND user_id % 256 = 160) AS BIGINT)
             AS m48,
           CAST(COUNT(*) FILTER (WHERE event_id % 97 <> 0
                                   AND (user_id % 256) // 16 = 10)
                AS BIGINT) AS m44,
           CAST(COUNT(*) FILTER (WHERE event_id % 97 <> 0) AS BIGINT)
             AS m0,
           CAST(COUNT(*) FILTER (WHERE event_id % 97 = 0) AS BIGINT)
             AS n_invalid
    FROM a
    """,
)
def fd_ipv6_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPV6_MATCH as raw SQL text (sql-scalar.md; the v6 partner of
    fd_ipv4_sql_text): deterministic addresses built from event keys —
    '2001:db8:<user hex>::<event hex>' with every 97th an unparsable
    decoy — matched against /48, /44 (mid-group prefix: a shifted
    16-bit compare), and ::/0 subnets. Address construction reduces
    each match to closed-form key arithmetic, so the oracle never
    parses an address; the rewrite expands '::' and compares 16-bit
    groups inside whole-stage codegen (no 128-bit arithmetic — engines
    cannot disagree on overflow). Invalid addresses count as FALSE in
    every subnet, pinned by n_invalid vs m0."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events", heavy_scan=True).createOrReplaceTempView("events")
    sql = rewrite_datasketches_sql(
        """
        WITH a AS (
          SELECT CASE WHEN event_id % 97 = 0 THEN 'not:an:ip'
                      ELSE format_string('2001:db8:%x::%x',
                             user_id % 256, event_id % 65536) END AS addr
          FROM events)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(CASE WHEN
                 IPV6_MATCH(addr, '2001:db8:a0::/48') THEN 1 END)
                 AS BIGINT) AS m48,
               CAST(COUNT(CASE WHEN
                 IPV6_MATCH(addr, '2001:db8:a0::/44') THEN 1 END)
                 AS BIGINT) AS m44,
               CAST(COUNT(CASE WHEN IPV6_MATCH(addr, '::/0') THEN 1 END)
                 AS BIGINT) AS m0,
               CAST(COUNT(CASE WHEN NOT IPV6_MATCH(addr, '::/0') THEN 1
                 END) AS BIGINT) AS n_invalid
        FROM a
        """
    )
    return spark.sql(sql)


@query(
    "fd_array_audit_sql_text",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, value,
             regexp_split_to_array(
               concat(event_type, '-', CAST(user_id % 3 AS VARCHAR)),
               '-') AS chars,
             list_sort(list_filter(
               [CAST(user_id % 5 AS DOUBLE), CAST(user_id % 11 AS DOUBLE),
                CAST(value AS DOUBLE), CAST(NULL AS DOUBLE)],
               x -> x IS NOT NULL)) AS s
      FROM events)
    SELECT event_type,
           CAST(SUM(CASE WHEN list_contains(
                 chars, CAST(user_id % 4 AS VARCHAR))
               THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
           CAST(SUM(CASE WHEN list_contains(
                 ['click', 'view'], event_type)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_cv,
           CAST(SUM(CAST(s[2] AS DECIMAL(38,8))) AS DOUBLE) AS med_sum,
           CAST(SUM(CAST(s[1] + 0.5 * (s[2] - s[1]) AS DECIMAL(38,8)))
             AS DOUBLE) AS q25_sum,
           MIN(array_to_string(chars, '|')) AS mv_str,
           MIN(array_to_string(chars, '#')) AS amv_str
    FROM e GROUP BY event_type ORDER BY event_type
    """,
)
def fd_array_audit_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 Druid SQL function-audit tail as raw SQL text:
    SCALAR_IN_ARRAY (Druid 30, type-generic argument-swap rewrite onto
    array_contains — probed both against a per-row split array and an
    array literal), ARRAY_QUANTILE (Druid 31, linear-interpolation
    quantile over the array's non-null numeric elements — rank 0.5
    lands on an element, rank 0.25 exercises the interpolation arm;
    the oracle replays the identical IEEE arithmetic on the sorted
    list), and the MV_TO_ARRAY / ARRAY_TO_MV conversion pair (identity
    / element-wise string cast — this engine's MVD representation IS
    ARRAY<STRING>). DECODE_BASE64_COMPLEX registers as a LOUD
    contract error (pinned in tests/test_broker.py), not a row here.
    Quantile sums accumulate in decimal(38,8) for cross-engine bit
    equality."""
    from ..functions.druid_sql import rewrite_datasketches_sql

    register_druid_sql_functions(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = rewrite_datasketches_sql(
        """
        WITH e AS (
          SELECT event_id, user_id, event_type, value,
                 STRING_TO_ARRAY(
                   concat(event_type, '-', CAST(user_id % 3 AS STRING)),
                   '-') AS chars,
                 ARRAY(CAST(user_id % 5 AS DOUBLE),
                       CAST(user_id % 11 AS DOUBLE),
                       CAST(value AS DOUBLE),
                       CAST(NULL AS DOUBLE)) AS nums
          FROM events)
        SELECT event_type,
               CAST(SUM(CASE WHEN SCALAR_IN_ARRAY(
                     CAST(user_id % 4 AS STRING), chars)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
               CAST(SUM(CASE WHEN SCALAR_IN_ARRAY(
                     event_type, ARRAY('click', 'view'))
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_cv,
               CAST(SUM(CAST(ARRAY_QUANTILE(nums, 0.5)
                   AS DECIMAL(38,8))) AS DOUBLE) AS med_sum,
               CAST(SUM(CAST(ARRAY_QUANTILE(nums, 0.25)
                   AS DECIMAL(38,8))) AS DOUBLE) AS q25_sum,
               MIN(ARRAY_TO_STRING(MV_TO_ARRAY(chars), '|')) AS mv_str,
               MIN(ARRAY_TO_STRING(ARRAY_TO_MV(chars), '#')) AS amv_str
        FROM e GROUP BY event_type ORDER BY event_type
        """
    )
    return spark.sql(sql)
