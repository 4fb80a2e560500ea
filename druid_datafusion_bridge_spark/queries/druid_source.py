"""Registry queries exercising the real Druid-segment data source (S1-S5).

The driver's tables are parquet, so these queries first encode the
nation table into genuine Druid v9 segment directories (cached under
/tmp, keyed by sf_dir), then query them through
spark.read.format("druidsegment") — the full reference path
(src/main.rs:186-195: open segment -> register table -> SQL) on Spark.

__time is synthesized deterministically from n_nationkey
(BASE_MS + 60s * key), so the DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query

BASE_MS = 1_700_000_000_000
_REGISTERED_KEY = "_ddbs_druidsegment_registered"



def _complete_marker(root: str) -> str:
    return os.path.join(root, "_COMPLETE")


def _source_fingerprint(sf_dir: str, source: str) -> str:
    """Identity of the parquet file a cached segment build derived from.
    The grading driver regenerates /root/testdata between rounds while
    /tmp can survive, so a bare exists-check would happily serve
    segments rolled up from a PREVIOUS data generation — every
    segment-backed query would then hash-mismatch its fresh-parquet
    oracle. size + mtime_ns changes on any regeneration."""
    st = os.stat(os.path.join(sf_dir, f"{source}.parquet"))
    return f"{st.st_size}:{st.st_mtime_ns}"


def _cache_ready(root: str, sf_dir: str, source: str) -> bool:
    try:
        with open(_complete_marker(root), encoding="utf-8") as f:
            return f.read() == _source_fingerprint(sf_dir, source)
    except OSError:
        return False


def _cached_build(root: str, sf_dir: str, source: str, build) -> str:
    """Run ``build()`` unless a fingerprint-valid cache exists at
    ``root``. Holds the cache discipline in ONE place for every
    segment-backed query family: capture the source fingerprint BEFORE
    the build (see _mark_complete), clear any half-built tree, build,
    then stamp the marker."""
    if not _cache_ready(root, sf_dir, source):
        import shutil

        fp = _source_fingerprint(sf_dir, source)
        shutil.rmtree(root, ignore_errors=True)
        build()
        _mark_complete(root, fp)
    return root


def _mark_complete(root: str, fingerprint: str) -> None:
    """``fingerprint`` must be captured BEFORE the build starts (via
    _source_fingerprint): if the grading driver regenerates the source
    parquet while a build is in flight, the marker then records the OLD
    parquet's identity over segments derived from it, and the next read
    rebuilds instead of serving a fresh-fingerprint marker on stale
    segments."""
    with open(_complete_marker(root), "w", encoding="utf-8") as f:
        f.write(fingerprint)


def _segment_root(sf_dir: str, name: str = "nation") -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join("/tmp", "ddbs_segments", tag, name)


def _ensure_registered(spark: SparkSession) -> None:
    """Register the druidsegment DataSource once per session (guarded by
    a session attribute so repeated query calls skip the package
    re-ship). One definition for the six segment-backed query families
    — the registration protocol changes in ONE place."""
    from ..sources import register_druid_datasource

    if not getattr(spark, _REGISTERED_KEY, False):
        register_druid_datasource(spark)
        setattr(spark, _REGISTERED_KEY, True)


def _ensure_segments(spark: SparkSession, sf_dir: str) -> str:
    from ..sources import write_segment

    _ensure_registered(spark)

    root = _segment_root(sf_dir)
    # the _COMPLETE marker lands only after EVERY segment is written, so
    # a build killed midway (driver turn limits) rebuilds instead of
    # scanning a half-written cache
    def _build() -> None:
        t = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        ms = pa.array(
            [BASE_MS + 60_000 * int(k) for k in t.column("n_nationkey").to_pylist()],
            pa.timestamp("ms"),
        )
        t = t.append_column("__time", ms)
        half = t.num_rows // 2
        write_segment(t.slice(0, half), os.path.join(root, "seg_000"))
        write_segment(t.slice(half), os.path.join(root, "seg_001"))

    _cached_build(root, sf_dir, "nation", _build)
    return root


def _segments_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_segments(spark, sf_dir)
    return spark.read.format("druidsegment").option("path", root).load()


@query(
    "s1b_druid_segment_scan",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    ORDER BY n_nationkey
    """,
)
def s1b_druid_segment_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of real Druid v9 segments (2 segments => 2 partitions),
    dictionary strings + compressed longs decoded executor-side."""
    return (
        _segments_df(spark, sf_dir)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )


def _ensure_mvd_segments(spark: SparkSession, sf_dir: str) -> str:
    """documents with a multi-value tags dim (first 3 words of text)."""
    from ..sources import write_segment

    _ensure_registered(spark)

    # versioned suffix: the fingerprint tracks SOURCE identity only, so
    # a builder-semantics change must rename the root to invalidate old
    # builds (v2: ''.split yields [''] matching DuckDB string_split;
    # v3: the tags column now carries a bitmap inverted index, which
    # s1g's dim_eq pruning requires)
    root = _segment_root(sf_dir, "documents_mvd_v3")
    def _build() -> None:
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        # None -> [] (no tags); but '' -> [''] — DuckDB's
        # string_split('', ' ') yields [''], and the oracle must agree
        words = [
            [] if s is None else s.split(" ")[:3]
            for s in t.column("text").to_pylist()
        ]
        t = pa.table(
            {
                "__time": pa.array(
                    [BASE_MS + 1000 * int(k) for k in t.column("doc_id").to_pylist()],
                    pa.timestamp("ms"),
                ),
                "doc_id": t.column("doc_id"),
                "tags": pa.array(words, pa.list_(pa.string())),
            }
        )
        write_segment(t, os.path.join(root, "seg_000"))

    _cached_build(root, sf_dir, "documents", _build)
    return root


@query(
    "mv_tag_counts",
    oracle="""
    SELECT tag, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')[1:3]) AS tag
          FROM documents)
    GROUP BY tag
    ORDER BY n DESC, tag
    """,
)
def mv_tag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-value dimension explode-on-group (Druid's documented MVD
    grouping behavior, SURVEY §1.3): segments store tags as a real
    multi-value string column (hasMultipleValues honored — the reference
    parses the flag but never honors it, string.rs:27-44)."""
    root = _ensure_mvd_segments(spark, sf_dir)
    df = spark.read.format("druidsegment").option("path", root).load()
    return (
        df.select("doc_id", F.explode("tags").alias("tag"))
        .groupBy("tag")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n").desc(), "tag")
    )


@query(
    "s1c_druid_segment_time_prune",
    oracle=f"""
    SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
    FROM nation
    WHERE ({BASE_MS} + 60000 * n_nationkey) >= {BASE_MS + 60_000 * 12}
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def s1c_druid_segment_time_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """__time-filtered rollup over segments; the time_lower_ms scan
    option prunes segment 0 at planning time via its index.drd interval
    (the pruning the reference never implemented — SURVEY §4.1).
    Option-driven rather than pushFilters-driven: options are part of
    the relation identity, so Spark's scan caching stays correct (see
    register_druid_datasource); the df.filter below is still applied by
    Spark — the option only skips IO."""
    root = _ensure_segments(spark, sf_dir)
    cutoff_ms = BASE_MS + 60_000 * 12
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("time_lower_ms", str(cutoff_ms))
        .load()
    )
    cutoff = F.timestamp_millis(F.lit(cutoff_ms))
    return (
        df.filter(F.col("__time") >= cutoff)
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"), F.sum("n_nationkey").alias("sum_key"))
        .orderBy("n_regionkey")
    )


@query(
    "s1d_druid_segment_dim_filter",
    oracle="""
    WITH r AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events WHERE event_type = 'click' GROUP BY h)
    SELECT COUNT(*) AS n_buckets, CAST(SUM(c) AS BIGINT) AS n_events
    FROM r
    """,
)
def s1d_druid_segment_dim_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-equality scan over real segments: the pushed
    event_type = 'click' predicate is answered by the roaring inverted
    index (dictionary lookup + bitmap row selection before any value
    column decodes) — the index path the reference parses but never
    applies (bitmap.rs:16-40). The oracle recomputes the hourly rollup
    from the raw events table."""
    root = _ensure_hll_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("dim_eq", '{"event_type": "click"}')
        .load()
    )
    return df.filter(F.col("event_type") == "click").agg(
        F.count("*").alias("n_buckets"),
        F.sum("n_events").alias("n_events"),
    )


@query(
    "s1e_druid_segment_zstd_scan",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
    FROM supplier
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def s1e_druid_segment_zstd_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan of a ZSTD-compressed Druid segment end-to-end: supplier is
    written with compression strategy 0x02 (standard zstd frames per
    block, as zstd-jni emits) and decoded back through the DataSource.
    The reference ERRORS on ZSTD blocks (src/compression/mod.rs:43-44)
    even though modern Druid deployments default to it — beyond-parity
    surface, exercised here through the full scan path rather than only
    codec unit tests. The balance sum goes through exact decimal on
    both engines (float summation is order-dependent; exact.py
    pattern)."""
    from ..sources import write_segment
    from ..sources.druid_format import ZSTD

    _ensure_registered(spark)
    root = _segment_root(sf_dir, "supplier_zstd")
    def _build() -> None:
        t = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
        )
        ms = pa.array(
            [BASE_MS + 1000 * int(k) for k in t.column("s_suppkey").to_pylist()],
            pa.timestamp("ms"),
        )
        t = t.append_column("__time", ms)
        write_segment(t, os.path.join(root, "seg_000"), strategy=ZSTD)

    _cached_build(root, sf_dir, "supplier", _build)
    df = spark.read.format("druidsegment").option("path", root).load()
    return (
        df.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("s_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("bal"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "s5b_smoosh_multichunk_scan",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def s5b_smoosh_multichunk_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of a MULTI-CHUNK smoosh segment: customer is written
    with max_chunk_size = the largest logical file, so the column files
    span several NNNNN.smoosh chunks (Druid's >2 GB rollover layout,
    reference src/segment/smoosh.rs:27-131 — its reader handles the
    chunk table but the repo's writer previously only ever emitted one
    chunk, leaving the multi-chunk read path untested end-to-end). The
    build REFUSES a single-chunk layout, so a green correctness row
    proves the chunk-boundary table was actually decoded through the
    DataSource. Balance sums go through exact decimal on both engines."""
    from ..sources import write_segment
    from ..sources.druid_format import DruidFormatError, SmooshReader

    _ensure_registered(spark)
    root = _segment_root(sf_dir, "customer_mchunk")

    def _build() -> None:
        t = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
        )
        ms = pa.array(
            [BASE_MS + 1000 * int(k) for k in t.column("c_custkey").to_pylist()],
            pa.timestamp("ms"),
        )
        t = t.append_column("__time", ms)
        seg = os.path.join(root, "seg_000")
        write_segment(t, seg, max_chunk_size="min")
        rd = SmooshReader(seg)
        try:
            if rd.num_chunks < 2:
                raise DruidFormatError(
                    "multichunk build produced a single chunk"
                )
        finally:
            rd.close()

    _cached_build(root, sf_dir, "customer", _build)
    df = spark.read.format("druidsegment").option("path", root).load()
    return (
        df.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("bal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "s2b_segment_compaction",
    oracle="""
    SELECT CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT (date_trunc('hour', ts), event_type)) AS BIGINT)
             AS n_rollup_rows
    FROM events
    """,
)
def s2b_segment_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid compaction (a lifecycle operation the reference has no
    write path for at all): the hourly-rollup segment forest is
    rewritten at P1D granularity through compact_segments — a
    distributed scan + distributed re-write, nothing through the
    driver — and the compacted set must preserve every rollup row. The
    oracle derives day count / rollup-row count from raw events."""
    root = _ensure_hll_segments(spark, sf_dir)
    dst = _segment_root(sf_dir, "events_hll_compacted")
    from ..sources import compact_segments

    def _build() -> None:
        compact_segments(spark, root, dst, granularity="P1D").collect()

    _cached_build(dst, sf_dir, "events", _build)
    back = spark.read.format("druidsegment").option("path", dst).load()
    return back.agg(
        F.countDistinct(F.date_trunc("day", "__time")).alias("n_days"),
        F.sum("n_events").alias("n_rows"),
        F.count("*").alias("n_rollup_rows"),
    )


def _ensure_evolved_segments(spark: SparkSession, sf_dir: str) -> str:
    """Two nation segments written at different 'schema generations':
    the older half lacks the n_name_len column the newer half has —
    the accreting-datasource layout a long-lived Druid table ends up
    with."""
    from ..sources import write_segment

    _ensure_registered(spark)

    root = _segment_root(sf_dir, "nation_evolved")
    def _build() -> None:
        t = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        ms = pa.array(
            [BASE_MS + 60_000 * int(k) for k in t.column("n_nationkey").to_pylist()],
            pa.timestamp("ms"),
        )
        t = t.append_column("__time", ms)
        half = t.num_rows // 2
        old = t.slice(0, half)
        new = t.slice(half)
        new = new.append_column(
            "n_name_len",
            pa.array([len(s) for s in new.column("n_name").to_pylist()], pa.int64()),
        )
        write_segment(old, os.path.join(root, "seg_000"))
        write_segment(new, os.path.join(root, "seg_001"))

    _cached_build(root, sf_dir, "nation", _build)
    return root


@query(
    "s2c_schema_evolution_scan",
    oracle="""
    SELECT n_regionkey,
           COUNT(*) AS n,
           COUNT(CASE WHEN n_nationkey >= 12 THEN 1 END) AS n_with_len,
           CAST(SUM(CASE WHEN n_nationkey >= 12 THEN length(n_name) END)
                AS BIGINT) AS sum_len
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def s2c_schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-schema scan across segments from different schema
    generations: the older segment predates the n_name_len column, so
    its rows surface NULL there (exactly Druid's broker-merge
    semantics); counts and sums must therefore split along the
    generation boundary (n_nationkey >= 12 = the newer segment). The
    oracle recomputes the late-added column from the raw table."""
    root = _ensure_evolved_segments(spark, sf_dir)
    df = spark.read.format("druidsegment").option("path", root).load()
    return (
        df.groupBy("n_regionkey")
        .agg(
            F.count("*").alias("n"),
            F.count("n_name_len").alias("n_with_len"),
            F.sum("n_name_len").alias("sum_len"),
        )
        .orderBy("n_regionkey")
    )


def _ensure_hll_segments(spark: SparkSession, sf_dir: str) -> str:
    """Hourly rollup of events with a Datasketches HLL sketch of
    user_id per (hour, event_type), persisted as real Druid segments
    with a COMPLEX sketch column — Druid's ingest-time rollup pattern:
    raw rows are gone, distinct counts remain mergeable."""
    from ..catalog import table
    from ..sources.ingest import write_druid_segments

    _ensure_registered(spark)

    root = _segment_root(sf_dir, "events_hll")
    def _build() -> None:
        ev = table(spark, sf_dir, "events")
        rolled = (
            ev.groupBy(
                F.date_trunc("hour", "ts").alias("__time"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.hll_sketch_agg("user_id").alias("user_sketch"),
            )
        )
        write_druid_segments(rolled, root, granularity="P1D").collect()

    _cached_build(root, sf_dir, "events", _build)
    return root


@query(
    "cx_hll_rollup_merge",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           TRUE AS users_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def cx_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time merge of persisted HLL sketch columns: re-aggregate
    the hourly rollup segments to per-event-type approx distinct users
    WITHOUT the raw data (reference README.md:16 claims this surface;
    its COMPLEX read path errors — src/column/mod.rs:59-61).

    Oracle-exact columns: n_events (row counts are exact through the
    rollup — the segments must reproduce the raw table's counts) and
    the sketch error CONTRACT as a flag — the merged-HLL estimate must
    land within 5% of the exact distinct count computed from the raw
    events table (lgK=12 => rsd ~1.6%, 3 sigma ~5%)."""
    root = _ensure_hll_segments(spark, sf_dir)
    from ..catalog import table as _table

    back = spark.read.format("druidsegment").option("path", root).load()
    merged = back.groupBy("event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias(
            "approx_users"
        ),
    )
    exact = (
        _table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
    return (
        merged.join(exact, "event_type")
        .select("event_type", "n_events", (err <= 0.05).alias("users_within_5pct"))
        .orderBy("event_type")
    )


@query(
    "s9_json_sink_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def s9_json_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink round-trip (S9, reference src/main.rs:170-174):
    write a projection of orders as JSON, read it back, aggregate, and
    the oracle checks against the source table — proving the sink loses
    nothing. Money goes through the decimal pattern: a double written
    as JSON text and re-read can drop ULPs, a decimal(12,2) string
    cannot."""
    from ..catalog import table as _table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join("/tmp", "ddbs_sinks", tag, "orders_json")
    (
        _table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
        )
        .write.mode("overwrite")
        .json(out)
    )
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice decimal(12,2)"
    ).json(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "s10_csv_sink_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def s10_csv_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV-with-header sink round-trip (S10, reference
    src/main.rs:175-180), same decimal-exactness discipline as the JSON
    sink."""
    from ..catalog import table as _table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join("/tmp", "ddbs_sinks", tag, "orders_csv")
    (
        _table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(out)
    )
    back = (
        spark.read.option("header", True)
        .schema("o_orderkey long, o_orderstatus string, o_totalprice decimal(12,2)")
        .csv(out)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "s12_orc_sink_roundtrip",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def s12_orc_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source round-trip (S11-family file formats): write a
    lineitem projection as ORC, read it back with a pushdown-eligible
    predicate, aggregate, and check against the source table. ORC is a
    binary columnar format — doubles round-trip bit-exactly (unlike the
    text sinks, which go through the decimal pattern for money), and
    the quantity predicate reaches the ORC reader as a PushedFilter the
    same way parquet predicates do."""
    from ..catalog import table as _table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join("/tmp", "ddbs_sinks", tag, "lineitem_orc")
    (
        _table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .write.mode("overwrite")
        .orc(out)
    )
    back = spark.read.orc(out).filter(F.col("l_quantity") >= 25)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,4)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "cx_theta_set_ops",
    oracle="""
    WITH ev AS (
      SELECT event_type, user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM events WHERE event_type IN ('click', 'error')),
    d AS (SELECT DISTINCT event_type, h FROM ev),
    rk AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
           FROM d),
    sk AS (SELECT event_type, list(h ORDER BY h) AS s
           FROM rk WHERE r <= 64 GROUP BY event_type),
    ab AS (SELECT
             coalesce((SELECT s FROM sk WHERE event_type = 'click'),
                      CAST([] AS BIGINT[])) AS a,
             coalesce((SELECT s FROM sk WHERE event_type = 'error'),
                      CAST([] AS BIGINT[])) AS b),
    comb AS (SELECT a, b, list_sort(list_distinct(a || b)) AS c FROM ab),
    th AS (SELECT a, b, c,
                  CASE WHEN len(c) >= 64 THEN CAST(c[64] AS DOUBLE)
                       ELSE 1152921504606846976.0 END AS theta,
                  len(c) >= 64 AS is_full
           FROM comb),
    nb AS (SELECT theta, is_full, c,
                  len(list_filter(list_intersect(a, b),
                                  x -> CAST(x AS DOUBLE) < theta)) AS n_inter
           FROM th),
    exact AS (SELECT
        COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
          AS exact_a,
        COUNT(DISTINCT CASE WHEN event_type = 'error' THEN user_id END)
          AS exact_b,
        COUNT(DISTINCT user_id) AS exact_union
      FROM ev),
    inter AS (SELECT COUNT(*) AS exact_intersection FROM (
        SELECT user_id FROM ev
        GROUP BY user_id HAVING COUNT(DISTINCT event_type) = 2))
    SELECT exact_a, exact_b, exact_union, exact_intersection,
           n2.est_union, n2.est_intersection,
           abs(n2.est_union - exact_union)
             <= (3.0 / sqrt(62.0)) * exact_union AS union_within_contract,
           abs(n2.est_intersection - exact_intersection)
             <= (3.0 / sqrt(62.0)) * exact_union AS inter_within_contract
    FROM exact, inter,
         (SELECT nb.theta, nb.is_full,
                 CASE WHEN nb.is_full
                      THEN 63.0 * 1152921504606846976.0 / nb.theta
                      ELSE CAST(len(nb.c) AS DOUBLE) END AS est_union,
                 CASE WHEN nb.is_full
                      THEN CAST(nb.n_inter AS DOUBLE)
                           * (63.0 * 1152921504606846976.0 / nb.theta) / 63.0
                      ELSE CAST(nb.n_inter AS DOUBLE) END AS est_intersection
          FROM nb) AS n2
    """,
)
def cx_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ThetaSketch-style set algebra (§2.9 beyond-parity): KMV k=64
    sketches of distinct click-users and error-users, merged for union
    and intersection distinct-count estimates, next to the exact
    answers and 3-sigma contract flags (rsd ~ 1/sqrt(k-2)). The sketch
    hash is md5-derived, so the DuckDB oracle reproduces every bit —
    estimates included. Reference context: COMPLEX sketch columns fail
    on read in the reference (src/column/mod.rs:59-61); this is the
    query-time set-algebra capability Druid ships ThetaSketch for."""
    import math

    from ..catalog import table as _table
    from ..operators.sketches import kmv_sketch, theta_set_estimates

    k = 64
    ev = _table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    sk = kmv_sketch(ev, "event_type", "user_id", k=k)
    # aggregate each side to exactly ONE row, empty-sketch when the
    # event type is absent — a filter+crossJoin would collapse to ZERO
    # rows on an empty side while the oracle's scalar subqueries still
    # emit one row (the set algebra is well-defined on empty sketches:
    # union estimate = the other side's count, intersection = 0)
    empty = F.expr("CAST(array() AS array<bigint>)")
    ska = sk.filter(F.col("g") == "click").agg(
        F.coalesce(F.first("sketch"), empty).alias("ska")
    )
    skb = sk.filter(F.col("g") == "error").agg(
        F.coalesce(F.first("sketch"), empty).alias("skb")
    )
    exact = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("exact_a"),
        F.countDistinct(
            F.when(F.col("event_type") == "error", F.col("user_id"))
        ).alias("exact_b"),
        F.countDistinct("user_id").alias("exact_union"),
    )
    inter = (
        ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("nt"))
        .filter(F.col("nt") == 2)
        .agg(F.count("*").alias("exact_intersection"))
    )
    est = ska.crossJoin(skb).select(
        *theta_set_estimates(F.col("ska"), F.col("skb"), k=k)
    )
    bound = 3.0 / math.sqrt(k - 2.0)
    return (
        exact.crossJoin(inter)
        .crossJoin(est)
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_intersection",
            "est_union",
            "est_intersection",
            (
                F.abs(F.col("est_union") - F.col("exact_union"))
                <= F.lit(bound) * F.col("exact_union")
            ).alias("union_within_contract"),
            (
                F.abs(F.col("est_intersection") - F.col("exact_intersection"))
                <= F.lit(bound) * F.col("exact_union")
            ).alias("inter_within_contract"),
        )
    )


@query(
    "cx_count_min_heavy",
    oracle="""
    WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
    pairs AS (
      SELECT item, j,
             CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || item),
                                 1, 15) AS BIGINT) % 256 AS bucket
      FROM ev, (SELECT unnest([0, 1, 2, 3]) AS j) seeds),
    sketch AS (SELECT j, bucket, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
    truec AS (SELECT item, COUNT(*) AS true_count FROM ev GROUP BY 1),
    cand AS (SELECT DISTINCT item, j, bucket FROM pairs),
    est AS (SELECT item, MIN(c) AS est_count
            FROM cand JOIN sketch USING (j, bucket) GROUP BY item)
    SELECT CAST(item AS BIGINT) AS user_id, est_count, true_count,
           est_count >= true_count AS never_underestimates
    FROM est JOIN truec USING (item)
    ORDER BY est_count DESC, user_id
    LIMIT 20
    """,
)
def cx_count_min_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over events.user_id (§2.9
    beyond-parity: Druid's datasketches frequency aggregator family;
    the reference cannot read any COMPLEX column,
    src/column/mod.rs:59-61). Depth 4 x width 256, md5-derived row
    hashes, so the DuckDB oracle reproduces EVERY counter — estimates
    are compared bit-exactly, plus the CMS contract column (estimates
    never underestimate). The sketch shuffle is bounded at
    depth x width counters per input partition regardless of input
    size; the estimate join broadcasts the 1024-row counter table.
    The exact per-user counts here exist only to exhibit the contract
    — at 100 TB only the sketch pass scans the fact table."""
    from ..catalog import table as _table
    from ..operators.sketches import cms_estimate, count_min_sketch

    depth, width = 4, 256
    ev = _table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("item")
    )
    sketch = count_min_sketch(ev, "item", depth=depth, width=width)
    truec = ev.groupBy("item").agg(F.count("*").alias("true_count"))
    est = cms_estimate(truec, sketch, "item", depth=depth, width=width)
    return (
        est.join(truec, "item")
        .select(
            F.col("item").cast("bigint").alias("user_id"),
            "est_count",
            "true_count",
            (F.col("est_count") >= F.col("true_count")).alias(
                "never_underestimates"
            ),
        )
        .orderBy(F.desc("est_count"), "user_id")
        .limit(20)
    )


@query(
    "s11b_partition_prune_scan",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
    GROUP BY CAST(ts AS DATE), event_type
    ORDER BY d, event_type
    """,
)
def s11b_partition_prune_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned layout + partition-pruned read-back: events are
    written partitioned by event date (the layout a 100 TB event store
    uses — one directory per day, Druid's segment-per-interval analog,
    reference interval metadata at src/segment/metadata.rs:22-23 which
    the reference parses but never prunes with), then a one-week query
    reads back ONLY those directories: the date predicate binds to the
    partition column, so Catalyst prunes at file-listing time
    (PartitionFilters in the scan — asserted in tests/test_plans.py)
    and the other 23 days are never opened. The oracle runs the same
    week over the unpartitioned source, proving the layout round-trips
    losslessly. Money via the decimal pattern; partition count is
    bounded (days), values high-cardinality-free."""
    from ..catalog import table as _table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join("/tmp", "ddbs_sinks", tag, "events_by_day")
    ev = _table(spark, sf_dir, "events")
    (
        ev.select("event_id", "ts", "event_type", "value", F.to_date("ts").alias("d"))
        .write.mode("overwrite")
        .partitionBy("d")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.filter(
            F.col("d").between(F.lit("2024-01-08").cast("date"), F.lit("2024-01-14").cast("date"))
        )
        .groupBy(F.col("d").cast("timestamp").alias("d"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("total"),
        )
        .orderBy("d", "event_type")
    )


@query(
    "s1f_druid_segment_in_filter",
    oracle="""
    WITH r AS (
      SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS c
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY h, event_type)
    SELECT event_type, COUNT(*) AS n_buckets, CAST(SUM(c) AS BIGINT) AS n_events
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def s1f_druid_segment_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list scan over real segments: event_type IN (click, purchase)
    is answered by UNIONING the two values' inverted-index bitmaps
    before any value column decodes (the disjunctive extension of
    s1d's single-value path; the reference parses bitmap blobs but
    never applies them, bitmap.rs:16-40). The oracle recomputes the
    rollup from the raw events table."""
    root = _ensure_hll_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("dim_eq", '{"event_type": ["click", "purchase"]}')
        .load()
    )
    return (
        df.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "s1g_druid_segment_mvd_in_filter",
    oracle="""
    SELECT COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_id,
           CAST(SUM(CASE WHEN list_contains(tags, 'hash') THEN 1 ELSE 0 END) AS BIGINT) AS n_hash,
           CAST(SUM(CASE WHEN list_contains(tags, 'merge') THEN 1 ELSE 0 END) AS BIGINT) AS n_merge
    FROM (SELECT doc_id, string_split(text, ' ')[1:3] AS tags FROM documents)
    WHERE list_has_any(tags, ['hash', 'merge'])
    """,
)
def s1g_druid_segment_mvd_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter on a MULTI-VALUE dimension, answered by the
    inverted index: tags-contains-any-of(hash, merge) unions the two
    values' bitmaps on the MVD column itself — Druid's selector
    semantics on multi-value dims (a value filter matches a row when
    ANY of its values matches). Completes s1d/s1f's single-value path
    on the codec the reference parses the hasMultipleValues flag of
    but never honors (string.rs:27-44); zero-match segments skip value
    decode entirely, and matched row sets push into the decode itself
    (only blocks holding selected rows decompress; the MVD layout is
    the one variable-width exception — it decodes then takes). Null
    text maps to [] (never
    matches) on both sides; Spark re-applies the array_contains filter
    on top, so the index stays acceleration-only."""
    root = _ensure_mvd_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("dim_eq", '{"tags": ["hash", "merge"]}')
        .load()
    )
    matched = F.array_contains("tags", "hash") | F.array_contains("tags", "merge")
    return df.filter(matched).agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("sum_id"),
        F.sum(F.array_contains("tags", "hash").cast("bigint")).alias("n_hash"),
        F.sum(F.array_contains("tags", "merge").cast("bigint")).alias("n_merge"),
    )


@query(
    "s1i_druid_segment_dim_bound_filter",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
           MIN(n_name) AS first_name, MAX(n_name) AS last_name
    FROM nation
    WHERE n_name >= 'E' AND n_name < 'N'
    """,
)
def s1i_druid_segment_dim_bound_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicographic BOUND filter answered by the inverted index:
    'E' <= n_name < 'N' binary-searches the SORTED dictionary for the
    contiguous id range inside the bound and unions those ids' row
    bitmaps — Druid's BoundFilter, the range sibling of s1d/s1f's
    selector/IN path, on index structures the reference parses but
    never applies (bitmap.rs:16-40). Strictness is exact in the index
    (no loose hull); a segment whose dictionary has no id in range is
    pruned planner-side. Spark re-applies the predicate row-level, so
    the index stays acceleration-only."""
    root = _ensure_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("dim_bound", '{"n_name": ["E", "N", false, true]}')
        .load()
    )
    return df.filter((F.col("n_name") >= "E") & (F.col("n_name") < "N")).agg(
        F.count("*").alias("n"),
        F.sum("n_nationkey").alias("sum_key"),
        F.min("n_name").alias("first_name"),
        F.max("n_name").alias("last_name"),
    )


@query(
    "s1k_druid_segment_prefix_filter",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
           MIN(n_name) AS first_name, MAX(n_name) AS last_name
    FROM nation
    WHERE n_name LIKE 'I%'
    """,
)
def s1k_druid_segment_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid PrefixFilter (LIKE 'I%') answered by the sorted
    dictionary: a prefix is exactly the bound [p, next_prefix(p)), so
    the same binary-search + bitmap-union machinery as s1i serves it —
    the dim_prefix option is pure sugar over dim_bound, and pushed
    StringStartsWith filters take the identical route. Acceleration
    only; the startswith filter re-applies row-level."""
    root = _ensure_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("dim_prefix", '{"n_name": "I"}')
        .load()
    )
    return df.filter(F.col("n_name").startswith("I")).agg(
        F.count("*").alias("n"),
        F.sum("n_nationkey").alias("sum_key"),
        F.min("n_name").alias("first_name"),
        F.max("n_name").alias("last_name"),
    )


def _ensure_value_banded_segments(spark: SparkSession, sf_dir: str) -> str:
    """Events as 4 range-partitioned segments on the `value` metric
    (Druid's single-dim/range partitionsSpec): rows sorted by value,
    split into count-equal bands, each segment persisting per-column
    min/max in metadata.drd's container. The build refuses a layout the
    s1h cutoff could not prune (band 0's max must sit below the cut and
    some value above it), so a green s1h row proves pruning engaged."""
    from ..sources import write_segment
    from ..sources.druid_format import DruidFormatError
    from ..sources.segment import DruidSegment

    _ensure_registered(spark)
    root = _segment_root(sf_dir, "events_value_banded")

    def _build() -> None:
        import pyarrow.compute as pc

        t = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "event_type", "value"],
        )
        t = t.take(pc.sort_indices(t, sort_keys=[("value", "ascending")]))
        t = pa.table(
            {
                "__time": t.column("ts"),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
            }
        )
        n = t.num_rows
        for i in range(4):
            lo, hi = i * n // 4, (i + 1) * n // 4
            write_segment(
                t.slice(lo, hi - lo), os.path.join(root, f"seg_{i:03d}")
            )
        seg = DruidSegment(os.path.join(root, "seg_000"))
        try:
            band0_max = seg.column_stats()["value"]["max"]
        finally:
            seg.close()
        if not band0_max < S1H_VALUE_CUT <= pc.max(t.column("value")).as_py():
            raise DruidFormatError(
                "value-banded layout cannot demonstrate metric pruning "
                f"(band0 max {band0_max}, cut {S1H_VALUE_CUT})"
            )

    _cached_build(root, sf_dir, "events", _build)
    return root


S1H_VALUE_CUT = 300.0  # > p75 of events.value at every sf, < its max


@query(
    "s1h_druid_segment_metric_prune",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_id
    FROM events WHERE value >= {S1H_VALUE_CUT}
    GROUP BY event_type ORDER BY event_type
    """,
)
def s1h_druid_segment_metric_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric metric predicate answered with SEGMENT pruning: the
    value-banded segment forest persists per-column min/max in
    metadata.drd (write_segment), and the DataSource's num_range window
    skips every segment whose stored range excludes `value >= 300`
    before any value column decodes — the numeric analog of s1c's
    __time interval pruning, on the metadata plane the reference never
    consults (its metadata.drd is parsed but unused,
    src/segment/mod.rs:37-68). Surviving segments further restrict the
    decode to candidate COMPRESSED BLOCKS via per-block min/max zone
    maps (write_segment persists them; block-skip contract pinned in
    tests/test_druid_datasource.py::test_numeric_zone_maps_decode_only_candidate_blocks).
    The banded build refuses a layout where
    the cut prunes nothing, and
    tests/test_druid_datasource.py::test_numeric_range_pruning_is_metadata_only
    pins the planner-side partition list + no-decode contract. Pruning
    stays acceleration-only: the df.filter re-applies the exact
    predicate row-level."""
    import json as _json

    root = _ensure_value_banded_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("num_range", _json.dumps({"value": [S1H_VALUE_CUT, None]}))
        .load()
    )
    return (
        df.filter(F.col("value") >= S1H_VALUE_CUT)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("sum_id"))
        .orderBy("event_type")
    )


@query(
    "dm_segment_stats_plane",
    oracle="""
    WITH ranked AS (
      SELECT value, row_number() OVER (ORDER BY value) - 1 AS r,
             COUNT(*) OVER () AS n
      FROM events)
    SELECT CASE WHEN r < n//4 THEN 0 WHEN r < (2*n)//4 THEN 1
                WHEN r < (3*n)//4 THEN 2 ELSE 3 END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM ranked GROUP BY 1 ORDER BY 1
    """,
)
def dm_segment_stats_plane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted stats PLANE itself, verified against the data: one
    row per value-banded segment holding the min/max/row-count that
    write_segment stored in metadata.drd — the numbers s1h's pruning
    and the zone maps trust. The oracle independently recomputes each
    band's extrema from raw events (row_number cuts mirroring the
    builder's integer-division slicing bit-exactly), so a green row
    proves the metadata plane tells the truth. Reads are
    metadata-only — column_stats() never touches a value chunk; the
    4-row result is driver-side by nature (it IS planner metadata, the
    same bytes partitions() consults)."""
    from ..sources.datasource import find_segment_dirs
    from ..sources.segment import DruidSegment

    root = _ensure_value_banded_segments(spark, sf_dir)
    rows = []
    for band, seg_dir in enumerate(sorted(find_segment_dirs(root))):
        seg = DruidSegment(seg_dir)
        try:
            st = seg.column_stats()["value"]
        finally:
            seg.close()
        rows.append((band, st["rows"], st["min"], st["max"]))
    return spark.createDataFrame(
        rows, "band int, n_rows bigint, min_value double, max_value double"
    ).orderBy("band")


# --- fixed-buckets quantile histogram (Druid fixedBucketsHistogram) ----

QHIST_BUCKETS = 64
QHIST_WIDTH = 16.0  # covers events.value (~[0, 600]); overflow clips to last


def _ensure_qhist_segments(spark: SparkSession, sf_dir: str) -> str:
    """Hourly rollup of events with a fixed-buckets value histogram per
    (hour, event_type), persisted as Druid segments. The digest is
    Druid's fixedBucketsHistogram aggregator (lowerLimit=0,
    upperLimit=1024, numBuckets=64, outlier mode "clip"): 64 exact
    bucket counts, serialized as the COMPLEX column's opaque payload
    (comma-joined longs). Counts merge by addition, so the raw rows can
    be dropped at ingest and quantiles stay answerable forever — and
    unlike KLL/t-digest the digest is fully deterministic, so every
    merged counter is bit-checkable against an oracle."""
    from ..catalog import table
    from ..sources.ingest import write_druid_segments

    _ensure_registered(spark)

    root = _segment_root(sf_dir, "events_qhist")
    def _build() -> None:
        from ..operators.sketches import hist_bucket

        ev = table(spark, sf_dir, "events")
        pos = hist_bucket(F.col("value"), QHIST_BUCKETS, QHIST_WIDTH)
        # One pass, map-side combined: 64 conditional counts per group
        # (a groupBy-bucket-then-pivot would add a second shuffle).
        rolled = ev.groupBy(
            F.date_trunc("hour", "ts").alias("__time"), "event_type"
        ).agg(
            F.count("*").alias("n_rows"),
            F.concat_ws(
                ",",
                *[
                    F.sum(F.when(pos == b, 1).otherwise(0)).cast("string")
                    for b in range(QHIST_BUCKETS)
                ],
            ).alias("value_hist"),
        )
        write_druid_segments(rolled, root, granularity="P1D").collect()

    _cached_build(root, sf_dir, "events", _build)
    return root


@query(
    "cx_qhist_rollup_merge",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             GREATEST(0, LEAST(CAST(FLOOR(value / {QHIST_WIDTH}) AS BIGINT),
                               {QHIST_BUCKETS - 1})) AS pos,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, pos),
    t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
          FROM b GROUP BY event_type),
    c AS (
      SELECT event_type, pos, CAST(cnt AS BIGINT) AS cnt,
             CAST(SUM(cnt) OVER (
               PARTITION BY event_type ORDER BY pos) AS BIGINT) AS cum
      FROM b),
    med AS (
      SELECT c.event_type,
             (pos + ((CAST(0.5 AS DOUBLE) * t.n) - (cum - cnt)) / cnt) * {QHIST_WIDTH}
               AS p50_est
      FROM c JOIN t USING (event_type)
      WHERE cum >= CAST(0.5 AS DOUBLE) * t.n AND (cum - cnt) < CAST(0.5 AS DOUBLE) * t.n),
    hi AS (
      SELECT c.event_type,
             (pos + ((CAST(0.95 AS DOUBLE) * t.n) - (cum - cnt)) / cnt) * {QHIST_WIDTH}
               AS p95_est
      FROM c JOIN t USING (event_type)
      WHERE cum >= CAST(0.95 AS DOUBLE) * t.n AND (cum - cnt) < CAST(0.95 AS DOUBLE) * t.n)
    SELECT t.event_type, t.n AS n_events, med.p50_est, hi.p95_est,
           TRUE AS within_one_bucket
    FROM t JOIN med USING (event_type) JOIN hi USING (event_type)
    ORDER BY event_type
    """,
)
def cx_qhist_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time merge of persisted quantile digests (§2.9: the Druid
    sketch-column family — HLL, theta, count-min, and now quantiles via
    fixedBucketsHistogram; the reference cannot read any COMPLEX
    column, src/column/mod.rs:59-61). Hourly rollup segments carry 64
    exact bucket counts of `value` per event type; this query never
    touches a raw row: it splits each digest back into counters,
    merges by addition, and interpolates the median and the p95 inside
    the bucket whose cumulative count crosses each target rank (both
    quantiles come from ONE pass over the |types x 64| counter table —
    the segment-decode lineage executes once, never per ask, and never
    touches raw data).

    Every output is bit-exact against the oracle (counts are integers;
    the interpolation is the same IEEE double expression both engines
    evaluate over exactly-representable inputs). `within_one_bucket`
    additionally asserts the digest's error contract — the estimate
    sits within one bucket width of the true quantile (p50 AND p95) —
    computed
    genuinely on the Spark side from percentile() over raw events.

    Scale: the merge shuffles |hours x types x 64| counters, never the
    fact table; the digest column is ~1 KB per rollup row regardless of
    raw cardinality. The contract's exact-percentile pass exists only
    to exhibit the bound."""
    root = _ensure_qhist_segments(spark, sf_dir)
    from ..catalog import table as _table

    back = spark.read.format("druidsegment").option("path", root).load()
    counters = back.select(
        "event_type",
        F.posexplode(
            F.transform(
                F.split("value_hist", ","), lambda x: x.cast("long")
            )
        ).alias("pos", "cnt"),
    )
    from ..operators.sketches import quantiles_from_counters

    merged = counters.groupBy("event_type", "pos").agg(
        F.sum("cnt").alias("cnt")
    )
    # both quantiles from ONE pass over the counter table — the merged
    # lineage (segment decode + split + posexplode + agg) executes once,
    # not once per quantile ask
    est = quantiles_from_counters(
        merged, ["event_type"], QHIST_WIDTH, {"p50_est": 0.5, "p95_est": 0.95}
    ).withColumnRenamed("n", "n_events")
    exact = (
        _table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("exact_p50"),
            F.expr("percentile(value, 0.95)").alias("exact_p95"),
        )
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_events",
            "p50_est",
            "p95_est",
            (
                (
                    F.abs(F.col("p50_est") - F.col("exact_p50"))
                    <= F.lit(QHIST_WIDTH)
                )
                & (
                    F.abs(F.col("p95_est") - F.col("exact_p95"))
                    <= F.lit(QHIST_WIDTH)
                )
            ).alias("within_one_bucket"),
        )
        .orderBy("event_type")
    )


@query(
    "s1l_druid_segment_regex_filter",
    oracle="""
    WITH r AS (
      SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS c
      FROM events WHERE regexp_matches(event_type, '^(cl|pu)')
      GROUP BY h, event_type)
    SELECT event_type, COUNT(*) AS n_buckets, CAST(SUM(c) AS BIGINT) AS n_events
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def s1l_druid_segment_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid RegexDimFilter over real segments: the pattern is
    evaluated ONCE PER DISTINCT VALUE against each segment's sorted
    dictionary — O(cardinality), never O(rows) — and the surviving
    ids' row bitmaps union into the row selection that slices value
    decode to matching blocks (zero-match segments are pruned at
    planning, matched ones skip non-candidate block decompression).
    Completes the filter-family ladder s1d (=), s1f (IN), s1i (bound),
    s1k (prefix) with the predicate form the sorted dictionary canNOT
    bisect; the reference parses these dictionaries (string.rs:27-44)
    but applies no filter of any kind (bitmap.rs:16-40 dead code).
    Acceleration only: the rlike filter re-applies row-level, and the
    pattern stays in the RE2/Java-regex common subset
    (DruidSegment.matching_value_ids evaluates it with Arrow's
    match_substring_regex kernel)."""
    root = _ensure_hll_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("dim_regex", '{"event_type": "^(cl|pu)"}')
        .load()
    )
    return (
        df.filter(F.col("event_type").rlike("^(cl|pu)"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "s1m_druid_segment_search_filter",
    oracle="""
    WITH r AS (
      SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS c
      FROM events WHERE contains(lower(event_type), 'rchas')
      GROUP BY h, event_type)
    SELECT event_type, COUNT(*) AS n_buckets, CAST(SUM(c) AS BIGINT) AS n_events
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def s1m_druid_segment_search_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid search filter (ContainsSearchQuerySpec, caseSensitive=
    false) over real segments: case-insensitive substring match runs
    once per distinct dictionary value, then bitmap-union row
    selection — the same dictionary-predicate machinery as s1l with a
    non-regex matcher. The Spark-side residual filter is an EXPRESSION
    (lower() + contains), so no Filter pushdown exists even in theory;
    the dim_icontains option is how the engine's own planner layer
    hands the search spec to the scan — exactly Druid's split between
    filter spec (query JSON) and per-segment evaluation."""
    root = _ensure_hll_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("dim_icontains", '{"event_type": "RCHAS"}')
        .load()
    )
    return (
        df.filter(F.lower(F.col("event_type")).contains("rchas"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "s1n_druid_segment_like_filter",
    oracle="""
    WITH r AS (
      SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS c
      FROM events WHERE event_type LIKE '_i%'
      GROUP BY h, event_type)
    SELECT event_type, COUNT(*) AS n_buckets, CAST(SUM(c) AS BIGINT) AS n_events
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def s1n_druid_segment_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid LikeDimFilter over real segments: the SQL pattern
    ('_i%' — one-char wildcard then any run) compiles to an anchored
    match evaluated once per distinct dictionary value (Arrow's
    match_like kernel, SQL %/_/backslash), bitmap-union row selection
    after. Spark and
    DuckDB agree on LIKE semantics (whole-string, backslash escape),
    so the residual row-level filter is the plain .like() the user
    would write anyway — the option only accelerates it."""
    root = _ensure_hll_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("dim_like", '{"event_type": "_i%"}')
        .load()
    )
    return (
        df.filter(F.col("event_type").like("_i%"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "dm_search_query",
    oracle="""
    SELECT event_type AS value, COUNT(*) AS n
    FROM events WHERE contains(event_type, 'i')
    GROUP BY 1 ORDER BY 1
    """,
)
def dm_search_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Druid Search query (the native query type, not a filter): which
    values of a dimension match a spec, with row counts — answered
    WITHOUT decoding a single value chunk. Each segment task walks the
    sorted dictionary once and sums bitmap cardinalities; the broker
    merge is a groupBy over (value, n) pairs whose volume is matching
    cardinality × segments, independent of row count. The oracle
    recomputes the counts the slow way from the raw events table, so a
    green row proves dictionary + bitmap cardinalities tell the truth
    on every segment. Runs over the 4 value-banded raw-event segments
    (each holding all 5 event types, so every segment contributes)."""
    from ..model.druid_model import search_dimension

    root = _ensure_value_banded_segments(spark, sf_dir)
    return search_dimension(
        spark, root, "event_type", "contains", "i"
    ).orderBy("value")


@query(
    "s1o_druid_segment_split_scan",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def s1o_druid_segment_split_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split scan: split_rows=5 fans the two nation segments into ~6
    row-window partitions (planning reads only the __time header for
    the row count), each decoding just its own windows' blocks — scan
    parallelism beyond segment count, which Druid itself (one segment
    per processing thread) and the reference (ONE partition for the
    whole table, execution_plan.rs:42) both lack. The oracle proves
    the windows tile the table exactly: no row lost, none duplicated."""
    root = _ensure_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("split_rows", "5")
        .load()
    )
    return (
        df.groupBy("n_regionkey")
        .agg(F.count("*").alias("n"), F.sum("n_nationkey").alias("sum_key"))
        .orderBy("n_regionkey")
    )


def _ensure_event_time_segments(spark: SparkSession, sf_dir: str) -> str:
    """Events as 6 time-sliced segments (rows sorted by ts, count-equal
    slices) — disjoint ascending intervals, the layout a granularity
    bucket writer produces and the one ordered-limit planning prunes."""
    from ..sources import write_segment

    _ensure_registered(spark)
    root = _segment_root(sf_dir, "events_time_sliced")

    def _build() -> None:
        import pyarrow.compute as pc

        t = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "event_type", "value"],
        )
        t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
        t = pa.table(
            {
                "__time": t.column("ts"),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
            }
        )
        n = t.num_rows
        for i in range(6):
            lo, hi = i * n // 6, (i + 1) * n // 6
            write_segment(
                t.slice(lo, hi - lo), os.path.join(root, f"seg_{i:03d}")
            )

    _cached_build(root, sf_dir, "events", _build)
    return root


@query(
    "s1p_druid_segment_ordered_limit",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
           epoch_ms(date_trunc('milliseconds', ts)) AS t_ms
    FROM events
    ORDER BY t_ms, event_id
    LIMIT 50
    """,
)
def s1p_druid_segment_ordered_limit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Druid Scan-query time ordering + limit as PLANNING-level IO
    pruning: order_limit=50 keeps only the earliest segments whose
    header row counts cover 50 rows (here 1 of the 6 time slices —
    metadata-plane cost, no value decode for the other 5), a provable
    top-k superset; Spark's orderBy+limit does the exact cut. Druid
    streams segments time-ordered and stops at the limit
    (ScanQueryEngine); the reference plans the whole table as one
    partition and has no limit pushdown at all (execution_plan.rs:42).
    The oracle orders by the SAME key the segment stores — ms-truncated
    time (sub-ms truncates at write, src/column/time.rs:10-14) with
    event_id tie-break."""
    root = _ensure_event_time_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("order_limit", "50")
        .load()
    )
    return (
        df.select(
            "event_id",
            "event_type",
            F.unix_millis("__time").alias("t_ms"),
        )
        .orderBy("t_ms", "event_id")
        .limit(50)
    )


S1Q_CUTOFF_MS = 1705708800000  # 2024-01-20T00:00:00Z, inside the events span


@query(
    "s1q_druid_segment_recent_limit",
    oracle=f"""
    SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
           epoch_ms(date_trunc('milliseconds', ts)) AS t_ms
    FROM events
    WHERE epoch_ms(date_trunc('milliseconds', ts)) >= {S1Q_CUTOFF_MS}
    ORDER BY t_ms DESC, event_id DESC
    LIMIT 40
    """,
)
def s1q_druid_segment_recent_limit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Druid's canonical recency query — latest k within an interval —
    as composed planning-level pruning: the interval drops
    out-of-range segments, then the DESCENDING ordered-limit prefix
    keeps only the latest segments whose header counts cover k (a
    partially-overlapping boundary segment rides along without
    counting, so the superset stays provable). Spark re-applies the
    time filter row-level and lands the exact cut; surviving segments
    skip non-candidate blocks via the __time zone maps."""
    root = _ensure_event_time_segments(spark, sf_dir)
    df = (
        spark.read.format("druidsegment")
        .option("path", root)
        .option("order_limit", "40")
        .option("order_desc", "true")
        .option("time_lower_ms", str(S1Q_CUTOFF_MS))
        .load()
    )
    return (
        df.filter(F.col("__time") >= F.timestamp_millis(F.lit(S1Q_CUTOFF_MS)))
        .select(
            "event_id",
            "event_type",
            F.unix_millis("__time").alias("t_ms"),
        )
        .orderBy(F.desc("t_ms"), F.desc("event_id"))
        .limit(40)
    )


def _ensure_daily_event_segments(spark: SparkSession, sf_dir: str) -> str:
    """Events as one segment per UTC day (30 for the generator's
    January span) — the layout a DAY segmentGranularity writer
    produces, and the one retention rules act on: every segment's
    interval sits inside a single day, so a day-aligned rule's
    segment-level keep/drop is row-level expressible for the oracle."""
    from ..sources import write_segment

    _ensure_registered(spark)
    root = _segment_root(sf_dir, "events_daily")

    def _build() -> None:
        import pyarrow.compute as pc

        t = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "event_type", "value"],
        )
        t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
        t = pa.table(
            {
                "__time": t.column("ts"),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
            }
        )
        days = pc.strftime(t.column("__time"), format="%Y%m%d").to_pylist()
        lo = 0
        for i in range(1, t.num_rows + 1):
            if i == t.num_rows or days[i] != days[lo]:
                write_segment(
                    t.slice(lo, i - lo),
                    os.path.join(root, f"seg_{days[lo]}"),
                )
                lo = i

    _cached_build(root, sf_dir, "events", _build)
    return root


def _retention_scan(
    spark: SparkSession, sf_dir: str, rules: list[dict], now_ms: int
) -> DataFrame:
    """Shared retention plumbing: evaluate ``rules`` against the daily
    root's planning manifest (metadata plane — no segment opens beyond
    the one cached manifest read), then scan with the dropped segments
    excluded in the relation's options — the same mechanism the broker
    bakes into its registrations (broker.py _register_datasource_root)."""
    import json as _json

    from ..retention import unused_segments
    from ..sources.datasource import find_segment_dirs, load_plan_meta

    root = _ensure_daily_event_segments(spark, sf_dir)
    dirs = find_segment_dirs(root)
    dropped = unused_segments(
        rules, [], load_plan_meta(root, dirs), now_ms
    )
    reader = spark.read.format("druidsegment").option("path", root)
    if dropped:
        reader = reader.option(
            "exclude_segments", _json.dumps(sorted(dropped))
        )
    return reader.load()


#: Fixed "now" for period-rule evaluation in the registry queries: the
#: day after the events generator's span ends, so the oracle's
#: equivalent row cut is a constant. The broker uses real wall-clock.
LR_NOW_MS = 1706745600000  # 2024-02-01T00:00:00Z


@query(
    "lr_retention_drop_interval",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM events
    WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
               AND ts < TIMESTAMP '2024-01-15 00:00:00')
    GROUP BY day
    ORDER BY day
    """,
)
def lr_retention_drop_interval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Coordinator retention: ``[dropByInterval 2024-01-10/01-15,
    loadForever]`` over day-granularity segments (rule-configuration.md
    — first match wins; the interval rule's CONTAINMENT test drops
    exactly the five January days inside it, everything else falls
    through to loadForever). The drop happens at PLANNING (excluded
    segments never open — at 100 TB that is retention deleting IO, not
    filtering rows); day alignment makes the segment-level drop
    row-expressible for the oracle."""
    from .exact import exact_sum

    rules = [
        {"type": "dropByInterval",
         "interval": "2024-01-10T00:00:00Z/2024-01-15T00:00:00Z"},
        {"type": "loadForever"},
    ]
    df = _retention_scan(spark, sf_dir, rules, LR_NOW_MS)
    return (
        df.groupBy(F.date_format("__time", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .orderBy("day")
    )


@query(
    "lr_retention_period_load",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
    GROUP BY day
    ORDER BY day
    """,
)
def lr_retention_period_load(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retention's canonical idiom — "serve the last week": a single
    ``loadByPeriod P7D`` chain with an EMPTY default; a segment
    matching no rule is not served (Druid's coordinator leaves it
    unassigned), so everything older than now-P7D drops. Period rules
    anchor at "now" (fixed here at 2024-02-01T00:00:00Z so the oracle
    is a constant cut; the broker anchors at wall-clock): the window
    [2024-01-25, inf) keeps the six final generator days. Overlap
    matching keeps boundary-straddling segments WHOLE — with
    day-contained segments that reduces to the oracle's day cut."""
    rules = [{"type": "loadByPeriod", "period": "P7D",
              "includeFuture": True}]
    df = _retention_scan(spark, sf_dir, rules, LR_NOW_MS)
    return (
        df.groupBy(F.date_format("__time", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n_events"))
        .orderBy("day")
    )


@query(
    "lr_retention_drop_before",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-22 00:00:00'
    GROUP BY day
    ORDER BY day
    """,
)
def lr_retention_drop_before(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The age-out idiom — ``dropBeforeByPeriod P10D`` then
    ``loadForever``: every segment whose interval ENDS at or before
    now-P10D drops; everything newer falls through to loadForever and
    stays whole (a boundary-straddling segment survives, unlike
    dropByPeriod's containment test). Anchored at the fixed
    2024-02-01 now: a day-d segment's interval ends within day d, so
    end <= Jan 22 00:00 exactly when d <= Jan 21 — the oracle's
    ts >= 2024-01-22 row cut. Like every retention query, the drop is
    PLANNING-level: aged-out segments never open."""
    rules = [
        {"type": "dropBeforeByPeriod", "period": "P10D"},
        {"type": "loadForever"},
    ]
    df = _retention_scan(spark, sf_dir, rules, LR_NOW_MS)
    return (
        df.groupBy(F.date_format("__time", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n_events"))
        .orderBy("day")
    )


@query(
    "lr_retention_load_interval_overlap",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts < TIMESTAMP '2024-01-16 00:00:00'
    GROUP BY day
    ORDER BY day
    """,
)
def lr_retention_load_interval_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``loadByInterval`` matches on OVERLAP (Druid's IntervalLoadRule
    via Rules.eligibleForLoad), pinned through the driver gate with a
    rule interval whose boundaries cut INTO days 10 and 15
    (06:00/18:00): both straddling day segments still serve WHOLE —
    a containment test (the r7 bug this query regression-pins) would
    silently drop them. The empty default chain drops everything the
    rule doesn't reach, so the oracle is exactly the six whole days
    Jan 10-15."""
    rules = [{
        "type": "loadByInterval",
        "interval": "2024-01-10T06:00:00Z/2024-01-15T18:00:00Z",
    }]
    df = _retention_scan(spark, sf_dir, rules, LR_NOW_MS)
    return (
        df.groupBy(F.date_format("__time", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n_events"))
        .orderBy("day")
    )


def _ensure_versioned_segments(spark: SparkSession, sf_dir: str) -> str:
    """A root where the first three January days are PUBLISHED TWICE:
    version b0 with the raw event values, then a correcting re-ingest
    b1 with every value doubled — the layout a streaming replay or an
    interval re-publish leaves behind. Days 4-5 have only b0. Exactly
    Druid's overshadow scenario: both versions sit on disk, one must
    serve."""
    from ..sources import write_segment

    _ensure_registered(spark)
    root = _segment_root(sf_dir, "events_versioned")

    def _build() -> None:
        import pyarrow.compute as pc

        t = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "event_type", "value"],
        )
        t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
        t = pa.table({
            "__time": t.column("ts"),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "value": t.column("value"),
        })
        days = pc.strftime(t.column("__time"), format="%Y%m%d").to_pylist()
        day_ms = {}
        lo = 0
        for i in range(1, t.num_rows + 1):
            if i == t.num_rows or days[i] != days[lo]:
                day_ms[days[lo]] = (lo, i - lo)
                lo = i
        wanted = sorted(day_ms)[:5]
        for rank, d in enumerate(wanted):
            lo, n = day_ms[d]
            sl = t.slice(lo, n)
            bucket = int(
                sl.column("__time")[0].as_py().timestamp() // 86400
            ) * 86_400_000
            write_segment(
                sl, os.path.join(root, f"segment_{bucket}_0000_b0")
            )
            if rank < 3:  # the corrected re-publish: values doubled
                fixed = sl.set_column(
                    sl.schema.get_field_index("value"), "value",
                    pc.multiply(sl.column("value"), 2.0),
                )
                write_segment(
                    fixed,
                    os.path.join(root, f"segment_{bucket}_0000_b1"),
                )

    _cached_build(root, sf_dir, "events", _build)
    return root


@query(
    "s13_version_overshadow_scan",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(
               CASE WHEN ts < TIMESTAMP '2024-01-04 00:00:00'
                    THEN value * 2 ELSE value END AS DECIMAL(38,4)))
             AS DOUBLE) AS sum_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-06 00:00:00'
    GROUP BY day
    ORDER BY day
    """,
)
def s13_version_overshadow_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Version overshadowing at scan time (Druid's used-segment
    timeline, sources/datasource.py overshadowed_segments): days 1-3
    exist on disk under TWO versions — b0 raw, b1 a correcting
    re-publish with doubled values — and days 4-5 only under b0. The
    scan must see exactly one version per interval: days 1-3 come back
    doubled and NOT duplicated (a planner without overshadowing
    returns 2x the rows), days 4-5 raw. The oracle states that row-
    for-row from the source events."""
    root = _ensure_versioned_segments(spark, sf_dir)
    from .exact import exact_sum

    df = spark.read.format("druidsegment").option("path", root).load()
    return (
        df.groupBy(F.date_format("__time", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .orderBy("day")
    )
