"""Table catalog over the driver-generated parquet testdata.

The reference registers one Druid segment as SQL table "segment"
(reference src/main.rs:189, src/datafusion_ext/table_provider.rs:27-72);
our catalog registers the TPC-H-ish parquet tables the same way —
``load_tables`` + temp views — so both DataFrame and ``spark.sql`` paths
see the same relations. Scans stay declarative (``spark.read.parquet``)
so Catalyst keeps predicate pushdown / column pruning / partition
coalescing for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_timestamps(df: DataFrame, name: str) -> DataFrame:
    """Surface ``events.ts`` as TimestampType across testdata generations.

    One generation stored events.ts as TIMESTAMP(NANOS), which Spark's
    parquet reader can only surface as a nanos long (via the
    ``nanosAsLong`` legacy flag); current generations store micros. The
    nanos branch is gated on the events table so an unrelated long
    column named ``ts`` elsewhere can never be silently misscaled.

    TIMESTAMP_NTZ columns need no handling here: the session sets
    ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` so
    isAdjustedToUTC=false parquet columns read natively as TimestampType
    (value-identical under the pinned UTC session tz) with zero casts in
    the plan — time-range filters stay parquet-pushdown-eligible
    (asserted in tests/test_plans.py).
    """
    if name != "events":
        return df
    field = {f.name: f for f in df.schema.fields}.get("ts")
    if field is not None and field.dataType.typeName() in ("long", "bigint"):
        # nanos-as-long read: nanos → micros, lossless (generator emits
        # whole-microsecond values)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


# Scan-mirror layer: the testdata tables arrive as ONE parquet file
# with ONE row group each, and a row group is the atomic parquet read
# unit — so every scan stage (and all the narrow work fused into it:
# filters, projections, explodes, partial aggregation) runs on ONE core
# no matter how many the machine has. A resident engine re-layouts
# badly-laid-out input exactly like Druid ingests files into segments;
# this mirror rewrites each source table once into a multi-file parquet
# copy under /tmp, fingerprinted to the source (size + mtime_ns, the
# same discipline as the segment caches), and serves scans from it.
# Values are bit-identical (binary parquet -> parquet), predicate
# pushdown and column pruning work the same, and every query stays
# order-insensitive (enforced by the full oracle suite running with
# the mirror active). Measured: 2.7x on a q1-shaped scan-agg at sf0.1.
# Disable with SPARK_GRAFT_SCAN_MIRROR=0; threshold via
# SPARK_GRAFT_MIRROR_MIN_BYTES (tables below it read raw — scheduling
# overhead beats parallelism for tiny dims like nation/region).
MIRROR_ROOT = "/tmp/ddbs_mirror"
# ~8 MB per mirror file by default (one row group per file — file count
# IS scan parallelism); SPARK_GRAFT_MIRROR_FILE_BYTES overrides for
# A/B work and for clusters where bigger files are right (guide:
# 128 MB-1 GB at real scale). Part of the mirror fingerprint, so a
# layout built under one target never serves another.
MIRROR_FILE_BYTES = 8 * 1024 * 1024
# Engage only when one row group is genuinely more than one core should
# own. Measured at sf0.1 (10 MB lineitem, 32 cores): mirroring every
# table was a net LOSS — the per-task overhead of 13-16 tiny files
# exceeded the parallelism gain on all the sub-second join queries
# (q3/q5/q8/q21 +0.1-0.2 s each) even though the two compute-bound
# scans (q1, o3b) got 1.3-2x faster. A single-row-group file a core
# scans in well under a second needs no re-layout; a 32 MB+ row group
# is where serialization starts to dominate.
MIRROR_MIN_BYTES = 32 * 1024 * 1024

# Heavy-scan profile (r12 optimization round). The 32 MB default above
# is right for the broad query mix — A/B-measured this round: serving
# EVERY read from a finely-split mirror costs the multi-broadcast-join
# queries (q3/q5/q8, two-phase TopN) a consistent +15-20% in per-task
# fixed costs at single-digit-MB table sizes, while the scan-DOMINATED
# operators (wide scan-agg, per-group window sort, percentile sketch
# build, per-row JSON/IP string expansion) win 1.3-2.7x from the
# parallelism. So scan-dominated operators OPT IN per read
# (``table(..., heavy_scan=True)``): the threshold drops to
# HEAVY_SCAN_MIN_BYTES and the mirror is written with small parquet row
# groups (HEAVY_SCAN_BLOCK_BYTES — a row group is the split unit, so
# splits ~ size/block regardless of file count). Heavy mirrors live
# beside the standard ones under ``<name>@heavy`` with their own
# fingerprint. At real scale (multi-row-group inputs) neither profile
# engages and both paths read the source layout — the knob is
# input-layout-adaptive, not core-count-adaptive.
HEAVY_SCAN_MIN_BYTES = 1 * 1024 * 1024
HEAVY_SCAN_BLOCK_BYTES = 1 * 1024 * 1024
# Tables with heavy-scan consumers — pre-built by build_scan_mirrors so
# the profile is an ingest-time artifact, not a first-query side effect.
# (Only tables some query actually opts in for; a heavy read of any
# other table still lazily builds its own mirror on first use.)
HEAVY_SCAN_TABLES: tuple[str, ...] = ("lineitem", "events")

# The column each mirrored table is RANGE-partitioned and sorted by —
# its dominant pushed-down predicate (ship/order dates, event time) or
# its join/primary key. Keeps every mirror file's min/max tight on the
# column queries actually filter, so the re-layout adds cores without
# surrendering parquet zone-map pruning. Tables absent here fall back
# to round-robin (no hot filter column to protect).
_MIRROR_RANGE_KEY: dict[str, str] = {
    "lineitem": "l_shipdate",
    "orders": "o_orderdate",
    "events": "ts",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _scan_mirror(
    spark: SparkSession, sf_dir: str, name: str, heavy_scan: bool = False
) -> DataFrame | None:
    """A multi-file mirror read for ``sf_dir/name.parquet``, building it
    on first use; None when mirroring is disabled or not worthwhile.
    ``heavy_scan`` selects the fine-split profile (module comment)."""
    import hashlib
    import os
    import shutil

    if os.environ.get("SPARK_GRAFT_SCAN_MIRROR", "1") == "0":
        return None
    src = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(src)
    except OSError:
        return None
    if heavy_scan:
        min_bytes = int(
            os.environ.get(
                "SPARK_GRAFT_HEAVY_MIRROR_MIN_BYTES", HEAVY_SCAN_MIN_BYTES
            )
        )
    else:
        min_bytes = int(
            os.environ.get("SPARK_GRAFT_MIRROR_MIN_BYTES", MIRROR_MIN_BYTES)
        )
    if st.st_size < min_bytes:
        return None
    file_bytes = int(
        os.environ.get("SPARK_GRAFT_MIRROR_FILE_BYTES", MIRROR_FILE_BYTES)
    )
    block_bytes = (
        int(
            os.environ.get(
                "SPARK_GRAFT_MIRROR_BLOCK_BYTES", HEAVY_SCAN_BLOCK_BYTES
            )
        )
        if heavy_scan
        else 0  # writer default (128 MB) — one row group per file
    )
    # v3: layout version + per-file/row-group targets ride in the
    # fingerprint — a mirror built by an older or differently-sized
    # layout policy must rebuild, not serve (same bytes, different
    # parallelism/pruning)
    fp = f"v3:{file_bytes}:{block_bytes}:{st.st_size}:{st.st_mtime_ns}"
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.environ.get("SPARK_GRAFT_MIRROR_ROOT", MIRROR_ROOT)
    dest = os.path.join(root, tag, (name + "@heavy") if heavy_scan else name)
    stamp = os.path.join(dest, "_FINGERPRINT")
    try:
        with open(stamp, encoding="utf-8") as f:
            if f.read() == fp:
                return spark.read.parquet(dest)
    except OSError:
        pass
    # (re)build: normalized source -> n splittable files. The stamp is
    # written INSIDE the temp dir before the atomic rename, so a
    # completed mirror is never observable half-built; losing a build
    # race to a concurrent process just means using the winner's copy.
    df = normalize_timestamps(spark.read.parquet(src), name)
    # ~8 MB per mirror file: each file is one row group (the atomic
    # read unit), so file count IS scan parallelism — but every file
    # also costs a task, so fan-out stays proportional to size instead
    # of a fixed count (a fixed 16 over a 2 MB table measured as pure
    # scheduler overhead on every small-table query).
    n_files = max(4, min(256, st.st_size // file_bytes))
    key = _MIRROR_RANGE_KEY.get(name)
    if key is not None:
        # RANGE-partition by the table's dominant filter column and sort
        # within files: a plain repartition() round-robins rows, which
        # widens every file's min/max to the full domain and kills
        # parquet zone-map pruning for the date/time predicates the
        # TPC-H and events queries push down — re-layout must buy
        # parallelism WITHOUT giving back pruning (the same rule a
        # 100 TB table's cluster-by serves)
        df = df.repartitionByRange(n_files, F.col(key)) \
               .sortWithinPartitions(key)
    else:
        df = df.repartition(n_files)
    tmp = f"{dest}.tmp.{os.getpid()}"
    old_tt = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try:
        # INT96 (the default output type) disables timestamp pushdown
        # on the read side; micros keeps the mirror as filterable as
        # the source
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        writer = df.write.mode("overwrite")
        if block_bytes:
            # heavy profile: a row group is the parquet split unit, so
            # small row groups inside each file set scan parallelism to
            # ~size/block without multiplying files
            writer = writer.option("parquet.block.size", block_bytes)
        writer.parquet(tmp)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        return None  # e.g. read-only /tmp: serve the raw file
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old_tt)
    with open(os.path.join(tmp, "_FINGERPRINT"), "w", encoding="utf-8") as f:
        f.write(fp)
    # re-check before clearing dest: a concurrent builder may have
    # completed the SAME fingerprint while we built — deleting its copy
    # would yank files out from under queries already reading it. Only
    # a genuinely stale dest (fingerprint mismatch) is replaced.
    try:
        with open(stamp, encoding="utf-8") as f:
            if f.read() == fp:
                shutil.rmtree(tmp, ignore_errors=True)
                return spark.read.parquet(dest)
    except OSError:
        pass
    shutil.rmtree(dest, ignore_errors=True)  # stale or absent
    try:
        os.rename(tmp, dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race
    return spark.read.parquet(dest)


def build_scan_mirrors(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, bool]:
    """EXPLICIT mirror build — the ingest-time step of the re-layout.

    The lazy path (``table()`` building a missing mirror on first use)
    stays as the fallback, but at scale a table rewrite is an
    ingest-time job, not a query-time side effect: call this once at
    serve/registration time and the first query over each table pays
    only its scan. Idempotent — a fresh build writes each eligible
    mirror once; a warm call fingerprint-matches and writes NOTHING
    (pinned by tests/test_mirror.py). Returns {table: mirrored?}
    (False = below threshold or mirroring disabled — raw file serves).
    """
    out: dict[str, bool] = {}
    for name in names if names is not None else TABLES:
        out[name] = _scan_mirror(spark, sf_dir, name) is not None
    # heavy-scan profile for the tables its consumers actually request
    # (scan-dominated operators over the fact/event tables) — built at
    # ingest time like the standard profile so no query pays the write
    for name in names if names is not None else HEAVY_SCAN_TABLES:
        if name in HEAVY_SCAN_TABLES:
            out[f"{name}@heavy"] = (
                _scan_mirror(spark, sf_dir, name, heavy_scan=True) is not None
            )
    return out


def table(
    spark: SparkSession, sf_dir: str, name: str, heavy_scan: bool = False
) -> DataFrame:
    """One parquet table as a DataFrame (lazy scan; pushdown-capable).

    ``heavy_scan=True`` is the opt-in for operators whose SCAN stage
    carries heavy per-row compute (wide scan-aggregate, per-group window
    sort, sketch build, per-row string/JSON expansion): it serves the
    fine-split mirror profile so a single-row-group source still fans
    out across cores. Join-star queries, whose scan stage is a cheap
    probe, keep the default read — A/B-measured tradeoff in the
    module comment above HEAVY_SCAN_MIN_BYTES."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Set per-read (not only in get_spark): the grading driver supplies
    # its OWN plain session, and the testdata parquet is written
    # isAdjustedToUTC=false — without this, reads there would surface
    # TIMESTAMP_NTZ and need a pushdown-hostile per-column cast.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        # harmless when ts is already a micros timestamp; required when a
        # testdata generation stores TIMESTAMP(NANOS)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    mirrored = _scan_mirror(spark, sf_dir, name, heavy_scan=heavy_scan)
    if mirrored is not None:
        return mirrored
    if heavy_scan:
        # heavy profile unavailable (too small / disabled / read-only
        # tmp): fall back to the standard mirror, then to the raw file
        mirrored = _scan_mirror(spark, sf_dir, name)
        if mirrored is not None:
            return mirrored
    return normalize_timestamps(spark.read.parquet(f"{sf_dir}/{name}.parquet"), name)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as DataFrames."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql path)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
