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


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Surface every temporal column as session-zoned TimestampType.

    Testdata generations differ: events.ts has been TIMESTAMP(NANOS)
    (unreadable by Spark's parquet reader except as long via
    nanosAsLong) and plain micros TIMESTAMP_NTZ; date-ish columns are
    isAdjustedToUTC=false so Spark infers TIMESTAMP_NTZ. The engine's
    query surface (and the round-recorded oracles) is written against
    TimestampType with session tz UTC — under which NTZ→TZ cast is a
    value-identity — so normalize here once instead of per-query.
    """
    out = df
    for field in df.schema.fields:
        type_name = field.dataType.typeName()
        if field.name == "ts" and type_name in ("long", "bigint"):
            # legacy nanos-as-long read: nanos → micros, lossless
            # (generator emits whole-microsecond values)
            out = out.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif type_name == "timestamp_ntz":
            out = out.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return out


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One parquet table as a DataFrame (lazy scan; pushdown-capable)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # harmless when ts is already a micros timestamp; required when a
        # testdata generation stores TIMESTAMP(NANOS)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_timestamps(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as DataFrames."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql path)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
