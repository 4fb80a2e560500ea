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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One parquet table as a DataFrame (lazy scan; pushdown-capable).

    events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    rejects; read nanos as long and convert to a microsecond timestamp
    (values carry no sub-microsecond component, so this is lossless and
    matches what DuckDB surfaces for the same file).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as DataFrames."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql path)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
