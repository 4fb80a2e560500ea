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


def _segment_root(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join("/tmp", "ddbs_segments", tag, "nation")


def _ensure_segments(spark: SparkSession, sf_dir: str) -> str:
    from ..sources import register_druid_datasource, write_segment

    if not getattr(spark, _REGISTERED_KEY, False):
        register_druid_datasource(spark)
        setattr(spark, _REGISTERED_KEY, True)

    root = _segment_root(sf_dir)
    if not os.path.isfile(os.path.join(root, "seg_000", "version.bin")):
        t = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        ms = pa.array(
            [BASE_MS + 60_000 * int(k) for k in t.column("n_nationkey").to_pylist()],
            pa.timestamp("ms"),
        )
        t = t.append_column("__time", ms)
        half = t.num_rows // 2
        write_segment(t.slice(0, half), os.path.join(root, "seg_000"))
        write_segment(t.slice(half), os.path.join(root, "seg_001"))
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


@query(
    "s1c_druid_segment_time_prune",
    oracle=f"""
    SELECT n_regionkey, COUNT(*) AS n, SUM(n_nationkey) AS sum_key
    FROM nation
    WHERE ({BASE_MS} + 60000 * n_nationkey) >= {BASE_MS + 60_000 * 12}
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def s1c_druid_segment_time_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """__time-filtered rollup over segments; the pushed filter prunes
    segment 0 at planning time via its index.drd interval (the pruning
    the reference never implemented — SURVEY §4.1)."""
    df = _segments_df(spark, sf_dir)
    cutoff = F.timestamp_millis(F.lit(BASE_MS + 60_000 * 12))
    return (
        df.filter(F.col("__time") >= cutoff)
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"), F.sum("n_nationkey").alias("sum_key"))
        .orderBy("n_regionkey")
    )
