"""Druid query-time lookups on Spark.

A Druid lookup is a small key->value table resident on every node's
heap (LookupExtractorFactory); SQL exposes it as ``LOOKUP(dim, 'name')``
returning NULL for unmapped keys, with ``COALESCE(LOOKUP(dim, 'name'),
dim)`` as the retainMissingValue form. The reference has no lookup
support at all — its SQL surface is whatever DataFusion 44 ships
(src/lib.rs SessionContext::sql delegation), and DataFusion has no
lookup extension registered there.

Two Spark-first forms (complementary; the scalar literal-map form for
driver-known dictionaries lives in functions/druid_sql.py ``lookup``):

- ``apply_lookup``: ``F.broadcast`` left join. Spark's
  BroadcastHashJoinExec IS the heap-resident map Druid keeps on every
  historical — the lookup ships once per executor and the fact side
  never shuffles; at 100 TB the mapped column rides the same stage as
  the scan.
- ``reverse_lookup_keys``: Druid's ReverseLookupRule — a filter on
  ``LOOKUP(dim) = v`` rewrites to ``dim IN (inverse image of v)``.
  Collecting the inverse image driver-side mirrors Druid exactly (the
  WHOLE lookup is heap-resident on every node by contract, so its
  inverse image is bounded by the lookup's own size, never by fact
  rows) — and the resulting IN-list is the shape the segment
  DataSource answers from the inverted-index bitmaps (dim_eq option,
  s1f path) without decoding a value column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_lookup(
    df: DataFrame,
    col: str,
    mapping: DataFrame,
    out_col: str,
    key_col: str = "k",
    value_col: str = "v",
    retain_missing: bool = False,
) -> DataFrame:
    """Map ``df[col]`` through the lookup ``mapping(key_col ->
    value_col)`` into ``out_col``. Unmapped keys yield NULL (Druid's
    default) or the original key when ``retain_missing`` (Druid's
    retainMissingValue=true). ``mapping`` must be unique-keyed — a
    Druid lookup is a map, and a duplicate key here would fan fact
    rows out through the join."""
    m = F.broadcast(
        mapping.select(
            F.col(key_col).alias("__lk_k"), F.col(value_col).alias("__lk_v")
        )
    )
    joined = df.join(m, df[col] == F.col("__lk_k"), "left")
    mapped: Column = (
        F.coalesce(F.col("__lk_v"), F.col(col))
        if retain_missing
        else F.col("__lk_v")
    )
    return joined.withColumn(out_col, mapped).drop("__lk_k", "__lk_v")


def reverse_lookup_keys(
    mapping: DataFrame,
    values: list,
    key_col: str = "k",
    value_col: str = "v",
) -> list:
    """Inverse image of ``values`` under the lookup: the key list that
    ``LOOKUP(dim) IN values`` reduces to (ReverseLookupRule). Returns a
    sorted, deduplicated driver-side list — bounded by the lookup's
    size (heap-resident by Druid contract), suitable for an IN push
    into the segment bitmap index or Catalyst's isin."""
    rows = (
        mapping.filter(F.col(value_col).isin(list(values)))
        .select(key_col)
        .distinct()
        .collect()
    )
    return sorted(r[0] for r in rows)
