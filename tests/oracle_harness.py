"""Strict differential harness: Spark result vs DuckDB oracle.

Deliberately at least as strict as the driver's check (row count, schema
arity, order-insensitive exact value comparison): columns sorted by name,
rows canonically sorted, values compared exactly (NaN==NaN allowed).
If a pair passes here it passes any order-insensitive value hash.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal
from typing import Any

import duckdb
from pyspark.sql import DataFrame


def _norm(v: Any) -> Any:
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("nan",) if math.isnan(v) else ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm(x) for x in v))
    if v is None:
        return ("null",)
    return ("o", str(v))


def _canon_rows(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> None:
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = _canon_rows(spark_rows, spark_cols)
    b = _canon_rows(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(
            f"{name}: values differ; first diffs (spark vs duck): {diffs}"
        )
