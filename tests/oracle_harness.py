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


def _pandas_kinds(pdf) -> dict[str, str]:
    """Collapse pandas dtypes to kind letters (i/u folded to 'i')."""
    kinds = {}
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        kinds[c] = "i" if k == "u" else k
    return kinds


def _driver_mimic(df: DataFrame, rel, name: str) -> None:
    """Replicate the grading driver's pandas canonicalization hazards
    (round-1 findings):
    - DuckDB HUGEINT surfaces as float64 while Spark SUM(int) is int64:
      identical values, different value-hash. Caught by comparing pandas
      dtype *kinds* column-by-column.
    - array<...> columns crash the canonicalizer's sort_values with
      'unhashable type: list'. Caught by actually sorting both frames.
    """
    spark_pdf = df.toPandas()
    duck_pdf = rel.df()
    sk, dk = _pandas_kinds(spark_pdf), _pandas_kinds(duck_pdf)
    mismatched = {
        c: (sk[c], dk.get(c)) for c in sk if sk[c] != dk.get(c)
    }
    assert not mismatched, (
        f"{name}: pandas dtype-kind mismatch (spark, duck): {mismatched} — "
        "the driver's value-hash WILL differ even if values are equal. "
        "Typical fix: CAST(SUM(x) AS BIGINT) in the oracle SQL."
    )
    for side, pdf in (("spark", spark_pdf), ("duck", duck_pdf)):
        try:
            pdf.sort_values(by=sorted(pdf.columns))
        except TypeError as e:  # unhashable list/dict → driver canonicalizer crash
            raise AssertionError(
                f"{name}: {side} result is not pandas-sortable ({e}) — "
                "the driver canonicalizer will crash. Serialize array "
                "columns with array_join."
            ) from None


def compare(df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> None:
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    _driver_mimic(df, con.sql(sql), name)

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
