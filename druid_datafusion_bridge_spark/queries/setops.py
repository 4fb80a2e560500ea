"""Set operations U1-U3 (SURVEY.md §2.7) — DELEGATED in the reference
(src/main.rs:191)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping projections of orders (overlap => interesting
    distinct/intersect/except semantics)."""
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 50000).select("o_custkey", "o_orderstatus")
    b = orders.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")).select(
        "o_custkey", "o_orderstatus"
    )
    return a, b


_A = "SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 50000"
_B = (
    "SELECT o_custkey, o_orderstatus FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01'"
)


@query("u1_union_all", oracle=f"({_A}) UNION ALL ({_B})")
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.unionAll(b)


@query("u1b_union_distinct", oracle=f"({_A}) UNION ({_B})")
def u1b_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.union(b).distinct()


@query("u2_intersect", oracle=f"({_A}) INTERSECT ({_B})")
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.intersect(b)


@query("u2b_intersect_all", oracle=f"({_A}) INTERSECT ALL ({_B})")
def u2b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.intersectAll(b)


@query("u3_except", oracle=f"({_A}) EXCEPT ({_B})")
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.subtract(b)


@query("u3b_except_all", oracle=f"({_A}) EXCEPT ALL ({_B})")
def u3b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.exceptAll(b)
