"""Query registry: name -> (PySpark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin
re-exports of these dicts. Policy: a query only carries an oracle if it
matches the DuckDB result EXACTLY (bit-identical values) — enforced by
tests/test_oracle.py. Queries whose semantics are approximate or not
SQL-expressible register with ``oracle=None`` (driver does rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is equivalent DuckDB SQL (or None)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from . import (  # noqa: F401
        aggregates,
        dedup,
        druid_functions,
        druid_model,
        druid_source,
        joins,
        multimodal,
        relational,
        scalar_funcs,
        setops,
        similarity,
        streaming,
        temporal,
        text_analysis,
        text_pipeline,
        topn_search,
        tpch,
        tpch_full,
        tpch_subqueries,
        windows,
    )


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)


def run(spark: SparkSession, name: str, sf_dir: str) -> Any:
    load_all()
    return QUERIES[name](spark, sf_dir)
