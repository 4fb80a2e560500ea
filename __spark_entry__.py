"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over druid_datafusion_bridge_spark.queries — the registry of
(PySpark query, DuckDB oracle SQL) pairs covering SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from druid_datafusion_bridge_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Resolved through the registry (not a direct module import) so the
    registry's deliberate registration order is identical whether the
    driver calls entry() or queries() first.
    """
    return all_queries()["flagship_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registry query. Approximate
    operators (sketches, ANN) check their deterministic columns plus
    bounded-error contract flags both engines agree on, so nothing is
    left rows-only."""
    return all_oracles()
