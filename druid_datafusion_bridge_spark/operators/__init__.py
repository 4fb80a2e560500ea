"""Reusable DataFrame-to-DataFrame operators.

These are the engine's "custom operator" layer (SURVEY.md §7 Phase E):
compositions of built-in Spark SQL functions wherever semantics allow,
Pandas-UDF/`mapInPandas` only where they genuinely don't (multimodal
decode). Each operator takes and returns DataFrames so it composes with
the rest of a Catalyst plan and inherits pushdown/AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition to cluster parallelism before a CPU-heavy stage —
    but ONLY when the input is under-partitioned.

    Small inputs (single parquet file => single partition) would
    otherwise run hash/explode-heavy operators on one core. At real
    scale input splits already provide parallelism, so this is a no-op
    there (round-1 verdict #6: the unconditional form added a full
    shuffle a 100 TB scan never needs). The probe is df.inputFiles() —
    pure metadata from the already-listed file index (df.rdd would
    work too but pays ~0.5s of plan-to-RDD conversion per call). A
    many-partition scan of FEW huge splittable files repartitions
    unnecessarily — a cheap narrow-column shuffle, never a correctness
    or memory hazard.
    """
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    try:
        if len(df.inputFiles()) >= n:
            return df
    except Exception:
        pass  # non-file source: keep the rebalance
    return df.repartition(n)
