"""Reusable DataFrame-to-DataFrame operators.

These are the engine's "custom operator" layer (SURVEY.md §7 Phase E):
compositions of built-in Spark SQL functions wherever semantics allow,
Pandas-UDF/`mapInPandas` only where they genuinely don't (multimodal
decode). Each operator takes and returns DataFrames so it composes with
the rest of a Catalyst plan and inherits pushdown/AQE.
"""
