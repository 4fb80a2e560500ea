"""Structured Streaming extension (SURVEY.md §2.10 / §7 Phase E).

The reference is strictly bounded/batch (Boundedness::Bounded at
reference src/datafusion_ext/execution_plan.rs:40-45); streaming is the
north-star extension: Druid's ingest-time rollup semantics re-expressed
as micro-batch Structured Streaming with watermarks.
"""
