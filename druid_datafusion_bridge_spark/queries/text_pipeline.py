"""Registry queries for the training-data pipeline operators (build
mandate, beyond the reference's surface): sequence packing, repetition
signals, contamination checks, redaction. Each carries an exact DuckDB
oracle that recomputes the same deterministic result in SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query
from ..operators.text_pipeline import (
    contamination_check,
    redact,
    repetition_signals,
    sequence_pack,
)


@query(
    "txp_sequence_pack",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             doc_id % 8 AS shard
      FROM documents),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_tok
      FROM toks)
    SELECT doc_id, shard, n_tokens,
           CAST(floor(start_tok / 64.0) AS BIGINT) AS seq_in_shard,
           CAST(start_tok % 64 AS BIGINT) AS offset_in_seq
    FROM packed
    """,
)
def txp_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of documents into 64-token training
    sequences, 8 shards packed independently (see
    operators/text_pipeline.py for the scale shape)."""
    docs = table(spark, sf_dir, "documents")
    return sequence_pack(docs, budget=64, n_shards=8)


@query(
    "txp_repetition",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    per_tok AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct,
             CAST(MAX(c) AS BIGINT) AS top_count
      FROM per_tok GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct, top_count,
           CAST(top_count AS DOUBLE) / n_tokens AS top_token_share,
           CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens
             AS dup_token_frac
    FROM per_doc
    """,
)
def txp_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition quality signals (duplicate-token fraction,
    top-token share) — the boilerplate filter of a pretraining pipeline."""
    docs = table(spark, sf_dir, "documents")
    return repetition_signals(docs)


@query(
    "txp_contamination",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
               || t[i+4] AS g
      FROM toks, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS u(i)),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10)
    SELECT c.doc_id, COUNT(*) AS n_shared_grams
    FROM grams c JOIN bench USING (g)
    WHERE c.doc_id >= 10
    GROUP BY c.doc_id
    """,
)
def txp_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: corpus docs sharing a word 5-gram
    with the 'benchmark' (stand-in: doc_id < 10), by shared-shingle
    count. Benchmark shingles broadcast; corpus streams."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    return contamination_check(corpus, bench, n=5)


@query(
    "txp_redact",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]{3,}', '#', 'g') AS c_name_redacted,
           CAST(len(regexp_extract_all(c_name, '[0-9]{3,}')) AS BIGINT)
             AS n_redactions
    FROM customer
    """,
)
def txp_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style masking of long digit runs in customer names, with a
    per-row redaction count. (Spark regexp_replace is global by
    default; DuckDB needs the 'g' flag — pinned here.)"""
    cu = table(spark, sf_dir, "customer")
    return redact(cu, "c_name", pattern="[0-9]{3,}").select(
        "c_custkey", "c_name_redacted", "n_redactions"
    )
