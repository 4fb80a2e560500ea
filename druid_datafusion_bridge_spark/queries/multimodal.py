"""Multimodal query registrations. The SQL-expressible metadata layer
carries an oracle; the mapInPandas decode pipeline is rows-only (not
SQL-expressible) with exact plumbing asserted in pytest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from . import query
from ..operators.multimodal import extract_features, frame_sample, with_binary_payload


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata (blob length / first byte / checksum) —
    the multimodal metadata layer, computed JVM-side."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.ascii(F.substring("text", 1, 1)).cast("long").alias("first_byte"),
        F.md5(F.col("text")).alias("payload_md5"),
    )


@query("mm_feature_extract")  # mapInPandas pipeline => rows-only
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode -> feature extraction through Arrow-batched
    mapInPandas (decode kernel stubbed; plumbing real)."""
    docs = table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs))


@query(
    "mm_frame_sample",
    oracle="""
    WITH blobs AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes
                   FROM documents),
    frames AS (
      SELECT doc_id, n_bytes,
             unnest(generate_series(0,
               greatest(CAST(ceil(n_bytes / 32.0) AS INT), 1) - 1)) AS frame_idx
      FROM blobs)
    SELECT doc_id, frame_idx,
           frame_idx * 32 AS byte_offset,
           least(32, n_bytes - frame_idx * 32) AS chunk_len
    FROM frames
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride frame/chunk sampling over binary payloads (video
    frame-sample plumbing; JVM-side sequence/explode)."""
    docs = table(spark, sf_dir, "documents")
    blobs = with_binary_payload(docs).select("doc_id", "n_bytes")
    return frame_sample(blobs, every_n_bytes=32)
