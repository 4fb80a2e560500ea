"""Resize operator: stub kernel determinism + real Spark plumbing
(binary-in/binary-out through Arrow batches, typed metadata)."""

from __future__ import annotations

from pyspark.sql import functions as F

from druid_datafusion_bridge_spark.operators.multimodal import (
    resize,
    with_binary_payload,
)
from druid_datafusion_bridge_spark.catalog import table

from .conftest import SF_DIR


def test_resize_payload_lengths_and_metadata(spark):
    docs = table(spark, SF_DIR, "documents").limit(200)
    out = resize(with_binary_payload(docs), 32, 32)
    rows = out.collect()
    assert len(rows) == 200
    out_len = (32 * 32) // 64  # stub target payload length
    for r in rows:
        assert r.target_w == 32 and r.target_h == 32
        assert 1 <= r.width <= 64 and 1 <= r.height <= 48
        assert len(r.payload) <= out_len
        assert len(r.payload) > 0


def test_resize_is_deterministic(spark):
    docs = table(spark, SF_DIR, "documents").limit(50)
    blobs = with_binary_payload(docs)
    a = {r.doc_id: bytes(r.payload) for r in resize(blobs, 32, 32).collect()}
    b = {r.doc_id: bytes(r.payload) for r in resize(blobs, 32, 32).collect()}
    assert a == b
    # payload bytes must be a subsequence of the source bytes
    src = {r.doc_id: bytes(r.payload) for r in blobs.collect()}
    for k, v in a.items():
        it = iter(src[k])
        assert all(ch in it for ch in v)
