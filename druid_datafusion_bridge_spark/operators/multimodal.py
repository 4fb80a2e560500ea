"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked stub (deterministic fake features) — but everything
Spark-side is real and tested: the binary schema, Arrow batch transfer
through mapInPandas, batch shapes, and partitioning. Swapping the stub
for PIL/torchaudio is a one-function change.

Scale notes: payloads stay in executor-side Arrow batches end-to-end
(never collected); feature extraction is mapInPandas so one Python
worker per core streams batches; `spark.sql.execution.arrow
.maxRecordsPerBatch` bounds peak memory for large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, width int, height int, "
    "feat array<float>"
)


def with_binary_payload(
    docs: DataFrame, text_col: str = "text", modality: str = "image"
) -> DataFrame:
    """Attach an opaque binary payload column + typed metadata, the way a
    100 TB multimodal table stores blobs (binary + sidecar metadata
    columns; real pipelines point at object storage instead of inlining)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(modality).alias("modality"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decode kernel — deterministic fake for container without
    codecs. Real implementation would be e.g. PIL.Image.open(BytesIO(b)).

    Derives (width, height, 4-dim feature) from the bytes so tests can
    assert exact plumbing correctness.
    """
    n = len(payload)
    width = (n % 64) + 1
    height = (n % 48) + 1
    s = sum(payload[:16]) if n else 0
    feat = [float(n), float(s), float(payload[0] if n else 0), float(n % 7)]
    return width, height, feat


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: one pandas batch in, one out per Arrow chunk; the UDF
    boundary carries only (doc_id, payload, modality, n_bytes).
    """

    # Defined inside the closure so cloudpickle ships it by value — a
    # module-level reference would require this package on the worker's
    # sys.path, which a driver launched outside the repo doesn't have.
    def decode(payload: bytes) -> tuple[int, int, list[float]]:
        n = len(payload)
        width = (n % 64) + 1
        height = (n % 48) + 1
        s = sum(payload[:16]) if n else 0
        feat = [float(n), float(s), float(payload[0] if n else 0), float(n % 7)]
        return width, height, feat

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "feat": decoded.map(lambda t: t[2]),
                }
            )

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(blobs: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """'Frame sampling' plumbing over binary payloads: explode each blob
    into fixed-stride chunk offsets JVM-side (sequence/explode), keeping
    per-frame rows narrow. Stub for video frame extraction — the offsets
    and chunk lengths are real, the pixels are not."""
    n_frames = F.greatest(
        F.ceil(F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return blobs.select(
        "doc_id",
        "n_bytes",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select(
        "doc_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
        F.least(
            F.lit(every_n_bytes), F.col("n_bytes") - F.col("frame_idx") * every_n_bytes
        ).alias("chunk_len"),
    )


RESIZE_SCHEMA = (
    "doc_id long, modality string, width int, height int, "
    "target_w int, target_h int, payload binary"
)


def resize(blobs: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Arrow-batched image-resize plumbing over binary payloads.

    STUB kernel (no codecs in this container): the "resized" payload is
    a deterministic downsample of the raw bytes — every k-th byte so the
    output length is ~target_w*target_h/64 — standing in for
    PIL.Image.resize. The Spark side is the real thing: binary-in /
    binary-out through mapInPandas, output metadata typed, batch shape
    preserved, nothing collected.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Closure-shipped, no module references (driver may run outside
        # this repo's sys.path).
        import pandas as pd  # noqa: F811 — re-import for the worker

        out_len = max(1, (target_w * target_h) // 64)

        def shrink(payload: bytes) -> bytes:
            n = len(payload)
            if n == 0:
                return b""
            step = max(1, n // out_len)
            return payload[::step][:out_len]

        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "width": (n % 64 + 1).astype("int32"),
                    "height": (n % 48 + 1).astype("int32"),
                    "target_w": target_w,
                    "target_h": target_h,
                    "payload": pdf["payload"].map(shrink),
                }
            )

    return blobs.mapInPandas(run, schema=RESIZE_SCHEMA)
