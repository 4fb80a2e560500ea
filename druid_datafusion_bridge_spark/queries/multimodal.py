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


@query(
    "mm_feature_extract",
    oracle="""
    WITH base AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes, text FROM documents
    ), s16 AS (
      SELECT doc_id, SUM(ascii(substr(text, CAST(g.i AS INT), 1))) AS s
      FROM base, generate_series(1, 16) AS g(i)
      GROUP BY doc_id
    )
    SELECT b.doc_id, 'image' AS modality, b.n_bytes,
           CAST(b.n_bytes % 64 + 1 AS INT) AS width,
           CAST(b.n_bytes % 48 + 1 AS INT) AS height,
           concat_ws(',', b.n_bytes, s.s, ascii(substr(b.text, 1, 1)),
                     b.n_bytes % 7) AS feat_csv
    FROM base b JOIN s16 s USING (doc_id)
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode -> feature extraction through Arrow-batched
    mapInPandas (decode kernel stubbed; plumbing real).

    The feature vector is serialized to CSV for the harness (array
    columns crash the driver's pandas canonicalizer — round-1 finding);
    the stub features are all integral so a long cast is exact. The
    oracle recomputes the stub arithmetic in SQL — valid because the
    corpus is pure ASCII (byte k == ascii(char k)), which the oracle's
    n_bytes==length(text) equality would break loudly on otherwise."""
    docs = table(spark, sf_dir, "documents")
    feats = extract_features(with_binary_payload(docs))
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        "width",
        "height",
        F.array_join(
            F.transform("feat", lambda x: x.cast("long").cast("string")), ","
        ).alias("feat_csv"),
    )


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


@query(
    "mm_resize",
    oracle="""
    SELECT doc_id, 'image' AS modality,
           CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
           CAST(octet_length(encode(text)) % 48 + 1 AS INT) AS height,
           32 AS target_w, 32 AS target_h,
           octet_length(encode(text)) AS src_bytes
    FROM documents
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (binary-in/binary-out mapInPandas). The oracle
    checks everything deterministic EXCEPT the stub payload bytes:
    per-doc metadata, dimensions, and that a payload of the expected
    source length went through — the payload itself is surfaced as its
    source length (the stub's output length is an implementation
    detail, asserted in tests/test_multimodal_resize.py)."""
    from ..operators.multimodal import resize

    docs = table(spark, sf_dir, "documents")
    blobs = with_binary_payload(docs)
    resized = resize(blobs, 32, 32)
    # join back to source length: proves each payload round-tripped
    src = blobs.select("doc_id", F.col("n_bytes").alias("src_bytes"))
    return resized.join(src, "doc_id").select(
        "doc_id", "modality", "width", "height", "target_w", "target_h",
        "src_bytes",
    )


@query(
    "mm_frame_energy",
    oracle="""
    WITH blobs AS (SELECT doc_id, text,
                          octet_length(encode(text)) AS n_bytes
                   FROM documents),
    frames AS (
      SELECT doc_id, text, n_bytes,
             unnest(generate_series(0,
               greatest(CAST(ceil(n_bytes / 32.0) AS INT), 1) - 1)) AS frame_idx
      FROM blobs),
    bytes AS (
      SELECT doc_id, frame_idx,
             ascii(substr(text, CAST(frame_idx * 32 + g.i AS INT), 1)) AS b
      FROM frames, generate_series(1, 32) AS g(i)
      WHERE frame_idx * 32 + g.i <= n_bytes)
    SELECT doc_id, frame_idx,
           CAST(SUM(b) AS BIGINT) AS energy,
           COUNT(*) AS chunk_len,
           CAST(MAX(b) AS BIGINT) AS peak
    FROM bytes GROUP BY doc_id, frame_idx
    """,
)
def mm_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame 'energy' over binary payloads — the audio-analysis
    plumbing shape (windowed amplitude stats), computed JVM-side: the
    payload explodes into fixed 32-byte frames and each frame
    aggregates its byte values (sum/count/max via aggregate() over the
    unbased byte array). The oracle recomputes byte values from the
    ASCII corpus with ascii(substr(..)) — exact because payload bytes
    == character codes here (asserted by mm_binary_meta's n_bytes
    check)."""
    docs = table(spark, sf_dir, "documents")
    blobs = with_binary_payload(docs)
    # Slice the frame FIRST, decode 32 bytes per frame. The previous
    # formulation decoded the WHOLE payload into a long array and then
    # carried that array through the frame explode — O(bytes) work and
    # O(bytes) row width per frame, i.e. O(bytes^2/frame) per document —
    # and its per-byte lambda re-evaluated hex(payload) for every
    # element (a second O(bytes^2)). Measured 49.8 s at sf0.1; slicing
    # the frame binary before any per-byte work is linear and the hex
    # of a frame is computed once per row in its own projection
    # (guide §1.2: fix the algorithm, not the constant). Results are
    # bit-identical: substring on BINARY is byte-addressed and
    # truncates at payload end exactly like array slice did.
    frames = (
        blobs.select(
            "doc_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.col("n_bytes") / 32).cast("int"), F.lit(1)
                    )
                    - 1,
                )
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.expr("substring(payload, frame_idx * 32 + 1, 32)").alias("_chunk"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.hex("_chunk").alias("_hx"),
            F.octet_length("_chunk").alias("_n"),
        )
    )
    # r13 (r12 ADVICE): guard the empty-payload frame — sequence(1, 0)
    # yields a DESCENDING [1, 0] array, so _n = 0 would decode two
    # phantom null bytes and make energy/peak NULL instead of the
    # empty-frame values. Latent on this corpus (no empty documents;
    # the pre-r12 code shared the quirk via sequence(1, n_bytes)), so
    # declared results are unchanged — the case is now well-defined.
    chunk = F.transform(
        F.when(F.col("_n") >= 1, F.sequence(F.lit(1), F.col("_n"))).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: F.conv(F.substring(F.col("_hx"), (i - 1) * 2 + 1, 2), 16, 10).cast(
            "long"
        ),
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.aggregate(chunk, F.lit(0).cast("long"), lambda a, b: a + b).alias(
            "energy"
        ),
        F.col("_n").cast("long").alias("chunk_len"),
        F.array_max(chunk).alias("peak"),
    )


@query(
    "mm_ppm_decode",
    oracle="""
    SELECT d.doc_id,
           CAST(4 + d.doc_id % 5 AS INT) AS width,
           CAST(3 + d.doc_id % 4 AS INT) AS height,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 0) * 13) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 1) * 13) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 2) * 13) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 0) * 13) % 256) AS DOUBLE)
             / ((4 + d.doc_id % 5) * (3 + d.doc_id % 4)) AS mean_r,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 1) * 13) % 256) AS DOUBLE)
             / ((4 + d.doc_id % 5) * (3 + d.doc_id % 4)) AS mean_g,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 2) * 13) % 256) AS DOUBLE)
             / ((4 + d.doc_id % 5) * (3 + d.doc_id % 4)) AS mean_b
    FROM documents d,
         unnest(generate_series(0,
           (4 + d.doc_id % 5) * (3 + d.doc_id % 4) - 1)) AS g(p)
    GROUP BY d.doc_id
    """,
)
def mm_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: every doc gets a valid binary P6
    PPM (deterministic pixel law, doc-dependent dimensions), and a pure
    numpy parser decodes header + pixel planes to per-channel sums and
    means inside Arrow-batched mapInPandas. The oracle recomputes the
    expected channel statistics in closed form from the pixel law — a
    header mis-parse or pixel offset bug in the decoder shows up as a
    value mismatch. This upgrades one modality from stub to working
    decoder; JPEG (DCT/entropy codecs) stays stubbed since the
    container ships no codecs."""
    from ..operators.multimodal import ppm_channel_stats, with_ppm_payload

    docs = table(spark, sf_dir, "documents")
    return ppm_channel_stats(with_ppm_payload(docs))


@query(
    "mm_wav_decode",
    oracle="""
    WITH s AS (
      SELECT d.doc_id,
             (d.doc_id * 31 + g.i * 17) % 65536 - 32768 AS amp
      FROM documents d,
           unnest(generate_series(0, 64 + d.doc_id % 129 - 1)) AS g(i))
    SELECT doc_id,
           COUNT(*) AS n_samples,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(SUM(amp) AS BIGINT) AS sum_amp,
           CAST(SUM(amp * amp) AS BIGINT) AS sum_sq,
           CAST(MAX(ABS(amp)) AS BIGINT) AS peak,
           CAST(SUM(amp) AS DOUBLE) / COUNT(*) AS mean_amp
    FROM s GROUP BY doc_id
    """,
)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: every doc gets a valid mono 16-bit
    PCM WAV (canonical RIFF header, deterministic sample law,
    doc-dependent length), and a pure numpy RIFF chunk-walking parser
    decodes it to amplitude statistics inside Arrow-batched
    mapInPandas. The oracle recomputes expected stats in closed form
    from the sample law — a header mis-parse, endianness bug, or
    off-by-one in the chunk walk fails the hash check. Compressed
    audio (MP3/AAC) stays stubbed — no codecs in the container."""
    from ..operators.multimodal import wav_amplitude_stats, with_wav_payload

    docs = table(spark, sf_dir, "documents")
    return wav_amplitude_stats(with_wav_payload(docs))


@query(
    "mm_ppm_resize",
    oracle="""
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents),
    cells AS (
      SELECT d.doc_id, d.w, d.h,
             (ty.o * d.h) // 2 AS sy, (tx.o * d.w) // 2 AS sx, ch.o AS ch
      FROM d,
           (VALUES (0), (1)) ty(o),
           (VALUES (0), (1)) tx(o),
           (VALUES (0), (1), (2)) ch(o))
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(2 AS INT) AS out_w, CAST(2 AS INT) AS out_h,
           CAST(SUM((doc_id * 7 + ((sy * w + sx) * 3 + ch) * 13) % 256)
                AS BIGINT) AS sum_resized,
           CAST(SUM((doc_id * 7 + ((sy * w + sx) * 3 + ch) * 13) % 256)
                AS DOUBLE) / 12 AS mean_resized
    FROM cells
    GROUP BY doc_id, w, h
    ORDER BY doc_id
    """,
)
def mm_ppm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL end-to-end image resize: generate a valid P6 PPM per doc
    (closed-form pixel law), decode it with the pure-numpy decoder,
    nearest-neighbor downsample to 2x2, and report the resized pixel
    sum/mean. Nearest-neighbor picks exact source pixels, so the SQL
    oracle recomputes every output byte from the pixel law — the decode
    AND the resample arithmetic are both verified, not just plumbing."""
    from ..operators.multimodal import ppm_resize_stats, with_ppm_payload

    docs = table(spark, sf_dir, "documents")
    return ppm_resize_stats(with_ppm_payload(docs), out_w=2, out_h=2)


@query(
    "mm_wav_resample",
    oracle="""
    WITH d AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
    j AS (
      SELECT doc_id, n, unnest(generate_series(0, (n + 1) // 2 - 1)) AS j
      FROM d),
    s AS (
      SELECT doc_id, n,
             (doc_id * 31 + (2 * j) * 17) % 65536 - 32768 AS v
      FROM j)
    SELECT doc_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(4000 AS BIGINT) AS out_rate,
           CAST(MAX(n) AS BIGINT) AS n_in,
           COUNT(*) AS n_out,
           CAST(SUM(v) AS BIGINT) AS sum_out,
           CAST(MAX(abs(v)) AS BIGINT) AS peak_out
    FROM s GROUP BY doc_id ORDER BY doc_id
    """,
)
def mm_wav_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL end-to-end audio resample: generate a valid 8 kHz PCM WAV
    per doc (closed-form sample law), decode it with the pure-numpy
    RIFF walker, decimate 2:1 to 4 kHz, and report the downsampled
    stream's integer stats. Decimation keeps exact source samples, so
    the oracle recomputes every output value from the sample law."""
    from ..operators.multimodal import wav_resample_stats, with_wav_payload

    docs = table(spark, sf_dir, "documents")
    return wav_resample_stats(with_wav_payload(docs), factor=2)


@query(
    "mm_video_frames",
    oracle="""
    WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS n_frames FROM documents),
    f AS (
      SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx
      FROM d),
    sampled AS (SELECT doc_id, frame_idx FROM f WHERE frame_idx % 2 = 0),
    px AS (
      SELECT doc_id, frame_idx, unnest(generate_series(0, 35)) AS i
      FROM sampled)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(4 AS INT) AS width, CAST(3 AS INT) AS height,
           CAST(SUM((doc_id * 7 + frame_idx * 11 + i * 13) % 256) AS BIGINT)
             AS sum_pix,
           CAST(SUM((doc_id * 7 + frame_idx * 11 + i * 13) % 256) AS DOUBLE)
             / 36 AS mean_pix
    FROM px
    GROUP BY doc_id, frame_idx
    ORDER BY doc_id, frame_idx
    """,
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-pipeline shape end-to-end: a multi-frame container of
    concatenated P6 frames per doc is walked frame-by-frame (each
    header parsed to find the next boundary), every 2nd frame is kept
    (temporal sampling) and decoded, and per-frame pixel stats come
    out — one output row per sampled frame. The closed-form frame/pixel
    law lets the oracle recompute every byte of every sampled frame, so
    container parsing, frame sampling, AND decode are all verified."""
    from ..operators.multimodal import video_frame_stats, with_video_payload

    docs = table(spark, sf_dir, "documents")
    return video_frame_stats(with_video_payload(docs), every=2)


@query(
    "mm_png_decode",
    oracle="""
    SELECT d.doc_id,
           CAST(4 + d.doc_id % 5 AS INT) AS width,
           CAST(3 + d.doc_id % 4 AS INT) AS height,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 0) * 13) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 1) * 13) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 2) * 13) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 0) * 13) % 256) AS DOUBLE)
             / ((4 + d.doc_id % 5) * (3 + d.doc_id % 4)) AS mean_r,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 1) * 13) % 256) AS DOUBLE)
             / ((4 + d.doc_id % 5) * (3 + d.doc_id % 4)) AS mean_g,
           CAST(SUM((d.doc_id * 7 + (g.p * 3 + 2) * 13) % 256) AS DOUBLE)
             / ((4 + d.doc_id % 5) * (3 + d.doc_id % 4)) AS mean_b
    FROM documents d,
         unnest(generate_series(0,
           (4 + d.doc_id % 5) * (3 + d.doc_id % 4) - 1)) AS g(p)
    GROUP BY d.doc_id
    """,
)
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode end-to-end: every doc gets a valid
    PNG (stdlib-zlib DEFLATE, CRC-checked chunks, scanline filters
    cycling through ALL FIVE PNG filter types), and a pure zlib+numpy
    decoder walks chunks, inflates, and unfilters back to pixels inside
    Arrow-batched mapInPandas. The pixel law is the SAME as the PPM
    fixtures, so the identical closed-form oracle verifies the decode —
    any filter-reconstruction, CRC, or inflate bug is a value mismatch.
    JPEG (entropy/DCT codecs the container lacks) remains the one
    stubbed image format."""
    from ..operators.multimodal import png_channel_stats, with_png_payload

    docs = table(spark, sf_dir, "documents")
    return png_channel_stats(with_png_payload(docs))


@query(
    "mm_gif_decode",
    oracle="""
    WITH px AS (
      SELECT d.doc_id,
             (d.doc_id * 7 + g.p * 13) % 256 AS idx
      FROM documents d,
           unnest(generate_series(0,
             (8 + d.doc_id % 9) * (6 + d.doc_id % 7) - 1)) AS g(p))
    SELECT doc_id,
           CAST(8 + doc_id % 9 AS INT) AS width,
           CAST(6 + doc_id % 7 AS INT) AS height,
           CAST(SUM(idx) AS BIGINT) AS sum_r,
           CAST(SUM((2 * idx) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((3 * idx) % 256) AS BIGINT) AS sum_b,
           CAST(SUM(idx) AS DOUBLE) / COUNT(*) AS mean_r,
           CAST(SUM((2 * idx) % 256) AS DOUBLE) / COUNT(*) AS mean_g,
           CAST(SUM((3 * idx) % 256) AS DOUBLE) / COUNT(*) AS mean_b
    FROM px GROUP BY doc_id
    """,
)
def mm_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL palette-image decode end-to-end: every doc gets a valid
    GIF87a whose image data is LZW-COMPRESSED FOR REAL (dictionary
    build, variable-width 9->12-bit codes, CLEAR resets), and a pure
    python+numpy decoder walks header/palette/extensions and
    LZW-decompresses back to indices inside Arrow-batched mapInPandas.
    The oracle recomputes channel statistics in closed form from the
    index law index(p) = (id*7 + p*13) % 256 and palette law
    palette[i] = (i, 2i, 3i) % 256 — any bit-unpacking, width-
    transition, or palette bug is a value mismatch. This upgrades the
    third compressed container (after PNG's DEFLATE and the stdlib-free
    LZW here) from stub to working codec; JPEG/MP3 (entropy/DCT) stay
    stubbed since the container ships no codecs."""
    from ..operators.multimodal import gif_channel_stats, with_gif_payload

    docs = table(spark, sf_dir, "documents")
    return gif_channel_stats(with_gif_payload(docs))


@query(
    "mm_bmp_decode",
    oracle="""
    SELECT d.doc_id,
           CAST(3 + d.doc_id % 6 AS INT) AS width,
           CAST(2 + d.doc_id % 5 AS INT) AS height,
           CAST(SUM((d.doc_id * 11 + (g.p * 3 + 0) * 19) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((d.doc_id * 11 + (g.p * 3 + 1) * 19) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((d.doc_id * 11 + (g.p * 3 + 2) * 19) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((d.doc_id * 11 + (g.p * 3 + 0) * 19) % 256) AS DOUBLE)
             / ((3 + d.doc_id % 6) * (2 + d.doc_id % 5)) AS mean_r,
           CAST(SUM((d.doc_id * 11 + (g.p * 3 + 1) * 19) % 256) AS DOUBLE)
             / ((3 + d.doc_id % 6) * (2 + d.doc_id % 5)) AS mean_g,
           CAST(SUM((d.doc_id * 11 + (g.p * 3 + 2) * 19) % 256) AS DOUBLE)
             / ((3 + d.doc_id % 6) * (2 + d.doc_id % 5)) AS mean_b
    FROM documents d,
         unnest(generate_series(0,
           (3 + d.doc_id % 6) * (2 + d.doc_id % 5) - 1)) AS g(p)
    GROUP BY d.doc_id
    """,
)
def mm_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode end-to-end: every doc gets a valid 24-bit BI_RGB
    BMP (bottom-up rows, BGR byte order, 4-byte row padding — the
    width spread cycles the pad through every case), and a pure numpy
    parser decodes header + stride + row flip + channel swap to
    per-channel statistics inside Arrow-batched mapInPandas. The
    oracle recomputes the expected statistics in closed form from the
    pixel law — a stride, row-order, or BGR bug shows up as a value
    mismatch. Fifth REAL codec beside PPM/PNG/GIF/WAV; JPEG/MP3 stay
    stubbed (container ships no entropy/DCT codecs)."""
    from ..operators.multimodal import bmp_channel_stats, with_bmp_payload

    docs = table(spark, sf_dir, "documents")
    return bmp_channel_stats(with_bmp_payload(docs))


@query(
    "mm_jpeg_decode",
    oracle="""
    SELECT d.doc_id,
           CAST(8 * (1 + d.doc_id % 3) AS INT) AS width,
           CAST(8 * (1 + d.doc_id % 2) AS INT) AS height,
           CAST(SUM(64 * ((d.doc_id * 7 + g.b * 13) % 256)) AS BIGINT)
             AS sum_y,
           CAST(SUM(64 * ((d.doc_id * 7 + g.b * 13) % 256)) AS DOUBLE)
             / (64 * (1 + d.doc_id % 3) * (1 + d.doc_id % 2)) AS mean_y
    FROM documents d,
         unnest(generate_series(0,
           (1 + d.doc_id % 3) * (1 + d.doc_id % 2) - 1)) AS g(b)
    GROUP BY d.doc_id
    """,
)
def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode end-to-end — the last multimodal stub
    closed on the container's terms: every doc gets a valid baseline
    JFIF (SOI/APP0/DQT/SOF0/DHT/SOS, canonical Huffman entropy stream
    with byte stuffing) and a from-scratch numpy decoder runs the full
    pipeline — Huffman decode, dequantize, dezigzag, 8x8 inverse DCT —
    inside Arrow-batched mapInPandas. The payload images are
    block-constant (DC-only blocks round-trip the lossy pipeline
    bit-exactly), so the oracle recomputes luminance statistics in
    closed form from the block law; the decoder itself is general
    (tests/test_multimodal_resize.py checks a dense random image
    against the encoder within rounding error, plus truncation,
    restart-marker, and progressive/subsampled rejection; 4:4:4 color
    is mm_jpeg_color_decode). Sixth REAL codec beside
    PPM/PNG/GIF/BMP/WAV; MP3 stays stubbed (psychoacoustic codec out
    of scope)."""
    from ..operators.multimodal import jpeg_luma_stats, with_jpeg_payload

    docs = table(spark, sf_dir, "documents")
    return jpeg_luma_stats(with_jpeg_payload(docs))


@query(
    "mm_jpeg_color_decode",
    oracle="""
    WITH law AS (
      SELECT d.doc_id, g.b,
             CAST((d.doc_id * 11 + g.b * 17) % 256 AS DOUBLE) AS r,
             CAST((d.doc_id * 13 + g.b * 19) % 256 AS DOUBLE) AS gg,
             CAST((d.doc_id * 7 + g.b * 23) % 256 AS DOUBLE) AS bb
      FROM documents d,
           unnest(generate_series(0,
             (1 + d.doc_id % 3) * (1 + d.doc_id % 2) - 1)) AS g(b)),
    ycc AS (
      SELECT doc_id, b,
        LEAST(255, GREATEST(0,
          FLOOR(0.299*r + 0.587*gg + 0.114*bb + 0.5))) AS y,
        LEAST(255, GREATEST(0,
          FLOOR(128 - 0.168736*r - 0.331264*gg + 0.5*bb + 0.5))) AS cb,
        LEAST(255, GREATEST(0,
          FLOOR(128 + 0.5*r - 0.418688*gg - 0.081312*bb + 0.5))) AS cr
      FROM law),
    back AS (
      SELECT doc_id,
        LEAST(255, GREATEST(0,
          FLOOR(y + 1.402*(cr - 128) + 0.5))) AS rp,
        LEAST(255, GREATEST(0,
          FLOOR(y - 0.344136*(cb - 128) - 0.714136*(cr - 128) + 0.5)))
          AS gp,
        LEAST(255, GREATEST(0,
          FLOOR(y + 1.772*(cb - 128) + 0.5))) AS bp
      FROM ycc)
    SELECT doc_id,
           CAST(8 * (1 + doc_id % 3) AS INT) AS width,
           CAST(8 * (1 + doc_id % 2) AS INT) AS height,
           CAST(SUM(64 * rp) AS BIGINT) AS sum_r,
           CAST(SUM(64 * gp) AS BIGINT) AS sum_g,
           CAST(SUM(64 * bp) AS BIGINT) AS sum_b,
           SUM(64 * rp) / (64.0 * (1 + doc_id % 3) * (1 + doc_id % 2))
             AS mean_r,
           SUM(64 * gp) / (64.0 * (1 + doc_id % 3) * (1 + doc_id % 2))
             AS mean_g,
           SUM(64 * bp) / (64.0 * (1 + doc_id % 3) * (1 + doc_id % 2))
             AS mean_b
    FROM back GROUP BY doc_id
    """,
)
def mm_jpeg_color_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 3-component 4:4:4 color JPEG decode end-to-end: every doc
    gets a valid color baseline JFIF (interleaved per-MCU Y/Cb/Cr
    blocks, per-component DC predictors) and the general decoder runs
    per-component Huffman + dequant + IDCT then BT.601 YCbCr->RGB.
    Block-constant RGB payloads make the DCT stage exact, so the
    decoded pixels follow the deterministic two-round law (RGB ->
    rounded YCbCr -> rounded RGB, floor(x+0.5) + clamp on both ends)
    the oracle recomputes in closed form — a component-interleave,
    predictor, table-selection, or color-matrix bug shows up as a
    value mismatch. Subsampled (4:2:0) color stays rejected-loud
    (interpolation choice, documented)."""
    from ..operators.multimodal import jpeg_rgb_stats, with_jpeg_color_payload

    docs = table(spark, sf_dir, "documents")
    return jpeg_rgb_stats(with_jpeg_color_payload(docs))


@query(
    "mm_jpeg_420_decode",
    oracle="""
    WITH law AS (
      SELECT d.doc_id, g.m,
             CAST((d.doc_id * 11 + g.m * 17) % 256 AS DOUBLE) AS r,
             CAST((d.doc_id * 13 + g.m * 19) % 256 AS DOUBLE) AS gg,
             CAST((d.doc_id * 7 + g.m * 23) % 256 AS DOUBLE) AS bb
      FROM documents d,
           unnest(generate_series(0, d.doc_id % 2)) AS g(m)),
    ycc AS (
      SELECT doc_id, m,
        LEAST(255, GREATEST(0,
          FLOOR(0.299*r + 0.587*gg + 0.114*bb + 0.5))) AS y,
        LEAST(255, GREATEST(0,
          FLOOR(128 - 0.168736*r - 0.331264*gg + 0.5*bb + 0.5))) AS cb,
        LEAST(255, GREATEST(0,
          FLOOR(128 + 0.5*r - 0.418688*gg - 0.081312*bb + 0.5))) AS cr
      FROM law),
    back AS (
      SELECT doc_id,
        LEAST(255, GREATEST(0,
          FLOOR(y + 1.402*(cr - 128) + 0.5))) AS rp,
        LEAST(255, GREATEST(0,
          FLOOR(y - 0.344136*(cb - 128) - 0.714136*(cr - 128) + 0.5)))
          AS gp,
        LEAST(255, GREATEST(0,
          FLOOR(y + 1.772*(cb - 128) + 0.5))) AS bp
      FROM ycc)
    SELECT doc_id,
           CAST(16 * (1 + doc_id % 2) AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(SUM(256 * rp) AS BIGINT) AS sum_r,
           CAST(SUM(256 * gp) AS BIGINT) AS sum_g,
           CAST(SUM(256 * bp) AS BIGINT) AS sum_b,
           SUM(256 * rp) / (256.0 * (1 + doc_id % 2)) AS mean_r,
           SUM(256 * gp) / (256.0 * (1 + doc_id % 2)) AS mean_g,
           SUM(256 * bp) / (256.0 * (1 + doc_id % 2)) AS mean_b
    FROM back GROUP BY doc_id
    """,
)
def mm_jpeg_420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 4:2:0 chroma-subsampled JPEG decode end-to-end — the
    sampling layout most JPEGs in the wild use: interleaved MCUs of
    four Y blocks plus one Cb and one Cr (2x2-averaged on encode),
    decoded across the generic sampling grid with per-component DC
    predictors, chroma upsampled by pixel replication, then BT.601
    YCbCr->RGB. Macroblock-constant payloads make chroma averaging and
    replication exact, so decoded pixels follow the same closed-form
    two-round law the 4:4:4 oracle uses — a sampling-grid, MCU
    block-order, or upsampling bug shows up as a value mismatch."""
    from ..operators.multimodal import jpeg_rgb_stats
    from ..operators.multimodal.jpeg import with_jpeg_420_payload

    docs = table(spark, sf_dir, "documents")
    return jpeg_rgb_stats(with_jpeg_420_payload(docs))


@query(
    "mm_png_color_decode",
    oracle="""
    WITH px AS (
      SELECT d.doc_id,
             d.doc_id % 4 AS m,
             (3 + d.doc_id % 4) * (2 + d.doc_id % 3) AS n,
             (d.doc_id * 11 + g.p * 17) % 256 AS idx,
             (d.doc_id * 11 + (2 * g.p) * 17) % 256 AS g4,
             (d.doc_id * 11 + (2 * g.p + 1) * 17) % 256 AS a4,
             (d.doc_id * 11 + (4 * g.p) * 17) % 256 AS r6,
             (d.doc_id * 11 + (4 * g.p + 1) * 17) % 256 AS g6,
             (d.doc_id * 11 + (4 * g.p + 2) * 17) % 256 AS b6,
             (d.doc_id * 11 + (4 * g.p + 3) * 17) % 256 AS a6
      FROM documents d,
           unnest(generate_series(0,
             (3 + d.doc_id % 4) * (2 + d.doc_id % 3) - 1)) AS g(p)),
    s AS (
      SELECT doc_id,
             CAST(CASE m WHEN 0 THEN 0 WHEN 1 THEN 3
                         WHEN 2 THEN 4 ELSE 6 END AS INT) AS ctype,
             CAST(3 + doc_id % 4 AS INT) AS width,
             CAST(2 + doc_id % 3 AS INT) AS height,
             MAX(n) AS n,
             CAST(CASE m WHEN 0 THEN SUM(idx)
                         WHEN 1 THEN SUM((5 * idx) % 256)
                         WHEN 2 THEN SUM(g4)
                         ELSE SUM(r6) END AS BIGINT) AS sum_r,
             CAST(CASE m WHEN 0 THEN SUM(idx)
                         WHEN 1 THEN SUM((7 * idx) % 256)
                         WHEN 2 THEN SUM(g4)
                         ELSE SUM(g6) END AS BIGINT) AS sum_g,
             CAST(CASE m WHEN 0 THEN SUM(idx)
                         WHEN 1 THEN SUM((11 * idx) % 256)
                         WHEN 2 THEN SUM(g4)
                         ELSE SUM(b6) END AS BIGINT) AS sum_b,
             CAST(CASE m WHEN 0 THEN 255 * MAX(n)
                         WHEN 1 THEN 255 * MAX(n)
                         WHEN 2 THEN SUM(a4)
                         ELSE SUM(a6) END AS BIGINT) AS sum_a
      FROM px GROUP BY doc_id, m)
    SELECT doc_id, ctype, width, height, sum_r, sum_g, sum_b, sum_a,
           CAST(sum_r + sum_g + sum_b AS DOUBLE) / (3.0 * n) AS mean_rgb
    FROM s
    """,
)
def mm_png_color_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 PNG color-type lane: every doc gets a REAL PNG in one of
    the four real-world shapes beyond plain RGB — grayscale (0),
    palette (3, 256-entry PLTE), gray+alpha (4), RGBA (6), cycling by
    doc_id — with scanline filters still cycling all five types, and
    the generalized pure zlib+numpy decoder reconstructs pixels and
    expands palette/gray to canonical RGBA channel sums inside ONE
    Arrow-batched mapInPandas. The oracle replays the byte law
    byte(i) = (id*11 + i*17) % 256 and palette law
    ((5i)%256, (7i)%256, (11i)%256) in closed form per color type —
    any PLTE, channel-count, filter, or inflate bug is a value
    mismatch. Scale: pure data-plane (no shuffle; the decode cost IS
    the scan), same posture as mm_png_decode's 0.148-slope lane."""
    from ..operators.multimodal import png_color_type_stats

    docs = table(spark, sf_dir, "documents")
    return png_color_type_stats(docs)
