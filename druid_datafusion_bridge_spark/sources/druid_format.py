"""Druid v9 segment binary codecs — pure Python, read AND write.

Format authority is the reference implementation (all cites are files
under /root/reference): smoosh archive (src/segment/smoosh.rs:27-131),
version.bin (src/segment/version.rs:8-25), GenericIndexed v1
(src/column/generic_indexed.rs:7-24), VSizeColumnarInts
(src/column/vsize_ints.rs:7-18), CompressedColumnarInts v2
(src/column/compressed_ints.rs:11-21), CompressedColumnarLongs v1/v2
(src/column/compressed_longs.rs:11-21), CompressedColumnarDoubles /
Floats v2 (src/column/compressed_doubles.rs:13-20,100-108), dictionary
string columns v0/v2/v3 (src/column/string.rs:14-27), the column-header
JSON envelope (src/column/mod.rs:22-47), index.drd metadata
(src/segment/metadata.rs:9-17), and the compression-strategy byte
(src/compression/mod.rs:4-30).

Everything is big-endian (Java heritage). The write side has no
counterpart in the reference (its fixture is pre-built); it exists so
round-trip tests can verify the read side bit-exactly, mirroring the
reference's build-then-parse unit-test style
(generic_indexed.rs:258-299, vsize_ints.rs:118-131).

No lz4 library ships in this container, so LZ4 *block* format (not
frame) is implemented here: a full decompressor, and a valid
literal-only compressor for the write side. ZSTD blocks (standard
zstd frames, as zstd-jni writes them) go through Arrow's bundled
zstd codec — both directions, real compression.
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from dataclasses import dataclass, field

import numpy as np

SEGMENT_VERSION_V9 = 9

# CompressionStrategy ids (compression/mod.rs:20-30)
LZF = 0x00
LZ4 = 0x01
ZSTD = 0x02
UNCOMPRESSED = 0xFF
NONE = 0xFE

_I32 = struct.Struct(">i")
_U16BE = struct.Struct(">H")
_I64 = struct.Struct(">q")

GI_VERSION_V1 = 0x01
GI_HEADER_SIZE = 10  # version(1) + flags(1) + total_bytes(4) + num_elements(4)


class DruidFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# LZ4 block codec (raw block format, no frame header)
# ---------------------------------------------------------------------------


def lz4_block_decompress(src: bytes, out_size: int) -> bytes:
    """Decompress one raw LZ4 block to exactly out_size bytes."""
    dst = bytearray()
    i, n = 0, len(src)
    while i < n and len(dst) < out_size:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        dst += src[i : i + lit_len]
        i += lit_len
        if i >= n:
            break  # final sequence carries literals only
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise DruidFormatError("LZ4: zero match offset")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 0x0F:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        start = len(dst) - offset
        if start < 0:
            raise DruidFormatError("LZ4: match offset before block start")
        if offset >= match_len:
            dst += dst[start : start + match_len]
        else:  # overlapping match (run-length style) — copy byte-wise
            for j in range(match_len):
                dst.append(dst[start + j])
    if len(dst) != out_size:
        raise DruidFormatError(
            f"LZ4: decompressed {len(dst)} bytes, expected {out_size}"
        )
    return bytes(dst)


def lz4_block_compress_literal(data: bytes) -> bytes:
    """Encode data as a single literal-only LZ4 sequence (valid, ratio 1).

    A block may end with a literals-only sequence, so one sequence with
    no match part is a legal block — any LZ4 decoder (including
    lz4_block_decompress above and the reference's lz4_flex,
    compression/mod.rs:41) accepts it.
    """
    n = len(data)
    out = bytearray()
    if n < 15:
        out.append(n << 4)
    else:
        out.append(0xF0)
        rem = n - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += data
    return bytes(out)


def lzf_raw_decompress(src: bytes | memoryview) -> bytes:
    """Raw libLZF stream decode: control byte < 0x20 starts a literal
    run of ctrl+1 bytes; otherwise a back-reference of (ctrl>>5)+2
    bytes (+1 extension byte when the 3-bit length saturates at 7) at
    offset ((ctrl & 0x1f) << 8 | next) + 1 behind the write position —
    copied byte-by-byte because overlap is allowed (RLE through self-
    reference)."""
    src = bytes(src)
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        ctrl = src[i]
        i += 1
        if ctrl < 0x20:
            run = ctrl + 1
            if i + run > n:
                raise DruidFormatError("LZF literal run past end of input")
            out += src[i : i + run]
            i += run
        else:
            length = ctrl >> 5
            if length == 7:
                if i >= n:
                    raise DruidFormatError("LZF truncated length extension")
                length += src[i]
                i += 1
            if i >= n:
                raise DruidFormatError("LZF truncated back-reference")
            ref = len(out) - (((ctrl & 0x1F) << 8) | src[i]) - 1
            i += 1
            if ref < 0:
                raise DruidFormatError("LZF back-reference before start")
            for _ in range(length + 2):
                out.append(out[ref])
                ref += 1
    return bytes(out)


# Ning-compress LZF chunk stream (what Druid's LZF strategy wraps raw
# LZF in): "ZV" magic, 1-byte type, 2-byte payload length, and for
# compressed chunks a further 2-byte uncompressed length.
_LZF_MAGIC = b"ZV"
_LZF_CHUNK_MAX = 0xFFFF


def lzf_chunks_decompress(src: bytes | memoryview, out_size: int) -> bytes:
    src = bytes(src)
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < out_size:
        if src[i : i + 2] != _LZF_MAGIC or i + 5 > n:
            raise DruidFormatError("LZF chunk: bad magic/truncated header")
        ctype = src[i + 2]
        (clen,) = _U16BE.unpack_from(src, i + 3)
        i += 5
        if ctype == 0:
            out += src[i : i + clen]
            i += clen
        elif ctype == 1:
            i += 2  # uncompressed-length field (validated via out_size)
            out += lzf_raw_decompress(src[i : i + clen])
            i += clen
        else:
            raise DruidFormatError(f"LZF chunk: unknown type {ctype}")
    if len(out) < out_size:
        raise DruidFormatError(
            f"LZF: produced {len(out)} bytes, expected {out_size}"
        )
    return bytes(out[:out_size])


def lzf_chunks_compress_literal(raw: bytes) -> bytes:
    """Literal-only Ning LZF chunk stream (type-0 chunks) — same
    trade as lz4_block_compress_literal: spec-valid output any LZF
    decoder accepts, no match search."""
    out = bytearray()
    for pos in range(0, len(raw), _LZF_CHUNK_MAX):
        chunk = raw[pos : pos + _LZF_CHUNK_MAX]
        out += _LZF_MAGIC
        out.append(0)
        out += _U16BE.pack(len(chunk))
        out += chunk
    if not raw:  # zero-length payload still needs one empty chunk
        out += _LZF_MAGIC + b"\x00" + _U16BE.pack(0)
    return bytes(out)


def _zstd_codec():
    """Arrow's bundled zstd codec, or None if this build lacks it.
    Druid's ZSTD strategy stores standard zstd frames per block
    (zstd-jni `Zstd.compress`), which any frame decoder reads."""
    try:
        import pyarrow as pa

        return pa.Codec("zstd")
    except Exception:
        return None


def decompress_block(strategy: int, compressed: bytes, out_size: int) -> bytes:
    """Block decode by strategy id. The reference supports LZ4 +
    uncompressed and ERRORS on LZF/ZSTD (compression/mod.rs:34-46);
    LZF and ZSTD are implemented here beyond reference parity so
    legacy-v1 (LZF) and modern production (ZSTD) Druid columns decode
    too."""
    if strategy == LZ4:
        return lz4_block_decompress(compressed, out_size)
    if strategy == LZF:
        return lzf_chunks_decompress(compressed, out_size)
    if strategy == ZSTD:
        codec = _zstd_codec()
        if codec is None:
            raise DruidFormatError("ZSTD block but no zstd codec available")
        try:
            out = codec.decompress(bytes(compressed), decompressed_size=out_size)
        except Exception as exc:
            raise DruidFormatError(f"ZSTD: corrupt block ({exc})") from exc
        return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)
    if strategy in (UNCOMPRESSED, NONE):
        return bytes(compressed)
    raise DruidFormatError(f"Unsupported compression strategy {strategy:#x}")


def compress_block(strategy: int, raw: bytes) -> bytes:
    if strategy == LZ4:
        return lz4_block_compress_literal(raw)
    if strategy == LZF:
        return lzf_chunks_compress_literal(raw)
    if strategy == ZSTD:
        codec = _zstd_codec()
        if codec is None:
            raise DruidFormatError("ZSTD write but no zstd codec available")
        out = codec.compress(bytes(raw))
        return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)
    if strategy in (UNCOMPRESSED, NONE):
        return bytes(raw)
    raise DruidFormatError(f"Unsupported compression strategy {strategy:#x}")


# ---------------------------------------------------------------------------
# version.bin (version.rs:12-25)
# ---------------------------------------------------------------------------


def read_version(data: bytes) -> int:
    if len(data) < 4:
        raise DruidFormatError(f"version.bin too short: {len(data)} bytes")
    (version,) = _I32.unpack_from(data, 0)
    if version != SEGMENT_VERSION_V9:
        raise DruidFormatError(f"Unsupported segment version {version}")
    return version


def write_version() -> bytes:
    return _I32.pack(SEGMENT_VERSION_V9)


# ---------------------------------------------------------------------------
# GenericIndexed V1 (generic_indexed.rs:7-24)
#
# [version u8=0x01][flags u8][total_bytes i32][num_elements i32]
# [offsets i32*N: cumulative END of each element, relative to values start]
# [values: per element either [len i32][bytes] (len=-1 => null)
#          or ObjectStrategy [4 zero bytes][raw utf8] (empty => null)]
# ---------------------------------------------------------------------------


class GenericIndexedV1:
    def __init__(self, data, base: int = 0):
        self.data = data
        self.base = base
        if len(data) - base < 1:
            raise DruidFormatError("GenericIndexed: empty data")
        version = data[base]
        if version != GI_VERSION_V1:
            raise DruidFormatError(f"GenericIndexed: bad version {version:#x}")
        if len(data) - base < GI_HEADER_SIZE:
            raise DruidFormatError("GenericIndexed: data too short for header")
        self.flags = data[base + 1]
        (self.total_bytes,) = _I32.unpack_from(data, base + 2)
        (self.num_elements,) = _I32.unpack_from(data, base + 6)
        self.values_start = base + GI_HEADER_SIZE + self.num_elements * 4

    def __len__(self) -> int:
        return self.num_elements

    def _offset(self, i: int) -> int:
        (off,) = _I32.unpack_from(self.data, self.base + GI_HEADER_SIZE + i * 4)
        return off

    def _range(self, i: int) -> tuple[int, int]:
        if i >= self.num_elements:
            raise DruidFormatError(f"GenericIndexed: index {i} out of range")
        start = 0 if i == 0 else self._offset(i - 1)
        return self.values_start + start, self.values_start + self._offset(i)

    def get(self, i: int) -> bytes | None:
        """Length-prefixed element; length == -1 means null."""
        start, end = self._range(i)
        if end > len(self.data):
            raise DruidFormatError(f"GenericIndexed: element {i} overflows buffer")
        (length,) = _I32.unpack_from(self.data, start)
        if length < 0:
            return None
        if start + 4 + length > len(self.data):
            raise DruidFormatError(f"GenericIndexed: element {i} value overflows")
        return bytes(self.data[start + 4 : start + 4 + length])

    def get_str(self, i: int) -> str | None:
        v = self.get(i)
        return None if v is None else v.decode("utf-8")

    def get_object_string(self, i: int) -> str | None:
        """ObjectStrategy variant: [4 zero bytes][utf8]; empty => null
        (generic_indexed.rs:186-224, the legacy ''≡NULL trap)."""
        start, end = self._range(i)
        raw = bytes(self.data[start:end])
        if len(raw) < 4 or raw[:4] != b"\x00\x00\x00\x00":
            raise DruidFormatError(f"GenericIndexed: bad ObjectStrategy prefix at {i}")
        s = raw[4:]
        return s.decode("utf-8") if s else None

    def total_size(self) -> int:
        """Bytes consumed from self.base — for sequential compound parsing."""
        tail = 0 if self.num_elements == 0 else self._offset(self.num_elements - 1)
        return self.values_start - self.base + tail

    def to_list(self) -> list[bytes | None]:
        return [self.get(i) for i in range(self.num_elements)]

    def to_arrow_strings(self) -> "pa.Array":
        """The whole dictionary decoded in ONE vectorized pass (numpy
        offset math + gather, assembled straight into an Arrow utf8
        array). The per-value get_str loop costs ~1 µs of Python per
        element, which at 100k-value dictionaries dominated both the
        scan path's dictionary materialization and every
        dictionary-predicate evaluation; this path is O(bytes) in C.
        Layout per element: [len i32 BE][utf8], len == -1 => null
        (same wire format get() reads one element of)."""
        import pyarrow as pa

        n = self.num_elements
        if n == 0:
            return pa.array([], type=pa.string())
        raw = np.frombuffer(self.data, np.uint8)
        off = np.frombuffer(
            self.data, dtype=">i4", count=n, offset=self.base + GI_HEADER_SIZE
        ).astype(np.int64)
        ends = self.values_start + off
        if ends[-1] > len(raw):
            raise DruidFormatError("GenericIndexed: values overflow buffer")
        starts = np.empty(n, np.int64)
        starts[0] = self.values_start + 4
        starts[1:] = self.values_start + off[:-1] + 4
        lens = ends - starts
        if n and int(lens.min()) < 0:
            raise DruidFormatError("GenericIndexed: negative element length")
        # only zero-payload elements can be null (their length prefix
        # is -1 instead of 0) — read just those prefixes
        null_mask = np.zeros(n, bool)
        zero = np.flatnonzero(lens == 0)
        if len(zero):
            pref = raw[(starts[zero] - 4)[:, None] + np.arange(4)].astype(np.uint32)
            word = (pref[:, 0] << 24) | (pref[:, 1] << 16) | (pref[:, 2] << 8) | pref[:, 3]
            null_mask[zero] = word == 0xFFFFFFFF
        total = int(lens.sum())
        if total > np.iinfo(np.int32).max:
            raise DruidFormatError("GenericIndexed: dictionary exceeds 2 GiB")
        out_off = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=out_off[1:])
        if total:
            gather = (
                np.arange(total, dtype=np.int64)
                - np.repeat(out_off[:-1], lens)
                + np.repeat(starts, lens)
            )
            payload = raw[gather]
        else:
            payload = np.empty(0, np.uint8)
        arr = pa.Array.from_buffers(
            pa.utf8(),
            n,
            [
                pa.py_buffer(np.packbits(~null_mask, bitorder="little").tobytes()),
                pa.py_buffer(out_off.astype(np.int32).tobytes()),
                pa.py_buffer(payload.tobytes()),
            ],
            null_count=int(null_mask.sum()),
        )
        arr.validate(full=True)  # utf8 well-formedness (C-side)
        return arr


def write_generic_indexed(elements: list[bytes | None], sorted_flag: bool = True) -> bytes:
    values = bytearray()
    offsets = []
    for e in elements:
        if e is None:
            values += _I32.pack(-1)
        else:
            values += _I32.pack(len(e))
            values += e
        offsets.append(len(values))
    out = bytearray()
    out.append(GI_VERSION_V1)
    out.append(0x01 if sorted_flag else 0x00)
    out += _I32.pack(len(elements) * 4 + len(values))
    out += _I32.pack(len(elements))
    for off in offsets:
        out += _I32.pack(off)
    out += values
    return bytes(out)


# ---------------------------------------------------------------------------
# VSizeColumnarInts (vsize_ints.rs:7-18)
# [version u8=0x00][num_bytes u8][buffer_size i32][values num_bytes-wide BE]
# ---------------------------------------------------------------------------


def _check_rows(rows, total: int, what: str) -> np.ndarray:
    """Validate a sliced-decode row-id selection: sorted ascending (the
    contract every caller documents — bitmap/index row sets and split
    windows are built sorted) and inside [0, total). Checked up front
    so a bad selection fails as DruidFormatError, not as a misleading
    downstream index/unpack error (endpoint-only checks let an unsorted
    or mid-array-negative selection through)."""
    rows = np.asarray(rows, np.int64)
    if rows.size:
        if rows.size > 1 and np.any(np.diff(rows) < 0):
            raise DruidFormatError(f"{what}: row ids must be sorted ascending")
        if rows[0] < 0 or rows[-1] >= total:
            raise DruidFormatError(f"{what}: row ids out of range 0..{total}")
    return rows


def read_vsize_ints(data, base: int = 0, rows=None) -> np.ndarray:
    if len(data) - base < 6:
        raise DruidFormatError("VSizeColumnarInts: too short")
    if data[base] != 0x00:
        raise DruidFormatError(f"VSizeColumnarInts: bad version {data[base]:#x}")
    num_bytes = data[base + 1]
    if not 1 <= num_bytes <= 4:
        raise DruidFormatError(f"VSizeColumnarInts: invalid num_bytes {num_bytes}")
    (buffer_size,) = _I32.unpack_from(data, base + 2)
    buf = bytes(data[base + 6 : base + 6 + buffer_size])
    if rows is not None:
        # fixed-width + uncompressed => pure positional gather, no
        # full decode (the v0 analog of the blockwise sliced path)
        rows = _check_rows(rows, buffer_size // num_bytes, "VSizeColumnarInts")
        idx = (rows[:, None] * num_bytes + np.arange(num_bytes)).ravel()
        gathered = np.frombuffer(buf, np.uint8)[idx].tobytes()
        return _unpack_be_uints(gathered, num_bytes)
    return _unpack_be_uints(buf, num_bytes)


def write_vsize_ints(values: np.ndarray, num_bytes: int) -> bytes:
    out = bytearray([0x00, num_bytes])
    packed = _pack_be_uints(np.asarray(values, dtype=np.uint32), num_bytes)
    out += _I32.pack(len(packed))
    out += packed
    return bytes(out)


def _unpack_be_uints(buf: bytes, num_bytes: int) -> np.ndarray:
    """Vectorized big-endian fixed-width unsigned int decode."""
    if num_bytes == 1:
        return np.frombuffer(buf, dtype=np.uint8).astype(np.uint32)
    if num_bytes == 2:
        return np.frombuffer(buf, dtype=">u2").astype(np.uint32)
    if num_bytes == 4:
        return np.frombuffer(buf, dtype=">u4").astype(np.uint32)
    a = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 3).astype(np.uint32)
    return (a[:, 0] << 16) | (a[:, 1] << 8) | a[:, 2]


def _pack_be_uints(values: np.ndarray, num_bytes: int) -> bytes:
    if num_bytes == 1:
        return values.astype(np.uint8).tobytes()
    if num_bytes == 2:
        return values.astype(">u2").tobytes()
    if num_bytes == 4:
        return values.astype(">u4").tobytes()
    out = np.empty((len(values), 3), dtype=np.uint8)
    out[:, 0] = (values >> 16) & 0xFF
    out[:, 1] = (values >> 8) & 0xFF
    out[:, 2] = values & 0xFF
    return out.tobytes()


def min_bytes_for(max_value: int) -> int:
    for nb in (1, 2, 3, 4):
        if max_value < (1 << (8 * nb)):
            return nb
    raise DruidFormatError(f"value {max_value} exceeds 4-byte range")


# ---------------------------------------------------------------------------
# Compressed columnar numerics
# longs v1/v2 (compressed_longs.rs:11-21), ints v2 (compressed_ints.rs:11-21),
# doubles/floats v2 (compressed_doubles.rs:13-20,100-108).
# Block container is a GenericIndexed of compressed byte blocks.
# ---------------------------------------------------------------------------


def _read_compressed_blocks(
    data,
    base: int,
    value_width: int,
    dtype: str,
    has_num_bytes: bool,
    rows: np.ndarray | None = None,
) -> np.ndarray:
    """``rows`` (sorted ascending row ids) switches to SLICED decode:
    only the compressed blocks that contain a selected row are
    decompressed, and the result holds exactly those rows' values in
    ``rows`` order. This is what makes an index-selected read cheap —
    a bitmap that keeps 0.1% of a segment's rows should not pay the
    whole column's decompression (blocks are fixed ``size_per`` values,
    so block membership is pure integer division)."""
    version = data[base]
    (total_size,) = _I32.unpack_from(data, base + 1)
    (size_per,) = _I32.unpack_from(data, base + 5)
    pos = base + 9
    num_bytes = value_width
    if has_num_bytes:
        num_bytes = data[pos]
        if not 1 <= num_bytes <= 4:
            raise DruidFormatError(f"CompressedInts: invalid num_bytes {num_bytes}")
        pos += 1
    if version == 0x01 and not has_num_bytes:
        strategy = LZF  # v1 implies LZF (compressed_longs.rs:44-47)
    elif version == 0x02:
        strategy = data[pos]
        pos += 1
    else:
        raise DruidFormatError(f"Compressed column: unsupported version {version:#x}")
    blocks = GenericIndexedV1(data, pos)
    # sliced output is assembled by assignment, so make it NATIVE-endian
    # (pyarrow rejects byte-swapped arrays); the big-endian source
    # values convert on assignment
    out_dtype = np.uint32 if has_num_bytes else np.dtype(dtype).newbyteorder("=")

    def _block_values(b: int) -> np.ndarray:
        block = blocks.get(b)
        if block is None:
            raise DruidFormatError(f"Compressed column: null block {b}")
        n = min(total_size - b * size_per, size_per)
        raw = decompress_block(strategy, block, n * num_bytes)
        if has_num_bytes:
            return _unpack_be_uints(raw, num_bytes)
        return np.frombuffer(raw, dtype=dtype)

    if rows is not None:
        rows = _check_rows(rows, total_size, "Sliced decode")
        out = np.empty(len(rows), dtype=out_dtype)
        blk_ids = rows // size_per if size_per else rows
        for b in np.unique(blk_ids):
            vals = _block_values(int(b))
            sel = blk_ids == b
            out[sel] = vals[rows[sel] - int(b) * size_per]
        return out

    chunks = [_block_values(b) for b in range(len(blocks))]
    if not chunks:
        return np.empty(0, dtype=out_dtype)
    return np.concatenate(chunks)


def _write_compressed_blocks(
    values: np.ndarray,
    dtype: str,
    size_per: int,
    strategy: int,
    num_bytes: int | None = None,
) -> bytes:
    out = bytearray([0x02])
    out += _I32.pack(len(values))
    out += _I32.pack(size_per)
    if num_bytes is not None:
        out.append(num_bytes)
    out.append(strategy)
    blocks: list[bytes | None] = []
    for i in range(0, max(len(values), 1), size_per):
        chunk = values[i : i + size_per]
        if len(chunk) == 0 and i > 0:
            break
        if num_bytes is not None:
            raw = _pack_be_uints(chunk.astype(np.uint32), num_bytes)
        else:
            raw = chunk.astype(dtype).tobytes()
        blocks.append(compress_block(strategy, raw))
    out += write_generic_indexed(blocks, sorted_flag=False)
    return bytes(out)


def read_compressed_longs(data, base: int = 0, rows=None) -> np.ndarray:
    return _read_compressed_blocks(data, base, 8, ">i8", has_num_bytes=False, rows=rows)


def compressed_num_elements(data, base: int = 0) -> int:
    """Element count of any compressed-blocks column from its HEADER
    alone (the total_size i32 every layout carries at base+1,
    compressed_longs.rs header) — planning-cost, zero block decode."""
    (total_size,) = _I32.unpack_from(data, base + 1)
    return total_size


def write_compressed_longs(values, size_per: int = 0x2000, strategy: int = LZ4) -> bytes:
    return _write_compressed_blocks(np.asarray(values, np.int64), ">i8", size_per, strategy)


def read_compressed_doubles(data, base: int = 0, rows=None) -> np.ndarray:
    return _read_compressed_blocks(data, base, 8, ">f8", has_num_bytes=False, rows=rows)


def write_compressed_doubles(values, size_per: int = 0x2000, strategy: int = LZ4) -> bytes:
    return _write_compressed_blocks(np.asarray(values, np.float64), ">f8", size_per, strategy)


def read_compressed_floats(data, base: int = 0, rows=None) -> np.ndarray:
    return _read_compressed_blocks(data, base, 4, ">f4", has_num_bytes=False, rows=rows)


def write_compressed_floats(values, size_per: int = 0x4000, strategy: int = LZ4) -> bytes:
    return _write_compressed_blocks(np.asarray(values, np.float32), ">f4", size_per, strategy)


def read_compressed_ints(data, base: int = 0, rows=None) -> np.ndarray:
    return _read_compressed_blocks(data, base, 0, "", has_num_bytes=True, rows=rows)


def write_compressed_ints(
    values, num_bytes: int | None = None, size_per: int = 0x4000, strategy: int = LZ4
) -> bytes:
    arr = np.asarray(values, np.uint32)
    if num_bytes is None:
        num_bytes = min_bytes_for(int(arr.max()) if len(arr) else 0)
    return _write_compressed_blocks(arr, "", size_per, strategy, num_bytes=num_bytes)


# ---------------------------------------------------------------------------
# Column envelope: [json_len i32][JSON ColumnDescriptor][binary]
# (column/mod.rs:22-47; descriptor fields column_descriptor.rs:14-35)
# ---------------------------------------------------------------------------


def parse_column_header(data) -> tuple[dict, int]:
    """Returns (descriptor, payload_offset)."""
    if len(data) < 4:
        raise DruidFormatError("Column data too short for header length")
    (json_len,) = _I32.unpack_from(data, 0)
    if len(data) < 4 + json_len:
        raise DruidFormatError("Column data too short for JSON header")
    descriptor = json.loads(bytes(data[4 : 4 + json_len]).decode("utf-8"))
    if "valueType" not in descriptor:
        raise DruidFormatError("ColumnDescriptor missing valueType")
    return descriptor, 4 + json_len


def build_column(descriptor: dict, payload: bytes) -> bytes:
    js = json.dumps(descriptor, separators=(",", ":")).encode("utf-8")
    return _I32.pack(len(js)) + js + payload


# ---------------------------------------------------------------------------
# Dictionary-encoded string column (string.rs:14-27)
# v0: [0x00][dict GI][VSizeColumnarInts]
# v2: [0x02][flags i32][dict GI][CompressedColumnarInts]
# v3: [0x03][feature_mask i32][dict GI][CompressedColumnarInts]
# ---------------------------------------------------------------------------


def read_string_column(data, base: int = 0, rows=None):
    """Returns (dictionary: pa.Array[utf8], ids) — kept
    dictionary-encoded for Arrow (the reference eagerly flattens,
    string.rs:116-125; we do better), dictionary decoded via the
    vectorized bulk path (to_arrow_strings — a per-value Python loop
    here dominated high-cardinality scans). ``rows`` slices the id
    section (blockwise for v2/v3 compressed ids, positional gather for
    v0 vsize ids); the dictionary always decodes in full — it is the
    small side by construction."""
    version = data[base]
    if version == 0x00:
        pos = base + 1
    elif version in (0x02, 0x03):
        pos = base + 5  # version + flags/feature_mask
    else:
        raise DruidFormatError(f"String column: unsupported version {version:#x}")
    gi = GenericIndexedV1(data, pos)
    dictionary = gi.to_arrow_strings()
    pos += gi.total_size()
    if version == 0x00:
        ids = read_vsize_ints(data, pos, rows=rows)
    else:
        ids = read_compressed_ints(data, pos, rows=rows)
    return dictionary, ids


def write_string_column_v2(
    dictionary: list[str | None],
    ids: np.ndarray,
    strategy: int = LZ4,
    bitmap_index: bool = False,
    bitmap_type: int | None = None,
) -> bytes:
    """Dictionary string column; with ``bitmap_index`` an inverted
    index (one typed blob per dictionary id, listing the rows holding
    that id) is appended as a GenericIndexed — the real-Druid layout
    the reference parses the blobs of but never applies
    (bitmap.rs:16-40). ``bitmap_type`` picks roaring (default) or
    CONCISE blobs (legacy-segment layout). Readers that only want
    values skip it."""
    out = bytearray([0x02])
    out += _I32.pack(0)  # flags
    out += write_generic_indexed(
        [None if s is None else s.encode("utf-8") for s in dictionary]
    )
    out += write_compressed_ints(ids, strategy=strategy)
    if bitmap_index:
        bt = BITMAP_TYPE_ROARING if bitmap_type is None else bitmap_type
        arr = np.asarray(ids, np.int64)
        # One argsort + boundary split yields every dictionary id's row
        # list in O(N log N) total; a flatnonzero(arr == i) per id would
        # rescan all rows once PER DISTINCT VALUE — quadratic for
        # high-cardinality dimensions (100k values x 5M rows is 5e11
        # comparisons), which is exactly the shape segment ingest sees.
        # Measured: 1M rows x 100k distinct builds + serializes in
        # ~3.3 s single-threaded (the per-value scan form was minutes).
        order = np.argsort(arr, kind="stable")  # row ids, grouped by value
        sorted_ids = arr[order]
        # searchsorted over the (sorted) present ids gives each
        # dictionary id's [start, end) slice; absent ids get an empty one
        starts = np.searchsorted(sorted_ids, np.arange(len(dictionary)), "left")
        ends = np.searchsorted(sorted_ids, np.arange(len(dictionary)), "right")
        out += write_generic_indexed(
            [
                # rows within a value arrive ascending (stable argsort)
                write_bitmap_blob(order[s:e], bt)
                for s, e in zip(starts, ends)
            ]
        )
    return bytes(out)


def read_string_multi_column(data, base: int = 0):
    """Multi-value string column -> (dictionary: pa.Array[utf8],
    row_end_offsets, flat_ids).

    Layout: [0x02][flags i32, bit0 = multi-value][dict GenericIndexed]
    [row-end offsets CompressedColumnarInts][flat ids
    CompressedColumnarInts]. Row r's values are
    flat_ids[offsets[r-1]:offsets[r]] (offsets[-1] == 0 implied).

    The reference parses `hasMultipleValues` (column_descriptor.rs:20-21)
    but its reader always flattens (string.rs:27-44, SURVEY §1.3 calls
    this out as never honored) — this closes that gap.
    """
    if data[base] != 0x02:
        raise DruidFormatError(
            f"Multi-value string column: unsupported version {data[base]:#x}"
        )
    (flags,) = _I32.unpack_from(data, base + 1)
    if not flags & 0x01:
        raise DruidFormatError("Multi-value string column: multi bit not set")
    pos = base + 5
    gi = GenericIndexedV1(data, pos)
    dictionary = gi.to_arrow_strings()
    pos += gi.total_size()
    offsets = read_compressed_ints(data, pos)
    pos += _compressed_ints_size(data, pos)
    ids = read_compressed_ints(data, pos)
    return dictionary, offsets, ids


def _compressed_ints_size(data, base: int) -> int:
    """Bytes consumed by a CompressedColumnarInts at `base` (header of
    11 bytes + its block GenericIndexed)."""
    blocks = GenericIndexedV1(data, base + 11)
    return 11 + blocks.total_size()


def write_string_multi_column(
    dictionary: list[str | None],
    offsets: np.ndarray,
    ids: np.ndarray,
    strategy: int = LZ4,
    bitmap_index: bool = False,
    bitmap_type: int | None = None,
) -> bytes:
    """Multi-value string column; with ``bitmap_index`` an inverted
    index is appended exactly as in the single-value v2 layout — one
    blob per dictionary id, listing the ROWS in which that value
    occurs (Druid's MVD selector semantics: a value filter matches a
    row when ANY of its values matches). ``locate_string_bitmap_index``
    already walks past the extra offsets section to find it."""
    out = bytearray([0x02])
    out += _I32.pack(0x01)  # flags: multi-value bit
    out += write_generic_indexed(
        [None if s is None else s.encode("utf-8") for s in dictionary]
    )
    out += write_compressed_ints(offsets, num_bytes=4, strategy=strategy)
    out += write_compressed_ints(ids, strategy=strategy)
    if bitmap_index:
        bt = BITMAP_TYPE_ROARING if bitmap_type is None else bitmap_type
        arr = np.asarray(ids, np.int64)
        row_ends = np.asarray(offsets, np.int64)
        # flat position -> owning row (offsets are row-END positions)
        row_of = np.repeat(
            np.arange(len(row_ends), dtype=np.int64),
            np.diff(row_ends, prepend=0),
        )
        # same argsort+searchsorted O(N log N) build as the
        # single-value path (see write_string_column_v2) — per-value
        # flat scans would be quadratic in dictionary cardinality
        order = np.argsort(arr, kind="stable")
        sorted_ids = arr[order]
        rows_sorted = row_of[order]
        rng = np.arange(len(dictionary))
        starts = np.searchsorted(sorted_ids, rng, "left")
        ends = np.searchsorted(sorted_ids, rng, "right")
        out += write_generic_indexed(
            [
                # slices arrive row-ascending (stable argsort preserves
                # flat = row order), but one row may repeat a value
                # ("the the ..."): blobs hold each row once
                write_bitmap_blob(np.unique(rows_sorted[s:e]), bt)
                for s, e in zip(starts, ends)
            ]
        )
    return bytes(out)


def write_string_column_v0(dictionary: list[str | None], ids: np.ndarray) -> bytes:
    out = bytearray([0x00])
    out += write_generic_indexed(
        [None if s is None else s.encode("utf-8") for s in dictionary]
    )
    arr = np.asarray(ids, np.uint32)
    nb = min_bytes_for(int(arr.max()) if len(arr) else 0)
    out += write_vsize_ints(arr, nb)
    return bytes(out)


# ---------------------------------------------------------------------------
# Roaring bitmaps (portable serialization) + Druid's typed bitmap blob.
#
# The reference READS roaring bitmaps (src/column/bitmap.rs:16-40, type
# byte 0x01 = roaring, 0x00 = Concise unsupported there and here) but
# never writes or APPLIES them. Here the inverted index is real end to
# end: written per dictionary id, parsed back, and used for row
# selection at scan time.
#
# Roaring portable format is LITTLE-endian (public spec), unlike the
# rest of Druid's big-endian layout: cookie 12346 (no runs, followed by
# u32 container count + per-container u32 offsets) or 12347 (run-capable,
# count packed in the cookie, run bitset, offsets only when count >= 4);
# then per container (u16 key, u16 cardinality-1) headers; containers are
# sorted u16 arrays (card <= 4096), 8 KiB bitsets, or (start, len-1) run
# lists.
# ---------------------------------------------------------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
BITMAP_TYPE_CONCISE = 0x00
BITMAP_TYPE_ROARING = 0x01


def roaring_serialize(rows) -> bytes:
    """Sorted distinct uint32 row ids -> portable roaring bytes
    (cookie 12346, array/bitmap containers only)."""
    # vectorized sort+dedup — a Python-level sorted(set(...)) walks
    # every row id through boxed ints, which multiplies segment-ingest
    # cost for high-cardinality dimensions
    arr = np.unique(np.asarray(rows)).astype(np.uint32)
    keys = (arr >> 16).astype(np.uint16)
    lows = (arr & 0xFFFF).astype(np.uint16)
    uniq_keys = np.unique(keys)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(uniq_keys))
    containers = []
    for k in uniq_keys:
        vals = lows[keys == k]
        out += struct.pack("<HH", int(k), len(vals) - 1)
        if len(vals) <= 4096:
            containers.append(vals.astype("<u2").tobytes())
        else:
            bits = np.zeros(1024, dtype="<u8")
            idx = vals.astype(np.uint32)
            np.bitwise_or.at(bits, idx >> 6, np.uint64(1) << (idx & 63).astype("u8"))
            containers.append(bits.tobytes())
    offset = len(out) + 4 * len(uniq_keys)
    for c in containers:
        out += struct.pack("<I", offset)
        offset += len(c)
    for c in containers:
        out += c
    return bytes(out)


def roaring_deserialize(data: bytes | memoryview) -> np.ndarray:
    """Portable roaring bytes -> sorted uint32 row ids. Handles both
    cookies, array/bitmap/run containers."""
    data = bytes(data)
    if len(data) < 8:
        raise DruidFormatError("Roaring: truncated header")
    (cookie16,) = struct.unpack_from("<H", data, 0)
    if cookie16 == _SERIAL_COOKIE:
        (packed,) = struct.unpack_from("<I", data, 0)
        n = (packed >> 16) + 1
        pos = 4
        run_bits = data[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= 4
    else:
        cookie, n = struct.unpack_from("<II", data, 0)
        if cookie != _SERIAL_COOKIE_NO_RUN:
            raise DruidFormatError(f"Roaring: bad cookie {cookie}")
        pos = 8
        run_bits = b""
        has_offsets = True
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential parse
    parts = []
    for i, (key, card) in enumerate(headers):
        is_run = bool(run_bits) and bool(run_bits[i // 8] & (1 << (i % 8)))
        base = np.uint32(key) << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            runs = np.frombuffer(data, dtype="<u2", count=2 * n_runs, offset=pos)
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(runs[2 * r], runs[2 * r] + runs[2 * r + 1] + 1,
                              dtype=np.uint32)
                    for r in range(n_runs)
                ]
            ) if n_runs else np.empty(0, np.uint32)
        elif card <= 4096:
            vals = np.frombuffer(
                data, dtype="<u2", count=card, offset=pos
            ).astype(np.uint32)
            pos += 2 * card
        else:
            bits = np.frombuffer(data, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            vals = np.flatnonzero(
                np.unpackbits(bits.view(np.uint8), bitorder="little")
            ).astype(np.uint32)
        parts.append(base + vals)
    return np.concatenate(parts) if parts else np.empty(0, np.uint32)


# ---------------------------------------------------------------------------
# CONCISE bitmaps (Colantonio & Di Pietro 2010; Druid's original/legacy
# bitmap type, extendedset word layout). The reference ERRORS on type
# byte 0x00 (src/column/bitmap.rs:32-34); implementing it means legacy
# concise-indexed segments read here that read nowhere else.
#
# 32-bit words, big-endian in the blob (Druid's byte order):
#   1 b30..b0      literal: 31-bit bitmap covering the next 31 ints
#   00 ppppp n*25  0-sequence: (n+1) blocks of 31 zeros; p>0 flips bit
#                  p-1 of the FIRST block to one
#   01 ppppp n*25  1-sequence: (n+1) blocks of 31 ones; p>0 flips bit
#                  p-1 of the FIRST block to zero
# The encoder emits pure fills and literals (flip position 0); the
# decoder honors flipped bits, so sets written by real ConciseSet
# (which uses them) still decode.
# ---------------------------------------------------------------------------

_CONCISE_LITERAL = 0x80000000
_CONCISE_ALL31 = 0x7FFFFFFF
_CONCISE_ONE_SEQ = 0x40000000
_CONCISE_MAX_BLOCKS = 1 << 25  # fill counter is 25 bits (n+1 blocks)


def concise_serialize(rows) -> bytes:
    """Sorted distinct uint32 row ids -> CONCISE words (big-endian)."""
    arr = np.asarray(sorted(set(int(r) for r in rows)), dtype=np.uint64)
    words: list[int] = []

    def flush_fill(kind_ones: bool, blocks: int) -> None:
        while blocks > 0:
            n = min(blocks, _CONCISE_MAX_BLOCKS)
            words.append((_CONCISE_ONE_SEQ if kind_ones else 0) | (n - 1))
            blocks -= n

    if len(arr):
        blk = (arr // 31).astype(np.int64)
        bit = (arr % 31).astype(np.int64)
        ublk, starts = np.unique(blk, return_index=True)
        groups = np.split(bit, starts[1:])
        prev = 0  # next block index to cover
        pend_ones = 0
        for b, grp in zip(ublk, groups):
            b = int(b)
            lit = 0
            for x in grp:
                lit |= 1 << int(x)
            if b > prev:
                flush_fill(True, pend_ones)
                pend_ones = 0
                flush_fill(False, b - prev)
            if lit == _CONCISE_ALL31:
                pend_ones += 1
            else:
                flush_fill(True, pend_ones)
                pend_ones = 0
                words.append(_CONCISE_LITERAL | lit)
            prev = b + 1
        flush_fill(True, pend_ones)
    out = bytearray()
    for w in words:
        out += _I32.pack(w - (1 << 32) if w >= 1 << 31 else w)
    return bytes(out)


def concise_deserialize(data: bytes | memoryview) -> np.ndarray:
    """CONCISE words -> sorted uint32 row ids."""
    data = bytes(data)
    if len(data) % 4:
        raise DruidFormatError("Concise: byte length not a multiple of 4")
    parts: list[np.ndarray] = []
    base = 0  # int covered so far (multiple of 31)
    for i in range(0, len(data), 4):
        (sw,) = _I32.unpack_from(data, i)
        w = sw & 0xFFFFFFFF
        if w & _CONCISE_LITERAL:
            bits = w & _CONCISE_ALL31
            if bits:
                parts.append(
                    base
                    + np.array(
                        [k for k in range(31) if (bits >> k) & 1], np.uint32
                    )
                )
            base += 31
        else:
            blocks = (w & (_CONCISE_MAX_BLOCKS - 1)) + 1
            flip = (w >> 25) & 0x1F
            if w & _CONCISE_ONE_SEQ:
                ids = np.arange(base, base + 31 * blocks, dtype=np.uint32)
                if flip:
                    ids = ids[ids != base + flip - 1]
                parts.append(ids)
            elif flip:
                parts.append(np.array([base + flip - 1], np.uint32))
            base += 31 * blocks
    return (
        np.concatenate(parts).astype(np.uint32)
        if parts
        else np.empty(0, np.uint32)
    )


def write_bitmap_blob(rows, bitmap_type: int = BITMAP_TYPE_ROARING) -> bytes:
    """Druid typed bitmap blob: type byte + payload (bitmap.rs:16-28).
    0x01 roaring (Druid's default) or 0x00 CONCISE (legacy segments)."""
    if bitmap_type == BITMAP_TYPE_ROARING:
        return bytes([BITMAP_TYPE_ROARING]) + roaring_serialize(rows)
    if bitmap_type == BITMAP_TYPE_CONCISE:
        return bytes([BITMAP_TYPE_CONCISE]) + concise_serialize(rows)
    raise DruidFormatError(f"Unknown bitmap type {bitmap_type:#x}")


def read_bitmap_blob(data: bytes | memoryview) -> np.ndarray:
    data = bytes(data)
    if not data:
        return np.empty(0, np.uint32)
    if data[0] == BITMAP_TYPE_ROARING:
        return roaring_deserialize(data[1:])
    if data[0] == BITMAP_TYPE_CONCISE:
        # beyond the reference, which errors here (bitmap.rs:32-34)
        return concise_deserialize(data[1:])
    raise DruidFormatError(f"Unknown bitmap type {data[0]:#x}")


def locate_string_bitmap_index(data, base: int = 0) -> GenericIndexedV1 | None:
    """Locate (WITHOUT decoding) the optional bitmap inverted index
    appended after a v2 string column's ids. Only section sizes are
    walked; no bitmap blob is deserialized. Returns the blob-table
    GenericIndexed, or None for columns written without an index."""
    version = data[base]
    if version not in (0x02, 0x03):
        return None
    (flags,) = _I32.unpack_from(data, base + 1)
    pos = base + 5
    gi = GenericIndexedV1(data, pos)
    pos += gi.total_size()
    pos += _compressed_ints_size(data, pos)
    if flags & 0x01:  # multi-value: offsets section precedes the ids
        pos += _compressed_ints_size(data, pos)
    if pos >= len(data):
        return None
    return GenericIndexedV1(data, pos)


def read_string_bitmap_index(data, base: int = 0) -> list[np.ndarray] | None:
    """Parse the optional bitmap inverted index appended after a v2
    string column's ids: a GenericIndexed of typed bitmap blobs, one
    per dictionary id (rows where that value occurs). Returns None for
    columns written without an index. Decodes EVERY value's bitmap —
    for a single-value lookup use ``read_string_bitmap_blob``."""
    bm = locate_string_bitmap_index(data, base)
    if bm is None:
        return None
    out = []
    for i in range(len(bm)):
        blob = bm.get(i)
        out.append(
            np.empty(0, np.uint32) if blob is None else read_bitmap_blob(blob)
        )
    return out


def read_string_bitmap_blob(
    bm: GenericIndexedV1, dict_id: int
) -> np.ndarray:
    """Decode ONLY ``dict_id``'s row bitmap from a located index —
    O(1) element access via the GenericIndexed offsets, instead of
    materializing every dictionary value's bitmap (which multiplies
    one lookup's cost by the dictionary cardinality)."""
    blob = bm.get(dict_id)
    return np.empty(0, np.uint32) if blob is None else read_bitmap_blob(blob)


def read_complex_column(data, base: int = 0, rows=None) -> list[bytes | None]:
    """COMPLEX column -> list of opaque binary blobs (HLL sketches,
    histograms...). Layout: [0x01][GenericIndexed of byte elements].

    The reference surfaces COMPLEX in the schema as Binary
    (src/segment/mod.rs:127) but ERRORS on read
    (src/column/mod.rs:59-61, UnsupportedColumnType); this reader makes
    the declared capability real.
    """
    if data[base] != 0x01:
        raise DruidFormatError(
            f"Complex column: unsupported version {data[base]:#x}"
        )
    gi = GenericIndexedV1(data, base + 1)
    if rows is not None:
        # GenericIndexed is an offset table — random access per row,
        # no need to materialize the unselected blobs
        return [gi.get(int(r)) for r in rows]
    return gi.to_list()


def write_complex_column(blobs: list[bytes | None]) -> bytes:
    return bytes([0x01]) + write_generic_indexed(list(blobs), sorted_flag=False)


# ---------------------------------------------------------------------------
# index.drd (metadata.rs:9-17):
# [columns GI<String>][dimensions GI<String>][interval_start i64][interval_end i64]
# ---------------------------------------------------------------------------


@dataclass
class SegmentMetadata:
    columns: list[str] = field(default_factory=list)
    dimensions: list[str] = field(default_factory=list)
    interval_start_ms: int = 0
    interval_end_ms: int = 0

    @classmethod
    def from_bytes(cls, data) -> "SegmentMetadata":
        pos = 0
        cols_gi = GenericIndexedV1(data, pos)
        columns = [cols_gi.get_str(i) for i in range(len(cols_gi))]
        if any(c is None for c in columns):
            raise DruidFormatError("index.drd: null column name")
        pos += cols_gi.total_size()
        dims_gi = GenericIndexedV1(data, pos)
        dimensions = [dims_gi.get_str(i) for i in range(len(dims_gi))]
        pos += dims_gi.total_size()
        if len(data) < pos + 16:
            raise DruidFormatError("index.drd: too short for interval")
        (start_ms,) = _I64.unpack_from(data, pos)
        (end_ms,) = _I64.unpack_from(data, pos + 8)
        return cls(columns, dimensions, start_ms, end_ms)

    def to_bytes(self) -> bytes:
        out = bytearray()
        out += write_generic_indexed([c.encode("utf-8") for c in self.columns])
        out += write_generic_indexed([d.encode("utf-8") for d in self.dimensions])
        out += _I64.pack(self.interval_start_ms)
        out += _I64.pack(self.interval_end_ms)
        return bytes(out)


# ---------------------------------------------------------------------------
# Smoosh archive (smoosh.rs:27-131)
# meta.smoosh: "v1,<max_chunk_size>,<num_chunks>" then "<name>,<chunk>,<start>,<end>"
# ---------------------------------------------------------------------------

MAX_CHUNK_SIZE = 2_147_483_647


class SmooshReader:
    """mmap-backed logical-file table over a segment directory.

    Chunk files open LAZILY on first access: listing the logical-file
    catalog (meta.smoosh) never touches the data chunks — the metadata
    pass a planner makes over thousands of segments stays metadata-only."""

    def __init__(self, segment_dir: str):
        self._dir = segment_dir
        meta_path = os.path.join(segment_dir, "meta.smoosh")
        with open(meta_path, encoding="utf-8") as f:
            lines = f.read().splitlines()
        if not lines:
            raise DruidFormatError("meta.smoosh is empty")
        header = lines[0].split(",")
        if len(header) < 3 or header[0] != "v1":
            raise DruidFormatError(f"Invalid meta.smoosh header: {lines[0]!r}")
        self.num_chunks = int(header[2])
        self.entries: dict[str, tuple[int, int, int]] = {}
        for line in lines[1:]:
            line = line.strip()
            if not line:
                continue
            parts = line.split(",")
            if len(parts) < 4:
                raise DruidFormatError(f"Invalid meta.smoosh entry: {line!r}")
            self.entries[parts[0]] = (int(parts[1]), int(parts[2]), int(parts[3]))
        self._files: dict[int, object] = {}
        self._mmaps: dict[int, mmap.mmap] = {}

    def _chunk(self, i: int) -> mmap.mmap:
        if i not in self._mmaps:
            if not 0 <= i < self.num_chunks:
                raise DruidFormatError(f"Chunk {i} out of range")
            f = open(os.path.join(self._dir, f"{i:05d}.smoosh"), "rb")
            self._files[i] = f
            self._mmaps[i] = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        return self._mmaps[i]

    def map_file(self, name: str) -> memoryview:
        if name not in self.entries:
            raise DruidFormatError(f"Logical file not found: {name}")
        chunk, start, end = self.entries[name]
        mm = self._chunk(chunk)
        if end > len(mm):
            raise DruidFormatError(f"File {name} end offset {end} exceeds chunk")
        return memoryview(mm)[start:end]

    def file_names(self) -> list[str]:
        return sorted(self.entries)

    def has_file(self, name: str) -> bool:
        return name in self.entries

    def close(self) -> None:
        for mm in self._mmaps.values():
            mm.close()
        for f in self._files.values():
            f.close()


def write_smoosh(
    segment_dir: str,
    logical_files: dict[str, bytes],
    max_chunk_size: int = MAX_CHUNK_SIZE,
) -> None:
    """Smoosh writer with Druid's chunk-rollover rule: a logical file
    never spans chunks — when the current NNNNN.smoosh cannot fit the
    next file, a new chunk starts (the reader side of this layout is
    smoosh.rs:27-131; rollover matters past 2 GB per chunk, and small
    ``max_chunk_size`` values let tests exercise the multi-chunk read
    path)."""
    os.makedirs(segment_dir, exist_ok=True)
    entries: list[str] = []
    chunk_idx, offset = 0, 0
    chunk = open(os.path.join(segment_dir, "00000.smoosh"), "wb")
    try:
        for name, data in logical_files.items():
            if len(data) > max_chunk_size:
                raise DruidFormatError(
                    f"Logical file {name} ({len(data)} B) exceeds "
                    f"max_chunk_size {max_chunk_size}"
                )
            if offset and offset + len(data) > max_chunk_size:
                chunk.close()
                chunk_idx += 1
                offset = 0
                chunk = open(
                    os.path.join(segment_dir, f"{chunk_idx:05d}.smoosh"), "wb"
                )
            chunk.write(data)
            entries.append(f"{name},{chunk_idx},{offset},{offset + len(data)}")
            offset += len(data)
    finally:
        chunk.close()
    lines = [f"v1,{max_chunk_size},{chunk_idx + 1}"] + entries
    with open(os.path.join(segment_dir, "meta.smoosh"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
