"""Unit tests for the Druid v9 binary codecs — build-then-parse round
trips, the reference's own unit-test style (reference
src/column/generic_indexed.rs:253-346, vsize_ints.rs:113-163,
version.rs:27-49), plus property-based coverage the reference lacks.

These are pure-Python (no Spark session), so they run in milliseconds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from druid_datafusion_bridge_spark.sources import druid_format as fmt
from druid_datafusion_bridge_spark.sources.segment import DruidSegment, write_segment


# --- version.bin (version.rs:27-49 test parity) ---------------------------


def test_version_valid():
    assert fmt.read_version(b"\x00\x00\x00\x09") == 9


def test_version_invalid():
    with pytest.raises(fmt.DruidFormatError):
        fmt.read_version(b"\x00\x00\x00\x08")


def test_version_truncated():
    with pytest.raises(fmt.DruidFormatError):
        fmt.read_version(b"\x00\x00")


def test_version_roundtrip():
    assert fmt.read_version(fmt.write_version()) == 9


# --- GenericIndexed v1 (generic_indexed.rs:301-346 test parity) -----------


def test_generic_indexed_strings():
    data = fmt.write_generic_indexed([b"alpha", b"beta", b"gamma"])
    gi = fmt.GenericIndexedV1(data)
    assert len(gi) == 3
    assert [gi.get_str(i) for i in range(3)] == ["alpha", "beta", "gamma"]


def test_generic_indexed_null_element():
    data = fmt.write_generic_indexed([b"hello", None, b"world"])
    gi = fmt.GenericIndexedV1(data)
    assert gi.get_str(0) == "hello"
    assert gi.get(1) is None
    assert gi.get_str(2) == "world"


def test_generic_indexed_empty_element_is_not_null():
    # length-prefixed: empty != null (the ObjectStrategy variant differs)
    data = fmt.write_generic_indexed([b"", b"x"])
    gi = fmt.GenericIndexedV1(data)
    assert gi.get(0) == b""
    assert gi.get(1) == b"x"


def test_generic_indexed_empty_container():
    gi = fmt.GenericIndexedV1(fmt.write_generic_indexed([]))
    assert len(gi) == 0
    assert gi.total_size() == fmt.GI_HEADER_SIZE


def test_generic_indexed_invalid_version():
    with pytest.raises(fmt.DruidFormatError):
        fmt.GenericIndexedV1(bytes([0x02, 0x00] + [0] * 8))


def test_generic_indexed_object_strategy_empty_is_null():
    # [4 zero bytes][utf8], empty => null (generic_indexed.rs:212-214)
    elements = [b"\x00\x00\x00\x00wiki", b"\x00\x00\x00\x00"]
    values = bytearray()
    offsets = []
    for e in elements:
        values += e
        offsets.append(len(values))
    raw = bytearray([0x01, 0x01])
    raw += (len(elements) * 4 + len(values)).to_bytes(4, "big")
    raw += len(elements).to_bytes(4, "big")
    for off in offsets:
        raw += off.to_bytes(4, "big")
    raw += values
    gi = fmt.GenericIndexedV1(bytes(raw))
    assert gi.get_object_string(0) == "wiki"
    assert gi.get_object_string(1) is None


@given(
    st.lists(
        st.one_of(st.none(), st.binary(max_size=64)), max_size=50
    )
)
@settings(max_examples=50, deadline=None)
def test_generic_indexed_roundtrip_property(elements):
    gi = fmt.GenericIndexedV1(fmt.write_generic_indexed(elements))
    assert gi.to_list() == elements
    # total_size lands exactly at the end of the buffer
    assert gi.total_size() == len(fmt.write_generic_indexed(elements))


# --- VSizeColumnarInts (vsize_ints.rs:133-163 test parity) ----------------


@pytest.mark.parametrize(
    "num_bytes,values",
    [
        (1, [0, 1, 2, 255]),
        (2, [0, 256, 1000, 65535]),
        (3, [0, 65536, 1 << 23, (1 << 24) - 1]),
        (4, [0, 1 << 24, (1 << 31) - 1]),
    ],
)
def test_vsize_ints_widths(num_bytes, values):
    data = fmt.write_vsize_ints(np.array(values, np.uint32), num_bytes)
    out = fmt.read_vsize_ints(data)
    assert out.tolist() == values


def test_vsize_ints_bad_version():
    with pytest.raises(fmt.DruidFormatError):
        fmt.read_vsize_ints(b"\x01\x01\x00\x00\x00\x00")


# --- LZ4 block codec ------------------------------------------------------


def test_lz4_literal_roundtrip():
    data = b"hello world " * 100 + bytes(range(256))
    comp = fmt.lz4_block_compress_literal(data)
    assert fmt.lz4_block_decompress(comp, len(data)) == data


def test_lz4_with_matches():
    # Hand-built block with a real match sequence: 8 literals then an
    # 8-byte match at offset 8 (doubles the literals), then final literals.
    lit = b"ABCDEFGH"
    block = bytes([0x84]) + lit + b"\x08\x00" + bytes([0x30]) + b"xyz"
    out = fmt.lz4_block_decompress(block, 8 + 8 + 3)
    assert out == lit + lit + b"xyz"


def test_lz4_overlapping_match_rle():
    # 1 literal 'A', then match offset 1 len 19 => run-length expansion
    block = bytes([0x1F]) + b"A" + b"\x01\x00" + bytes([0x00])
    out = fmt.lz4_block_decompress(block, 20)
    assert out == b"A" * 20


@given(st.binary(min_size=0, max_size=2048))
@settings(max_examples=50, deadline=None)
def test_lz4_literal_roundtrip_property(data):
    comp = fmt.lz4_block_compress_literal(data)
    assert fmt.lz4_block_decompress(comp, len(data)) == data


# --- Compressed columnar numerics ----------------------------------------


@pytest.mark.parametrize("strategy", [fmt.LZ4, fmt.LZF, fmt.ZSTD, fmt.UNCOMPRESSED])
def test_compressed_longs_multiblock(strategy):
    values = np.arange(-5000, 5000, dtype=np.int64) * 1_000_003
    data = fmt.write_compressed_longs(values, size_per=256, strategy=strategy)
    out = fmt.read_compressed_longs(data)
    assert np.array_equal(out, values)


@pytest.mark.parametrize("strategy", [fmt.LZ4, fmt.LZF, fmt.ZSTD, fmt.UNCOMPRESSED])
def test_compressed_doubles_multiblock(strategy):
    rng = np.random.default_rng(42)
    values = rng.normal(size=3000)
    data = fmt.write_compressed_doubles(values, size_per=1024, strategy=strategy)
    assert np.array_equal(fmt.read_compressed_doubles(data), values)


def test_zstd_block_roundtrip_and_real_compression():
    """ZSTD is a real codec here (Arrow's), not literal-only: repetitive
    input must actually shrink, and the frame round-trips bit-exactly.
    The reference ERRORS on ZSTD (compression/mod.rs:43-44) — this is
    beyond-parity surface for modern Druid deployments."""
    raw = b"druid segment block " * 500
    comp = fmt.compress_block(fmt.ZSTD, raw)
    assert len(comp) < len(raw) // 10
    assert fmt.decompress_block(fmt.ZSTD, comp, len(raw)) == raw


def test_compressed_floats():
    values = np.array([1.5, -2.25, 0.0, 3e7], np.float32)
    data = fmt.write_compressed_floats(values)
    assert np.array_equal(fmt.read_compressed_floats(data), values)


def test_compressed_ints_widths():
    for nb, mx in [(1, 255), (2, 65535), (3, (1 << 24) - 1), (4, (1 << 31) - 1)]:
        values = np.array([0, 1, mx // 2, mx], np.uint32)
        data = fmt.write_compressed_ints(values, num_bytes=nb, size_per=2)
        assert fmt.read_compressed_ints(data).tolist() == values.tolist()


def test_compressed_empty():
    data = fmt.write_compressed_longs(np.array([], np.int64))
    assert len(fmt.read_compressed_longs(data)) == 0


def test_corrupt_and_unknown_compression_errors():
    # LZF/ZSTD are supported beyond reference parity (the reference
    # errors on both, compression/mod.rs:43-44) but corrupt blocks must
    # fail loudly as DruidFormatError, and unknown strategy ids too.
    for strat in (fmt.LZF, fmt.ZSTD):
        with pytest.raises(fmt.DruidFormatError):
            fmt.decompress_block(strat, b"xx", 2)
    with pytest.raises(fmt.DruidFormatError):
        fmt.decompress_block(0x7A, b"xx", 2)


# --- String column --------------------------------------------------------


def test_string_column_v2_roundtrip():
    dictionary = [None, "", "#en", "#fr"]
    ids = np.array([2, 0, 3, 2, 1], np.uint32)
    data = fmt.write_string_column_v2(dictionary, ids)
    d, i = fmt.read_string_column(data)
    d = d.to_pylist()
    assert d == dictionary
    assert i.tolist() == ids.tolist()
    # standard-SQL nulls: '' stays a string, None stays null (SURVEY §1.6)
    resolved = [d[x] for x in i]
    assert resolved == ["#en", None, "#fr", "#en", ""]


def test_string_multi_column_roundtrip():
    dictionary = [None, "a", "b", "c"]
    # rows: [a,b] [] [b,b,c] [NULL-entry]
    offsets = np.array([2, 2, 5, 6], np.uint32)
    ids = np.array([1, 2, 2, 2, 3, 0], np.uint32)
    data = fmt.write_string_multi_column(dictionary, offsets, ids)
    d, offs, i = fmt.read_string_multi_column(data)
    assert d.to_pylist() == dictionary
    assert offs.tolist() == offsets.tolist()
    assert i.tolist() == ids.tolist()


def test_string_multi_column_rejects_single_value_flags():
    data = fmt.write_string_column_v2(["a"], np.array([0], np.uint32))
    with pytest.raises(fmt.DruidFormatError):
        fmt.read_string_multi_column(data)


def test_segment_multivalue_roundtrip(tmp_path):
    t = pa.table(
        {
            "__time": pa.array([1000, 2000, 3000, 4000], pa.timestamp("ms")),
            "tags": pa.array(
                [["a", "b"], [], None, ["b", "b", "c"]], pa.list_(pa.string())
            ),
            "channel": pa.array(["#en", "#fr", "#de", "#en"]),
        }
    )
    path = str(tmp_path / "seg")
    write_segment(t, path)
    seg = DruidSegment(path)
    try:
        assert seg.metadata.dimensions == ["tags", "channel"]
        got = seg.read_batch().to_pydict()
        # Druid MVDs have no row-null distinct from empty: null -> []
        assert got["tags"] == [["a", "b"], [], [], ["b", "b", "c"]]
    finally:
        seg.close()


def test_string_column_v0_roundtrip():
    dictionary = ["a", "b", "c"]
    ids = np.array([2, 1, 0, 1], np.uint32)
    data = fmt.write_string_column_v0(dictionary, ids)
    d, i = fmt.read_string_column(data)
    assert d.to_pylist() == dictionary
    assert i.tolist() == ids.tolist()


# --- index.drd metadata ---------------------------------------------------


def test_index_drd_roundtrip():
    meta = fmt.SegmentMetadata(
        columns=["__time", "channel", "added"],
        dimensions=["channel"],
        interval_start_ms=1442016480000,
        interval_end_ms=1442102400000,
    )
    out = fmt.SegmentMetadata.from_bytes(meta.to_bytes())
    assert out == meta


# --- column envelope ------------------------------------------------------


def test_column_header_roundtrip():
    desc = {"valueType": "LONG", "hasMultipleValues": False,
            "parts": [{"type": "longV2"}]}
    data = fmt.build_column(desc, b"\xde\xad\xbe\xef")
    got, off = fmt.parse_column_header(data)
    assert got == desc
    assert bytes(data[off:]) == b"\xde\xad\xbe\xef"


def test_column_header_missing_value_type():
    with pytest.raises(fmt.DruidFormatError):
        fmt.parse_column_header(fmt.build_column({"parts": []}, b""))


# --- whole-segment round trip (pyarrow level) ----------------------------


def _sample_table() -> pa.Table:
    return pa.table(
        {
            "__time": pa.array([1000, 2000, 3000, 4000, 5000], pa.timestamp("ms")),
            "channel": pa.array(["#en", None, "#fr", "#en", ""]),
            "added": pa.array([10, 20, 30, 40, 50], pa.int64()),
            "score": pa.array([1.5, 2.5, -3.5, 0.0, 9.75], pa.float64()),
            "ratio": pa.array([0.5, 0.25, 0.125, 1.0, 2.0], pa.float32()),
        }
    )


@pytest.mark.parametrize("strategy", [fmt.LZ4, fmt.LZF, fmt.ZSTD, fmt.UNCOMPRESSED])
def test_segment_roundtrip(tmp_path, strategy):
    path = str(tmp_path / "seg")
    t = _sample_table()
    write_segment(t, path, strategy=strategy)
    seg = DruidSegment(path)
    try:
        assert seg.num_rows() == 5
        assert seg.metadata.columns == ["__time", "channel", "added", "score", "ratio"]
        assert seg.metadata.dimensions == ["channel"]
        # interval = [min(__time), max(__time)+1) in millis
        assert seg.metadata.interval_start_ms == 1000
        assert seg.metadata.interval_end_ms == 5001
        got = seg.read_batch().to_pydict()
        assert got["channel"] == ["#en", None, "#fr", "#en", ""]
        assert got["added"] == [10, 20, 30, 40, 50]
        assert got["score"] == [1.5, 2.5, -3.5, 0.0, 9.75]
        assert got["ratio"] == [0.5, 0.25, 0.125, 1.0, 2.0]
    finally:
        seg.close()


def test_segment_projection_reads_subset(tmp_path):
    path = str(tmp_path / "seg")
    write_segment(_sample_table(), path)
    seg = DruidSegment(path)
    try:
        b = seg.read_batch(["added", "channel"])
        assert b.schema.names == ["added", "channel"]
        assert b.num_rows == 5
    finally:
        seg.close()


def test_segment_requires_time_column(tmp_path):
    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    with pytest.raises(fmt.DruidFormatError):
        write_segment(t, str(tmp_path / "seg"))


def test_smoosh_multichunk_roundtrip(tmp_path):
    """Chunk rollover (smoosh.rs:27-29 layout): logical files spanning
    the chunk-boundary TABLE (never a single file across chunks) must
    land in distinct NNNNN.smoosh files and read back byte-exact."""
    import os

    path = str(tmp_path / "seg")
    files = {f"f{i}": bytes([i]) * 40 for i in range(5)}
    fmt.write_smoosh(path, files, max_chunk_size=100)
    # 40+40 fit chunk 0; f2 rolls (80+40>100); f3 joins f2; f4 rolls
    rd = fmt.SmooshReader(path)
    try:
        assert rd.num_chunks == 3
        assert sorted(os.listdir(path)) == [
            "00000.smoosh", "00001.smoosh", "00002.smoosh", "meta.smoosh",
        ]
        assert {n: rd.entries[n][0] for n in files} == {
            "f0": 0, "f1": 0, "f2": 1, "f3": 1, "f4": 2,
        }
        for name, data in files.items():
            assert bytes(rd.map_file(name)) == data
    finally:
        rd.close()


def test_smoosh_rejects_file_over_chunk_size(tmp_path):
    with pytest.raises(fmt.DruidFormatError):
        fmt.write_smoosh(str(tmp_path / "seg"), {"big": b"x" * 11},
                         max_chunk_size=10)


def test_segment_multichunk_column_decode(tmp_path):
    """A REAL segment written with a small max_chunk_size: every column's
    logical file lands in its own chunk region, and the full decode path
    (index.drd -> per-column headers -> values) must work across the
    chunk table exactly as in the single-chunk layout."""
    path = str(tmp_path / "seg")
    t = _sample_table()
    # "min" = largest logical file: always a legal multi-chunk layout,
    # whatever metadata.drd grows to (a fixed byte budget broke when
    # columnStats zone maps were added)
    write_segment(t, path, max_chunk_size="min")
    seg = DruidSegment(path)
    try:
        assert seg.smoosh.num_chunks > 1
        got = seg.read_batch().to_pydict()
        assert got["channel"] == ["#en", None, "#fr", "#en", ""]
        assert got["added"] == [10, 20, 30, 40, 50]
        assert got["score"] == [1.5, 2.5, -3.5, 0.0, 9.75]
    finally:
        seg.close()


def test_segment_files_listing(tmp_path):
    path = str(tmp_path / "seg")
    write_segment(_sample_table(), path)
    seg = DruidSegment(path)
    try:
        files = seg.files()
        # every column is a logical file + index.drd + metadata.drd
        # (BASELINE.md: 22 logical files for 20 columns in the fixture)
        assert set(files) == {
            "__time", "channel", "added", "score", "ratio",
            "index.drd", "metadata.drd",
        }
    finally:
        seg.close()


class TestLZF:
    """LZF codec (beyond reference parity — the reference errors on LZF,
    compression/mod.rs:43-44, but legacy Druid v1 compressed columns
    imply it)."""

    def test_raw_decompress_literals_and_backref(self):
        from druid_datafusion_bridge_spark.sources.druid_format import (
            lzf_raw_decompress,
        )

        # hand-assembled stream: literal run "abc", then a back-reference
        # of length 4 (ctrl 3-bit len=2 => 2+2) at offset 2 ("bcab"...
        # offset field 2 => ref = pos-3): "abc" + copy from 'a' => "abcabca"
        stream = bytes([0x02]) + b"abc" + bytes([(2 << 5) | 0x00, 0x02])
        assert lzf_raw_decompress(stream) == b"abcabca"

    def test_raw_decompress_rle_overlap(self):
        from druid_datafusion_bridge_spark.sources.druid_format import (
            lzf_raw_decompress,
        )

        # single literal 'x' then a self-overlapping backref of 9 bytes
        # (len ext: 7 saturated + 0 => 7+2) at offset 0 => ref=pos-1: RLE
        stream = bytes([0x00]) + b"x" + bytes([(7 << 5) | 0x00, 0x00, 0x00])
        assert lzf_raw_decompress(stream) == b"x" * 10

    def test_chunk_roundtrip(self):
        import os as _os
        from druid_datafusion_bridge_spark.sources.druid_format import (
            lzf_chunks_compress_literal,
            lzf_chunks_decompress,
        )

        for payload in (b"", b"abc", _os.urandom(200_000)):
            enc = lzf_chunks_compress_literal(payload)
            assert lzf_chunks_decompress(enc, len(payload)) == payload

    def test_block_strategy_roundtrip(self):
        from druid_datafusion_bridge_spark.sources.druid_format import (
            LZF,
            compress_block,
            decompress_block,
        )

        raw = bytes(range(256)) * 100
        assert decompress_block(LZF, compress_block(LZF, raw), len(raw)) == raw


class TestRoaringBitmaps:
    """Roaring inverted index (beyond reference parity: bitmap.rs reads
    roaring blobs but the reference never writes or applies them)."""

    def test_roundtrip_array_and_bitmap_containers(self):
        import numpy as np

        cases = [
            [],
            [0],
            [0, 1, 2, 65535, 65536, 131072 + 5],       # multi-key, array
            list(range(5000)),                          # bitmap container
            list(range(0, 200000, 3)),                  # bitmap + array mix
        ]
        for rows in cases:
            enc = fmt.roaring_serialize(rows)
            out = fmt.roaring_deserialize(enc)
            assert out.tolist() == sorted(set(rows))
            assert out.dtype == np.uint32

    def test_run_container_decode(self):
        import struct as _s

        # hand-built cookie-12347 stream: 1 container, run flag set,
        # runs [(10, len 5), (100, len 1)] => {10..15} | {100, 101}
        data = bytearray()
        data += _s.pack("<I", 12347 | (0 << 16))  # count-1 = 0
        data += bytes([0x01])                     # run bitset: container 0
        data += _s.pack("<HH", 0, 8 - 1)          # key 0, cardinality 8
        data += _s.pack("<H", 2)                  # 2 runs
        data += _s.pack("<HH", 10, 5)             # start 10, len-1 5
        data += _s.pack("<HH", 100, 1)            # start 100, len-1 1
        out = fmt.roaring_deserialize(bytes(data))
        assert out.tolist() == [10, 11, 12, 13, 14, 15, 100, 101]

    def test_typed_blob_both_bitmap_types(self):
        enc = fmt.write_bitmap_blob([3, 7, 11])
        assert enc[0] == fmt.BITMAP_TYPE_ROARING
        assert fmt.read_bitmap_blob(enc).tolist() == [3, 7, 11]
        # CONCISE: the reference errors on type 0x00 (bitmap.rs:32-34);
        # here legacy blobs read AND write
        enc0 = fmt.write_bitmap_blob([3, 7, 11], fmt.BITMAP_TYPE_CONCISE)
        assert enc0[0] == fmt.BITMAP_TYPE_CONCISE
        assert fmt.read_bitmap_blob(enc0).tolist() == [3, 7, 11]
        with pytest.raises(fmt.DruidFormatError, match="multiple of 4"):
            fmt.read_bitmap_blob(bytes([fmt.BITMAP_TYPE_CONCISE, 0, 0]))

    def test_concise_roundtrip_shapes(self):
        import random

        random.seed(7)
        cases = [
            [],
            [0],
            [30],
            [31],
            list(range(31)),          # one full literal -> 1-fill
            list(range(62)),          # two full blocks -> one 2-block fill
            [0, 10_000_000],          # huge zero gap -> multi-word fills
            list(range(5, 5000)),
            sorted(random.sample(range(100_000), 5000)),
            sorted(random.sample(range(10_000_000), 300)),
        ]
        for c in cases:
            words = fmt.concise_serialize(c)
            assert len(words) % 4 == 0
            assert fmt.concise_deserialize(words).tolist() == sorted(set(c))
        # fills must compress: 62 consecutive ones = ONE word
        assert len(fmt.concise_serialize(range(62))) == 4

    def test_concise_flipped_bit_decode(self):
        import struct

        # real ConciseSet emits mixed fills: 0-seq of 3 blocks with
        # position 5 -> only bit 4 of the first block is set
        w = (5 << 25) | (3 - 1)
        assert fmt.concise_deserialize(struct.pack(">i", w)).tolist() == [4]
        # 1-seq of 2 blocks, position 1 -> bit 0 of first block cleared
        w = 0x40000000 | (1 << 25) | (2 - 1)
        got = fmt.concise_deserialize(struct.pack(">i", w)).tolist()
        assert got == [x for x in range(62) if x != 0]

    def test_concise_matches_roaring_decode(self):
        import random

        random.seed(11)
        rows = sorted(random.sample(range(1_000_000), 10_000))
        via_concise = fmt.read_bitmap_blob(
            fmt.write_bitmap_blob(rows, fmt.BITMAP_TYPE_CONCISE)
        )
        via_roaring = fmt.read_bitmap_blob(fmt.write_bitmap_blob(rows))
        assert via_concise.tolist() == via_roaring.tolist() == rows

    def test_string_column_concise_index_scans(self):
        dictionary = ["a", "b", "c"]
        ids = np.array([0, 1, 2, 1, 0, 2, 2, 1], np.int64)
        payload = fmt.write_string_column_v2(
            dictionary,
            ids,
            bitmap_index=True,
            bitmap_type=fmt.BITMAP_TYPE_CONCISE,
        )
        index = fmt.read_string_bitmap_index(payload)
        assert index is not None
        for dict_id, rows in enumerate(index):
            assert rows.tolist() == np.flatnonzero(ids == dict_id).tolist()

    def test_string_column_bitmap_index_roundtrip(self):
        import numpy as np

        dictionary = [None, "a", "b", "c"]
        ids = np.array([1, 2, 1, 0, 3, 1, 2, 2], np.int64)
        col = fmt.write_string_column_v2(dictionary, ids, bitmap_index=True)
        # value read path is unchanged and ignores the index
        d2, i2 = fmt.read_string_column(col)
        assert d2.to_pylist() == dictionary and i2.tolist() == ids.tolist()
        # the inverted index inverts exactly
        index = fmt.read_string_bitmap_index(col)
        assert index is not None and len(index) == len(dictionary)
        for dict_id, rows in enumerate(index):
            assert rows.tolist() == np.flatnonzero(ids == dict_id).tolist()
        # a column without the index reports None
        assert fmt.read_string_bitmap_index(
            fmt.write_string_column_v2(dictionary, ids)
        ) is None

    def test_single_blob_lookup_and_dict_binary_search(self):
        """The lazy lookup path (locate + one-blob decode + dictionary
        binary search) must agree with the eager index for every value,
        including the null slot, absent values, and probes that sort
        before/after the whole dictionary; the linear fallback must
        kick in when the sorted/allowReverseLookup flag is off."""
        import numpy as np

        from druid_datafusion_bridge_spark.sources.segment import DruidSegment

        dictionary = [None, "apple", "mango", "pear", "zebra"]
        ids = np.array([1, 4, 2, 0, 3, 1, 2, 2, 4, 0], np.int64)
        col = fmt.write_string_column_v2(dictionary, ids, bitmap_index=True)
        bm = fmt.locate_string_bitmap_index(col)
        assert bm is not None
        gi = fmt.GenericIndexedV1(col, 5)
        assert gi.flags & 0x01  # writer stamps sorted/allowReverseLookup
        lookup = DruidSegment._dict_id_of
        for dict_id, value in enumerate(dictionary):
            assert lookup(gi, value) == dict_id
            assert fmt.read_string_bitmap_blob(bm, dict_id).tolist() == (
                np.flatnonzero(ids == dict_id).tolist()
            )
        for absent in ("aaa", "banana", "zz", ""):
            assert lookup(gi, absent) is None
        # unsorted dictionary (flag off): binary search is invalid, the
        # linear fallback must still find every value
        unsorted = ["mango", "apple", "zebra"]
        raw = bytearray([0x02]) + b"\x00\x00\x00\x00"
        raw += fmt.write_generic_indexed(
            [v.encode() for v in unsorted], sorted_flag=False
        )
        gi_u = fmt.GenericIndexedV1(bytes(raw), 5)
        assert not (gi_u.flags & 0x01)
        for i, v in enumerate(unsorted):
            assert lookup(gi_u, v) == i
        assert lookup(gi_u, "pear") is None


@given(
    st.lists(st.integers(min_value=0, max_value=500_000), max_size=400),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=150, deadline=None)
def test_concise_fuzz_roundtrip_and_cross_codec(rows, pad):
    """Any id set round-trips through CONCISE and agrees with the
    roaring codec; appending dense runs exercises fill words."""
    if pad:
        start = (max(rows) if rows else 0) + 31 * pad
        rows = rows + list(range(start, start + 31 * pad))
    want = sorted(set(rows))
    assert fmt.concise_deserialize(fmt.concise_serialize(rows)).tolist() == want
    via_roaring = fmt.roaring_deserialize(fmt.roaring_serialize(rows)).tolist()
    assert via_roaring == want


# --- sliced (index-selected) decode ----------------------------------------


def test_sliced_decode_matches_full_then_take():
    """rows= must return exactly full_decode[rows] for every fixed-width
    layout, across block boundaries (tiny size_per forces many blocks)."""
    rng = np.random.default_rng(7)
    rows = np.array([0, 1, 63, 64, 65, 500, 998, 999], np.int64)

    longs = rng.integers(-(2**40), 2**40, 1000, dtype=np.int64)
    data = fmt.write_compressed_longs(longs, size_per=64)
    assert fmt.read_compressed_longs(data, rows=rows).tolist() == longs[rows].tolist()

    dbls = rng.normal(size=1000)
    data = fmt.write_compressed_doubles(dbls, size_per=64)
    assert np.array_equal(fmt.read_compressed_doubles(data, rows=rows), dbls[rows])

    flts = rng.normal(size=1000).astype(np.float32)
    data = fmt.write_compressed_floats(flts, size_per=64)
    assert np.array_equal(fmt.read_compressed_floats(data, rows=rows), flts[rows])

    ints = rng.integers(0, 1 << 20, 1000).astype(np.uint32)
    data = fmt.write_compressed_ints(ints, size_per=64)
    assert fmt.read_compressed_ints(data, rows=rows).tolist() == ints[rows].tolist()

    # v0 vsize layout: positional gather
    data = fmt.write_vsize_ints(ints, 3)
    assert fmt.read_vsize_ints(data, rows=rows).tolist() == ints[rows].tolist()

    # complex blobs: offset-table random access
    blobs = [bytes([i % 251]) * (i % 7 + 1) for i in range(100)]
    data = fmt.write_complex_column(blobs)
    got = fmt.read_complex_column(data, rows=[0, 42, 99])
    assert got == [blobs[0], blobs[42], blobs[99]]

    # out-of-range row ids fail loudly, not silently wrap
    data = fmt.write_compressed_longs(longs, size_per=64)
    with pytest.raises(fmt.DruidFormatError):
        fmt.read_compressed_longs(data, rows=np.array([1000]))


def test_sliced_decode_decompresses_only_needed_blocks(monkeypatch):
    """The point of the slice: 1000 values in 16 blocks, two selected
    rows in two distinct blocks => exactly 2 block decompressions (a
    decode-then-take would pay all 16)."""
    longs = np.arange(1000, dtype=np.int64)
    data = fmt.write_compressed_longs(longs, size_per=64)
    calls = []
    real = fmt.decompress_block

    def counting(strategy, block, out_size):
        calls.append(out_size)
        return real(strategy, block, out_size)

    monkeypatch.setattr(fmt, "decompress_block", counting)
    got = fmt.read_compressed_longs(data, rows=np.array([5, 999]))
    assert got.tolist() == [5, 999]
    assert len(calls) == 2


def test_segment_read_batch_rows_slices_all_column_types(tmp_path):
    """End-to-end: a segment's read_batch(rows=...) must equal the full
    batch take()n to the same rows for string/long/double/float/time."""
    path = str(tmp_path / "seg")
    t = _sample_table()
    write_segment(t, path)
    seg = DruidSegment(path)
    try:
        rows = np.array([1, 3, 4], np.int64)
        sliced = seg.read_batch(rows=rows).to_pydict()
        full = seg.read_batch().to_pydict()
        for col, vals in sliced.items():
            assert vals == [full[col][i] for i in rows], col
    finally:
        seg.close()


@given(
    st.lists(st.integers(-(2**50), 2**50), min_size=1, max_size=300),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_sliced_decode_property(values, data):
    """For ANY value sequence, block size, and sorted row subset, the
    sliced decode must equal full_decode[rows] exactly."""
    arr = np.array(values, np.int64)
    size_per = data.draw(st.integers(1, len(arr) + 8))
    rows = sorted(
        data.draw(
            st.sets(st.integers(0, len(arr) - 1), min_size=1, max_size=20)
        )
    )
    payload = fmt.write_compressed_longs(arr, size_per=size_per)
    got = fmt.read_compressed_longs(payload, rows=np.array(rows, np.int64))
    assert got.tolist() == arr[rows].tolist()


def test_sliced_decode_rejects_unsorted_and_negative_rows():
    """Row-id selections must be sorted ascending and in range — an
    unsorted or mid-array-negative selection fails as DruidFormatError
    up front, never as a misleading downstream unpack/index error."""
    import numpy as np
    import pytest

    from druid_datafusion_bridge_spark.sources.druid_format import (
        DruidFormatError,
        read_compressed_longs,
        read_vsize_ints,
        write_compressed_longs,
        write_vsize_ints,
    )

    longs = write_compressed_longs(np.arange(1000))
    vsize = write_vsize_ints(np.arange(300), 2)
    for bad in ([5000, 3], [3, -5], [900, 2]):
        with pytest.raises(DruidFormatError):
            read_compressed_longs(longs, rows=np.array(bad))
        with pytest.raises(DruidFormatError):
            read_vsize_ints(vsize, rows=np.array(bad))
    assert list(read_compressed_longs(longs, rows=np.array([2, 900]))) == [2, 900]
    assert list(read_vsize_ints(vsize, rows=np.array([0, 299]))) == [0, 299]
