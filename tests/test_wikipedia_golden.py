"""Cross-implementation golden test: parse the reference repo's REAL
wikipedia segment fixture (produced by Apache Druid itself) with our
from-scratch codec and assert the same facts the reference asserts in
its own test suite (reference tests/wikipedia_segment_test.rs:12-24,
114-231). Round-trip tests against self-written segments can't catch a
shared misunderstanding of the format; a Druid-written artifact can.

The fixture's 5.2 MB data chunk (00000.smoosh) is stripped from the
snapshot, so the assertions cover the metadata plane: meta.smoosh
catalog (22 logical files, exact byte offsets), version.bin (v9), and
factory.json. SmooshReader opens chunks lazily, so the catalog parse
must succeed without the data file present.
"""

from __future__ import annotations

import json
import os

import pytest

from druid_datafusion_bridge_spark.sources.druid_format import (
    DruidFormatError,
    SmooshReader,
    read_version,
)

FIXTURE = "/root/reference/tests/fixtures/wikipedia-segment"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE), reason="reference fixture not present"
)

# The 22 logical files the reference asserts (wikipedia_segment_test.rs:16)
EXPECTED_FILES = sorted(
    [
        "__time", "added", "channel", "cityName", "comment",
        "countryIsoCode", "countryName", "deleted", "delta", "index.drd",
        "isAnonymous", "isMinor", "isNew", "isRobot", "isUnpatrolled",
        "metadata.drd", "metroCode", "namespace", "page", "regionIsoCode",
        "regionName", "user",
    ]
)


def test_meta_smoosh_catalog_matches_reference():
    r = SmooshReader(FIXTURE)
    assert r.file_names() == EXPECTED_FILES
    assert r.num_chunks == 1
    # spot-check exact offsets Druid wrote (chunk, start, end)
    assert r.entries["__time"] == (0, 0, 193299)
    assert r.entries["index.drd"] == (0, 5472184, 5473182)
    assert r.entries["metadata.drd"] == (0, 5473182, 5474269)
    assert r.entries["added"] == (0, 5310184, 5374735)
    for name in ("__time", "channel", "index.drd", "metadata.drd"):
        assert r.has_file(name)


def test_meta_smoosh_intervals_tile_the_chunk():
    """Druid smooshes logical files back-to-back: sorted by offset the
    entries must tile [0, 5474269] with no gap or overlap."""
    r = SmooshReader(FIXTURE)
    spans = sorted(v[1:] for v in r.entries.values())
    assert spans[0][0] == 0
    for (_, prev_end), (start, _) in zip(spans, spans[1:]):
        assert start == prev_end
    assert spans[-1][1] == 5474269


def test_catalog_parse_needs_no_data_chunk():
    """The metadata pass must not touch 00000.smoosh (absent here) —
    and asking for bytes must fail cleanly, not garbage-read."""
    r = SmooshReader(FIXTURE)  # must not raise
    with pytest.raises((FileNotFoundError, DruidFormatError)):
        r.map_file("__time")
    with pytest.raises(DruidFormatError):
        r.map_file("not_a_column")


def test_version_bin_is_v9():
    with open(os.path.join(FIXTURE, "version.bin"), "rb") as f:
        assert read_version(f.read()) == 9


def test_factory_json():
    with open(os.path.join(FIXTURE, "factory.json"), encoding="utf-8") as f:
        assert json.load(f) == {"type": "mMapSegmentFactory"}
