"""Pin the driver-sample rotation: the grading driver runs the FIRST 50
registry entries in registration order. Since r6 the rotation is
ENTRY-level (queries/__init__.py ROTATION). r7's rotation front-loads
the 24 r6 late additions that have never produced a driver correctness
row; round-7's own new queries are appended to ROTATION in the same
commit that registers them, up to the 50-slot window capacity. An
accidental reorder would silently burn the round's correctness slots on
already-green queries — this test makes that a loud failure.

UPDATE DELIBERATELY each rotation, together with ROTATION itself."""

from __future__ import annotations

from druid_datafusion_bridge_spark.queries import ROTATION, all_queries


def test_driver_sample_window_matches_rotation_plan():
    names = list(all_queries())
    # 24 backlog entries fixed at round start; r7 additions append.
    assert 24 <= len(ROTATION) <= 50
    # the window prefix IS the plan, in plan order
    assert names[: len(ROTATION)] == list(ROTATION)
    # spot-pin the backlog heads (the r6 late additions)
    assert names[0] == "nq_timeseries_hourly"
    for must in (
        "nq_join_datasource",
        "s1k_druid_segment_prefix_filter",
        "s1q_druid_segment_recent_limit",
        "dm_segment_stats_plane",
        "dm_search_query",
        "prof_column_stats_approx",
        "lk_lookup_enrich",
        "lk_reverse_lookup_filter",
        "fd_mv_sql_text",
        "fd_lookup_sql_text",
    ):
        assert must in names[:24], must


def test_rotation_wastes_no_window_slot():
    """No window slot may re-sample a query that already has a driver
    correctness row (CORRECTNESS_r*.json) unless listed as a deliberate
    re-sample — re-sampling green queries burns the round's evidence.
    (Queries added AFTER the rotation was fixed may sit outside the
    window; they rotate in next round.)"""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json")))
    if not files:  # fresh checkout without driver artifacts
        return
    sampled: set[str] = set()
    for f in files:
        with open(f, encoding="utf-8") as fh:
            sampled |= set(json.load(fh))
    deliberate_resamples: set[str] = set()  # none this round
    names = list(all_queries())
    wasted = [
        n for n in names[: len(ROTATION)]
        if n in sampled and n not in deliberate_resamples
    ]
    assert not wasted, wasted
