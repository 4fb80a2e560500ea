"""Pin the driver-sample rotation: the grading driver runs the FIRST 50
registry entries in registration order. Since r6 the rotation is
ENTRY-level (queries/__init__.py ROTATION): slots 1-44 are exactly the
44 entries that had never produced a driver correctness row after r5,
slots 45-50 the round's new queries + deliberate re-samples. An
accidental reorder would silently burn the round's 50 correctness slots
on already-green queries — this test makes that a loud failure.

UPDATE DELIBERATELY each rotation, together with ROTATION itself."""

from __future__ import annotations

from druid_datafusion_bridge_spark.queries import ROTATION, all_queries


def test_driver_sample_window_matches_rotation_plan():
    names = list(all_queries())
    assert len(ROTATION) == 50
    # the window IS the plan, in plan order
    assert names[:50] == list(ROTATION)
    # spot-pin the high-priority heads and the round's additions
    assert names[0] == "st_segment_handoff_query"
    for must in (
        "cx_theta_set_ops",
        "cx_count_min_heavy",
        "cx_qhist_rollup_merge",
        "s1h_druid_segment_metric_prune",
        "s5b_smoosh_multichunk_scan",
        "s1i_druid_segment_dim_bound_filter",
        "sim_range_search",
        "sim_knn_graph",
        "dd_ngram_jaccard",
    ):
        assert must in names[:50], must


def test_rotation_covers_the_entire_never_sampled_backlog():
    """The 44 backlog entries (from CORRECTNESS_r01..r05.json) must all
    sit inside the sampled window — after this round, every registry
    entry has produced a driver row."""
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
    names = list(all_queries())
    backlog = [n for n in names if n not in sampled]
    out_of_window = [n for n in backlog if n not in names[:50]]
    assert not out_of_window, out_of_window
