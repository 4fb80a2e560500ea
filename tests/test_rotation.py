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
    deliberate_resamples = {"dd_ngram_jaccard"}  # df-cut changed in r6
    names = list(all_queries())
    wasted = [
        n for n in names[:50]
        if n in sampled and n not in deliberate_resamples
    ]
    assert not wasted, wasted
