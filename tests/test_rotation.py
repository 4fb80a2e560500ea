"""Pin the driver-sample rotation: the grading driver runs the FIRST 50
registry entries in registration order. Since r6 the rotation is
ENTRY-level (queries/__init__.py ROTATION). After r7 the never-sampled
backlog is ZERO — every registry entry has at least one driver
correctness row — so since r8 the rotation follows a STALENESS policy:
the round's own new queries (never sampled) take priority slots, and
the rest of the window deliberately RE-SAMPLES the entries whose newest
driver rows are oldest, refreshing the evidence that ages a round
further each cycle. For r9 that is the r3 tail (a8_stats..a14_pivot)
then the r4 families. An accidental reorder would silently burn the
round's slots on freshly-green queries — this test makes that a loud
failure.

UPDATE DELIBERATELY each rotation, together with ROTATION itself."""

from __future__ import annotations

from druid_datafusion_bridge_spark.queries import (
    NEW_IN_R9,
    ROTATION,
    STALE_RESAMPLES,
    all_queries,
)


def test_driver_sample_window_matches_rotation_plan():
    names = list(all_queries())
    assert len(ROTATION) == 50  # backlog is zero; fill every slot
    # the window prefix IS the plan, in plan order
    assert names[: len(ROTATION)] == list(ROTATION)
    # new r9 queries take priority slots, staleness re-samples follow
    assert list(ROTATION) == (list(NEW_IN_R9) + list(STALE_RESAMPLES))[:50]
    # spot-pin the staleness ordering: the r3 tail heads the re-samples
    assert STALE_RESAMPLES[:3] == (
        "a8_stats",
        "a9_approx_count_distinct",
        "a10_approx_percentile",
    )
    # spot-pins drawn from the FRONT of the stale list so they stay in
    # the window even as NEW_IN_R9 grows and squeezes the tail
    for must in ("a14_pivot", "w1_ranking", "u1_union_all",
                 "f_string_functions", "p3_filter_predicates"):
        assert must in ROTATION, must


def test_rotation_wastes_no_window_slot():
    """No window slot may re-sample a query that already has a driver
    correctness row (CORRECTNESS_r*.json) unless listed as a deliberate
    re-sample — re-sampling green queries burns the round's evidence.
    r9 policy: STALE_RESAMPLES *is* the deliberate re-sample list — the
    backlog of never-sampled entries is zero, so the window's job is to
    refresh the OLDEST driver evidence (r3–r4 rows). Anything sampled
    in the window must be either brand-new (NEW_IN_R9) or a declared
    stale re-sample."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json")))
    if not files:  # fresh checkout without driver artifacts
        return
    latest: dict[str, int] = {}
    for f in files:
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        with open(f, encoding="utf-8") as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    deliberate_resamples = set(STALE_RESAMPLES)
    names = list(all_queries())
    wasted = [
        n for n in names[: len(ROTATION)]
        if n in latest and n not in deliberate_resamples
    ]
    assert not wasted, wasted
    # and the declared re-samples must actually BE stale (driver row
    # r4 or older) — re-declaring fresh entries would defeat the policy.
    # This clause goes red the moment the driver's post-round
    # CORRECTNESS_r09.json lands: that is the designed tripwire ordering
    # the r10 flip as round 10's first commit.
    not_stale = [
        n for n in STALE_RESAMPLES if latest.get(n, 0) > 4
    ]
    assert not not_stale, not_stale
