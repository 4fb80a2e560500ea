"""Pin the driver-sample rotation: the grading driver runs the FIRST 50
registry entries in registration order. Since r6 the rotation is
ENTRY-level (queries/__init__.py ROTATION). After r7 the never-sampled
backlog is ZERO — every registry entry has at least one driver
correctness row — so r8's rotation flips to a STALENESS policy: round
8's own new queries (never sampled) take priority slots, and the rest
of the window deliberately RE-SAMPLES the entries whose newest driver
rows are oldest (r1 first, then r3), refreshing the evidence that ages
a round further each cycle. An accidental reorder would silently burn
the round's slots on freshly-green queries — this test makes that a
loud failure.

UPDATE DELIBERATELY each rotation, together with ROTATION itself."""

from __future__ import annotations

from druid_datafusion_bridge_spark.queries import (
    NEW_IN_R8,
    ROTATION,
    STALE_RESAMPLES,
    all_queries,
)


def test_driver_sample_window_matches_rotation_plan():
    names = list(all_queries())
    assert len(ROTATION) == 50  # backlog is zero; fill every slot
    # the window prefix IS the plan, in plan order
    assert names[: len(ROTATION)] == list(ROTATION)
    # new r8 queries take priority slots, staleness re-samples follow
    assert list(ROTATION) == (list(NEW_IN_R8) + list(STALE_RESAMPLES))[:50]
    # spot-pin the staleness ordering: r1 evidence heads the re-samples
    assert STALE_RESAMPLES[:3] == (
        "j6_theta_nonequi",
        "j7_sort_merge",
        "j8_broadcast",
    )
    for must in ("s1b_druid_segment_scan", "a1_count", "dd_exact",
                 "j1_inner_equi", "fd_time_functions"):
        assert must in ROTATION, must


def test_rotation_wastes_no_window_slot():
    """No window slot may re-sample a query that already has a driver
    correctness row (CORRECTNESS_r*.json) unless listed as a deliberate
    re-sample — re-sampling green queries burns the round's evidence.
    r8 policy: STALE_RESAMPLES *is* the deliberate re-sample list — the
    backlog of never-sampled entries is zero, so the window's job is to
    refresh the OLDEST driver evidence (r1-r3 rows). Anything sampled
    in the window must be either brand-new (NEW_IN_R8) or a declared
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
    # r4 or older) — re-declaring fresh entries would defeat the policy
    not_stale = [
        n for n in STALE_RESAMPLES if latest.get(n, 0) > 4
    ]
    assert not not_stale, not_stale
