"""Pin the driver-sample rotation: the grading driver runs the FIRST 50
registry entries in registration order. Since r6 the rotation is
ENTRY-level (queries/__init__.py ROTATION). After r7 the never-sampled
backlog is ZERO — every registry entry has at least one driver
correctness row — so since r8 the rotation follows a STALENESS policy:
the round's own new queries (never sampled) take priority slots, and
the rest of the window deliberately RE-SAMPLES the entries whose newest
driver rows are oldest, refreshing the evidence that ages a round
further each cycle. r13 registers no new queries (optimization round),
so the window is pure re-samples: the 35 remaining r7-evidence entries
(the block squeezed out of the r12 window plus the never-refreshed r7
rows), then the first 15 r8-evidence entries, each block in registry
order. An accidental reorder would silently burn the round's slots on
freshly-green queries — this test makes that a loud failure.

UPDATE DELIBERATELY each rotation, together with ROTATION itself."""

from __future__ import annotations

from druid_datafusion_bridge_spark.queries import (
    NEW_IN_R13,
    ROTATION,
    STALE_RESAMPLES,
    all_queries,
)

CURRENT_ROUND = 13
# Entries whose newest driver row is from a round <= this are "stale"
# and eligible for a deliberate re-sample slot this round. At r13 start
# the oldest evidence is r7 (35 rows) then r8 (50 rows).
STALE_THRESHOLD = 8


def test_driver_sample_window_matches_rotation_plan():
    names = list(all_queries())
    assert len(ROTATION) == 50  # backlog is zero; fill every slot
    # the window prefix IS the plan, in plan order
    assert names[: len(ROTATION)] == list(ROTATION)
    # no new queries this round: the window is pure staleness re-samples
    assert NEW_IN_R13 == ()
    assert list(ROTATION) == (list(NEW_IN_R13) + list(STALE_RESAMPLES))[:50]
    # spot-pin the staleness ordering: the r7 block heads the re-samples
    assert STALE_RESAMPLES[:3] == (
        "txp_vocab_coverage",
        "txp_trigram_familiarity",
        "txp_token_budget",
    )
    # the r8 block starts right after the 35 r7 rows
    assert STALE_RESAMPLES[35] == "txp_quality_median_cut"
    # spot-pins drawn from the FRONT of the stale list so they stay in
    # the window even if a NEW_IN_R13 entry ever squeezes the tail
    for must in ("txp_vocab_coverage", "dd_lsh_verified_pairs",
                 "sim_pq_adc_topk", "nq_timeseries_zerofill",
                 "lr_retention_drop_interval", "dm_search_query"):
        assert must in ROTATION, must


def test_rotation_wastes_no_window_slot():
    """No window slot may re-sample a query that already has a driver
    correctness row (CORRECTNESS_r*.json) unless listed as a deliberate
    re-sample — re-sampling green queries burns the round's evidence.
    r13 policy: STALE_RESAMPLES *is* the deliberate re-sample list — the
    backlog of never-sampled entries is zero, so the window's job is to
    refresh the OLDEST driver evidence (r7–r8 rows). Anything sampled
    in the window must be either brand-new (NEW_IN_R13) or a declared
    stale re-sample. NEW_IN_R13 entries are exempt even after this
    round's own driver artifact lands (ADVICE r9: the current round's
    artifact must not retroactively mark its own new queries wasted)."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not files:  # fresh checkout without driver artifacts
        return
    latest: dict[str, int] = {}
    for f in files:
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        with open(f, encoding="utf-8") as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    deliberate = set(STALE_RESAMPLES) | set(NEW_IN_R13)
    names = list(all_queries())
    wasted = [
        n for n in names[: len(ROTATION)]
        if n in latest and n not in deliberate
    ]
    assert not wasted, wasted
    # and the declared re-samples must actually BE stale (driver row
    # r8 or older) — re-declaring fresh entries would defeat the policy.
    # Rows from rounds AFTER the current one (the driver's post-round
    # artifact for CURRENT_ROUND itself) are the designed tripwire
    # ordering the next flip: once CORRECTNESS_r13.json lands, the
    # refreshed re-samples go red here until r14 rewrites ROTATION.
    not_stale = [
        n for n in STALE_RESAMPLES if latest.get(n, 0) > STALE_THRESHOLD
    ]
    assert not not_stale, not_stale
