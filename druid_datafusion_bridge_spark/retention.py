"""Druid coordinator retention rules (public docs:
operations/rule-configuration.md, api-reference.md#retention-rules).

Real Druid's coordinator walks every used segment through an ordered
rule chain — the datasource's own rules first, then the cluster
default chain (``_default``) — and the FIRST rule whose predicate
matches the segment's interval decides: a load* rule keeps the segment
served, a drop* rule removes it from historicals (the segment stays
published in deep storage; ``kill`` is the separate permanent delete).
A segment matching no rule at all is not served — Druid's coordinator
leaves it unassigned and logs a warning, which is why the shipped
cluster default is ``[{"type": "loadForever"}]``.

This engine is single-tier, so ``tieredReplicants`` is accepted and
ignored (documented divergence); "served" means the segment
participates in scans and reports ``is_available = 1`` in
``sys.segments``.

Matching predicates, per rule type (the containment-vs-overlap split
mirrors Druid's rule classes):

- ``loadForever`` / ``dropForever`` — match every segment.
- ``loadByInterval`` — match when the rule's ``interval`` OVERLAPS
  the segment interval (Druid's IntervalLoadRule delegates to
  Rules.eligibleForLoad, an overlap test — a segment straddling the
  rule boundary is still loaded whole).
- ``dropByInterval`` — match when the rule's ``interval`` CONTAINS
  the segment interval (Druid's IntervalDropRule containment rule —
  a partially overlapping segment is NOT dropped and falls through
  to later rules). The load-overlap/drop-containment asymmetry
  mirrors the loadByPeriod/dropByPeriod asymmetry below.
- ``loadByPeriod`` — the window ``[now - period, includeFuture ? inf
  : now)`` (includeFuture defaults true) matches on OVERLAP with the
  segment interval: a segment straddling the window edge is kept
  whole.
- ``dropByPeriod`` — the same window matches on CONTAINMENT of the
  segment interval (a straddling segment is NOT dropped — it falls
  through).
- ``dropBeforeByPeriod`` — matches segments that END at or before
  ``now - period`` (the retention idiom "drop everything older than
  P").

Calendar periods (months/years) are anchored at ``now`` with real
calendar arithmetic (Jan 31 minus P1M clamps to the shorter month's
last day), matching Joda/Druid period subtraction.
"""

from __future__ import annotations

import calendar
import datetime as _dt

from .functions.druid_sql import parse_period

LOAD_TYPES = frozenset({"loadForever", "loadByInterval", "loadByPeriod"})
DROP_TYPES = frozenset(
    {"dropForever", "dropByInterval", "dropByPeriod", "dropBeforeByPeriod"}
)

#: Druid's shipped cluster-default chain.
DEFAULT_RULES: tuple[dict, ...] = ({"type": "loadForever"},)


def _iso_ms(s: str) -> int:
    d = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return int(d.timestamp() * 1000)


def interval_ms(interval: str) -> tuple[int, int]:
    """``"start/end"`` ISO-8601 interval -> ``(start_ms, end_ms)``."""
    lo_s, _, hi_s = interval.partition("/")
    if not hi_s:
        raise ValueError(f"interval must be 'start/end': {interval!r}")
    lo, hi = _iso_ms(lo_s), _iso_ms(hi_s)
    if hi < lo:
        raise ValueError(f"interval end precedes start: {interval!r}")
    return lo, hi


def period_ago(period: str, now_ms: int) -> int:
    """``now - period`` in epoch millis, calendar-aware for month/year
    periods (day-of-month clamps to the target month's length)."""
    months, millis = parse_period(period)
    if millis:
        return now_ms - millis
    d = _dt.datetime.fromtimestamp(now_ms / 1000, tz=_dt.timezone.utc)
    total = d.year * 12 + (d.month - 1) - months
    y, m = divmod(total, 12)
    m += 1
    day = min(d.day, calendar.monthrange(y, m)[1])
    return int(d.replace(year=y, month=m, day=day).timestamp() * 1000)


def rule_matches(rule: dict, start_ms: int, end_ms: int, now_ms: int) -> bool:
    """Does this rule apply to a segment spanning ``[start, end)``?"""
    rt = rule.get("type")
    if rt in ("loadForever", "dropForever"):
        return True
    if rt == "loadByInterval":
        # overlap (Rules.eligibleForLoad): straddling segments load
        lo, hi = interval_ms(rule["interval"])
        return end_ms > lo and start_ms < hi
    if rt == "dropByInterval":
        # containment (IntervalDropRule): straddling segments fall
        # through rather than being dropped
        lo, hi = interval_ms(rule["interval"])
        return lo <= start_ms and end_ms <= hi
    if rt == "loadByPeriod":
        lo = period_ago(rule["period"], now_ms)
        hi = None if rule.get("includeFuture", True) else now_ms
        # overlap of [lo, hi) with [start, end)
        return end_ms > lo and (hi is None or start_ms < hi)
    if rt == "dropByPeriod":
        lo = period_ago(rule["period"], now_ms)
        hi = None if rule.get("includeFuture", True) else now_ms
        return start_ms >= lo and (hi is None or end_ms <= hi)
    if rt == "dropBeforeByPeriod":
        return end_ms <= period_ago(rule["period"], now_ms)
    raise ValueError(f"unknown retention rule type {rt!r}")


def validate_rules(rules: list[dict]) -> None:
    """Reject malformed chains up front (the broker 400s): every rule
    needs a known type and its type's required field, and interval
    strings must parse."""
    if not isinstance(rules, list):
        raise ValueError("rules must be a JSON array")
    for r in rules:
        if not isinstance(r, dict):
            raise ValueError(f"rule must be an object: {r!r}")
        rt = r.get("type")
        if rt not in LOAD_TYPES and rt not in DROP_TYPES:
            raise ValueError(f"unknown retention rule type {rt!r}")
        if rt in ("loadByInterval", "dropByInterval"):
            if "interval" not in r:
                raise ValueError(f"{rt} rule requires 'interval'")
            interval_ms(r["interval"])
        if rt in ("loadByPeriod", "dropByPeriod", "dropBeforeByPeriod"):
            if "period" not in r:
                raise ValueError(f"{rt} rule requires 'period'")
            parse_period(r["period"])


def segment_used(
    rules: list[dict],
    default_rules: list[dict],
    start_ms: int,
    end_ms: int,
    now_ms: int,
) -> bool:
    """First matching rule across (datasource chain, then default
    chain) decides; no match anywhere -> not served."""
    for chain in (rules, default_rules):
        for r in chain:
            if rule_matches(r, start_ms, end_ms, now_ms):
                return r["type"] in LOAD_TYPES
    return False


def unused_segments(
    rules: list[dict],
    default_rules: list[dict],
    seg_metas: dict[str, dict],
    now_ms: int,
) -> set[str]:
    """Apply a chain to a root's planning metadata (``load_plan_meta``
    output: seg_dir -> {"start": ms, "end": ms, ...}) and return the
    segment-dir basenames the rules DROP. Pure metadata plane — at
    100k segments this is one in-memory pass, no segment opens."""
    import os

    return {
        os.path.basename(seg_dir)
        for seg_dir, m in seg_metas.items()
        if not segment_used(rules, default_rules, m["start"], m["end"], now_ms)
    }
