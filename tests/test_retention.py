"""Coordinator retention rules (retention.py + broker endpoints):
rule-chain semantics (rule-configuration.md — first match wins,
containment vs overlap per rule class, calendar periods), and the
serving side: drop rules exclude segments from every query path, flip
sys.segments.is_available, invalidate the result cache, and reverse
cleanly — all without deleting anything (kill stays the only delete)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from druid_datafusion_bridge_spark.retention import (
    DEFAULT_RULES,
    interval_ms,
    period_ago,
    rule_matches,
    segment_used,
    unused_segments,
    validate_rules,
)

# 2024-02-01T00:00:00Z
NOW = 1706745600000
DAY = 86_400_000
JAN = {d: interval_ms(f"2024-01-{d:02d}T00:00:00Z/"
                      f"2024-01-{d + 1:02d}T00:00:00Z")
       for d in range(1, 30)}


def test_drop_interval_rule_matches_on_containment():
    rule = {"type": "dropByInterval",
            "interval": "2024-01-10T00:00:00Z/2024-01-15T00:00:00Z"}
    s, e = JAN[10]
    assert rule_matches(rule, s, e, NOW)
    # straddling the boundary -> NOT contained -> falls through
    assert not rule_matches(rule, s - 1, e, NOW)
    assert not rule_matches(rule, *JAN[15], NOW)


def test_load_interval_rule_matches_on_overlap():
    """IntervalLoadRule delegates to Rules.eligibleForLoad = OVERLAP:
    a segment straddling the rule boundary is still served whole
    (only the drop rule uses containment)."""
    rule = {"type": "loadByInterval",
            "interval": "2024-01-10T00:00:00Z/2024-01-15T00:00:00Z"}
    assert rule_matches(rule, *JAN[10], NOW)
    # straddling either boundary still LOADS
    s, e = JAN[10]
    assert rule_matches(rule, s - 1, e, NOW)
    assert rule_matches(rule, JAN[14][0], JAN[15][1], NOW)
    # fully outside (touching end-exclusive boundary) does not
    assert not rule_matches(rule, *JAN[15], NOW)
    assert not rule_matches(rule, *JAN[8], NOW)


def test_period_load_matches_on_overlap():
    rule = {"type": "loadByPeriod", "period": "P7D"}
    # window [Jan 25, inf): Jan 24 misses, Jan 25 hits, and a segment
    # straddling the edge is kept WHOLE
    assert not rule_matches(rule, *JAN[24], NOW)
    assert rule_matches(rule, *JAN[25], NOW)
    assert rule_matches(rule, JAN[24][0], JAN[25][1], NOW)
    # includeFuture=False caps the window at now
    capped = {"type": "loadByPeriod", "period": "P7D",
              "includeFuture": False}
    assert rule_matches(capped, *JAN[28], NOW)
    assert not rule_matches(capped, NOW, NOW + DAY, NOW)


def test_period_drop_matches_on_containment():
    rule = {"type": "dropByPeriod", "period": "P7D"}
    assert rule_matches(rule, *JAN[26], NOW)
    # straddles the window edge -> not contained -> survives
    assert not rule_matches(rule, JAN[24][0], JAN[25][1], NOW)


def test_drop_before_by_period():
    rule = {"type": "dropBeforeByPeriod", "period": "P7D"}
    assert rule_matches(rule, *JAN[20], NOW)          # old -> dropped
    assert not rule_matches(rule, *JAN[26], NOW)      # recent -> kept
    assert not rule_matches(rule, JAN[24][0], JAN[25][1], NOW)


def test_calendar_period_clamps_month_end():
    # Mar 31 minus P1M clamps to Feb 29 (2024 is a leap year) — Joda
    # calendar arithmetic, not 30-day approximation
    mar31 = interval_ms("2024-03-31T00:00:00Z/2024-04-01T00:00:00Z")[0]
    assert period_ago("P1M", mar31) == interval_ms(
        "2024-02-29T00:00:00Z/2024-03-01T00:00:00Z")[0]
    assert period_ago("P1Y", mar31) == interval_ms(
        "2023-03-31T00:00:00Z/2023-04-01T00:00:00Z")[0]


def test_first_match_wins_and_default_chain():
    drop10 = {"type": "dropByInterval",
              "interval": "2024-01-10T00:00:00Z/2024-01-11T00:00:00Z"}
    # ds chain decides before the default chain sees the segment
    assert not segment_used([drop10], list(DEFAULT_RULES), *JAN[10], NOW)
    assert segment_used([drop10], list(DEFAULT_RULES), *JAN[11], NOW)
    # no rule matches anywhere -> not served
    assert not segment_used([drop10], [], *JAN[11], NOW)


def test_unused_segments_maps_basenames():
    metas = {
        f"/x/seg_{d:02d}": {"start": JAN[d][0], "end": JAN[d][1]}
        for d in (9, 10, 14, 15)
    }
    rules = [
        {"type": "dropByInterval",
         "interval": "2024-01-10T00:00:00Z/2024-01-15T00:00:00Z"},
        {"type": "loadForever"},
    ]
    assert unused_segments(rules, [], metas, NOW) == {"seg_10", "seg_14"}


def test_validate_rules_rejects_malformed():
    with pytest.raises(ValueError):
        validate_rules([{"type": "loadByWhim"}])
    with pytest.raises(ValueError):
        validate_rules([{"type": "loadByInterval"}])  # missing interval
    with pytest.raises(ValueError):
        validate_rules([{"type": "dropByPeriod"}])  # missing period
    with pytest.raises(ValueError):
        validate_rules({"type": "loadForever"})  # not a list
    validate_rules([
        {"type": "loadByPeriod", "period": "P1M"},
        {"type": "dropForever"},
    ])


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def _sql(base, q):
    return _post(base + "/druid/v2/sql", {"query": q})


@pytest.fixture()
def retention_shim(spark, tmp_path):
    from druid_datafusion_bridge_spark.broker import DruidBrokerShim

    s = DruidBrokerShim(spark, {}, deep_storage=str(tmp_path / "deep"))
    port = s.start()
    base = f"http://127.0.0.1:{port}"
    _post(base + "/druid/v2/sql/task", {
        "query": "INSERT INTO ret SELECT * FROM VALUES "
                 "(TIMESTAMP '2024-01-01 01:00:00', 1), "
                 "(TIMESTAMP '2024-01-02 01:00:00', 2), "
                 "(TIMESTAMP '2024-01-03 01:00:00', 3) "
                 "AS t(__time, v) PARTITIONED BY DAY"})
    yield s, base
    s.stop()


def test_rules_api_drop_serve_and_reverse(retention_shim):
    """POST a drop rule -> the day's rows vanish from SQL and its
    segment reports is_available=0 (still published: retention is not
    kill); clearing the rules restores both. The result cache must not
    serve the pre-rule answer after the flip (retention epoch keys)."""
    s, base = retention_shim
    q = "SELECT SUM(v) AS s FROM ret"
    assert _sql(base, q) == [{"s": 6}]
    _post(base + "/druid/coordinator/v1/rules/ret", [
        {"type": "dropByInterval",
         "interval": "2024-01-02T00:00:00Z/2024-01-03T00:00:00Z"},
        {"type": "loadForever"},
    ])
    # same SQL text, same segment digests — only the rules moved
    assert _sql(base, q) == [{"s": 4}]
    avail = _sql(base, "SELECT \"start\", is_available, is_published "
                       "FROM sys.segments ORDER BY \"start\"")
    assert [r["is_available"] for r in avail] == [1, 0, 1]
    assert [r["is_published"] for r in avail] == [1, 1, 1]
    rules = _get(base + "/druid/coordinator/v1/rules")
    assert rules["ret"][0]["type"] == "dropByInterval"
    assert rules["_default"] == [{"type": "loadForever"}]
    full = _get(base + "/druid/coordinator/v1/rules/ret?full")
    assert full[-1] == {"type": "loadForever"}
    # clearing the chain restores service — nothing was deleted
    _post(base + "/druid/coordinator/v1/rules/ret", [])
    assert _sql(base, q) == [{"s": 6}]


def test_default_chain_applies_to_every_datasource(retention_shim):
    """POST to rules/_default governs datasources with no own chain:
    loadByPeriod anchored at wall-clock drops the 2024 fixture days
    (they are far older than P30D); restoring loadForever reverses."""
    s, base = retention_shim
    _post(base + "/druid/coordinator/v1/rules/_default",
          [{"type": "loadByPeriod", "period": "P30D"}])
    try:
        assert _sql(base, "SELECT COUNT(*) AS n FROM ret") == [{"n": 0}]
    finally:
        _post(base + "/druid/coordinator/v1/rules/_default",
              [{"type": "loadForever"}])
    assert _sql(base, "SELECT COUNT(*) AS n FROM ret") == [{"n": 3}]


def test_mark_unused_and_used(retention_shim):
    """Manual lifecycle: markUnused by interval excludes the matched
    segments (containment rule, like kill — but reversible); markUsed
    restores them. Native queries see the same serving state as SQL."""
    s, base = retention_shim
    out = _post(
        base + "/druid/coordinator/v1/datasources/ret/markUnused",
        {"interval": "2024-01-01T00:00:00Z/2024-01-03T00:00:00Z"})
    assert out == {"numChangedSegments": 2}
    assert _sql(base, "SELECT SUM(v) AS s FROM ret") == [{"s": 3}]
    ts = _post(base + "/druid/v2", {
        "queryType": "timeseries", "dataSource": "ret",
        "granularity": "all",
        "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
        "aggregations": [
            {"type": "longSum", "name": "total", "fieldName": "v"}],
    })
    assert ts[0]["result"]["total"] == 3
    out = _post(
        base + "/druid/coordinator/v1/datasources/ret/markUsed",
        {"interval": "2024-01-01T00:00:00Z/2024-01-03T00:00:00Z"})
    assert out == {"numChangedSegments": 2}
    assert _sql(base, "SELECT SUM(v) AS s FROM ret") == [{"s": 6}]


def test_bad_rules_rejected_with_400(retention_shim):
    s, base = retention_shim
    req = urllib.request.Request(
        base + "/druid/coordinator/v1/rules/ret",
        data=json.dumps([{"type": "loadByWhim"}]).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400


def test_retention_duty_reapplies_period_rules(retention_shim):
    """Period rules anchor at wall-clock, so what they drop MOVES as
    time passes; the coordinator duty re-evaluates each cycle. Install
    a period chain directly (simulating a chain applied long ago whose
    effect has since drifted): the duty pass must detect the changed
    unused set, re-register, and bump the cache epoch so no stale
    cached result survives."""
    s, base = retention_shim
    assert _sql(base, "SELECT COUNT(*) AS n FROM ret") == [{"n": 3}]
    with s._lock:
        # installed WITHOUT _set_rules: the serving state still thinks
        # nothing is dropped — exactly the drift the duty reconciles
        s._rules = {**s._rules,
                    "ret": [{"type": "dropBeforeByPeriod",
                             "period": "P30D"},
                            {"type": "loadForever"}]}
    epoch_before = s._retention_epoch
    changed = s.run_retention_duty()
    assert changed == {"ret": 3}  # 2024 fixture days are long past
    assert s._retention_epoch > epoch_before
    assert _sql(base, "SELECT COUNT(*) AS n FROM ret") == [{"n": 0}]
    # a second pass is a no-op: nothing moved
    assert s.run_retention_duty() == {}
    # interval/forever-only datasources are never re-evaluated
    with s._lock:
        s._rules = {}
    s.run_retention_duty()  # period_default=false, ret has no rules
    # (state unchanged until rules are POSTed properly)
    _post(base + "/druid/coordinator/v1/rules/ret", [])
    assert _sql(base, "SELECT COUNT(*) AS n FROM ret") == [{"n": 3}]


def test_query_candidates_endpoint(retention_shim):
    """GET /druid/v2/candidates: per-segment interval/size/locations
    for the segments a query over the intervals would touch; interval
    filtering prunes, and a retention-unused segment is no candidate."""
    s, base = retention_shim
    cands = _get(base + "/druid/v2/candidates?datasource=ret")
    assert len(cands) == 3
    assert all(c["locations"][0]["type"] == "historical" for c in cands)
    assert all(c["size"] > 0 for c in cands)
    two = _get(
        base + "/druid/v2/candidates?datasource=ret&intervals="
        "2024-01-01T00:00:00Z/2024-01-03T00:00:00Z")
    assert len(two) == 2
    _post(base + "/druid/coordinator/v1/datasources/ret/markUnused",
          {"interval": "2024-01-01T00:00:00Z/2024-01-02T00:00:00Z"})
    try:
        assert len(_get(
            base + "/druid/v2/candidates?datasource=ret")) == 2
    finally:
        _post(base + "/druid/coordinator/v1/datasources/ret/markUsed",
              {"interval": "2024-01-01T00:00:00Z/2024-01-02T00:00:00Z"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base + "/druid/v2/candidates?datasource=nope")
    assert ei.value.code == 404


def test_query_candidates_plain_dataframe_and_bad_interval(spark):
    """Review regressions: a datasource registered as a plain
    DataFrame (queryable, but no segment root) answers an EMPTY
    candidate list, not 404; a malformed interval is the only 400."""
    from druid_datafusion_bridge_spark.broker import DruidBrokerShim

    df = spark.createDataFrame([(1,)], "v long")
    s = DruidBrokerShim(spark, {"plain": df})
    port = s.start()
    base = f"http://127.0.0.1:{port}"
    try:
        assert _get(
            base + "/druid/v2/candidates?datasource=plain") == []
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base + "/druid/v2/candidates?datasource=plain"
                        "&intervals=not-an-interval")
        assert ei.value.code == 400
    finally:
        s.stop()


# -- property-based differential: the rules engine vs a transparent
# reference evaluator over generated chains and segment intervals ------
from hypothesis import given, settings
from hypothesis import strategies as st

_seg_st = st.tuples(
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=1, max_value=10),
).map(lambda t: (JAN[1][0] + t[0] * DAY, JAN[1][0] + (t[0] + t[1]) * DAY))

_interval_st = st.tuples(
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=1, max_value=10),
).map(lambda t: (JAN[1][0] + t[0] * DAY, JAN[1][0] + (t[0] + t[1]) * DAY))


def _iso(ms: int) -> str:
    import datetime

    return datetime.datetime.fromtimestamp(
        ms / 1000, datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")


_rule_st = st.one_of(
    st.sampled_from([{"type": "loadForever"}, {"type": "dropForever"}]),
    _interval_st.flatmap(lambda iv: st.sampled_from([
        {"type": "loadByInterval",
         "interval": f"{_iso(iv[0])}/{_iso(iv[1])}"},
        {"type": "dropByInterval",
         "interval": f"{_iso(iv[0])}/{_iso(iv[1])}"},
    ])),
    st.tuples(
        st.integers(min_value=1, max_value=60), st.booleans()
    ).map(lambda t: {"type": "loadByPeriod", "period": f"P{t[0]}D",
                     "includeFuture": t[1]}),
    st.integers(min_value=1, max_value=60).map(
        lambda d: {"type": "dropByPeriod", "period": f"P{d}D"}),
    st.integers(min_value=1, max_value=60).map(
        lambda d: {"type": "dropBeforeByPeriod", "period": f"P{d}D"}),
)


def _ref_matches(rule: dict, s: int, e: int, now: int) -> bool:
    """Independent, transparently-literal re-statement of the documented
    matching semantics (rule-configuration.md), used as the reference."""
    t = rule["type"]
    if t.endswith("Forever"):
        return True
    if t == "loadByInterval":
        # Rules.eligibleForLoad = overlap (straddling segments load)
        a, b = rule["interval"].split("/")
        lo, hi = interval_ms(f"{a}/{b}")
        return e > lo and s < hi
    if t == "dropByInterval":
        # IntervalDropRule = containment (straddlers fall through)
        a, b = rule["interval"].split("/")
        lo, hi = interval_ms(f"{a}/{b}")
        return lo <= s and e <= hi
    days = int(rule["period"][1:-1])
    lo = now - days * DAY
    if t == "loadByPeriod":
        hi = None if rule.get("includeFuture", True) else now
        return e > lo and (hi is None or s < hi)
    if t == "dropByPeriod":
        hi = None if rule.get("includeFuture", True) else now
        return s >= lo and (hi is None or e <= hi)
    return e <= lo  # dropBeforeByPeriod


@settings(max_examples=150, deadline=None)
@given(
    chain=st.lists(_rule_st, max_size=5),
    default=st.lists(_rule_st, max_size=2),
    seg=_seg_st,
)
def test_rules_engine_matches_reference(chain, default, seg):
    s, e = seg
    expect = None
    for r in list(chain) + list(default):
        if _ref_matches(r, s, e, NOW):
            expect = r["type"].startswith("load")
            break
    got = segment_used(chain, default, s, e, NOW)
    assert got == (expect if expect is not None else False)


def test_rules_history_audit_log(retention_shim):
    """GET /druid/coordinator/v1/rules/history[/{ds}] returns the audit
    entries rule POSTs append (key, payload JSON, auditTime) — Druid's
    rule audit surface."""
    s, base = retention_shim
    _post(base + "/druid/coordinator/v1/rules/ret",
          [{"type": "loadForever"}])
    _post(base + "/druid/coordinator/v1/rules/_default",
          [{"type": "loadForever"}])
    hist = _get(base + "/druid/coordinator/v1/rules/history")
    assert [h["key"] for h in hist] == ["ret", "_default"]
    assert json.loads(hist[0]["payload"]) == [{"type": "loadForever"}]
    assert hist[0]["auditTime"]
    only = _get(base + "/druid/coordinator/v1/rules/ret/history")
    assert [h["key"] for h in only] == ["ret"]


def test_get_default_rules_endpoint(retention_shim):
    """GET /druid/coordinator/v1/rules/_default returns the cluster
    default chain itself (not an empty per-datasource chain)."""
    s, base = retention_shim
    assert _get(base + "/druid/coordinator/v1/rules/_default") == [
        {"type": "loadForever"}]


def test_retention_survives_compaction_rewrite(retention_shim):
    """Auto-compaction rewrites a root's segments (new dir names); rule
    chains must re-apply to the REWRITTEN segments at re-registration —
    the dropped day stays dropped across the swap. Manual markUnused is
    different by design: it names segment ids, and compaction's new
    segments are new (real Druid's marks don't transfer either)."""
    s, base = retention_shim
    # fragment the datasource: a second INSERT adds same-day segments
    _post(base + "/druid/v2/sql/task", {
        "query": "INSERT INTO ret SELECT * FROM VALUES "
                 "(TIMESTAMP '2024-01-01 02:00:00', 10), "
                 "(TIMESTAMP '2024-01-02 02:00:00', 20) "
                 "AS t(__time, v) PARTITIONED BY DAY"})
    _post(base + "/druid/coordinator/v1/rules/ret", [
        {"type": "dropByInterval",
         "interval": "2024-01-02T00:00:00Z/2024-01-03T00:00:00Z"},
        {"type": "loadForever"},
    ])
    assert _sql(base, "SELECT SUM(v) AS s FROM ret") == [{"s": 14}]
    _post(base + "/druid/coordinator/v1/config/compaction",
          {"dataSource": "ret", "segmentGranularity": "day"})
    compacted = s.run_auto_compaction()
    assert compacted.get("ret", 0) >= 1  # 5 segments -> 3 day buckets
    # the rewritten Jan-2 segment is still rule-dropped
    assert _sql(base, "SELECT SUM(v) AS s FROM ret") == [{"s": 14}]
    _post(base + "/druid/coordinator/v1/rules/ret", [])
    assert _sql(base, "SELECT SUM(v) AS s FROM ret") == [{"s": 36}]


def test_rules_persist_across_broker_restart(spark, tmp_path):
    """Real Druid keeps rules in its metadata store; a restarted
    coordinator still enforces them. This broker persists rule chains,
    manual marks, and the audit history under deep storage and reloads
    them at construction — the first query of the new broker already
    serves the drop."""
    from druid_datafusion_bridge_spark.broker import DruidBrokerShim

    deep = str(tmp_path / "deep")
    s1 = DruidBrokerShim(spark, {}, deep_storage=deep)
    port = s1.start()
    base = f"http://127.0.0.1:{port}"
    try:
        _post(base + "/druid/v2/sql/task", {
            "query": "INSERT INTO persist SELECT * FROM VALUES "
                     "(TIMESTAMP '2024-01-01 01:00:00', 1), "
                     "(TIMESTAMP '2024-01-02 01:00:00', 2) "
                     "AS t(__time, v) PARTITIONED BY DAY"})
        _post(base + "/druid/coordinator/v1/rules/persist", [
            {"type": "dropByInterval",
             "interval": "2024-01-02T00:00:00Z/2024-01-03T00:00:00Z"},
            {"type": "loadForever"},
        ])
        assert _sql(base, "SELECT SUM(v) AS s FROM persist") == [{"s": 1}]
    finally:
        s1.stop()
    # a NEW broker over the same deep storage: rules reload and apply
    import os

    s2 = DruidBrokerShim(
        spark, {},
        segment_roots={"persist": os.path.join(deep, "persist")},
        deep_storage=deep,
    )
    port2 = s2.start()
    base2 = f"http://127.0.0.1:{port2}"
    try:
        assert _get(base2 + "/druid/coordinator/v1/rules")[
            "persist"][0]["type"] == "dropByInterval"
        assert _sql(base2, "SELECT SUM(v) AS s FROM persist") == [{"s": 1}]
        hist = _get(base2 + "/druid/coordinator/v1/rules/history")
        assert [h["key"] for h in hist] == ["persist"]
    finally:
        s2.stop()


def test_lookups_persist_across_broker_restart(spark, tmp_path):
    """Coordinator lookup configs live in real Druid's metadata store;
    a restarted broker must re-serve them. Persisted configs win over
    constructor-passed ones (they are the newer coordinator state)."""
    from druid_datafusion_bridge_spark.broker import DruidBrokerShim

    deep = str(tmp_path / "deep")
    s1 = DruidBrokerShim(spark, {}, deep_storage=deep,
                         lookups={"color": {"r": "red"}})
    port = s1.start()
    base = f"http://127.0.0.1:{port}"
    try:
        _post(base + "/druid/coordinator/v1/lookups/config/__default/"
                     "color", {"r": "rouge", "g": "vert"})
    finally:
        s1.stop()
    s2 = DruidBrokerShim(spark, {}, deep_storage=deep,
                         lookups={"color": {"r": "red"}})
    port2 = s2.start()
    base2 = f"http://127.0.0.1:{port2}"
    try:
        spec = _get(base2 + "/druid/coordinator/v1/lookups/config/"
                            "__default/color")
        assert spec["lookupExtractorFactory"]["map"] == {
            "r": "rouge", "g": "vert"}
        rows = _sql(base2, "SELECT LOOKUP('g', 'color') AS v")
        assert rows == [{"v": "vert"}]
    finally:
        s2.stop()
    # review regression: persisted state OVERLAYS per-name — a
    # constructor lookup absent from the persisted file must survive
    # the restart, not be silently dropped by a wholesale replace
    s3 = DruidBrokerShim(spark, {}, deep_storage=deep,
                         lookups={"color": {"r": "red"},
                                  "shape": {"c": "circle"}})
    port3 = s3.start()
    base3 = f"http://127.0.0.1:{port3}"
    try:
        assert _sql(base3, "SELECT LOOKUP('c', 'shape') AS v") == [
            {"v": "circle"}]            # new constructor lookup kept
        assert _sql(base3, "SELECT LOOKUP('r', 'color') AS v") == [
            {"v": "rouge"}]             # persisted still wins per-name
        # explicit DELETE must stay durable across a restart even when
        # the constructor re-passes the lookup (tombstone, not overlay)
        req = urllib.request.Request(
            base3 + "/druid/coordinator/v1/lookups/config/__default/"
                    "color", method="DELETE")
        with urllib.request.urlopen(req) as r:
            assert r.status == 202
    finally:
        s3.stop()
    s4 = DruidBrokerShim(spark, {}, deep_storage=deep,
                         lookups={"color": {"r": "red"}})
    port4 = s4.start()
    base4 = f"http://127.0.0.1:{port4}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _sql(base4, "SELECT LOOKUP('r', 'color') AS v")
        assert ei.value.code in (400, 500)
        # re-POSTing the name clears the tombstone
        _post(base4 + "/druid/coordinator/v1/lookups/config/__default/"
                      "color", {"r": "rot"})
        assert _sql(base4, "SELECT LOOKUP('r', 'color') AS v") == [
            {"v": "rot"}]
    finally:
        s4.stop()


def test_persisted_period_rules_restart_duty_thread(spark, tmp_path):
    """Review regression: a restarted broker that loads period rules
    must resume the duty cycle — otherwise wall-clock drift is never
    re-evaluated and the persistence claim is hollow."""
    from druid_datafusion_bridge_spark.broker import DruidBrokerShim

    deep = str(tmp_path / "deep")
    s1 = DruidBrokerShim(spark, {}, deep_storage=deep)
    port = s1.start()
    base = f"http://127.0.0.1:{port}"
    try:
        _post(base + "/druid/v2/sql/task", {
            "query": "INSERT INTO dp SELECT * FROM VALUES "
                     "(TIMESTAMP '2024-01-01 01:00:00', 1) "
                     "AS t(__time, v) PARTITIONED BY DAY"})
        _post(base + "/druid/coordinator/v1/rules/dp", [
            {"type": "loadByPeriod", "period": "P100Y"}])
        assert s1._compaction_thread is not None
    finally:
        s1.stop()
    import os

    s2 = DruidBrokerShim(
        spark, {}, segment_roots={"dp": os.path.join(deep, "dp")},
        deep_storage=deep)
    try:
        assert s2._compaction_thread is not None
        assert _post(
            f"http://127.0.0.1:{s2.start()}" + "/druid/v2/sql",
            {"query": "SELECT COUNT(*) AS n FROM dp"},
        ) == [{"n": 1}]
    finally:
        s2.stop()
