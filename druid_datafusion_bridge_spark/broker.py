"""A Druid-broker-compatible HTTP shim over the engine (stdlib only).

Druid clients talk to a broker over two endpoints (public Druid docs,
api-reference.md): ``POST /druid/v2`` with a native query JSON body and
``POST /druid/v2/sql`` with ``{"query": "..."}``. This module serves
both from a SparkSession, so existing client code — curl scripts,
dashboards, language SDKs pointed at a broker URL — runs against this
engine without modification:

- native bodies route through :func:`native_query` (the spec's
  ``dataSource`` resolves against the registered table map);
- SQL bodies run through ``spark.sql`` with the Druid dialect functions
  registered (TIME_FLOOR, LOOKUP, ...), over the same table names;
- native responses carry Druid's per-queryType result envelope
  (timeseries/groupBy ``{timestamp, result|event}`` entries, topN
  per-bucket result lists, scan event batches — see
  :func:`_native_envelope`); ``/druid/v2/sql`` serves every documented
  resultFormat — object (default), array, objectLines, arrayLines,
  csv — plus ``header`` and positional ``parameters``;
- errors return Druid's error envelope
  ``{"error", "errorMessage"}`` with HTTP 400/500, so client error
  handling keeps working; a result exceeding ``max_rows`` errors with
  Druid's Resource-limit shape instead of silently truncating;
- SQL can introspect ``sys.segments`` / ``sys.tasks`` /
  ``sys.datasources`` / ``sys.supervisors`` / ``sys.servers`` /
  ``sys.server_segments`` and
  ``INFORMATION_SCHEMA.TABLES/.COLUMNS`` (qualified names rewritten
  onto registered views); ``GET /druid/coordinator/v1/servers``
  (plain/``?simple``/``?full``) lists the segment-serving inventory;
- ``GET /status/health`` answers ``true`` (Druid's liveness probe);
  ``GET /druid/v2/datasources[/{name}]`` lists names / the
  dimensions-metrics split; ``GET /druid/v2/candidates`` lists the
  segments a query over given intervals would touch, with candidate
  server locations (segment-aware routing metadata);
- ``POST /druid/indexer/v1/task`` + ``GET
  /druid/indexer/v1/task/{id}/status`` run the overlord workflow:
  ingestion task in, segments to deep storage, datasource
  auto-registered for querying (a ``compact`` task registers its
  DESTINATION datasource — ``dstDataSource`` or
  ``<dataSource>_compacted``);
- ``kill`` tasks delete a datasource's segments wholly contained in an
  interval (an emptied datasource deregisters);
  ``GET /druid/coordinator/v1/datasources[/{ds}[/intervals]]`` serves
  the coordinator's segment metadata from the planning manifest;
- ``POST /druid/v2/sql/task`` runs Druid's SQL-based (MSQ) ingestion
  statements — ``INSERT INTO ds SELECT ... PARTITIONED BY <grain>
  [CLUSTERED BY cols]`` appends version-tagged segments, ``REPLACE
  INTO ds OVERWRITE ALL ...`` swaps the datasource, and
  ``TABLE(EXTERN(...))`` reads external files exactly as MSQ's
  external-input form — synchronously on Spark, recorded in sys.tasks;
- the coordinator lookup-config family
  (``/druid/coordinator/v1/lookups/config[...]``) lists, fetches,
  creates/updates (versioned envelope or bare map), and deletes map
  lookups — the SQL ``LOOKUP()`` dispatcher re-registers immediately;
- query laning (query-scheduler lanes): ``context.lane`` claims a slot
  in a bounded lane; a full lane rejects with HTTP 429 instead of
  queueing, protecting interactive traffic from batch floods;
- auto-compaction (automatic-compaction.md): per-datasource configs on
  ``/druid/coordinator/v1/config/compaction``; a coordinator-style duty
  cycle rewrites fragmented datasources (more segments than
  target-granularity buckets — streaming handoff's natural debris) at
  the target granularity and swaps them in;
- async SQL: ``POST /druid/v2/sql/statements`` runs a query
  asynchronously under a cancellable job group (the MSQ statements
  surface) — GET reports state/schema/result pages, ``/results``
  returns the rows, DELETE cancels;
- JDBC: ``POST /druid/v2/sql/avatica`` speaks the Avatica JSON RPC
  (openConnection / createStatement / prepareAndExecute / prepare +
  execute with TypedValue parameters / fetch paging / close), the
  protocol Druid's JDBC driver uses — see ``avatica.py``;
- retention rules (rule-configuration.md): per-datasource chains and
  the cluster ``_default`` chain on ``/druid/coordinator/v1/rules``
  decide which segments are SERVED (first match wins; drop* rules
  exclude segments from scans and flip ``sys.segments.is_available``
  to 0 without deleting them — ``kill`` remains the permanent
  delete); manual ``markUnused``/``markUsed`` (by interval or
  segmentIds) composes on top — rule semantics in ``retention.py``;
- a whole-query result cache (using-caching.md; context
  ``useCache``/``populateCache``) serves repeated queries over
  segment-root datasources without touching Spark — keys carry a
  digest of the root's segment state, so ingestion, compaction, and
  handoff invalidate implicitly; the same digest re-registers a root
  whose segments moved under it (externally published segments are
  visible on the next request, like a real broker's view sync).

Deliberately a THIN shim: one process, synchronous handlers (Spark
queries already parallelize internally; the ThreadingHTTPServer keeps
slow queries from blocking health probes). It is the integration
surface, not a resource manager — run it next to the driver the way
Druid runs a broker next to historicals.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .native_query import native_query

try:
    from pyspark.errors import AnalysisException

    _ANALYSIS_ERRORS: tuple = (AnalysisException,)
except ImportError:  # pragma: no cover - very old pyspark
    _ANALYSIS_ERRORS = ()

__all__ = ["DruidBrokerShim"]


import re

# Druid's EXPLAIN PLAN FOR <query> (sql.md) — not Spark syntax, so the
# prefix is intercepted and the wrapped query planned instead
_EXPLAIN_RE = re.compile(r"\s*EXPLAIN\s+PLAN\s+FOR\s+", re.I)


def _word_in_sql(name: str, sql: str) -> bool:
    """Best-effort table-reference detection for EXPLAIN's RESOURCES:
    a word match outside string literals. Aliases shadowing a table
    name can still false-positive — acceptable for an advisory field."""
    outside = _SQL_LITERAL_RE.sub(" ", sql)
    return re.search(rf"\b{re.escape(name)}\b", outside, re.I) is not None


def _druid_types(dt) -> tuple[str, str]:
    """Spark DataType -> (Druid column type, SQL type) for the
    typesHeader/sqlTypesHeader rows (sql-data-types.md)."""
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "LONG", "BIGINT"
    if s == "boolean":
        return "LONG", "BOOLEAN"
    if s == "float":
        return "FLOAT", "FLOAT"
    if s == "double" or s.startswith("decimal"):
        return "DOUBLE", "DOUBLE"
    if s.startswith("timestamp"):
        return "LONG", "TIMESTAMP"
    if s == "date":
        return "STRING", "DATE"
    if s == "string":
        return "STRING", "VARCHAR"
    if s.startswith("array"):
        return "ARRAY", "ARRAY"
    return "COMPLEX", "OTHER"


def sys_segments_frame(
    spark: SparkSession,
    segment_roots: dict[str, str],
    unused: dict[str, frozenset[str]] | None = None,
    size_cache: dict[str, int] | None = None,
) -> DataFrame:
    """Druid's ``sys.segments`` metadata table over segment roots.

    Built from each root's planning manifest (``load_plan_meta`` — one
    file read per root on the warm path; no segment DECODE ever
    happens, though the ``size`` column costs one stat-walk per segment
    dir at registration time — metadata the manifest does not carry).
    Served columns are the subset of Druid's sys.segments
    (sql-metadata-tables.md) this architecture has truthful values
    for: all segments here are published and historical. ``unused``
    maps datasource -> segment-dir basenames dropped by retention
    rules or markUnused: those stay published (kill is the permanent
    delete) but report ``is_available = 0``, like real Druid's
    unserved segments.
    """
    import os

    from .cli import _format_millis as iso
    from .sources.datasource import (
        find_segment_dirs,
        load_plan_meta,
        overshadowed_segments,
        segment_version_tag,
    )

    rows = []
    for ds, root in segment_roots.items():
        seg_dirs = find_segment_dirs(root)
        meta = load_plan_meta(root, seg_dirs)
        dropped = (unused or {}).get(ds) or frozenset()
        # overshadow is computed among USED segments only (Druid's
        # timeline considers used segments): marking the newest
        # version unused makes the older one visible again, and the
        # scan path (_served_dirs, which excludes dropped dirs first)
        # must agree with what this view reports
        shadowed = overshadowed_segments({
            d: m for d, m in meta.items()
            if os.path.basename(d) not in dropped
        })
        for seg_dir in seg_dirs:
            m = meta.get(seg_dir)
            if m is None:
                continue
            # segment dirs are immutable once written, so sizes cache
            # forever — without this, every sys.segments rebuild
            # stat-walks every file of every segment
            size = (size_cache or {}).get(seg_dir)
            if size is None:
                size = 0
                for base, _, files in os.walk(seg_dir):
                    for fn in files:
                        try:
                            size += os.path.getsize(
                                os.path.join(base, fn)
                            )
                        except OSError:
                            pass
                if size_cache is not None:
                    size_cache[seg_dir] = size
            start, end = iso(m["start"]), iso(m["end"])
            base_name = os.path.basename(seg_dir)
            is_shadowed = base_name in shadowed
            available = 0 if (base_name in dropped or is_shadowed) else 1
            rows.append((
                f"{ds}_{start}_{end}_{base_name}",
                ds, start, end, size, int(m["rows"]), 1,
                available,
                0, 1 if is_shadowed else 0,
                # console-parity columns (sql-metadata-tables.md),
                # truthful for this single-historical engine: version
                # is the writer-name's version tag (dir basename for
                # untagged batch segments), sharding is dynamic
                # partition 0, and an available segment is served by
                # exactly the one historical
                segment_version_tag(base_name), 0, available, 1,
            ))
    return spark.createDataFrame(
        rows,
        "segment_id string, datasource string, start string, "
        "end string, size bigint, num_rows bigint, "
        "is_published int, is_available int, is_realtime int, "
        "is_overshadowed int, version string, partition_num int, "
        "num_replicas int, replication_factor int",
    )


# sys.* / INFORMATION_SCHEMA.* are qualified names Spark's temp
# views cannot carry; the SQL text is rewritten to registered flat
# views (documented shim)
_SYS_TABLE_RE = re.compile(
    r"\bsys\.(segments|tasks|datasources|supervisors"
    r"|server_segments|servers)\b",
    re.I,
)
_INFO_SCHEMA_RE = re.compile(
    r"\bINFORMATION_SCHEMA\.(TABLES|COLUMNS|SCHEMATA)\b", re.I
)
# single-quoted SQL string literals ('' = escaped quote) — system-table
# rewriting must not touch text inside them
_SQL_LITERAL_RE = re.compile(r"'(?:[^']|'')*'")

# Druid SQL-based ingestion statements (sql-ingestion.md), served by
# POST /druid/v2/sql/task: INSERT appends, REPLACE OVERWRITE ALL swaps
_INGEST_SQL_RE = re.compile(
    # select is GREEDY so the PARTITIONED BY clause binds to the LAST
    # occurrence (a string literal containing the phrase can't truncate
    # the SELECT); WITH-CTE ingestion (the form Druid's docs lead with)
    # is accepted alongside plain SELECT; ALL TIME is two words
    r"^\s*(?P<verb>INSERT|REPLACE)\s+INTO\s+\"?(?P<ds>[\w.\-]+)\"?\s+"
    r"(?P<overwrite>OVERWRITE\s+ALL\s+)?"
    r"(?P<select>(?:WITH|SELECT)\b.*)\s+"
    r"PARTITIONED\s+BY\s+(?P<grain>ALL\s+TIME|\w+|'[^']+')"
    r"(?:\s+CLUSTERED\s+BY\s+(?P<cluster>[^;]+?))?\s*;?\s*$",
    re.I | re.S,
)
# MSQ's external-input table function (sql-ingestion.md):
# TABLE(EXTERN('<inputSource json>', '<inputFormat json>',
# '<signature json>')) — rewritten to a registered temp view
_EXTERN_RE = re.compile(
    r"TABLE\s*\(\s*EXTERN\s*\(\s*"
    r"'(?P<src>(?:[^']|'')*)'\s*,\s*"
    r"'(?P<fmt>(?:[^']|'')*)'\s*,\s*"
    r"'(?P<sig>(?:[^']|'')*)'\s*\)\s*\)",
    re.I | re.S,
)

# PARTITIONED BY keywords -> granularity periods; ALL [TIME] = the
# engine's ALL granularity (one segment bucket for all time)
_PARTITIONED_BY = {
    "HOUR": "PT1H", "DAY": "P1D", "WEEK": "P1W", "MONTH": "P1M",
    "YEAR": "P1Y", "ALL": "ALL", "ALL TIME": "ALL",
}


def _sub_outside_literals(sql: str, fn) -> str:
    """Apply ``fn(chunk) -> chunk`` to the parts of ``sql`` that are
    NOT inside single-quoted string literals."""
    out, pos = [], 0
    for m in _SQL_LITERAL_RE.finditer(sql):
        out.append(fn(sql[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(fn(sql[pos:]))
    return "".join(out)


def _bind_params(body: dict) -> list | None:
    """Druid SQL API ``parameters``: positional ?-placeholders carried
    as typed {"type", "value"} objects (or bare values) — unwrapped to
    the positional list Spark's parameterized SQL binds. The one
    unwrap for every broker SQL surface (sync, task, statements);
    Avatica's TypedValue lists arrive in a different wire shape and
    unwrap through avatica._typed_values."""
    params = body.get("parameters")
    if not params:
        return None
    return [p.get("value") if isinstance(p, dict) else p for p in params]


def _strip_sql_head(sql: str) -> str:
    """Drop leading whitespace, -- line comments, and /* */ block
    comments — enough to classify a statement's verb the way Calcite
    does (a commented or parenthesized SELECT is still a SELECT)."""
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
        elif sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            break
    return sql[i:]


def _rewrite_system_tables(sql: str) -> str:
    """Druid-SQL-text front door: maps sys./INFORMATION_SCHEMA names
    onto the engine's views AND the DataSketches SQL function names
    onto Spark's DataSketches builtins (every broker SQL path runs
    through here, so JDBC, async statements, and MSQ all get both)."""
    from .functions.druid_sql import rewrite_datasketches_sql

    def rw(chunk: str) -> str:
        chunk = _SYS_TABLE_RE.sub(
            lambda m: f"sys_{m.group(1).lower()}", chunk
        )
        return _INFO_SCHEMA_RE.sub(
            lambda m: f"information_schema_{m.group(1).lower()}", chunk
        )

    return rewrite_datasketches_sql(_sub_outside_literals(sql, rw))


def _json_safe(v: Any) -> Any:
    """Recursive JSON coercion for collected Spark values: datetimes ->
    ISO strings (date/time have no sep argument), Decimals -> floats,
    bytes -> base64, arrays/maps/structs element-wise; anything else
    falls back to str() so a response can never die inside json.dumps
    after the handler's error envelope has been bypassed."""
    import base64
    import datetime
    import decimal

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, (datetime.date, datetime.time)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, tuple) and hasattr(v, "asDict"):  # nested Row
        return {k: _json_safe(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    return str(v)


def _rows_json(df: DataFrame, limit: int) -> list[dict[str, Any]]:
    """Collect as JSON-safe row dicts. ``limit`` bounds the driver-side
    collect — the broker is a serving endpoint, not an export path. A
    result that EXCEEDS the limit raises (Druid's resource-limit
    posture: all rows or an error, never a silently partial response)
    — detected by collecting limit+1, so at most one extra row crosses
    the driver boundary."""
    rows = df.limit(limit + 1).collect()
    if len(rows) > limit:
        raise _ResourceLimitExceeded(
            f"result exceeds maxRows limit of {limit}; add a LIMIT or "
            f"raise the broker's max_rows"
        )
    return [
        {k: _json_safe(v) for k, v in row.asDict(recursive=True).items()}
        for row in rows
    ]


def _native_envelope(spec: dict, rows: list[dict]) -> list[dict]:
    """Wrap flat result rows in Druid's per-queryType native response
    envelope (querying/timeseriesquery.md et al.): timeseries/groupBy
    rows carry {timestamp, result|event}, topN groups rows per time
    bucket, scan returns column-listed event batches, search/
    timeBoundary/dataSourceMetadata return single {timestamp, result}
    entries, segmentMetadata a merged column analysis. Rows arrive
    _json_safe'd (timestamps already ISO strings). For granularity
    'all' (no timestamp column) the bucket timestamp is the queried
    interval's start when intervals were given, else null."""
    qt = spec.get("queryType")
    ivs = spec.get("intervals")
    default_ts = (
        str(ivs[0]).split("/")[0] if isinstance(ivs, list) and ivs else None
    )

    def ts_of(r: dict) -> Any:
        return r.pop("timestamp", default_ts)

    if qt == "timeseries":
        return [{"timestamp": ts_of(r), "result": r} for r in rows]
    if qt == "topN":
        out: list[dict] = []
        buckets: dict[Any, dict] = {}
        for r in rows:
            ts = ts_of(r)
            if ts not in buckets:
                buckets[ts] = {"timestamp": ts, "result": []}
                out.append(buckets[ts])
            buckets[ts]["result"].append(r)
        return out
    if qt == "groupBy":
        return [
            {"version": "v1", "timestamp": ts_of(r), "event": r}
            for r in rows
        ]
    if qt == "scan":
        if not rows:
            return []
        cols = spec.get("columns") or list(rows[0])
        events: Any = (
            [[r.get(c) for c in cols] for r in rows]
            if spec.get("resultFormat") == "compactedList"
            else rows
        )
        return [{"segmentId": None, "columns": cols, "events": events}]
    if qt == "search":
        return [{"timestamp": default_ts, "result": rows}]
    if qt in ("timeBoundary", "dataSourceMetadata"):
        if not rows:
            return []
        r = rows[0]
        ts = (
            r.get("minTime") or r.get("maxTime")
            or r.get("maxIngestedEventTime")
        )
        return [{"timestamp": ts, "result": r}]
    if qt == "segmentMetadata":
        if not rows:
            return []
        return [{
            "id": "merged",
            "numRows": rows[0].get("num_rows"),
            "columns": {
                r["column"]: {k: v for k, v in r.items() if k != "column"}
                for r in rows
            },
        }]
    return rows


class _ResultCache:
    """Whole-query result cache (Druid's broker result-level cache,
    using-caching.md): entries key on the query plus a DIGEST OF THE
    DATASOURCE'S SEGMENT STATE, so ingestion/compaction/handoff
    invalidate implicitly — the next lookup's digest differs and
    misses. LRU-bounded; thread-safe under the caller's lock."""

    def __init__(self, max_entries: int = 64):
        from collections import OrderedDict

        self.max_entries = max_entries
        self._d: "OrderedDict[tuple, Any]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: tuple) -> Any | None:
        v = self._d.get(key)
        if v is None:
            self.misses += 1
            return None
        self._d.move_to_end(key)
        self.hits += 1
        return v

    def put(self, key: tuple, value: Any) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)


def _segment_state_digest(root: str) -> str | None:
    """Identity of a segment root's current state: sorted (segment
    name, meta.smoosh size, mtime_ns) — the same identity the planning
    manifest uses, O(#segments) stats with zero segment opens. Any
    rewrite, handoff, or compaction swap changes it."""
    import hashlib
    import os

    from .sources.datasource import find_segment_dirs

    try:
        parts = []
        for seg_dir in find_segment_dirs(root):
            st = os.stat(os.path.join(seg_dir, "meta.smoosh"))
            parts.append(
                f"{os.path.basename(seg_dir)}:{st.st_size}:{st.st_mtime_ns}"
            )
    except OSError:
        return None
    return hashlib.md5("|".join(sorted(parts)).encode()).hexdigest()


def _native_datasource_names(ds: Any) -> list[str] | None:
    """Every concrete table name a native dataSource tree references,
    or None if a form that cannot be resolved to names appears."""
    if isinstance(ds, str):
        return [ds]
    if isinstance(ds, dict):
        t = ds.get("type")
        if t == "table":
            return [ds["name"]] if isinstance(ds.get("name"), str) else None
        if t == "union":
            out: list[str] = []
            for child in ds.get("dataSources") or []:
                names = _native_datasource_names(child)
                if names is None:
                    return None
                out.extend(names)
            return out
        if t == "join":
            left = _native_datasource_names(ds.get("left"))
            right = _native_datasource_names(ds.get("right"))
            if left is None or right is None:
                return None
            return left + right
        if t == "query":
            inner = ds.get("query") or {}
            return _native_datasource_names(inner.get("dataSource"))
        if t == "unnest":
            return _native_datasource_names(ds.get("base"))
        if t == "lookup":
            return []  # lookups are broker state, not segment state
    return None


def _native_lookup_names(ds: Any) -> list[str]:
    """Every lookup name a native dataSource tree references — their
    versions ride in the result-cache key so a lookup update
    invalidates cached joins against it (segment digests can't see
    broker lookup state move)."""
    if not isinstance(ds, dict):
        return []
    t = ds.get("type")
    if t == "lookup":
        name = ds.get("lookup") or ds.get("name")
        return [name] if isinstance(name, str) else []
    if t == "union":
        return [
            n for c in ds.get("dataSources") or []
            for n in _native_lookup_names(c)
        ]
    if t == "join":
        return (
            _native_lookup_names(ds.get("left"))
            + _native_lookup_names(ds.get("right"))
        )
    if t == "query":
        return _native_lookup_names((ds.get("query") or {}).get("dataSource"))
    if t == "unnest":
        return _native_lookup_names(ds.get("base"))
    return []


# SQL whose result can change without the data changing must never be
# served from cache (conservative token scan outside string literals)
_VOLATILE_SQL_RE = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|now|unix_timestamp|"
    r"monotonically_increasing_id|current_timestamp|current_date|"
    r"current_timezone|localtimestamp)\b",
    re.I,
)


class _QueryTimeout(Exception):
    """A query exceeded its context.timeout (HTTP 504, Druid's shape)."""


class _QueryCancelled(Exception):
    """A query was cancelled through DELETE /druid/v2/sql/{sqlQueryId}
    (Druid's QueryInterruptedException "Query cancelled" shape)."""


class _CapacityExceeded(Exception):
    """A query lane is at capacity (HTTP 429, Druid's
    QueryCapacityExceededException shape — query laning docs)."""


class _ResourceLimitExceeded(Exception):
    """A result exceeded the broker's max_rows (HTTP 400, Druid's
    Resource-limit-exceeded error shape)."""


class DruidBrokerShim:
    """Serve /druid/v2 + /druid/v2/sql for a table map.

    >>> shim = DruidBrokerShim(spark, {"events": events_df})
    >>> port = shim.start()          # 0 -> ephemeral port
    >>> ... POST http://localhost:{port}/druid/v2 ...
    >>> shim.stop()
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        time_col: str = "__time",
        max_rows: int = 100_000,
        lookups: dict[str, dict[str, str]] | None = None,
        segment_roots: dict[str, str] | None = None,
        deep_storage: str | None = None,
        result_cache_entries: int = 64,
        lanes: dict[str, int] | None = None,
    ):
        self.spark = spark
        self.tables = dict(tables)
        self.time_col = time_col
        self.max_rows = max_rows
        self.deep_storage = deep_storage
        self._result_cache = _ResultCache(result_cache_entries)
        self._segment_roots = dict(segment_roots or {})
        # digest of the segment state each root's registration serves;
        # a moved digest re-registers before serving (_ensure_fresh_roots)
        self._root_digests: dict[str, str] = {
            n: d
            for n, r in self._segment_roots.items()
            if (d := _segment_state_digest(r)) is not None
        }
        self._tasks: dict[str, dict] = {}
        # sync SQL cancellation (sql-api.md): context.sqlQueryId ->
        # live Spark job group; DELETE /druid/v2/sql/{id} cancels it
        self._sql_cancel: dict[str, str] = {}
        self._sql_cancelled: set[str] = set()
        # async SQL statements (POST /druid/v2/sql/statements)
        self._sql_statements: dict[str, dict] = {}
        # MSQ SELECT task results: task_id -> (signature, rows), served
        # by GET /druid/indexer/v1/task/{id}/reports (bounded: rows
        # pass the max_rows gate before they are retained)
        self._task_reports: dict[str, tuple] = {}
        # submitted task bodies, for GET /druid/indexer/v1/task/{id}
        # (the console's payload view)
        self._task_payloads: dict[str, dict] = {}
        # terminal-status retention bound (_record_task docstring)
        self._max_tasks = 1024
        self._supervisors: dict[str, Any] = {}
        # supervisor spec-revision audit: id -> [{spec, version}, ...]
        # in submit order (survives supervisor replacement — history is
        # the point of keeping it OUTSIDE the supervisor object)
        self._supervisor_history: dict[str, list[dict]] = {}
        self._task_seq = 0
        self._lock = threading.Lock()
        # serializes supervisor replace sequences (terminate prev +
        # start next); self._lock stays for fast map/view updates
        self._submit_lock = threading.Lock()
        # query laning (Druid's query-scheduler lanes): context.lane
        # picks a lane; a full lane rejects with HTTP 429 instead of
        # queueing, protecting interactive traffic from batch floods
        self._lanes: dict[str, threading.BoundedSemaphore] = {
            name: threading.BoundedSemaphore(int(cap))
            for name, cap in (lanes or {}).items()
        }
        # auto-compaction (coordinator duty): per-datasource configs
        # submitted over /druid/coordinator/v1/config/compaction; a
        # daemon duty thread (started on first config) heals
        # fragmentation the way Druid's coordinator compaction duty does
        self._compaction_configs: dict[str, dict] = {}
        self._compaction_period_s = 30.0
        self._compaction_stop = threading.Event()
        self._compaction_thread: threading.Thread | None = None
        # retention rules (rule-configuration.md, retention.py): per-
        # datasource chains + the cluster default chain under the
        # "_default" key of the rules API; manual markUnused/markUsed
        # overrides compose on top (manual-unused wins over rules).
        # _retention_epoch bumps on every rules/mark change and folds
        # into result-cache keys — a rule flip changes what a query
        # answers WITHOUT moving any segment-state digest, so the
        # digest alone must never validate a cached result.
        from .retention import DEFAULT_RULES

        self._rules: dict[str, list[dict]] = {}
        # audit log served by GET /druid/coordinator/v1/rules/history
        self._rules_history: list[dict] = []
        self._default_rules: list[dict] = list(DEFAULT_RULES)
        self._manual_unused: dict[str, frozenset[str]] = {}
        # unused set each root's CURRENT registration excludes (what
        # sys.segments reports); maintained by _register_datasource_root
        self._unused: dict[str, frozenset[str]] = {}
        self._retention_epoch = 0
        # segment dirs are immutable once written (compaction and
        # ingestion create NEW dirs), so their on-disk size is cached
        # forever per shim — /druid/v2/candidates over a 100k-segment
        # datasource must not stat-walk every segment per request
        self._size_cache: dict[str, int] = {}
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        # JDBC surface: Avatica JSON RPC at /druid/v2/sql/avatica
        from .avatica import AvaticaEndpoint

        self._avatica = AvaticaEndpoint(self._avatica_run_sql)

        from .functions import (
            register_druid_sql_functions,
            register_sql_lookups,
        )

        register_druid_sql_functions(spark)
        self._lookups: dict[str, dict[str, str]] = {
            n: dict(m) for n, m in (lookups or {}).items()
        }
        self._lookup_versions: dict[str, str] = {
            n: "0" for n in self._lookups
        }
        # names explicitly DELETEd through the coordinator API — the
        # persisted tombstones that keep a delete durable across a
        # restart whose constructor still passes the lookup (overlay
        # alone cannot distinguish never-persisted from deleted)
        self._lookup_tombstones: set[str] = set()
        if lookups:
            register_sql_lookups(spark, lookups)
        # always registered (empty without roots/tasks): a client's
        # SELECT * FROM sys.segments/tasks/datasources answers zero
        # rows like a real broker, never an unknown-view error
        import datetime

        self._start_time = datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat()
        self._refresh_sys_segments()
        self._refresh_sys_tasks()
        self._refresh_sys_datasources()
        self._refresh_sys_supervisors()
        _inv = self._server_inventory()
        self._refresh_sys_servers(_inv)
        self._refresh_sys_server_segments(_inv)
        self._register_information_schema()
        # real Druid keeps rules and lookup configs in the metadata
        # store, so a restarted coordinator still enforces them; this
        # broker persists both under deep storage (same atomic-replace
        # discipline as the planning manifest), reloads here, and
        # re-registers any root / SQL dispatcher the loaded state
        # affects so the first query already serves it
        self._load_persisted_rules()
        self._load_persisted_lookups()

    def _rules_path(self) -> str | None:
        import os

        if self.deep_storage is None:
            return None
        return os.path.join(self.deep_storage, "_coordinator",
                            "rules.json")

    def _load_persisted_rules(self) -> None:
        from .retention import DEFAULT_RULES

        path = self._rules_path()
        if path is None:
            return
        try:
            with open(path, encoding="utf-8") as f:
                state = json.load(f)
        except (OSError, ValueError):
            return
        with self._lock:
            self._rules = {
                ds: list(c) for ds, c in (state.get("rules") or {}).items()
            }
            self._default_rules = list(
                state.get("default") or self._default_rules
            )
            self._manual_unused = {
                ds: frozenset(v)
                for ds, v in (state.get("manualUnused") or {}).items()
            }
            self._rules_history = list(state.get("history") or ())
        nondefault = self._default_rules != list(DEFAULT_RULES)
        for ds in list(self._segment_roots):
            if nondefault or self._rules.get(ds) \
                    or self._manual_unused.get(ds):
                self._register_datasource_root(ds)
        # period rules drift with wall-clock: a restarted coordinator
        # must resume re-evaluating them, not just apply the load-time
        # "now" once
        if any(
            "Period" in r.get("type", "")
            for chain in list(self._rules.values()) + [self._default_rules]
            for r in chain
        ):
            self._ensure_duty_thread()

    def _lookups_path(self) -> str | None:
        import os

        if self.deep_storage is None:
            return None
        return os.path.join(self.deep_storage, "_coordinator",
                            "lookups.json")

    def _load_persisted_lookups(self) -> None:
        """Persisted lookup configs OVERLAY constructor-passed ones
        per name (persisted entries are the NEWER coordinator state
        and win on collision), but a constructor lookup absent from
        the persisted file survives — a broker restarted with a newly
        added constructor lookup must not silently lose it. The SQL
        ``LOOKUP()`` dispatcher re-registers so the first query sees
        the merged map."""
        path = self._lookups_path()
        if path is None:
            return
        try:
            with open(path, encoding="utf-8") as f:
                state = json.load(f)
        except (OSError, ValueError):
            return
        from .functions import register_sql_lookups

        with self._lock:
            self._lookups.update({
                n: {str(k): str(v) for k, v in m.items()}
                for n, m in (state.get("lookups") or {}).items()
            })
            self._lookup_versions.update({
                str(n): str(v)
                for n, v in (state.get("versions") or {}).items()
            })
            # tombstones beat the constructor: an explicitly DELETEd
            # lookup stays deleted across a restart (re-POSTing it
            # clears the tombstone)
            self._lookup_tombstones |= {
                str(n) for n in (state.get("deleted") or [])
            }
            for n in self._lookup_tombstones:
                self._lookups.pop(n, None)
                self._lookup_versions.pop(n, None)
        register_sql_lookups(self.spark, self._lookups)

    def _persist_lookups(self) -> None:
        import os

        path = self._lookups_path()
        if path is None:
            return
        with self._lock:
            state = {
                "lookups": {n: dict(m) for n, m in self._lookups.items()},
                "versions": dict(self._lookup_versions),
                "deleted": sorted(self._lookup_tombstones),
            }
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # pid+thread-unique tmp: two HTTP handler threads persisting
        # concurrently must not truncate each other's half-written tmp
        # (each writes its own snapshot; os.replace keeps the last one
        # whole)
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(state, f)
        os.replace(tmp, path)

    def _persist_rules(self) -> None:
        """Write the retention state atomically (call OUTSIDE the
        lock; reads its own consistent snapshot under it)."""
        import os

        path = self._rules_path()
        if path is None:
            return
        with self._lock:
            state = {
                "rules": {ds: list(c) for ds, c in self._rules.items()},
                "default": list(self._default_rules),
                "manualUnused": {
                    ds: sorted(v)
                    for ds, v in self._manual_unused.items()
                },
                "history": list(self._rules_history),
            }
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(state, f)
        os.replace(tmp, path)

    def _refresh_sys_segments(self) -> None:
        sys_segments_frame(
            self.spark, self._segment_roots, self._unused,
            self._size_cache,
        ).createOrReplaceTempView("sys_segments")

    def _refresh_sys_tasks(self) -> None:
        """``sys.tasks`` (sql-metadata-tables.md): the documented
        columns this synchronous overlord has truthful values for.
        Completed tasks have runner_status NONE, like real Druid."""
        rows = [
            (
                t["id"], t["id"], t.get("type", "index_parallel"),
                t["dataSource"], t.get("createdTime"), t["status"],
                "NONE", t["duration"], t["errorMsg"],
            )
            for t in self._tasks.values()
        ]
        self.spark.createDataFrame(
            rows,
            "task_id string, group_id string, type string, "
            "datasource string, created_time string, status string, "
            "runner_status string, duration bigint, error_msg string",
        ).createOrReplaceTempView("sys_tasks")

    def _refresh_sys_supervisors(self) -> None:
        """``sys.supervisors`` (sql-metadata-tables.md): one row per
        submitted supervisor — the documented columns this controller
        has truthful values for (spec_id/datasource/state/healthy plus
        the spec payload as JSON)."""
        import json as _json

        rows = []
        for sup in self._supervisors.values():
            st = sup.status()
            rows.append((
                sup.id, sup.data_source,
                st["state"],
                "RUNNING" if sup.state == "RUNNING" else sup.state,
                1 if st["healthy"] else 0,
                str(sup.spec.get("type") or "local"),
                str(st["stream"] or ""),
                1 if sup.state == "SUSPENDED" else 0,
                _json.dumps(sup.spec, sort_keys=True),
            ))
        self.spark.createDataFrame(
            rows,
            "supervisor_id string, datasource string, state string, "
            "detailed_state string, healthy int, type string, "
            "source string, suspended int, spec string",
        ).createOrReplaceTempView("sys_supervisors")

    def _refresh_sys_datasources(self) -> None:
        """``sys.datasources`` (sql-metadata-tables.md): one row per
        queryable datasource — the registered table map."""
        self.spark.createDataFrame(
            [(n,) for n in sorted(self.tables)], "datasource string"
        ).createOrReplaceTempView("sys_datasources")

    def _historical_name(self) -> str:
        """The single-process engine's one segment-serving server, named
        host:port like Druid's inventory (conventional historical
        default port; all services here share one process)."""
        return "localhost:8083"

    def _server_inventory(self) -> tuple[list[tuple], list[tuple]]:
        """(sys.servers rows, sys.server_segments rows) — the
        coordinator server inventory (sql-metadata-tables.md sys tables;
        coordinator-api.md /servers), synthesized truthfully for this
        single-process engine: one row per SERVICE this process runs
        (broker, coordinator, overlord, historical — each answers its
        documented API surface here), with the historical serving every
        visible-timeline segment. curr_size sums served segment bytes
        (the same size cache sys.segments uses); max_size reports the
        deep-storage filesystem's capacity when known (the physical
        ceiling), else 0. The coordinator/overlord rows lead
        (is_leader=1) by construction — there is exactly one of each."""
        segs = self._metadata_segments()
        curr = sum(s["size"] for s in segs)
        max_size = 0
        probe = self.deep_storage or next(
            iter(self._segment_roots.values()), None
        )
        if probe is not None:
            import shutil

            try:
                max_size = shutil.disk_usage(probe).total
            except OSError:
                pass
        broker_port = (
            self._server.server_address[1] if self._server else 8082
        )
        st = self._start_time
        hist = self._historical_name()
        servers = [
            (f"localhost:{broker_port}", "localhost", broker_port, -1,
             "broker", None, 0, 0, None, st),
            ("localhost:8081", "localhost", 8081, -1,
             "coordinator", None, 0, 0, 1, st),
            ("localhost:8090", "localhost", 8090, -1,
             "overlord", None, 0, 0, 1, st),
            (hist, "localhost", 8083, -1,
             "historical", "_default_tier", curr, max_size, None, st),
        ]
        served = [(hist, s["identifier"]) for s in segs]
        return servers, served

    def _refresh_sys_servers(
        self, inventory: tuple[list, list] | None = None
    ) -> None:
        servers, _ = inventory or self._server_inventory()
        self.spark.createDataFrame(
            servers,
            "server string, host string, plaintext_port int, "
            "tls_port int, server_type string, tier string, "
            "curr_size bigint, max_size bigint, is_leader int, "
            "start_time string",
        ).createOrReplaceTempView("sys_servers")

    def _refresh_sys_server_segments(
        self, inventory: tuple[list, list] | None = None
    ) -> None:
        """``sys.server_segments``: one (server, segment_id) row per
        served segment — joins sys.servers to sys.segments, the shape
        the Druid console's segment-distribution views query."""
        _, served = inventory or self._server_inventory()
        self.spark.createDataFrame(
            served, "server string, segment_id string"
        ).createOrReplaceTempView("sys_server_segments")

    def _register_information_schema(self) -> None:
        """INFORMATION_SCHEMA.TABLES / .COLUMNS (sql-metadata-tables.md)
        — what JDBC drivers and BI tools issue first against a broker.
        Built from the registered table map's schemas; Druid's schema
        name for datasources is 'druid'."""
        tab_rows = [("druid", "druid", n, "TABLE")
                    for n in sorted(self.tables)]
        col_rows = []
        for n in sorted(self.tables):
            for i, f in enumerate(self.tables[n].schema.fields, start=1):
                col_rows.append((
                    "druid", n, f.name, i, _druid_types(f.dataType)[1],
                    "YES" if f.nullable else "NO",
                ))
        self.spark.createDataFrame(
            tab_rows,
            "TABLE_CATALOG string, TABLE_SCHEMA string, "
            "TABLE_NAME string, TABLE_TYPE string",
        ).createOrReplaceTempView("information_schema_tables")
        self.spark.createDataFrame(
            col_rows,
            "TABLE_SCHEMA string, TABLE_NAME string, COLUMN_NAME string, "
            "ORDINAL_POSITION int, DATA_TYPE string, IS_NULLABLE string",
        ).createOrReplaceTempView("information_schema_columns")
        # SCHEMATA: the three schemas every Druid broker exposes
        # (sql-metadata-tables.md) — JDBC drivers enumerate these
        # before touching TABLES
        self.spark.createDataFrame(
            [("druid", s, "") for s in
             ("druid", "sys", "INFORMATION_SCHEMA", "lookup")],
            "CATALOG_NAME string, SCHEMA_NAME string, "
            "SCHEMA_OWNER string",
        ).createOrReplaceTempView("information_schema_schemata")
        for name, df in self.tables.items():
            df.createOrReplaceTempView(name)

    # -- request handling ------------------------------------------------
    def _ensure_fresh_roots(
        self, names: list[str] | None
    ) -> dict[str, str]:
        """Serve-fresh check for root-backed datasources (a loaded
        druidsegment DataFrame freezes its segment list, but a real
        broker sees segments the moment they publish): compute each
        referenced root's state digest, re-register any whose digest
        moved since registration, and return {name: digest}. ``names``
        None (unresolvable reference set) checks every root. One
        O(#segments) stat walk per root per request — the same
        metadata walk planning itself performs, far below query cost."""
        if names is None:
            names = list(self._segment_roots)
        out: dict[str, str] = {}
        for n in dict.fromkeys(names):  # stable de-dup
            root = self._segment_roots.get(n)
            if root is None:
                continue
            d = _segment_state_digest(root)
            if d is None:
                continue
            if self._root_digests.get(n) != d:
                self._register_datasource_root(n, digest=d)
            out[n] = d
        return out

    def _datasource_digests(
        self, names: list[str] | None, fresh: dict[str, str]
    ) -> tuple | None:
        """(name, digest) per referenced datasource, or None when any
        referenced datasource is not a segment root (no invalidation
        signal exists for plain registered DataFrames — don't cache)."""
        if not names:
            return None
        uniq = list(dict.fromkeys(names))
        if any(n not in fresh for n in uniq):
            return None
        # retention epoch rides in the key: a rule/markUnused flip
        # changes served rows without moving any root digest
        return tuple((n, fresh[n]) for n in uniq) + (
            ("__retention_epoch__", str(self._retention_epoch)),
        )

    def _handle_native(self, body: dict) -> list[dict]:
        ctx = body.get("context") or {}
        use = bool(ctx.get("useCache", True))
        populate = bool(ctx.get("populateCache", True))
        names = _native_datasource_names(body.get("dataSource"))
        fresh = self._ensure_fresh_roots(names)
        key = None
        if (use or populate) and self._result_cache.max_entries:
            digs = (
                self._datasource_digests(names, fresh)
                if names is not None else None
            )
            if digs is not None:
                # lookup datasources are broker state: their versions
                # join the key so a config POST invalidates implicitly
                lk = _native_lookup_names(body.get("dataSource"))
                if lk:
                    digs = digs + tuple(
                        (f"__lookup__:{n}",
                         self._lookup_versions.get(n, "0"))
                        for n in sorted(set(lk))
                    )
                # execution-only context keys stay OUT of the key;
                # result-shaping ones (skipEmptyBuckets, grandTotal, ...)
                # stay IN — two semantically different queries must
                # never share a cache entry
                ctx_key = {
                    k: v
                    for k, v in ctx.items()
                    if k not in (
                        "useCache", "populateCache", "timeout",
                        "priority", "queryId",
                    )
                }
                key = (
                    "native",
                    json.dumps(
                        {
                            **{
                                k: v
                                for k, v in body.items()
                                if k != "context"
                            },
                            "context": ctx_key,
                        },
                        sort_keys=True,
                    ),
                    digs,
                )
        if key is not None and use:
            with self._lock:
                cached = self._result_cache.get(key)
            if cached is not None:
                return cached
        df = native_query(
            None, body, time_col=self.time_col, tables=self.tables,
            lookups=self._lookups,
        )
        out = _native_envelope(body, _rows_json(df, self.max_rows))
        if key is not None and populate:
            with self._lock:
                self._result_cache.put(key, out)
        return out

    def _handle_sql(self, body: dict) -> tuple[bytes, str]:
        """Result-level cache wrapper around :meth:`_render_sql`
        (Druid's broker result cache, using-caching.md; context flags
        ``useCache``/``populateCache``, default true). Cacheable iff
        every referenced table is a segment root (the root-state digest
        in the key makes ingest/compaction invalidate implicitly), the
        query references no sys./INFORMATION_SCHEMA view, isn't
        EXPLAIN, and contains no volatile function token."""
        ctx = body.get("context") or {}
        use = bool(ctx.get("useCache", True))
        populate = bool(ctx.get("populateCache", True))
        key = None
        sql_text = body.get("query", "")
        if re.match(r"\s*(INSERT|REPLACE)\s+INTO\b", sql_text, re.I):
            # same split as real Druid: the interactive SQL endpoint
            # rejects ingestion statements and points at the task API
            raise ValueError(
                "INSERT/REPLACE statements must be submitted to "
                "POST /druid/v2/sql/task"
            )
        stripped = _SQL_LITERAL_RE.sub(" ", sql_text)
        names = [t for t in self.tables if _word_in_sql(t, sql_text)]
        # a sys.* introspection must also see externally-published
        # segments, so it refreshes every root
        fresh = self._ensure_fresh_roots(
            None if _SYS_TABLE_RE.search(stripped) else names
        )
        # also rebuilds sys.supervisors at read time, so SQL agrees
        # with the /status endpoint when handoff-thread state flips
        self._reclaim_meta_views(stripped)
        if (use or populate) and self._result_cache.max_entries:
            if not (
                _EXPLAIN_RE.match(sql_text)
                or _VOLATILE_SQL_RE.search(stripped)
                or _SYS_TABLE_RE.search(stripped)
                or _INFO_SCHEMA_RE.search(stripped)
            ):
                digs = self._datasource_digests(names, fresh)
                if digs is not None:
                    key = (
                        "sql",
                        sql_text,
                        body.get("resultFormat", "object"),
                        bool(body.get("header", False)),
                        bool(body.get("typesHeader", False)),
                        bool(body.get("sqlTypesHeader", False)),
                        json.dumps(
                            body.get("parameters"), sort_keys=True
                        ),
                        digs,
                    )
        if key is not None and use:
            with self._lock:
                cached = self._result_cache.get(key)
            if cached is not None:
                return cached
        out = self._render_sql(body)
        if key is not None and populate:
            with self._lock:
                self._result_cache.put(key, out)
        return out

    def _reclaim_meta_views(self, stripped_sql: str) -> None:
        """The sys_* / information_schema_* temp views are
        session-global, so with several shims on ONE SparkSession the
        last registrar wins — a metadata query through this shim could
        read another shim's catalog. Re-register THIS shim's views
        before any query that references them (tiny createDataFrame
        calls; no segment IO)."""
        if _INFO_SCHEMA_RE.search(stripped_sql):
            with self._lock:
                self._register_information_schema()
        # rebuild only the views the SQL references: sys.segments
        # costs a per-root manifest read (size-cached), and a query
        # over sys.tasks must not pay it
        referenced = {
            m.lower() for m in _SYS_TABLE_RE.findall(stripped_sql)
        }
        if referenced:
            with self._lock:
                if "segments" in referenced:
                    self._refresh_sys_segments()
                if "tasks" in referenced:
                    self._refresh_sys_tasks()
                if "datasources" in referenced:
                    self._refresh_sys_datasources()
                if "supervisors" in referenced:
                    self._refresh_sys_supervisors()
            # OUTSIDE the lock: the server inventory reads the served
            # timeline through _metadata_segments, which takes the lock
            # itself (re-acquiring would deadlock — threading.Lock is
            # not reentrant). Computed ONCE even when the SQL joins
            # both views (the canonical console query does).
            if referenced & {"servers", "server_segments"}:
                inventory = self._server_inventory()
                if "servers" in referenced:
                    self._refresh_sys_servers(inventory)
                if "server_segments" in referenced:
                    self._refresh_sys_server_segments(inventory)

    def _avatica_run_sql(self, sql: str, args: list | None) -> tuple:
        """SQL execution for the Avatica endpoint: the same
        serve-fresh, system-table-rewrite, and resource-limit
        discipline as /druid/v2/sql, returning (schema fields,
        collected rows) for the RPC layer to encode."""
        stripped = _SQL_LITERAL_RE.sub(" ", sql)
        names = [t for t in self.tables if _word_in_sql(t, sql)]
        self._ensure_fresh_roots(
            None if _SYS_TABLE_RE.search(stripped) else names
        )
        self._reclaim_meta_views(stripped)
        df = self.spark.sql(_rewrite_system_tables(sql), args=args)
        collected = df.limit(self.max_rows + 1).collect()
        if len(collected) > self.max_rows:
            raise _ResourceLimitExceeded(
                f"result exceeds maxRows limit of {self.max_rows}; "
                f"add a LIMIT or raise the broker's max_rows"
            )
        return df.schema.fields, collected

    def _lane_slot(self, body):
        """Context manager claiming a slot in the query's lane (from
        context.lane). No lane -> no limit; an unknown lane is a client
        error; a FULL lane rejects immediately (Druid lanes shed load,
        they don't queue)."""
        import contextlib

        @contextlib.contextmanager
        def slot():
            lane = None
            if isinstance(body, dict):
                lane = (body.get("context") or {}).get("lane")
            if lane is None:
                yield
                return
            sem = self._lanes.get(lane)
            if sem is None:
                raise ValueError(f"unknown query lane {lane!r}")
            if not sem.acquire(blocking=False):
                raise _CapacityExceeded(
                    f"too many concurrent queries for lane '{lane}'"
                )
            try:
                yield
            finally:
                sem.release()

        return slot()

    def _set_compaction_config(self, body: dict) -> dict:
        """POST /druid/coordinator/v1/config/compaction
        (automatic-compaction.md): store a per-datasource config and
        make sure the duty thread is running. Supported fields:
        ``dataSource`` (required), ``segmentGranularity`` (target
        bucket, default day)."""
        ds = body.get("dataSource")
        if not ds:
            raise ValueError("compaction config needs a dataSource")
        with self._lock:
            cfgs = dict(self._compaction_configs)
            cfgs[ds] = {
                "dataSource": ds,
                "segmentGranularity": (
                    body.get("granularitySpec", {}).get(
                        "segmentGranularity"
                    )
                    or body.get("segmentGranularity", "day")
                ),
            }
            self._compaction_configs = cfgs
        self._ensure_duty_thread()
        return {"status": "accepted"}

    def _ensure_duty_thread(self) -> None:
        """Start the coordinator duty thread once: each cycle runs
        auto-compaction AND retention re-evaluation (period rules
        anchor at wall-clock, so what a chain drops MOVES as time
        passes — the real coordinator re-applies rules every run)."""
        if self._compaction_thread is not None:
            return

        def duty() -> None:
            while not self._compaction_stop.wait(
                self._compaction_period_s
            ):
                try:
                    self.run_auto_compaction()
                except Exception:
                    pass  # next cycle retries; queries unaffected
                try:
                    self.run_retention_duty()
                except Exception:
                    pass

        self._compaction_thread = threading.Thread(
            target=duty, daemon=True, name="coordinator-duty"
        )
        self._compaction_thread.start()

    def run_retention_duty(self) -> dict[str, int]:
        """One retention pass (tests call this directly): re-evaluate
        rules for every datasource whose effective chain contains a
        PERIOD rule — interval/forever rules can't drift with time, so
        roots governed only by those are skipped — and re-register any
        root whose unused set moved. Returns {datasource: n_unused}
        for the datasources that changed."""
        with self._lock:
            period_default = any(
                "Period" in r.get("type", "") for r in self._default_rules
            )
            names = [
                ds for ds in self._segment_roots
                if period_default
                or any(
                    "Period" in r.get("type", "")
                    for r in self._rules.get(ds, ())
                )
            ]
        out: dict[str, int] = {}
        for ds in names:
            root = self._segment_roots.get(ds)
            if root is None:
                continue
            unused = self._retention_unused(ds, root)
            with self._lock:
                if self._unused.get(ds, frozenset()) == unused:
                    continue
            self._register_datasource_root(ds)
            with self._lock:  # after registration — see _set_rules
                self._retention_epoch += 1
            out[ds] = len(unused)
        return out

    def _delete_compaction_config(self, ds: str) -> bool:
        with self._lock:
            if ds not in self._compaction_configs:
                return False
            cfgs = dict(self._compaction_configs)
            del cfgs[ds]
            self._compaction_configs = cfgs
        return True

    def run_auto_compaction(self) -> dict[str, int]:
        """One duty cycle (tests call this directly for determinism):
        for each configured datasource whose root holds MORE segments
        than target-granularity buckets (streaming handoff's natural
        fragmentation), rewrite the whole root at the target granularity
        through the engine's distributed compaction, swap it in, and
        re-register. Returns {datasource: segments_after} for the
        datasources it compacted."""
        import os
        import shutil

        from .native_query import _SIMPLE_GRANULARITIES
        from .sources.datasource import find_segment_dirs, load_plan_meta
        from .sources.ingest import compact_segments

        with self._lock:
            cfgs = dict(self._compaction_configs)
        out: dict[str, int] = {}
        for ds, cfg in cfgs.items():
            root = self._segment_roots.get(ds)
            if root is None:
                continue
            gran = str(cfg.get("segmentGranularity", "day"))
            period = _SIMPLE_GRANULARITIES.get(gran.lower(), gran)
            try:
                dirs = find_segment_dirs(root)
            except Exception:
                continue
            metas = load_plan_meta(root, dirs)
            # bucket each segment by its interval start at the target
            # granularity — pure metadata, no decodes
            import datetime as _dt

            def bucket(ms: int) -> str:
                d = _dt.datetime.fromtimestamp(
                    ms / 1000, _dt.timezone.utc
                )
                if period == "PT1H":
                    return d.strftime("%Y-%m-%dT%H")
                if period == "P1M":
                    return d.strftime("%Y-%m")
                if period == "P1Y":
                    return d.strftime("%Y")
                return d.strftime("%Y-%m-%d")  # day default
            buckets = {bucket(m["start"]) for m in metas.values()}
            if len(dirs) <= len(buckets):
                continue  # one segment per bucket: healthy
            staging = f"{root}.compacting.{os.getpid()}"
            shutil.rmtree(staging, ignore_errors=True)
            try:
                compact_segments(
                    self.spark, root, staging, granularity=period
                ).collect()
                shutil.rmtree(root, ignore_errors=True)
                os.rename(staging, root)
            finally:
                shutil.rmtree(staging, ignore_errors=True)
            self._register_datasource_root(ds)
            out[ds] = len(find_segment_dirs(root))
        return out

    def _lookup_spec(self, name: str) -> dict | None:
        with self._lock:
            m = self._lookups.get(name)
            if m is None:
                return None
            return {
                "version": self._lookup_versions.get(name, "0"),
                "lookupExtractorFactory": {"type": "map", "map": dict(m)},
            }

    def _lookup_update(self, name: str, body: dict) -> dict:
        """POST /druid/coordinator/v1/lookups/config/__default/{name}
        (lookups-api.md): create or replace a map lookup and re-register
        the SQL LOOKUP() dispatcher so the next query sees it. Accepts
        Druid's versioned envelope or a bare map."""
        from .functions import register_sql_lookups

        if "lookupExtractorFactory" in body:
            fac = body["lookupExtractorFactory"]
            if fac.get("type") != "map":
                raise ValueError(
                    f"unsupported lookup type {fac.get('type')!r} "
                    "(only 'map' lookups exist in-process)"
                )
            mapping = fac.get("map") or {}
            version = str(body.get("version", ""))
        else:
            mapping, version = body, ""
        if not isinstance(mapping, dict):
            raise ValueError("lookup map must be a JSON object")
        with self._lock:
            lookups = dict(self._lookups)
            lookups[name] = {str(k): str(v) for k, v in mapping.items()}
            self._lookups = lookups
            if not version:
                # auto-version: numeric predecessors increment; any
                # client-set string (e.g. "v2") restarts at "1" instead
                # of crashing int()
                try:
                    version = str(
                        int(self._lookup_versions.get(name, "0")) + 1
                    )
                except ValueError:
                    version = "1"
            versions = dict(self._lookup_versions)
            versions[name] = version
            self._lookup_versions = versions
            # re-creating a deleted lookup clears its tombstone
            self._lookup_tombstones = self._lookup_tombstones - {name}
            snapshot = self._lookups
        # the Spark UDF re-registration is a JVM round-trip — run it
        # OUTSIDE the fast map/view lock so concurrent queries don't
        # stall behind it (last registration wins either way)
        register_sql_lookups(self.spark, snapshot)
        self._persist_lookups()
        return {"status": "accepted"}

    def _lookup_delete(self, name: str) -> bool:
        from .functions import register_sql_lookups

        with self._lock:
            if name not in self._lookups:
                return False
            lookups = dict(self._lookups)
            del lookups[name]
            self._lookups = lookups
            versions = dict(self._lookup_versions)
            versions.pop(name, None)
            self._lookup_versions = versions
            self._lookup_tombstones = self._lookup_tombstones | {name}
            snapshot = self._lookups
        register_sql_lookups(self.spark, snapshot)  # outside the lock
        self._persist_lookups()
        return True

    def _coordinator_datasource(
        self, name: str, sub: str, full: bool = False
    ):
        """GET /druid/coordinator/v1/datasources/{ds}
        [/intervals | /segments[?full] | /segments/{id}] — the
        coordinator's datasource metadata (api-reference.md subset with
        truthful values here): segment count/size/min-max time for the
        bare form, the sorted "start/end" interval list for /intervals,
        used-segment ids (or ?full metadata objects, or one segment's
        object by id) for /segments — the console's datasource
        drill-down calls. Served from the planning manifest plus one
        stat-walk; no segment decodes."""
        root = self._segment_roots.get(name)
        if root is None:
            return None
        if sub == "segments" or sub.startswith("segments/"):
            segs = self._metadata_segments([name])
            if sub.startswith("segments/"):
                seg_id = sub.split("segments/", 1)[1]
                for s in segs:
                    if s["identifier"] == seg_id:
                        return s
                return None
            if full:
                return segs
            return [s["identifier"] for s in segs]
        import os

        from .cli import _format_millis as iso
        from .sources.datasource import find_segment_dirs, load_plan_meta

        dirs = find_segment_dirs(root)
        metas = load_plan_meta(root, dirs)
        if sub.startswith("intervals"):
            return sorted(
                {
                    f"{iso(m['start'])}/{iso(m['end'])}"
                    for m in metas.values()
                },
                reverse=True,
            )
        size = 0
        for d in dirs:
            for base, _, files in os.walk(d):
                for fn in files:
                    try:
                        size += os.path.getsize(os.path.join(base, fn))
                    except OSError:
                        pass
        starts = [m["start"] for m in metas.values()]
        ends = [m["end"] for m in metas.values()]
        return {
            "name": name,
            "properties": {
                "segments": {
                    "count": len(dirs),
                    "size": size,
                    "minTime": iso(min(starts)) if starts else None,
                    "maxTime": iso(max(ends)) if ends else None,
                }
            },
        }

    def _kill_task(self, ds: str, interval: str) -> int:
        """``{"type": "kill"}`` task (api-reference.md): permanently
        delete the datasource's segments WHOLLY CONTAINED in the given
        "start/end" ISO interval (Druid's containment rule — partially
        overlapping segments survive). Deletes from deep storage, then
        re-registers (or deregisters an emptied datasource) so
        sys.segments, the table map, and the result cache all move in
        the same step. Returns the number of segments killed."""
        import datetime
        import shutil

        from .sources.datasource import find_segment_dirs, load_plan_meta

        root = self._segment_roots.get(ds)
        if root is None:
            raise ValueError(f"unknown datasource {ds!r}")

        def ms(s: str) -> int:
            d = datetime.datetime.fromisoformat(s.replace("Z", "+00:00"))
            if d.tzinfo is None:
                d = d.replace(tzinfo=datetime.timezone.utc)
            return int(d.timestamp() * 1000)

        lo_s, hi_s = interval.split("/")
        lo, hi = ms(lo_s), ms(hi_s)
        dirs = find_segment_dirs(root)
        metas = load_plan_meta(root, dirs)
        killed = [
            d for d in dirs
            if lo <= metas[d]["start"] and metas[d]["end"] <= hi
        ]
        for d in killed:
            shutil.rmtree(d, ignore_errors=True)
        # the planning manifest self-heals (load_plan_meta reconciles
        # removed entries), so it is NOT unlinked — deleting it would
        # force an O(N) segment re-open on the next planning pass
        try:
            remaining = find_segment_dirs(root)
        except Exception:  # an emptied root raises, not []
            remaining = []
        if remaining:
            self._register_datasource_root(ds)
        else:
            with self._lock:
                tables = dict(self.tables)
                tables.pop(ds, None)
                self.tables = tables
                roots = dict(self._segment_roots)
                roots.pop(ds, None)
                self._segment_roots = roots
                digests = dict(self._root_digests)
                digests.pop(ds, None)
                self._root_digests = digests
                self.spark.catalog.dropTempView(ds)
                unused_map = dict(self._unused)
                unused_map.pop(ds, None)
                self._unused = unused_map
                self._manual_unused.pop(ds, None)
                self._refresh_sys_segments()
                self._refresh_sys_datasources()
                self._register_information_schema()
        return len(killed)

    # -- retention rules (rule-configuration.md) --------------------------
    def _retention_unused(self, ds: str, root: str) -> frozenset[str]:
        """Segment-dir basenames the current rule chains + manual marks
        drop for this datasource. Metadata-plane only (one manifest
        read); the no-rules/default-loadForever fast path skips even
        that, so datasources that never touch retention pay nothing."""
        import time

        from .retention import DEFAULT_RULES, unused_segments
        from .sources.datasource import find_segment_dirs, load_plan_meta

        with self._lock:
            rules = list(self._rules.get(ds) or ())
            default = list(self._default_rules)
            manual = self._manual_unused.get(ds) or frozenset()
        if not rules and not manual and default == list(DEFAULT_RULES):
            return frozenset()
        try:
            dirs = find_segment_dirs(root)
        except ValueError:  # empty root: nothing to drop
            return frozenset(manual)
        metas = load_plan_meta(root, dirs)
        now_ms = int(time.time() * 1000)
        dropped = unused_segments(rules, default, metas, now_ms)
        return frozenset(dropped) | manual

    def _get_rules(self, ds: str | None = None, full: bool = False):
        """GET /druid/coordinator/v1/rules[/{ds}[?full]] — the full
        rules map, or one datasource's chain (?full appends the
        cluster default chain, as the real coordinator does)."""
        with self._lock:
            if ds is None:
                out = {n: list(c) for n, c in self._rules.items()}
                out["_default"] = list(self._default_rules)
                return out
            if ds == "_default":
                return list(self._default_rules)
            chain = list(self._rules.get(ds) or ())
            if full:
                chain += list(self._default_rules)
            return chain

    def _set_rules(self, ds: str, rules: list[dict]) -> None:
        """POST /druid/coordinator/v1/rules/{ds} — validate, install,
        and apply immediately: affected roots re-register with the new
        exclusion set (real Druid converges on the next coordinator
        run; this synchronous coordinator applies in-line so the next
        query already serves the new rule state)."""
        import datetime as _dtm

        from .retention import validate_rules

        validate_rules(rules)
        audit = {
            "key": ds,
            "type": "rules",
            "auditInfo": {"author": "", "comment": ""},
            "payload": json.dumps(rules, sort_keys=True),
            "auditTime": _dtm.datetime.now(
                _dtm.timezone.utc
            ).isoformat(),
        }
        with self._lock:
            if ds == "_default":
                self._default_rules = list(rules)
                affected = list(self._segment_roots)
            else:
                rmap = dict(self._rules)
                if rules:
                    rmap[ds] = list(rules)
                else:
                    rmap.pop(ds, None)
                self._rules = rmap
                affected = [ds] if ds in self._segment_roots else []
            self._rules_history = self._rules_history + [audit]
            has_period = any(
                "Period" in r.get("type", "") for r in rules
            )
        for name in affected:
            self._register_datasource_root(name)
        # epoch bumps AFTER registration: a query racing the window
        # between rule install and the re-registered relation executes
        # against the OLD relation — caching that result under the old
        # epoch is correct; caching it under the new epoch would serve
        # pre-flip rows forever
        with self._lock:
            self._retention_epoch += 1
        self._persist_rules()
        if has_period:
            # period rules drift with wall-clock — the duty cycle must
            # re-evaluate them even with no compaction config submitted
            self._ensure_duty_thread()

    def _mark_segments(self, ds: str, body: dict, used: bool) -> int:
        """POST /druid/coordinator/v1/datasources/{ds}/markUnused (or
        markUsed) — manual segment lifecycle (api-reference.md): body
        carries ``{"interval": "start/end"}`` (containment rule, like
        kill) or ``{"segmentIds": [...]}`` (segment-dir basenames).
        markUsed clears manual marks; it cannot resurrect a segment a
        drop RULE excludes (rules re-apply on registration), exactly
        like real Druid. Returns the number of marks changed."""
        import os

        from .retention import interval_ms
        from .sources.datasource import find_segment_dirs, load_plan_meta

        root = self._segment_roots.get(ds)
        if root is None:
            raise ValueError(f"unknown datasource {ds!r}")
        if "interval" in body:
            lo, hi = interval_ms(body["interval"])
            dirs = find_segment_dirs(root)
            metas = load_plan_meta(root, dirs)
            targets = {
                os.path.basename(d)
                for d in dirs
                if lo <= metas[d]["start"] and metas[d]["end"] <= hi
            }
        elif "segmentIds" in body:
            targets = {str(s) for s in body["segmentIds"]}
        else:
            raise ValueError(
                "markUnused/markUsed requires 'interval' or 'segmentIds'"
            )
        with self._lock:
            manual = dict(self._manual_unused)
            cur = set(manual.get(ds) or ())
            before = len(cur)
            cur = (cur | targets) if not used else (cur - targets)
            changed = abs(len(cur) - before)
            if cur:
                manual[ds] = frozenset(cur)
            else:
                manual.pop(ds, None)
            self._manual_unused = manual
        self._register_datasource_root(ds)
        with self._lock:  # after registration — see _set_rules
            self._retention_epoch += 1
        self._persist_rules()
        return changed

    def _handle_sql_ingest(self, body: dict) -> dict:
        """POST /druid/v2/sql/task — Druid's SQL-based (MSQ) ingestion
        (sql-ingestion.md): ``INSERT INTO ds SELECT ... PARTITIONED BY
        <grain>`` appends version-tagged segments; ``REPLACE INTO ds
        OVERWRITE ALL SELECT ... PARTITIONED BY <grain>`` swaps the
        datasource's contents. ``CLUSTERED BY cols`` orders rows inside
        each segment (after __time, Druid's layout). Runs synchronously
        on Spark — the returned task is already terminal, and it shows
        up in sys.tasks and /druid/indexer/v1/task/{id}/status like any
        overlord task. The SELECT must produce a __time column."""
        import datetime
        import os
        import shutil
        import time

        sql_text = body.get("query", "")
        # classify on the comment-stripped head (Calcite accepts
        # leading comments and parenthesized SELECTs on this endpoint)
        stripped = _strip_sql_head(sql_text)
        m = _INGEST_SQL_RE.match(stripped)
        if m is None:
            head = stripped[:7].upper()
            if head.startswith(("SELECT", "WITH", "(")):
                # the MSQ task engine also runs SELECT queries
                # (sql-ingestion.md): rows land in the
                # query_controller task's report, not in segments —
                # and need no deep storage, so dispatch before the
                # ingestion-enabled check
                return self._run_select_task(sql_text, body)
            raise ValueError(
                "sql/task accepts INSERT INTO <ds> SELECT ... "
                "PARTITIONED BY <grain> [CLUSTERED BY cols], "
                "REPLACE INTO <ds> OVERWRITE ALL SELECT ..., or a "
                "SELECT query (results via the task reports endpoint)"
            )
        if self.deep_storage is None:
            raise ValueError(
                "SQL ingestion disabled: broker started without "
                "deep_storage"
            )
        verb = m.group("verb").upper()
        ds = m.group("ds")
        overwrite = m.group("overwrite") is not None
        if verb == "REPLACE" and not overwrite:
            raise ValueError("REPLACE requires OVERWRITE ALL")
        if verb == "INSERT" and overwrite:
            raise ValueError("INSERT cannot OVERWRITE; use REPLACE")
        grain = " ".join(m.group("grain").strip("'\"").upper().split())
        period = _PARTITIONED_BY.get(grain, grain if grain.startswith("P") else None)
        if period is None:
            raise ValueError(
                f"unsupported PARTITIONED BY {m.group('grain')!r}"
            )
        # pre-flight the period BEFORE any storage is touched: a bogus
        # 'PFOO' must be a clean 400, not a failure deep in the writer
        if period != "ALL":
            from .functions.druid_sql import parse_period

            parse_period(period)
        cluster = [
            c.strip().strip('"')
            for c in (m.group("cluster") or "").split(",")
            if c.strip()
        ]
        args = _bind_params(body)
        df = self.spark.sql(
            _rewrite_system_tables(self._resolve_extern(m.group("select"))),
            args=args,
        )
        if "__time" not in df.columns:
            raise ValueError(
                "INSERT/REPLACE queries must provide a __time column"
            )
        missing = [c for c in cluster if c not in df.columns]
        if missing:
            raise ValueError(f"CLUSTERED BY columns not in SELECT: {missing}")
        from .sources.ingest import write_druid_segments

        with self._lock:
            self._task_seq += 1
            task_seq = self._task_seq  # version tag: race-free snapshot
            task_id = f"query_controller_{ds}_{task_seq}"
        created = datetime.datetime.now(datetime.timezone.utc).isoformat()
        root = os.path.join(self.deep_storage, ds)
        t0 = time.monotonic()
        try:
            if verb == "REPLACE":
                # atomic swap: write the NEW segments to a staging dir
                # while the old root keeps serving (a self-referential
                # REPLACE ... SELECT FROM ds reads it during the write),
                # then swap. A failed write leaves the old data intact.
                staging = f"{root}.staging.{task_seq}"
                shutil.rmtree(staging, ignore_errors=True)
                try:
                    write_druid_segments(
                        df, staging, granularity=period,
                        sort_by=cluster or None,
                    ).collect()
                    shutil.rmtree(root, ignore_errors=True)
                    os.rename(staging, root)
                finally:
                    shutil.rmtree(staging, ignore_errors=True)
            else:
                write_druid_segments(
                    df,
                    root,
                    granularity=period,
                    sort_by=cluster or None,
                    # INSERT appends: version-tag by task so repeated
                    # inserts into one interval never collide
                    version=f"t{task_seq}",
                ).collect()
            self._register_datasource_root(ds)
            status = {
                "id": task_id, "status": "SUCCESS", "dataSource": ds,
                "type": "query_controller", "createdTime": created,
                "duration": int((time.monotonic() - t0) * 1000),
                "errorMsg": None,
            }
        except Exception as e:
            status = {
                "id": task_id, "status": "FAILED", "dataSource": ds,
                "type": "query_controller", "createdTime": created,
                "duration": int((time.monotonic() - t0) * 1000),
                "errorMsg": str(e)[:2000],
            }
        self._record_task(
            status, {"type": "query_controller", "sqlQuery": sql_text}
        )
        if status["status"] == "FAILED":
            raise ValueError(status["errorMsg"])
        return {"taskId": task_id, "state": "SUCCESS"}

    def _resolve_extern(self, sql: str) -> str:
        """Rewrite every ``TABLE(EXTERN('<inputSource>', '<inputFormat>',
        '<signature>'))`` call (MSQ's external-input form,
        sql-ingestion.md) into a registered temp view reading that
        input through the ingestion reader, with the signature's columns
        cast to their declared types (absent columns surface as typed
        NULLs, matching MSQ)."""
        import hashlib

        from pyspark.sql import functions as F

        from .ingestion_spec import _read_input

        types = {"string": "string", "long": "long", "double": "double",
                 "float": "float", "bigint": "long"}

        def replace(m: re.Match) -> str:
            src = json.loads(m.group("src").replace("''", "'"))
            fmt = json.loads(m.group("fmt").replace("''", "'"))
            sig = json.loads(m.group("sig").replace("''", "'"))
            df = _read_input(
                self.spark, {"inputSource": src, "inputFormat": fmt}
            )
            cols = []
            for c in sig:
                name = c["name"]
                t = types.get(str(c.get("type", "string")).lower(),
                              "string")
                cols.append(
                    (df[name] if name in df.columns
                     else F.lit(None)).cast(t).alias(name)
                )
            view = "ddbs_extern_" + hashlib.md5(
                m.group(0).encode()
            ).hexdigest()[:12]
            df.select(*cols).createOrReplaceTempView(view)
            return view

        return _EXTERN_RE.sub(replace, sql)

    def _record_task(
        self, status: dict, payload: dict | None = None
    ) -> None:
        """Store a terminal task status (atomic map rebind) — the one
        bookkeeping path for batch, kill, and SQL ingestion tasks.
        ``payload`` retains the submitted body for
        GET /druid/indexer/v1/task/{id}.

        Bounded like _task_reports/_task_payloads: SELECT on
        /druid/v2/sql/task makes task recording a PER-QUERY path, so an
        unbounded status map would grow a long-lived broker's driver
        memory without limit (real Druid expires terminal statuses
        via druid.indexer.storage.recentlyFinishedThreshold — same
        idea, count-bounded here). The sys.tasks VIEW is NOT rebuilt
        here: every SQL entry point refreshes it lazily on reference
        (_reclaim_meta_views), so recording stays O(1) instead of
        paying a createDataFrame over all retained tasks per query."""
        with self._lock:
            tasks = dict(self._tasks)
            tasks[status["id"]] = status
            while len(tasks) > self._max_tasks:  # newest-first retention
                tasks.pop(next(iter(tasks)))
            self._tasks = tasks
            if payload is not None:
                payloads = dict(self._task_payloads)
                payloads[status["id"]] = payload
                # same bounded-retention hygiene as _task_reports
                # (payloads are small; the bound is generous)
                while len(payloads) > 512:
                    payloads.pop(next(iter(payloads)))
                self._task_payloads = payloads

    def _run_select_task(self, sql: str, body: dict) -> dict:
        """SELECT on POST /druid/v2/sql/task (sql-ingestion.md: the MSQ
        task engine runs SELECT queries too — including over
        ``TABLE(EXTERN(...))`` — landing rows in the query_controller
        task's report instead of segments). Synchronous like this
        overlord's other tasks; the result set passes the max_rows
        gate before being retained, then serves from
        ``GET /druid/indexer/v1/task/{id}/reports``."""
        import datetime
        import time

        args = _bind_params(body)
        with self._lock:
            self._task_seq += 1
            task_id = f"query_controller_select_{self._task_seq}"
        created = datetime.datetime.now(datetime.timezone.utc).isoformat()
        # sys.tasks wants a datasource; a SELECT task's natural one is
        # the first registered table the query READS — identifiers
        # following FROM/JOIN, in appearance order, so a column that
        # happens to share another table's name can't steal the
        # attribution. Word-match is the fallback (subqueries through
        # odd quoting), blank for pure-EXTERN.
        from .functions.druid_sql import _sql_code_mask

        mask = _sql_code_mask(sql)
        scrubbed = "".join(
            c if mask[i] else " " for i, c in enumerate(sql)
        )
        read = [
            t for _, t in re.findall(
                r'\b(?:FROM|JOIN)\s+("?)([A-Za-z_][A-Za-z0-9_]*)\1',
                scrubbed, re.IGNORECASE,
            )
        ]
        ds = next(
            (t for t in read if t in self.tables),
            next(
                (t for t in sorted(self.tables)
                 if _word_in_sql(t, sql)), "",
            ),
        )
        t0 = time.monotonic()
        try:
            fields, rows = self._avatica_run_sql(
                self._resolve_extern(sql), args
            )
            status = {
                "id": task_id, "status": "SUCCESS", "dataSource": ds,
                "type": "query_controller", "createdTime": created,
                "duration": int((time.monotonic() - t0) * 1000),
                "errorMsg": None,
            }
            sig = [
                {
                    "name": f.name,
                    "type": _druid_types(f.dataType)[0],
                }
                for f in fields
            ]
            data = [[_json_safe(v) for v in r] for r in rows]
            with self._lock:
                reports = dict(self._task_reports)
                reports[task_id] = (sig, data)
                # bounded retention: unlike statements (which have a
                # DELETE), task reports have no eviction API, so a
                # long-lived broker serving periodic SELECT tasks
                # would grow until OOM — keep the newest 64 result
                # sets (each already bounded by max_rows); evicted
                # tasks keep status/payload, only rows age out
                while len(reports) > 64:
                    reports.pop(next(iter(reports)))
                self._task_reports = reports
        except Exception as e:
            status = {
                "id": task_id, "status": "FAILED", "dataSource": ds,
                "type": "query_controller", "createdTime": created,
                "duration": int((time.monotonic() - t0) * 1000),
                "errorMsg": str(e)[:2000],
            }
        self._record_task(
            status, {"type": "query_controller", "sqlQuery": sql}
        )
        if status["status"] == "FAILED":
            raise ValueError(status["errorMsg"])
        return {"taskId": task_id, "state": "SUCCESS"}

    def _task_report(self, task_id: str) -> dict | None:
        """GET /druid/indexer/v1/task/{id}/reports — the MSQ
        ``multiStageQuery`` report envelope (api-reference.md tasks;
        msq-concepts.md report shape): a status payload for every
        recorded task, plus ``results`` (signature + row arrays) for
        SELECT tasks whose rows this broker retained."""
        with self._lock:
            st = self._tasks.get(task_id)
            rep = self._task_reports.get(task_id)
        if st is None:
            return None
        payload: dict = {
            "status": {
                "status": st["status"],
                "startTime": st.get("createdTime"),
                "durationMs": st.get("duration"),
            }
        }
        if st.get("errorMsg"):
            payload["status"]["errorReport"] = {
                "taskId": task_id,
                "error": {
                    "errorCode": "UnknownError",
                    "errorMessage": st["errorMsg"],
                },
            }
        if rep is not None:
            sig, rows = rep
            payload["results"] = {"signature": sig, "results": rows}
        return {
            "multiStageQuery": {
                "type": "multiStageQuery",
                "taskId": task_id,
                "payload": payload,
            }
        }

    def _render_sql(self, body: dict) -> tuple[bytes, str]:
        """Run a SQL body; return (payload bytes, content type).

        Serves every documented resultFormat of Druid's SQL API
        (api-reference.md): object (default), array, objectLines,
        arrayLines, csv — plus ``header: true``, which prepends the
        column-name row in the format's own shape, and
        ``typesHeader``/``sqlTypesHeader`` type rows. Line formats end
        with a blank line (Druid's completion marker) and csv quotes
        per RFC 4180 with NULL as the empty field. ``EXPLAIN PLAN
        FOR <query>`` answers Druid's plan-introspection shape
        (PLAN/RESOURCES/ATTRIBUTES) with the engine's physical plan.
        """
        fmt = body.get("resultFormat", "object")
        if fmt not in (
            "object", "array", "objectLines", "arrayLines", "csv"
        ):
            raise ValueError(f"unsupported resultFormat {fmt!r}")
        args = _bind_params(body)
        sql = _rewrite_system_tables(body["query"])
        m = _EXPLAIN_RE.match(sql)
        if m:
            from .plans import formatted_plan

            df = self.spark.sql(sql[m.end():], args=args)
            cols = ["PLAN", "RESOURCES", "ATTRIBUTES"]
            vals = [[
                formatted_plan(df),
                json.dumps([
                    {"name": t, "type": "DATASOURCE"}
                    for t in sorted(self.tables)
                    if _word_in_sql(t, sql)
                ]),
                json.dumps({"statementType": "SELECT"}),
            ]]
            types = [("STRING", "VARCHAR")] * 3
        else:
            df = self.spark.sql(sql, args=args)
            cols = df.columns
            # positional materialization: duplicate output column names
            # (SELECT a AS x, b AS x) must survive into the array-shaped
            # formats; only JSON objects inherently collapse them
            # collect max_rows+1: a result that exceeds the cap errors
            # (Druid's resource-limit posture), never silently truncates
            collected = df.limit(self.max_rows + 1).collect()
            if len(collected) > self.max_rows:
                raise _ResourceLimitExceeded(
                    f"result exceeds maxRows limit of {self.max_rows}; "
                    f"add a LIMIT or raise the broker's max_rows"
                )
            vals = [[_json_safe(v) for v in row] for row in collected]
            types = [_druid_types(f.dataType) for f in df.schema.fields]
        rows = [dict(zip(cols, r)) for r in vals]
        header = bool(body.get("header", False))
        want_t = header and bool(body.get("typesHeader", False))
        want_s = header and bool(body.get("sqlTypesHeader", False))

        if fmt in ("object", "objectLines"):
            # object-shaped header: one row mapping name -> null, or to
            # a {type, sqlType} object when type headers are requested
            head_obj: dict[str, Any] = {}
            for c, (dt, st) in zip(cols, types):
                v: Any = None
                if want_t or want_s:
                    v = {}
                    if want_t:
                        v["type"] = dt
                    if want_s:
                        v["sqlType"] = st
                head_obj[c] = v
            out: list[Any] = ([head_obj] if header else []) + rows
        else:
            head_rows: list[list[Any]] = [cols] if header else []
            if want_t:
                head_rows.append([t for t, _ in types])
            if want_s:
                head_rows.append([s for _, s in types])
            out = head_rows + vals

        if fmt in ("object", "array"):
            return json.dumps(out).encode(), "application/json"
        if fmt == "csv":
            import csv
            import io

            buf = io.StringIO()
            w = csv.writer(buf, lineterminator="\r\n")
            for row in out:
                w.writerow([
                    "" if v is None
                    # Druid csv: lowercase booleans, JSON-encoded
                    # arrays/objects (bool checked first — it IS an int)
                    else ("true" if v else "false")
                    if isinstance(v, bool)
                    else json.dumps(v) if isinstance(v, (list, dict))
                    else v
                    for v in row
                ])
            buf.write("\r\n")
            return buf.getvalue().encode(), "text/csv"
        # objectLines / arrayLines: NDJSON + trailing blank line
        lines = "".join(json.dumps(r) + "\n" for r in out) + "\n"
        return lines.encode(), "text/plain"

    # -- async SQL statements (sql-api.md "SQL statements") ---------------
    def _statement_submit(self, body: dict) -> dict:
        """POST /druid/v2/sql/statements: run the SQL asynchronously
        and return immediately with a queryId + state — Druid's async
        (MSQ task) query surface. The statement executes on a daemon
        thread under its own Spark job group so DELETE can cancel it
        without touching other queries; results are retained on the
        broker (bounded by max_rows) until the process ends, which is
        the durable-results subset this single-process engine can
        honor."""
        import datetime as _dtm

        sql = body.get("query")
        if not sql:
            raise ValueError("statements submission requires 'query'")
        with self._lock:
            self._task_seq += 1
            sid = f"query-{self._task_seq}"
            gid = f"ddbs-stmt-{sid}"
            st = {
                "queryId": sid,
                "state": "RUNNING",
                "createdAt": _dtm.datetime.now(
                    _dtm.timezone.utc
                ).isoformat(),
                "sql": sql,
                "gid": gid,
            }
            stmts = dict(getattr(self, "_sql_statements", {}))
            stmts[sid] = st
            self._sql_statements = stmts

        args = _bind_params(body)

        def run() -> None:
            import time as _time

            t0 = _time.perf_counter()
            sc = self.spark.sparkContext
            sc.setJobGroup(gid, f"sql statement {sid}",
                           interruptOnCancel=True)
            try:
                # SELECT over external data is an MSQ-engine feature
                # and the statements API is its documented home
                # (sql-ingestion.md: EXTERN in SELECT runs on sql/task
                # or sql/statements, never interactive /druid/v2/sql)
                # — resolve TABLE(EXTERN(...)) here like sql/task does
                fields, rows = self._avatica_run_sql(
                    self._resolve_extern(sql), args
                )
                with self._lock:
                    if st["state"] == "RUNNING":
                        st["state"] = "SUCCESS"
                        st["fields"] = fields
                        st["rows"] = [
                            [_json_safe(v) for v in r] for r in rows
                        ]
                        st["durationMs"] = int(
                            (_time.perf_counter() - t0) * 1000
                        )
            except Exception as e:
                with self._lock:
                    if st["state"] == "RUNNING":
                        st["state"] = "FAILED"
                        st["errorMessage"] = str(e)[:2000]
            finally:
                try:
                    sc._jsc.clearJobGroup()
                except Exception:
                    pass

        threading.Thread(target=run, daemon=True,
                         name=f"stmt-{sid}").start()
        return {"queryId": sid, "state": "RUNNING",
                "createdAt": st["createdAt"]}

    def _statement_status(self, sid: str) -> dict | None:
        """GET /druid/v2/sql/statements/{id}: the documented
        SqlStatementResult subset (queryId/state/createdAt/durationMs,
        per-column schema, a one-page result descriptor on SUCCESS,
        errorDetails on FAILED)."""
        with self._lock:
            st = getattr(self, "_sql_statements", {}).get(sid)
            if st is None:
                return None
            out = {
                "queryId": st["queryId"],
                "state": st["state"],
                "createdAt": st["createdAt"],
            }
            if st["state"] == "SUCCESS":
                out["durationMs"] = st.get("durationMs", 0)
                out["schema"] = [
                    {
                        "name": f.name,
                        "type": _druid_types(f.dataType)[1],
                        "nativeType": _druid_types(f.dataType)[0],
                    }
                    for f in st.get("fields", [])
                ]
                n = len(st.get("rows", []))
                out["result"] = {
                    "numTotalRows": n,
                    "pages": [{"id": 0, "numRows": n}],
                }
            if st["state"] == "FAILED":
                out["errorDetails"] = {
                    "error": "druidException",
                    "errorMessage": st.get("errorMessage", ""),
                }
            return out

    def _statement_results(self, sid: str, page: int = 0):
        """GET /druid/v2/sql/statements/{id}/results[?page=] — rows as
        a JSON array of objects (the default resultFormat). Results
        exist only for SUCCESS; asking earlier or for a page that
        doesn't exist is the client's error."""
        with self._lock:
            st = getattr(self, "_sql_statements", {}).get(sid)
            if st is None:
                return None
            if st["state"] != "SUCCESS":
                raise ValueError(
                    f"statement {sid} is {st['state']}; results exist "
                    "only for SUCCESS"
                )
            if page != 0:
                raise ValueError(f"no page {page}; result has one page")
            cols = [f.name for f in st.get("fields", [])]
            return [dict(zip(cols, r)) for r in st.get("rows", [])]

    def _statement_delete(self, sid: str) -> bool:
        """DELETE /druid/v2/sql/statements/{id}: cancel a RUNNING
        statement's job group (finished ones just acknowledge)."""
        with self._lock:
            st = getattr(self, "_sql_statements", {}).get(sid)
            if st is None:
                return False
            if st["state"] == "RUNNING":
                st["state"] = "CANCELED"
                gid = st["gid"]
            else:
                gid = None
        if gid is not None:
            try:
                self.spark.sparkContext.cancelJobGroup(gid)
            except Exception:
                pass
        return True

    def cancel_sql_query(self, sql_query_id: str) -> bool:
        """DELETE /druid/v2/sql/{sqlQueryId} (sql-api.md): cancel the
        RUNNING query that was submitted with this context.sqlQueryId.
        Cancels the query's Spark job group; unknown/finished ids are
        404 like real Druid. Returns whether a live query was found."""
        with self._lock:
            gid = self._sql_cancel.get(sql_query_id)
            if gid is None:
                return False
            self._sql_cancelled.add(sql_query_id)
        sc = self.spark.sparkContext
        sc.cancelJobGroup(gid)

        # cancelJobGroup only kills jobs ALREADY running in the group;
        # a cancel landing between the query's registration and its
        # first Spark job (or between two jobs of one query) would be
        # lost. Re-cancel on a short cadence until the handler thread
        # deregisters the id — DELETE still returns immediately, like
        # real Druid.
        def _sticky() -> None:
            import time as _time

            for _ in range(600):  # bounded: 60 s of coverage
                with self._lock:
                    if self._sql_cancel.get(sql_query_id) != gid:
                        return
                try:
                    sc.cancelJobGroup(gid)
                except Exception:  # pragma: no cover - sc shut down
                    return
                _time.sleep(0.1)

        threading.Thread(target=_sticky, daemon=True).start()
        return True

    def _run_with_timeout(self, fn, timeout_ms, sql_query_id=None):
        """Run ``fn`` under a cancellable Spark job group, cancelled
        after ``timeout_ms`` (Druid's ``context.timeout``). Each HTTP
        request runs in its own handler thread and job groups are
        thread-local, so concurrent queries cancel independently —
        the serving posture a broker needs: one runaway query must not
        be able to hold the endpoint.

        Bounds Spark JOB time: driver-side planning and JSON
        serialization are not cancellable and run to completion. A
        genuine failure racing the timer within its firing window is
        reported as a timeout; the original exception stays chained
        for diagnosis."""
        if not timeout_ms and sql_query_id is None:
            return fn()
        sc = self.spark.sparkContext
        with self._lock:
            self._task_seq += 1
            gid = f"ddbs-broker-q{self._task_seq}"
            if sql_query_id is not None:
                self._sql_cancel[sql_query_id] = gid
                self._sql_cancelled.discard(sql_query_id)
        sc.setJobGroup(gid, "broker query", interruptOnCancel=True)
        fired = threading.Event()

        def cancel() -> None:
            fired.set()
            sc.cancelJobGroup(gid)

        timer = None
        if timeout_ms:
            timer = threading.Timer(int(timeout_ms) / 1000.0, cancel)
            timer.start()
        try:
            return fn()
        except Exception as e:
            if fired.is_set():
                raise _QueryTimeout(
                    f"Query timed out after {timeout_ms} ms"
                ) from e
            with self._lock:
                was_cancelled = sql_query_id in self._sql_cancelled
            if was_cancelled:
                raise _QueryCancelled(
                    f"Query cancelled: {sql_query_id}"
                ) from e
            raise
        finally:
            if sql_query_id is not None:
                with self._lock:
                    self._sql_cancel.pop(sql_query_id, None)
                    self._sql_cancelled.discard(sql_query_id)
            if timer is not None:
                timer.cancel()
            try:
                sc._jsc.clearJobGroup()
            except Exception:  # pragma: no cover - JVM API drift
                pass

    def _handle_task(self, body: dict) -> dict:
        """POST /druid/indexer/v1/task — the overlord's task-submission
        endpoint (api-reference.md). index_parallel and compact task
        JSON executes synchronously on Spark (segments land under
        ``deep_storage/<dataSource>``); on success the datasource
        (re)registers for querying and sys.segments refreshes, so the
        Druid workflow — submit task, poll status, query — works
        end-to-end against one process. Druid returns the id before
        running; a synchronous shim returns it after, and the status
        endpoint reports the terminal state either way."""
        if self.deep_storage is None:
            raise ValueError(
                "task submission disabled: broker started without "
                "deep_storage"
            )
        from .ingestion_spec import ingest

        inner = body.get("spec", body)
        ds = (
            (inner.get("dataSchema") or {}).get("dataSource")
            or body.get("dataSource")
        )
        if not ds:
            raise ValueError("task has no dataSource")
        with self._lock:
            self._task_seq += 1
            task_id = f"{body.get('type', 'index_parallel')}_{ds}_{self._task_seq}"
        import datetime
        import time

        created = datetime.datetime.now(datetime.timezone.utc).isoformat()
        # a compact task WRITES to dstDataSource (default
        # <dataSource>_compacted) — that destination, not the untouched
        # source root, is what must register for querying
        reg_ds = (
            body.get("dstDataSource", f"{ds}_compacted")
            if body.get("type") == "compact" else ds
        )
        t0 = time.monotonic()
        try:
            if body.get("type") == "kill":
                n = self._kill_task(ds, body["interval"])
                self._record_task({
                    "id": task_id, "status": "SUCCESS", "dataSource": ds,
                    "type": "kill", "createdTime": created,
                    "duration": int((time.monotonic() - t0) * 1000),
                    "errorMsg": None, "numSegmentsKilled": n,
                }, payload=body)
                return {"task": task_id}
            manifest = ingest(self.spark, body, self.deep_storage).collect()
            self._register_datasource_root(reg_ds)
            status = {
                "id": task_id, "status": "SUCCESS", "dataSource": reg_ds,
                "type": body.get("type", "index_parallel"),
                "createdTime": created,
                "duration": int((time.monotonic() - t0) * 1000),
                "segments": len(manifest), "errorMsg": None,
            }
        except Exception as e:
            status = {
                "id": task_id, "status": "FAILED", "dataSource": ds,
                "type": body.get("type", "index_parallel"),
                "createdTime": created,
                "duration": int((time.monotonic() - t0) * 1000),
                "segments": 0, "errorMsg": str(e)[:2000],
            }
        self._record_task(status, payload=body)
        return {"task": task_id}

    def _register_datasource_root(
        self, ds: str, digest: str | None = None
    ) -> None:
        """(Re)register a segment root for querying: table map, temp
        view, sys views, INFORMATION_SCHEMA — under the lock, by atomic
        dict rebind (concurrent readers see old or new map, never one
        mid-mutation). The handoff-then-serve moment for the overlord
        task path and streaming supervisors, and the refresh point when
        a root's segment state moves under an already-registered
        datasource (_ensure_fresh_roots). The recorded digest pins WHICH
        state this registration serves."""
        import os

        from .sources import register_druid_datasource

        root = self._segment_roots.get(ds) or os.path.join(
            self.deep_storage, ds
        )
        register_druid_datasource(self.spark)
        # retention: drop-rule / markUnused segments are excluded in
        # the relation's OPTIONS (relation identity), so every query
        # path — SQL, native, sys-free scans — serves the same set
        unused = self._retention_unused(ds, root)
        reader = (
            self.spark.read.format("druidsegment").option("path", root)
        )
        if unused:
            reader = reader.option(
                "exclude_segments", json.dumps(sorted(unused))
            )
        df = reader.load()
        if digest is None:
            digest = _segment_state_digest(root)
        with self._lock:
            tables = dict(self.tables)
            tables[ds] = df
            self.tables = tables
            roots = dict(self._segment_roots)
            roots[ds] = root
            self._segment_roots = roots
            digests = dict(self._root_digests)
            if digest is not None:
                digests[ds] = digest
            self._root_digests = digests
            unused_map = dict(self._unused)
            if unused:
                unused_map[ds] = unused
            else:
                unused_map.pop(ds, None)
            self._unused = unused_map
            df.createOrReplaceTempView(ds)
            self._refresh_sys_segments()
            self._refresh_sys_datasources()
            self._register_information_schema()

    def _handle_supervisor_submit(self, body: dict) -> dict:
        """POST /druid/indexer/v1/supervisor (supervisor-api.md): start
        (or replace, Druid's resubmit semantics) a streaming ingestion
        supervisor; every segment handoff auto-registers the datasource
        for querying. Returns ``{"id": ...}`` like the real overlord."""
        if self.deep_storage is None:
            raise ValueError(
                "supervisor submission disabled: broker started "
                "without deep_storage"
            )
        from .streaming.supervisor import StreamingSupervisor

        sup = StreamingSupervisor(
            self.spark, body, self.deep_storage,
            on_handoff=self._register_datasource_root,
        )
        # the whole replace sequence is serialized: two concurrent
        # resubmits of one id would otherwise both terminate the same
        # prev and start two streams sharing a checkpoint dir (one of
        # them leaking untracked)
        with self._submit_lock:
            with self._lock:
                prev = self._supervisors.get(sup.id)
            if prev is not None:
                prev.terminate()
            sup.start()
            import datetime as _dt

            with self._lock:
                sups = dict(self._supervisors)
                sups[sup.id] = sup
                self._supervisors = sups
                hist = list(self._supervisor_history.get(sup.id, []))
                hist.append({
                    "spec": body,
                    "version": _dt.datetime.now(
                        _dt.timezone.utc
                    ).isoformat(),
                })
                self._supervisor_history[sup.id] = hist
                self._refresh_sys_supervisors()
        return {"id": sup.id}

    def _supervisor_action(self, sup_id: str, action: str) -> dict | None:
        with self._lock:
            sup = self._supervisors.get(sup_id)
        if sup is None:
            return None
        if action == "status":
            import datetime

            return {
                "id": sup_id,
                "generationTime": datetime.datetime.now(
                    datetime.timezone.utc
                ).isoformat(),
                "payload": sup.status(),
            }
        if action == "stats":
            return sup.stats()
        if action == "terminate":
            sup.terminate()
        elif action == "suspend":
            sup.suspend()
        elif action == "resume":
            sup.resume()
        elif action == "reset":
            sup.reset()
        else:
            return None
        with self._lock:
            self._refresh_sys_supervisors()
        return {"id": sup_id}

    def _task_status(self, task_id: str) -> dict | None:
        with self._lock:
            st = self._tasks.get(task_id)
        return {"task": task_id, "status": st} if st else None

    def _task_payload(self, task_id: str) -> dict | None:
        """GET /druid/indexer/v1/task/{id} (api-reference.md tasks):
        the submitted task body, under Druid's {task, payload}
        envelope — the console's payload tab. Tasks recorded before
        payload retention (or synthesized internally) fall back to a
        minimal body built from the status row."""
        with self._lock:
            st = self._tasks.get(task_id)
            pl = self._task_payloads.get(task_id)
        if st is None:
            return None
        if pl is None:
            pl = {"id": task_id, "type": st.get("type"),
                  "dataSource": st.get("dataSource")}
        else:
            # the broker-assigned id wins over any client-supplied
            # "id" in the submitted body — payload.id must agree with
            # the envelope and the status/reports endpoints
            pl = {**pl, "id": task_id}
        return {"task": task_id, "payload": pl}

    def _task_list(
        self,
        state: str | None = None,
        datasource: str | None = None,
        task_type: str | None = None,
        max_n: int | None = None,
    ) -> list[dict] | None:
        """GET /druid/indexer/v1/tasks[?state=&datasource=&type=&max=]
        plus the /runningTasks /completeTasks /pendingTasks
        /waitingTasks aliases (api-reference.md tasks section; the
        Druid console's task view polls these). Tasks on this
        synchronous overlord are terminal the moment they are
        recorded, so running/pending/waiting are truthfully empty and
        ``complete`` equals the full list. Rows use Druid's TaskStatusPlus
        shape; newest first; ``max`` bounds complete-task listings like
        real Druid's."""
        if state not in (None, "complete", "running", "pending",
                         "waiting"):
            raise ValueError(f"unknown task state {state!r}")
        if state in ("running", "pending", "waiting"):
            return []
        with self._lock:
            tasks = list(self._tasks.values())
        out = [
            {
                "id": t["id"],
                "groupId": t["id"],
                "type": t.get("type", "index_parallel"),
                "createdTime": t.get("createdTime"),
                "queueInsertionTime": t.get("createdTime"),
                "statusCode": t["status"],
                "status": t["status"],
                "runnerStatusCode": "NONE",
                "duration": t.get("duration"),
                "location": {"host": None, "port": -1, "tlsPort": -1},
                "dataSource": t.get("dataSource", ""),
                "errorMsg": t.get("errorMsg"),
            }
            for t in tasks
            if (datasource is None or t.get("dataSource") == datasource)
            and (task_type is None or t.get("type") == task_type)
        ]
        out.sort(key=lambda r: (r["createdTime"] or "", r["id"]),
                 reverse=True)
        # Druid convention: a negative max means unlimited
        if max_n is not None and max_n >= 0:
            out = out[:max_n]
        return out

    def _metadata_segments(
        self,
        datasources: list[str] | None = None,
        include_overshadowed: bool = False,
    ) -> list[dict]:
        """GET /druid/coordinator/v1/metadata/segments
        [?datasources=ds...][&includeOvershadowedStatus] — every USED
        segment as a metadata object (legacy-metadata-api.md), the
        tooling-facing twin of sys.segments. Served from planning
        manifests, no decodes. Truthful subset of Druid's
        SegmentMetadata: identifier, dataSource, interval, size,
        numRows, binaryVersion; ``includeOvershadowedStatus`` includes
        overshadowed segments and adds the ``overshadowed`` flag.
        Deliberate divergence: the plain listing serves the VISIBLE
        TIMELINE, i.e. real Druid's steady state after its coordinator
        duty marks overshadowed segments unused — in real Druid an
        overshadowed segment transiently stays 'used' (and listed)
        until that duty cycle runs; this engine applies overshadowing
        inline, so the transient window does not exist (clients that
        need overshadowed rows pass includeOvershadowedStatus).
        markUnused/retention-dropped segments are not used and never
        appear."""
        import os

        from .cli import _format_millis as iso
        from .sources.datasource import (
            find_segment_dirs,
            load_plan_meta,
            overshadowed_segments,
        )

        with self._lock:
            roots = dict(self._segment_roots)
            unused = dict(self._unused)
        out: list[dict] = []
        for ds in sorted(roots):
            if datasources and ds not in datasources:
                continue
            try:
                dirs = find_segment_dirs(roots[ds])
            except ValueError:
                continue  # emptied root: nothing used
            meta = load_plan_meta(roots[ds], dirs)
            dropped = unused.get(ds) or frozenset()
            shadowed = overshadowed_segments({
                d: m for d, m in meta.items()
                if os.path.basename(d) not in dropped
            })
            for d in sorted(dirs):
                m = meta.get(d)
                base = os.path.basename(d)
                if m is None or base in dropped:
                    continue
                is_sh = base in shadowed
                if is_sh and not include_overshadowed:
                    continue
                size = self._size_cache.get(d)
                if size is None:
                    size = 0
                    for b, _, files in os.walk(d):
                        for fn in files:
                            try:
                                size += os.path.getsize(
                                    os.path.join(b, fn)
                                )
                            except OSError:
                                pass
                    self._size_cache[d] = size
                start, end = iso(m["start"]), iso(m["end"])
                row = {
                    "identifier": f"{ds}_{start}_{end}_{base}",
                    "dataSource": ds,
                    "interval": f"{start}/{end}",
                    "size": size,
                    "numRows": int(m["rows"]),
                    "binaryVersion": 9,
                }
                if include_overshadowed:
                    row["overshadowed"] = is_sh
                out.append(row)
        return out

    def _query_candidates(
        self, ds: str, intervals: list[str] | None
    ) -> list[dict] | None:
        """GET /druid/v2/candidates?datasource=ds[&intervals=a/b,...]
        (api-reference.md query-server section): the segments a query
        over these intervals would touch, with their candidate
        servers — what Druid's router uses for segment-aware routing.
        Served from the planning manifest (no decodes); retention-
        unused segments are not candidates (they are not served).
        This single-process engine reports one historical location."""
        import os

        from .cli import _format_millis as iso
        from .retention import interval_ms
        from .sources.datasource import find_segment_dirs, load_plan_meta

        # parse intervals FIRST: a malformed interval is the only
        # client error here and surfaces as 400 from the handler
        windows = [interval_ms(i) for i in (intervals or [])]
        root = self._segment_roots.get(ds)
        if root is None:
            # a datasource registered as a plain DataFrame is
            # queryable but has no segments to route to — an empty
            # candidate list, not a 404 (reserve 404 for unknown names)
            return [] if ds in self.tables else None
        with self._lock:
            dropped = self._unused.get(ds) or frozenset()
        try:
            dirs = find_segment_dirs(root)
        except ValueError:
            # root emptied (e.g. all segments killed) — nothing to
            # serve, which is an empty candidate list, not an error
            return []
        metas = load_plan_meta(root, dirs)
        from .sources.datasource import overshadowed_segments

        # among USED segments only — unused-ing the newest version
        # makes the older one a candidate again (same rule the scan
        # path applies by excluding dropped dirs before overshadow)
        shadowed = overshadowed_segments({
            d: m for d, m in metas.items()
            if os.path.basename(d) not in dropped
        })
        out = []
        for d in dirs:
            base = os.path.basename(d)
            if base in dropped or base in shadowed:
                continue
            m = metas.get(d)
            if m is None:
                continue
            if windows and not any(
                m["start"] < hi and m["end"] > lo for lo, hi in windows
            ):
                continue
            size = self._size_cache.get(d)
            if size is None:
                size = 0
                for b, _, files in os.walk(d):
                    for fn in files:
                        try:
                            size += os.path.getsize(os.path.join(b, fn))
                        except OSError:
                            pass
                self._size_cache[d] = size
            out.append({
                "interval": f"{iso(m['start'])}/{iso(m['end'])}",
                "version": base,
                "partitionNumber": 0,
                "size": size,
                "locations": [{
                    "name": "historical:local",
                    "host": "localhost",
                    "type": "historical",
                    "priority": 0,
                }],
            })
        out.sort(key=lambda c: c["interval"])
        return out

    def _datasource_detail(self, name: str) -> dict:
        """GET /druid/v2/datasources/{name}: Druid's dimensions/metrics
        split, classified from the schema the way Druid's segment
        metadata does — string-ish columns are dimensions, numeric
        columns metrics, the time column neither."""
        dims, mets = [], []
        for f in self.tables[name].schema.fields:
            if f.name == self.time_col:
                continue
            s = f.dataType.simpleString()
            if s in ("string", "date") or s.startswith("array"):
                dims.append(f.name)
            else:
                mets.append(f.name)
        return {"dimensions": dims, "metrics": mets}

    def _make_handler(shim) -> type:  # noqa: N805 - handler factory
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload) -> None:
                self._send_raw(code, json.dumps(payload).encode(),
                               "application/json")

            def _send_raw(self, code: int, data: bytes,
                          ctype: str,
                          headers: dict | None = None) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                # route on the path alone: documented query params
                # (?simple, ?discover=true, ...) select detail levels
                # this shim serves uniformly, and must never 404
                path = self.path.split("?", 1)[0]
                if path == "/status/health":
                    self._send(200, True)
                elif path == "/status":
                    # the console's very first call (api-reference.md
                    # common section): process identity + memory, a
                    # truthful subset (no extension modules here; the
                    # version states what this engine is). usedMemory
                    # is the CURRENT RSS (proc statm; this container
                    # is Linux), maxMemory the peak — distinct values,
                    # so used/max headroom math stays meaningful.
                    import os as _os
                    import resource

                    peak_kb = resource.getrusage(
                        resource.RUSAGE_SELF
                    ).ru_maxrss  # KB on Linux
                    used = peak_kb * 1024
                    try:
                        with open("/proc/self/statm") as f:
                            used = int(f.read().split()[1]) * (
                                _os.sysconf("SC_PAGE_SIZE")
                            )
                    except (OSError, ValueError, IndexError):
                        pass
                    self._send(200, {
                        "version": "ddbs-spark",
                        "modules": [],
                        "memory": {
                            "maxMemory": peak_kb * 1024,
                            "usedMemory": used,
                        },
                    })
                elif path == "/status/properties":
                    # the Druid console's first probe after health;
                    # truthful subset of runtime properties
                    self._send(200, {
                        "druid.host": "localhost",
                        "druid.service": "druid/broker",
                        "druid.server.maxRows": str(shim.max_rows),
                    })
                elif path == "/druid/coordinator/v1/loadstatus":
                    # every datasource this single-process engine
                    # serves is fully loaded by construction; the
                    # console polls this for its load progress bars
                    self._send(200, {
                        ds: 100.0 for ds in sorted(shim.tables)
                    })
                elif path == "/druid/indexer/v1/tasks" or path in (
                    "/druid/indexer/v1/runningTasks",
                    "/druid/indexer/v1/completeTasks",
                    "/druid/indexer/v1/pendingTasks",
                    "/druid/indexer/v1/waitingTasks",
                ):
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query)
                    alias = path.rsplit("/", 1)[1]
                    state = {
                        "runningTasks": "running",
                        "completeTasks": "complete",
                        "pendingTasks": "pending",
                        "waitingTasks": "waiting",
                    }.get(alias, (q.get("state") or [None])[0])
                    raw_max = (q.get("max") or [None])[0]
                    try:
                        rows = shim._task_list(
                            state=state,
                            datasource=(q.get("datasource") or [None])[0],
                            task_type=(q.get("type") or [None])[0],
                            max_n=int(raw_max) if raw_max else None,
                        )
                    except ValueError as e:
                        self._send(400, {"error": "Bad request",
                                         "errorMessage": str(e)})
                        return
                    self._send(200, rows)
                elif path == "/druid/v2/candidates":
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query)
                    ds = (q.get("datasource") or [None])[0]
                    raw = ",".join(q.get("intervals") or [])
                    ivals = [i for i in raw.split(",") if i]
                    try:
                        cands = (
                            shim._query_candidates(ds, ivals or None)
                            if ds else None
                        )
                    except ValueError as e:  # malformed interval
                        self._send(400, {"error": "Bad request",
                                         "errorMessage": str(e)})
                        return
                    if cands is not None:
                        self._send(200, cands)
                    else:
                        self._send(404, {"error": "Unknown datasource",
                                         "errorMessage": str(ds)})
                elif path == "/druid/v2/datasources":
                    self._send(200, sorted(shim.tables))
                elif path.startswith("/druid/v2/datasources/"):
                    rest = path.split("/druid/v2/datasources/", 1)[1]
                    name, _, sub = rest.partition("/")
                    if name not in shim.tables:
                        self._send(404, {"error": "Unknown datasource",
                                         "errorMessage": name})
                    elif sub in ("dimensions", "metrics"):
                        # legacy per-list endpoints real clients and
                        # the console still call
                        self._send(
                            200, shim._datasource_detail(name)[sub]
                        )
                    elif sub:
                        self._send(404, {"error": "Unknown resource",
                                         "errorMessage": sub})
                    else:
                        self._send(200, shim._datasource_detail(name))
                elif path == "/druid/coordinator/v1/config/compaction":
                    with shim._lock:
                        self._send(200, {
                            "compactionConfigs": sorted(
                                shim._compaction_configs.values(),
                                key=lambda c: c["dataSource"],
                            )})
                elif path == "/druid/coordinator/v1/rules":
                    self._send(200, shim._get_rules())
                elif path == "/druid/coordinator/v1/rules/history":
                    with shim._lock:
                        self._send(200, list(shim._rules_history))
                elif path.startswith(
                    "/druid/coordinator/v1/rules/"
                ) and path.endswith("/history"):
                    ds = path.rsplit("/", 2)[1]
                    with shim._lock:
                        self._send(200, [
                            h for h in shim._rules_history
                            if h["key"] == ds
                        ])
                elif path.startswith("/druid/coordinator/v1/rules/"):
                    ds = path.rsplit("/", 1)[1]
                    _, _, qs = self.path.partition("?")
                    self._send(200, shim._get_rules(ds, full="full" in qs))
                elif path == "/druid/coordinator/v1/lookups/config":
                    self._send(200, ["__default"])
                elif path == (
                    "/druid/coordinator/v1/lookups/config/__default"
                ):
                    with shim._lock:
                        self._send(200, sorted(shim._lookups))
                elif path.startswith(
                    "/druid/coordinator/v1/lookups/config/__default/"
                ):
                    name = path.rsplit("/", 1)[1]
                    spec = shim._lookup_spec(name)
                    if spec is not None:
                        self._send(200, spec)
                    else:
                        self._send(404, {"error": "Unknown lookup",
                                         "errorMessage": name})
                elif path == "/druid/coordinator/v1/metadata/segments":
                    from urllib.parse import parse_qs, urlparse

                    # keep_blank_values: the flag is usually passed
                    # bare (?includeOvershadowedStatus); checking the
                    # parsed dict (not a substring of the raw query)
                    # keeps an unrelated parameter VALUE containing
                    # the text from flipping the listing mode
                    q = parse_qs(urlparse(self.path).query,
                                 keep_blank_values=True)
                    self._send(200, shim._metadata_segments(
                        datasources=q.get("datasources"),
                        include_overshadowed=(
                            "includeOvershadowedStatus" in q
                        ),
                    ))
                elif path == "/druid/coordinator/v1/servers":
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query,
                                 keep_blank_values=True)
                    servers, served = shim._server_inventory()
                    if "simple" in q or "full" in q:
                        # the coordinator inventory lists SEGMENT-
                        # SERVING servers (coordinator-api.md) — the
                        # one historical here; ?full adds its served
                        # segment ids
                        rows = [
                            {
                                "host": s[0], "tier": s[5],
                                "type": s[4], "priority": 0,
                                "currSize": s[6], "maxSize": s[7],
                            }
                            for s in servers if s[4] == "historical"
                        ]
                        if "full" in q:
                            for row in rows:
                                row["segments"] = sorted(
                                    sid for srv, sid in served
                                    if srv == row["host"]
                                )
                        self._send(200, rows)
                    else:
                        self._send(200, [
                            s[0] for s in servers
                            if s[4] == "historical"
                        ])
                elif path == "/druid/coordinator/v1/datasources":
                    self._send(200, sorted(shim._segment_roots))
                elif path.startswith(
                    "/druid/coordinator/v1/datasources/"
                ):
                    from urllib.parse import parse_qs, urlparse

                    rest = path.split(
                        "/druid/coordinator/v1/datasources/", 1
                    )[1]
                    name, _, sub = rest.partition("/")
                    q = parse_qs(urlparse(self.path).query,
                                 keep_blank_values=True)
                    out = shim._coordinator_datasource(
                        name, sub, full="full" in q
                    )
                    if out is not None:
                        self._send(200, out)
                    else:
                        self._send(404, {"error": "Unknown datasource",
                                         "errorMessage": name})
                elif path == "/druid/indexer/v1/supervisor":
                    with shim._lock:
                        self._send(200, sorted(shim._supervisors))
                elif path.startswith(
                    "/druid/indexer/v1/supervisor/"
                ) and path.endswith(("/status", "/stats", "/history")):
                    rest = path.split(
                        "/druid/indexer/v1/supervisor/", 1
                    )[1]
                    sup_id, _, sub = rest.rpartition("/")
                    if sub == "history":
                        # history outlives the supervisor object (a
                        # resubmit replaces it) — answered from the
                        # broker's audit list
                        with shim._lock:
                            hist = shim._supervisor_history.get(sup_id)
                        if hist is not None:
                            self._send(200, hist)
                        else:
                            self._send(404, {
                                "error": "Unknown supervisor",
                                "errorMessage": sup_id})
                        return
                    st = shim._supervisor_action(sup_id, sub)
                    if st is not None:
                        self._send(200, st)
                    else:
                        self._send(404, {"error": "Unknown supervisor",
                                         "errorMessage": sup_id})
                elif path.startswith("/druid/v2/sql/statements/"):
                    rest = path.split("/druid/v2/sql/statements/", 1)[1]
                    sid, _, sub = rest.partition("/")
                    try:
                        if sub == "results":
                            from urllib.parse import parse_qs, urlparse

                            q = parse_qs(urlparse(self.path).query)
                            page = int((q.get("page") or ["0"])[0])
                            out = shim._statement_results(sid, page)
                        elif sub == "":
                            out = shim._statement_status(sid)
                        else:
                            out = None
                    except ValueError as e:
                        self._send(400, {"error": "Bad request",
                                         "errorMessage": str(e)})
                        return
                    if out is not None:
                        self._send(200, out)
                    else:
                        self._send(404, {"error": "Unknown statement",
                                         "errorMessage": sid})
                elif path.startswith("/druid/indexer/v1/task/") and \
                        path.endswith("/status"):
                    task_id = path.split("/druid/indexer/v1/task/",
                                              1)[1][:-len("/status")]
                    st = shim._task_status(task_id)
                    if st is not None:
                        self._send(200, st)
                    else:
                        self._send(404, {"error": "Unknown task",
                                         "errorMessage": task_id})
                elif path.startswith("/druid/indexer/v1/task/") and \
                        path.endswith("/reports"):
                    task_id = path.split("/druid/indexer/v1/task/",
                                              1)[1][:-len("/reports")]
                    rep = shim._task_report(task_id)
                    if rep is not None:
                        self._send(200, rep)
                    else:
                        self._send(404, {"error": "Unknown task",
                                         "errorMessage": task_id})
                elif path.startswith("/druid/indexer/v1/task/") and \
                        "/" not in path.split(
                            "/druid/indexer/v1/task/", 1)[1]:
                    task_id = path.split("/druid/indexer/v1/task/",
                                              1)[1]
                    pl = shim._task_payload(task_id)
                    if pl is not None:
                        self._send(200, pl)
                    else:
                        self._send(404, {"error": "Unknown task",
                                         "errorMessage": task_id})
                else:
                    self._send(404, {"error": "Unknown path",
                                     "errorMessage": self.path})

            def do_DELETE(self):
                path = self.path.split("?", 1)[0]
                if path.startswith("/druid/v2/sql/") and not (
                    path.startswith("/druid/v2/sql/statements/")
                ):
                    # cancel a RUNNING sync query by its sqlQueryId
                    qid = path.split("/druid/v2/sql/", 1)[1]
                    if shim.cancel_sql_query(qid):
                        self._send(202, {"queryId": qid})
                    else:
                        self._send(404, {"error": "Unknown query",
                                         "errorMessage": qid})
                elif path.startswith("/druid/v2/sql/statements/"):
                    sid = path.rsplit("/", 1)[1]
                    if shim._statement_delete(sid):
                        self._send(202, {"queryId": sid})
                    else:
                        self._send(404, {"error": "Unknown statement",
                                         "errorMessage": sid})
                elif path.startswith(
                    "/druid/coordinator/v1/config/compaction/"
                ):
                    ds = path.rsplit("/", 1)[1]
                    if shim._delete_compaction_config(ds):
                        self._send(200, {"status": "accepted"})
                    else:
                        self._send(404, {"error": "Unknown datasource",
                                         "errorMessage": ds})
                elif path.startswith(
                    "/druid/coordinator/v1/lookups/config/__default/"
                ):
                    name = path.rsplit("/", 1)[1]
                    if shim._lookup_delete(name):
                        self._send(202, {"status": "accepted"})
                    else:
                        self._send(404, {"error": "Unknown lookup",
                                         "errorMessage": name})
                else:
                    self._send(404, {"error": "Unknown URI",
                                     "errorMessage": self.path})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                except ValueError as e:
                    self._send(400, {"error": "Invalid JSON",
                                     "errorMessage": str(e)})
                    return
                timeout_ms = (body.get("context") or {}).get("timeout") \
                    if isinstance(body, dict) else None
                try:
                    if self.path == "/druid/v2/sql":
                        qid = (body.get("context") or {}).get(
                            "sqlQueryId"
                        ) if isinstance(body, dict) else None
                        with shim._lane_slot(body):
                            data, ctype = shim._run_with_timeout(
                                lambda: shim._handle_sql(body),
                                timeout_ms,
                                sql_query_id=qid,
                            )
                        # Druid stamps the (possibly client-chosen)
                        # query id on the response for correlation
                        self._send_raw(
                            200, data, ctype,
                            headers={"X-Druid-SQL-Query-Id": qid}
                            if qid else None,
                        )
                        return
                    elif self.path == "/druid/v2/sql/task":
                        self._send(200, shim._handle_sql_ingest(body))
                        return
                    elif self.path == "/druid/v2/sql/statements":
                        self._send(202, shim._statement_submit(body))
                        return
                    elif self.path == "/druid/v2/sql/avatica":
                        try:
                            self._send(200, shim._avatica.handle(body))
                        except Exception as e:
                            # Avatica transports failures in-band: an
                            # ErrorResponse body with HTTP 500
                            # (json_reference.html)
                            self._send(500, {
                                "response": "error",
                                "exceptions": [],
                                "errorMessage": str(e)[:2000],
                                "errorCode": -1,
                                "sqlState": "00000",
                                "rpcMetadata": {
                                    "response": "rpcMetadata",
                                    "serverAddress": "local",
                                },
                            })
                        return
                    elif self.path.split("?", 1)[0] == (
                        "/druid/coordinator/v1/config/compaction"
                    ):
                        self._send(
                            200, shim._set_compaction_config(body)
                        )
                        return
                    elif self.path.startswith(
                        "/druid/coordinator/v1/lookups/config/__default/"
                    ):
                        name = self.path.rsplit("/", 1)[1]
                        self._send(202, shim._lookup_update(name, body))
                        return
                    elif self.path.startswith(
                        "/druid/coordinator/v1/rules/"
                    ):
                        ds = self.path.split("?", 1)[0].rsplit("/", 1)[1]
                        shim._set_rules(ds, body)
                        self._send(200, {"status": "accepted"})
                        return
                    elif self.path.startswith(
                        "/druid/coordinator/v1/datasources/"
                    ) and self.path.split("?", 1)[0].endswith(
                        ("/markUnused", "/markUsed")
                    ):
                        p = self.path.split("?", 1)[0]
                        rest = p.split(
                            "/druid/coordinator/v1/datasources/", 1
                        )[1]
                        ds, _, action = rest.partition("/")
                        n_changed = shim._mark_segments(
                            ds, body, used=(action == "markUsed")
                        )
                        self._send(
                            200, {"numChangedSegments": n_changed}
                        )
                        return
                    elif self.path == "/druid/indexer/v1/task":
                        self._send(200, shim._handle_task(body))
                        return
                    elif self.path == "/druid/indexer/v1/supervisor":
                        self._send(200,
                                   shim._handle_supervisor_submit(body))
                        return
                    elif self.path.startswith(
                        "/druid/indexer/v1/supervisor/"
                    ):
                        rest = self.path.split(
                            "/druid/indexer/v1/supervisor/", 1
                        )[1]
                        sup_id, _, action = rest.rpartition("/")
                        out = (
                            shim._supervisor_action(sup_id, action)
                            if sup_id and action in (
                                "terminate", "suspend", "resume",
                                "reset",
                            ) else None
                        )
                        if out is not None:
                            self._send(200, out)
                        else:
                            self._send(404, {
                                "error": "Unknown supervisor",
                                "errorMessage": rest})
                        return
                    elif self.path in ("/druid/v2", "/druid/v2/"):
                        with shim._lane_slot(body):
                            rows = shim._run_with_timeout(
                                lambda: shim._handle_native(body),
                                timeout_ms,
                            )
                    else:
                        self._send(404, {"error": "Unknown path",
                                         "errorMessage": self.path})
                        return
                except _QueryTimeout as e:
                    # Druid's timeout envelope, HTTP 504
                    self._send(504, {"error": "Query timed out",
                                     "errorMessage": str(e)})
                    return
                except _QueryCancelled as e:
                    # Druid's QueryInterruptedException shape for a
                    # client-initiated cancel, HTTP 500
                    self._send(500, {"error": "Query cancelled",
                                     "errorMessage": str(e)})
                    return
                except _CapacityExceeded as e:
                    # Druid's query-laning rejection, HTTP 429
                    self._send(429, {"error": "Query capacity exceeded",
                                     "errorMessage": str(e)})
                    return
                except _ResourceLimitExceeded as e:
                    # Druid's ResourceLimitExceeded envelope, HTTP 400:
                    # a capped result errors, never silently truncates
                    self._send(400, {"error": "Resource limit exceeded",
                                     "errorMessage": str(e)})
                    return
                except (ValueError, KeyError) as e:
                    # bad spec: Druid's error envelope, HTTP 400
                    self._send(400, {"error": "Query not supported",
                                     "errorMessage": str(e)})
                    return
                except _ANALYSIS_ERRORS as e:
                    # unknown column / unparsable SQL: still the
                    # CLIENT's query at fault -> 400, like Druid
                    self._send(400, {"error": "Query not supported",
                                     "errorMessage": str(e)[:2000]})
                    return
                except Exception as e:  # execution failure -> 500
                    self._send(500, {"error": "Unknown exception",
                                     "errorMessage": str(e)[:2000]})
                    return
                self._send(200, rows)

        return Handler

    # -- lifecycle -------------------------------------------------------
    def start(self, port: int = 0, host: str = "127.0.0.1") -> int:
        """Start serving on ``host:port`` (0 picks a free port);
        returns the bound port."""
        if self._server is not None:
            raise RuntimeError("broker already started")
        self._server = ThreadingHTTPServer(
            (host, port), self._make_handler()
        )
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        self._compaction_stop.set()
        with self._lock:
            sups = list(self._supervisors.values())
        for sup in sups:
            sup.terminate()
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
            self._thread = None
