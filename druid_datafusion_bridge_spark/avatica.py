"""Avatica JSON RPC over the engine — Druid's JDBC endpoint.

Real Druid serves JDBC through Apache Calcite Avatica at
``POST /druid/v2/sql/avatica`` (public docs: druid api-reference.md
"JDBC" + calcite.apache.org/avatica/docs/json_reference.html). A JDBC
client speaks a JSON RPC: open a connection, create a statement,
prepareAndExecute SQL, page frames with fetch, close. This module
implements the request surface that drives that whole lifecycle:

- ``openConnection`` / ``closeConnection`` / ``connectionSync``
- ``createStatement`` / ``closeStatement``
- ``prepareAndExecute`` (direct SQL -> executeResults with a typed
  signature + first frame)
- ``prepare`` + ``execute`` (PreparedStatement: positional ``?``
  parameters arrive as Avatica TypedValues and bind through the same
  parameterized-SQL path as the REST API)
- ``fetch`` (server-side cursor paging over the statement's rows)
- ``syncResults`` (acknowledged; cursors here are always replayable)
- ``prepareAndExecuteBatch`` / ``executeBatch`` (JDBC addBatch +
  executeBatch: each command/binding-set executes in order and reports
  a per-command update count — 0 for this read-only engine, matching
  real Druid's read-only JDBC where batches never mutate rows)
- ``commit`` / ``rollback`` (acknowledged no-ops: a JDBC client with
  autocommit=false sends them unconditionally; a read-only autocommit
  server acknowledges rather than erroring, so such clients work)
- DatabaseMetaData requests — ``catalogs`` / ``schemas`` / ``tables``
  / ``columns`` (what BI tools issue through JDBC's getTables and
  getColumns), answered from the engine's INFORMATION_SCHEMA views

Value encoding follows Avatica's JSON conventions: rows are arrays in
column order; TIMESTAMP columns travel as epoch millis with rep
JAVA_SQL_TIMESTAMP (the encoding the Avatica JDBC driver decodes back
into java.sql.Timestamp); DATE as epoch days (JAVA_SQL_DATE).

State is per-server: connections and statements live in maps guarded
by one lock; statement results are collected ONCE at execute (bounded
by the broker's max_rows resource limit) and paged from memory —
Avatica's own model (frames page a materialized result on the
server). An unknown connection/statement answers the protocol's
missingStatement/error shape rather than an HTTP error, like the real
server.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import re as _re
import threading
from typing import Any, Callable

__all__ = ["AvaticaEndpoint"]

# java.sql.Types ids (public JDBC constants) for the signature's
# ColumnMetaData.type.id, keyed by Spark simpleString
_JDBC_TYPES: dict[str, tuple[int, str, str]] = {
    # spark type -> (java.sql.Types id, Avatica type name, rep)
    "tinyint": (-5, "BIGINT", "PRIMITIVE_LONG"),
    "smallint": (-5, "BIGINT", "PRIMITIVE_LONG"),
    "int": (-5, "BIGINT", "PRIMITIVE_LONG"),
    "bigint": (-5, "BIGINT", "PRIMITIVE_LONG"),
    "boolean": (16, "BOOLEAN", "PRIMITIVE_BOOLEAN"),
    "float": (6, "FLOAT", "PRIMITIVE_DOUBLE"),
    "double": (8, "DOUBLE", "PRIMITIVE_DOUBLE"),
    "string": (12, "VARCHAR", "STRING"),
    "date": (91, "DATE", "JAVA_SQL_DATE"),
}


def _jdbc_type(dt) -> tuple[int, str, str]:
    s = dt.simpleString()
    if s.startswith("timestamp"):
        return (93, "TIMESTAMP", "JAVA_SQL_TIMESTAMP")
    if s.startswith("decimal"):
        return (8, "DOUBLE", "PRIMITIVE_DOUBLE")
    if s.startswith("array"):
        return (2003, "ARRAY", "ARRAY")
    return _JDBC_TYPES.get(s, (1111, "OTHER", "OBJECT"))


def _wire_value(v: Any) -> Any:
    """Avatica wire encoding: timestamps -> epoch millis, dates ->
    epoch days, decimals -> double, binary -> base64 — applied
    RECURSIVELY so array/struct columns (which collect as lists and
    Rows) encode their elements instead of crashing json.dumps."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1000)
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    if isinstance(v, _decimal.Decimal):
        return float(v)
    if isinstance(v, bytes):
        import base64

        return base64.b64encode(v).decode()
    if isinstance(v, (list, tuple)):
        return [_wire_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _wire_value(x) for k, x in v.items()}
    if hasattr(v, "asDict"):  # pyspark Row (struct column)
        return {k: _wire_value(x) for k, x in v.asDict().items()}
    return v


def _typed_values(vals) -> list | None:
    """Avatica ``parameterValues``: TypedValue objects ({"type",
    "value"}) or bare values -> the positional list Spark binds. The
    one unwrap for both execute and executeBatch, so binding fixes
    can't drift between them (the broker's JSON SQL surfaces unwrap
    their different wire shape in broker._bind_params)."""
    out = [p.get("value") if isinstance(p, dict) else p for p in vals or []]
    return out or None



class AvaticaEndpoint:
    """The JSON RPC dispatcher. ``run_sql(sql, args)`` is supplied by
    the broker and must return a collected, resource-limited Spark
    DataFrame result as ``(schema_fields, rows)``."""

    def __init__(self, run_sql: Callable[[str, list | None], tuple]):
        self._run_sql = run_sql
        self._lock = threading.Lock()
        self._connections: set[str] = set()
        # (connection_id, statement_id) -> {"sig": ..., "rows": [...]}
        self._statements: dict[tuple[str, int], dict] = {}
        # (connection_id, statement_id) -> prepared SQL text, so
        # executeBatch (which carries only the statement id, not the
        # SQL) can re-bind each parameter row
        self._prepared: dict[tuple[str, int], str] = {}
        self._next_stmt = 0

    # -- protocol plumbing -------------------------------------------------
    @staticmethod
    def _rpc_meta() -> dict:
        return {"response": "rpcMetadata", "serverAddress": "local"}

    def _signature(self, fields, sql: str) -> dict:
        cols = []
        for i, f in enumerate(fields):
            tid, tname, rep = _jdbc_type(f.dataType)
            cols.append({
                "ordinal": i,
                "autoIncrement": False,
                "caseSensitive": False,
                "searchable": True,
                "currency": False,
                "nullable": 1 if f.nullable else 0,
                "signed": True,
                "displaySize": -1,
                "label": f.name,
                "columnName": f.name,
                "schemaName": "druid",
                "precision": 0,
                "scale": 0,
                "tableName": "",
                "catalogName": "",
                "type": {
                    "type": "scalar", "id": tid,
                    "name": tname, "rep": rep,
                },
                "readOnly": True,
                "writable": False,
                "definitelyWritable": False,
                "columnClassName": "",
            })
        return {
            "columns": cols,
            "sql": sql,
            "parameters": [],
            "cursorFactory": {"style": "LIST", "clazz": None,
                              "fieldNames": None},
            "statementType": "SELECT",
        }

    def _frame(self, rows: list, offset: int, limit: int | None) -> dict:
        take = rows[offset:] if limit in (None, -1, 0) \
            else rows[offset:offset + limit]
        return {
            "offset": offset,
            "done": offset + len(take) >= len(rows),
            "rows": take,
        }

    def _result_set(
        self, cid: str, sid: int, sql: str, args: list | None,
        first_frame_rows: int | None,
    ) -> dict:
        fields, collected = self._run_sql(sql, args)
        rows = [[_wire_value(v) for v in r] for r in collected]
        sig = self._signature(fields, sql)
        with self._lock:
            # bound server-side cursor state: a client that never
            # closes statements evicts ITS OWN oldest ones first (a
            # fetch on an evicted statement answers missingStatement,
            # which the JDBC driver surfaces as a recoverable cursor
            # error). Evicting per-connection keeps one chatty client
            # from killing another connection's live cursor mid-fetch;
            # the global-oldest fallback still bounds total state when
            # the pressure comes from many connections.
            while len(self._statements) >= 256:
                own = next(
                    (k for k in self._statements if k[0] == cid), None
                )
                self._statements.pop(
                    own if own is not None
                    else next(iter(self._statements))
                )
            self._statements[(cid, sid)] = {"sig": sig, "rows": rows}
        return {
            "response": "resultSet",
            "connectionId": cid,
            "statementId": sid,
            "ownStatement": True,
            "signature": sig,
            "firstFrame": self._frame(rows, 0, first_frame_rows),
            "updateCount": -1,
            "rpcMetadata": self._rpc_meta(),
        }

    def _new_statement_id(self) -> int:
        with self._lock:
            self._next_stmt += 1
            return self._next_stmt

    # -- dispatch ----------------------------------------------------------
    def handle(self, body: dict) -> dict:
        req = body.get("request")
        cid = body.get("connectionId", "")
        if req == "openConnection":
            with self._lock:
                self._connections.add(cid)
            return {"response": "openConnection",
                    "rpcMetadata": self._rpc_meta()}
        if req == "closeConnection":
            with self._lock:
                self._connections.discard(cid)
                self._statements = {
                    k: v for k, v in self._statements.items()
                    if k[0] != cid
                }
                self._prepared = {
                    k: v for k, v in self._prepared.items()
                    if k[0] != cid
                }
            return {"response": "closeConnection",
                    "rpcMetadata": self._rpc_meta()}
        if req == "connectionSync":
            return {"response": "connectionSync",
                    "connProps": body.get("connProps") or {
                        "connProps": "connPropsImpl",
                        "autoCommit": True, "readOnly": True,
                    },
                    "rpcMetadata": self._rpc_meta()}
        if req == "createStatement":
            sid = self._new_statement_id()
            return {"response": "createStatement", "connectionId": cid,
                    "statementId": sid, "rpcMetadata": self._rpc_meta()}
        if req == "closeStatement":
            with self._lock:
                self._statements.pop(
                    (cid, body.get("statementId")), None
                )
                self._prepared.pop(
                    (cid, body.get("statementId")), None
                )
            return {"response": "closeStatement",
                    "rpcMetadata": self._rpc_meta()}
        if req == "prepareAndExecute":
            sid = body.get("statementId")
            if sid is None:  # 0 is a valid client-chosen statement id
                sid = self._new_statement_id()
            first = body.get("maxRowsInFirstFrame",
                             body.get("maxRowCount", -1))
            rs = self._result_set(
                cid, sid, body["sql"], None,
                int(first) if first is not None else -1,
            )
            return {"response": "executeResults",
                    "missingStatement": False,
                    "rpcMetadata": self._rpc_meta(),
                    "results": [rs]}
        if req == "prepare":
            sid = self._new_statement_id()
            # the Avatica JDBC driver derives the prepared statement's
            # parameter COUNT from this list (setLong(i, ...) throws
            # client-side past it), so emit one AvaticaParameter per
            # ``?`` outside string literals — typed VARCHAR/OTHER,
            # which the driver accepts for any setXxx (the engine
            # re-types at bind time)
            stripped = _re.sub(r"'(?:[^']|'')*'", " ", body["sql"])
            params = [
                {
                    "signed": False, "precision": 0, "scale": 0,
                    "parameterType": 12, "typeName": "VARCHAR",
                    "className": "java.lang.String",
                    "name": f"?{i + 1}",
                }
                for i in range(stripped.count("?"))
            ]
            with self._lock:
                # same per-connection fairness as the statement pool:
                # a client preparing hundreds of statements evicts ITS
                # OWN oldest first, never another connection's live
                # prepared handle
                while len(self._prepared) >= 256:
                    own = next(
                        (k for k in self._prepared if k[0] == cid), None
                    )
                    self._prepared.pop(
                        own if own is not None
                        else next(iter(self._prepared))
                    )
                self._prepared[(cid, sid)] = body["sql"]
            return {"response": "prepare",
                    "statement": {"connectionId": cid, "id": sid,
                                  "signature": {
                                      "columns": [], "sql": body["sql"],
                                      "parameters": params,
                                      "cursorFactory": {"style": "LIST"},
                                      "statementType": "SELECT"}},
                    "rpcMetadata": self._rpc_meta()}
        if req == "execute":
            h = body.get("statementHandle") or {}
            cid = h.get("connectionId", cid)
            sid = h.get("id")
            sql = (h.get("signature") or {}).get("sql")
            if sql is None:
                return self._missing_statement()
            args = _typed_values(body.get("parameterValues"))
            first = body.get("maxRowsInFirstFrame",
                             body.get("maxRowCount", -1))
            rs = self._result_set(
                cid, sid, sql, args,
                int(first) if first is not None else -1,
            )
            return {"response": "executeResults",
                    "missingStatement": False,
                    "rpcMetadata": self._rpc_meta(),
                    "results": [rs]}
        if req == "fetch":
            with self._lock:
                st = self._statements.get(
                    (cid, body.get("statementId"))
                )
            if st is None:
                return self._missing_statement()
            return {"response": "fetch",
                    "missingStatement": False,
                    "frame": self._frame(
                        st["rows"], int(body.get("offset", 0)),
                        int(body.get("fetchMaxRowCount", -1)),
                    ),
                    "rpcMetadata": self._rpc_meta()}
        if req == "prepareAndExecuteBatch":
            # JDBC Statement.addBatch(sql)+executeBatch(): run each SQL
            # command in order; the response is one update count per
            # command. This engine is read-only (like real Druid JDBC),
            # so every command executes for effect-checking but reports
            # 0 rows updated.
            sid = body.get("statementId")
            if sid is None:
                sid = self._new_statement_id()
            counts = []
            for sql in body.get("sqlCommands") or []:
                self._run_sql(sql, None)  # validates; read-only
                counts.append(0)
            return {"response": "executeBatch", "connectionId": cid,
                    "statementId": sid, "updateCounts": counts,
                    "missingStatement": False,
                    "rpcMetadata": self._rpc_meta()}
        if req == "executeBatch":
            # PreparedStatement.addBatch()+executeBatch(): the request
            # carries only the statement id plus one TypedValue row per
            # batch entry — the SQL was stored at prepare time.
            sid = body.get("statementId")
            with self._lock:
                sql = self._prepared.get((cid, sid))
            if sql is None:
                return self._missing_statement()
            counts = []
            for prow in body.get("parameterValues") or []:
                self._run_sql(sql, _typed_values(prow))
                counts.append(0)
            return {"response": "executeBatch", "connectionId": cid,
                    "statementId": sid, "updateCounts": counts,
                    "missingStatement": False,
                    "rpcMetadata": self._rpc_meta()}
        if req == "commit":
            # autocommit=false clients send commit unconditionally; a
            # read-only engine has nothing to commit — acknowledge.
            return {"response": "commit",
                    "rpcMetadata": self._rpc_meta()}
        if req == "rollback":
            return {"response": "rollback",
                    "rpcMetadata": self._rpc_meta()}
        if req == "syncResults":
            return {"response": "syncResults", "moreResults": False,
                    "missingStatement": False,
                    "rpcMetadata": self._rpc_meta()}
        if req in ("catalogs", "schemas", "tables", "columns"):
            return self._metadata(req, cid, body)
        raise ValueError(f"unsupported Avatica request {req!r}")

    def _metadata(self, req: str, cid: str, body: dict) -> dict:
        """JDBC DatabaseMetaData: answered as ResultSetResponses over
        the engine's INFORMATION_SCHEMA views, with JDBC's documented
        column names. ``tableNamePattern`` filters via SQL LIKE (bound
        as a parameter, never spliced)."""
        pat = body.get("tableNamePattern") or "%"
        if req == "catalogs":
            sql, args = "SELECT 'druid' AS TABLE_CAT", None
        elif req == "schemas":
            sql, args = (
                "SELECT 'druid' AS TABLE_SCHEM, "
                "'druid' AS TABLE_CATALOG", None,
            )
        elif req == "tables":
            sql = (
                "SELECT TABLE_CATALOG AS TABLE_CAT, "
                "TABLE_SCHEMA AS TABLE_SCHEM, TABLE_NAME, TABLE_TYPE "
                "FROM INFORMATION_SCHEMA.TABLES "
                "WHERE TABLE_NAME LIKE ? ORDER BY TABLE_NAME"
            )
            args = [pat]
        else:  # columns
            sql = (
                "SELECT 'druid' AS TABLE_CAT, "
                "TABLE_SCHEMA AS TABLE_SCHEM, TABLE_NAME, COLUMN_NAME, "
                "DATA_TYPE AS TYPE_NAME, ORDINAL_POSITION, IS_NULLABLE "
                "FROM INFORMATION_SCHEMA.COLUMNS "
                "WHERE TABLE_NAME LIKE ? "
                "ORDER BY TABLE_NAME, ORDINAL_POSITION"
            )
            args = [pat]
        sid = self._new_statement_id()
        return self._result_set(cid, sid, sql, args, -1)

    def _missing_statement(self) -> dict:
        return {"response": "executeResults", "missingStatement": True,
                "rpcMetadata": self._rpc_meta(), "results": []}
