"""SQL front-end for LakeTable time travel, branches, and tags.

The engine's table-management surface is Python-first —
``read(version=/as_of=)``, ``LakeTable(branch=...)``, ``tag()`` — but an
Iceberg/Delta user reaches for SQL:

    SELECT ... FROM transcripts VERSION AS OF 3
    SELECT ... FROM transcripts VERSION AS OF 'train-run-7'     -- tag
    SELECT ... FROM transcripts FOR SYSTEM_TIME AS OF '2026-01-01T00:00:00'
    SELECT ... FROM transcripts@audit                           -- branch

:class:`SqlLake` is that surface: a name -> LakeTable registry whose
``sql()`` resolves every registered table reference to its pinned
snapshot DataFrame, registers the snapshot under a unique temp-view
name, rewrites the query text to that view name, and hands the result
to ``spark.sql`` — a resolver layer, not a Catalyst extension
(per-snapshot temp-view registration is all Spark needs; the travel
clause itself never reaches the SQL parser).

Accepted travel grammar after a ``FROM``/``JOIN`` reference:

* ``[FOR] VERSION AS OF <int>`` — explicit snapshot id
* ``[FOR] VERSION AS OF '<tag>'`` — named tag (Iceberg tag read)
* ``FOR SYSTEM_TIME AS OF '<ts>'`` / ``TIMESTAMP AS OF '<ts>'`` —
  wall-clock travel via :meth:`LakeTable.version_as_of`
* ``<name>@<branch>`` — branch head read (composes with the clauses
  above: the travel resolves along THAT branch's parent chain)
* ``<name>.history`` / ``.files`` / ``.lineage`` / ``.tags`` /
  ``.branches`` / ``.changes`` / ``.diff`` — metadata tables (the
  Iceberg ``table.history`` family). ``.files`` and ``.changes`` accept
  ``VERSION AS OF <id|'tag'>`` (files AT a snapshot; the changelog OF
  a commit); ``.diff`` requires one (everything changed SINCE that
  snapshot); dotted names whose base is unregistered (``db.table``)
  pass through untouched.

Unregistered names (CTEs, real temp views, catalog tables) pass through
untouched. Comma-style joins (``FROM a, b``) only resolve the first
name — use explicit ``JOIN`` for multi-table travel queries.

DML statements route to the engine's exactly-once predicate-DML and
MERGE commits (same semantics, OCC, and sync-pushdown as the Python
API — the WHERE/SET text is recorded verbatim as the manifest's dml
spec, so synced copies replay it):

    DELETE FROM transcripts WHERE role = 'tool'
    UPDATE transcripts@audit SET text = upper(text) WHERE turn_idx = 0
    MERGE INTO transcripts USING (SELECT ...) s
      ON transcripts.conv_id = s.conv_id AND transcripts.turn_idx = s.turn_idx
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *

Conditions and SET expressions must be row-local (no subqueries — put
set-based logic in a MERGE's USING query). MERGE accepts only the
canonical upsert clause pair above (plus an optional
``WHEN MATCHED AND s.op = 'delete' THEN DELETE``) because the engine's
merge semantics are fixed: LWW upsert on the key columns, where a
matched row updates only if the source row out-orders it.

Reference analog: the reference's consumers read published state
through SQL views over the latest load (``create_views.sql:24-31``,
the ``latest_only`` view); the travel clauses here are the standard
Spark/Iceberg SQL forms those views lacked.

Scale: resolution cost is O(referenced tables) driver-side metadata —
one manifest load per reference. The data plan is byte-identical to
calling ``read()`` directly (the temp view IS the snapshot DataFrame),
so predicate pushdown, column pruning, and bucket pruning are
unaffected.
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from gamechanger_data_spark.sinks.table import LakeTable

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"

# One reference = FROM/JOIN keyword + name [+ @branch] [+ travel clauses].
# The clauses group is a repetition so "VERSION AS OF x FOR SYSTEM_TIME
# AS OF y" is captured whole (then refused in _resolve — one pin only).
_TRAVEL = re.compile(
    rf"""(?P<kw>\b(?:FROM|JOIN)\b)\s+
         (?P<name>{_IDENT})
         (?:\.(?P<meta>history|files|lineage|tags|branches|changes|diff)\b)?
         (?![\w.])  # a complete token: never resolve a prefix of db.table
         (?:@(?P<branch>[A-Za-z0-9][A-Za-z0-9._-]*))?
         (?P<clauses>
             (?:\s+(?:FOR\s+)?VERSION\s+AS\s+OF\s+(?:\d+|'[^']*')
              |\s+(?:FOR\s+SYSTEM_TIME|FOR\s+TIMESTAMP|TIMESTAMP)\s+AS\s+OF\s+'[^']*'
             )*
         )""",
    re.IGNORECASE | re.VERBOSE,
)
_VERSION = re.compile(r"VERSION\s+AS\s+OF\s+(\d+|'[^']*')", re.IGNORECASE)
_SYSTIME = re.compile(
    r"(?:FOR\s+SYSTEM_TIME|FOR\s+TIMESTAMP|TIMESTAMP)\s+AS\s+OF\s+'([^']*)'",
    re.IGNORECASE,
)

_BRANCH = r"[A-Za-z0-9][A-Za-z0-9._-]*"
_TABLE_REF = rf"(?P<name>{_IDENT})(?:@(?P<branch>{_BRANCH}))?"
_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+{_TABLE_REF}\s*(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+{_TABLE_REF}\s+SET\s+(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    rf"^\s*MERGE\s+INTO\s+{_TABLE_REF}"
    rf"(?:\s+(?:AS\s+)?(?P<talias>{_IDENT}))?\s+USING\s+(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# named USING source: ident [@branch] [travel clauses] [[AS] alias]
_MERGE_SRC = re.compile(
    rf"""^(?P<src>{_IDENT}(?:@{_BRANCH})?
          (?:\s+(?:FOR\s+)?VERSION\s+AS\s+OF\s+(?:\d+|'[^']*')
           |\s+(?:FOR\s+SYSTEM_TIME|FOR\s+TIMESTAMP|TIMESTAMP)\s+AS\s+OF\s+'[^']*'
          )*)
          (?:\s+(?:AS\s+)?(?P<alias>{_IDENT}))?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)
_ON_EQ = re.compile(
    rf"^\s*(?:{_IDENT}\s*\.\s*)?(?P<l>{_IDENT})\s*=\s*"
    rf"(?:{_IDENT}\s*\.\s*)?(?P<r>{_IDENT})\s*$",
    re.IGNORECASE,
)
_DML_KW = re.compile(r"^\s*(DELETE|UPDATE|MERGE)\b", re.IGNORECASE)
_ASSIGN = re.compile(
    rf"^\s*(?P<col>{_IDENT})\s*=\s*(?P<expr>.+)$", re.DOTALL
)


def _mask_tops(s: str) -> str:
    """Same-length copy of ``s`` with string-literal contents and
    everything nested inside parentheses blanked to spaces — keyword and
    comma searches on the mask see only top-level SQL structure (slices
    are then taken from the original). SQL's doubled-quote escape
    (``'it''s'``) is handled."""
    out: list[str] = []
    depth, i, n = 0, 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            out.append(" ")
            i += 1
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        out.extend("  ")
                        i += 2
                        continue
                    out.append(" ")
                    i += 1
                    break
                out.append(" ")
                i += 1
        elif c == "(":
            out.append("(" if depth == 0 else " ")
            depth += 1
            i += 1
        elif c == ")":
            depth = max(0, depth - 1)
            out.append(")" if depth == 0 else " ")
            i += 1
        else:
            out.append(c if depth == 0 else " ")
            i += 1
    return "".join(out)


def _split_top(s: str, sep: str = ",") -> list[str]:
    mask = _mask_tops(s)
    parts, start = [], 0
    for i, c in enumerate(mask):
        if c == sep:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _find_kw(s: str, kw: str) -> re.Match | None:
    """First top-level occurrence of keyword ``kw`` in ``s``."""
    return re.search(rf"\b{kw}\b", _mask_tops(s), re.IGNORECASE)


class SqlLake:
    """Name -> LakeTable registry with a time-travel-aware ``sql()``."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, LakeTable] = {}
        self._seq = 0

    def register(self, name: str, table: LakeTable) -> "SqlLake":
        if not re.fullmatch(_IDENT, name):
            raise ValueError(f"invalid table name {name!r}")
        self._tables[name] = table
        return self

    def sql(self, query: str, batch_id: str | None = None) -> DataFrame:
        """Run ``query`` with registered references resolved to pinned
        snapshots. Temp views are session-scoped and dropped before
        returning (classic-mode analysis is eager, so the returned
        DataFrame's plan no longer needs them).

        DML statements (``DELETE FROM`` / ``UPDATE ... SET`` /
        ``MERGE INTO``) against a registered table route to the engine's
        exactly-once commits (:meth:`LakeTable.delete_where` /
        ``update_where`` / ``merge``) and return a one-row stats
        DataFrame instead of query results. ``batch_id`` names the
        commit for exactly-once replay (re-running the same id is a
        no-op); when omitted a fresh unique id is generated, so each
        call executes. SELECT queries ignore ``batch_id``."""
        m = _DML_KW.match(query)
        if m:
            return self._dml(m.group(1).upper(), query, batch_id)
        views: list[str] = []

        def repl(m: re.Match) -> str:
            name = m.group("name")
            t = self._tables.get(name)
            if t is None:
                return m.group(0)  # not ours: CTE / temp view / catalog
            df = self._resolve(t, m)
            self._seq += 1
            view = f"__lake_{name}_{self._seq}"
            df.createOrReplaceTempView(view)
            views.append(view)
            return f"{m.group('kw')} {view}"

        rewritten = _TRAVEL.sub(repl, query)
        try:
            return self.spark.sql(rewritten)
        finally:
            for v in views:
                self.spark.catalog.dropTempView(v)

    def _resolve(self, t: LakeTable, m: re.Match) -> DataFrame:
        branch = m.group("branch")
        meta = (m.group("meta") or "").lower() or None
        if meta and branch:
            raise ValueError(
                "metadata tables do not compose with @branch (use a "
                "branch-constructed LakeTable registration instead): "
                + m.group(0).strip()
            )
        if branch and branch != t.branch:
            # branch instances share manifests/data; the constructor
            # adopts key/bucket spec from the manifest, so only the
            # pointer differs
            t = LakeTable(t.spark, t.root, n_buckets=t.n_buckets, branch=branch)
        clauses = m.group("clauses") or ""
        vm = _VERSION.search(clauses)
        sm = _SYSTIME.search(clauses)
        if vm and sm:
            raise ValueError(
                "pin VERSION AS OF or SYSTEM_TIME AS OF, not both: "
                + m.group(0).strip()
            )
        if meta:
            return self._meta_df(t, meta, vm, sm, m)
        if vm:
            tok = vm.group(1)
            version = (
                t.tag_version(tok[1:-1]) if tok.startswith("'") else int(tok)
            )
            return t.read(version=version)
        if sm:
            return t.read(as_of=datetime.fromisoformat(sm.group(1)))
        return t.read()

    def _meta_df(self, t: LakeTable, meta: str, vm, sm, m: re.Match) -> DataFrame:
        """Metadata tables (the Iceberg ``table.history`` family):
        ``history`` / ``lineage`` / ``tags`` / ``branches`` take no pin;
        ``files`` and ``changes`` accept ``VERSION AS OF <id|'tag'>``
        (files AT a snapshot; the changelog OF a commit); ``diff``
        REQUIRES one (everything changed SINCE that baseline snapshot,
        classified delete/revoke/upsert)."""
        if sm or (vm and meta not in ("files", "changes", "diff")):
            raise ValueError(
                f"metadata table .{meta} does not accept this travel "
                f"clause: {m.group(0).strip()}"
            )
        version = None
        if vm:
            tok = vm.group(1)
            version = (
                t.tag_version(tok[1:-1]) if tok.startswith("'") else int(tok)
            )
        if meta == "history":
            return t.history()
        if meta == "lineage":
            return t.lineage()
        if meta == "files":
            return t.files(version=version)
        if meta == "changes":
            return t.changelog(version)
        if meta == "diff":
            if version is None:
                raise ValueError(
                    ".diff requires a baseline: FROM <t>.diff VERSION AS "
                    "OF <id|'tag'>"
                )
            return t.diff(version)
        from pyspark.sql import types as T

        pairs = t.tags() if meta == "tags" else t.branches()
        schema = T.StructType(
            [
                T.StructField("name", T.StringType(), False),
                T.StructField("version", T.LongType(), False),
            ]
        )
        return self.spark.createDataFrame(
            sorted((k, int(v)) for k, v in pairs.items()), schema
        )

    # -- DML statements ------------------------------------------------

    def _target(self, name: str, branch: str | None, stmt: str) -> LakeTable:
        t = self._tables.get(name)
        if t is None:
            raise ValueError(f"{stmt} targets unregistered table {name!r}")
        if branch and branch != t.branch:
            t = LakeTable(t.spark, t.root, n_buckets=t.n_buckets, branch=branch)
        return t

    def _dml(self, kind: str, query: str, batch_id: str | None) -> DataFrame:
        if batch_id is None:
            import uuid

            batch_id = f"sql-{kind.lower()}-{uuid.uuid4().hex}"
        if kind == "DELETE":
            r = self._delete(query, batch_id)
        elif kind == "UPDATE":
            r = self._update(query, batch_id)
        else:
            r = self._merge(query, batch_id)
        stmt = kind.lower()
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("statement", T.StringType()),
                T.StructField("batch_id", T.StringType()),
                T.StructField("skipped", T.BooleanType()),
                T.StructField("version", T.LongType()),
                T.StructField("touched_buckets", T.LongType()),
                T.StructField("rows_hit", T.LongType()),
            ]
        )
        row = (
            stmt,
            r["batch_id"],
            bool(r.get("skipped")),
            int(r["version"]),
            None if r.get("touched_buckets") is None else int(r["touched_buckets"]),
            None if r.get("rows_hit") is None else int(r["rows_hit"]),
        )
        return self.spark.createDataFrame([row], schema)

    def _delete(self, query: str, batch_id: str) -> dict:
        m = _DELETE_RE.match(query)
        if not m:
            raise ValueError(f"cannot parse DELETE statement: {query!r}")
        t = self._target(m.group("name"), m.group("branch"), "DELETE")
        rest = m.group("rest")
        if not rest.strip():
            cond = "true"  # DELETE FROM t: tombstone every live row
        else:
            w = re.match(r"^\s*WHERE\b(?P<cond>.*)$", rest, re.I | re.S)
            if not w or not w.group("cond").strip():
                raise ValueError(f"cannot parse DELETE tail: {rest!r}")
            cond = w.group("cond").strip()
        return t.delete_where(cond, batch_id=batch_id)

    def _update(self, query: str, batch_id: str) -> dict:
        m = _UPDATE_RE.match(query)
        if not m:
            raise ValueError(f"cannot parse UPDATE statement: {query!r}")
        t = self._target(m.group("name"), m.group("branch"), "UPDATE")
        rest = m.group("rest")
        w = _find_kw(rest, "WHERE")
        if w:
            set_part, cond = rest[: w.start()], rest[w.end() :].strip()
            if not cond:
                raise ValueError("UPDATE: empty WHERE condition")
        else:
            set_part, cond = rest, "true"
        assignments: dict[str, str] = {}
        for piece in _split_top(set_part):
            am = _ASSIGN.match(piece)
            if not am:
                raise ValueError(f"cannot parse SET assignment: {piece!r}")
            assignments[am.group("col")] = am.group("expr").strip()
        return t.update_where(cond, assignments, batch_id=batch_id)

    def _merge(self, query: str, batch_id: str) -> dict:
        """The canonical upsert MERGE (Delta's ``SET * / INSERT *``
        shorthand), executed with the table's CDC-LWW semantics:

            MERGE INTO t USING <src> [AS] s
            ON t.k1 = s.k1 AND ... (every key column, equality only)
            [WHEN MATCHED AND s.op = 'delete' THEN DELETE]
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *

        ``<src>`` is a parenthesized subquery or a table reference (both
        resolve through this front-end, so travel clauses work in
        USING). Source rows must carry the key and order columns; a
        matched row only updates when the source row out-orders it (the
        LWW guard — stale events lose, exactly like the replay path).
        Without the DELETE clause any source ``op`` column is overridden
        to 'update' (pure upsert, as the clause text states); with it,
        the source's op column drives delete-tombstoning and must exist.
        Other clause shapes are refused — arbitrary per-clause logic
        belongs in the USING query, not the merge."""
        m = _MERGE_RE.match(query)
        if not m:
            raise ValueError(f"cannot parse MERGE statement: {query!r}")
        t = self._target(m.group("name"), m.group("branch"), "MERGE")
        rest = m.group("rest")

        on_kw = _find_kw(rest, "ON")
        if not on_kw:
            raise ValueError("MERGE: missing ON clause")
        src_part = rest[: on_kw.start()].strip()
        after_on = rest[on_kw.end() :]
        when_kw = _find_kw(after_on, "WHEN")
        if not when_kw:
            raise ValueError("MERGE: missing WHEN clauses")
        on_cond = after_on[: when_kw.start()].strip()
        when_text = after_on[when_kw.start() :]

        # source: (subquery) [AS] alias  |  name[@branch][travel] [AS] alias
        alias = None
        if src_part.startswith("("):
            mask = _mask_tops(src_part)
            close = mask.find(")")
            if close < 0:
                raise ValueError("MERGE: unbalanced USING subquery")
            inner = src_part[1:close]
            tail = src_part[close + 1 :].strip()
            if tail:
                am = re.match(rf"^(?:AS\s+)?(?P<a>{_IDENT})$", tail, re.I)
                if not am:
                    raise ValueError(f"cannot parse USING alias: {tail!r}")
                alias = am.group("a")
            source = self.sql(inner)
        else:
            sm = _MERGE_SRC.match(src_part)
            if not sm:
                raise ValueError(f"cannot parse USING source: {src_part!r}")
            alias = sm.group("alias")
            source = self.sql(f"SELECT * FROM {sm.group('src')}")

        # ON must be an AND-conjunction of key-column equalities covering
        # exactly the target's key columns — the engine merges ON keys,
        # so any other join condition would silently not be honored.
        seen = set()
        for piece in re.split(r"\bAND\b", _mask_tops(on_cond), flags=re.I):
            em = _ON_EQ.match(piece)
            if not em or em.group("l").lower() != em.group("r").lower():
                raise ValueError(
                    f"MERGE ON must be key-column equalities, got: {piece.strip()!r}"
                )
            seen.add(em.group("l").lower())
        keys = {k.lower() for k in t.key_cols}
        if seen != keys:
            raise ValueError(
                f"MERGE ON must cover exactly the key columns {sorted(keys)}, "
                f"got {sorted(seen)}"
            )

        canon = re.sub(r"\s+", " ", when_text).strip().rstrip(";").lower()
        a = (alias or m.group("name")).lower()
        upsert = "when matched then update set * when not matched then insert *"
        with_delete = (
            f"when matched and {a}.op = 'delete' then delete " + upsert
        )
        if canon == upsert:
            from pyspark.sql import functions as F

            source = source.withColumn("op", F.lit("update"))
        elif canon == with_delete:
            if "op" not in source.columns:
                raise ValueError(
                    "MERGE delete clause requires an 'op' column in the source"
                )
        else:
            raise ValueError(
                "unsupported MERGE clauses (expected the canonical "
                f"'{upsert}' form, optionally preceded by "
                f"\"when matched and {a}.op = 'delete' then delete\"): "
                f"{canon!r}"
            )
        return t.merge(source, batch_id=batch_id)
