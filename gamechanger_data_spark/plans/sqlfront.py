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
  snapshot) and accepts two (``.diff VERSION AS OF a VERSION AS OF b``
  = everything changed from a to b); dotted names whose base is
  unregistered (``db.table``) pass through untouched.

Unregistered names (real temp views, catalog tables) pass through
untouched, and names the query itself binds — ``WITH`` CTEs, ``WINDOW``
definitions — shadow registered tables, exactly as they would shadow a
catalog table in SQL. Matching runs against a literal-masked copy of
the query, so a quoted ``'... FROM transcripts ...'`` or a commented
reference is never rewritten. Comma-style joins (``FROM a, b``) where
the second name is registered are refused with a use-explicit-JOIN
error (each reference must resolve and carry its own travel clause).

DML statements route to the engine's exactly-once predicate-DML and
MERGE commits (same semantics, OCC, and sync-pushdown as the Python
API — the WHERE/SET text is recorded verbatim as the manifest's dml
spec, so synced copies replay it):

    CREATE TABLE rollup LOCATION '/data/rollup' KEY (conv_id)
      ORDER BY (last_ts) [BUCKETS 64] [STATS (cols)] [CODEC 'zstd']
      AS SELECT ... FROM transcripts GROUP BY conv_id
    INSERT INTO transcripts (conv_id, turn_idx, ...) VALUES (...), (...)
    INSERT INTO transcripts SELECT ... FROM staged
    DELETE FROM transcripts WHERE role = 'tool'
    UPDATE transcripts@audit SET text = upper(text) WHERE turn_idx = 0
    MERGE INTO transcripts USING (SELECT ...) s
      ON transcripts.conv_id = s.conv_id AND transcripts.turn_idx = s.turn_idx
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *

DDL evolves a table's schema without rewriting data (metadata-only
commits, resurrection-guarded — see :meth:`LakeTable.add_columns` /
``drop_column`` / ``rename_column``), and the registry itself speaks
SQL:

    ALTER TABLE transcripts ADD COLUMNS (quality double, lang string)
    ALTER TABLE transcripts RENAME COLUMN tool TO tool_name
    ALTER TABLE transcripts DROP COLUMN scratch
    INSERT OVERWRITE transcripts SELECT ...   -- atomic truncate-and-reload
    DROP TABLE [IF EXISTS] transcripts        -- deregister (data stays)
    SHOW TABLES
    SHOW CREATE TABLE transcripts             -- canonical recreate DDL
    DESCRIBE transcripts[@branch]

Maintenance/ops procedures take the Iceberg ``CALL`` form against a
registered table and return a one-row report:

    CALL transcripts.rollback_to_snapshot(7)
    CALL transcripts.tag('train-run-7', 7)
    CALL transcripts.create_branch('audit')
    CALL transcripts.fast_forward('audit')
    CALL transcripts.expire_snapshots(2, 3600)
    CALL transcripts.maintain()

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
unaffected. Single-table SELECTs additionally hoist their WHERE's
simple top-level conjuncts (``[alias.]col op literal``, AND-only)
into ``read(where=...)`` so the manifest zone maps skip whole files
before the scan schedules — the SQL text keeps its full WHERE, so
hoisting is only ever redundant, and extraction bails to no-pruning on
anything it cannot prove (joins, set ops, a top-level OR, subqueries).
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
_DML_KW = re.compile(
    r"^\s*(DELETE|UPDATE|MERGE|INSERT|CALL|CREATE|ALTER|DROP|SHOW|DESCRIBE"
    r"|DESC)\b",
    re.IGNORECASE,
)
_ALTER_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_TABLE_REF}\s+(?P<action>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_RENAME = re.compile(
    rf"^RENAME\s+COLUMN\s+(?P<old>{_IDENT})\s+TO\s+(?P<new>{_IDENT})$",
    re.IGNORECASE,
)
_ALTER_ADD = re.compile(r"^ADD\s+COLUMNS?\s+(?P<defs>.+)$", re.I | re.S)
_ALTER_DROPCOL = re.compile(
    rf"^DROP\s+COLUMN\s+(?P<col>{_IDENT})$", re.IGNORECASE
)
_COL_DEF = re.compile(rf"^\s*(?P<name>{_IDENT})\s+(?P<type>.+?)\s*$", re.S)
_DROP_TABLE_RE = re.compile(
    rf"^\s*DROP\s+TABLE\s+(?:(?P<ie>IF\s+EXISTS)\s+)?(?P<name>{_IDENT})"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_RE = re.compile(r"^\s*SHOW\s+TABLES\s*;?\s*$", re.IGNORECASE)
_SHOW_CREATE_RE = re.compile(
    rf"^\s*SHOW\s+CREATE\s+TABLE\s+{_TABLE_REF}\s*;?\s*$", re.IGNORECASE
)
_DESC_RE = re.compile(
    rf"^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?(?P<name>{_IDENT})"
    rf"(?:@(?P<branch>{_BRANCH}))?\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_RE = re.compile(
    rf"""^\s*CREATE\s+(?:(?P<replace>OR\s+REPLACE)\s+)?TABLE\s+
         (?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?(?P<name>{_IDENT})\s+
         LOCATION\s+'(?P<loc>[^']+)'\s+
         KEY\s*\((?P<keys>[^()]*)\)\s*
         (?:ORDER\s+BY\s*\((?P<order>[^()]*)\)\s*)?
         (?:BUCKETS\s+(?P<nb>\d+)\s*)?
         (?:STATS\s*\((?P<stats>[^()]*)\)\s*)?
         (?:CODEC\s+'(?P<codec>[A-Za-z0-9_]+)'\s*)?
         AS\s+(?P<select>.+?)\s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)
_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+(?P<mode>INTO|OVERWRITE(?:\s+TABLE)?)\s+{_TABLE_REF}\s*"
    rf"(?:\((?P<cols>[^()]*)\)\s*)?(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CALL_RE = re.compile(
    rf"^\s*CALL\s+(?P<name>{_IDENT})(?:@(?P<branch>{_BRANCH}))?"
    rf"\s*\.\s*(?P<proc>{_IDENT})\s*\((?P<args>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CALL_ARG = re.compile(
    r"^\s*(?:(?P<str>'(?:[^']|'')*')|(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<bool>true|false)|(?P<null>null))\s*$",
    re.IGNORECASE,
)
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


def _mask_literals(s: str) -> str:
    """Same-length copy of ``s`` with string-literal CONTENTS (quotes
    kept) and comment bodies (``--`` to end-of-line, ``/* */``) blanked
    to spaces — parentheses and everything inside them stay visible, so
    structural matching (_TRAVEL, CTE detection) still sees subqueries.
    Group spans on the mask are valid offsets into the original (slice
    the original for any value that may contain a literal)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            out.append("'")
            i += 1
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        out.extend("  ")
                        i += 2
                        continue
                    out.append("'")
                    i += 1
                    break
                out.append(" ")
                i += 1
        elif c == "-" and i + 1 < n and s[i + 1] == "-":
            while i < n and s[i] != "\n":
                out.append(" ")
                i += 1
        elif c == "/" and i + 1 < n and s[i + 1] == "*":
            out.extend("  ")
            i += 2
            while i < n:
                if s[i] == "*" and i + 1 < n and s[i + 1] == "/":
                    out.extend("  ")
                    i += 2
                    break
                out.append(" " if s[i] != "\n" else "\n")
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


# A name directly followed by [optional column list +] "AS (" is a CTE
# (or WINDOW) definition — table aliases never take that shape
# (derived-table aliases are ") AS x"). References to such names must
# NOT be resolved to lake tables: the query's own binding wins.
_CTE_DEF = re.compile(
    rf"\b({_IDENT})\s*(?:\((?:\s*{_IDENT}\s*,?)*\))?\s+AS\s*\(", re.IGNORECASE
)
# after a resolved FROM reference: ", name" = comma-style join
_COMMA_JOIN = re.compile(rf"\s*,\s*({_IDENT})")


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


# ------------- WHERE-conjunct extraction for zone-map file skipping -------------
# A SELECT's WHERE clause normally reaches the engine only as Spark's own
# row-group pushdown; hoisting its simple conjuncts into read(where=...)
# additionally skips whole manifest-listed files (LakeTable zone maps)
# before the scan schedules. Extraction is deliberately conservative:
# it bails to no-pruning on ANYTHING it cannot prove — the rewritten SQL
# always still applies its full WHERE, so a hoisted conjunct is only ever
# redundant, never substitutive.

_PRUNE_BLOCKERS = re.compile(
    r"\b(JOIN|UNION|INTERSECT|EXCEPT|MINUS|LATERAL|TABLESAMPLE)\b", re.IGNORECASE
)
_WHERE_KW = re.compile(r"\bWHERE\b", re.IGNORECASE)
_WHERE_END = re.compile(
    r"\b(GROUP|ORDER|HAVING|LIMIT|WINDOW|QUALIFY|DISTRIBUTE|SORT|CLUSTER)\b",
    re.IGNORECASE,
)
_TOP_OR = re.compile(r"\bOR\b", re.IGNORECASE)
_TOP_AND = re.compile(r"\bAND\b", re.IGNORECASE)
_FROM_TAIL = re.compile(rf"^\s*(?:AS\s+)?(?P<alias>{_IDENT})?\s*$", re.IGNORECASE)
_CONJ = re.compile(
    rf"""^\s*(?:(?P<q>{_IDENT})\s*\.\s*)?(?P<col>{_IDENT})\s*
         (?P<op><=|>=|==|=|<|>)\s*
         (?:(?P<str>'(?:[^']|'')*')|(?P<num>-?\d+(?:\.\d+)?))\s*$""",
    re.VERBOSE | re.DOTALL,
)
_SQL_KEYWORDS = frozenset(
    "and or not in is null like between exists case when then else end".split()
)

# ------------- metadata-answered global aggregates -------------
# SELECT count(*)/count(col)/min(col)/max(col) [AS alias]... FROM t [pins]
# with nothing else (no WHERE / GROUP BY / JOIN / DISTINCT / set ops)
# routes to LakeTable.stats_agg: clean buckets answer from manifest
# stats with zero data IO; anything unprovable scans through the same
# resolved read the generic path uses, so routing never changes results.
# Every item must carry an explicit alias — otherwise the generic path
# runs so output column names stay exactly what Spark SQL would emit.

_FAST_AGG_BLOCKERS = re.compile(
    r"\b(GROUP|HAVING|ORDER|LIMIT|JOIN|UNION|INTERSECT|EXCEPT|MINUS"
    r"|DISTINCT|WITH|WINDOW|OVER|LATERAL|TABLESAMPLE|QUALIFY)\b",
    re.IGNORECASE,
)
_AGG_ITEM = re.compile(
    rf"""^\s*(?P<fn>count|min|max)\s*\(\s*(?P<col>\*|{_IDENT})\s*\)
         \s+AS\s+(?P<alias>{_IDENT})\s*$""",
    re.IGNORECASE | re.VERBOSE,
)


def _extract_prunable(query: str) -> tuple[int, list] | None:
    """``(from_kw_offset, [(col, op, value), ...])`` when ``query`` is a
    single-table top-level SELECT whose WHERE is an AND-only conjunction
    containing at least one ``[alias.]col op literal`` conjunct —
    else None. Offsets index the query text (all masks are same-length).

    Soundness: the conjuncts are a SUBSET of the WHERE's top-level AND
    conjunction, so any row satisfying the full WHERE satisfies each of
    them — files excluded by their zone maps can contribute nothing. A
    top-level OR aborts everything (``a OR b AND c`` parses as
    ``a OR (b AND c)`` — no standalone conjunct exists); BETWEEN's
    internal AND yields non-matching fragments, which are skipped, never
    misread. Comments and string literals are blanked before any
    structural decision, and literal VALUES are sliced from the original
    text."""
    # comments/literal bodies blanked first, then paren interiors: the
    # scoping view sees only the top-level statement's own clauses
    top = _mask_tops(_mask_literals(query))
    if _PRUNE_BLOCKERS.search(top):
        return None
    froms = list(re.finditer(r"\bFROM\b", top, re.IGNORECASE))
    wheres = list(_WHERE_KW.finditer(top))
    if len(froms) != 1 or len(wheres) != 1:
        return None
    fm, wm = froms[0], wheres[0]
    if wm.start() < fm.end():
        return None
    # between the table reference and WHERE: nothing but an optional
    # alias (a comma-join, LATERAL VIEW, etc. would leave extra tokens)
    ref = _TRAVEL.match(_mask_literals(query), fm.start())
    if ref is None:
        return None
    seg = _FROM_TAIL.match(top[ref.end() : wm.start()])
    if seg is None:
        return None
    alias = (seg.group("alias") or "").lower()
    if alias in _SQL_KEYWORDS:
        return None
    names = {ref.group("name").lower(), alias} - {""}
    endm = _WHERE_END.search(top, wm.end())
    wend = endm.start() if endm else len(top)
    wmask = top[wm.end() : wend]
    if _TOP_OR.search(wmask):
        return None
    preds = []
    start = 0
    spans = [m.start() for m in _TOP_AND.finditer(wmask)] + [len(wmask)]
    prev = 0
    for i, cut in enumerate(spans):
        frag = query[wm.end() + prev : wm.end() + cut]
        prev = cut + 3  # past "AND"
        c = _CONJ.match(frag)
        if not c:
            continue
        if c.group("q") and c.group("q").lower() not in names:
            continue
        if c.group("col").lower() in _SQL_KEYWORDS:
            continue
        if c.group("num") is not None:
            tok = c.group("num")
            val = float(tok) if "." in tok else int(tok)
        else:
            val = c.group("str")[1:-1].replace("''", "'")
        preds.append((c.group("col"), c.group("op"), val))
    return (fm.start(), preds) if preds else None


class SqlLake:
    """Name -> LakeTable registry with a time-travel-aware ``sql()``."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, LakeTable] = {}
        self._seq = 0
        self.last_fast_agg: dict | None = None

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
        fast = self._fast_agg(query)
        if fast is not None:
            return fast
        views: list[str] = []
        # Match against a literal-masked copy (string/comment contents
        # blanked, parens intact): a quoted "... FROM transcripts ..."
        # inside a literal is data, not a reference. Spans on the mask
        # are valid offsets into the original; replacements splice back
        # by offset. Names the query itself binds (WITH ctes, WINDOW
        # defs — "<name> AS (") shadow registered tables, as in SQL.
        mask = _mask_literals(query)
        shadowed = {c.group(1).lower() for c in _CTE_DEF.finditer(mask)}
        # single-table SELECTs hoist their WHERE's simple conjuncts into
        # read(where=...) so the manifest zone maps can skip whole files;
        # the SQL text is NOT rewritten — its WHERE still applies in full
        prunable = _extract_prunable(query)
        pieces: list[str] = []
        pos = 0
        for m in _TRAVEL.finditer(mask):
            name = m.group("name")
            t = self._tables.get(name)
            cj = _COMMA_JOIN.match(mask, m.end())
            if cj and cj.group(1) in self._tables:
                raise ValueError(
                    f"comma-style join 'FROM {name}, {cj.group(1)}' is not "
                    "supported for registered lake tables — use an "
                    "explicit JOIN so each reference can resolve (and "
                    "carry its own travel clause)"
                )
            if t is None or name.lower() in shadowed:
                continue  # not ours: CTE / temp view / catalog table
            where = (
                prunable[1]
                if prunable is not None and m.start() == prunable[0]
                else None
            )
            df = self._resolve(t, m, query, where=where)
            self._seq += 1
            view = f"__lake_{name}_{self._seq}"
            df.createOrReplaceTempView(view)
            views.append(view)
            pieces.append(query[pos : m.start()])
            pieces.append(f"{m.group('kw')} {view}")
            pos = m.end()
        pieces.append(query[pos:])
        rewritten = "".join(pieces)
        try:
            return self.spark.sql(rewritten)
        finally:
            for v in views:
                self.spark.catalog.dropTempView(v)

    def _fast_agg(self, query: str) -> DataFrame | None:
        """Route a bare global-aggregate SELECT over one registered
        table to :meth:`LakeTable.stats_agg` (metadata-answered
        count/min/max), honoring @branch and a single travel pin.
        Returns None — run the generic path — on ANY structure this
        can't prove equivalent; the generic path computes the same
        answer by scan, so the route is only ever an optimization.
        ``self.last_fast_agg`` records the serve report (how many
        buckets were metadata-answered vs scanned) for observability."""
        mask = _mask_literals(query)
        top = _mask_tops(mask)
        sel = re.match(r"^\s*SELECT\b", top, re.IGNORECASE)
        if sel is None or _FAST_AGG_BLOCKERS.search(top):
            return None
        froms = list(re.finditer(r"\bFROM\b", top, re.IGNORECASE))
        if len(froms) != 1:
            return None
        fm = froms[0]
        ref = _TRAVEL.match(mask, fm.start())
        if ref is None or ref.group("meta"):
            return None
        t = self._tables.get(ref.group("name"))
        if t is None:
            return None
        tail = top[ref.end():]
        wkw = re.match(r"\s*WHERE\b", tail, re.IGNORECASE)
        where = None
        if wkw:
            # a WHERE routes only when EVERY top-level conjunct is a
            # simple `col op literal` (unlike _extract_prunable, which
            # hoists a SUBSET and leaves the SQL to re-filter, this
            # predicate IS the filter — partial coverage would be wrong)
            wtop = tail[wkw.end():]
            if _TOP_OR.search(wtop):
                return None
            base = ref.end() + wkw.end()
            spans = [x.start() for x in _TOP_AND.finditer(wtop)]
            spans.append(len(wtop))
            prev = 0
            where = []
            for cut in spans:
                frag = query[base + prev: base + cut].rstrip("; \t\r\n")
                prev = cut + 3  # past "AND"
                c = _CONJ.match(frag)
                if c is None or c.group("q"):
                    return None
                if c.group("num") is not None:
                    tok = c.group("num")
                    val = float(tok) if "." in tok else int(tok)
                else:
                    val = c.group("str")[1:-1].replace("''", "'")
                where.append((c.group("col"), c.group("op"), val))
        elif tail.strip(" \t\r\n;"):
            return None  # trailing clauses (alias etc.) — generic path
        items = _split_top(mask[sel.end(): fm.start()])
        normd: list[tuple[str, str, str]] = []
        for it in items:
            im = _AGG_ITEM.match(it)
            if im is None:
                return None
            normd.append(
                (im.group("fn").lower(), im.group("col"), im.group("alias"))
            )
        branch = ref.group("branch")
        if branch and branch != t.branch:
            t = LakeTable(
                t.spark, t.root, n_buckets=t.n_buckets, branch=branch
            )
        clauses = (
            query[ref.start("clauses"): ref.end("clauses")]
            if ref.group("clauses")
            else ""
        )
        vms = list(_VERSION.finditer(clauses))
        sms = list(_SYSTIME.finditer(clauses))
        if len(vms) + len(sms) > 1:
            raise ValueError(
                "one travel pin per reference (VERSION AS OF or "
                "SYSTEM_TIME AS OF, not several): "
                + query[ref.start(): ref.end()].strip()
            )
        version = None
        if vms:
            version = self._pin_version(t, vms[0])
        elif sms:
            version = t.version_as_of(datetime.fromisoformat(sms[0].group(1)))
        # SQL identifiers are case-insensitive; stats_agg wants schema case
        sch = t.schema(version)
        byname = {f.name.lower(): f.name for f in sch.fields} if sch else {}
        resolved = []
        for fn, col, alias in normd:
            if col != "*":
                col = byname.get(col.lower())
                if col is None:
                    return None  # let the generic path raise Spark's error
            resolved.append((fn, col, alias))
        if where is not None:
            fixed = []
            for col, op, val in where:
                col = byname.get(col.lower())
                if col is None:
                    return None
                fixed.append((col, op, val))
            where = fixed
        out, report = t.stats_agg(
            resolved, version=version, where=where, return_report=True
        )
        self.last_fast_agg = report
        return out

    def _resolve(
        self, t: LakeTable, m: re.Match, query: str, where=None
    ) -> DataFrame:
        """``m`` matched against the literal-masked copy of ``query``;
        the mask is same-length, so group spans index the original —
        clause text (which may hold quoted tags/timestamps) is sliced
        from ``query``, never taken from the mask.

        ``where`` — hoisted WHERE conjuncts (see _extract_prunable) —
        reaches only plain data reads, filtered to columns of the PINNED
        schema (a conjunct on a query-side alias or a column the
        snapshot predates simply doesn't prune; the SQL text still
        errors or filters exactly as before)."""
        ref = query[m.start() : m.end()].strip()
        branch = m.group("branch")
        meta = (m.group("meta") or "").lower() or None
        if meta and branch:
            raise ValueError(
                "metadata tables do not compose with @branch (use a "
                "branch-constructed LakeTable registration instead): " + ref
            )
        if branch and branch != t.branch:
            # branch instances share manifests/data; the constructor
            # adopts key/bucket spec from the manifest, so only the
            # pointer differs
            t = LakeTable(t.spark, t.root, n_buckets=t.n_buckets, branch=branch)
        clauses = query[m.start("clauses") : m.end("clauses")] if m.group(
            "clauses"
        ) else ""
        vms = list(_VERSION.finditer(clauses))
        sms = list(_SYSTIME.finditer(clauses))
        if meta == "diff" and len(vms) == 2 and not sms:
            # two pins: everything changed FROM the first snapshot TO
            # the second — the Python diff(from, to) span read
            return t.diff(
                self._pin_version(t, vms[0]), self._pin_version(t, vms[1])
            )
        if len(vms) + len(sms) > 1:
            raise ValueError(
                "one travel pin per reference (VERSION AS OF or "
                "SYSTEM_TIME AS OF, not several): " + ref
            )
        vm = vms[0] if vms else None
        sm = sms[0] if sms else None
        if meta:
            return self._meta_df(t, meta, vm, sm, ref)
        version = None
        if vm:
            version = self._pin_version(t, vm)
        elif sm:
            version = t.version_as_of(datetime.fromisoformat(sm.group(1)))
        if where:
            sch = t.schema(version)
            byname = (
                {f.name.lower(): f.name for f in sch.fields} if sch else {}
            )
            where = [
                (byname[c.lower()], op, v)
                for c, op, v in where
                if c.lower() in byname
            ] or None
        return t.read(version=version, where=where)

    @staticmethod
    def _pin_version(t: LakeTable, vm: re.Match) -> int:
        tok = vm.group(1)
        return t.tag_version(tok[1:-1]) if tok.startswith("'") else int(tok)

    def _meta_df(self, t: LakeTable, meta: str, vm, sm, ref: str) -> DataFrame:
        """Metadata tables (the Iceberg ``table.history`` family):
        ``history`` / ``lineage`` / ``tags`` / ``branches`` take no pin;
        ``files`` and ``changes`` accept ``VERSION AS OF <id|'tag'>``
        (files AT a snapshot; the changelog OF a commit); ``diff``
        REQUIRES one (everything changed SINCE that baseline snapshot,
        classified delete/revoke/upsert) and accepts TWO (changes from
        the first snapshot to the second — handled in _resolve)."""
        if sm or (vm and meta not in ("files", "changes", "diff")):
            raise ValueError(
                f"metadata table .{meta} does not accept this travel "
                f"clause: {ref}"
            )
        version = None
        if vm:
            version = self._pin_version(t, vm)
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
                    "OF <id|'tag'> [VERSION AS OF <to_id|'tag'>]"
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
        if kind == "CALL":
            return self._call(query)
        if kind == "SHOW":
            return self._show_tables(query)
        if kind in ("DESCRIBE", "DESC"):
            return self._describe(query)
        if batch_id is None:
            import uuid

            batch_id = f"sql-{kind.lower()}-{uuid.uuid4().hex}"
        if kind == "DELETE":
            r = self._delete(query, batch_id)
        elif kind == "UPDATE":
            r = self._update(query, batch_id)
        elif kind == "INSERT":
            r = self._insert(query, batch_id)
        elif kind == "CREATE":
            r = self._create(query, batch_id)
        elif kind == "ALTER":
            r = self._alter(query, batch_id)
        elif kind == "DROP":
            r = self._drop_table(query, batch_id)
        else:
            r = self._merge(query, batch_id)
        stmt = r.pop("statement", kind.lower())
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
            None if r.get("version") is None else int(r["version"]),
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
            col = am.group("col")
            if col.lower() in {c.lower() for c in assignments}:
                # SQL engines reject duplicate SET targets; silently
                # keeping the last would commit a typo'd UPDATE half-done
                raise ValueError(
                    f"duplicate SET assignment to column {col!r}"
                )
            assignments[col] = am.group("expr").strip()
        return t.update_where(cond, assignments, batch_id=batch_id)

    def _create(self, query: str, batch_id: str) -> dict:
        """``CREATE [OR REPLACE] TABLE [IF NOT EXISTS] <name>
        LOCATION '<path>' KEY (k, ...) [ORDER BY (o, ...)] [BUCKETS n]
        [STATS (c, ...)] AS <select>`` — CTAS for the lake: builds a
        LakeTable at the
        location (atomic overwrite commit; the reference's
        truncate-and-reload materialization,
        ``gc_ingest/tools/db/utils.py:97-116``), registers it under
        ``name``, and the AS query resolves through this front-end
        (CTAS from a travel read or another lake table works). KEY and
        ORDER BY declare the engine's merge identity and LWW order —
        there is no catalog to infer them from, so KEY is mandatory
        and ORDER BY defaults to the LakeTable default only when the
        select provides those columns. Semantics at an occupied
        location: plain CREATE refuses (never silently clobber), IF
        NOT EXISTS adopts the existing table unchanged, OR REPLACE
        replaces its contents as a new time-travelable snapshot."""
        m = _CREATE_RE.match(query)
        if not m:
            raise ValueError(f"cannot parse CREATE TABLE statement: {query!r}")
        if m.group("replace") and m.group("ine"):
            raise ValueError("CREATE: OR REPLACE and IF NOT EXISTS conflict")
        name = m.group("name")
        keys = tuple(
            k.strip() for k in m.group("keys").split(",") if k.strip()
        )
        if not keys:
            raise ValueError("CREATE: empty KEY column list")
        order = None
        if m.group("order") is not None:
            order = tuple(
                o.strip() for o in m.group("order").split(",") if o.strip()
            )
            if not order:
                raise ValueError("CREATE: empty ORDER BY column list")
        nb = int(m.group("nb")) if m.group("nb") else 32
        kwargs = {"key_cols": keys, "n_buckets": nb}
        if order:
            kwargs["order_cols"] = order
        if m.group("stats") is not None:
            # STATS (col, ...) picks the zone-map columns (default:
            # key+order); STATS () disables commit-time footer stats
            kwargs["stats_cols"] = tuple(
                c.strip() for c in m.group("stats").split(",") if c.strip()
            )
        if m.group("codec"):
            # CODEC 'zstd' — parquet compression for this table's writes
            kwargs["codec"] = m.group("codec").lower()
        t = LakeTable(self.spark, m.group("loc"), **kwargs)
        if t.current_version() > 0:
            if m.group("ine"):
                self.register(name, t)
                return {"skipped": True, "batch_id": batch_id,
                        "version": t.current_version()}
            if not m.group("replace"):
                raise ValueError(
                    f"location {m.group('loc')!r} already holds a table "
                    "(v{}) — use CREATE OR REPLACE to replace its "
                    "contents or IF NOT EXISTS to adopt it".format(
                        t.current_version()
                    )
                )
        df = self.sql(m.group("select"))
        r = t.overwrite(df, batch_id=batch_id)
        self.register(name, t)
        return r

    def _alter(self, query: str, batch_id: str) -> dict:
        """``ALTER TABLE <t> ADD COLUMN[S] (a TYPE, ...)`` /
        ``RENAME COLUMN a TO b`` / ``DROP COLUMN a`` — the SQL forms of
        the engine's metadata-only schema evolution
        (:meth:`LakeTable.add_columns` / ``rename_column`` /
        ``drop_column``): no data rewritten, resurrection-guarded,
        propagated to synced copies via the manifest ``ddl``/rename
        stamps. Column definitions take Spark DDL types
        (``bigint``, ``array<string>``, ``decimal(10,2)``, ...);
        the parens around a multi-column ADD are optional."""
        m = _ALTER_RE.match(query)
        if not m:
            raise ValueError(f"cannot parse ALTER TABLE statement: {query!r}")
        t = self._target(m.group("name"), m.group("branch"), "ALTER")
        action = m.group("action").strip()
        rm = _ALTER_RENAME.match(action)
        if rm:
            r = t.rename_column(rm.group("old"), rm.group("new"))
            return {**r, "batch_id": batch_id, "statement": "alter"}
        dm = _ALTER_DROPCOL.match(action)
        if dm:
            r = t.drop_column(dm.group("col"))
            return {**r, "batch_id": batch_id, "statement": "alter"}
        am = _ALTER_ADD.match(action)
        if am:
            defs = am.group("defs").strip()
            if defs.startswith("("):
                mask = _mask_tops(defs)
                close = mask.find(")")
                if close < 0 or defs[close + 1 :].strip():
                    raise ValueError(
                        f"cannot parse ADD COLUMNS list: {defs!r}"
                    )
                defs = defs[1:close]
            cols: dict[str, str] = {}
            for piece in _split_top(defs):
                cm = _COL_DEF.match(piece)
                if not cm:
                    raise ValueError(
                        f"cannot parse column definition: {piece.strip()!r}"
                    )
                cols[cm.group("name")] = cm.group("type")
            r = t.add_columns(cols)
            return {**r, "batch_id": batch_id, "statement": "alter"}
        raise ValueError(
            "unsupported ALTER TABLE action (expected ADD COLUMN[S] / "
            f"RENAME COLUMN a TO b / DROP COLUMN a): {action!r}"
        )

    def _drop_table(self, query: str, batch_id: str) -> dict:
        """``DROP TABLE [IF EXISTS] <name>`` — deregisters the name from
        this SqlLake. The lake has no central catalog: manifests and
        data files stay on disk untouched (Iceberg's DROP TABLE without
        PURGE), so re-registering — or pointing a new CREATE at the
        location with IF NOT EXISTS — restores access."""
        m = _DROP_TABLE_RE.match(query)
        if not m:
            raise ValueError(
                f"cannot parse DROP TABLE statement (only DROP TABLE "
                f"[IF EXISTS] <name> is supported): {query!r}"
            )
        name = m.group("name")
        t = self._tables.get(name)
        if t is None:
            if m.group("ie"):
                return {"statement": "drop_table", "batch_id": batch_id,
                        "skipped": True, "version": None}
            raise ValueError(f"DROP TABLE targets unregistered table {name!r}")
        del self._tables[name]
        return {"statement": "drop_table", "batch_id": batch_id,
                "skipped": False, "version": t.current_version()}

    def _show_tables(self, query: str) -> DataFrame:
        """``SHOW TABLES`` — one row per registered table: name,
        location, branch, head version. ``SHOW CREATE TABLE <name>`` —
        the canonical DDL that would recreate the table's spec through
        this front-end (location, key/order columns, bucket count, and
        the STATS clause when it differs from the key+order default)."""
        mc = _SHOW_CREATE_RE.match(query)
        if mc:
            return self._show_create(mc)
        if not _SHOW_RE.match(query):
            raise ValueError(
                "cannot parse SHOW statement (SHOW TABLES / "
                f"SHOW CREATE TABLE <name>): {query!r}"
            )
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("name", T.StringType(), False),
                T.StructField("location", T.StringType(), False),
                T.StructField("branch", T.StringType(), False),
                T.StructField("version", T.LongType(), False),
            ]
        )
        rows = sorted(
            (n, str(t.root), t.branch, int(t.current_version()))
            for n, t in self._tables.items()
        )
        return self.spark.createDataFrame(rows, schema)

    def _show_create(self, m: re.Match) -> DataFrame:
        name = m.group("name")
        t = self._target(name, m.group("branch"), "SHOW CREATE TABLE")
        parts = [
            f"CREATE TABLE {name}",
            f"LOCATION '{t.root}'",
            f"KEY ({', '.join(t.key_cols)})",
            f"ORDER BY ({', '.join(t.order_cols)})",
            f"BUCKETS {t.n_buckets}",
        ]
        default_stats = tuple(dict.fromkeys(t.key_cols + t.order_cols))
        if tuple(t.stats_cols) != default_stats:
            parts.append(f"STATS ({', '.join(t.stats_cols)})")
        if t.codec != "snappy":
            parts.append(f"CODEC '{t.codec}'")
        ddl = " ".join(parts)
        from pyspark.sql import types as T

        return self.spark.createDataFrame(
            [(name, ddl)],
            T.StructType([
                T.StructField("table", T.StringType(), False),
                T.StructField("create_statement", T.StringType(), False),
            ]),
        )

    def _describe(self, query: str) -> DataFrame:
        """``DESCRIBE [TABLE] <name>[@branch]`` — one row per stored
        column: name, Spark DDL type, nullability, and its role in the
        table spec (``key`` / ``order`` / ``''``). Internal columns
        (``__``-prefixed) are hidden, as in ``read()``."""
        m = _DESC_RE.match(query)
        if not m:
            raise ValueError(f"cannot parse DESCRIBE statement: {query!r}")
        t = self._target(m.group("name"), m.group("branch"), "DESCRIBE")
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("col_name", T.StringType(), False),
                T.StructField("data_type", T.StringType(), False),
                T.StructField("nullable", T.BooleanType(), False),
                T.StructField("role", T.StringType(), False),
            ]
        )
        sch = t.schema()
        rows = []
        for f in sch.fields if sch is not None else []:
            if f.name.startswith("__"):
                continue
            role = (
                "key" if f.name in t.key_cols
                else "order" if f.name in t.order_cols
                else ""
            )
            rows.append(
                (f.name, f.dataType.simpleString(), bool(f.nullable), role)
            )
        return self.spark.createDataFrame(rows, schema)

    def _insert(self, query: str, batch_id: str) -> dict:
        """``INSERT INTO t[@branch] [(cols)] SELECT ...`` /
        ``VALUES (...), ...`` — the statement a SQL user types first,
        routed to the engine's exactly-once MERGE with ``op='insert'``
        (the reference's loader is insert-first for the same reason:
        ``gc_ingest/tools/load/utils.py:223-278``). Rows must carry the
        key and order columns (via the column list or the SELECT's
        aliases); a row whose key already exists upserts under the LWW
        order guard, exactly like a replayed insert event — so INSERT
        is safe to retry and safe against out-of-order arrival, instead
        of failing on duplicates. ``VALUES`` requires a column list
        (there are no positional names to adopt); a SELECT with a
        column list is renamed positionally.

        ``INSERT OVERWRITE [TABLE] t`` routes to :meth:`LakeTable.overwrite`
        — the atomic truncate-and-reload (CREATE OR REPLACE semantics:
        the replacement schema is the source's, pre-replace snapshots
        stay time-travelable, the applied-batch history carries
        forward)."""
        m = _INSERT_RE.match(query)
        if not m:
            raise ValueError(f"cannot parse INSERT statement: {query!r}")
        t = self._target(m.group("name"), m.group("branch"), "INSERT")
        cols = None
        rest = m.group("rest").strip()
        colstext = m.group("cols")
        if colstext is not None:
            if re.match(r"^\s*(SELECT|VALUES|WITH)\b", colstext, re.IGNORECASE):
                # "(SELECT ...)" body, not a column list — reattach
                rest = f"({colstext}) {rest}".strip()
            else:
                cols = [c.strip() for c in colstext.split(",") if c.strip()]
                if not cols:
                    raise ValueError("INSERT: empty column list")
        if not rest:
            raise ValueError("INSERT: missing SELECT or VALUES body")
        if re.match(r"^VALUES\b", rest, re.IGNORECASE):
            if cols is None:
                raise ValueError(
                    "INSERT ... VALUES requires a column list: "
                    "INSERT INTO t (k, ord, payload, ...) VALUES (...)"
                )
            source = self.spark.sql(
                f"SELECT * FROM {rest} AS __ins({', '.join(cols)})"
            )
        else:
            body = rest
            if body.startswith("("):
                inner_mask = _mask_tops(body)
                close = inner_mask.find(")")
                if close < 0 or body[close + 1 :].strip():
                    raise ValueError(f"cannot parse INSERT body: {rest!r}")
                body = body[1:close]
            source = self.sql(body)
            if cols is not None:
                if len(cols) != len(source.columns):
                    raise ValueError(
                        f"INSERT column list has {len(cols)} names but the "
                        f"query produces {len(source.columns)} columns"
                    )
                source = source.toDF(*cols)
        from pyspark.sql import functions as F

        if m.group("mode").upper() != "INTO":
            return t.overwrite(source, batch_id=batch_id)
        return t.merge(
            source.withColumn("op", F.lit("insert")), batch_id=batch_id
        )

    # procedures a SQL user can CALL on a registered table — each maps
    # 1:1 to the Python ops surface and returns (procedure, table,
    # result-JSON) as one row. Literal arguments only (the ops take
    # versions, names, and thresholds — never expressions).
    _PROCS = {
        "rollback_to_snapshot", "tag", "drop_tag", "create_branch",
        "drop_branch", "fast_forward", "expire_snapshots",
        "expire_tombstones", "compact", "rebucket", "rename_column",
        "maintain", "cluster_by", "verify", "verify_layout",
    }

    def _call(self, query: str) -> DataFrame:
        """``CALL <table>[@branch].<procedure>(<literal args>)`` — the
        SQL maintenance/ops surface (Iceberg's ``CALL system.*``
        procedures; reference analog: the snapshot/restore tooling,
        ``gc_ingest/tools/snapshot/utils.py:158-257``). Routes to the
        same Python methods, so exactly-once / OCC / retention rules
        are identical. Returns one row: procedure, table, and the
        result as canonical sorted-key JSON (version numbers, counts,
        compacted buckets — whatever the op reports)."""
        m = _CALL_RE.match(query)
        if not m:
            raise ValueError(
                "cannot parse CALL (expected CALL <table>[@branch]"
                f".<procedure>(args)): {query!r}"
            )
        name, proc = m.group("name"), m.group("proc").lower()
        t = self._target(name, m.group("branch"), "CALL")
        if proc not in self._PROCS:
            raise ValueError(
                f"unknown procedure {proc!r} (have: {sorted(self._PROCS)})"
            )
        args: list = []
        raw = m.group("args").strip()
        if raw:
            for piece in _split_top(raw):
                am = _CALL_ARG.match(piece)
                if not am:
                    raise ValueError(
                        f"CALL arguments must be literals, got: {piece.strip()!r}"
                    )
                if am.group("str") is not None:
                    args.append(am.group("str")[1:-1].replace("''", "'"))
                elif am.group("num") is not None:
                    n = am.group("num")
                    args.append(float(n) if "." in n else int(n))
                elif am.group("bool") is not None:
                    args.append(am.group("bool").lower() == "true")
                else:
                    args.append(None)
        result = getattr(t, proc)(*args)
        import json

        if result is None:
            result = {}
        elif not isinstance(result, dict):
            result = {"result": result}
        # every report carries the head version the call left behind
        result = {**result, "table_version": t.current_version()}
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("procedure", T.StringType(), False),
                T.StructField("table", T.StringType(), False),
                T.StructField("result", T.StringType(), False),
            ]
        )
        return self.spark.createDataFrame(
            [(proc, name, json.dumps(result, sort_keys=True, default=str))],
            schema,
        )

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
