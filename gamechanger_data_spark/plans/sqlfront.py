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

Unregistered names (CTEs, real temp views, catalog tables) pass through
untouched. Comma-style joins (``FROM a, b``) only resolve the first
name — use explicit ``JOIN`` for multi-table travel queries.

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

    def sql(self, query: str) -> DataFrame:
        """Run ``query`` with registered references resolved to pinned
        snapshots. Temp views are session-scoped and dropped before
        returning (classic-mode analysis is eager, so the returned
        DataFrame's plan no longer needs them)."""
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
        if vm:
            tok = vm.group(1)
            version = (
                t.tag_version(tok[1:-1]) if tok.startswith("'") else int(tok)
            )
            return t.read(version=version)
        if sm:
            return t.read(as_of=datetime.fromisoformat(sm.group(1)))
        return t.read()
