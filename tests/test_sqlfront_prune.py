"""SQL WHERE-conjunct hoisting into zone-map file skipping.

A single-table SELECT's simple top-level conjuncts reach
``read(where=...)`` so manifest stats skip files; the SQL keeps its full
WHERE (hoisting is redundant, never substitutive). Extraction must bail
on anything unprovable — these tests pin both directions: pruning fires
on the simple shapes, and every structural hazard disables it without
changing results.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import gamechanger_data_spark.sinks.table as table_mod
from gamechanger_data_spark.plans.sqlfront import SqlLake, _extract_prunable
from gamechanger_data_spark.sinks.table import LakeTable

SCH = T.StructType([
    T.StructField("k", T.IntegerType()),
    T.StructField("ts", T.LongType()),
    T.StructField("val", T.StringType()),
    T.StructField("op", T.StringType()),
])


@pytest.fixture
def lake(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(table_mod, "FOLD_TARGET_PARTITION_BYTES", 1024)
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    mk = lambda ts0: spark.createDataFrame(
        [(i, ts0 + i * 10, f"v{i}", "upsert") for i in range(400)], SCH
    )
    t.merge(mk(0), "b0")
    t.merge(mk(1), "b1")  # CoW fold -> multi-file range-split buckets
    assert max(len(fl) for fl in t._load_manifest()["files"].values()) > 1
    return SqlLake(spark).register("tr", t), t


# ---------------- extraction unit ------------------------------------


def test_extract_simple_conjunction():
    off, preds = _extract_prunable(
        "SELECT k FROM tr WHERE ts >= 100 AND k < 5 AND val = 'x''y'"
    )
    assert preds == [("ts", ">=", 100), ("k", "<", 5), ("val", "=", "x'y")]


def test_extract_alias_qualified():
    _, preds = _extract_prunable(
        "SELECT a.k FROM tr AS a WHERE a.ts >= 100 AND b.k < 5"
    )
    assert preds == [("ts", ">=", 100)]  # unknown qualifier b -> dropped


def test_extract_bails():
    # top-level OR: a OR (b AND c) — no standalone conjunct survives
    assert _extract_prunable("SELECT * FROM tr WHERE k = 1 OR ts > 5 AND k < 9") is None
    # joins / set ops / comma joins / two WHEREs (only via set ops)
    assert _extract_prunable("SELECT * FROM tr JOIN u ON tr.k = u.k WHERE tr.k = 1") is None
    assert _extract_prunable(
        "SELECT k FROM tr WHERE k = 1 UNION SELECT k FROM tr WHERE k = 2"
    ) is None
    assert _extract_prunable("SELECT * FROM tr, u WHERE k = 1") is None
    # no WHERE at all
    assert _extract_prunable("SELECT * FROM tr") is None
    # only un-hoistable conjuncts
    assert _extract_prunable("SELECT * FROM tr WHERE upper(val) = 'X'") is None
    assert _extract_prunable("SELECT * FROM tr WHERE k IN (1, 2)") is None
    assert _extract_prunable("SELECT * FROM tr WHERE k != 3") is None


def test_extract_between_and_subquery_fragments():
    # BETWEEN's internal AND splits into non-matching fragments — the
    # clean conjunct still hoists, nothing is misread
    _, preds = _extract_prunable(
        "SELECT * FROM tr WHERE ts BETWEEN 10 AND 20 AND k = 3"
    )
    assert preds == [("k", "=", 3)]
    _, preds = _extract_prunable(
        "SELECT * FROM tr WHERE k IN (SELECT k FROM u WHERE ts > 5) AND k = 3"
    )
    assert preds == [("k", "=", 3)]


def test_extract_masks_literals_and_comments():
    # 'FROM tr' inside a literal and a commented OR must not confuse scoping
    q = ("SELECT * FROM tr -- WHERE k = 1 OR junk\n"
         "WHERE val = 'copied FROM tr WHERE 1 OR 2' AND k = 3")
    _, preds = _extract_prunable(q)
    assert preds == [("val", "=", "copied FROM tr WHERE 1 OR 2"), ("k", "=", 3)]


def test_extract_where_on_group_query():
    _, preds = _extract_prunable(
        "SELECT k, count(*) AS n FROM tr WHERE ts >= 100 GROUP BY k ORDER BY k"
    )
    assert preds == [("ts", ">=", 100)]


# ---------------- end-to-end through sql() ----------------------------


def test_sql_select_prunes_and_matches(lake):
    sqll, t = lake
    got = sqll.sql("SELECT k, ts FROM tr WHERE k < 50 ORDER BY k")
    rep = dict(t.last_scan_report)
    rows = got.collect()
    assert [r["k"] for r in rows] == list(range(50))
    assert [r["ts"] for r in rows] == [1 + i * 10 for i in range(50)]
    assert rep["pruned_files"] > 0


def test_sql_travel_with_where_prunes_old_snapshot(lake):
    sqll, t = lake
    got = sqll.sql("SELECT k, ts FROM tr VERSION AS OF 1 WHERE k = 7")
    assert got.collect()[0]["ts"] == 70  # pre-fold state
    # v1 predates the fold (one file per bucket) — nothing to skip, but
    # the hoist must not break the pinned read
    assert sqll.sql(
        "SELECT count(*) AS n FROM tr WHERE ts >= 3000 AND ts < 3500"
    ).collect()[0]["n"] == 50


def test_sql_or_where_still_correct_without_pruning(lake):
    sqll, t = lake
    got = sqll.sql("SELECT count(*) AS n FROM tr WHERE k = 1 OR k = 399")
    rep = dict(t.last_scan_report)
    assert got.collect()[0]["n"] == 2
    assert rep["pruned_files"] == 0  # extraction bailed, full scan


def test_sql_join_unaffected(lake):
    sqll, t = lake
    n = sqll.sql(
        "SELECT count(*) AS n FROM tr a JOIN tr b ON a.k = b.k "
        "WHERE a.k < 10"
    ).collect()[0]["n"]
    assert n == 10


def test_sql_unknown_column_conjunct_does_not_prune_or_break(lake):
    sqll, t = lake
    # d is a SELECT alias — not a table column; the hoist must drop it
    # (schema filter) and Spark itself resolves the query as before
    got = sqll.sql(
        "SELECT k + 1 AS d FROM tr WHERE k = 3 AND ts >= 0"
    ).collect()
    assert [r["d"] for r in got] == [4]


def test_sql_cte_shadow_not_pruned(lake):
    sqll, t = lake
    # tr is shadowed by the CTE: no lake resolution, no hoisting crash
    got = sqll.sql(
        "WITH tr AS (SELECT 1 AS k) SELECT k FROM tr WHERE k = 1"
    ).collect()
    assert [r["k"] for r in got] == [1]


def test_ctas_stats_clause(spark, tmp_path, lake):
    sqll, t = lake
    loc = str(tmp_path / "ctas")
    r = sqll.sql(
        f"CREATE TABLE rolled LOCATION '{loc}' KEY (k) ORDER BY (ts) "
        "STATS (k, ts, val) AS SELECT k, ts, val, 'upsert' AS op FROM tr"
    )
    dst = sqll._tables["rolled"]
    assert dst.stats_cols == ("k", "ts", "val")
    stats = dst._load_manifest()["stats"]
    assert stats and all(
        {k for k in s if not k.startswith("__")} <= {"k", "ts", "val"}
        for s in stats.values()
    )
    # STATS () disables stats entirely
    loc2 = str(tmp_path / "ctas2")
    sqll.sql(
        f"CREATE TABLE bare LOCATION '{loc2}' KEY (k) ORDER BY (ts) "
        "STATS () AS SELECT k, ts, val, 'upsert' AS op FROM tr"
    )
    assert "stats" not in sqll._tables["bare"]._load_manifest()
