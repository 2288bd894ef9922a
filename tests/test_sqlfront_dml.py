"""SqlLake DML: DELETE FROM / UPDATE ... SET / MERGE INTO statements
routed to the engine's exactly-once predicate-DML and MERGE commits.

The SQL text is the same surface Delta/Iceberg users write; semantics
are the engine's (LWW on key columns, tombstone deletes, OCC). MERGE
accepts only the canonical upsert clause pair (optionally with the
op='delete' passthrough clause)."""

import pytest
from pyspark.sql import types as T

from gamechanger_data_spark.plans.sqlfront import SqlLake
from gamechanger_data_spark.sinks.table import LakeTable

SCH = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("ts", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("op", T.StringType()),
])


@pytest.fixture()
def lake(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(spark.createDataFrame(
        [("a", 10, "alpha", "upsert"), ("b", 10, "beta", "upsert"),
         ("c", 10, "gamma", "upsert"), ("d", 10, "delta", "upsert")],
        SCH), "b0")
    return SqlLake(spark).register("tt", t), t


def _state(t):
    return {r["k"]: r["v"] for r in t.read().collect()}


def test_update_set_where_and_stats(spark, lake):
    lk, t = lake
    # commas inside the SET expression and a WHERE-word string literal
    # must not confuse the splitter; only matching rows change
    r = lk.sql(
        "UPDATE tt SET v = concat(v, ', where=', k) WHERE k IN ('a', 'b')"
    ).collect()[0]
    assert (r["statement"], r["skipped"], r["rows_hit"]) == ("update", False, 2)
    assert r["version"] == t.current_version()
    assert _state(t) == {"a": "alpha, where=a", "b": "beta, where=b",
                         "c": "gamma", "d": "delta"}


def test_update_without_where_hits_all_rows(spark, lake):
    lk, t = lake
    r = lk.sql("UPDATE tt SET v = upper(v)").collect()[0]
    assert r["rows_hit"] == 4
    assert _state(t) == {"a": "ALPHA", "b": "BETA", "c": "GAMMA", "d": "DELTA"}


def test_delete_where_and_delete_all(spark, lake):
    lk, t = lake
    r = lk.sql("DELETE FROM tt WHERE v = 'gamma'").collect()[0]
    assert (r["statement"], r["rows_hit"]) == ("delete", 1)
    assert sorted(_state(t)) == ["a", "b", "d"]
    # bare DELETE FROM tombstones every live row
    assert lk.sql("DELETE FROM tt").collect()[0]["rows_hit"] == 3
    assert t.read().count() == 0


def test_exactly_once_by_batch_id(spark, lake):
    lk, t = lake
    r1 = lk.sql("DELETE FROM tt WHERE k = 'a'", batch_id="del-a").collect()[0]
    r2 = lk.sql("DELETE FROM tt WHERE k = 'a'", batch_id="del-a").collect()[0]
    assert (r1["skipped"], r2["skipped"]) == (False, True)
    assert r2["version"] == r1["version"] == t.current_version()
    # without a batch_id every call executes (fresh generated id)
    a = lk.sql("UPDATE tt SET v = concat(v, '!')").collect()[0]
    b = lk.sql("UPDATE tt SET v = concat(v, '!')").collect()[0]
    assert not a["skipped"] and not b["skipped"] and b["version"] > a["version"]


def test_merge_upsert_respects_lww_order(spark, lake):
    lk, t = lake
    src = spark.createDataFrame(
        [("a", 99, "alpha-new", "x"),   # newer: wins
         ("b", 1, "beta-stale", "x"),   # older than resident ts=10: loses
         ("e", 5, "epsilon", "x")],     # unmatched: inserted
        SCH).drop("op")
    src.createOrReplaceTempView("changes")
    r = lk.sql("""
        MERGE INTO tt USING changes c ON tt.k = c.k
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
    """).collect()[0]
    assert r["statement"] == "merge" and not r["skipped"]
    assert _state(t) == {"a": "alpha-new", "b": "beta", "c": "gamma",
                         "d": "delta", "e": "epsilon"}
    spark.catalog.dropTempView("changes")


def test_merge_using_subquery_resolves_through_frontend(spark, lake):
    """USING (subquery referencing the registered table) — the inner
    SELECT travels through the same resolver, so a self-referential
    patch query works."""
    lk, t = lake
    lk.sql("""
        MERGE INTO tt USING (
          SELECT k, ts + 100 AS ts, concat(v, ' [patched]') AS v
          FROM tt WHERE k = 'a'
        ) s ON tt.k = s.k
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
    """)
    assert _state(t)["a"] == "alpha [patched]"
    assert _state(t)["b"] == "beta"


def test_merge_delete_clause_needs_and_uses_op(spark, lake):
    lk, t = lake
    lk.sql("""
        MERGE INTO tt USING (
          SELECT k, ts + 100 AS ts, v, 'delete' AS op FROM tt WHERE k = 'd'
        ) s ON tt.k = s.k
        WHEN MATCHED AND s.op = 'delete' THEN DELETE
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
    """)
    assert sorted(_state(t)) == ["a", "b", "c"]
    with pytest.raises(ValueError, match="requires an 'op' column"):
        lk.sql("""
            MERGE INTO tt USING (SELECT k, ts + 200 AS ts, v FROM tt) s
            ON tt.k = s.k
            WHEN MATCHED AND s.op = 'delete' THEN DELETE
            WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
        """)


def test_dml_on_branch_leaves_main_untouched(spark, lake):
    lk, t = lake
    t.create_branch("audit")
    lk.sql("UPDATE tt@audit SET v = 'staged' WHERE k = 'a'")
    assert _state(t)["a"] == "alpha"
    audit = LakeTable(spark, t.root, n_buckets=4, branch="audit")
    assert {r["k"]: r["v"] for r in audit.read().collect()}["a"] == "staged"
    t.fast_forward("audit")
    assert _state(t)["a"] == "staged"


def test_error_paths(spark, lake):
    lk, t = lake
    with pytest.raises(ValueError, match="unregistered"):
        lk.sql("DELETE FROM nope WHERE k = 'a'")
    with pytest.raises(ValueError, match="cover exactly the key columns"):
        lk.sql("""
            MERGE INTO tt USING (SELECT 1 AS one) s ON tt.ts = s.ts
            WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
        """)
    with pytest.raises(ValueError, match="key-column equalities"):
        lk.sql("""
            MERGE INTO tt USING (SELECT 1 AS one) s ON tt.k = s.other
            WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
        """)
    with pytest.raises(ValueError, match="unsupported MERGE clauses"):
        lk.sql("""
            MERGE INTO tt USING (SELECT 'a' AS k, 99 AS ts, 'x' AS v) s
            ON tt.k = s.k WHEN MATCHED THEN DELETE
        """)
    with pytest.raises(ValueError, match="key/internal column"):
        lk.sql("UPDATE tt SET k = 'oops'")
    with pytest.raises(ValueError, match="empty WHERE"):
        lk.sql("UPDATE tt SET v = 'x' WHERE")
    with pytest.raises(ValueError, match="cannot parse SET"):
        lk.sql("UPDATE tt SET 'not an ident' WHERE k = 'a'")
    # nothing mutated by any refused statement
    assert _state(t) == {"a": "alpha", "b": "beta", "c": "gamma", "d": "delta"}
