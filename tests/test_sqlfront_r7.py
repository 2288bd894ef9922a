"""Round-7 SqlLake surfaces: literal/CTE-safe reference resolution,
INSERT INTO, CALL maintenance procedures, two-pin .diff, and the
comma-join / duplicate-SET guard rails.

Reference analogs: insert-first upsert loader
(dataPipelines/gc_ingest/tools/load/utils.py:223-278) for INSERT INTO;
snapshot/restore tooling (gc_ingest/tools/snapshot/utils.py:158-257)
for the CALL procedures."""

import json

import pytest
from pyspark.sql import types as T

from gamechanger_data_spark.plans.sqlfront import SqlLake
from gamechanger_data_spark.sinks.table import LakeTable

SCH = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("ts", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("text", T.StringType()),
])


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(spark.createDataFrame(
        [("a", 1, "upsert", "alpha"), ("b", 1, "upsert", "beta")], SCH), "b0")
    t.merge(spark.createDataFrame([("c", 2, "upsert", "gamma")], SCH), "b1")
    return t


def _state(t):
    return {r["k"]: (r["ts"], r["text"]) for r in t.read().collect()}


# ---------------- literal / CTE masking (resolution safety) ----------


def test_string_literal_reference_not_rewritten(spark, table):
    """A quoted 'FROM tt' is data: the rewrite must not touch it."""
    lake = SqlLake(spark).register("tt", table)
    lit = "copied FROM tt yesterday"
    rows = lake.sql(
        f"SELECT k, '{lit}' AS note FROM tt WHERE k = 'a'").collect()
    assert rows[0]["note"] == lit


def test_comment_reference_not_rewritten(spark, table):
    lake = SqlLake(spark).register("tt", table)
    n = lake.sql(
        "SELECT count(*) AS n -- FROM tt VERSION AS OF 99\n"
        "FROM tt /* JOIN tt VERSION AS OF 99 */"
    ).collect()[0]["n"]
    assert n == 3


def test_cte_shadows_registered_table(spark, table):
    """WITH tt AS (...) binds tt for this query — the lake table must
    not hijack the CTE reference."""
    lake = SqlLake(spark).register("tt", table)
    n = lake.sql(
        "WITH tt AS (SELECT 1 AS k) SELECT count(*) AS n FROM tt"
    ).collect()[0]["n"]
    assert n == 1


def test_comma_join_with_registered_second_name_refused(spark, table):
    lake = SqlLake(spark).register("tt", table)
    lake.register("uu", table)
    with pytest.raises(ValueError, match="explicit JOIN"):
        lake.sql("SELECT * FROM tt, uu")
    # unregistered second name: plain Spark semantics, untouched
    spark.range(2).createOrReplaceTempView("plainv")
    assert lake.sql(
        "SELECT count(*) AS n FROM tt, plainv").collect()[0]["n"] == 6
    spark.catalog.dropTempView("plainv")


def test_multi_version_pins_refused(spark, table):
    lake = SqlLake(spark).register("tt", table)
    with pytest.raises(ValueError, match="one travel pin"):
        lake.sql("SELECT * FROM tt VERSION AS OF 1 VERSION AS OF 2")


# ---------------- two-pin .diff -------------------------------------


def test_diff_two_pins_spans_versions(spark, table):
    lake = SqlLake(spark).register("tt", table)
    d = {(r["k"], r["change_op"]) for r in lake.sql(
        "SELECT k, change_op FROM tt.diff VERSION AS OF 1 VERSION AS OF 2"
    ).collect()}
    assert d == {("c", "upsert")}
    # single pin still means "since that snapshot, to head"
    d1 = {r["k"] for r in lake.sql(
        "SELECT k FROM tt.diff VERSION AS OF 1").collect()}
    assert d1 == {"c"}


# ---------------- duplicate SET guard --------------------------------


def test_duplicate_set_assignment_refused(spark, table):
    lake = SqlLake(spark).register("tt", table)
    with pytest.raises(ValueError, match="duplicate SET"):
        lake.sql("UPDATE tt SET text = 'x', text = 'y' WHERE k = 'a'")


# ---------------- INSERT INTO ----------------------------------------


def test_insert_values_requires_column_list(spark, table):
    lake = SqlLake(spark).register("tt", table)
    with pytest.raises(ValueError, match="column list"):
        lake.sql("INSERT INTO tt VALUES ('z', 9, 'insert', 'zeta')")


def test_insert_values_and_exactly_once(spark, table):
    lake = SqlLake(spark).register("tt", table)
    r = lake.sql(
        "INSERT INTO tt (k, ts, op, text) VALUES ('z', 9, 'x', 'zeta'), "
        "('y', 9, 'x', 'psi')",
        batch_id="ins-1",
    ).collect()[0]
    assert r["statement"] == "insert" and not r["skipped"]
    assert _state(table)["z"] == (9, "zeta")
    assert _state(table)["y"] == (9, "psi")
    # the op column the user supplied is overridden to 'insert'
    # (verified by the rows landing live, not as tombstones)
    r2 = lake.sql(
        "INSERT INTO tt (k, ts, op, text) VALUES ('q', 1, 'x', 'dup')",
        batch_id="ins-1",
    ).collect()[0]
    assert r2["skipped"] and "q" not in _state(table)


def test_insert_select_lww_guard(spark, table):
    """INSERT of a key that exists upserts under the LWW order guard:
    newer wins, older loses — never a duplicate-key failure."""
    lake = SqlLake(spark).register("tt", table)
    lake.sql(
        "INSERT INTO tt SELECT k, ts + 10 AS ts, upper(text) AS text "
        "FROM tt WHERE k = 'a'",
        batch_id="ins-new",
    )
    assert _state(table)["a"] == (11, "ALPHA")
    lake.sql(
        "INSERT INTO tt (k, ts, op, text) VALUES ('a', 5, 'x', 'stale')",
        batch_id="ins-old",
    )
    assert _state(table)["a"] == (11, "ALPHA")  # stale insert lost
    assert len(_state(table)) == 3


def test_insert_select_column_list_renames_positionally(spark, table):
    lake = SqlLake(spark).register("tt", table)
    lake.sql(
        "INSERT INTO tt (k, ts, text) "
        "SELECT concat(k, '2'), ts, text FROM tt VERSION AS OF 1",
        batch_id="ins-cl",
    )
    s = _state(table)
    assert s["a2"] == (1, "alpha") and s["b2"] == (1, "beta")
    with pytest.raises(ValueError, match="column list has"):
        lake.sql("INSERT INTO tt (k, ts) SELECT k, ts, text FROM tt")


# ---------------- CALL procedures ------------------------------------


def _result(df):
    row = df.collect()[0]
    return row, json.loads(row["result"])


def test_call_tag_and_rollback(spark, table):
    lake = SqlLake(spark).register("tt", table)
    row, res = _result(lake.sql("CALL tt.tag('v1-state', 1)"))
    assert row["procedure"] == "tag" and row["table"] == "tt"
    assert table.tags() == {"v1-state": 1}
    v_before = table.current_version()
    _, res = _result(lake.sql("CALL tt.rollback_to_snapshot(1)"))
    assert res["table_version"] != v_before
    assert {r["k"] for r in table.read().collect()} == {"a", "b"}


def test_call_branch_lifecycle(spark, table):
    lake = SqlLake(spark).register("tt", table)
    lake.sql("CALL tt.create_branch('audit')")
    assert "audit" in table.branches()
    audit = LakeTable(spark, table.root, n_buckets=4, branch="audit")
    audit.merge(spark.createDataFrame(
        [("d", 3, "upsert", "delta")], SCH), "b-aud")
    _, res = _result(lake.sql("CALL tt.fast_forward('audit')"))
    assert "d" in _state(table)
    lake.sql("CALL tt.drop_branch('audit')")
    assert "audit" not in table.branches()


def test_call_maintain_reports(spark, table):
    lake = SqlLake(spark).register("tt", table)
    _, res = _result(lake.sql("CALL tt.maintain(1, 100, 3600.0)"))
    assert "compacted_buckets" in res and "expired_files" in res


def test_create_table_as_select(spark, table, tmp_path):
    """CTAS: build + register a new lake table from a front-end query;
    the new table is immediately queryable, travel-readable, and a
    second plain CREATE at the same location refuses."""
    lake = SqlLake(spark).register("tt", table)
    loc = str(tmp_path / "copy")
    r = lake.sql(
        f"CREATE TABLE tcopy LOCATION '{loc}' KEY (k) ORDER BY (ts) "
        "BUCKETS 2 AS SELECT k, ts, upper(text) AS text FROM tt",
        batch_id="ctas-1",
    ).collect()[0]
    assert r["statement"] == "create" and not r["skipped"]
    got = {row["k"]: row["text"] for row in lake.sql(
        "SELECT k, text FROM tcopy").collect()}
    assert got == {"a": "ALPHA", "b": "BETA", "c": "GAMMA"}
    # plain CREATE on an occupied location refuses; OR REPLACE works
    with pytest.raises(ValueError, match="already holds a table"):
        lake.sql(
            f"CREATE TABLE tcopy LOCATION '{loc}' KEY (k) ORDER BY (ts) "
            "AS SELECT k, ts, text FROM tt"
        )
    lake.sql(
        f"CREATE OR REPLACE TABLE tcopy LOCATION '{loc}' KEY (k) "
        "ORDER BY (ts) AS SELECT k, ts, text FROM tt WHERE k <> 'c'",
        batch_id="ctas-2",
    )
    assert lake.sql("SELECT count(*) AS n FROM tcopy").collect()[0]["n"] == 2
    # the replace is a snapshot: the first CTAS state stays travelable
    n_v1 = lake.sql(
        "SELECT count(*) AS n FROM tcopy VERSION AS OF 1").collect()[0]["n"]
    assert n_v1 == 3
    # IF NOT EXISTS adopts the existing table without writing
    r3 = lake.sql(
        f"CREATE TABLE IF NOT EXISTS tcopy LOCATION '{loc}' KEY (k) "
        "ORDER BY (ts) AS SELECT k, ts, text FROM tt",
        batch_id="ctas-3",
    ).collect()[0]
    assert r3["skipped"]
    assert lake.sql("SELECT count(*) AS n FROM tcopy").collect()[0]["n"] == 2


def test_call_guard_rails(spark, table):
    lake = SqlLake(spark).register("tt", table)
    with pytest.raises(ValueError, match="unknown procedure"):
        lake.sql("CALL tt.drop_table()")
    with pytest.raises(ValueError, match="literals"):
        lake.sql("CALL tt.rollback_to_snapshot(current_version())")
    with pytest.raises(ValueError, match="unregistered"):
        lake.sql("CALL nosuch.maintain()")


# ---------------- INSERT OVERWRITE -----------------------------------


def test_insert_overwrite_replaces_atomically(spark, table):
    lake = SqlLake(spark).register("tt", table)
    v_before = table.current_version()
    lake.sql(
        "INSERT OVERWRITE tt (k, ts, op, text) "
        "VALUES ('x', 50, 'insert', 'ex'), ('y', 51, 'insert', 'why')"
    )
    assert _state(table) == {"x": (50, "ex"), "y": (51, "why")}
    # pre-replace snapshot stays time-travelable
    old = {r["k"] for r in table.read(version=v_before).collect()}
    assert old == {"a", "b", "c"}
    # OVERWRITE TABLE spelling + SELECT body (no op column: overwrite
    # defaults it to insert), replacing again
    lake.sql(
        "INSERT OVERWRITE TABLE tt SELECT k, ts + 100 AS ts, text FROM tt"
    )
    assert _state(table) == {"x": (150, "ex"), "y": (151, "why")}


def test_insert_overwrite_exactly_once_with_batch_id(spark, table):
    lake = SqlLake(spark).register("tt", table)
    q = ("INSERT OVERWRITE tt (k, ts, op, text) "
         "VALUES ('solo', 9, 'insert', 'one')")
    lake.sql(q, batch_id="ow-1")
    v_after = table.current_version()
    lake.sql(q, batch_id="ow-1")  # replay: must be a no-op
    assert table.current_version() == v_after
    assert _state(table) == {"solo": (9, "one")}


# ---------------- SHOW CREATE TABLE ------------------------------------


def test_show_create_table_roundtrip(spark, table, tmp_path):
    lake = SqlLake(spark).register("tt", table)
    ddl = lake.sql("SHOW CREATE TABLE tt").collect()[0]["create_statement"]
    assert "KEY (k)" in ddl and "ORDER BY (ts)" in ddl and "BUCKETS 4" in ddl
    # the emitted DDL actually recreates an equivalent spec via CTAS
    loc = str(tmp_path / "re")
    ddl2 = ddl.replace("CREATE TABLE tt", "CREATE TABLE tt2") \
              .replace(f"LOCATION '{table.root}'", f"LOCATION '{loc}'")
    lake.sql(ddl2 + " AS SELECT k, ts, text, 'upsert' AS op FROM tt")
    t2 = lake._tables["tt2"]
    assert t2.key_cols == table.key_cols
    assert t2.order_cols == table.order_cols
    assert t2.n_buckets == table.n_buckets
    assert t2.read().count() == table.read().count()
    # non-default STATS round-trips too
    from gamechanger_data_spark.sinks.table import LakeTable as LT
    t3 = LT(spark, str(tmp_path / "s"), key_cols=("k",), order_cols=("ts",),
            n_buckets=2, stats_cols=("k", "ts", "text"))
    t3.merge(spark.createDataFrame([("a", 1, "x", "t")],
             "k string, ts long, op string, text string"), "b0")
    lake.register("tt3", t3)
    ddl3 = lake.sql("SHOW CREATE TABLE tt3").collect()[0]["create_statement"]
    assert "STATS (k, ts, text)" in ddl3


# ---------------- table write codec ------------------------------------


def test_codec_stamped_adopted_and_round_trips(spark, tmp_path):
    import os
    import pyarrow.parquet as pq
    from gamechanger_data_spark.sinks.table import LakeTable as LT

    t = LT(spark, str(tmp_path / "z"), key_cols=("k",), order_cols=("ts",),
           n_buckets=2, codec="zstd")
    t.merge(spark.createDataFrame(
        [("a", 1, "upsert", "x")], SCH), "b0")
    m = t._load_manifest()
    p0 = os.path.join(t.root, next(iter(m["files"].values()))[0])
    assert pq.ParquetFile(p0).metadata.row_group(0).column(0).compression \
        == "ZSTD"
    # reopened handles adopt the stamped codec; explicit values win
    assert LT(spark, t.root, n_buckets=2).codec == "zstd"
    assert LT(spark, t.root, n_buckets=2, codec="snappy").codec == "snappy"
    # SQL surface: SHOW CREATE emits it, CTAS parses it
    lake = SqlLake(spark).register("z", t)
    ddl = lake.sql("SHOW CREATE TABLE z").collect()[0]["create_statement"]
    assert "CODEC 'zstd'" in ddl
    loc = str(tmp_path / "z2")
    lake.sql(f"CREATE TABLE z2 LOCATION '{loc}' KEY (k) ORDER BY (ts) "
             "CODEC 'zstd' AS SELECT k, ts, text, 'upsert' AS op FROM z")
    assert lake._tables["z2"].codec == "zstd"


def test_call_verify_procedures(spark, table):
    lake = SqlLake(spark).register("tt", table)
    row, res = _result(lake.sql("CALL tt.verify()"))
    assert row["procedure"] == "verify" and res.get("ok", True)
    _, res2 = _result(lake.sql("CALL tt.verify_layout()"))
    assert res2.get("ok", res2.get("clean", True)) or "sampled" in res2
