"""ALTER surface: metadata-only add_columns / drop_column on LakeTable,
their resurrection guards, sync propagation, and the SQL forms
(ALTER TABLE / DROP TABLE / SHOW TABLES / DESCRIBE).

Reference analogs: the additive extension splat applied on re-parse
(SURVEY §2.2 P4, common/document_parser/parsers/policy_analytics/
parse.py) for ADD COLUMNS; the publish-time column drop
(gc_elasticsearch_publisher.py:79-100, P2) for DROP COLUMN — here
applied to the table itself, metadata-only."""

import pytest
from pyspark.sql import types as T

from gamechanger_data_spark.plans.sqlfront import SqlLake
from gamechanger_data_spark.sinks.table import LakeTable
from gamechanger_data_spark.streaming.driver import sync_changelog

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
    return t


# ---------------- add_columns ----------------------------------------


def test_add_columns_metadata_only(spark, table):
    v0 = table.current_version()
    r = table.add_columns({"quality": "double", "tags": "array<string>"})
    assert r["version"] == v0 + 1
    assert r["added"] == {"quality": "double", "tags": "array<string>"}
    got = {f.name: f.dataType.simpleString() for f in table.schema().fields}
    assert got["quality"] == "double" and got["tags"] == "array<string>"
    # old rows read the new columns as null — no data was rewritten
    rows = table.read().collect()
    assert all(r["quality"] is None and r["tags"] is None for r in rows)
    # and the pre-add snapshot doesn't have the columns at all
    assert "quality" not in table.read(version=v0).columns


def test_add_columns_then_merge_fills(spark, table):
    table.add_columns({"quality": "double"})
    sch = T.StructType(SCH.fields + [T.StructField("quality", T.DoubleType())])
    table.merge(spark.createDataFrame(
        [("a", 2, "upsert", "alpha2", 0.9)], sch), "b-fill")
    got = {r["k"]: r["quality"] for r in table.read().collect()}
    assert got["a"] == 0.9 and got["b"] is None


def test_add_columns_refusals(spark, table):
    with pytest.raises(ValueError, match="already in use"):
        table.add_columns({"text": "string"})
    with pytest.raises(ValueError, match="internal"):
        table.add_columns({"__secret": "string"})
    with pytest.raises(ValueError, match="invalid column name"):
        table.add_columns({"bad-name": "string"})
    with pytest.raises(ValueError, match="empty column map"):
        table.add_columns({})
    table.rename_column("text", "body")
    with pytest.raises(ValueError, match="already in use/retired"):
        table.add_columns({"text": "string"})  # retired rename alias


# ---------------- drop_column ----------------------------------------


def test_drop_column_metadata_only(spark, table):
    v0 = table.current_version()
    r = table.drop_column("text")
    assert r["dropped_column"] == "text"
    assert "text" not in table.read().columns
    # time travel to the pre-drop snapshot still shows the values
    pre = {x["k"]: x["text"] for x in table.read(version=v0).collect()}
    assert pre == {"a": "alpha", "b": "beta"}


def test_drop_column_guards(spark, table):
    with pytest.raises(ValueError, match="key/order"):
        table.drop_column("k")
    with pytest.raises(ValueError, match="key/order"):
        table.drop_column("ts")
    with pytest.raises(ValueError, match="internal"):
        table.drop_column("__deleted")
    with pytest.raises(ValueError, match="no column"):
        table.drop_column("nope")


def test_drop_then_readd_refused_until_full_rewrite(spark, table):
    table.drop_column("text")
    # re-adding would resurrect the surviving file bytes
    with pytest.raises(ValueError, match="resurrect"):
        table.add_columns({"text": "string"})
    with pytest.raises(ValueError, match="dropped"):
        table.rename_column("is_revoked", "text")
    # a full rewrite clears the reserved list: the name is reusable and
    # the old bytes are gone, so no resurrection
    table.rebucket(4)
    table.add_columns({"text": "string"})
    assert all(r["text"] is None for r in table.read().collect())


def test_rename_onto_dropped_refused(spark, table):
    table.add_columns({"note": "string"})
    table.drop_column("note")
    with pytest.raises(ValueError, match="dropped"):
        table.rename_column("text", "note")


def test_drop_renamed_column_retires_aliases(spark, table):
    table.rename_column("text", "body")
    table.drop_column("body")
    # both the dropped name AND its alias are reserved (files hold bytes
    # under each)
    with pytest.raises(ValueError, match="resurrect"):
        table.add_columns({"body": "string"})
    with pytest.raises(ValueError, match="resurrect"):
        table.add_columns({"text": "string"})


def test_lagging_producer_dropped_column_projected(spark, table):
    """A source batch still carrying a dropped column merges cleanly;
    the column does not re-enter the schema."""
    table.drop_column("text")
    table.merge(spark.createDataFrame(
        [("c", 3, "upsert", "GHOST")], SCH), "b-lag")
    assert "text" not in table.read().columns
    assert {r["k"] for r in table.read().collect()} == {"a", "b", "c"}
    # and it stays out even after compaction folds the delta
    table.compact()
    assert "text" not in table.read().columns


def test_ddl_sync_propagation(spark, table, tmp_path):
    """add_columns / drop_column commits replay onto a synced copy via
    the manifest ddl stamp, so post-DDL changelogs align."""
    dst = LakeTable(spark, str(tmp_path / "copy"), key_cols=("k",),
                    order_cols=("ts",), n_buckets=4)
    sync_changelog(table, dst)
    table.add_columns({"quality": "double"})
    sch = T.StructType(SCH.fields + [T.StructField("quality", T.DoubleType())])
    table.merge(spark.createDataFrame(
        [("c", 3, "upsert", "gamma", 0.5)], sch), "b2")
    table.drop_column("text")
    table.merge(spark.createDataFrame(
        [("d", 4, "upsert", None)],
        T.StructType([f for f in sch.fields if f.name != "text"])), "b3")
    sync_changelog(table, dst)
    assert sorted(dst.read().columns) == sorted(table.read().columns)
    want = {r["k"]: (r["ts"], r["quality"]) for r in table.read().collect()}
    got = {r["k"]: (r["ts"], r["quality"]) for r in dst.read().collect()}
    assert got == want
    # idempotent: a second sync is all skips, and DDL doesn't re-fire
    res = sync_changelog(table, dst)
    assert all(r.get("skipped") for r in res)


# ---------------- SQL forms ------------------------------------------


def test_sql_alter_add_rename_drop(spark, table):
    lake = SqlLake(spark).register("tt", table)
    r = lake.sql(
        "ALTER TABLE tt ADD COLUMNS (quality double, lang string)"
    ).collect()[0]
    assert r["statement"] == "alter" and not r["skipped"]
    lake.sql("ALTER TABLE tt RENAME COLUMN lang TO language")
    lake.sql("ALTER TABLE tt DROP COLUMN quality")
    cols = {r["col_name"]: r for r in lake.sql("DESCRIBE tt").collect()}
    assert "language" in cols and "lang" not in cols
    assert "quality" not in cols
    assert cols["k"]["role"] == "key" and cols["ts"]["role"] == "order"
    assert cols["text"]["data_type"] == "string"


def test_sql_alter_single_column_no_parens(spark, table):
    lake = SqlLake(spark).register("tt", table)
    lake.sql("ALTER TABLE tt ADD COLUMN score decimal(10,2)")
    cols = {r["col_name"]: r["data_type"]
            for r in lake.sql("DESCRIBE tt").collect()}
    assert cols["score"] == "decimal(10,2)"


def test_sql_alter_guard_rails(spark, table):
    lake = SqlLake(spark).register("tt", table)
    with pytest.raises(ValueError, match="unsupported ALTER"):
        lake.sql("ALTER TABLE tt SET TBLPROPERTIES ('a'='b')")
    with pytest.raises(ValueError, match="unregistered"):
        lake.sql("ALTER TABLE nope ADD COLUMN x int")


def test_sql_show_and_drop_table(spark, table, tmp_path):
    other = LakeTable(spark, str(tmp_path / "o"), key_cols=("k",),
                      order_cols=("ts",), n_buckets=2)
    other.merge(spark.createDataFrame([("z", 1, "upsert", "zed")], SCH), "b0")
    lake = SqlLake(spark).register("tt", table).register("oo", other)
    shown = {r["name"]: r for r in lake.sql("SHOW TABLES").collect()}
    assert set(shown) == {"tt", "oo"}
    assert shown["tt"]["version"] == table.current_version()
    assert shown["oo"]["branch"] == other.branch
    r = lake.sql("DROP TABLE oo").collect()[0]
    assert r["statement"] == "drop_table" and not r["skipped"]
    assert {x["name"] for x in lake.sql("SHOW TABLES").collect()} == {"tt"}
    # data stays on disk: re-registering restores access
    lake.register("oo", other)
    assert lake.sql("SELECT count(*) AS n FROM oo").collect()[0]["n"] == 1
    lake.sql("DROP TABLE oo")
    r2 = lake.sql("DROP TABLE IF EXISTS oo").collect()[0]
    assert r2["skipped"]
    with pytest.raises(ValueError, match="unregistered"):
        lake.sql("DROP TABLE oo")
