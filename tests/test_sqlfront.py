"""SqlLake: the SQL front-end for time travel, branches, and tags.

The resolver rewrites FROM/JOIN references into per-snapshot temp
views; everything else is plain spark.sql. Reference analog: the
latest-load SQL views the reference's consumers read through
(create_views.sql:24-31), extended with the standard Spark/Iceberg
travel clauses."""

import pytest
from pyspark.sql import types as T

from gamechanger_data_spark.plans.sqlfront import SqlLake
from gamechanger_data_spark.sinks.table import LakeTable

SCH = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("ts", T.LongType()),
    T.StructField("op", T.StringType()),
])


@pytest.fixture()
def table(spark, tmp_path):
    """Three-commit table: v1 tagged 'first', v2 on main, a staged
    commit on branch 'exp'."""
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(spark.createDataFrame(
        [("a", 1, "upsert"), ("b", 1, "upsert")], SCH), "b0")
    t.tag("first")
    t.merge(spark.createDataFrame([("c", 2, "upsert")], SCH), "b1")
    t.create_branch("exp")
    exp = LakeTable(spark, t.root, n_buckets=4, branch="exp")
    exp.merge(spark.createDataFrame([("d", 3, "upsert")], SCH), "b2")
    return t


def _n(df):
    return df.collect()[0]["n"]


def test_version_tag_branch_and_systime(spark, table):
    lake = SqlLake(spark).register("tt", table)
    v1 = table.tag_version("first")
    assert _n(lake.sql("SELECT count(*) AS n FROM tt")) == 3
    assert _n(lake.sql(f"SELECT count(*) AS n FROM tt VERSION AS OF {v1}")) == 2
    # FOR VERSION AS OF (Spark's alternate spelling) and tag resolution
    assert _n(lake.sql(
        "SELECT count(*) AS n FROM tt FOR VERSION AS OF 'first'")) == 2
    assert _n(lake.sql("SELECT count(*) AS n FROM tt@exp")) == 4
    at = table._load_manifest(v1)["committed_at"]
    assert _n(lake.sql(
        f"SELECT count(*) AS n FROM tt FOR SYSTEM_TIME AS OF '{at}'")) == 2
    assert _n(lake.sql(
        f"SELECT count(*) AS n FROM tt TIMESTAMP AS OF '{at}'")) == 2


def test_branch_travel_composes(spark, table):
    """@branch + VERSION AS OF resolves along THAT branch's chain."""
    lake = SqlLake(spark).register("tt", table)
    exp = LakeTable(spark, table.root, n_buckets=4, branch="exp")
    vb = exp.current_version()
    assert _n(lake.sql(
        f"SELECT count(*) AS n FROM tt@exp VERSION AS OF {vb}")) == 4


def test_join_two_pins_and_passthrough(spark, table):
    """One query may pin the same table at two snapshots; unregistered
    names (CTEs, real temp views) pass through to spark.sql untouched,
    and no __lake temp views are left behind."""
    lake = SqlLake(spark).register("tt", table)
    v1 = table.tag_version("first")
    rows = lake.sql(f"""
        WITH other AS (SELECT 'a' AS k)
        SELECT cur.k FROM tt cur
        JOIN tt VERSION AS OF {v1} old ON cur.k = old.k
        JOIN other ON other.k = cur.k
    """).collect()
    assert sorted(r["k"] for r in rows) == ["a"]
    leftovers = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("__lake")
    ]
    assert leftovers == []


def test_double_pin_refused(spark, table):
    lake = SqlLake(spark).register("tt", table)
    at = table._load_manifest(1)["committed_at"]
    with pytest.raises(ValueError, match="one travel pin"):
        lake.sql(
            f"SELECT * FROM tt VERSION AS OF 1 FOR SYSTEM_TIME AS OF '{at}'"
        )


def test_unknown_branch_and_tag_fail_loudly(spark, table):
    lake = SqlLake(spark).register("tt", table)
    with pytest.raises(ValueError, match="no branch"):
        lake.sql("SELECT * FROM tt@nope")
    with pytest.raises(ValueError, match="no tag"):
        lake.sql("SELECT * FROM tt VERSION AS OF 'nope'")


def test_metadata_tables_through_sql(spark, table):
    """The Iceberg table.history family as SQL: history/files/tags/
    branches/changes resolve to metadata DataFrames; .files and .changes
    accept VERSION AS OF; dotted unregistered names pass through."""
    lake = SqlLake(spark).register("tt", table)

    hist = lake.sql(
        "SELECT version, kind, refs FROM tt.history ORDER BY version"
    ).collect()
    assert [r["version"] for r in hist] == table.snapshots()
    head = [r for r in hist if r["version"] == table.current_version()][0]
    assert "branch:main" in (head["refs"] or [])

    v1 = table.tag_version("first")
    tags = {r["name"]: r["version"]
            for r in lake.sql("SELECT * FROM tt.tags").collect()}
    assert tags == {"first": v1}
    branches = {r["name"]: r["version"]
                for r in lake.sql("SELECT * FROM tt.branches").collect()}
    assert set(branches) == {"main", "exp"}

    # files at head vs pinned at the tagged version
    n_head = lake.sql("SELECT count(*) AS n FROM tt.files").collect()[0]["n"]
    n_v1 = lake.sql(
        "SELECT count(*) AS n FROM tt.files VERSION AS OF 'first'"
    ).collect()[0]["n"]
    assert n_head >= n_v1 > 0

    # changelog of a specific commit through SQL
    ch = lake.sql(
        f"SELECT k, change_op FROM tt.changes VERSION AS OF {v1}"
    ).collect()
    assert {r["k"] for r in ch} == {"a", "b"}

    # metadata joins with data reads in one statement
    n = lake.sql("""
        SELECT count(*) AS n FROM tt
        JOIN tt.history h ON h.kind = 'data'
    """).collect()[0]["n"]
    assert n > 0


def test_metadata_tables_refuse_bad_pins_and_pass_through_dotted(spark, table):
    import pytest as _pytest

    lake = SqlLake(spark).register("tt", table)
    with _pytest.raises(ValueError, match="does not accept"):
        lake.sql("SELECT * FROM tt.history VERSION AS OF 1")
    with _pytest.raises(ValueError, match="do not compose"):
        lake.sql("SELECT * FROM tt.history@exp")
    # unregistered dotted names are NOT ours: they flow to spark.sql,
    # which raises its own resolution error (not a front-end rewrite)
    from pyspark.errors import AnalysisException
    with _pytest.raises(AnalysisException):
        lake.sql("SELECT * FROM somedb.sometable")
    # and a registered base name followed by an unknown suffix is left
    # untouched too (tt.foo is not a travel form)
    with _pytest.raises(AnalysisException):
        lake.sql("SELECT * FROM tt.nope")


def test_diff_metadata_table_requires_and_uses_baseline(spark, table):
    import pytest as _pytest

    lake = SqlLake(spark).register("tt", table)
    v1 = table.tag_version("first")
    d = {(r["k"], r["change_op"]) for r in lake.sql(
        f"SELECT k, change_op FROM tt.diff VERSION AS OF {v1}"
    ).collect()}
    assert d == {("c", "upsert")}  # the post-tag commit added 'c' on main
    # tag form resolves too, and a missing baseline is refused
    d2 = {r["k"] for r in lake.sql(
        "SELECT k FROM tt.diff VERSION AS OF 'first'").collect()}
    assert d2 == {"c"}
    with _pytest.raises(ValueError, match="requires a baseline"):
        lake.sql("SELECT * FROM tt.diff")
