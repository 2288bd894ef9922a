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
    with pytest.raises(ValueError, match="not both"):
        lake.sql(
            f"SELECT * FROM tt VERSION AS OF 1 FOR SYSTEM_TIME AS OF '{at}'"
        )


def test_unknown_branch_and_tag_fail_loudly(spark, table):
    lake = SqlLake(spark).register("tt", table)
    with pytest.raises(ValueError, match="no branch"):
        lake.sql("SELECT * FROM tt@nope")
    with pytest.raises(ValueError, match="no tag"):
        lake.sql("SELECT * FROM tt VERSION AS OF 'nope'")
