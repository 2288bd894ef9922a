"""S6 — JDBC table scan round-trip against the Derby embedded database
that ships on Spark's classpath (no network, single JVM). Exercises the
real JDBC read path: option plumbing, partitioned parallel reads
(partitionColumn/bounds/numPartitions), and fetchsize acceptance."""

import pytest

from gamechanger_data_spark.sources.jdbc import read_jdbc_table

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db};create=true"
    # populate via Spark's own JDBC writer (creates the table)
    src = spark.range(0, 1000).selectExpr(
        "CAST(id AS INT) AS event_id",
        "CONCAT('conv', CAST(id % 37 AS STRING)) AS conv_id",
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "events_src")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_roundtrip_plain(spark, derby_url):
    got = read_jdbc_table(spark, derby_url, "events_src", driver=DRIVER)
    assert got.count() == 1000
    assert set(c.lower() for c in got.columns) == {"event_id", "conv_id"}


def test_jdbc_partitioned_read(spark, derby_url):
    """partitionColumn/bounds split the scan into parallel range queries —
    the server-cursor scroll distributed (snapshot/utils.py:70-79)."""
    got = read_jdbc_table(
        spark, derby_url, "events_src",
        partition_column="event_id", lower_bound=0, upper_bound=1000,
        num_partitions=4, driver=DRIVER,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 1000
    # no rows lost/duplicated at range boundaries
    assert got.select("event_id").distinct().count() == 1000


def test_jdbc_pushdown_filter(spark, derby_url):
    """A filter on the JDBC frame is pushed into the remote query
    (PushedFilters in the scan node), not evaluated post-transfer."""
    import contextlib
    import io

    got = read_jdbc_table(spark, derby_url, "events_src", driver=DRIVER)
    filtered = got.filter("event_id < 10")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain(True)
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "event_id" in plan.lower()
    assert filtered.count() == 10


def test_jdbc_requires_bounds_with_partition_column(spark, derby_url):
    with pytest.raises(ValueError):
        read_jdbc_table(spark, derby_url, "events_src",
                        partition_column="event_id")
