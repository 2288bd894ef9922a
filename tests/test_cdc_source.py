"""Structured Streaming CDC-out source (``format("lakecdc")``): offsets
are snapshot versions, micro-batches are between-snapshots diffs, rows
computed executor-side in pyarrow/pandas. Parity oracle: the engine's
own ``diff()`` over the same spans.

Reference analog: consumers tailing crawler output prefixes
(gc_crawler status tracking) — here the manifest chain is the feed.
"""

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gamechanger_data_spark.sinks.table import LakeTable
from gamechanger_data_spark.streaming.cdc_source import register_lakecdc

SCH = T.StructType([
    T.StructField("k", T.IntegerType()),
    T.StructField("ts", T.LongType()),
    T.StructField("val", T.StringType()),
    T.StructField("op", T.StringType()),
])


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCH)


@pytest.fixture
def table(spark, tmp_path):
    register_lakecdc(spark)
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(_mk(spark, [(i, 10, f"a{i}", "upsert") for i in range(20)]), "b0")
    t.merge(_mk(spark, [(5, 20, "upd", "upsert"), (6, 20, None, "delete"),
                        (9, 20, "rv", "revoke")]), "b1", mode="mor")
    return t


def _drain(spark, root, cp, starting=None):
    """One availableNow pass; returns the new rows as (k, val, change_op)."""
    got = []
    r = spark.readStream.format("lakecdc").option("path", root)
    if starting is not None:
        r = r.option("startingVersion", starting)
    q = (
        r.load()
        .writeStream.foreachBatch(
            lambda df, _e: got.append(
                [(x["k"], x["val"], x["change_op"]) for x in df.collect()]
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", cp)
        .start()
    )
    q.awaitTermination(180)
    return sorted(r for b in got for r in b)


def test_full_history_matches_diff(spark, tmp_path, table):
    t = table
    got = _drain(spark, t.root, str(tmp_path / "cp"), starting=0)
    exp = sorted(
        (r["k"], r["val"], r["change_op"])
        for r in t.diff(0, t.current_version()).collect()
    )
    assert got == exp
    # MOR deltas resolved by the reader: k=5 streams its DELTA value
    assert (5, "upd", "upsert") in got
    assert (6, None, "delete") in got
    assert (9, "rv", "revoke") in got


def test_checkpoint_resume_exactly_once(spark, tmp_path, table):
    t = table
    cp = str(tmp_path / "cp")
    first = _drain(spark, t.root, cp, starting=0)
    assert len(first) == 20
    # no new commits: nothing re-delivered
    assert _drain(spark, t.root, cp) == []
    # new commits stream exactly their span
    t.delete_where("k = 7", "b2")
    t.merge(_mk(spark, [(3, 30, "x3", "upsert")]), "b3")
    inc = _drain(spark, t.root, cp)
    assert inc == [(3, "x3", "upsert"), (7, "a7", "delete")]
    # and again: drained
    assert _drain(spark, t.root, cp) == []


def test_default_start_is_current_head(spark, tmp_path, table):
    t = table
    cp = str(tmp_path / "cp")
    assert _drain(spark, t.root, cp) == []  # nothing before the head
    t.merge(_mk(spark, [(1, 40, "new1", "upsert")]), "b2")
    assert _drain(spark, t.root, cp) == [(1, "new1", "upsert")]


def test_schema_evolution_null_fills_old_commits(spark, tmp_path, table):
    t = table
    t.add_columns({"lang": "string"})
    t.merge(
        spark.createDataFrame([(2, 50, "x2", "en", "upsert")], T.StructType(
            SCH.fields[:3] + [T.StructField("lang", T.StringType())]
            + [SCH.fields[3]]
        )),
        "b2",
    )
    got = []
    q = (
        spark.readStream.format("lakecdc").option("path", t.root)
        .option("startingVersion", 0).load()
        .writeStream.foreachBatch(
            lambda df, _e: got.extend(
                (x["k"], x["val"], x["lang"], x["change_op"])
                for x in df.collect()
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.awaitTermination(180)
    by_k = {g[0]: g for g in got}
    assert by_k[2] == (2, "x2", "en", "upsert")
    assert by_k[1][2] is None  # pre-evolution row null-fills lang


def test_rebucket_span_single_partition_correct(spark, tmp_path, table):
    t = table
    cp = str(tmp_path / "cp")
    base = _drain(spark, t.root, cp, starting=0)
    t.rebucket(8)
    t.merge(_mk(spark, [(4, 60, "x4", "upsert")]), "b2")
    inc = _drain(spark, t.root, cp)
    # the rebucket rewrite itself changes no logical row; only the merge does
    assert inc == [(4, "x4", "upsert")]


def test_empty_table_refused(spark, tmp_path):
    register_lakecdc(spark)
    root = str(tmp_path / "empty")
    LakeTable(spark, root, key_cols=("k",), order_cols=("ts",), n_buckets=2)
    with pytest.raises(Exception, match="empty table"):
        (spark.readStream.format("lakecdc").option("path", root).load())
