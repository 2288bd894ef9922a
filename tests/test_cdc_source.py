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


# ---------------- maxVersionsPerBatch admission control ----------------


def _reader(table, **opts):
    from gamechanger_data_spark.streaming.cdc_source import (
        LakeCDCDataSource,
        LakeCDCStreamReader,
    )
    ds = LakeCDCDataSource({"path": table.root})
    schema = ds.schema()
    options = {"path": table.root}
    options.update({k.lower(): str(v) for k, v in opts.items()})
    return LakeCDCStreamReader(options, schema.jsonValue())


def test_throttle_bounds_offset_advance(spark, table):
    # table has 2 commits; add 3 more so the history is 5 deep
    for i in range(3):
        table.merge(_mk(spark, [(i, 30 + i, f"x{i}", "upsert")]), f"bx{i}")
    head = table.current_version()
    r = _reader(table, startingVersion=0, maxVersionsPerBatch=2)
    assert r.initialOffset() == {"version": 0}
    seen = [0]
    for _ in range(10):
        end = r.latestOffset()["version"]
        if end == seen[-1]:
            break
        # the planned batch is (prev, end]; partitions() must accept it
        r.partitions({"version": seen[-1]}, {"version": end})
        assert end - seen[-1] <= 2
        seen.append(end)
    assert seen[-1] == head          # converges to head
    assert len(seen) >= 3            # ... in more than one throttled step


def test_throttle_restart_resyncs_and_throttles(spark, table):
    head = table.current_version()
    # before ANY consumed point is known (fresh stream pre-initialOffset,
    # or a restart before recovery), latestOffset must report head —
    # anything lower could regress a committed checkpoint offset
    r = _reader(table, startingVersion=0, maxVersionsPerBatch=1)
    assert r.latestOffset() == {"version": head}
    # restart recovery: Spark re-plans the last checkpointed span via
    # partitions(), which resyncs the cursor — new batches throttle
    r.partitions({"version": head}, {"version": head})
    table.merge(_mk(spark, [(50, 99, "z", "upsert")]), "bz")
    table.merge(_mk(spark, [(51, 99, "z", "upsert")]), "bz2")
    nxt = r.latestOffset()["version"]
    assert nxt == head + 1  # one version per batch from here on
    # idempotent: repeated latestOffset calls (offset WAL + progress
    # reporting happen in the same micro-batch) must NOT stack windows
    assert r.latestOffset()["version"] == head + 1


def test_throttled_stream_delivers_all_rows_exactly_once(spark, tmp_path, table):
    # end-to-end: a fresh stream's FIRST batch is unthrottled (the
    # engine asks for latest before initial — see latestOffset); every
    # restarted run recovers its checkpoint and then consumes exactly
    # one throttled span per availableNow invocation
    cp = str(tmp_path / "cp_throttle")
    got = []

    def run():
        q = (
            spark.readStream.format("lakecdc")
            .option("path", table.root)
            .option("startingVersion", 0)
            .option("maxVersionsPerBatch", 1)
            .load()
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

    head0 = table.current_version()
    run()  # fresh: one unthrottled batch covering (0, head0]
    assert len(got) == 1
    assert sorted(got[0]) == sorted(
        (x["k"], x["val"], x["change_op"])
        for x in table.diff(0, head0).collect()
    )
    # three more commits; each restarted run must consume ONE span
    for i in range(3):
        table.merge(_mk(spark, [(40 + i, 99, f"z{i}", "upsert")]), f"bz{i}")
    for step in range(3):
        run()
        span = (head0 + step, head0 + step + 1)
        assert sorted(got[-1]) == sorted(
            (x["k"], x["val"], x["change_op"])
            for x in table.diff(*span).collect()
        ), f"run {step} did not consume exactly span {span}"
    # nothing left: one more run delivers nothing new
    n = len([r for b in got for r in b])
    run()
    assert len([r for b in got for r in b]) == n
