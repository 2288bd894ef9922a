"""Streaming laketable SINK: writeStream.format("laketable") appends
micro-batches as exactly-once MOR delta commits, with executor-side
staging (pyarrow) bucketed by the Python xxh64 twin and a pure-metadata
driver commit (LakeTable.append_deltas — no SparkSession in the sink's
worker).

The flagship check is the source/sink symmetry pipeline:
readStream lakecdc (table A) -> writeStream laketable (table B) is a
streaming lake-to-lake replication whose final states must match.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gamechanger_data_spark.sinks.table import LakeTable
from gamechanger_data_spark.streaming.cdc_source import register_lakecdc
from gamechanger_data_spark.streaming.sink import register_laketable

SCH = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("turn", T.IntegerType()),
    T.StructField("ts", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("op", T.StringType()),
])


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCH)


def _state(t):
    return sorted(
        (r["k"], r["turn"], r["ts"], r["text"], bool(r["is_revoked"]))
        for r in t.read().collect()
    )


@pytest.fixture
def pair(spark, tmp_path):
    register_lakecdc(spark)
    register_laketable(spark)
    src = LakeTable(spark, str(tmp_path / "src"), key_cols=("k", "turn"),
                    order_cols=("ts",), n_buckets=4)
    src.merge(_mk(spark, [(f"c{i % 5}", i, 10, f"t{i}", "upsert")
                          for i in range(30)]), "b0")
    src.merge(_mk(spark, [("c1", 1, 20, "upd", "upsert"),
                          ("c2", 2, 20, None, "delete"),
                          ("c3", 3, 20, "rv", "revoke")]), "b1", mode="mor")
    dst = LakeTable(spark, str(tmp_path / "dst"), key_cols=("k", "turn"),
                    order_cols=("ts",), n_buckets=4)
    # seed the schema (the sink appends to an existing table); the seeded
    # row is out-ordered by every replicated event
    dst.merge(_mk(spark, [("c0", 0, 1, "seed", "upsert")]), "seed")
    return src, dst


def _replicate(spark, src, dst, cp):
    q = (
        spark.readStream.format("lakecdc")
        .option("path", src.root)
        .option("startingVersion", 0)
        .load()
        .withColumn("op", F.col("change_op"))
        .drop("change_op")
        .writeStream.format("laketable")
        .option("path", dst.root)
        .trigger(availableNow=True)
        .option("checkpointLocation", cp)
        .start()
    )
    q.awaitTermination(180)


def test_lake_to_lake_streaming_replication(spark, tmp_path, pair):
    src, dst = pair
    cp = str(tmp_path / "cp")
    _replicate(spark, src, dst, cp)
    assert _state(dst) == _state(src)
    # deletes replicate as tombstones, not just missing rows
    assert dst.read().filter("k = 'c2' AND turn = 2").count() == 0
    # resume: new commits on src stream across; nothing re-applied
    v = dst.current_version()
    src.merge(_mk(spark, [("c4", 4, 30, "newer", "upsert"),
                          ("zz", 99, 30, "fresh", "upsert")]), "b2")
    _replicate(spark, src, dst, cp)
    assert _state(dst) == _state(src)
    assert dst.current_version() == v + 1  # exactly one new commit
    # idle rerun: no new data, no new commit
    _replicate(spark, src, dst, cp)
    assert dst.current_version() == v + 1


def test_sink_buckets_match_engine_hash(spark, tmp_path, pair):
    src, dst = pair
    _replicate(spark, src, dst, str(tmp_path / "cp"))
    # every replicated key must be found by the ENGINE's point lookup,
    # which prunes to the JVM-hash bucket: a bucketing mismatch would
    # come back empty
    for r in src.read().collect():
        got = dst.lookup_key(k=r["k"], turn=r["turn"]).collect()
        assert len(got) == 1 and got[0]["text"] == r["text"], (r["k"], r["turn"])
    # and the table's own integrity audit agrees
    rep = dst.verify()
    assert rep.get("ok", True), rep


def test_sink_validation(spark, tmp_path, pair):
    src, dst = pair
    bad = (
        spark.readStream.format("lakecdc")
        .option("path", src.root).option("startingVersion", 0).load()
        .withColumnRenamed("change_op", "op")
        .withColumn("mystery", F.lit(1))
    )
    q = bad.writeStream.format("laketable").option("path", dst.root) \
        .trigger(availableNow=True) \
        .option("checkpointLocation", str(tmp_path / "cpv"))
    with pytest.raises(Exception, match="mystery|ALTER"):
        q.start().awaitTermination(120)
    # missing table -> loud
    q2 = bad.drop("mystery").writeStream.format("laketable") \
        .option("path", str(tmp_path / "nope")) \
        .trigger(availableNow=True) \
        .option("checkpointLocation", str(tmp_path / "cpv2"))
    with pytest.raises(Exception, match="no LakeTable|existing table"):
        q2.start().awaitTermination(120)


def test_two_sinks_need_distinct_sink_ids(spark, tmp_path, pair):
    src, dst = pair
    _replicate(spark, src, dst, str(tmp_path / "cp1"))
    before = _state(dst)
    # a SECOND logical stream (fresh checkpoint) with the default sinkId
    # collides with the first stream's epoch ids: its batch 0 is skipped
    # as a replay (documented), so distinct pipelines must set sinkId
    src2root = str(tmp_path / "src2")
    src2 = LakeTable(spark, src2root, key_cols=("k", "turn"),
                     order_cols=("ts",), n_buckets=4)
    src2.merge(_mk(spark, [("other", 7, 50, "x", "upsert")]), "o0")
    q = (
        spark.readStream.format("lakecdc")
        .option("path", src2root).option("startingVersion", 0).load()
        .withColumn("op", F.col("change_op")).drop("change_op")
        .writeStream.format("laketable")
        .option("path", dst.root)
        .option("sinkId", "pipeline-two")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .start()
    )
    q.awaitTermination(180)
    after = _state(dst)
    assert ("other", 7, 50, "x", False) in after
    assert set(before) <= set(after)


def test_chained_replication_a_to_b_to_c(spark, tmp_path, pair):
    # composability: a sink-written table is itself a valid lakecdc
    # source — A -> B -> C must converge to A's state
    src, mid = pair
    _replicate(spark, src, mid, str(tmp_path / "cp_ab"))
    end = LakeTable(spark, str(tmp_path / "end"), key_cols=("k", "turn"),
                    order_cols=("ts",), n_buckets=4)
    end.merge(_mk(spark, [("c0", 0, 1, "seed", "upsert")]), "seed")
    q = (
        spark.readStream.format("lakecdc")
        .option("path", mid.root)
        .option("startingVersion", 0)
        .load()
        .withColumn("op", F.col("change_op"))
        .drop("change_op")
        .writeStream.format("laketable")
        .option("path", end.root)
        .option("sinkId", "chain-bc")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cp_bc"))
        .start()
    )
    q.awaitTermination(180)
    assert _state(end) == _state(src)


def test_rebucket_mid_stream_refused(spark, tmp_path, pair):
    # a rebucket between staging and commit would misplace rows; the
    # commit must refuse instead of silently corrupting placement
    src, dst = pair
    from gamechanger_data_spark.sinks.table import LakeTable as LT
    with pytest.raises(ValueError, match="rebucketed"):
        LT(spark, dst.root, n_buckets=4).append_deltas(
            {0: []}, batch_id="x", expected_n_buckets=8
        )


def test_sink_deltas_compact_back_to_clean(spark, tmp_path, pair):
    # the sink's MOR stacks fold through the ordinary maintenance path:
    # after compact(), buckets are clean again and stats_agg answers
    # count(*) from metadata alone
    src, dst = pair
    _replicate(spark, src, dst, str(tmp_path / "cp"))
    before = _state(dst)
    assert any(fl for fl in (dst._load_manifest().get("deltas") or {}).values())
    dst.compact()
    m = dst._load_manifest()
    assert not any(fl for fl in (m.get("deltas") or {}).values())
    assert _state(dst) == before == _state(src)
    c, rep = dst.stats_agg([("count", "*")], return_report=True)
    assert rep["buckets_scanned"] == 0
    assert c.collect()[0][0] == len(before)
