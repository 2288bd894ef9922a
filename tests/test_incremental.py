"""Incremental aggregate maintenance (streaming/driver.py sync_aggregate):
delta-scoped recompute from changelog must equal one-shot full recompute."""

import pandas as pd
from pyspark.sql import functions as F

from gamechanger_data_spark.datagen import FeedSpec, write_feed
from gamechanger_data_spark.plans.catalog import conv_rollup
from gamechanger_data_spark.sinks.table import LakeTable
from gamechanger_data_spark.streaming.driver import replay_feed, sync_aggregate

ROLLUP_COLS = ["conv_id", "n_turns", "n_revoked", "last_ts", "n_chars"]


def _rollup_table(spark, path):
    return LakeTable(
        spark, path, key_cols=("conv_id",), order_cols=("src_version",),
        n_buckets=4,
    )


def _expect(src):
    return (
        conv_rollup(src.read()).orderBy("conv_id")
        .toPandas()[ROLLUP_COLS].reset_index(drop=True)
    )


def _got(roll):
    return (
        roll.read().select(*ROLLUP_COLS).orderBy("conv_id")
        .toPandas().reset_index(drop=True)
    )


def test_rollup_parity_idempotence_and_increment(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=50, max_turns=8, n_batches=3,
                              events_per_batch=600, seed=77))
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=8)
    roll = _rollup_table(spark, str(tmp_path / "roll"))

    replay_feed(spark, feed, src, limit=2)
    r1 = sync_aggregate(src, roll, conv_rollup)
    assert [x.get("skipped", False) for x in r1] == [False, False]
    pd.testing.assert_frame_equal(_got(roll), _expect(src), check_dtype=False)

    # replaying the sync is a no-op (exactly-once via batch markers)
    assert all(x["skipped"] for x in sync_aggregate(src, roll, conv_rollup))

    # a new source commit applies alone; parity holds after it. The
    # chain walk early-stops at the NEWEST already-synced commit (one
    # skip record proves everything below it is synced — O(unsynced)
    # manifest loads, not one record per historical commit).
    replay_feed(spark, feed, src)
    r3 = sync_aggregate(src, roll, conv_rollup)
    assert [x.get("skipped", False) for x in r3] == [True, False]
    pd.testing.assert_frame_equal(_got(roll), _expect(src), check_dtype=False)


def test_vanished_group_tombstones_rollup_row(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=20, max_turns=4, n_batches=1,
                              events_per_batch=150, seed=9, evolve_batch=None))
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    roll = _rollup_table(spark, str(tmp_path / "roll"))
    replay_feed(spark, feed, src)
    sync_aggregate(src, roll, conv_rollup)

    victim = src.read().select("conv_id").orderBy("conv_id").first()[0]
    assert _got(roll).conv_id.eq(victim).any()
    # delete every turn of one conversation (newer event_seq wins LWW)
    kill = (
        src.read().filter(F.col("conv_id") == victim)
        .withColumn("event_seq", F.col("event_seq") + F.lit(10_000_000_000))
        .withColumn("op", F.lit("delete"))
    )
    src.merge(kill, "kill-conv")

    res = sync_aggregate(src, roll, conv_rollup)
    assert not res[-1]["skipped"]
    got = _got(roll)
    assert not got.conv_id.eq(victim).any()  # rollup row tombstoned
    pd.testing.assert_frame_equal(got, _expect(src), check_dtype=False)


def test_overwrite_falls_back_to_full_recompute(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=20, max_turns=4, n_batches=1,
                              events_per_batch=150, seed=5, evolve_batch=None))
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    roll = _rollup_table(spark, str(tmp_path / "roll"))
    replay_feed(spark, feed, src)
    sync_aggregate(src, roll, conv_rollup)

    src.overwrite(src.read().filter("turn_idx % 2 = 0"))
    res = sync_aggregate(src, roll, conv_rollup)
    assert res[-1].get("mode") == "overwrite" and not res[-1]["skipped"]
    pd.testing.assert_frame_equal(_got(roll), _expect(src), check_dtype=False)
    assert all(x["skipped"] for x in sync_aggregate(src, roll, conv_rollup))
