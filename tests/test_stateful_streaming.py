"""Watermarked window aggs + applyInPandasWithState against batch truth."""

import pandas as pd

from gamechanger_data_spark.datagen import FeedSpec, all_events, write_feed
from gamechanger_data_spark.schema import CHANGE_EVENT_SCHEMA
from gamechanger_data_spark.sources.feed import read_feed_stream
from gamechanger_data_spark.streaming.stateful import (
    running_conv_state,
    windowed_event_rates,
)

SPEC = FeedSpec(n_convs=40, max_turns=6, n_batches=3, events_per_batch=500,
                seed=17, evolve_batch=None)


def _feed(tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(feed, SPEC)
    return feed


def test_windowed_rates_match_batch_truth(spark, tmp_path):
    feed = _feed(tmp_path)
    stream = read_feed_stream(spark, feed, CHANGE_EVENT_SCHEMA)
    q = (
        windowed_event_rates(stream, window="1 hour", watermark="2 hours")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("rates")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from rates").toPandas()

    ev = all_events(SPEC)
    want = (
        ev.assign(window_start=ev.ts.dt.floor("h"))
        .groupby(["window_start", "producer"])
        .size()
        .reset_index(name="n")
    )
    got = got.sort_values(["window_start", "producer"]).reset_index(drop=True)
    want = want.sort_values(["window_start", "producer"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["window_start", "producer", "n"]],
        want[["window_start", "producer", "n"]],
        check_dtype=False,
    )


def test_running_conv_state_final_counts(spark, tmp_path):
    feed = _feed(tmp_path)
    stream = read_feed_stream(spark, feed, CHANGE_EVENT_SCHEMA)
    q = (
        running_conv_state(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from running").toPandas()
    # last emission per conv (the stream ran as one availableNow batch or
    # several; take the max n_events per conv = final running count)
    final = got.groupby("conv_id").n_events.max()

    ev = all_events(SPEC)
    want = ev.groupby("conv_id").size()
    pd.testing.assert_series_equal(
        final.sort_index(), want.sort_index(), check_names=False, check_dtype=False
    )


def test_session_window_counts_runs(spark, tmp_path):
    from gamechanger_data_spark.streaming.stateful import session_window_counts

    feed = str(tmp_path / "feed_sw")
    write_feed(feed, SPEC)
    stream = read_feed_stream(spark, feed, CHANGE_EVENT_SCHEMA)
    q = (
        session_window_counts(stream, gap="30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sess").toPandas()
    assert len(got) > 0
    assert (got.n_events > 0).all()
    # total events conserved across sessions
    assert got.n_events.sum() == len(all_events(SPEC))
