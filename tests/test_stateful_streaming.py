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


def test_session_window_counts_match_gap_oracle(spark, tmp_path):
    """Sessions must MERGE: compare against an independent pandas
    gap-split oracle (sort per producer, break where ts gap > 30 min) —
    per-session start times and event counts, not just totals (a
    totals-only check passes under ANY grouping and missed the round-1
    group-by-.start bug where every timestamp was its own session)."""
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
    got = (
        spark.sql("select * from sess").toPandas()
        .sort_values(["producer", "session_start"]).reset_index(drop=True)
    )

    ev = all_events(SPEC).sort_values(["producer", "ts"], kind="mergesort")
    gap = pd.Timedelta(minutes=30)
    rows = []
    for producer, g in ev.groupby("producer"):
        brk = (g.ts.diff() > gap).cumsum()
        for _, s in g.groupby(brk):
            rows.append((producer, s.ts.min(), len(s)))
    want = (
        pd.DataFrame(rows, columns=["producer", "session_start", "n_events"])
        .sort_values(["producer", "session_start"]).reset_index(drop=True)
    )
    assert got.n_events.sum() == len(ev)
    pd.testing.assert_frame_equal(
        got[["producer", "session_start", "n_events"]], want, check_dtype=False
    )
