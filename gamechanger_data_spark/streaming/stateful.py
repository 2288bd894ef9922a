"""Streaming analytics over the change feed — watermarked windows and a
custom stateful operator.

The reference is pure batch (SURVEY §2.9: no windows, no watermarks); these
are the Spark-native generalizations a streaming CDC engine needs:

  * ``windowed_event_rates`` — tumbling-window counts per producer with a
    watermark bounding state for late data (the streaming form of the
    batch ``tumbling_window_counts`` catalog query);
  * ``running_conv_state`` — applyInPandasWithState: per-conversation
    running turn count + latest event time, maintained across micro-batches
    (the streaming analog of the reference's per-crawler status rows,
    dataPipelines/gc_crawler_status_monitor/crawler_monitor.py:14-37).

State sizing at 10^10 events: keys = conversations (~10^8); state payload
is 2 longs — ~2 GB cluster-wide, well inside the state store; the
watermark bounds the window-agg state to (watermark horizon / window) rows
per producer.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATE_SCHEMA = "n_events long, last_ts timestamp"
RUNNING_OUTPUT_SCHEMA = "conv_id string, n_events long, last_ts timestamp"


def windowed_event_rates(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Events per (window, producer) with late-data tolerance = watermark.

    Grouping must be on the FULL window column, not ``.start``: projecting
    the start field before the groupBy strips the event-time/watermark
    metadata, so Spark would treat this as an unwatermarked aggregation —
    append mode rejected and window state never evicted. ``.start`` is
    projected AFTER the aggregate."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "producer")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "producer", "n"
        )
    )


def _update_running(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n = 0
    last = None
    if state.exists:
        n, last = state.get
    for pdf in batches:  # Arrow batches; vectorized — no per-row python
        n += len(pdf)
        m = pdf["ts"].max()
        last = m if last is None or m > last else last
    state.update((n, last))
    yield pd.DataFrame(
        {"conv_id": [key[0]], "n_events": [n], "last_ts": [last]}
    )


def running_conv_state(stream: DataFrame) -> DataFrame:
    """Per-conversation running (event count, latest ts) across batches —
    emitted every batch the conversation appears in (update semantics)."""
    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_window_counts(stream: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization via the native session_window (gap-based
    dynamic windows); the batch twin is the catalog's lag+cumsum
    `sessionize_events`.

    Grouping must be on the session_window COLUMN itself — grouping on its
    ``.start`` field defeats the session-merge machinery entirely (every
    distinct timestamp becomes its own "session") and strips the watermark
    metadata. ``.start`` is projected after the aggregate."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "producer")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "producer",
            "n_events",
        )
    )
