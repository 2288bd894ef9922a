"""Structured Streaming path: file source -> foreachBatch apply with
checkpointLocation; restart must not double-apply (offset log + batch-id
markers)."""

import pandas as pd

from gamechanger_data_spark.datagen import (
    FeedSpec,
    all_events,
    pandas_oracle,
    write_feed,
)
from gamechanger_data_spark.functions.text import normalize_text_pandas
from gamechanger_data_spark.schema import CHANGE_EVENT_SCHEMA
from gamechanger_data_spark.sinks.table import LakeTable
from gamechanger_data_spark.streaming.driver import stream_feed

SPEC = FeedSpec(
    n_convs=60, max_turns=8, n_batches=3, events_per_batch=600, seed=11,
    evolve_batch=None,  # file-source stream uses one fixed schema
)
PARITY = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_stream_feed_parity_and_restart(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(feed, SPEC)
    table = LakeTable(spark, str(tmp_path / "table"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")

    q = stream_feed(spark, feed, table, ckpt, CHANGE_EVENT_SCHEMA)
    q.awaitTermination(120)

    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    want = pandas_oracle(all_events(SPEC), normalize=normalize_text_pandas)
    pd.testing.assert_frame_equal(
        got[PARITY].reset_index(drop=True),
        want[PARITY].reset_index(drop=True),
        check_dtype=False,
    )

    # restart with the same checkpoint: no new data -> no new versions
    v = table.current_version()
    q2 = stream_feed(spark, feed, table, ckpt, CHANGE_EVENT_SCHEMA)
    q2.awaitTermination(120)
    assert table.current_version() == v


def test_stream_restart_picks_up_new_batches_only(spark, tmp_path):
    """Restart with the same checkpoint after NEW feed batches arrive:
    exactly the new data is applied (offset log positions the source; the
    stream-identity-namespaced batch markers stay unique across restarts)."""
    first = FeedSpec(n_convs=40, max_turns=6, n_batches=2, events_per_batch=400,
                     seed=19, evolve_batch=None)
    feed = str(tmp_path / "feed")
    write_feed(feed, first)
    table = LakeTable(spark, str(tmp_path / "table"), n_buckets=4)
    ckpt = str(tmp_path / "ckpt")

    stream_feed(spark, feed, table, ckpt, CHANGE_EVENT_SCHEMA).awaitTermination(120)

    # two more batches land (same generator, later batch indices)
    more = FeedSpec(n_convs=40, max_turns=6, n_batches=4, events_per_batch=400,
                    seed=19, evolve_batch=None)
    write_feed(feed, more)  # rewrites batches 0-1 identically, adds 2-3

    stream_feed(spark, feed, table, ckpt, CHANGE_EVENT_SCHEMA).awaitTermination(120)

    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    want = pandas_oracle(all_events(more), normalize=normalize_text_pandas)
    pd.testing.assert_frame_equal(
        got[PARITY].reset_index(drop=True),
        want[PARITY].reset_index(drop=True),
        check_dtype=False,
    )


def test_stream_ignores_unready_batch_dir(spark, tmp_path):
    """A batch directory whose ready marker has not landed must be
    INVISIBLE to the stream (the marker, written last, is the upstream
    commit point) — and picked up once the marker appears."""
    import os

    from gamechanger_data_spark.datagen import READY_MARKER, generate_batch

    feed = str(tmp_path / "feed")
    spec = FeedSpec(n_convs=30, max_turns=5, n_batches=2, events_per_batch=300,
                    seed=29, evolve_batch=None)
    write_feed(feed, spec)
    # strip the marker from batch 1: simulates an upstream crash mid-upload
    dirs = sorted(d for d in os.listdir(feed) if d.startswith("batch="))
    marker1 = os.path.join(feed, dirs[1], READY_MARKER)
    os.remove(marker1)

    table = LakeTable(spark, str(tmp_path / "table"), n_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    stream_feed(spark, feed, table, ckpt).awaitTermination(120)
    want0 = pandas_oracle(generate_batch(spec, 0),
                          normalize=normalize_text_pandas)
    assert table.read().count() == len(want0)  # only batch 0 applied

    # upstream commit completes -> next run applies exactly batch 1
    with open(marker1, "w") as f:
        f.write("ready\n")
    stream_feed(spark, feed, table, ckpt).awaitTermination(120)
    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    want = pandas_oracle(all_events(spec), normalize=normalize_text_pandas)
    pd.testing.assert_frame_equal(
        got[PARITY].reset_index(drop=True),
        want[PARITY].reset_index(drop=True),
        check_dtype=False,
    )


def test_stream_sees_zero_byte_marker(spark, tmp_path):
    """A marker created by touch (zero bytes) must still admit its batch:
    the eligibility rule is marker EXISTENCE, and the batch-mode path
    (list_ready_batches) already accepts it — the stream must not enforce
    a stricter non-empty-marker rule (the old text-source stream emitted
    zero rows for an empty file, silently dropping the batch)."""
    import os

    from gamechanger_data_spark.datagen import READY_MARKER, generate_batch

    feed = str(tmp_path / "feed")
    spec = FeedSpec(n_convs=20, max_turns=4, n_batches=1, events_per_batch=200,
                    seed=31, evolve_batch=None)
    write_feed(feed, spec)
    d = sorted(x for x in os.listdir(feed) if x.startswith("batch="))[0]
    marker = os.path.join(feed, d, READY_MARKER)
    os.remove(marker)
    open(marker, "w").close()  # touch: exists, zero bytes

    table = LakeTable(spark, str(tmp_path / "table"), n_buckets=4)
    stream_feed(spark, feed, table, str(tmp_path / "ckpt")).awaitTermination(120)
    want = pandas_oracle(generate_batch(spec, 0), normalize=normalize_text_pandas)
    assert table.read().count() == len(want)


def test_marker_stream_emits_existing_path_for_legacy_marker(tmp_path):
    """A batch admitted via the legacy _READY marker must surface THAT
    path as _source_file — not a ready.marker path that does not exist
    (consumers are allowed to stat/read the emitted marker)."""
    import os

    from gamechanger_data_spark.datagen import LEGACY_READY_MARKER, READY_MARKER
    from gamechanger_data_spark.sources.feed import _MarkerStreamReader

    feed = str(tmp_path / "feed")
    spec = FeedSpec(n_convs=10, max_turns=4, n_batches=2, events_per_batch=50,
                    seed=7, evolve_batch=None)
    write_feed(feed, spec)
    dirs = sorted(x for x in os.listdir(feed) if x.startswith("batch="))
    legacy_dir = os.path.join(feed, dirs[0])
    os.rename(os.path.join(legacy_dir, READY_MARKER),
              os.path.join(legacy_dir, LEGACY_READY_MARKER))

    reader = _MarkerStreamReader(feed)
    rows, _end = reader.read(reader.initialOffset())
    paths = [p for p, _ in rows]
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p), f"emitted marker path missing: {p}"
    assert paths[0].endswith(LEGACY_READY_MARKER)
    assert paths[1].endswith(READY_MARKER)


def test_batch_to_stream_handoff_exactly_once(spark, tmp_path):
    """Cross-MODE exactly-once: batches applied by batch-mode replay are
    skipped by a later stream_feed over the same feed (shared batch-id
    markers — no per-mode identity), and the stream's after_batch hook
    fires only for the genuinely new commit."""
    from gamechanger_data_spark.streaming.driver import replay_feed

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=30, max_turns=5, n_batches=3,
                              events_per_batch=300, seed=17))
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay_feed(spark, feed, table, limit=2)          # batch mode first
    v_after_batchmode = table.current_version()
    seen = []
    q = stream_feed(spark, feed, table, str(tmp_path / "ck"),
                    after_batch=lambda t, r: seen.append(r))
    q.awaitTermination(120)
    # stream applied ONLY batch 3: exactly one non-skipped hook call
    assert [r["batch_id"] for r in seen if not r.get("skipped")] != []
    applied = [r for r in seen if not r.get("skipped")]
    assert len(applied) == 1
    assert table.current_version() == v_after_batchmode + 1
    # replaying in batch mode afterwards is a full no-op
    assert all(r["skipped"] for r in replay_feed(spark, feed, table))
