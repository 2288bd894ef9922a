"""Multi-writer optimistic concurrency for LakeTable: CAS pointer swap,
bucket-level conflict detection, rebase (MOR always / CoW when disjoint),
exactly-once under racing writers of the same batch, maintenance-id
hygiene, orphan-GC grace window, and reader snapshot isolation.

Reference analog: the job-registry single-flight discipline the reference
uses to serialize pipeline runs (dataPipelines/gc_db_utils/orch/sql/
create_tables.sql:31-39) — upgraded here to per-commit CAS, the Iceberg
commit model.
"""

import os
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
import pytest

from gamechanger_data_spark.sinks.table import CommitConflictError, LakeTable

NB = 8


def _ev(spark, rows):
    """rows: (conv_id, turn_idx, ts_epoch_sec, event_seq, op, text)."""
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "ts", "event_seq", "op", "text"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int64")
    pdf["event_seq"] = pdf["event_seq"].astype("int64")
    return spark.createDataFrame(pdf)


def _keys_by_bucket(spark, table, n=64):
    """Map bucket -> a (conv_id, turn_idx) key hashing into it."""
    probe = spark.createDataFrame(
        [(f"conv{i}", 0) for i in range(n)], "conv_id string, turn_idx long"
    )
    got = probe.select(
        "conv_id", "turn_idx", table._bucket_expr().cast("int").alias("b")
    ).collect()
    out = {}
    for r in got:
        out.setdefault(r["b"], (r["conv_id"], r["turn_idx"]))
    return out


def _read_keys(table):
    pdf = table.read().toPandas().sort_values(["conv_id", "turn_idx"])
    return {
        (r.conv_id, r.turn_idx): (r.text, r.event_seq)
        for r in pdf.itertuples()
    }


def test_disjoint_cow_writers_both_land_via_rebase(spark, tmp_path):
    """Writer A's CoW commit races writer B's on DISJOINT buckets: A loses
    the CAS but rebases WITHOUT re-running the merge (on_conflict='error'
    proves the rebase path — a whole-op retry would be forbidden)."""
    root = str(tmp_path / "t")
    a = LakeTable(spark, root, n_buckets=NB)
    # seed so both writers see an existing schema/base
    a.merge(_ev(spark, [("seed", 0, 100, 1, "insert", "s")]), "seed")

    kb = _keys_by_bucket(spark, a)
    (ca, ta), (cb, tb) = kb[0], kb[1]  # distinct buckets by construction

    b = LakeTable(spark, root, n_buckets=NB)
    src_b = _ev(spark, [(cb, tb, 200, 10, "insert", "from-B")])
    a._test_pre_commit = lambda: b.merge(src_b, "batch-B")

    src_a = _ev(spark, [(ca, ta, 200, 11, "insert", "from-A")])
    r = a.merge(src_a, "batch-A", on_conflict="error")
    assert not r["skipped"]

    final = LakeTable(spark, root, n_buckets=NB)
    assert {"seed", "batch-A", "batch-B"} <= final.applied_batches()
    keys = _read_keys(final)
    assert keys[(ca, ta)][0] == "from-A"
    assert keys[(cb, tb)][0] == "from-B"
    assert keys[("seed", 0)][0] == "s"
    v = final.verify()
    assert v["ok"], v


def test_overlapping_cow_conflict_errors_then_retry_converges(spark, tmp_path):
    """Same-bucket CoW race: with on_conflict='error' the loser aborts
    cleanly (table unchanged by the failed attempt); with the default
    retry policy the loser re-runs against fresh state and the final
    table is the LWW over ALL events."""
    root = str(tmp_path / "t")
    a = LakeTable(spark, root, n_buckets=NB)
    kb = _keys_by_bucket(spark, a)
    c, t = kb[0]
    a.merge(_ev(spark, [(c, t, 100, 1, "insert", "v1")]), "seed")

    b = LakeTable(spark, root, n_buckets=NB)

    # abort mode: loser raises, winner's commit is intact
    a._test_pre_commit = lambda: b.merge(
        _ev(spark, [(c, t, 200, 10, "update", "from-B")]), "batch-B"
    )
    with pytest.raises(CommitConflictError):
        a.merge(
            _ev(spark, [(c, t, 300, 11, "update", "from-A")]),
            "batch-A",
            on_conflict="error",
        )
    mid = LakeTable(spark, root, n_buckets=NB)
    assert "batch-B" in mid.applied_batches()
    assert "batch-A" not in mid.applied_batches()
    assert _read_keys(mid)[(c, t)][0] == "from-B"

    # retry mode (default): loser re-merges against fresh state; newest
    # event (ts=300 from A) wins LWW over B's ts=200
    a2 = LakeTable(spark, root, n_buckets=NB)
    b2 = LakeTable(spark, root, n_buckets=NB)
    a2._test_pre_commit = lambda: b2.merge(
        _ev(spark, [(c, t, 250, 12, "update", "from-B2")]), "batch-B2"
    )
    r = a2.merge(_ev(spark, [(c, t, 300, 13, "update", "from-A")]), "batch-A")
    assert not r["skipped"]
    final = LakeTable(spark, root, n_buckets=NB)
    assert {"batch-B2", "batch-A"} <= final.applied_batches()
    assert _read_keys(final)[(c, t)][0] == "from-A"
    assert final.verify()["ok"]


def test_mor_delta_appends_rebase_across_same_bucket(spark, tmp_path):
    """MOR delta appends commute under LWW: two writers appending deltas
    to the SAME bucket both land without a whole-op retry
    (on_conflict='error'), and the read resolves the newest event."""
    root = str(tmp_path / "t")
    a = LakeTable(spark, root, n_buckets=NB)
    kb = _keys_by_bucket(spark, a)
    c, t = kb[0]
    a.merge(_ev(spark, [(c, t, 100, 1, "insert", "base")]), "seed")

    b = LakeTable(spark, root, n_buckets=NB)
    a._test_pre_commit = lambda: b.merge(
        _ev(spark, [(c, t, 200, 10, "update", "mor-B")]), "mor-B", mode="mor"
    )
    r = a.merge(
        _ev(spark, [(c, t, 300, 11, "update", "mor-A")]),
        "mor-A",
        mode="mor",
        on_conflict="error",
    )
    assert not r["skipped"] and r["mode"] == "mor"

    final = LakeTable(spark, root, n_buckets=NB)
    assert {"mor-A", "mor-B"} <= final.applied_batches()
    assert _read_keys(final)[(c, t)][0] == "mor-A"
    # both delta files are stacked on the bucket
    m = final._load_manifest()
    bk = str(final._load_manifest()["touched_buckets"][0])
    assert len(m["deltas"][bk]) == 2
    # compaction folds the race's deltas into a consistent base
    final.compact()
    assert _read_keys(final)[(c, t)][0] == "mor-A"
    assert final.verify()["ok"]


def test_same_batch_id_race_resolves_to_one_apply_one_skip(spark, tmp_path):
    """Two writers racing the SAME batch_id: the CAS loser re-checks the
    applied set and returns skipped instead of double-applying."""
    root = str(tmp_path / "t")
    a = LakeTable(spark, root, n_buckets=NB)
    a.merge(_ev(spark, [("seed", 0, 100, 1, "insert", "s")]), "seed")

    b = LakeTable(spark, root, n_buckets=NB)
    src = [("cX", 3, 200, 10, "insert", "payload")]
    a._test_pre_commit = lambda: b.merge(_ev(spark, src), "dup-batch")
    r = a.merge(_ev(spark, src), "dup-batch")
    assert r["skipped"] is True

    final = LakeTable(spark, root, n_buckets=NB)
    assert sorted(final.applied_batches()) == ["dup-batch", "seed"]
    assert _read_keys(final)[("cX", 3)][0] == "payload"
    # exactly one data commit for the batch beyond the seed
    kinds = [k for _, k in final.history().select("version", "kind").collect()]
    assert kinds.count("data") == 2


def test_threaded_writers_converge_to_lww_oracle(spark, tmp_path):
    """4 threads x 3 batches each, all writers on one table root with
    overlapping hot keys; final state must equal the pandas LWW oracle
    over the union of all events, with all 12 batches applied exactly
    once. Exercises real flock contention + rebase/retry under genuine
    parallel Spark jobs."""
    root = str(tmp_path / "t")
    seedt = LakeTable(spark, root, n_buckets=NB)
    seedt.merge(_ev(spark, [("warm", 0, 1, 1, "insert", "w")]), "warm")

    keys = [(f"k{i}", i % 4) for i in range(10)]  # shared across threads
    all_rows = []
    batches: list[tuple[str, list]] = []
    seq = 100
    for w in range(4):
        for j in range(3):
            rows = []
            for i, (c, t) in enumerate(keys):
                if (i + w + j) % 2 == 0:  # overlap, but not identical sets
                    seq += 1
                    rows.append((c, t, 1000 + seq, seq, "update", f"w{w}b{j}s{seq}"))
            batches.append((f"w{w}-b{j}", rows))
            all_rows.extend(rows)

    def run(args):
        name, rows = args
        t = LakeTable(spark, root, n_buckets=NB)
        return t.merge(_ev(spark, rows), name)

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run, batches))
    assert all(not r["skipped"] for r in results)

    final = LakeTable(spark, root, n_buckets=NB)
    assert {name for name, _ in batches} <= final.applied_batches()

    # pandas LWW oracle: max (ts, event_seq) per key
    pdf = pd.DataFrame(
        all_rows, columns=["conv_id", "turn_idx", "ts", "event_seq", "op", "text"]
    )
    want = (
        pdf.sort_values(["ts", "event_seq"])
        .groupby(["conv_id", "turn_idx"])
        .tail(1)
        .set_index(["conv_id", "turn_idx"])["text"]
        .to_dict()
    )
    got = {k: v[0] for k, v in _read_keys(final).items() if k[0] != "warm"}
    assert got == want
    assert final.verify()["ok"]


def test_compact_racing_merge_stays_consistent(spark, tmp_path):
    """A maintenance compaction racing a data merge on the same buckets:
    the CAS loser (whichever it is) re-runs against fresh state, no
    committed data is lost, and the resolved read equals LWW over all
    events. Here the merge commits first (injected via the compact's
    pre-commit hook), so the compaction — whose resolution snapshot is
    now stale — must re-run rather than clobber the merge."""
    root = str(tmp_path / "t")
    t = LakeTable(spark, root, n_buckets=4)
    kb = _keys_by_bucket(spark, t)
    c, tn = kb[0]
    t.merge(_ev(spark, [(c, tn, 100, 1, "insert", "base")]), "seed")
    # stack a delta so compact has work
    t.merge(_ev(spark, [(c, tn, 200, 2, "update", "d1")]), "m1", mode="mor")

    w = LakeTable(spark, root, n_buckets=4)
    t._test_pre_commit = lambda: w.merge(
        _ev(spark, [(c, tn, 300, 3, "update", "newest")]), "m2", mode="mor"
    )
    r = t.compact()
    assert not r["skipped"]

    final = LakeTable(spark, root, n_buckets=4)
    assert {"seed", "m1", "m2"} <= final.applied_batches()
    assert _read_keys(final)[(c, tn)][0] == "newest"
    assert final.verify()["ok"]


def test_maintenance_commits_never_enter_batch_history(spark, tmp_path):
    """Repeated compact() adds no applied-batch ids, and a DATA merge that
    happens to reuse a maintenance-looking id applies normally (never a
    silent replay skip) — then replays exactly-once like any other id."""
    root = str(tmp_path / "t")
    t = LakeTable(spark, root, n_buckets=4)
    t.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "a")]), "b0")
    t.merge(_ev(spark, [("c1", 0, 200, 2, "update", "b")]), "b1", mode="mor")
    before = t.applied_batches()
    r1 = t.compact()
    assert not r1["skipped"]
    r2 = t.compact()  # nothing dirty -> skip, still no id registered
    assert r2["skipped"]
    assert t.applied_batches() == before
    assert "__compact__" not in t.applied_batches()

    r = t.merge(_ev(spark, [("c2", 1, 300, 3, "insert", "c")]), "__compact__")
    assert not r["skipped"]
    r = t.merge(_ev(spark, [("c2", 1, 300, 3, "insert", "c")]), "__compact__")
    assert r["skipped"]  # true replay of a DATA batch


def test_stale_instance_maintenance_after_rebucket_loses_nothing(spark, tmp_path):
    """An instance constructed under the OLD bucket spec running
    full-rewrite maintenance after another writer rebucketed: the op must
    pin the manifest's current spec (reading only the stale spec's bucket
    range would commit a fraction of the table as a 'full' rewrite)."""
    root = str(tmp_path / "t")
    old = LakeTable(spark, root, n_buckets=4)
    rows = [(f"c{i}", i % 3, 100 + i, i + 1, "insert", f"t{i}") for i in range(30)]
    old.merge(_ev(spark, rows), "b0")

    other = LakeTable(spark, root, n_buckets=4)
    r = other.rebucket(16)
    assert r["n_buckets"] == 16

    # `old` still believes n_buckets=4; maintenance must adopt 16
    res = old.expire_tombstones(older_than=pd.Timestamp("1970-01-01"))
    assert not res["skipped"]
    final = LakeTable(spark, root)
    assert final.read().count() == 30
    assert final.verify()["ok"]

    # same for a stale-instance merge: rows must land in registered buckets
    old2 = LakeTable(spark, root, n_buckets=4)
    old2.n_buckets = 4  # simulate staleness (ctor adopts; force it back)
    old2.merge(_ev(spark, [("cX", 9, 999, 99, "insert", "late")]), "b1")
    final2 = LakeTable(spark, root)
    assert final2.read().count() == 31
    assert final2.verify()["ok"]

    # and for a stale-instance point lookup: the probe must hash under
    # the manifest's spec, not the instance's (a stale hash silently
    # reads the wrong bucket and returns empty for a live key)
    old3 = LakeTable(spark, root)
    old3.n_buckets = 4
    hit = old3.lookup_key(conv_id="cX", turn_idx=9).toPandas()
    assert list(hit["text"]) == ["late"]


def test_expire_grace_spares_inflight_files(spark, tmp_path):
    """A fresh unreferenced parquet (a concurrent writer's not-yet-
    committed data) survives expire_snapshots under a grace window and is
    collected once it ages past it."""
    root = str(tmp_path / "t")
    t = LakeTable(spark, root, n_buckets=4)
    t.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "a")]), "b0")

    orphan_dir = os.path.join(root, "data", "snap-inflight-test")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-000.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not-yet-committed")

    t.expire_snapshots(keep_last=100, grace_sec=3600)
    assert os.path.exists(orphan)  # spared: younger than the grace window
    t.expire_snapshots(keep_last=100, grace_sec=0)
    assert not os.path.exists(orphan)


def test_pinned_reader_snapshot_isolation(spark, tmp_path):
    """A reader holding version N while a writer commits N+1: the pinned
    read completes while N is retained, and fails LOUDLY (missing input
    file), never silently short, once expire_snapshots drops N's files —
    the documented retention contract."""
    root = str(tmp_path / "t")
    t = LakeTable(spark, root, n_buckets=2)
    t.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "old")]), "b0")
    v1 = t.current_version()
    pinned = t.read(version=v1)

    # writer rewrites the same bucket at N+1
    t.merge(_ev(spark, [("c1", 0, 200, 2, "update", "new")]), "b1")

    # retained: the pinned read still serves the old snapshot
    t.expire_snapshots(keep_last=2, grace_sec=0)
    got = pinned.toPandas()
    assert list(got["text"]) == ["old"]

    # expired: v1's files are exclusively referenced -> removed; the
    # pinned plan must now fail loudly at execution
    removed = t.expire_snapshots(keep_last=1, grace_sec=0)
    assert removed > 0
    # fails at plan construction (path resolution) or execution — either
    # way loudly, never a silent short result
    with pytest.raises(Exception) as ei:
        t.read(version=v1).toPandas()
    msg = str(ei.value)
    assert (
        "not exist" in msg or "FileNotFound" in msg or "PATH_NOT_FOUND" in msg
    )


def test_concurrent_writers_across_instances_no_hook(spark, tmp_path):
    """Sanity: sequential writers through SEPARATE LakeTable instances on
    one root stay consistent (manifest reload per merge, no cached-state
    staleness)."""
    root = str(tmp_path / "t")
    a = LakeTable(spark, root, n_buckets=4)
    b = LakeTable(spark, root, n_buckets=4)
    a.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "a")]), "b0")
    b.merge(_ev(spark, [("c2", 0, 100, 2, "insert", "b")]), "b1")
    a.merge(_ev(spark, [("c1", 0, 300, 3, "update", "a2")]), "b2")
    final = LakeTable(spark, root, n_buckets=4)
    keys = _read_keys(final)
    assert keys[("c1", 0)][0] == "a2"
    assert keys[("c2", 0)][0] == "b"
    assert len(final.applied_batches()) == 3


def test_commit_lock_and_cas_across_processes(spark, tmp_path):
    """The writer lock is flock-based, so it must serialize ACROSS
    PROCESSES, and a commit landed by another process must CAS-conflict
    this one. A child python process (no Spark — _commit is pure
    metadata) takes the lock, holds it, commits, and releases; the
    parent's commit must block until release and then fail the CAS."""
    import subprocess
    import sys
    import textwrap

    root = str(tmp_path / "t")
    t = LakeTable(spark, root, n_buckets=4)
    t.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "a")]), "b0")
    v = t.current_version()

    child_src = textwrap.dedent(f"""
        import json, sys, time
        sys.path.insert(0, {repr(os.getcwd())})
        from gamechanger_data_spark.sinks.table import LakeTable
        t = LakeTable.__new__(LakeTable)  # no Spark session needed
        t.root = {root!r}
        t.key_cols = ("conv_id", "turn_idx")
        t.order_cols = ("ts", "event_seq")
        t._segment_cache = {{}}
        t._test_pre_commit = None
        t.branch = "main"
        m = t._load_manifest()
        with t._commit_lock():
            print("LOCKED", flush=True)
            time.sleep(2.0)
            # commit a maintenance no-op manifest while holding the lock
            m2 = dict(m)
            m2["parent"] = m["version"]
            m2["kind"] = "maintenance"
            m2["touched_buckets"] = []
            m2["lineage"] = []
            mp = t._meta_path(m["version"] + 1)
            m2["version"] = m["version"] + 1
            m2["committed_at"] = "test"
            with open(mp, "w") as f:
                json.dump(m2, f)
            t._swap_version_pointer(m2["version"])
        print("RELEASED", flush=True)
    """)
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src],
        stdout=subprocess.PIPE, text=True, cwd=os.getcwd(),
    )
    # wait for the child to hold the lock (watchdog: a child that wedges
    # before printing must fail the test, not hang the run)
    import threading
    watchdog = threading.Timer(60, proc.kill)
    watchdog.start()
    line = proc.stdout.readline().strip()
    assert line == "LOCKED", line

    # parent commit: must BLOCK until the child releases (>=1s of the
    # child's 2s hold remains), then CAS-fail against the child's commit
    m = t._load_manifest(v)
    manifest = {
        "version": v + 1, "schema": m["schema"], "n_buckets": t.n_buckets,
        "files": m["files"], "deltas": m.get("deltas", {}),
        "base_rows": m.get("base_rows", {}), "delta_rows": m.get("delta_rows", {}),
        "applied_batches": m.get("applied_batches", []),
        "batches_segment": m.get("batches_segment"),
        "lineage": [], "parent": v, "kind": "data", "touched_buckets": [],
    }
    # The CommitConflictError itself proves cross-process serialization:
    # had flock NOT blocked the parent, it would have entered the
    # critical section while the child still slept pre-commit, seen the
    # pointer at v, and its CAS would have SUCCEEDED. (No wall-clock
    # assertion — timing thresholds are flaky on a loaded host.)
    with pytest.raises(CommitConflictError):
        t._commit(manifest, expected_parent=v)
    proc.wait(timeout=30)
    watchdog.cancel()
    assert t.current_version() == v + 1  # the child's commit won


def test_mor_rebase_respects_delta_bound(spark, tmp_path):
    """An auto-mode MOR merge whose CAS loses to a commit that filled the
    touched bucket's delta stack to mor_max_deltas must NOT rebase (the
    stack would exceed the read-amplification bound) — the whole-op retry
    re-decides against fresh state and lands as CoW, folding the stack."""
    root = str(tmp_path / "t")
    a = LakeTable(
        spark, root, n_buckets=4, merge_mode="auto",
        mor_fraction=0.5, mor_max_deltas=1,
    )
    # seed ~10 resident rows per bucket so a 1-row batch decides "mor"
    seed = _ev(
        spark,
        [(f"s{i}", 0, 100, i + 1, "insert", "seed") for i in range(40)],
    )
    a.merge(seed, "seed", src_rows=40)

    # two DISTINCT keys hashing into the SAME bucket
    probe = spark.createDataFrame(
        [(f"x{i}", 0) for i in range(64)], "conv_id string, turn_idx long"
    )
    got = probe.select(
        "conv_id", "turn_idx", a._bucket_expr().cast("int").alias("b")
    ).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r["b"], []).append((r["conv_id"], r["turn_idx"]))
    keys = next(v for v in by_bucket.values() if len(v) >= 2)
    (ca, ta), (cb, tb) = keys[0], keys[1]

    b = LakeTable(
        spark, root, n_buckets=4, merge_mode="auto",
        mor_fraction=0.5, mor_max_deltas=1,
    )
    src_b = _ev(spark, [(cb, tb, 200, 100, "insert", "from-B")])
    a._test_pre_commit = lambda: b.merge(src_b, "batch-B", src_rows=1)

    src_a = _ev(spark, [(ca, ta, 200, 101, "insert", "from-A")])
    r = a.merge(src_a, "batch-A", src_rows=1)
    assert not r["skipped"]
    # B's delta append filled the stack to the cap; A's retry must have
    # flipped to CoW (a rebased MOR append would report mode == "mor"
    # and leave the stack above mor_max_deltas)
    assert r["mode"] == "cow"
    final = LakeTable(spark, root, n_buckets=4)
    m = final._load_manifest()
    assert all(len(fl) <= 1 for fl in m.get("deltas", {}).values())
    keys_out = _read_keys(final)
    assert keys_out[(ca, ta)][0] == "from-A"
    assert keys_out[(cb, tb)][0] == "from-B"


def test_expire_keep_last_zero_keeps_only_current(spark, tmp_path):
    """keep_last=0 means 'retain only the current version (+ tag pins)' —
    the python snaps[-0:] slicing trap must not silently keep everything;
    negative keep_last is rejected."""
    root = str(tmp_path / "t")
    t = LakeTable(spark, root, n_buckets=2)
    t.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "a")]), "b0")
    t.merge(_ev(spark, [("c1", 0, 200, 2, "update", "b")]), "b1")
    t.merge(_ev(spark, [("c2", 0, 300, 3, "insert", "c")]), "b2")
    removed = t.expire_snapshots(keep_last=0, grace_sec=0)
    assert removed > 0  # pre-current versions' exclusive files are gone
    keys = _read_keys(t)
    assert keys[("c1", 0)][0] == "b" and keys[("c2", 0)][0] == "c"
    with pytest.raises(Exception):
        t.read(version=1).toPandas()  # expired snapshot fails loudly
    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=-1, grace_sec=0)


def test_two_concurrent_streaming_drivers_disjoint_feeds(spark, tmp_path):
    """Two replay_feed drivers running CONCURRENTLY over disjoint feeds
    into one table (each through its own LakeTable instance, per the
    instance-sharing contract): every batch id from both feeds lands
    exactly once, a re-run of both drivers is all-skips, and the final
    state equals the single-driver oracle over the union of events."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gamechanger_data_spark.datagen import (
        BATCH_PREFIX,
        READY_MARKER,
        FeedSpec,
        all_events,
        batch_id_for,
        generate_batch,
        pandas_oracle,
        write_feed,
    )
    from gamechanger_data_spark.functions.text import normalize_text_pandas
    from gamechanger_data_spark.streaming.driver import replay_feed

    spec_a = FeedSpec(n_convs=30, n_batches=3, events_per_batch=300, seed=11)
    spec_b = FeedSpec(n_convs=30, n_batches=3, events_per_batch=300, seed=23)
    feed_a = str(tmp_path / "feedA")
    feed_b = str(tmp_path / "feedB")
    write_feed(feed_a, spec_a)
    # feed B: disjoint batch ids (suffix) AND disjoint conv keys (prefix)
    for b in range(spec_b.n_batches):
        pdf = generate_batch(spec_b, b)
        pdf["conv_id"] = "B-" + pdf["conv_id"]
        d = os.path.join(feed_b, f"{BATCH_PREFIX}{batch_id_for(b)}-B")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(d, "part-0000.parquet"))
        open(os.path.join(d, READY_MARKER), "w").write("ready\n")

    root = str(tmp_path / "t")
    ta = LakeTable(spark, root, n_buckets=NB)
    tb = LakeTable(spark, root, n_buckets=NB)
    with ThreadPoolExecutor(max_workers=2) as ex:
        fa = ex.submit(replay_feed, spark, feed_a, ta)
        fb = ex.submit(replay_feed, spark, feed_b, tb)
        ra, rb = fa.result(timeout=600), fb.result(timeout=600)
    assert all(not r.get("skipped") for r in ra)
    assert all(not r.get("skipped") for r in rb)

    final = LakeTable(spark, root, n_buckets=NB)
    ids = final.applied_batches()
    assert len(ids) == 6 and sum(1 for i in ids if i.endswith("-B")) == 3

    # a re-run of BOTH drivers is pure skips (exactly-once)
    assert all(r.get("skipped") for r in replay_feed(spark, feed_a, ta))
    assert all(r.get("skipped") for r in replay_feed(spark, feed_b, tb))

    ev_b = pd.concat(
        [generate_batch(spec_b, b) for b in range(spec_b.n_batches)],
        ignore_index=True,
    )
    ev_b["conv_id"] = "B-" + ev_b["conv_id"]
    ev = pd.concat([all_events(spec_a), ev_b], ignore_index=True)
    want = pandas_oracle(ev, normalize=normalize_text_pandas)
    got = (
        final.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pd.testing.assert_frame_equal(
        got[cols], want[cols].reset_index(drop=True), check_dtype=False
    )

    # lineage rows survive the interleaving: per-feed rows_in totals match
    lin = final.lineage().toPandas()
    lin = lin[lin.partition_id >= 0]
    assert int(lin.rows_in.sum()) == len(ev)
