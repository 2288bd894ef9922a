"""LakeTable mechanics: crash recovery (data written, pointer not swapped),
snapshot expiry, overwrite, bucket pruning."""

import os

import pandas as pd

from gamechanger_data_spark.datagen import FeedSpec, generate_batch, pandas_oracle
from gamechanger_data_spark.functions.text import normalize_text_pandas
from gamechanger_data_spark.sinks.table import META_DIR, VERSION_FILE, LakeTable
from gamechanger_data_spark.streaming.driver import apply_batch

SPEC = FeedSpec(n_convs=40, max_turns=6, n_batches=2, events_per_batch=400, seed=5,
                evolve_batch=None)


def _apply(spark, table, b):
    pdf = generate_batch(SPEC, b)
    return apply_batch(table, spark.createDataFrame(pdf), f"b{b}")


def test_crash_before_pointer_swap_recovers(spark, tmp_path):
    """Simulate a crash AFTER data files land but BEFORE the version pointer
    swap: the batch must not be marked applied, and a replay must converge to
    the correct state (data dir overwrite is idempotent)."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)

    # crash simulation: roll the pointer back (manifest v1 exists on disk,
    # but the commit point — the pointer — never moved)
    vp = os.path.join(str(tmp_path / "t"), META_DIR, VERSION_FILE)
    os.remove(vp)
    assert table.current_version() == 0
    assert table.applied_batches() == set()

    # replay the same batch: re-applies cleanly (snap dir overwritten)
    r = _apply(spark, table, 0)
    assert not r.get("skipped")
    _apply(spark, table, 1)

    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    ev = pd.concat([generate_batch(SPEC, 0), generate_batch(SPEC, 1)], ignore_index=True)
    want = pandas_oracle(ev, normalize=normalize_text_pandas)
    cols = ["conv_id", "turn_idx", "text", "ts"]
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True), want[cols].reset_index(drop=True),
        check_dtype=False,
    )


def test_expire_snapshots_keeps_current_readable(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    _apply(spark, table, 1)
    n_before = table.read().count()
    removed = table.expire_snapshots(keep_last=1, grace_sec=0)
    assert removed > 0
    assert table.read().count() == n_before  # current snapshot intact
    # manifests retained for lineage even after expiry
    assert len(table.snapshots()) == 2


def test_overwrite_replaces_state(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    pdf = generate_batch(SPEC, 1)
    table.overwrite(spark.createDataFrame(pdf))
    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    want = pandas_oracle(pdf)  # overwrite() does not normalize
    assert len(got) == len(want)


def test_bucket_pruned_read_is_partition_of_full(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    full = table.read().count()
    parts = sum(table.read_buckets([b]).count() for b in range(4))
    assert parts == full


def test_changelog_matches_winners(spark, tmp_path):
    """changelog(v) returns exactly the rows whose state was set by that
    commit, classified delete/revoke/upsert."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    _apply(spark, table, 1)
    v2 = table.current_version()

    ch = table.changelog(v2).toPandas()
    # every changed row's winning event came from batch 1's offset range
    b1 = generate_batch(SPEC, 1)
    lo, hi = b1.event_seq.min(), b1.event_seq.max()
    assert ((ch.event_seq >= lo) & (ch.event_seq <= hi)).all()
    assert set(ch.change_op.unique()) <= {"upsert", "delete", "revoke"}
    # cross-check against the oracle: state rows whose winner is from b1
    ev = pd.concat([generate_batch(SPEC, 0), b1], ignore_index=True)
    ordered = ev.sort_values(["ts", "event_seq"], kind="mergesort")
    winners = ordered.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    from_b1 = winners[(winners.event_seq >= lo) & (winners.event_seq <= hi)]
    assert len(ch) == len(from_b1)
    deletes = from_b1[from_b1.op == "delete"]
    assert (ch.change_op == "delete").sum() == len(deletes)


def test_rebucket_preserves_state_and_future_merges(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    before = table.read().orderBy("conv_id", "turn_idx").toPandas()
    table.rebucket(16)
    after = table.read().orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )
    # future merges use the new spec; reopening the table adopts it too
    _apply(spark, table, 1)
    reopened = LakeTable(spark, str(tmp_path / "t"), n_buckets=999)
    assert reopened.n_buckets == 16
    ev = pd.concat([generate_batch(SPEC, 0), generate_batch(SPEC, 1)], ignore_index=True)
    want = pandas_oracle(ev, normalize=normalize_text_pandas)
    got = reopened.read().orderBy("conv_id", "turn_idx").toPandas()
    cols = ["conv_id", "turn_idx", "text", "ts"]
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True), want[cols].reset_index(drop=True),
        check_dtype=False,
    )


def test_lookup_key_point_read(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    full = table.read().toPandas()
    # many probes so a wrong-bucket bug cannot pass by 1/n_buckets luck
    # (python int probes infer LONG; the stored key is INT — regression
    # guard for the type-sensitive xxhash64 bucket computation)
    for i in range(0, min(len(full), 40), 2):
        row = full.iloc[i]
        got = table.lookup_key(
            conv_id=row.conv_id, turn_idx=int(row.turn_idx)
        ).toPandas()
        assert len(got) == 1, f"lookup missed row {i}"
        assert got.iloc[0].text == row.text
    # missing key component is rejected
    import pytest as _pt
    with _pt.raises(ValueError):
        table.lookup_key(conv_id=full.iloc[0].conv_id)


def test_snapshot_isolation_reader_during_write(spark, tmp_path):
    """A reader holding version v keeps a consistent view while a new
    commit lands (old files are immutable until expire_snapshots)."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    v1 = table.current_version()
    reader = table.read(version=v1)  # lazy plan pinned to v1 files
    n_before = reader.count()
    _apply(spark, table, 1)  # concurrent-ish commit
    assert table.current_version() == v1 + 1
    assert reader.count() == n_before  # unchanged view, files intact


def test_changelog_empty_after_maintenance_commit(spark, tmp_path):
    """A compact at the head must yield an EMPTY changelog, not an error
    (routine under replay_feed(compact_every=k))."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4, merge_mode="mor")
    _apply(spark, table, 0)
    _apply(spark, table, 1)
    table.compact()
    ch = table.changelog(table.current_version())
    assert ch.count() == 0
    assert "change_op" in ch.columns


def test_lineage_not_double_counted_after_crash_orphan(spark, tmp_path):
    """Crash between manifest write and pointer swap leaves an orphan
    manifest; the re-applied batch must not double its lineage rows."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    total = table.lineage().toPandas()
    n0 = int(total[total.partition_id >= 0].rows_in.sum())

    # crash sim: pointer back to 0 (manifest v1 stays on disk as orphan)
    vp = os.path.join(str(tmp_path / "t"), META_DIR, VERSION_FILE)
    os.remove(vp)
    _apply(spark, table, 0)  # re-apply -> second manifest with same batch

    lin = table.lineage().toPandas()
    n1 = int(lin[lin.partition_id >= 0].rows_in.sum())
    assert n1 == n0  # deduped by (batch_id, partition_id)


def test_reopen_adopts_stored_key_spec(spark, tmp_path):
    """A reopen with a WRONG key/order spec must adopt the stored one
    (like n_buckets) — a silent mismatch would corrupt bucket pruning."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    reopened = LakeTable(
        spark, str(tmp_path / "t"),
        key_cols=("conv_id",), order_cols=("event_seq",), n_buckets=99,
    )
    assert reopened.key_cols == ("conv_id", "turn_idx")
    assert reopened.order_cols == ("ts", "event_seq")
    assert reopened.n_buckets == 4
    # merges through the reopened handle stay correct
    r = _apply(spark, reopened, 1)
    assert not r.get("skipped")
    assert reopened.read().count() == table.read().count()


def test_files_metadata_table(spark, tmp_path):
    """files() mirrors the manifest: base rows count matches the table,
    MOR deltas appear as kind='delta' and vanish after compact()."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4, merge_mode="mor")
    _apply(spark, table, 0)
    f = table.files().toPandas()
    assert set(f.kind) == {"delta"}  # MOR-only table: all data in deltas
    assert f.groupby("bucket").bucket_rows.first().sum() == table.read_buckets(
        range(4), include_tombstones=True
    ).count()
    table.compact()
    f2 = table.files().toPandas()
    assert set(f2.kind) == {"base"}
    # paths are manifest-relative and exist on disk
    import os
    assert all(os.path.exists(os.path.join(str(tmp_path / "t"), p)) for p in f2.path)


def test_overwrite_is_atomic_and_preserves_history(spark, tmp_path):
    """Crash during overwrite must leave the old table current; after a
    successful overwrite, replaying an already-applied batch is STILL a
    no-op (applied-batch history survives the replace) and the second
    overwrite (default batch id) is not swallowed as a replay."""
    root = str(tmp_path / "t")
    table = LakeTable(spark, root, n_buckets=4)
    _apply(spark, table, 0)
    v1 = table.current_version()
    n1 = table.read().count()

    # crash simulation: the replacement snapshot write raises mid-build
    from pyspark.sql import functions as F

    pdf1 = generate_batch(SPEC, 1)
    bad = spark.createDataFrame(pdf1).withColumn(
        "ts", F.raise_error(F.lit("boom")).cast("timestamp")
    )
    try:
        table.overwrite(bad)
        raise AssertionError("expected the overwrite build to fail")
    except Exception:
        pass
    assert table.current_version() == v1  # pointer never moved
    assert table.read().count() == n1     # old table fully intact
    assert "b0" in table.applied_batches()

    # successful overwrite: history carried forward
    table.overwrite(spark.createDataFrame(pdf1))
    assert "b0" in table.applied_batches()
    r = _apply(spark, table, 0)  # replay of an old batch post-replace
    assert r.get("skipped")
    # a second overwrite with the default id must APPLY, not replay-skip
    r2 = table.overwrite(spark.createDataFrame(generate_batch(SPEC, 0)))
    assert not r2.get("skipped")


def test_maintenance_commits_not_in_applied_set(spark, tmp_path):
    """compact/rebucket/tombstone-gc ids must not enter the applied-batch
    set: they accreted duplicates and made any future DATA merge that
    reused such an id a silent no-op."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4, merge_mode="mor")
    _apply(spark, table, 0)
    table.compact()
    assert "__compact__" not in table.applied_batches()
    table.rebucket(8)
    assert "__rebucket__" not in table.applied_batches()
    # a (pathological) data batch named like a maintenance default applies
    pdf = generate_batch(SPEC, 1)
    r = apply_batch(table, spark.createDataFrame(pdf), "__compact__")
    assert not r.get("skipped")


def test_expire_snapshots_removes_orphan_metadata(spark, tmp_path):
    """Orphan batch segments (crash between segment write and manifest
    commit) and mid-write .tmp leftovers are GC'd; reachable segments and
    the applied-batch history survive."""
    import json

    root = str(tmp_path / "t")
    table = LakeTable(spark, root, n_buckets=4)
    _apply(spark, table, 0)
    meta = os.path.join(root, META_DIR)
    # orphan segment + tmp leftover (simulated crash debris)
    with open(os.path.join(meta, "batchseg-deadbeef.json"), "w") as f:
        json.dump({"batch_ids": ["ghost"], "prev": None}, f)
    open(os.path.join(meta, "v00000009.json.tmp"), "w").close()
    _apply(spark, table, 1)

    table.expire_snapshots(keep_last=1, grace_sec=0)
    left = set(os.listdir(meta))
    assert "batchseg-deadbeef.json" not in left
    assert not any(".tmp" in f for f in left)
    assert table.applied_batches() >= {"b0", "b1"}


def test_lineage_excludes_abandoned_branch(spark, tmp_path):
    """A batch committed on a branch abandoned by rollback (and never
    re-applied) must not surface in lineage(): lineage reports work applied
    to the CURRENT table state."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    v1 = table.current_version()
    _apply(spark, table, 1)           # b1 on the soon-abandoned branch
    table.rollback_to_snapshot(v1)
    # new commit from the rollback point -> b1's branch is abandoned
    pdf = generate_batch(SPEC, 1).assign(conv_id=lambda d: d.conv_id + "_x")
    apply_batch(table, spark.createDataFrame(pdf), "b1x")
    ids = {r["batch_id"] for r in table.lineage().select("batch_id").distinct().collect()}
    assert "b1" not in ids
    assert {"b0", "b1x"} <= ids


def test_verify_detects_missing_and_short_files(spark, tmp_path):
    import os

    import pyarrow.parquet as pq

    from gamechanger_data_spark.datagen import write_feed
    from gamechanger_data_spark.streaming.driver import replay_feed

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=20, max_turns=4, n_batches=2,
                              events_per_batch=200, seed=3, evolve_batch=None))
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay_feed(spark, feed, t)
    assert t.verify()["ok"]
    # historical snapshots verify independently
    assert t.verify(version=t.snapshots()[0])["ok"]

    # current-manifest files only (old-snapshot files are audited by
    # verify(version=...), not the head audit)
    data_files = sorted(
        os.path.join(str(tmp_path / "t"), r.path)
        for r in t.files().collect()
    )
    # truncate one file to a single row -> row-count mismatch
    victim = data_files[0]
    tbl = pq.read_table(victim)
    pq.write_table(tbl.slice(0, 1), victim)
    r = t.verify()
    assert not r["ok"] and r["mismatched"] and not r["missing"]
    # remove another file entirely -> missing
    os.remove(data_files[-1])
    r2 = t.verify()
    assert not r2["ok"] and r2["missing"]


def test_history_metadata_table(spark, tmp_path):
    from gamechanger_data_spark.datagen import write_feed
    from gamechanger_data_spark.streaming.driver import replay_feed

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=20, max_turns=4, n_batches=2,
                              events_per_batch=200, seed=7, evolve_batch=None))
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4, merge_mode="mor")
    replay_feed(spark, feed, t, compact_every=2)
    h = t.history().orderBy("version").toPandas()
    assert h.version.tolist() == t.snapshots()
    assert set(h.kind) == {"data", "maintenance"}  # compact commit present
    # parent chain is consistent; n_rows is the PHYSICAL count
    # (tombstones included), so it matches the tombstone-inclusive read
    assert (h.parent.iloc[1:] == h.version.iloc[:-1].values).all()
    physical = t.read_buckets(range(4), include_tombstones=True).count()
    assert h.n_rows.iloc[-1] == physical >= t.read().count()
    assert (h[h.kind == "data"].n_lineage_rows > 0).all()


def test_snapshot_tags_pin_retention(spark, tmp_path):
    """A tagged snapshot's files survive expire_snapshots regardless of
    keep_last (the Iceberg tag retention contract); dropping the tag
    makes them expirable again."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    v1 = table.current_version()
    tagged_rows = table.read(version=v1).count()
    table.tag("train-run-1")
    assert table.tags() == {"train-run-1": v1}
    _apply(spark, table, 1)

    table.expire_snapshots(keep_last=1, grace_sec=0)
    # pinned: the old snapshot still reads in full
    assert table.read(version=v1).count() == tagged_rows
    assert table.tag_version("train-run-1") == v1

    table.drop_tag("train-run-1")
    removed = table.expire_snapshots(keep_last=1, grace_sec=0)
    assert removed > 0  # v1's exclusive files now collected

    import pytest as _pytest
    with _pytest.raises(ValueError):
        table.drop_tag("train-run-1")
    with _pytest.raises(ValueError):
        table.tag("bad name!")
    with _pytest.raises(ValueError):
        table.tag("sneaky.tmp")  # reserved: GC/tags() skip .tmp files
    with _pytest.raises(ValueError):
        table.tag("ok", version=999)
    # pinning an ALREADY-EXPIRED snapshot must refuse (the manifest JSON
    # still exists, but the data files are gone — a tag would be a false
    # retention promise)
    with _pytest.raises(ValueError, match="expired"):
        table.tag("late-pin", version=v1)


def test_read_as_of_timestamp(spark, tmp_path):
    """Timestamp time travel: read(as_of=ts) resolves through the commit
    history to the latest version committed at or before ts — between two
    commits it returns the EARLIER one; exactly at a commit it returns
    that commit; before the first commit it fails loudly."""
    from datetime import datetime, timedelta

    import pytest as _pytest

    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    v1 = table.current_version()
    _apply(spark, table, 1)
    v2 = table.current_version()

    at1 = table._load_manifest(v1)["committed_at"]
    at2 = table._load_manifest(v2)["committed_at"]
    t1 = datetime.strptime(at1, "%Y-%m-%dT%H:%M:%S.%f")
    t2 = datetime.strptime(at2, "%Y-%m-%dT%H:%M:%S.%f")

    # between the two commits -> the earlier snapshot
    mid = t1 + (t2 - t1) / 2
    assert table.version_as_of(mid) == v1
    assert table.read(as_of=mid).count() == table.read(version=v1).count()
    # exactly at / after the second commit -> the second snapshot
    assert table.version_as_of(at2) == v2
    assert table.version_as_of(t2 + timedelta(seconds=1)) == v2
    # before the first commit -> loud failure
    with _pytest.raises(ValueError):
        table.version_as_of(t1 - timedelta(seconds=1))
    # mutually exclusive selectors
    with _pytest.raises(ValueError):
        table.read(version=v1, as_of=mid)


def test_read_as_of_follows_current_chain_after_rollback(spark, tmp_path):
    """After rollback_to_snapshot, as-of resolution walks the CURRENT
    parent chain — an abandoned branch's later wall-clock commits can
    never shadow the rolled-back truth."""
    from datetime import datetime, timedelta

    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, 0)
    v1 = table.current_version()
    _apply(spark, table, 1)  # v2: will be abandoned
    v2 = table.current_version()
    at2 = table._load_manifest(v2)["committed_at"]
    t2 = datetime.strptime(at2, "%Y-%m-%dT%H:%M:%S.%f")

    table.rollback_to_snapshot(v1)
    # a probe AFTER the abandoned commit's wall-clock must resolve to v1
    # (the abandoned v2 is not on the current chain)
    assert table.version_as_of(t2 + timedelta(seconds=1)) == v1


def test_legacy_layout_guard_refuses_then_rebuckets(spark, tmp_path):
    """A manifest WITHOUT the bucket-layout stamp whose key columns hash
    differently under canonical types (here an int key, pre-canonical
    layout hashed it as int32) is refused at open — merging into it
    would silently misbucket. allow_legacy_layout permits read() and the
    full-rewrite migration path only; rebucket() rewrites every row
    under the current hash and stamps the layout."""
    import json

    import pytest
    from pyspark.sql import types as T

    root = str(tmp_path / "t")
    t = LakeTable(spark, root, key_cols=("k",), order_cols=("ts",),
                  n_buckets=4)
    schema = T.StructType([T.StructField("k", T.IntegerType()),
                           T.StructField("ts", T.LongType()),
                           T.StructField("op", T.StringType())])
    df = spark.createDataFrame(
        [(i, i * 10, "upsert") for i in range(50)], schema
    )
    t.merge(df, "b0")

    # strip the stamp from every manifest — simulating a table written by
    # a pre-canonical-layout build
    mp = os.path.join(root, META_DIR)
    for name in os.listdir(mp):
        if name.endswith(".json"):
            p = os.path.join(mp, name)
            with open(p) as f:
                m = json.load(f)
            m.pop("layout", None)
            with open(p, "w") as f:
                json.dump(m, f)

    with pytest.raises(ValueError, match="layout"):
        LakeTable(spark, root, n_buckets=4)

    legacy = LakeTable(spark, root, n_buckets=4, allow_legacy_layout=True)
    assert legacy.read().count() == 50  # reads stay available
    with pytest.raises(ValueError, match="rebucket"):
        legacy.merge(df, "b1")
    with pytest.raises(ValueError, match="rebucket"):
        legacy.delete_where("k = 1", "dml-legacy")

    legacy.rebucket(4, batch_id="migrate")
    r = legacy.merge(
        spark.createDataFrame([(1, 999, "upsert")], schema), "b1"
    )  # now permitted
    assert not r.get("skipped")
    # reopen: stamped — no refusal, and the migrated row is resident
    t2 = LakeTable(spark, root, n_buckets=4)
    assert t2.read().filter("k = 1").collect()[0]["ts"] == 999


def test_unstamped_string_long_keys_stay_usable(spark, tmp_path):
    """String/long keys hash identically under both layouts, so an
    unstamped manifest with only those key types opens and merges
    normally (the next commit stamps it) — no gratuitous migration.
    (The default transcript key includes an int32 turn_idx, which IS
    hazardous — see the refusal test above.)"""
    import json

    from pyspark.sql import types as T

    root = str(tmp_path / "t")
    t = LakeTable(spark, root, key_cols=("k",), order_cols=("ts",),
                  n_buckets=4)
    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("ts", T.LongType()),
                           T.StructField("op", T.StringType())])
    t.merge(spark.createDataFrame(
        [(f"c{i}", i * 10, "upsert") for i in range(50)], schema), "b0")

    mp = os.path.join(root, META_DIR)
    for name in os.listdir(mp):
        if name.endswith(".json"):
            p = os.path.join(mp, name)
            with open(p) as f:
                m = json.load(f)
            m.pop("layout", None)
            with open(p, "w") as f:
                json.dump(m, f)

    t2 = LakeTable(spark, root, n_buckets=4)  # no refusal
    t2.merge(spark.createDataFrame([("c1", 999, "upsert")], schema), "b1")
    assert t2._load_manifest()["layout"] >= 2  # re-stamped by the commit
    assert t2.read().filter("k = 'c1'").collect()[0]["ts"] == 999


def test_changelog_snapshot_diff_fallback(spark, tmp_path):
    """A data commit without offset lineage (direct merge / overwrite)
    gets a changelog via exact snapshot diff: changed rows only, with
    synthesized delete rows for keys an overwrite physically dropped."""
    import pyspark.sql.functions as F

    t = LakeTable(spark, str(tmp_path / "tdiff"), n_buckets=4)
    df = spark.createDataFrame(
        [("a", 1, 10, "x"), ("b", 1, 10, "x"), ("c", 1, 10, "x")],
        "conv_id string, turn_idx int, ts long, text string",
    ).withColumn("event_seq", F.lit(1).cast("long")).withColumn(
        "op", F.lit("insert")
    )
    t.merge(df, "b0")

    # direct merge: patch one key, delete one; the untouched key must
    # NOT appear even though its bucket may have been rewritten
    patch = spark.createDataFrame(
        [("a", 1, 20, "x2", 2, "update"), ("b", 1, 20, "x", 2, "delete")],
        "conv_id string, turn_idx int, ts long, text string, "
        "event_seq long, op string",
    )
    t.merge(patch, "b1")
    ch = {
        (r["conv_id"], r["change_op"])
        for r in t.changelog(t.current_version()).collect()
    }
    assert ch == {("a", "upsert"), ("b", "delete")}

    # overwrite that drops a key: the vanished key must surface as a
    # synthesized delete (no tombstone exists in the new state)
    t.overwrite(t.read().filter("conv_id <> 'a'"))
    ch2 = {
        (r["conv_id"], r["change_op"])
        for r in t.changelog(t.current_version()).collect()
    }
    assert ("a", "delete") in ch2


def test_diff_between_snapshots_spans_commits(spark, tmp_path):
    """diff(from, to) returns keys whose WINNING row differs between the
    two snapshots in one pass: intermediate states overwritten by later
    commits never surface, unchanged keys are absent, deletes classify,
    and a rebucket between the pins falls back to all-bucket diff."""
    import pyspark.sql.functions as F

    t = LakeTable(spark, str(tmp_path / "tdv"), n_buckets=4)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, ts long, text string, "
            "event_seq long, op string",
        )

    t.merge(batch([("a", 1, 10, "x", 1, "insert"), ("b", 1, 10, "x", 2, "insert"),
                   ("c", 1, 10, "x", 3, "insert")]), "b0")
    v1 = t.current_version()
    # two commits: 'a' patched twice (only the FINAL state must surface),
    # 'b' deleted, 'd' added; 'c' untouched
    t.merge(batch([("a", 1, 20, "mid", 4, "update")]), "b1")
    t.merge(batch([("a", 1, 30, "final", 5, "update"),
                   ("b", 1, 30, "x", 6, "delete"),
                   ("d", 1, 30, "new", 7, "insert")]), "b2")

    d = {(r["conv_id"], r["change_op"], r["text"])
         for r in t.diff(v1).collect()}
    assert d == {("a", "upsert", "final"), ("b", "delete", "x"),
                 ("d", "upsert", "new")}
    # identical snapshots diff to empty; diff spans a rebucket
    assert t.diff(t.current_version()).count() == 0
    t.rebucket(8)
    d2 = {(r["conv_id"], r["change_op"]) for r in t.diff(v1).collect()}
    assert d2 == {("a", "upsert"), ("b", "delete"), ("d", "upsert")}


def test_dense_batch_declares_all_buckets_sparse_still_prunes(spark, tmp_path):
    """The provably-dense merge shortcut: src_rows >= resident rows (and a
    non-empty table) declares every bucket touched without the distinct
    bucket scan; a sparse follow-up with src_rows < resident must still
    derive (and prune to) its actual buckets. State stays oracle-correct
    through both paths."""
    table = LakeTable(spark, str(tmp_path / "t"), n_buckets=8)
    b0 = generate_batch(SPEC, 0)
    r0 = table.merge(spark.createDataFrame(b0), "b0", src_rows=len(b0))
    # empty table: no resident proof -> actual bucket set derived
    assert r0["touched_buckets"] <= 8

    b1 = generate_batch(SPEC, 1)
    r1 = table.merge(
        spark.createDataFrame(b1), "b1", src_rows=len(b1)
    )  # 420 src rows >= resident -> dense shortcut
    assert r1["touched_buckets"] == 8 and r1["mode"] == "cow"

    # sparse: one key's rows, src_rows << resident -> real bucket set
    one = b1.iloc[[0]].copy()
    r2 = table.merge(spark.createDataFrame(one), "b2", src_rows=1, mode="cow")
    assert r2["touched_buckets"] == 1

    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    ev = pd.concat([b0, b1, one], ignore_index=True)
    want = pandas_oracle(ev)  # direct merge(): no winner normalization
    cols = ["conv_id", "turn_idx", "text", "ts"]
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True), want[cols].reset_index(drop=True),
        check_dtype=False,
    )
