"""Changelog-driven downstream sync (streaming/driver.py sync_changelog):
lake-to-lake CDC with exactly-once per source commit."""

import pandas as pd

from gamechanger_data_spark.datagen import FeedSpec, write_feed
from gamechanger_data_spark.sinks.table import LakeTable
from gamechanger_data_spark.streaming.driver import replay_feed, sync_changelog

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _state(t):
    return (
        t.read().orderBy("conv_id", "turn_idx")
        .toPandas()[COLS].reset_index(drop=True)
    )


def test_sync_parity_idempotence_and_increment(spark, tmp_path):
    feed = str(tmp_path / "feed")
    # the standard mix: dups, deletes, revokes, additive evolution
    write_feed(feed, FeedSpec(n_convs=60, max_turns=8, n_batches=3,
                              events_per_batch=700, seed=23))
    a = LakeTable(spark, str(tmp_path / "a"), n_buckets=8)
    b = LakeTable(spark, str(tmp_path / "b"), n_buckets=4)  # spec decoupled

    replay_feed(spark, feed, a, limit=2)
    r1 = sync_changelog(a, b)
    assert [x["skipped"] for x in r1] == [False, False]
    pd.testing.assert_frame_equal(_state(a), _state(b), check_dtype=False)

    # replaying the sync is a no-op (exactly-once via batch markers)
    r2 = sync_changelog(a, b)
    assert all(x["skipped"] for x in r2)

    # a new source commit syncs incrementally: exactly one new apply,
    # with one skip record marking the already-synced frontier (the
    # chain walk early-stops there instead of enumerating history)
    replay_feed(spark, feed, a)
    r3 = sync_changelog(a, b)
    assert [x["skipped"] for x in r3] == [True, False]
    pd.testing.assert_frame_equal(_state(a), _state(b), check_dtype=False)
    # deletes/revocations propagated, not just upserts
    assert b.read().filter("is_revoked").count() > 0
    assert _state(b).shape == _state(a).shape


def test_sync_overwrite_falls_back_to_full_replace(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=20, max_turns=4, n_batches=1,
                              events_per_batch=150, seed=5, evolve_batch=None))
    a = LakeTable(spark, str(tmp_path / "a"), n_buckets=4)
    b = LakeTable(spark, str(tmp_path / "b"), n_buckets=4)
    replay_feed(spark, feed, a)
    sync_changelog(a, b)

    # replace A wholesale (no offset lineage on that commit)
    a.overwrite(a.read().filter("turn_idx % 2 = 0"))
    res = sync_changelog(a, b)
    assert res[-1].get("mode") == "overwrite" and not res[-1]["skipped"]
    pd.testing.assert_frame_equal(_state(a), _state(b), check_dtype=False)
    assert all(x["skipped"] for x in sync_changelog(a, b))


def test_after_batch_hook_keeps_derived_tables_current(spark, tmp_path):
    """replay_feed(after_batch=...) is the continuous-maintenance mode:
    every applied source commit immediately syncs the downstream copy and
    the incremental rollup."""
    from gamechanger_data_spark.plans.catalog import conv_rollup
    from gamechanger_data_spark.streaming.driver import sync_aggregate

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=40, max_turns=6, n_batches=3,
                              events_per_batch=400, seed=31))
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    copy = LakeTable(spark, str(tmp_path / "copy"), n_buckets=8)
    roll = LakeTable(spark, str(tmp_path / "roll"), key_cols=("conv_id",),
                     order_cols=("src_version",), n_buckets=4)
    seen = []

    def hook(table, result):
        seen.append(result["batch_id"])
        sync_changelog(table, copy)
        sync_aggregate(table, roll, conv_rollup)
        # the derived tables are current IMMEDIATELY after each commit
        assert copy.read().count() == table.read().count()

    replay_feed(spark, feed, src, after_batch=hook)
    assert len(seen) == 3
    pd.testing.assert_frame_equal(_state(src), _state(copy))
    cols = ["conv_id", "n_turns", "n_revoked", "last_ts", "n_chars"]
    want = conv_rollup(src.read()).orderBy("conv_id").toPandas()[cols].reset_index(drop=True)
    got = roll.read().select(*cols).orderBy("conv_id").toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # replay is a no-op end to end: nothing new applied, hook not called
    seen.clear()
    assert all(r["skipped"] for r in replay_feed(spark, feed, src, after_batch=hook))
    assert seen == []


def test_sync_across_mor_and_compaction(spark, tmp_path):
    """Maintenance commits (compact) interleave with data commits: sync
    must skip them, and changelog diffs against a maintenance parent must
    still yield exactly the data commit's rows."""
    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=30, max_turns=6, n_batches=3,
                              events_per_batch=300, seed=13))
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4,
                    merge_mode="mor")
    b = LakeTable(spark, str(tmp_path / "b"), n_buckets=4)
    replay_feed(spark, feed, src, compact_every=1)  # data,compact,data,...
    r = sync_changelog(src, b)
    assert len(r) == 3 and not any(x["skipped"] for x in r)
    pd.testing.assert_frame_equal(_state(src), _state(b), check_dtype=False)
    assert all(x["skipped"] for x in sync_changelog(src, b))


def test_sync_chains_to_depth_two(spark, tmp_path):
    """Sync commits carry offset lineage, so derived tables are themselves
    sync SOURCES: src -> copy -> copy2 and rollup -> published rollup both
    track via the delta path (no overwrite fallback at depth 2)."""
    from gamechanger_data_spark.plans.catalog import conv_rollup
    from gamechanger_data_spark.streaming.driver import sync_aggregate

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=40, max_turns=6, n_batches=2,
                              events_per_batch=400, seed=19))
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    copy = LakeTable(spark, str(tmp_path / "copy"), n_buckets=8)
    copy2 = LakeTable(spark, str(tmp_path / "copy2"), n_buckets=4)
    roll = LakeTable(spark, str(tmp_path / "roll"), key_cols=("conv_id",),
                     order_cols=("src_version",), n_buckets=4)
    rollpub = LakeTable(spark, str(tmp_path / "rollpub"),
                        key_cols=("conv_id",), order_cols=("src_version",),
                        n_buckets=2)

    replay_feed(spark, feed, src)
    r1 = sync_changelog(src, copy)
    r2 = sync_changelog(copy, copy2, stream_id="hop2")
    assert not any(x.get("mode") == "overwrite" for x in r1 + r2)
    pd.testing.assert_frame_equal(_state(src), _state(copy2),
                                  check_dtype=False)

    ra = sync_aggregate(src, roll, conv_rollup)
    rb = sync_changelog(roll, rollpub, stream_id="rollpub")
    assert not any(x.get("mode") == "overwrite" for x in ra + rb)
    cols = ["conv_id", "n_turns", "n_revoked", "last_ts", "n_chars"]
    a = roll.read().select(*cols).orderBy("conv_id").toPandas().reset_index(drop=True)
    b = rollpub.read().select(*cols).orderBy("conv_id").toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # incremental at depth 2 as well: a third src batch flows the chain
    write_feed(feed, FeedSpec(n_convs=40, max_turns=6, n_batches=3,
                              events_per_batch=400, seed=19))
    replay_feed(spark, feed, src)
    sync_changelog(src, copy)
    r3 = sync_changelog(copy, copy2, stream_id="hop2")
    assert [x.get("skipped", False) for x in r3].count(False) == 1
    pd.testing.assert_frame_equal(_state(src), _state(copy2),
                                  check_dtype=False)


def test_sync_replays_column_dml_incrementally(spark, tmp_path):
    """Deterministic built-in COLUMN-expression DML prints back to SQL
    (_expression_sql) and rides the manifest dml spec exactly like the
    string form: sync_changelog replays it (mode 'dml'), never the
    whole-table overwrite — and the copy converges exactly."""
    from pyspark.sql import functions as F

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=40, max_turns=6, n_batches=2,
                              events_per_batch=500, seed=31))
    a = LakeTable(spark, str(tmp_path / "a"), n_buckets=8)
    b = LakeTable(spark, str(tmp_path / "b"), n_buckets=4)

    replay_feed(spark, feed, a, limit=1)
    sync_changelog(a, b)

    a.update_where(
        F.col("role") == "system",
        {"text": F.concat(F.lit("[sys] "), F.col("text"))},
        "dml-up",
    )
    a.delete_where(F.col("role") == "tool", "dml-del")
    r = sync_changelog(a, b)
    applied = [x for x in r if not x.get("skipped")]
    assert [x.get("mode") for x in applied] == ["dml", "dml"]
    pd.testing.assert_frame_equal(_state(a), _state(b), check_dtype=False)
    assert b.read().filter("role = 'tool'").count() == 0
    assert b.read().filter("text like '[sys] %'").count() > 0

    # the next ordinary commit syncs incrementally again (merge, not
    # overwrite) and parity holds
    replay_feed(spark, feed, a)
    r2 = [x for x in sync_changelog(a, b) if not x.get("skipped")]
    assert len(r2) == 1 and r2[0].get("mode") != "overwrite"
    pd.testing.assert_frame_equal(_state(a), _state(b), check_dtype=False)


def test_unprintable_dml_warns_and_falls_back_to_overwrite(spark, tmp_path):
    """A DML whose predicate cannot be printed as engine-independent SQL
    (here: UDF-backed) warns loudly at commit time and makes the
    downstream sync take the documented overwrite fallback — converging
    exactly, never silently diverging."""
    import warnings as _warnings

    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=30, max_turns=5, n_batches=1,
                              events_per_batch=300, seed=7, evolve_batch=None))
    a = LakeTable(spark, str(tmp_path / "a"), n_buckets=4)
    b = LakeTable(spark, str(tmp_path / "b"), n_buckets=4)
    replay_feed(spark, feed, a)
    sync_changelog(a, b)

    is_tool = F.udf(lambda s: s == "tool", BooleanType())
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        a.delete_where(is_tool(F.col("role")), "dml-udf")
    assert any("overwrite re-sync" in str(w.message) for w in caught)
    assert a._load_manifest().get("dml") is None

    r = [x for x in sync_changelog(a, b) if not x.get("skipped")]
    assert [x.get("mode") for x in r] == ["overwrite"]
    pd.testing.assert_frame_equal(_state(a), _state(b), check_dtype=False)
    assert b.read().filter("role = 'tool'").count() == 0


def test_bucket_pruned_dml_never_records_spec(spark, tmp_path):
    """An explicit ``buckets`` pruning list may deliberately UNDER-cover
    the predicate, so the commit must NOT record a replayable dml spec —
    replaying the bare predicate downstream would delete rows the source
    kept. Sync takes the overwrite fallback and still converges to the
    source's (partially-deleted) state."""
    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=30, max_turns=5, n_batches=1,
                              events_per_batch=300, seed=11, evolve_batch=None))
    a = LakeTable(spark, str(tmp_path / "a"), n_buckets=8)
    b = LakeTable(spark, str(tmp_path / "b"), n_buckets=4)
    replay_feed(spark, feed, a)
    sync_changelog(a, b)

    # under-covering prune: only bucket 0 of the matching rows is deleted
    res = a.delete_where("role = 'tool'", "dml-pruned", buckets=[0])
    assert a._load_manifest().get("dml") is None
    r = [x for x in sync_changelog(a, b) if not x.get("skipped")]
    if not res["skipped"] and res["touched_buckets"] > 0:
        assert [x.get("mode") for x in r] == ["overwrite"]
    # convergence to src's ACTUAL state (tool rows outside bucket 0 kept)
    pd.testing.assert_frame_equal(_state(a), _state(b), check_dtype=False)


def test_sync_ignores_staged_branch_commits(spark, tmp_path):
    """Write-audit-publish isolation: commits staged on an audit branch
    are manifests in the same META_DIR, but sync walks the CURRENT
    parent chain — dst must not see staged rows until fast_forward
    publishes them, and a dropped branch must never leak into dst."""
    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=40, max_turns=6, n_batches=3,
                              events_per_batch=400, seed=17))
    root = str(tmp_path / "src")
    main = LakeTable(spark, root, n_buckets=4)
    dst = LakeTable(spark, str(tmp_path / "dst"), n_buckets=4)

    replay_feed(spark, feed, main, limit=1)
    main.create_branch("audit")
    audit = LakeTable(spark, root, n_buckets=4, branch="audit")
    replay_feed(spark, feed, audit, limit=2)  # stages batch 2 on the branch

    r = [x for x in sync_changelog(main, dst) if not x.get("skipped")]
    assert len(r) == 1  # ONLY main's commit — the staged one is invisible
    pd.testing.assert_frame_equal(_state(main), _state(dst),
                                  check_dtype=False)

    # a dropped experiment branch never reaches dst either
    main.create_branch("scratch")
    scratch = LakeTable(spark, root, n_buckets=4, branch="scratch")
    replay_feed(spark, feed, scratch)
    main.drop_branch("scratch")
    assert all(x.get("skipped") for x in sync_changelog(main, dst))
    pd.testing.assert_frame_equal(_state(main), _state(dst),
                                  check_dtype=False)

    # publish: fast-forward main to the audit head; NOW the staged commit
    # syncs (exactly-once, under its chain version id)
    main.fast_forward("audit")
    r2 = [x for x in sync_changelog(main, dst) if not x.get("skipped")]
    assert len(r2) == 1
    pd.testing.assert_frame_equal(_state(main), _state(dst),
                                  check_dtype=False)


def test_sync_propagates_rename(spark, tmp_path):
    """rename_column is a maintenance commit (no rows), but sync must
    propagate it: otherwise the next data commit's changelog arrives
    under the new name and dst evolves a duplicate column beside the
    stale old one."""
    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=40, max_turns=6, n_batches=2,
                              events_per_batch=400, seed=29))
    a = LakeTable(spark, str(tmp_path / "a"), n_buckets=4)
    b = LakeTable(spark, str(tmp_path / "b"), n_buckets=4)

    replay_feed(spark, feed, a, limit=1)
    sync_changelog(a, b)
    a.rename_column("tool", "tool_name")
    replay_feed(spark, feed, a)  # batch 2 still carries the retired name
    r = [x for x in sync_changelog(a, b) if not x.get("skipped")]
    assert len(r) == 1

    a_cols = set(a.read().columns)
    b_cols = set(b.read().columns)
    assert "tool_name" in b_cols and "tool" not in b_cols
    assert a_cols == b_cols
    cols = ["conv_id", "turn_idx", "role", "text", "tool_name", "ts"]
    av = a.read().orderBy("conv_id", "turn_idx").toPandas()[cols].reset_index(drop=True)
    bv = b.read().orderBy("conv_id", "turn_idx").toPandas()[cols].reset_index(drop=True)
    pd.testing.assert_frame_equal(av, bv, check_dtype=False)
    # idempotent under re-sync (rename apply is column-presence guarded)
    assert all(x.get("skipped") for x in sync_changelog(a, b))


def test_sync_replays_string_dml_incrementally(spark, tmp_path):
    """A predicate DML given as SQL STRINGS is recorded in the manifest
    and REPLAYED downstream by sync_changelog (mode 'dml', exactly-once,
    cost ∝ dst's touched buckets) — no whole-table overwrite."""
    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=40, max_turns=6, n_batches=2,
                              events_per_batch=500, seed=31))
    a = LakeTable(spark, str(tmp_path / "a"), n_buckets=8)
    b = LakeTable(spark, str(tmp_path / "b"), n_buckets=4)

    replay_feed(spark, feed, a)
    sync_changelog(a, b)

    a.update_where("role = 'system'",
                   {"text": "concat('[sys] ', text)"}, "dml-up")
    a.delete_where("role = 'tool'", "dml-del")
    r = [x for x in sync_changelog(a, b) if not x.get("skipped")]
    assert [x.get("mode") for x in r] == ["dml", "dml"]
    pd.testing.assert_frame_equal(_state(a), _state(b), check_dtype=False)
    assert b.read().filter("role = 'tool'").count() == 0
    assert b.read().filter("text like '[sys] %'").count() > 0
    # replaying the sync is still a pure no-op (same batch ids downstream)
    assert all(x.get("skipped") for x in sync_changelog(a, b))


def test_direct_merge_syncs_incrementally_via_snapshot_diff(spark, tmp_path):
    """A merge() called directly (no replay lineage, so no offset ranges)
    must still sync INCREMENTALLY: the commit_op='merge' stamp routes it
    through the snapshot-diff changelog instead of the O(table) overwrite
    fallback — upserts, deletes, and brand-new keys all propagate."""
    from pyspark.sql import functions as F

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=30, max_turns=5, n_batches=1,
                              events_per_batch=300, seed=13, evolve_batch=None))
    a = LakeTable(spark, str(tmp_path / "a"), n_buckets=8)
    b = LakeTable(spark, str(tmp_path / "b"), n_buckets=4)
    replay_feed(spark, feed, a)
    sync_changelog(a, b)

    patch = (
        a.read().filter("turn_idx = 0")
        .withColumn("event_seq", F.col("event_seq") + F.lit(10_000_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" [direct]")))
        .withColumn("op", F.lit("update"))
    )
    kill = (
        a.read().filter("turn_idx = 1").limit(3)
        .withColumn("event_seq", F.col("event_seq") + F.lit(10_000_000_000))
        .withColumn("op", F.lit("delete"))
    )
    a.merge(patch.unionByName(kill), "direct-1")
    assert not any(
        r.get("offset_min") is not None
        for r in a._load_manifest().get("lineage", [])
    )

    r = [x for x in sync_changelog(a, b) if not x.get("skipped")]
    assert len(r) == 1 and r[0].get("mode") in ("cow", "mor")
    pd.testing.assert_frame_equal(_state(a), _state(b), check_dtype=False)
    assert b.read().filter("text like '% [direct]'").count() > 0


def test_sync_aggregate_delta_scopes_dml_commit(spark, tmp_path):
    """A predicate-DML source commit must keep the rollup maintained via
    delta-scoped recompute (the snapshot diff identifies the changed
    groups; the aggregate recomputes them from current state) — not a
    full overwrite."""
    from gamechanger_data_spark.plans.catalog import conv_rollup
    from gamechanger_data_spark.streaming.driver import sync_aggregate

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=30, max_turns=5, n_batches=1,
                              events_per_batch=300, seed=17, evolve_batch=None))
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=8)
    roll = LakeTable(spark, str(tmp_path / "roll"), key_cols=("conv_id",),
                     order_cols=("src_version",), n_buckets=4)
    replay_feed(spark, feed, src)
    sync_aggregate(src, roll, conv_rollup)

    victim = src.read().select("conv_id").orderBy("conv_id").first()[0]
    src.delete_where(f"conv_id = '{victim}'", "dml-conv")
    r = [x for x in sync_aggregate(src, roll, conv_rollup)
         if not x.get("skipped")]
    assert len(r) == 1 and r[0].get("mode") != "overwrite"
    got = (
        roll.read().select("conv_id", "n_turns", "n_revoked", "last_ts",
                           "n_chars")
        .orderBy("conv_id").toPandas().reset_index(drop=True)
    )
    want = (
        conv_rollup(src.read()).orderBy("conv_id")
        .toPandas()[list(got.columns)].reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert not got.conv_id.eq(victim).any()
