"""Write branches + write-audit-publish: branches share manifests, data
files, the commit lock, and exactly-once machinery; each has its own
fsync'd head pointer; fast_forward publishes an ancestor-consistent
branch head. Reference analog: staging-prefix load then promote
(gc_ingest snapshot/backup tooling), made transactional.
"""

import pandas as pd
import pytest

from gamechanger_data_spark.sinks.table import LakeTable


def _ev(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "ts", "event_seq", "op", "text"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int64")
    pdf["event_seq"] = pdf["event_seq"].astype("int64")
    return spark.createDataFrame(pdf)


def test_write_audit_publish_flow(spark, tmp_path):
    """Stage on a branch, validate, fast-forward main: staged commits are
    invisible on main until publish; after publish main carries the
    branch's applied-batch history (exactly-once across the publish)."""
    root = str(tmp_path / "t")
    main = LakeTable(spark, root, n_buckets=4)
    main.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "base")]), "b0")
    v_main = main.current_version()

    main.create_branch("audit")
    audit = LakeTable(spark, root, n_buckets=4, branch="audit")
    audit.merge(_ev(spark, [("c2", 0, 200, 2, "insert", "staged")]), "b1")

    # staged commit is invisible on main, visible on the branch
    assert main.current_version() == v_main
    assert main.read().count() == 1
    assert audit.read().count() == 2
    assert "b1" in audit.applied_batches()
    assert "b1" not in main.applied_batches()

    # audit passes -> publish
    new_head = main.fast_forward("audit")
    assert new_head == audit.current_version()
    got = main.read().orderBy("conv_id").toPandas()
    assert list(got["text"]) == ["base", "staged"]
    # exactly-once carried across the publish: replaying b1 on main skips
    assert "b1" in main.applied_batches()
    r = main.merge(_ev(spark, [("c2", 0, 999, 9, "update", "XX")]), "b1")
    assert r["skipped"]


def test_branch_guards_and_listing(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable(spark, root, n_buckets=2)
    t.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "a")]), "b0")
    with pytest.raises(ValueError, match="no branch"):
        LakeTable(spark, root, n_buckets=2, branch="typo")
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("main")
    t.create_branch("audit")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("audit")
    assert t.branches() == {"main": 1, "audit": 1}
    t.drop_branch("audit")
    assert "audit" not in t.branches()
    with pytest.raises(ValueError, match="cannot drop main"):
        t.drop_branch("main")


def test_fast_forward_refuses_diverged_target(spark, tmp_path):
    """If main advanced with commits the branch never saw, publish is
    refused loudly — neither side is silently dropped."""
    root = str(tmp_path / "t")
    main = LakeTable(spark, root, n_buckets=2)
    main.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "a")]), "b0")
    main.create_branch("audit")
    audit = LakeTable(spark, root, n_buckets=2, branch="audit")
    audit.merge(_ev(spark, [("c2", 0, 200, 2, "insert", "staged")]), "b1")
    main.merge(_ev(spark, [("c3", 0, 200, 3, "insert", "raced")]), "b2")
    with pytest.raises(ValueError, match="diverged"):
        main.fast_forward("audit")
    # no-op publish of an identical head is fine
    assert main.fast_forward("main") == main.current_version()


def test_branch_heads_pinned_by_retention_and_lineage_scoped(spark, tmp_path):
    """expire_snapshots keeps every branch head readable; main's
    lineage() excludes staged-but-unpublished branch commits."""
    from gamechanger_data_spark.streaming.driver import apply_batch

    root = str(tmp_path / "t")
    main = LakeTable(spark, root, n_buckets=2)
    # apply_batch (not raw merge): the lineage assertions below need the
    # lineage-recording driver path
    apply_batch(main, _ev(spark, [("c1", 0, 100, 1, "insert", "a")]), "b0")
    main.create_branch("audit")
    audit = LakeTable(spark, root, n_buckets=2, branch="audit")
    apply_batch(audit, _ev(spark, [("c2", 0, 200, 2, "insert", "staged")]), "b1")
    v_audit = audit.current_version()
    # advance main twice so the audit head falls outside keep_last
    apply_batch(main, _ev(spark, [("c1", 0, 300, 3, "update", "a2")]), "b2")
    apply_batch(main, _ev(spark, [("c1", 0, 400, 4, "update", "a3")]), "b3")
    main.expire_snapshots(keep_last=0, grace_sec=0)
    # branch head still fully readable
    assert audit.read(version=v_audit).count() == 2
    # staged branch work is not in main's lineage; published work is
    lin_main = main.lineage().toPandas()
    assert "b1" not in set(lin_main.batch_id)
    lin_audit = audit.lineage().toPandas()
    assert "b1" in set(lin_audit.batch_id)


def test_branch_rollback_moves_only_branch_pointer(spark, tmp_path):
    root = str(tmp_path / "t")
    main = LakeTable(spark, root, n_buckets=2)
    main.merge(_ev(spark, [("c1", 0, 100, 1, "insert", "a")]), "b0")
    main.create_branch("x")
    bx = LakeTable(spark, root, n_buckets=2, branch="x")
    v0 = bx.current_version()
    bx.merge(_ev(spark, [("c2", 0, 200, 2, "insert", "b")]), "b1")
    bx.rollback_to_snapshot(v0)
    assert bx.current_version() == v0
    assert main.current_version() == v0  # untouched all along
    assert bx.read().count() == 1


def test_streaming_driver_into_branch_then_publish(spark, tmp_path):
    """The Structured Streaming driver composes with branches: a
    stream_feed drains into a branch instance (main untouched), and the
    publish carries the stream's applied batches to main exactly-once."""
    from gamechanger_data_spark.datagen import FeedSpec, write_feed
    from gamechanger_data_spark.streaming.driver import replay_feed, stream_feed

    feed = str(tmp_path / "feed")
    write_feed(feed, FeedSpec(n_convs=20, n_batches=2,
                              events_per_batch=200, seed=7))
    root = str(tmp_path / "t")
    main = LakeTable(spark, root, n_buckets=4)
    main.merge(_ev(spark, [("seed", 0, 1, 1, "insert", "s")]), "pre")
    main.create_branch("ingest")
    branch = LakeTable(spark, root, n_buckets=4, branch="ingest")

    q = stream_feed(spark, feed, branch, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert main.read().count() == 1          # staged only on the branch
    assert branch.read().count() > 1
    main.fast_forward("ingest")
    assert main.read().count() == branch.read().count()
    # the published batches are exactly-once on main too
    assert all(r.get("skipped") for r in replay_feed(spark, feed, main))
