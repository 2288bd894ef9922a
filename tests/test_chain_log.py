"""Ancestor chain log: O(1) ancestry checks (fast_forward) and timestamp
resolution (version_as_of) from per-manifest chain tails + immutable
segment files, with legacy-manifest fallback to the parent walk.

The commits here are metadata-only (_commit with empty file maps) so a
150-commit chain builds in milliseconds — the mechanism under test is
pure manifest machinery. Reference analog: the timestamped backup
prefixes the reference resolves by prefix scan
(dataPipelines/gc_ingest/tools/snapshot/utils.py:180-218)."""

import json
import os

import pytest

from gamechanger_data_spark.sinks.table import (
    BATCH_SEGMENT_SIZE,
    META_DIR,
    LakeTable,
)


def _meta_commit(t, kind="data"):
    return t._commit({
        "schema": None, "n_buckets": t.n_buckets, "files": {}, "deltas": {},
        "base_rows": {}, "delta_rows": {}, "applied_batches": [],
        "batches_segment": None, "lineage": [], "kind": kind,
    })


N = 150  # > 2 * BATCH_SEGMENT_SIZE so at least two segments roll


@pytest.fixture()
def meta_table(tmp_path):
    t = LakeTable(None, str(tmp_path / "t"), n_buckets=4)
    for _ in range(N):
        _meta_commit(t)
    return t


def _walk_as_of(t, probe):
    """Reference implementation: the pre-chain-log parent walk."""
    v = t.current_version()
    while v and v > 0:
        m = t._load_manifest(v)
        at = m.get("committed_at")
        if at is not None and at <= probe:
            return v
        v = m.get("parent")
    raise ValueError("no snapshot")


def test_tail_bounded_and_segments_roll(meta_table):
    m = meta_table._load_manifest()
    assert m["version"] == N
    assert len(m["chain_tail"]) < BATCH_SEGMENT_SIZE
    # N-1 ancestors roll into floor((N-1)/SEG) segments + inline tail
    assert len(m["chain_segments"]) == (N - 1) // BATCH_SEGMENT_SIZE
    total = len(m["chain_tail"]) + sum(
        1
        for s in m["chain_segments"]
        for _ in range(s[2] - s[1] + 1)
    )
    assert total == N - 1
    # segment bounds are disjoint, sorted, and contiguous with the tail
    los = [s[1] for s in m["chain_segments"]]
    his = [s[2] for s in m["chain_segments"]]
    assert los == sorted(los) and his == sorted(his)
    assert m["chain_tail"][0][0] == his[-1] + 1


def test_ancestor_membership_across_tail_and_segments(meta_table):
    m = meta_table._load_manifest()
    for v in (1, BATCH_SEGMENT_SIZE, BATCH_SEGMENT_SIZE + 1, N - 1, N):
        assert meta_table._chain_has_ancestor(m, v) is True
    assert meta_table._chain_has_ancestor(m, N + 7) is False


def test_version_as_of_matches_walk_everywhere(meta_table):
    t = meta_table
    for v in (1, 2, BATCH_SEGMENT_SIZE, BATCH_SEGMENT_SIZE + 1, 100, N - 1, N):
        probe = t._load_manifest(v)["committed_at"]
        assert t.version_as_of(probe) == _walk_as_of(t, probe)


def test_version_as_of_before_first_commit_raises(meta_table):
    with pytest.raises(ValueError, match="no snapshot at or before"):
        meta_table.version_as_of("1999-01-01T00:00:00.000000")


def test_resolution_load_bound(meta_table, monkeypatch):
    """The chain-log contract: deep as-of resolution and fast-forward
    ancestry each cost <= 2 manifest loads on a long chain (manifest +
    at most one segment file), not an O(chain) parent walk."""
    t = meta_table
    probe = t._load_manifest(5)["committed_at"]  # deep: 2 segments back
    calls = []
    real = LakeTable._load_manifest
    monkeypatch.setattr(
        LakeTable, "_load_manifest",
        lambda self, version=None: calls.append(version) or real(self, version),
    )
    assert t.version_as_of(probe) == 5
    assert len(calls) <= 2, calls

    t.create_branch("pub")
    tb = LakeTable(None, t.root, n_buckets=4, branch="pub")
    for _ in range(3):
        _meta_commit(tb)
    calls.clear()
    assert t.fast_forward("pub") == tb.current_version()
    assert len(calls) <= 2, calls


def test_fast_forward_divergence_detected_via_chain(meta_table):
    t = meta_table
    t.create_branch("d")
    td = LakeTable(None, t.root, n_buckets=4, branch="d")
    _meta_commit(td)
    _meta_commit(t)  # main moves too: diverged
    with pytest.raises(ValueError, match="diverged"):
        t.fast_forward("d")


def test_legacy_manifest_falls_back_to_walk_then_reconstructs(meta_table):
    t = meta_table
    head = t.current_version()
    mp = t._meta_path(head)
    with open(mp) as f:
        m = json.load(f)
    del m["chain_tail"], m["chain_segments"]
    with open(mp, "w") as f:
        json.dump(m, f)
    # resolution still correct through the walk fallback
    probe = t._load_manifest(40)["committed_at"]
    assert t.version_as_of(probe) == 40
    t.create_branch("pub2")
    tb = LakeTable(None, t.root, n_buckets=4, branch="pub2")
    _meta_commit(tb)
    assert t.fast_forward("pub2") == tb.current_version()
    # the next commit over the legacy head rebuilt the FULL chain log
    m2 = t._load_manifest()
    assert "chain_tail" in m2
    assert t._chain_has_ancestor(m2, 1) is True
    assert t.version_as_of(probe) == 40


def test_version_as_of_on_branch_resolves_along_branch_chain(meta_table):
    """A branch instance's as-of walks ITS branch's parent chain: probes
    at or after the branch's own commits resolve to branch versions that
    main's instance never sees, while pre-fork probes agree on the
    shared prefix."""
    t = meta_table
    fork = t.current_version()
    t.create_branch("exp")
    tb = LakeTable(None, t.root, n_buckets=4, branch="exp")
    bv = [_meta_commit(tb) for _ in range(3)]
    at_branch = tb._load_manifest(bv[1])["committed_at"]
    assert tb.version_as_of(at_branch) == bv[1]
    # main resolves the same instant to its own head (<= fork)
    assert t.version_as_of(at_branch) == fork
    # pre-fork probes agree: shared chain prefix
    at_old = t._load_manifest(40)["committed_at"]
    assert t.version_as_of(at_old) == tb.version_as_of(at_old) == 40


def test_orphan_chainseg_collected_reachable_kept(meta_table):
    t = meta_table
    meta = os.path.join(t.root, META_DIR)
    orphan = os.path.join(meta, "chainseg-deadbeef.json")
    with open(orphan, "w") as f:
        json.dump({"entries": [[1, None]]}, f)
    reachable = {
        s[0] for v in t.snapshots()
        for s in t._load_manifest(v).get("chain_segments", [])
    }
    assert reachable  # segments rolled in this fixture
    t.expire_snapshots(keep_last=2, grace_sec=0)
    assert not os.path.exists(orphan)
    for rel in reachable:
        assert os.path.exists(os.path.join(t.root, rel))


def test_history_refs_column(spark, tmp_path):
    from pyspark.sql import types as T

    sch = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("op", T.StringType()),
    ])
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(spark.createDataFrame([("a", 1, "upsert")], sch), "b0")
    t.tag("first")
    t.merge(spark.createDataFrame([("b", 2, "upsert")], sch), "b1")
    t.create_branch("exp")
    rows = {r["version"]: r["refs"] for r in t.history().collect()}
    assert rows[1] == ["tag:first"]
    assert sorted(rows[2]) == ["branch:exp", "branch:main"]
