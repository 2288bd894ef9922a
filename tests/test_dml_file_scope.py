"""File-level DML scoping: predicate delete/update on a fold-split
bucket rewrites only the files whose zone maps overlap the condition's
simple conjuncts; non-overlapping files are carried into the new
manifest verbatim. Cost ∝ files the predicate touches, not buckets.

Reference analog: the reference's revocation/cancel flows rewrite whole
publication tables per flag flip (gc_ingest load utils); here the same
semantics touch the minimal physical extent the stats can prove.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import gamechanger_data_spark.sinks.table as table_mod
from gamechanger_data_spark.sinks.table import LakeTable, _condition_conjuncts

SCH = T.StructType([
    T.StructField("k", T.IntegerType()),
    T.StructField("ts", T.LongType()),
    T.StructField("val", T.StringType()),
    T.StructField("op", T.StringType()),
])


def _mk(spark, ts0, n=400):
    return spark.createDataFrame(
        [(i, ts0 + i * 10, f"v{i}", "upsert") for i in range(n)], SCH
    )


@pytest.fixture
def split(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(table_mod, "FOLD_TARGET_PARTITION_BYTES", 1024)
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_mk(spark, 0), "b0")
    t.merge(_mk(spark, 1), "b1")
    m = t._load_manifest()
    assert max(len(fl) for fl in m["files"].values()) > 1
    return t


# ---------------- conjunct extraction ---------------------------------


def test_condition_conjuncts():
    assert _condition_conjuncts("k = 7") == [("k", "=", 7)]
    assert _condition_conjuncts("ts >= 100 AND val = 'a''b'") == [
        ("ts", ">=", 100), ("val", "=", "a'b"),
    ]
    # OR aborts (AND-precedence hazard), BETWEEN halves skip cleanly
    assert _condition_conjuncts("k = 1 OR ts > 5 AND k < 9") is None
    assert _condition_conjuncts("ts BETWEEN 10 AND 20 AND k = 3") == [("k", "=", 3)]
    # function calls / IN lists / plain flags yield nothing
    assert _condition_conjuncts("upper(val) = 'X'") is None
    assert _condition_conjuncts("k IN (1, 2)") is None
    # literal containing AND stays data
    assert _condition_conjuncts("val = 'x AND y' AND k <= 2") == [
        ("val", "=", "x AND y"), ("k", "<=", 2),
    ]


# ---------------- scoped rewrites --------------------------------------


def test_point_delete_keeps_nonoverlapping_files(split):
    t = split
    before = t._load_manifest()
    r = t.delete_where("k = 7", "del-1")
    after = t._load_manifest()
    assert r["files_kept"] > 0
    # every non-overlapping file of the touched bucket survives verbatim
    old_all = {p for fl in before["files"].values() for p in fl}
    new_all = {p for fl in after["files"].values() for p in fl}
    assert len(old_all & new_all) >= r["files_kept"]
    # result parity
    assert t.read().filter(F.col("k") == 7).count() == 0
    assert t.read().count() == 399
    got = t.read().filter(F.col("k") == 8).collect()[0]
    assert got["ts"] == 81 and got["val"] == "v8"


def test_range_update_rewrites_only_overlap(split):
    t = split
    before = t._load_manifest()
    nfiles_before = sum(len(fl) for fl in before["files"].values())
    r = t.update_where("ts >= 3000 AND ts < 3200",
                       {"val": "concat('U-', val)"}, "up-1")
    assert r["rows_hit"] == 20 and r["files_kept"] > 0
    out = t.read().filter(F.col("val").startswith("U-")).count()
    assert out == 20
    # untouched rows intact across kept AND rewritten files
    assert t.read().filter(~F.col("val").startswith("U-")).count() == 380
    assert t.read().count() == 400
    # the kept files still prune point lookups afterwards
    assert t.lookup_key(k=3).collect()[0]["val"] == "v3"
    assert nfiles_before > 2  # the scope had something to skip


def test_dirty_bucket_full_rewrite_folds_deltas(split):
    t = split
    upd = t.spark.createDataFrame([(7, 99999, "new", "upsert")], SCH)
    t.merge(upd, "mor-1", mode="mor")
    m = t._load_manifest()
    dirty = [b for b, fl in m["deltas"].items() if fl]
    assert dirty
    r = t.delete_where("k = 7", "del-2")
    after = t._load_manifest()
    for b in dirty:
        if b in map(str, range(t.n_buckets)):
            assert not after["deltas"].get(b)  # folded
    assert t.read().filter(F.col("k") == 7).count() == 0
    assert t.read().count() == 399


def test_unscoped_condition_still_correct(split):
    t = split
    r = t.delete_where("k = 1 OR k = 399", "del-3")
    assert r["files_kept"] == 0  # OR -> no scoping
    assert t.read().count() == 398


def test_exactly_once_replay_of_scoped_dml(split):
    t = split
    r1 = t.delete_where("k = 7", "del-once")
    r2 = t.delete_where("k = 7", "del-once")
    assert not r1["skipped"] and r2["skipped"]
    assert t.read().count() == 399


def test_caller_buckets_scope_keeps_nonoverlapping_files(split):
    """Caller-pruned buckets compose with file scoping: files whose key
    range provably excludes the probe survive verbatim (hash bucketing
    means SOME file of the other bucket can still span k=7 — that one
    legitimately no-op rewrites), and every row outside the predicate is
    untouched."""
    t = split
    m0 = t._load_manifest()
    probe = t.buckets_for_keys([{"k": 7}])
    other = [b for b in range(t.n_buckets) if b not in probe][0]
    r = t.delete_where("k = 7", "del-4", buckets=[probe[0], other])
    m1 = t._load_manifest()
    kept = set(m0["files"][str(other)]) & set(m1["files"][str(other)])
    assert kept and r["files_kept"] > 0
    assert t.read().count() == 399
    # the other bucket's CONTENT is unchanged even where files rewrote
    a = sorted(r["k"] for r in t.read_buckets([other], version=m0["version"]).collect())
    b = sorted(r["k"] for r in t.read_buckets([other]).collect())
    assert a == b


def test_changelog_after_scoped_dml(split):
    t = split
    t.delete_where("k = 7", "del-5")
    ch = t.changelog(t.current_version())
    rows = ch.collect()
    assert any(r["k"] == 7 and r["change_op"] == "delete" for r in rows)
    # scope-kept files must not surface phantom changes
    assert all(r["k"] == 7 for r in rows)


def test_verify_and_gc_after_scoped_dml(split, monkeypatch):
    """Integrity + retention after a partial-bucket rewrite: verify()'s
    per-bucket footer counts must cover kept+new files, and snapshot GC
    must spare kept files that older expired snapshots also referenced
    (per-file reference counting, not per-snapshot-dir)."""
    t = split
    r = t.delete_where("k = 7", "del-gc")
    assert r["files_kept"] > 0
    rep = t.verify()
    assert rep["ok"], rep
    n = t.expire_snapshots(keep_last=0, grace_sec=0)
    assert n >= 0
    # kept files survived the GC of the snapshots that first wrote them
    assert t.verify()["ok"]
    assert t.read().count() == 399
    assert t.lookup_key(k=8).collect()[0]["val"] == "v8"
