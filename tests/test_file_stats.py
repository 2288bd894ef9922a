"""Manifest zone maps (per-file min/max column statistics) and the file
skipping they drive: Iceberg-style data skipping re-expressed over the
LakeTable manifest, derived from parquet footers at commit time.

Reference analog: the reference prunes its scans with per-partition
manifest row counts and date bounds when selecting crawler/ingest deltas
(dataPipelines/gc_ingest/tools/load/utils.py backfill date filters); here
the same role is played by commit-time footer stats so a predicate scan
schedules only overlapping files.
"""

import json
from datetime import date, datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import gamechanger_data_spark.sinks.table as table_mod
from gamechanger_data_spark.sinks.table import (
    LakeTable,
    _enc_stat,
    _stats_exclude,
)

SCH = T.StructType([
    T.StructField("k", T.IntegerType()),
    T.StructField("ts", T.LongType()),
    T.StructField("val", T.StringType()),
    T.StructField("op", T.StringType()),
])


def _rows(spark, lo, hi, ts=lambda i: i * 10, op="upsert"):
    return spark.createDataFrame(
        [(i, ts(i), f"v{i}", op) for i in range(lo, hi)], SCH
    )


# ---------------- encoding -------------------------------------------


def test_enc_stat_domains():
    assert _enc_stat(5) == 5
    assert _enc_stat(2.5) == 2.5
    assert _enc_stat(float("nan")) is None
    assert _enc_stat(True) is None  # bools are not order-prunable
    assert _enc_stat("abc") == "abc"
    assert _enc_stat("x" * 300) is None  # truncation hazard -> no stat
    assert _enc_stat(None) is None
    assert _enc_stat(date(2024, 1, 2)) == "2024-01-02"
    # naive == epoch micros; aware normalizes to UTC first
    naive = datetime(2024, 1, 1, 0, 0, 1)
    aware = datetime(2024, 1, 1, 1, 0, 1, tzinfo=timezone(timedelta(hours=1)))
    assert _enc_stat(naive) == 1704067201000000
    assert _enc_stat(aware) == _enc_stat(naive)
    # sub-ms survives (integer arithmetic, not float seconds)
    assert _enc_stat(naive.replace(microsecond=7)) == 1704067201000007


def test_stats_exclude_ops():
    fs = {"ts": [100, 200]}
    for op, val, pruned in [
        ("=", 99, True), ("=", 100, False), ("=", 150, False),
        ("=", 200, False), ("=", 201, True),
        (">", 199, False), (">", 200, True), (">", 250, True),
        (">=", 200, False), (">=", 201, True),
        ("<", 101, False), ("<", 100, True),
        ("<=", 100, False), ("<=", 99, True),
    ]:
        assert _stats_exclude(fs, [(  "ts", op, val)], {}) is pruned, (op, val)
    # conjunction: any provably-empty conjunct prunes
    assert _stats_exclude(fs, [("ts", ">=", 150), ("ts", ">", 300)], {})
    # unknown column / missing stats never prune
    assert not _stats_exclude(fs, [("other", "=", 1)], {})
    assert not _stats_exclude({}, [("ts", "=", 1)], {})
    # kind mismatch (schema drift) never prunes ...
    assert not _stats_exclude({"ts": ["a", "b"]}, [("ts", ">", 5)], {})
    # ... except the deliberate string-literal-vs-timestamp coercion
    assert _stats_exclude(
        {"ts": [1704067200000000, 1704067300000000]},
        [("ts", ">", "2024-06-01 00:00:00")],
        {},
    )
    assert not _stats_exclude(
        {"ts": [1704067200000000, 1704067300000000]},
        [("ts", ">", "not a timestamp")],
        {},
    )
    # rename alias: stats recorded under the file's old column name
    assert _stats_exclude({"old": [1, 2]}, [("new", ">", 5)], {"new": ("old",)})


# ---------------- commit-time derivation ------------------------------


def test_commit_records_base_stats_not_delta(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_rows(spark, 0, 40), "b0")
    m = t._load_manifest()
    stats = m.get("stats") or {}
    base = [p for fl in m["files"].values() for p in fl]
    assert base and all(p in stats for p in base)
    for p in base:
        # default stats_cols = key+order; __-prefixed keys are the
        # reserved exact-count entries feeding stats_agg
        zone = {k for k in stats[p] if not k.startswith("__")}
        assert zone == {"k", "ts"}
        assert stats[p]["__n"] >= 1 and stats[p]["__nd"] == 0
        lo, hi = stats[p]["k"]
        assert 0 <= lo <= hi <= 39
    # MOR append: delta files never enter the stats map
    t.merge(_rows(spark, 0, 5, ts=lambda i: 1000 + i), "b1", mode="mor")
    m2 = t._load_manifest()
    deltas = [p for fl in m2["deltas"].values() for p in fl]
    assert deltas
    assert not any(p in (m2.get("stats") or {}) for p in deltas)
    # base files untouched by the delta commit carry their stats forward
    for p in base:
        assert m2["stats"][p] == stats[p]


def test_stats_cols_empty_disables(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2, stats_cols=())
    t.merge(_rows(spark, 0, 10), "b0")
    assert "stats" not in t._load_manifest()


def test_files_metadata_exposes_stats_json(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_rows(spark, 0, 20), "b0")
    row = t.files().filter(F.col("kind") == "base").limit(1).collect()[0]
    s = json.loads(row["stats_json"])
    assert {k for k in s if not k.startswith("__")} == {"k", "ts"}


# ---------------- pruned reads ----------------------------------------


@pytest.fixture
def split_table(spark, tmp_path, monkeypatch):
    """A table whose buckets hold SEVERAL range-partitioned files each
    (the fold autoscaler's layout at scale), so file skipping has
    something to skip."""
    monkeypatch.setattr(table_mod, "FOLD_TARGET_PARTITION_BYTES", 1024)
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_rows(spark, 0, 400), "b0")
    t.merge(_rows(spark, 0, 400, ts=lambda i: i * 10 + 1), "b1")  # CoW fold
    m = t._load_manifest()
    assert max(len(fl) for fl in m["files"].values()) > 1, "fold never split"
    return t


def test_range_read_prunes_and_matches(split_table):
    t = split_table
    plain = t.read().filter(F.col("ts") >= 3000)
    pruned = t.read(where=[("ts", ">=", 3000)])
    assert t.last_scan_report["pruned_files"] > 0
    assert pruned.count() == plain.count()
    assert pruned.exceptAll(plain).isEmpty()
    assert plain.exceptAll(pruned).isEmpty()


def test_key_range_read_prunes(split_table):
    t = split_table
    out = t.read(where=[("k", "<", 50)])
    assert out.count() == 50
    assert t.last_scan_report["pruned_files"] > 0


def test_lookup_key_prunes_split_bucket(split_table):
    t = split_table
    got = t.lookup_key(k=7).collect()
    assert len(got) == 1 and got[0]["ts"] == 71
    rep = t.last_scan_report
    assert rep["pruned_files"] > 0
    assert rep["clean_files"] - rep["pruned_files"] >= 1


def test_lookup_key_prunes_with_deltas_still_correct(split_table):
    """Equality skipping is LWW-sound in a DIRTY bucket: pruned base
    files provably hold no row of the probed key, so every competing
    version is still read."""
    t = split_table
    upd = t.spark.createDataFrame([(7, 9999, "new", "upsert")], SCH)
    t.merge(upd, "b2", mode="mor")
    got = t.lookup_key(k=7).collect()
    assert len(got) == 1 and got[0]["ts"] == 9999 and got[0]["val"] == "new"
    assert t.last_scan_report["pruned_files"] > 0


def test_dirty_bucket_range_read_never_prunes_base(split_table):
    """The canonical MOR soundness case: base holds the WINNER (high ts),
    a delta holds a LOSER (low ts) that satisfies the predicate. If the
    base file were pruned by the predicate, the stale delta row would
    wrongly win the resolve and leak through the filter."""
    t = split_table
    stale = t.spark.createDataFrame([(399, 5, "stale", "upsert")], SCH)
    t.merge(stale, "b2", mode="mor")
    pruned = t.read(where=[("ts", "<=", 100)])
    rep = dict(t.last_scan_report)  # pruning happens at plan-build time
    plain = t.read().filter(F.col("ts") <= 100)
    got = pruned.collect()
    assert all(r["k"] != 399 for r in got)  # k=399's winner has ts 3991
    assert pruned.count() == plain.count()
    # the delta touched ONE bucket; the other (clean) bucket still prunes
    m = t._load_manifest()
    assert any(not m["deltas"].get(b) for b in m["files"])
    assert rep["pruned_files"] > 0


def test_rename_reads_prune_via_alias(spark, tmp_path, monkeypatch):
    """Files written before rename_column carry stats under the old
    name; a predicate on the new name must still skip them. (Key/order
    columns cannot be renamed, so this path needs custom ``stats_cols``
    covering a payload column.)"""
    monkeypatch.setattr(table_mod, "FOLD_TARGET_PARTITION_BYTES", 1024)
    sch = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("ts", T.LongType()),
        T.StructField("score", T.IntegerType()),
        T.StructField("op", T.StringType()),
    ])
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2,
                  stats_cols=("k", "ts", "score"))
    mk = lambda ts0: spark.createDataFrame(
        [(i, ts0 + i, i, "upsert") for i in range(400)], sch
    )
    t.merge(mk(0), "b0")
    t.merge(mk(1), "b1")  # CoW fold -> range-split, multi-file buckets
    assert max(len(fl) for fl in t._load_manifest()["files"].values()) > 1
    t.rename_column("score", "points")
    pruned = t.read(where=[("points", ">=", 350)])
    rep = dict(t.last_scan_report)
    assert pruned.count() == 50
    assert rep["pruned_files"] > 0


def test_where_on_empty_table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    assert t.read(where=[("ts", ">", 0)]).count() == 0


def test_where_rejects_unknown_op(split_table):
    with pytest.raises(ValueError, match="unsupported predicate op"):
        split_table.read(where=[("ts", "!=", 5)])


def test_timestamp_stats_survive_write(spark, tmp_path):
    """Spark must emit TIMESTAMP_MICROS (INT96 carries no parquet
    min/max): a timestamp order column gets real integer bounds."""
    sch = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
    ])
    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, base + timedelta(seconds=i), "upsert") for i in range(20)], sch
    )
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=1)
    t.merge(df, "b0")
    stats = t._load_manifest()["stats"]
    (s,) = stats.values()
    assert s["ts"] == [1704067200000000, 1704067219000000]
    # and a datetime predicate excludes / retains correctly
    assert t.read(where=[("ts", ">", base + timedelta(seconds=19))]).count() == 0
    assert t.last_scan_report["pruned_files"] == 1
    assert t.read(where=[("ts", ">=", base)]).count() == 20


# ---------------- cluster_by ------------------------------------------


def test_cluster_by_enables_ts_skipping(spark, tmp_path):
    """A hash-bucketed table's single-file buckets span the whole ts
    domain (nothing skips); cluster_by('ts') range-splits each bucket
    into disjoint-ts files, after which a ts predicate prunes."""
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_rows(spark, 0, 400), "b0")
    t.merge(_rows(spark, 0, 10, ts=lambda i: 10_000 + i), "b1", mode="mor")
    before = t.read(where=[("ts", ">=", 3000)])
    n_before = before.count()
    r = t.cluster_by("ts", target_file_bytes=1024)
    assert not r["skipped"] and r["files_written"] > 2
    m = t._load_manifest()
    assert not any(m["deltas"].values())  # deltas folded
    after = t.read(where=[("ts", ">=", 3000)])
    rep = dict(t.last_scan_report)
    assert after.count() == n_before
    assert rep["pruned_files"] > 0
    # logical content unchanged: the maintenance commit has no changelog
    assert t.changelog(t.current_version()).count() == 0
    # point lookups still resolve (key zone maps widen per file, bucket
    # pruning still applies)
    got = t.lookup_key(k=3).collect()
    assert len(got) == 1 and got[0]["ts"] == 10_003


def test_cluster_by_refuses_unstatted_column(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_rows(spark, 0, 20), "b0")
    with pytest.raises(ValueError, match="stats_cols"):
        t.cluster_by("val")
    with pytest.raises(ValueError, match="unknown columns"):
        LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2,
                  stats_cols=("k", "ts", "nope")).cluster_by("nope")


def test_cluster_by_via_sql_call(spark, tmp_path):
    from gamechanger_data_spark.plans.sqlfront import SqlLake

    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_rows(spark, 0, 400), "b0")
    sqll = SqlLake(spark).register("tr", t)
    row = sqll.sql("CALL tr.cluster_by('ts', null, '__c1__', 1024)").collect()[0]
    assert row["procedure"] == "cluster_by"
    # an aliased WHERE count now routes to the metadata-agg path: the
    # skip evidence moves to the fast-agg report
    out = sqll.sql("SELECT count(*) AS n FROM tr WHERE ts >= 3000")
    assert out.collect()[0]["n"] == 100
    assert sqll.last_fast_agg["files_skipped"] > 0
    # a projecting SELECT still goes through the scan path and prunes
    rows = sqll.sql("SELECT k FROM tr WHERE ts >= 3000").collect()
    assert len(rows) == 100
    assert t.last_scan_report["pruned_files"] > 0


def test_read_buckets_where_composes_with_skipping(split_table):
    t = split_table
    bs = t.buckets_for_keys([{"k": 7}])
    out = t.read_buckets(bs, where=[("k", "=", 7)])
    rep = dict(t.last_scan_report)
    got = out.collect()
    assert len(got) == 1 and got[0]["ts"] == 71
    assert rep["pruned_files"] > 0
    with pytest.raises(ValueError, match="resolve=True"):
        t.read_buckets(bs, resolve=False, where=[("k", "=", 7)])


# ---------------- stats segmentation (manifest-split analog) -----------


@pytest.fixture
def seg_env(monkeypatch):
    # force segmentation at toy scale: inline map caps at 3 entries,
    # segments merge once more than 3 accumulate
    monkeypatch.setattr(table_mod, "STATS_INLINE_MAX", 3)
    monkeypatch.setattr(table_mod, "STATS_SEGMENT_ROLL", 3)


def test_stats_segment_crossover_parity_and_pruning(spark, tmp_path, seg_env):
    # 8 buckets -> 8 live files: over the toy inline cap from commit 1
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=8)
    for i in range(6):
        t.merge(_rows(spark, i * 50, (i + 1) * 50), f"b{i}")
    m = t._load_manifest()
    assert m.get("stats_segments"), "expected the map to have segmented"
    assert len(m.get("stats") or {}) <= 3  # inline is only the tail
    # parity: the union equals a fresh footer derivation for every file
    full = t._manifest_stats(m)
    base = [p for fl in m["files"].values() for p in fl]
    assert set(base) <= set(full)
    fresh = LakeTable(spark, str(tmp_path / "t"), n_buckets=8)
    for p in base:
        assert full[p] == fresh._file_stats(p)
    # consumers unaffected: skipping and metadata counts still work
    assert t.read(where=[("k", ">", 10_000)]).count() == 0
    assert t.last_scan_report["pruned_files"] > 0
    c, rep = t.stats_agg([("count", "*")], return_report=True)
    assert c.collect()[0][0] == 300 and rep["buckets_scanned"] == 0
    # time travel: an old version's segments still resolve
    old = t._manifest_stats(t._load_manifest(2))
    old_files = [p for fl in t._load_manifest(2)["files"].values() for p in fl]
    assert set(old_files) <= set(old)


def test_stats_segment_rollup_restricts_to_live_files(spark, tmp_path, seg_env):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=8)
    # enough commits to force at least one segment merge (ROLL=3);
    # every merge rewrites both buckets, killing the previous files
    for i in range(12):
        t.merge(_rows(spark, 0, 40, ts=lambda x, i=i: 1000 * i + x), f"b{i}")
    m = t._load_manifest()
    segs = m.get("stats_segments") or []
    assert segs and len(segs) <= 3 + 1
    live = {p for fl in m["files"].values() for p in fl}
    merged_total = set(t._manifest_stats(m))
    # after a roll-up, dead entries are dropped: the union holds the
    # live files plus at most the post-roll tail/segment additions
    dead = merged_total - live
    total_ever = 8 * 12  # up to 8 bucket files rewritten per commit
    assert len(dead) < total_ever - len(live) - 8, (
        "roll-up kept every dead entry — restriction never happened")
    assert t.read().count() == 40


def test_statsseg_gc_keeps_reachable_removes_orphans(spark, tmp_path, seg_env):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=8)
    for i in range(6):
        t.merge(_rows(spark, i * 30, (i + 1) * 30), f"b{i}")
    m = t._load_manifest()
    segs = m.get("stats_segments") or []
    assert segs
    import os
    orphan = os.path.join(t.root, "_meta", "statsseg-deadbeef.json")
    with open(orphan, "w") as f:
        f.write("{}")
    t.expire_snapshots(keep_last=1, grace_sec=0)
    assert not os.path.exists(orphan)
    for rel in segs:
        assert os.path.exists(os.path.join(t.root, rel)), rel
    # and the stats still serve after GC
    c, rep = t.stats_agg([("count", "*")], return_report=True)
    assert c.collect()[0][0] == 180 and rep["buckets_scanned"] == 0


# ---------------- Z-order clustering -----------------------------------


def test_zorder_skips_on_every_dimension(spark, tmp_path):
    def build(root):
        t = LakeTable(spark, root, key_cols=("k",), order_cols=("ts",),
                      n_buckets=2, stats_cols=("k", "ts", "a", "b"))
        df = spark.range(20000).select(
            F.col("id").cast("int").alias("k"), F.col("id").alias("ts"),
            (F.col("id") % 100).cast("long").alias("a"),
            ((F.col("id") * 7919) % 100).cast("long").alias("b"),
            F.lit("upsert").alias("op"))
        t.merge(df, "b0")
        return t

    tz = build(str(tmp_path / "z"))
    tl = build(str(tmp_path / "l"))
    tz.cluster_by(("a", "b"), zorder=True, target_file_bytes=16 << 10)
    tl.cluster_by(("a", "b"), target_file_bytes=16 << 10)
    # maintenance rewrite: logical content identical across layouts
    assert tz.read().count() == tl.read().count() == 20000
    assert tz.read().exceptAll(tl.read()).isEmpty()
    pruned = {}
    for t, name in ((tz, "z"), (tl, "lex")):
        for col in ("a", "b"):
            n = t.read(where=[(col, "<", 10)]).count()
            # capture BEFORE the truth read below overwrites the report
            pruned[(name, col)] = t.last_scan_report["pruned_files"]
            assert n == t.read().filter(F.col(col) < 10).count()
    # lexical: leading column skips; the trailing column is essentially
    # unskippable (a lucky small tail file may prune by chance, so the
    # assertion is the CONTRAST, not an absolute zero)
    assert pruned[("lex", "a")] > 0
    assert pruned[("lex", "b")] <= 2
    # z-order: BOTH dimensions skip, and the trailing dimension skips
    # far more than lexical ever can
    assert pruned[("z", "a")] > 0
    assert pruned[("z", "b")] > pruned[("lex", "b")] + 2


def test_zorder_validation(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2,
                  stats_cols=("k", "ts", "val"))
    t.merge(_rows(spark, 0, 50), "b0")
    with pytest.raises(ValueError, match="at least two columns"):
        t.cluster_by("ts", zorder=True)
    with pytest.raises(ValueError, match="numeric/date/timestamp"):
        t.cluster_by(("ts", "val"), zorder=True)


def test_zorder_via_sql_call(spark, tmp_path):
    from gamechanger_data_spark.plans.sqlfront import SqlLake

    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_rows(spark, 0, 400), "b0")
    sqll = SqlLake(spark).register("tr", t)
    row = sqll.sql(
        "CALL tr.cluster_by('k,ts', null, '__cz__', 4096, true)"
    ).collect()[0]
    assert row["procedure"] == "cluster_by"
    assert t.read().count() == 400


def test_segmented_stats_survive_multi_writer(spark, tmp_path, seg_env):
    """Two handles on one table (separate caches, interleaved commits):
    each commit must carry forward the OTHER writer's segment history —
    stats stay complete and counts exact."""
    root = str(tmp_path / "t")
    a = LakeTable(spark, root, key_cols=("k",), order_cols=("ts",),
                  n_buckets=8)
    a.merge(_rows(spark, 0, 60), "a0")
    # second handle opens AFTER the table exists: adopts the spec
    b = LakeTable(spark, root, n_buckets=8)
    b.merge(_rows(spark, 60, 120), "b0")
    a.merge(_rows(spark, 120, 180), "a1")
    b.merge(_rows(spark, 180, 240), "b1")
    m = b._load_manifest()
    assert m.get("stats_segments"), "toy cap should have segmented"
    full = b._manifest_stats(m)
    base = [p for fl in m["files"].values() for p in fl]
    assert set(base) <= set(full)
    c, rep = b.stats_agg([("count", "*")], return_report=True)
    assert c.collect()[0][0] == 240 and rep["buckets_scanned"] == 0
    # the other handle (stale segment cache) agrees
    c2 = a.stats_agg([("count", "*")]).collect()[0][0]
    assert c2 == 240
