"""Interleaved A/B: zone-map file skipping vs row-group pushdown only.

Builds a fold-split LakeTable (many range-partitioned files per bucket —
the autoscaler's layout for fat buckets at scale), then times the same
narrow predicate scan both ways, interleaved A,B / B,A per rep:

  A  t.read(where=[(col, op, lit)])   — manifest stats skip whole files
                                        BEFORE the scan schedules, then
                                        the residual filter pushes down
  B  t.read().filter(...)             — every file scheduled; Spark's
                                        parquet reader still prunes row
                                        groups from each file's footer

Both sides return identical rows (asserted). The gap measures what file
skipping saves: per-file task scheduling + footer reads. At local[8]
with a warm page cache that cost is small per file; the per-file
constant multiplies at 10^5 files on object storage (a footer read
becomes a ranged GET), which is the regime the manifest stats target —
report the per-file milliseconds, not just the ratio.

Usage: python tools/bench_prune_ab.py [rows] [reps]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gamechanger_data_spark.sinks.table as table_mod
from gamechanger_data_spark.session import get_spark
from gamechanger_data_spark.sinks.table import LakeTable


def build(spark, root: str, rows: int):
    import pyspark.sql.functions as F

    table_mod.FOLD_TARGET_PARTITION_BYTES = 2 << 20  # ~2 MB/file
    t = LakeTable(spark, root, key_cols=("k",), order_cols=("ts",), n_buckets=8)
    mk = lambda ts0: (
        spark.range(0, rows)
        .select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 10 + ts0).alias("ts"),
            F.sha2(F.concat(F.lit("payload-"), F.col("id").cast("string")), 256).alias("val"),
            F.lit("upsert").alias("op"),
        )
    )
    t.merge(mk(0), "b0")
    t.merge(mk(1), "b1")  # CoW fold of resident bytes -> range-split files
    m = t._load_manifest()
    nfiles = sum(len(fl) for fl in m["files"].values())
    return t, nfiles


def bytes_written(t, version):
    m = t._load_manifest(version)
    pm = t._load_manifest(m["parent"])
    old = {p for fl in pm["files"].values() for p in fl}
    new = [p for fl in m["files"].values() for p in fl if p not in old]
    return sum(
        os.path.getsize(os.path.join(t.root, p)) for p in new
    ), len(new)


def dml_leg(spark, rows):
    """Scoped vs unscoped predicate DML on the same split layout: table A
    carries zone maps (file scoping active), table B was built with
    stats_cols=() (no stats -> full-bucket rewrites). Same narrow ts-range
    delete; report wall + bytes/files actually rewritten."""
    import shutil

    out = {}
    for side, stats in (("scoped", None), ("unscoped", ())):
        root = f"/dev/shm/gcspark_prune_dml_{side}"
        shutil.rmtree(root, ignore_errors=True)
        import pyspark.sql.functions as F

        table_mod.FOLD_TARGET_PARTITION_BYTES = 2 << 20
        kw = {} if stats is None else {"stats_cols": stats}
        t = LakeTable(spark, root, key_cols=("k",), order_cols=("ts",),
                      n_buckets=8, **kw)
        mk = lambda ts0: spark.range(0, rows).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 10 + ts0).alias("ts"),
            F.sha2(F.concat(F.lit("p-"), F.col("id").cast("string")), 256).alias("val"),
            F.lit("upsert").alias("op"),
        )
        t.merge(mk(0), "b0")
        t.merge(mk(1), "b1")
        lo = rows * 10 // 2
        s = time.perf_counter()
        r = t.delete_where(f"ts >= {lo} AND ts < {lo + rows // 100}", "d1")
        wall = time.perf_counter() - s
        nbytes, nfiles = bytes_written(t, r["version"])
        out[side] = {
            "wall_sec": round(wall, 3),
            "files_kept": r.get("files_kept", 0),
            "files_rewritten": nfiles,
            "bytes_rewritten": nbytes,
        }
    out["bytes_ratio"] = round(
        out["unscoped"]["bytes_rewritten"]
        / max(1, out["scoped"]["bytes_rewritten"]), 2
    )
    out["wall_ratio"] = round(
        out["unscoped"]["wall_sec"] / max(1e-9, out["scoped"]["wall_sec"]), 2
    )
    return out


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import shutil

    import pyspark.sql.functions as F

    root = "/dev/shm/gcspark_prune_ab"
    shutil.rmtree(root, ignore_errors=True)
    spark = get_spark("prune-ab", master="local[8]", shuffle_partitions=8)
    t, nfiles = build(spark, root, rows)
    lo, hi = rows * 10 // 2, rows * 10 // 2 + rows // 100  # ~0.1% of keyspace
    where = [("ts", ">=", lo), ("ts", "<", hi)]

    def run_a():
        s = time.perf_counter()
        n = t.read(where=where).count()
        return time.perf_counter() - s, n, dict(t.last_scan_report)

    def run_b():
        s = time.perf_counter()
        n = t.read().filter((F.col("ts") >= lo) & (F.col("ts") < hi)).count()
        return time.perf_counter() - s, n, None

    run_a(), run_b()  # warm both paths (JIT, page cache)
    a_times, b_times, rep = [], [], None
    for i in range(reps):
        order = (run_a, run_b) if i % 2 == 0 else (run_b, run_a)
        for fn in order:
            dt, n, r = fn()
            (a_times if fn is run_a else b_times).append(dt)
            if r:
                rep = r
                na = n
            else:
                nb = n
    assert na == nb, (na, nb)
    am, bm = statistics.median(a_times), statistics.median(b_times)
    skipped = rep["pruned_files"]
    print(json.dumps({
        "rows": rows, "files": nfiles, "reps": reps,
        "rows_matched": na,
        "pruned_files": skipped, "scheduled_files_a": nfiles - skipped,
        "a_skipping_sec": round(am, 4), "b_pushdown_only_sec": round(bm, 4),
        "speedup": round(bm / am, 3),
        "saved_ms_per_skipped_file": round((bm - am) * 1000 / max(1, skipped), 3),
        "dml_scoping": dml_leg(spark, rows // 4),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
