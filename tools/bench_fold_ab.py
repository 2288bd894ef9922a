"""In-process A/B of the CoW fold write-parallelism autoscaler at NB=4.

Builds one ~1 GB table (splitter ON so growth is fast), then alternates
timed all-bucket CoW folds with the splitter ON vs OFF on the SAME table
and batch, rolling back between probes — the causal evidence for
_fold_repartition that the sweep bench cannot give (at its NB=256 every
fold is already 256-way parallel and the splitter never activates).

Usage: python tools/bench_fold_ab.py [--rows 27000000] [--reps 3]
Prints one JSON line: {"table_gb": ..., "fold_on_sec": [...],
"fold_off_sec": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--workdir", default="/dev/shm/ab_fold")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import gamechanger_data_spark.sinks.table as tmod
    from gamechanger_data_spark.session import get_spark
    from gamechanger_data_spark.sinks.table import LakeTable

    spark = get_spark(
        "abfold", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "12g")},
    )
    shutil.rmtree(args.workdir, ignore_errors=True)
    t = LakeTable(spark, args.workdir, key_cols=("k",), order_cols=("ts",),
                  n_buckets=4, merge_mode="cow")

    def rows(lo, hi, ts):
        # payload must be INCOMPRESSIBLE-ish: _fold_repartition sizes the
        # split from on-disk bytes, so a constant payload (parquet RLEs it
        # to ~nothing) would keep the splitter inactive at any row count
        return spark.range(lo, hi).select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            F.lit(ts).cast("long").alias("ts"),
            F.concat(
                F.sha2(F.concat(F.lit("a"), F.col("id").cast("string")), 256),
                F.sha2(F.concat(F.lit("b"), F.col("id").cast("string")), 256),
                F.sha2(F.concat(F.lit("c"), F.col("id").cast("string")), 256),
            ).alias("payload"),
            F.lit("upsert").alias("op"),
        )

    step = args.rows // 6
    for i in range(6):
        t0 = time.perf_counter()
        t.merge(rows(i * step, (i + 1) * step, 1), f"g{i}")
        print(f"[grow] {i}: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    m = t._load_manifest()
    gb = sum(
        os.path.getsize(os.path.join(args.workdir, p))
        for fl in m["files"].values()
        for p in fl
    ) / 1e9
    print(f"[table] {gb:.2f} GB, NB=4", file=sys.stderr, flush=True)

    probe = rows(0, 250_000, 2)  # touches all 4 buckets
    v0 = t.current_version()
    res = {"on": [], "off": []}
    default = tmod.FOLD_TARGET_PARTITION_BYTES
    for rep in range(args.reps):
        for mode in ("on", "off"):
            tmod.FOLD_TARGET_PARTITION_BYTES = default if mode == "on" else 10**15
            t0 = time.perf_counter()
            r = t.merge(probe, f"p{rep}{mode}")
            dt = round(time.perf_counter() - t0, 2)
            assert r["mode"] == "cow" and r["touched_buckets"] == 4
            res[mode].append(dt)
            print(f"[probe] rep{rep} {mode}: {dt}s", file=sys.stderr, flush=True)
            t.rollback_to_snapshot(v0)
    tmod.FOLD_TARGET_PARTITION_BYTES = default
    print(json.dumps({"table_gb": round(gb, 3), "nb": 4,
                      "fold_on_sec": res["on"], "fold_off_sec": res["off"]}))
    spark.stop()
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
