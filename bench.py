"""Per-round benchmark. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "cdc": {"events": N, "elapsed_sec": s, "events_per_sec": r}}

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]; the CDC replay benchmark generates a seeded
multi-batch change feed and replays it through the full engine path
(normalize -> LWW -> bucket-CoW MERGE), reporting sustained change-events/sec
— the BASELINE.json metric. Scaling-efficiency evidence (local[8] vs
local[32]) is produced by tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1_pricing_summary",
    "lww_latest_max_by",
    "lww_latest_salted",
    "cdc_apply_events",
    "dim_lookup_join",
    "minmax_ingest_dates",
    "top10_keywords",
    "hash_anti_join_dedup",
]


def _membw_work(_):
    """Memory-bandwidth probe worker (same access pattern as
    tools/bench_scaling.py): large-array copy, the shape of shuffle
    serialization / parquet encode."""
    import numpy as np

    a = np.ones(8 * 1024 * 1024, dtype=np.float64)  # 64 MB
    b = np.empty_like(a)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 1.5:
        np.copyto(b, a)
        n += a.nbytes
    return n


def membw_probe(procs: int = 8) -> float:
    """Host memory bandwidth (GB/s) at ``procs`` workers. This host has
    documented ±25-30%% contention windows (BENCH/BASELINE.md); the r6
    headline-query regression was unattributable because the query leg
    carried no probe — now every bench run records the window it ran
    in, so a drifted qsum can be read against the probe instead of
    guessed at."""
    import multiprocessing as mp

    with mp.Pool(procs) as p:
        t0 = time.perf_counter()
        tot = sum(p.map(_membw_work, range(procs)))
    return round(tot / (time.perf_counter() - t0) / 1e9, 1)


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from gamechanger_data_spark.plans.catalog import CATALOG

    out = {}
    for name in HEADLINE:
        fn = CATALOG[name].fn
        fn(spark, sf_dir).collect()  # warm (JIT/codegen, file listing, broadcast)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()  # fresh plan each run (honest steady state)
            runs.append(time.perf_counter() - t0)
        out[name] = round(sorted(runs)[1], 4)  # median
    return out


def bench_cdc(spark, n_batches: int, events_per_batch: int, workdir: str) -> dict:
    from gamechanger_data_spark.datagen import FeedSpec, generate_batch, write_feed
    from gamechanger_data_spark.sinks.table import LakeTable

    spec = FeedSpec(
        n_convs=max(200, events_per_batch // 50),
        max_turns=50,
        n_batches=n_batches,
        events_per_batch=events_per_batch,
        seed=42,
        with_version_hash=False,
    )
    feed = os.path.join(workdir, "feed")
    write_feed(feed, spec, parts_per_batch=32)
    table = LakeTable(spark, os.path.join(workdir, "table"), n_buckets=32)

    from gamechanger_data_spark.sources.feed import list_ready_batches, read_batch
    from gamechanger_data_spark.streaming.driver import apply_batch

    t0 = time.perf_counter()
    per_batch = []
    for batch_id, d in list_ready_batches(feed):
        tb = time.perf_counter()
        r = apply_batch(table, read_batch(spark, d), batch_id, batch_dir=d)
        assert not r.get("skipped")
        per_batch.append(round(time.perf_counter() - tb, 3))
    elapsed = time.perf_counter() - t0
    lin = table.lineage().toPandas()
    n_events = int(lin[lin.partition_id >= 0].rows_in.sum())

    final_rows = table.read().count()  # before the probe mutates the table

    # Metadata-agg probe (round-7 surface): count(*) answered from the
    # manifest's commit-time exact counts (stats_agg) vs the same count
    # by resolved scan. Both sides warm first (the scan via the
    # final_rows count above, the meta side via one throwaway call that
    # pays the session's one-time local-relation materialization cost),
    # so the timed numbers compare the steady paths.
    table.stats_agg([("count", "*")]).collect()
    t1 = time.perf_counter()
    scan_n = table.read().count()
    scan_sec = time.perf_counter() - t1
    t1 = time.perf_counter()
    meta_df, rep = table.stats_agg([("count", "*")], return_report=True)
    meta_n = int(meta_df.collect()[0][0])
    meta_sec = time.perf_counter() - t1
    assert meta_n == scan_n == final_rows, (meta_n, scan_n, final_rows)
    stats_probe = {
        "rows": scan_n,
        "scan_count_sec": round(scan_sec, 3),
        "meta_count_sec": round(meta_sec, 4),
        "speedup": round(scan_sec / max(meta_sec, 1e-9), 1),
        "buckets_meta": rep["buckets_meta"],
        "buckets_scanned": rep["buckets_scanned"],
    }

    # Trickle-merge probe: a 2k-event batch against the multi-million-row
    # table, as a merge-on-read delta append vs a forced bucket-CoW
    # rewrite — the MOR write amplification evidence (wall time ∝ batch
    # under MOR, ∝ touched buckets under CoW). Symmetric protocol: each
    # timed merge starts from the SAME snapshot (rollback between runs)
    # and a full warm-up pass precedes the timed pass, so neither mode
    # inherits the other's delta files or a colder cache.
    tiny = generate_batch(spec, n_batches + 1).head(2000).drop(
        columns=["version_hash"]
    )
    v0 = table.current_version()
    trickle = {}
    for rep in ("warm", "timed"):
        for mode in ("cow", "mor"):
            df = spark.createDataFrame(tiny)
            t1 = time.perf_counter()
            r = table.merge(df, batch_id=f"__trickle_{mode}__", mode=mode,
                            src_rows=len(tiny))
            if rep == "timed":
                trickle[f"{mode}_sec"] = round(time.perf_counter() - t1, 3)
            assert r["mode"] == mode
            table.rollback_to_snapshot(v0)
    trickle["speedup"] = round(trickle["cow_sec"] / max(trickle["mor_sec"], 1e-9), 2)

    # Predicate-DML probe (round-5 surface): a POINT delete of one
    # (conv_id, turn_idx) row against the multi-million-row table,
    # bucket-pruned via buckets_for_keys (exactly ONE bucket — keys
    # include turn_idx, so a single key tuple is the design point) vs
    # unpruned (the predicate scans every bucket to find its matches).
    probe_conv = tiny["conv_id"].iloc[0]
    dml = {}
    for rep in ("warm", "timed"):
        for variant in ("pruned", "unpruned"):
            pk = (
                table.buckets_for_keys(
                    [{"conv_id": probe_conv, "turn_idx": 0}]
                )
                if variant == "pruned"
                else None
            )
            t1 = time.perf_counter()
            r = table.delete_where(
                f"conv_id = '{probe_conv}' AND turn_idx = 0",
                batch_id=f"__dmlprobe_{variant}__",
                buckets=pk,
            )
            if rep == "timed":
                dml[f"{variant}_sec"] = round(time.perf_counter() - t1, 3)
                dml[f"{variant}_buckets"] = r.get("touched_buckets", 0)
            table.rollback_to_snapshot(v0)
    dml["prune_speedup"] = round(
        dml["unpruned_sec"] / max(dml["pruned_sec"], 1e-9), 2
    )

    # Branch-publish probe (round-5 surface): stage a 2k-event merge on an
    # audit branch, then fast_forward main — the publish itself must be
    # metadata-only (two pointer/manifest loads + a pointer swap),
    # independent of table size.
    table.create_branch("bench-audit")
    branch = LakeTable(
        spark, table.root, n_buckets=table.n_buckets, branch="bench-audit"
    )
    df = spark.createDataFrame(tiny)
    t1 = time.perf_counter()
    branch.merge(df, batch_id="__branch_stage__", src_rows=len(tiny))
    stage_sec = round(time.perf_counter() - t1, 3)
    t1 = time.perf_counter()
    table.fast_forward("bench-audit")
    publish_sec = round(time.perf_counter() - t1, 4)
    wap = {"stage_2k_sec": stage_sec, "publish_sec": publish_sec}
    table.rollback_to_snapshot(v0)
    table.drop_branch("bench-audit")

    # CDC-out probe (round-7 surface): drain the table's full history
    # through the lakecdc streaming source (startingVersion=0, one
    # availableNow span, one partition per bucket, executor-side pyarrow
    # diff kernel) and report streamed change-rows/sec.
    import tempfile
    import uuid as _uuid

    from gamechanger_data_spark.streaming.cdc_source import register_lakecdc

    register_lakecdc(spark)
    name = f"bench_lakecdc_{_uuid.uuid4().hex[:8]}"
    t1 = time.perf_counter()
    q = (
        spark.readStream.format("lakecdc")
        .option("path", table.root)
        .option("startingVersion", 0)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bench_cdc_cp_"))
        .start()
    )
    q.awaitTermination(600)
    streamed = spark.table(name).count()
    drain_sec = time.perf_counter() - t1
    cdc_out = {
        "rows": int(streamed),
        "drain_sec": round(drain_sec, 3),
        "rows_per_sec": round(streamed / drain_sec, 1),
    }
    spark.catalog.dropTempView(name)

    return {
        "events": n_events,
        "batches": n_batches,
        "elapsed_sec": round(elapsed, 3),
        "events_per_sec": round(n_events / elapsed, 1),
        # last-batch basis: excludes the one-time JVM/codegen warmup that
        # lands on batch 1 (the steady number for a long-running driver;
        # the last batch does MORE work — it reads back touched state)
        "batch_secs": per_batch,
        "steady_events_per_sec": round(
            (n_events / len(per_batch)) / per_batch[-1], 1
        ),
        "final_rows": final_rows,
        "trickle_2k": trickle,
        "dml_point_delete": dml,
        "wap_publish": wap,
        "cdc_out_stream": cdc_out,
        "stats_agg_count": stats_probe,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Batch sizing: per-batch fixed driver cost is ~2-3 s, so small batches
    # measure batch granularity, not the engine (round-1 lesson). Default
    # 2 x 3M events keeps the replay overhead share < ~15%.
    n_batches = int(os.environ.get("GCSPARK_BENCH_BATCHES", "2"))
    epb = int(os.environ.get("GCSPARK_BENCH_EVENTS_PER_BATCH", "3000000"))

    from gamechanger_data_spark.session import get_spark

    spark = get_spark(
        "gcspark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g")},
    )

    membw_pre = membw_probe()
    queries = bench_queries(spark, sf_dir)
    membw_post = membw_probe()

    # /dev/shm when available: a single spinning/virtual disk serializes
    # concurrent readers and would contaminate the throughput number
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else "/tmp"
    workdir = f"{base}/gcspark_bench_{os.getpid()}"
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    try:
        cdc = bench_cdc(spark, n_batches, epb, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    total = round(sum(queries.values()) + cdc["elapsed_sec"], 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline query latency + CDC upsert replay (change-events/sec)",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "query_membw_gbps": {"pre": membw_pre, "post": membw_post},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cdc": cdc,
            }
        )
    )


if __name__ == "__main__":
    main()
