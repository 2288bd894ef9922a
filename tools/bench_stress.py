"""Scale-stress evidence run: one order of magnitude past the test suite.

Drives >= 5e7 change events through >= 200 commits into a LakeTable with
NB >= 256 buckets at local[$SPARK_GRAFT_CPUS], recording per commit:

  * manifest bytes (the O(1)-manifest claim: must plateau at O(NB x
    delta_depth), never grow with commit count),
  * applied-batch inline tail length + chained segment count (the
    segment-roll design: tail bounded by BATCH_SEGMENT_SIZE, segments
    grow by 1 per SEGMENT_SIZE commits),
  * MOR delta-stack depth max/mean (bounded by mor_max_deltas),
  * commit latency and write mode (auto: trickle MOR + periodic folds),
  * sampled lineage-query latency (must stay flat: distributed JSON scan,
    not a driver loop over commits),
  * sampled expire_snapshots cost and bytes on disk.

Usage: python tools/bench_stress.py [--events 50000000] [--commits 200]
       [--nb 256] [--workdir /dev/shm/gcspark_stress]
Writes one JSON line per commit to BENCH/stress_last_run.jsonl and a
summary to stdout; BENCH/BASELINE.md curates the results by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gamechanger_data_spark.datagen import FeedSpec, generate_batch  # noqa: E402
from gamechanger_data_spark.session import get_spark  # noqa: E402
from gamechanger_data_spark.sinks.table import LakeTable  # noqa: E402
from gamechanger_data_spark.streaming.driver import apply_batch  # noqa: E402


def du_bytes(path: str) -> int:
    total = 0
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, fn))
            except OSError:
                pass
    return total


def chain_probe(commits: int, workdir: str) -> dict:
    """Metadata-only probe of the ancestor chain log: fabricate a
    ``commits``-deep chain (empty file maps — the machinery under test is
    pure manifest handling), then assert deep version_as_of resolution
    and a fast_forward publish each cost <= 2 manifest loads (manifest +
    at most one chain segment), with wall-clock latencies recorded. This
    is the O(1)-resolution contract: without the chain log both walked
    O(chain) manifests per call."""
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    t = LakeTable(None, os.path.join(workdir, "chain"), n_buckets=4)

    def meta_commit(tbl):
        return tbl._commit({
            "schema": None, "n_buckets": tbl.n_buckets, "files": {},
            "deltas": {}, "base_rows": {}, "delta_rows": {},
            "applied_batches": [], "batches_segment": None,
            "lineage": [], "kind": "data",
        })

    t0 = time.time()
    for _ in range(commits):
        meta_commit(t)
    build_sec = time.time() - t0

    calls: list[int | None] = []
    real = LakeTable._load_manifest
    LakeTable._load_manifest = (  # type: ignore[method-assign]
        lambda self, version=None: calls.append(version) or real(self, version)
    )
    try:
        probe_at = real(t, 5)["committed_at"]  # deep: near the chain root
        t0 = time.time()
        v = t.version_as_of(probe_at)
        asof_sec = time.time() - t0
        assert v == 5, v
        asof_loads = len(calls)
        assert asof_loads <= 2, f"version_as_of loaded {asof_loads} manifests"

        t.create_branch("pub")
        tb = LakeTable(None, t.root, n_buckets=4, branch="pub")
        for _ in range(3):
            meta_commit(tb)
        calls.clear()
        t0 = time.time()
        head = t.fast_forward("pub")
        ff_sec = time.time() - t0
        assert head == tb.current_version()
        ff_loads = len(calls)
        assert ff_loads <= 2, f"fast_forward loaded {ff_loads} manifests"
    finally:
        LakeTable._load_manifest = real  # type: ignore[method-assign]
    shutil.rmtree(workdir, ignore_errors=True)
    return {
        "metric": "chain_probe",
        "commits": commits,
        "build_sec": round(build_sec, 2),
        "version_as_of_loads": asof_loads,
        "version_as_of_sec": round(asof_sec, 4),
        "fast_forward_loads": ff_loads,
        "fast_forward_sec": round(ff_sec, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain-probe", action="store_true",
                    help="run ONLY the metadata chain-log probe (no Spark)")
    ap.add_argument("--chain-commits", type=int, default=1000)
    ap.add_argument("--events", type=int, default=50_000_000)
    ap.add_argument("--commits", type=int, default=200)
    ap.add_argument("--nb", type=int, default=256)
    ap.add_argument("--workdir", default="/dev/shm/gcspark_stress")
    ap.add_argument("--lineage-every", type=int, default=20)
    ap.add_argument("--gc-every", type=int, default=25)
    ap.add_argument("--keep-last", type=int, default=4)
    ap.add_argument("--mor-max-deltas", type=int, default=16)
    args = ap.parse_args()

    if args.chain_probe:
        print(json.dumps(chain_probe(
            args.chain_commits, os.path.join(args.workdir, "chainprobe")
        )))
        return

    per_batch = args.events // args.commits
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "stress_last_run.jsonl",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)
    spark = get_spark("stress", master=f"local[{cpus}]", shuffle_partitions=min(cpus * 2, 64))
    table = LakeTable(
        spark,
        os.path.join(args.workdir, "table"),
        n_buckets=args.nb,
        merge_mode="auto",
        mor_max_deltas=args.mor_max_deltas,
    )
    # key space sized so the table keeps growing the whole run (realistic
    # CDC: mixed inserts + updates, Zipf-hot conversations). The raw
    # generator's zipf(1.4) concentrates on a few thousand conversations,
    # which would cap the table at ~1e5 rows; the stress remaps 80% of
    # events to a UNIFORM conversation draw so the table reaches the
    # tens-of-millions-of-rows regime while keeping a Zipf-hot 20% (skew
    # still present, growth realistic for an expanding corpus).
    spec = FeedSpec(
        n_convs=2_000_000,
        max_turns=10,
        n_batches=args.commits,
        events_per_batch=per_batch,
        seed=9,
        with_version_hash=False,
    )

    import numpy as np

    def gen(b: int):
        pdf = generate_batch(spec, b)
        rng = np.random.default_rng(7_777_777 + b)
        n = len(pdf)
        uni = rng.integers(0, spec.n_convs, n)
        mask = rng.random(n) < 0.8
        old = pdf["conv_id"].str.slice(4).astype(int).to_numpy()
        conv = np.where(mask, uni, old)
        pdf["conv_id"] = np.char.add(
            "conv", np.char.zfill(conv.astype(str), 8)
        )
        return pdf

    rows_log: list[dict] = []
    t_run0 = time.time()
    applied_events = 0
    with open(out_path, "w") as out:
        for b in range(args.commits):
            t_gen0 = time.time()
            pdf = gen(b)
            gen_sec = time.time() - t_gen0

            t0 = time.time()
            df = spark.createDataFrame(pdf)
            res = apply_batch(table, df, f"stress-{b:04d}")
            commit_sec = time.time() - t0
            applied_events += len(pdf)

            m = table._load_manifest()
            mp = table._meta_path(m["version"])
            deltas = m.get("deltas", {})
            depths = [len(v) for v in deltas.values()] or [0]
            meta_dir = os.path.join(table.root, "_meta")
            n_segments = sum(
                1 for f in os.listdir(meta_dir) if f.startswith("batchseg-")
            )
            rec = {
                "commit": b,
                "version": m["version"],
                "mode": res.get("mode"),
                "events": len(pdf),
                "gen_sec": round(gen_sec, 3),
                "commit_sec": round(commit_sec, 3),
                "manifest_bytes": os.path.getsize(mp),
                "inline_tail": len(m.get("applied_batches", [])),
                "n_segments": n_segments,
                "delta_depth_max": max(depths),
                "delta_depth_mean": round(sum(depths) / len(depths), 2),
            }
            if args.lineage_every and b % args.lineage_every == args.lineage_every - 1:
                t0 = time.time()
                n_lineage = table.lineage().count()
                rec["lineage_sec"] = round(time.time() - t0, 3)
                rec["lineage_rows"] = n_lineage
            if args.gc_every and b % args.gc_every == args.gc_every - 1:
                t0 = time.time()
                removed = table.expire_snapshots(keep_last=args.keep_last, grace_sec=0)
                rec["gc_sec"] = round(time.time() - t0, 3)
                rec["gc_removed"] = removed
                rec["disk_bytes"] = du_bytes(table.root)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            rows_log.append(rec)
            if b % 10 == 9:
                el = time.time() - t_run0
                print(
                    f"[{b+1}/{args.commits}] {applied_events:,} events "
                    f"{el:.0f}s mode={rec['mode']} manifest={rec['manifest_bytes']}B "
                    f"depth={rec['delta_depth_max']} segs={rec['n_segments']}",
                    flush=True,
                )

    # final integrity + read check
    t0 = time.time()
    final_rows = table.read().count()
    read_sec = time.time() - t0
    v = table.verify()
    t0 = time.time()
    n_lineage = table.lineage().count()
    lineage_sec = time.time() - t0

    elapsed = time.time() - t_run0
    man_bytes = [r["manifest_bytes"] for r in rows_log]
    commit_secs = sorted(r["commit_sec"] for r in rows_log)
    lineage_samples = [
        (r["commit"], r["lineage_sec"]) for r in rows_log if "lineage_sec" in r
    ]
    summary = {
        "metric": "scale-stress: manifest/lineage/delta growth over commits",
        "events": applied_events,
        "commits": args.commits,
        "n_buckets": args.nb,
        "elapsed_sec": round(elapsed, 1),
        "events_per_sec": round(applied_events / elapsed, 1),
        "final_rows": final_rows,
        "final_read_sec": round(read_sec, 2),
        "verify_ok": v["ok"],
        "manifest_bytes_first10_mean": round(sum(man_bytes[:10]) / 10),
        "manifest_bytes_last10_mean": round(sum(man_bytes[-10:]) / 10),
        "commit_sec_p50": round(commit_secs[len(commit_secs) // 2], 3),
        "commit_sec_p95": round(commit_secs[int(len(commit_secs) * 0.95)], 3),
        "lineage_sec_first": lineage_samples[0][1] if lineage_samples else None,
        "lineage_sec_last": round(lineage_sec, 3),
        "lineage_rows_final": n_lineage,
        "delta_depth_max_overall": max(r["delta_depth_max"] for r in rows_log),
        "modes": {
            m: sum(1 for r in rows_log if r["mode"] == m)
            for m in {r["mode"] for r in rows_log}
        },
        "per_commit_log": out_path,
    }
    print(json.dumps(summary))
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
