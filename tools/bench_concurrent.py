"""Concurrent-writer throughput evidence for the round-4 CAS commit path.

Applies the same 16 MOR trickle batches to one LakeTable root
sequentially (1 writer) and concurrently (4 writer threads, each its own
LakeTable instance), asserting identical final state both times, and
reports wall time, per-merge latency, and the measured commit
critical-section (lock-held) time. MOR delta appends commute under LWW,
so concurrent writers rebase on CAS conflicts instead of re-running —
the expected win is overlap of the data-write phase, with only the
O(manifest) swap serialized.

Usage: python tools/bench_concurrent.py [--batches 16] [--threads 4]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from gamechanger_data_spark.session import get_spark  # noqa: E402
from gamechanger_data_spark.sinks import table as table_mod  # noqa: E402
from gamechanger_data_spark.sinks.table import LakeTable  # noqa: E402


def make_batch(b: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(4_242 + b)
    conv = np.char.add("conv", np.char.zfill(rng.integers(0, 200_000, n).astype(str), 8))
    seq = (np.int64(b) * 10_000_000 + np.arange(n)).astype(np.int64)
    return pd.DataFrame(
        {
            "op": np.where(rng.random(n) < 0.05, "delete", "update"),
            "conv_id": conv,
            "turn_idx": rng.integers(0, 8, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(seq, unit="us"),
            "event_seq": seq,
            "text": np.char.add("payload-", seq.astype(str)),
        }
    )


# lock-HELD time (inside the flock critical section, excluding queue
# wait) and total commit time (wait + held) are measured separately —
# conflating them would report other writers' held-times as this
# writer's "critical section"
LOCK_HELD: list[float] = []
COMMIT_TOTAL: list[float] = []
_orig_commit = LakeTable._commit
_orig_lock = LakeTable._commit_lock


def _timed_lock(self):
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        with _orig_lock(self):
            t0 = time.time()
            try:
                yield
            finally:
                LOCK_HELD.append(time.time() - t0)

    return _cm()


def _timed_commit(self, manifest, expected_parent=None):
    t0 = time.time()
    try:
        return _orig_commit(self, manifest, expected_parent)
    finally:
        COMMIT_TOTAL.append(time.time() - t0)


def run(
    spark, root: str, batches: list[pd.DataFrame], threads: int,
    merge_mode: str = "mor",
) -> dict:
    shutil.rmtree(root, ignore_errors=True)
    seed_t = LakeTable(spark, root, n_buckets=32)
    seed_t.merge(
        spark.createDataFrame(make_batch(999, 50_000)), "seed", mode="cow"
    )
    LOCK_HELD.clear()
    COMMIT_TOTAL.clear()
    t0 = time.time()

    def apply_one(i: int):
        # one instance per writer thread (the documented sharing contract);
        # a merge that exhausts its bounded retries aborts with
        # CommitConflictError — the caller re-runs it (counted), which is
        # the documented recovery and must preserve exactly-once
        t = LakeTable(spark, root, n_buckets=32)
        ta = time.time()
        aborts = 0
        while True:
            try:
                r = t.merge(
                    spark.createDataFrame(batches[i]), f"b{i}", mode=merge_mode
                )
                break
            except table_mod.CommitConflictError:
                aborts += 1
        return time.time() - ta, r, aborts

    if threads == 1:
        results = [apply_one(i) for i in range(len(batches))]
    else:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            results = list(ex.map(apply_one, range(len(batches))))
    wall = time.time() - t0
    assert all(not r["skipped"] for _, r, _ in results)
    final = LakeTable(spark, root, n_buckets=32)
    assert len(final.applied_batches()) == len(batches) + 1
    state_hash = (
        final.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()[["conv_id", "turn_idx", "event_seq"]]
        .apply(tuple, axis=1)
        .tolist()
    )
    lat = sorted(d for d, _, _ in results)
    held = sorted(LOCK_HELD)
    total = sorted(COMMIT_TOTAL)
    # contention accounting: each whole-op attempt re-does the data work,
    # each rebase absorbs a CAS loss for only a manifest re-layer, each
    # abort burned MAX_MERGE_ATTEMPTS attempts before the caller re-ran
    n = len(batches)
    attempts = sum(r["attempts"] for _, r, _ in results)
    rebases = sum(r.get("rebases", 0) for _, r, _ in results)
    aborts = sum(a for _, _, a in results)
    attempts_total = attempts + aborts * table_mod.MAX_MERGE_ATTEMPTS
    return {
        "wall_sec": round(wall, 2),
        "merge_p50_sec": round(lat[len(lat) // 2], 3),
        "merge_max_sec": round(lat[-1], 3),
        "lock_held_p50_ms": round(held[len(held) // 2] * 1000, 1),
        "lock_held_max_ms": round(held[-1] * 1000, 1),
        "commit_incl_wait_p50_ms": round(total[len(total) // 2] * 1000, 1),
        "commit_incl_wait_max_ms": round(total[-1] * 1000, 1),
        "whole_op_attempts": attempts_total,
        "retries": attempts_total - n,
        "rebases": rebases,
        "aborts": aborts,
        "useful_work_frac": round(n / attempts_total, 3),
        "rows": len(state_hash),
        "_state": state_hash,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument(
        "--mode", default="mor", choices=("mor", "cow"),
        help="mor: trickle deltas (rebase path); cow: dense overlapping "
        "bucket rewrites (worst-case whole-op-retry contention)",
    )
    ap.add_argument("--workdir", default="/dev/shm/gcspark_conc")
    args = ap.parse_args()

    LakeTable._commit = _timed_commit
    LakeTable._commit_lock = _timed_lock
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("conc", master=f"local[{cpus}]", shuffle_partitions=32)
    batches = [make_batch(b, args.events) for b in range(args.batches)]

    seq = run(
        spark, os.path.join(args.workdir, "seq"), batches, threads=1,
        merge_mode=args.mode,
    )
    par = run(
        spark, os.path.join(args.workdir, "par"), batches, args.threads,
        merge_mode=args.mode,
    )
    assert seq.pop("_state") == par.pop("_state"), "final states diverge"

    out = {
        "metric": f"concurrent-writer {args.mode.upper()} merge throughput "
                  f"(same {args.batches} batches)",
        "events": args.batches * args.events,
        "threads": args.threads,
        "sequential": seq,
        "concurrent": par,
        "speedup": round(seq["wall_sec"] / par["wall_sec"], 2),
        "state_parity": True,
    }
    print(json.dumps(out))
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
