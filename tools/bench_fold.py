"""CoW-fold data-term evidence: fold latency must be linear in TOUCHED
bytes, independent of table size.

The round-4 scale-stress showed flat CoW fold latency, but only because
shuffle overhead still dominated at 17M rows — the data term had never
been made to dominate. This bench isolates it:

  * build a table at several resident sizes (N, 2N, 4N rows; NB fixed),
  * at each size, force CoW merges whose batches are RESTRICTED to k of
    the NB buckets (k swept over e.g. 8 / 64 / 256) with batch size
    fixed, and
  * record fold wall time against the touched buckets' resident bytes
    (from the pinned pre-merge manifest).

Linear-in-touched-data means: at fixed table size, time grows ~k; at
fixed k, time grows with per-bucket bytes (table size / NB) — and the
fitted sec-per-touched-GB stays roughly constant across BOTH axes. If
sec/GB grows with TABLE size at fixed touched bytes, the fold is paying
for untouched data (the bug this bench exists to catch).

Usage: python tools/bench_fold.py [--base-rows 8000000] [--doublings 2]
       [--nb 256] [--probe-events 250000] [--ks 8,64,256]
Writes one JSON line per probe to BENCH/fold_last_run.jsonl and a
summary table to stdout; BENCH/BASELINE.md curates results by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from gamechanger_data_spark.session import get_spark  # noqa: E402
from gamechanger_data_spark.sinks.table import LakeTable  # noqa: E402

SEQ_STRIDE = 10_000_000


def make_events(b: int, n: int, conv_lo: int, conv_hi: int, text_rep: int) -> pd.DataFrame:
    """n update events over conv ids uniform in [conv_lo, conv_hi) x 8 turns,
    with a payload sized by text_rep (bigger payload -> the data term, not
    fixed per-row overhead, dominates the fold)."""
    rng = np.random.default_rng(1_000_003 * (b + 1))
    conv = rng.integers(conv_lo, conv_hi, n)
    seq = (np.int64(b) * SEQ_STRIDE + np.arange(n)).astype(np.int64)
    return pd.DataFrame(
        {
            "op": "update",
            "conv_id": np.char.add("conv", np.char.zfill(conv.astype(str), 8)),
            "turn_idx": rng.integers(0, 8, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(seq, unit="us"),
            "event_seq": seq,
            "text": np.char.add("payload-" * text_rep, seq.astype(str)),
        }
    )


def bucket_bytes(table: LakeTable, buckets: list[int]) -> int:
    """Resident bytes of the named buckets at the current manifest."""
    m = table._load_manifest()
    total = 0
    for b in buckets:
        for src in (m["files"], m.get("deltas", {})):
            for p in src.get(str(b), []):
                try:
                    total += os.path.getsize(os.path.join(table.root, p))
                except OSError:
                    pass
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-rows", type=int, default=8_000_000)
    ap.add_argument("--doublings", type=int, default=2)
    ap.add_argument("--nb", type=int, default=256)
    ap.add_argument("--probe-events", type=int, default=250_000)
    ap.add_argument("--ks", default="8,64,256")
    ap.add_argument("--text-rep", type=int, default=8)
    ap.add_argument("--workdir", default="/dev/shm/gcspark_fold")
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "fold", master=f"local[{cpus}]", shuffle_partitions=min(cpus * 2, 64)
    )
    shutil.rmtree(args.workdir, ignore_errors=True)
    table = LakeTable(
        spark, os.path.join(args.workdir, "table"), n_buckets=args.nb
    )

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "fold_last_run.jsonl",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    out = open(out_path, "w")

    # the probe batch is restricted to buckets < k by FILTERING a
    # candidate pool on the table's own bucket expression (no python
    # reimplementation of xxhash64 to drift)
    from pyspark.sql import functions as F

    def probe_batch(b_idx: int, k: int, conv_hi: int):
        # oversample so enough candidates survive the bucket filter
        factor = max(2, (args.nb // k) * 2)
        pdf = make_events(
            1000 + b_idx, args.probe_events * factor, 0, conv_hi, args.text_rep
        )
        df = spark.createDataFrame(pdf)
        sch = table.schema()
        bexpr = table._bucket_expr(schema=sch if sch is not None else df.schema)
        return (
            df.filter(bexpr.cast("int") < k)
            .limit(args.probe_events)
            .localCheckpoint()  # freeze: the merge must not re-run the filter
        )

    summary = []
    conv_hi = args.base_rows // 6  # ~6 resident turns per conv on average
    rows_target = args.base_rows
    grow_batch = 0
    probe_i = 0
    for size_step in range(args.doublings + 1):
        # ---- grow the table to rows_target with fresh inserts ----
        while True:
            resident = sum(
                int(c)
                for c in table._load_manifest().get("base_rows", {}).values()
            )
            if resident >= rows_target:
                break
            n = min(2_000_000, max(500_000, rows_target - resident))
            pdf = make_events(grow_batch, n, 0, conv_hi, args.text_rep)
            t0 = time.time()
            table.merge(
                spark.createDataFrame(pdf),
                f"grow-{grow_batch:04d}",
                mode="cow",
                src_rows=n,
            )
            print(
                f"[grow] resident~{resident:,} +{n:,} in "
                f"{time.time()-t0:.1f}s", flush=True,
            )
            grow_batch += 1
        table_rows = sum(
            int(c) for c in table._load_manifest().get("base_rows", {}).values()
        )
        table_bytes = bucket_bytes(table, list(range(args.nb)))

        # ---- probe: fixed-size CoW folds touching k buckets ----
        for k in ks:
            src = probe_batch(probe_i, k, conv_hi)
            touched = list(range(k))
            tb = bucket_bytes(table, touched)
            t0 = time.time()
            r = table.merge(
                src,
                f"probe-{probe_i:04d}",
                mode="cow",
                touched=touched,
                src_rows=args.probe_events,
            )
            sec = time.time() - t0
            rec = {
                "table_rows": table_rows,
                "table_gb": round(table_bytes / 1e9, 3),
                "k_buckets": k,
                "touched_gb": round(tb / 1e9, 4),
                "probe_events": args.probe_events,
                "fold_sec": round(sec, 2),
                "sec_per_touched_gb": round(sec / max(tb / 1e9, 1e-9), 2),
                "mode": r["mode"],
                "attempts": r.get("attempts"),
            }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            summary.append(rec)
            print(f"[probe] {rec}", flush=True)
            probe_i += 1
        rows_target *= 2
        conv_hi *= 2

    out.close()
    v = table.verify()
    print(json.dumps({
        "metric": "CoW fold latency vs touched bytes",
        "nb": args.nb,
        "verify_ok": v["ok"],
        "probes": summary,
    }))
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
