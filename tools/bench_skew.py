"""Hot-key skew microbench: measures the three LWW physical strategies on
a deliberately skewed change batch (one conversation owning ~40% of the
events — the north rule's hot-conversation case) and prints one JSON line.

    python tools/bench_skew.py [n_events] [hot_frac_pct]

What it demonstrates (recorded in BENCH/BASELINE.md):
  * ``window`` (row_number over the raw key shuffle) lands the hot key's
    entire row set in ONE reducer task — the straggler the north rule
    warns about;
  * ``salted`` (explicit two-phase: window per (key, salt) then a final
    window over per-salt winners) caps any task at 1/salt_buckets of the
    hot key — the skew fix when a sort-based plan is required;
  * ``max_by`` (hash aggregate) pre-reduces every map partition to one
    row per key BEFORE the shuffle, so the reducer sees #partitions rows
    for the hot key no matter how many events it had — skew-immune by
    construction (why it is merge()'s adversarial-feed strategy).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gamechanger_data_spark.operators.lww import lww_max_by, lww_salted, lww_window
from gamechanger_data_spark.session import get_spark


def skewed_events(spark, n: int, hot_frac: float):
    """Deterministic skewed batch: ids [0, n); ``hot_frac`` of rows map to
    one hot key, the rest spread over n/200 cold keys."""
    cut = int(100 * hot_frac)
    hot = F.pmod("id", F.lit(100)) < cut
    return (
        spark.range(n)
        .select(
            F.when(hot, F.lit("conv-hot"))
            .otherwise(F.concat(F.lit("conv-"), F.pmod("id", F.lit(max(2, n // 200))).cast("string")))
            .alias("conv_id"),
            # the hot conversation's events all hit ONE (conv_id, turn_idx)
            # key — the single-reducer straggler case the salt defeats
            F.when(hot, F.lit(0))
            .otherwise(F.pmod("id", F.lit(7)))
            .cast("int")
            .alias("turn_idx"),
            F.col("id").alias("event_seq"),
            (F.col("id") % 1_000_003).alias("ts"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
    )


def run(n: int = 8_000_000, hot_frac: float = 0.4) -> dict:
    spark = get_spark("bench-skew", master="local[8]", shuffle_partitions=8)
    ev = skewed_events(spark, n, hot_frac)
    ev.write.mode("overwrite").parquet("/dev/shm/gcspark_skew_bench")
    src = spark.read.parquet("/dev/shm/gcspark_skew_bench")
    keys, order = ("conv_id", "turn_idx"), ("ts", "event_seq")
    strategies = {
        "window": lambda d: lww_window(d, keys, order),
        "salted": lambda d: lww_salted(d, keys, order, salt_buckets=8),
        "max_by": lambda d: lww_max_by(d, keys, order),
    }
    out: dict = {"n_events": n, "hot_frac": hot_frac, "strategies": {}}
    expected = None

    def measure(label, fn):
        nonlocal expected
        fn(src).count()  # warm codegen/IO once per strategy
        t0 = time.monotonic()
        got = fn(src).count()
        out["strategies"][label] = round(time.monotonic() - t0, 3)
        expected = expected if expected is not None else got
        assert got == expected, f"{label} row count {got} != {expected}"

    for name, fn in strategies.items():
        measure(name, fn)
    # Spark 4's partial WindowGroupLimit pre-reduces each map task to its
    # local top-1 per key BEFORE the shuffle, which already defuses the
    # hot-key straggler for the rn=1 pattern. Disable it to measure the
    # regime the salt was built for: engines without the rewrite, or
    # full-ranking windows where a partial limit cannot apply.
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    try:
        measure("window_no_partial_limit", strategies["window"])
        measure("salted_no_partial_limit", strategies["salted"])
    finally:
        spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
    out["rows_out"] = expected
    spark.stop()
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    hf = float(sys.argv[2]) / 100 if len(sys.argv) > 2 else 0.4
    print(json.dumps(run(n, hf)))
