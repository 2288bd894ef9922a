"""Isolate the merge kernel's component costs on the bench CDC batch
(guide §1.4: noop sink; §1.5: labeled jobs). Times, per variant:

  decode_all    full-width scan of the batch -> noop (the decode floor)
  decode_keys   keys+order only -> noop
  lww_window    window dedup of the batch -> noop
  lww_max_by    max_by dedup -> noop
  lww_2pass     small-row winner agg + broadcast semi-join + tiny dedup -> noop

Run in a fresh subprocess per variant list; env GCSPARK_VARIANTS picks.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gamechanger_data_spark.datagen import FeedSpec, write_feed
from gamechanger_data_spark.operators.lww import lww_max_by, lww_window
from gamechanger_data_spark.session import get_spark
from gamechanger_data_spark.sources.feed import read_batch


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    epb = int(os.environ.get("GCSPARK_BENCH_EVENTS_PER_BATCH", "3000000"))
    spark = get_spark(
        "gcspark-kernels",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
            **(
                {"spark.driver.extraJavaOptions": os.environ["GCSPARK_JAVAOPTS"]}
                if os.environ.get("GCSPARK_JAVAOPTS")
                else {}
            ),
        },
    )

    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else "/tmp"
    workdir = f"{base}/gcspark_kern_{os.getpid()}"
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    spec = FeedSpec(
        n_convs=max(200, epb // 50), max_turns=50, n_batches=1,
        events_per_batch=epb, seed=42, with_version_hash=False,
    )
    feed = os.path.join(workdir, "feed")
    write_feed(feed, spec, parts_per_batch=32)
    d = os.path.join(feed, sorted(os.listdir(feed))[0])

    keys = ("conv_id", "turn_idx")
    order = ("ts", "event_seq")

    def build(variant):
        ev = read_batch(spark, d)
        if variant == "decode_all":
            return ev
        if variant == "decode_keys":
            return ev.select(*keys, *order)
        if variant == "lww_window":
            return lww_window(ev, keys, order)
        if variant == "lww_max_by":
            return lww_max_by(ev, keys, order)
        if variant == "lww_2pass":
            win = (
                ev.groupBy(*keys)
                .agg(F.max(F.struct(*order)).alias("__w"))
                .select(*keys, "__w.*")
            )
            cand = ev.join(F.broadcast(win), on=[*keys, *order], how="left_semi")
            # exact-duplicate rows share (keys, order): tiny final dedup
            return lww_max_by(cand, keys, order)
        raise ValueError(variant)

    variants = (os.environ.get(
        "GCSPARK_VARIANTS",
        "decode_all,decode_keys,lww_window,lww_max_by,lww_2pass")
    ).split(",")

    out = {}
    for v in variants:
        noop(build(v))  # warm
        runs = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"kernel:{v}")
            t0 = time.perf_counter()
            noop(build(v))
            runs.append(round(time.perf_counter() - t0, 3))
        out[v] = sorted(runs)[1]
        out[f"{v}_runs"] = runs
    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
