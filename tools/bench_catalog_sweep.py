"""Time every catalog query once (warm session, collect()), sorted slowest
first — the breadth pass of the optimization round (guide §1: measure
first). Not part of the frozen bench contract; evidence for
OPTIMIZATION_r08.md's per-operator checklist.

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
GCSPARK_SWEEP_REPS (default 2: first = cold-plan, second = warm)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("GCSPARK_SWEEP_REPS", "2"))

    import __spark_entry__ as entrymod
    from gamechanger_data_spark.session import get_spark

    spark = get_spark(
        "gcspark-sweep",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g")},
    )
    out = {}
    for name, fn in entrymod.queries().items():
        runs = []
        try:
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                runs.append(round(time.perf_counter() - t0, 3))
        except Exception as e:  # keep sweeping; a failure is the headline
            out[name] = f"ERR {type(e).__name__}: {e}"
            continue
        out[name] = runs
    for name, runs in sorted(
        out.items(), key=lambda kv: -(kv[1][-1] if isinstance(kv[1], list) else 1e9)
    ):
        print(name, runs, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
