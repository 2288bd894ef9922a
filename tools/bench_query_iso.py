"""Isolate headline queries with the noop sink (guide §1.4) and dump
.explain('formatted') per query (guide §7.2). Writes plans to
plans/r08/<query>_<tag>.txt when GCSPARK_PLAN_TAG is set; prints one JSON
line of per-query noop-median seconds.

Env: SPARK_GRAFT_SF_DIR (default sf1.0), SPARK_GRAFT_CPUS,
GCSPARK_QUERIES (csv; default the 8 headline queries), GCSPARK_PLAN_TAG.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = os.environ.get("GCSPARK_QUERIES")
    names = names.split(",") if names else HEADLINE
    tag = os.environ.get("GCSPARK_PLAN_TAG")

    from gamechanger_data_spark.plans.catalog import CATALOG
    from gamechanger_data_spark.session import get_spark

    spark = get_spark(
        "gcspark-queryiso",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g")},
    )

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "plans", "r08")
    if tag:
        os.makedirs(plan_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = CATALOG[name].fn
        df = fn(spark, sf_dir)
        if tag:
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
        # warm then 3 timed noop runs, fresh plan each
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"iso:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        out[name] = sorted(runs)[1]
        out[f"{name}_runs"] = runs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
