"""Corpus-pipeline stage timings at sf0.1 — one JSON line.

    python tools/bench_corpus.py [sf_dir]

Times the corpus-level training-data stages (boilerplate scrub, TF-IDF,
unigram surprise, exact+minhash dedup, the composed corpus_prepare
flagship) on the same local[N] protocol bench.py uses. Recorded in
BENCH/BASELINE.md; not part of bench.py's headline set so round-over-
round totals stay comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gamechanger_data_spark.session import get_spark

QUERIES = [
    "boilerplate_scrub",
    "tfidf_topk_terms",
    "unigram_surprise",
    "dedup_exact",
    "dedup_minhash_verified",
    "corpus_prepare",
    "export_shard_checksums",
    "kmeans_embeddings",
    "ann_ivf_topk",
    "kmv_distinct_users",
    "stratified_mixture_sample",
    "content_defined_chunks",
    "chunk_dedup_stats",
    "pack_sequences",
]


def main(sf_dir: str) -> dict:
    from gamechanger_data_spark.plans.catalog import CATALOG

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "bench-corpus", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    out: dict = {"sf_dir": sf_dir, "queries": {}}
    for name in QUERIES:
        fn = CATALOG[name].fn
        fn(spark, sf_dir).count()  # warm IO/codegen
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        out["queries"][name] = {"sec": round(time.monotonic() - t0, 3), "rows": n}
    out["total_sec"] = round(sum(v["sec"] for v in out["queries"].values()), 3)
    spark.stop()
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    print(json.dumps(main(sf)))
