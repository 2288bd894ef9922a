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
# queries(), so ordering is part of the contract. Round-5 rotation goal:
# retire the single-evidence tail COMPLETELY — after this round every
# catalog query is hash-green in >=2 driver rounds. _HEAD front-loads
# (a) the 10 queries with exactly ONE driver green (3 similarity-family
# entries last checked in round 2 + the 7 round-4-new entries),
# (b) the 4 round-5-new queries (timestamp time travel, predicate
# delete/update, widening+rename schema evolution),
# (c) the 35 STALEST double-green queries — 26 last checked in round 2,
# 6 in [r1,r3], 3 replay-machinery in [r2,r3] — which get a third
# confirmation, and (d) the pinned flagship replay — 10+4+35+1 = exactly
# 50 (asserted below). Everything displaced is green in rounds 3+4 (or
# three rounds already), and EVERY catalog entry stays green in the
# local mirror (tools/check_oracles.py runs all of them).
_HEAD = [
    # single driver green only (r2): the similarity-family tail
    "ann_lsh_multiprobe", "dedup_minhash_verified", "embedding_neardup_lsh",
    # single driver green only (r4-new) — second confirmation
    "date_extraction", "approx_distinct_users", "weighted_sample",
    "cms_heavy_hitters", "interval_bucket_join", "length_strata",
    "key_skew_audit",
    # round-5 new: as-of time travel, predicate DML, schema evolution
    "replay_as_of", "delete_where_rewrite", "update_where_rewrite",
    "replay_schema_evolution",
    # stalest double-green (last checked round 2) — third confirmation
    "ann_lsh_bucketed", "ann_topk_cosine", "case_insensitive_dedup",
    "dedup_exact", "dedup_jaccard_query", "dedup_minhash_lsh",
    "dedup_simhash", "defaulting_projection", "derived_key_join",
    "dict_hash_contract", "doc_fingerprint", "embedding_neardup",
    "es_publish_projection", "lang_id_heuristic", "min_length_gate",
    "op_type_counters", "producer_filter", "quality_score",
    "sha256_surrogate_key", "stopword_ratio", "suffix_rename_project",
    "text_normalize_chain", "token_count_bpe", "top10_keywords",
    "topk_per_group", "tpch_q1_pricing_summary",
    # double-green with a round-2/3-era gap ([r1,r3] and [r2,r3])
    "alias_resolution", "pivot_value_by_status", "ref_count_map",
    "rollup_order_counts", "tumbling_window_counts", "turn_renumber",
    "replay_changelog", "replay_lineage_counts", "replay_time_travel",
    # flagship engine machinery — pinned in-window every round
    "transcript_replay",
]
_TAIL = [
    # most-checked queries (triple-green, or green in both r3 and r4),
    # redundantly covered by in-window entries of the same operator family
    "lww_latest_max_by", "lww_latest_salted", "revoke_by_absence",
    "hash_anti_join_dedup", "dim_lookup_join", "cdc_apply_events",
    "lww_latest_window", "window_max_distinct", "groupwise_max_join",
    "minmax_ingest_dates", "staleness_filter", "title_truncate",
    "word_count", "distinct_union", "collect_set_sorted",
]


def _ordered_catalog():
    from gamechanger_data_spark.plans.catalog import CATALOG

    # A typo'd/renamed entry here would silently demote a query out of the
    # driver's first-50 correctness window — fail loudly instead.
    unknown = [k for k in _HEAD + _TAIL if k not in CATALOG]
    assert not unknown, f"ordering names not in CATALOG: {unknown}"
    # the driver checks exactly the first 50; the flagship pin marks the
    # window boundary — a miscounted rotation edit fails loudly here
    assert _HEAD[49] == "transcript_replay", (
        f"50-query window boundary moved: position 50 is {_HEAD[49]!r}"
    )
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
