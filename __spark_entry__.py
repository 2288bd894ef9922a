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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops,
    which the driver records as rows-only checks)."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    return {name: spec.sql for name, spec in CATALOG.items() if spec.sql is not None}
