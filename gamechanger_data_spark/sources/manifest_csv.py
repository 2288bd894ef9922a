"""Explicit change-manifest CSV source.

Reference: a CSV with a `Process ∈ {Insert, Delete, Update}` column drives
insert+delete runs (dataPipelines/gc_ingest/pipelines/core/configs.py:
593-632 — pandas `df[df.Process == ...]`). Spark-first: schema-first CSV
read; the op split is a filter the optimizer pushes into the scan; ops map
onto the engine's change-event `op` column so a manifest IS a change feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Process", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_OP_MAP = {"Insert": "insert", "Update": "update", "Delete": "delete"}


def read_manifest_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV manifest -> change-event-shaped frame (op lower-cased onto the
    engine vocabulary; unknown Process values, missing columns, and
    unparseable cells are rejected loudly rather than silently dropped).

    Columns are bound BY NAME: an explicit-schema CSV read binds by
    POSITION (the header is only skipped), so a manifest with reordered or
    extra columns would silently mis-assign fields. Here the header drives
    the mapping and the typed casts are validated per row."""
    raw = spark.read.option("header", "true").csv(path)  # all-string, by name
    missing = [f.name for f in MANIFEST_CSV_SCHEMA.fields if f.name not in raw.columns]
    if missing:
        raise ValueError(f"manifest CSV missing columns {missing} at {path}")
    # try_cast, not cast: ANSI mode (Spark 4 default) would throw inside
    # the cast with a generic CAST_INVALID_INPUT before the guard below can
    # attach the row context; try_cast nulls the bad cell and the guard
    # raises the contract's own error with the offending conv_id.
    typed = raw.select(
        *[
            F.col(f.name).try_cast(f.dataType).alias(f.name)
            for f in MANIFEST_CSV_SCHEMA.fields
        ],
        F.col("turn_idx").alias("__raw_turn_idx"),
        F.col("ts").alias("__raw_ts"),
    )
    op = F.element_at(
        F.create_map(*[F.lit(x) for kv in _OP_MAP.items() for x in kv]),
        F.col("Process"),
    )
    # Loud failure on unparseable typed cells (PERMISSIVE casts null them)
    # and unknown Process values. The guard is a FILTER, not a projected
    # column: a projected guard is column-pruned away when a consumer never
    # materializes that column (e.g. selects only op/conv_id), silently
    # passing the bad rows the function promises to reject. A where-clause
    # runs regardless of which columns the consumer selects.
    bad = (
        (F.col("turn_idx").isNull() & F.col("__raw_turn_idx").isNotNull())
        | (F.col("ts").isNull() & F.col("__raw_ts").isNotNull())
        | op.isNull()
    )
    typed = typed.where(
        F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("bad manifest row (unparseable cell or unknown "
                          "Process) for conv_id="),
                    F.coalesce(F.col("conv_id"), F.lit("<null>")),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    ).drop("__raw_turn_idx", "__raw_ts")
    return typed.select(op.alias("op"), "conv_id", "turn_idx", "ts")


def split_ops(manifest: DataFrame) -> dict[str, DataFrame]:
    """The reference's Insert/Delete split as pushdown-friendly filters."""
    return {
        op: manifest.filter(F.col("op") == op) for op in ("insert", "update", "delete")
    }
