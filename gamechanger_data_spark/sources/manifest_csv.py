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
    typed = raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in MANIFEST_CSV_SCHEMA.fields],
        F.col("turn_idx").alias("__raw_turn_idx"),
        F.col("ts").alias("__raw_ts"),
    )
    # loud failure on unparseable typed cells (PERMISSIVE casts null them)
    bad_cast = (
        (F.col("turn_idx").isNull() & F.col("__raw_turn_idx").isNotNull())
        | (F.col("ts").isNull() & F.col("__raw_ts").isNotNull())
    )
    typed = typed.withColumn(
        "turn_idx",
        F.when(bad_cast, F.raise_error(F.concat(
            F.lit("unparseable manifest cell for conv_id="), F.col("conv_id")
        )).cast("int")).otherwise(F.col("turn_idx")),
    ).drop("__raw_turn_idx", "__raw_ts")
    op = F.element_at(
        F.create_map(*[F.lit(x) for kv in _OP_MAP.items() for x in kv]),
        F.col("Process"),
    )
    return typed.select(
        op.alias("op"), "conv_id", "turn_idx", "ts"
    ).withColumn("op", F.coalesce(F.col("op"), F.raise_error(
        F.concat(F.lit("unknown manifest Process for conv_id="), F.col("conv_id")))))


def split_ops(manifest: DataFrame) -> dict[str, DataFrame]:
    """The reference's Insert/Delete split as pushdown-friendly filters."""
    return {
        op: manifest.filter(F.col("op") == op) for op in ("insert", "update", "delete")
    }
