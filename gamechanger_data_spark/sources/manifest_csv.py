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
    engine vocabulary; unknown Process values are rejected loudly rather
    than silently dropped)."""
    raw = spark.read.schema(MANIFEST_CSV_SCHEMA).option("header", "true").csv(path)
    op = F.element_at(
        F.create_map(*[F.lit(x) for kv in _OP_MAP.items() for x in kv]),
        F.col("Process"),
    )
    return raw.select(
        op.alias("op"), "conv_id", "turn_idx", "ts"
    ).withColumn("op", F.coalesce(F.col("op"), F.raise_error(
        F.concat(F.lit("unknown manifest Process for conv_id="), F.col("conv_id")))))


def split_ops(manifest: DataFrame) -> dict[str, DataFrame]:
    """The reference's Insert/Delete split as pushdown-friendly filters."""
    return {
        op: manifest.filter(F.col("op") == op) for op in ("insert", "update", "delete")
    }
