"""JSONL change-feed source — the reference's primary wire format.

Reference: line-by-line JSON parse of crawler output, skipping blank and
corrupt lines (dataPipelines/gc_crawler_status_tracker/
gc_crawler_status_tracker.py:24-37 — `json.loads` per line inside
try/except). Spark-first restatement: schema-first read in PERMISSIVE mode
with a `_corrupt_record` column; corrupt/blank lines are counted (the
reference silently drops them — we surface the count to lineage) and
excluded from the typed stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl_events(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean_events, corrupt_lines).

    clean_events has exactly ``schema``; corrupt_lines carries the raw text
    of undecodable lines for quarantine/lineage (reference drops them
    silently at gc_crawler_status_tracker.py:31-33).
    """
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    # Spark disallows plans whose referenced columns reduce to only the
    # corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD);
    # the documented workaround is caching the parsed batch. Feed batches
    # are micro-batch sized, so this is bounded.
    raw = raw.cache()
    clean = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    corrupt = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, corrupt


def write_jsonl(df: DataFrame, path: str) -> None:
    """Emit a feed batch as JSONL (round-trip used by tests)."""
    df.write.mode("overwrite").json(path)
