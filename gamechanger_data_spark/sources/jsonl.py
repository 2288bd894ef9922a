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

    Implementation: ``text`` source + ``from_json`` (with an in-struct
    corrupt-record field) instead of the JSON reader's PERMISSIVE
    corrupt-record column — the reader-level corrupt column makes the plan
    shape unsupported without caching the whole batch
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and that cache
    workaround leaked one pinned batch per call on a long-running driver.
    Here both sides derive from one uncached text scan.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    parsed = spark.read.text(path).select(
        "value",
        F.from_json(
            "value", full, {"columnNameOfCorruptRecord": corrupt_col}
        ).alias("__p"),
    )
    bad = F.col("__p").isNull() | F.col(f"__p.{corrupt_col}").isNotNull()
    clean = parsed.filter(~bad).select("__p.*").drop(corrupt_col)
    corrupt = parsed.filter(bad & (F.trim("value") != "")).select(
        F.col("value").alias("raw_line")
    )
    return clean, corrupt


def write_jsonl(df: DataFrame, path: str) -> None:
    """Emit a feed batch as JSONL (round-trip used by tests)."""
    df.write.mode("overwrite").json(path)
