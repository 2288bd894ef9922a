"""JDBC table scan — the reference's server-cursor DB scroll, Spark-first.

Reference: SQLAlchemy yield_per(1000) scroll over the snapshot view
(dataPipelines/gc_ingest/tools/snapshot/utils.py:70-79; tools/db/
utils.py:86-93). Spark's JDBC source replaces the single cursor with
partitioned parallel reads: ``partitionColumn/lowerBound/upperBound/
numPartitions`` split the key range across executors, and ``fetchsize``
is the per-connection cursor window (the yield_per analog).

Exercised end-to-end against the Derby embedded database on Spark's own
classpath (tests/test_jdbc.py: round-trip, partitioned range reads, filter
pushdown); on a real deployment it is the same thin pass-through to
``spark.read.format("jdbc")`` with a server's driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 1000,
    **options: str,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
