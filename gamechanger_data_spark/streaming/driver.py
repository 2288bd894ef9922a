"""CDC apply driver — the engine's end-to-end pipeline.

One batch body (the Spark restatement of the reference's ingest step DAG,
dataPipelines/gc_ingest/pipelines/core/cli.py:77-120):

    events -> normalize text (native expr chain / Arrow UDF)
           -> dedup_hash = sha256(normalized text)
           -> per-partition lineage metrics (offset range + op counts)
           -> LakeTable.merge (LWW dedup + bucket CoW + atomic commit
              carrying the batch-id marker and lineage rows)

Exactly-once: the batch-id commit marker travels INSIDE the same manifest
swap as the data, so replaying a batch after a crash is a no-op — this fixes
the reference's non-atomic checkpoint advance
(dataPipelines/gc_ingest/tools/checkpoint/utils.py:189-191).

Batch mode (`replay_feed`) drives ready-marker-gated directories directly;
streaming mode (`stream_feed`) wraps the same apply body in Structured
Streaming foreachBatch with a checkpointLocation.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gamechanger_data_spark.functions.hashing import dedup_hash_expr
from gamechanger_data_spark.functions.text import normalize_text_expr, normalize_text_udf
from gamechanger_data_spark.sinks.table import LakeTable
from gamechanger_data_spark.sources.feed import list_ready_batches, read_batch, read_feed_stream


def prepare_events(events: DataFrame, use_pandas_udf: bool = False) -> DataFrame:
    """Vectorized normalization + content hash. ``use_pandas_udf`` switches
    the text normalization from the native expression chain (JVM codegen —
    the default hot path) to the Arrow pandas UDF with identical semantics."""
    norm = normalize_text_udf(F.col("text")) if use_pandas_udf else normalize_text_expr("text")
    return events.withColumn("text", norm).withColumn(
        "dedup_hash", dedup_hash_expr(F.col("text"))
    )


def lineage_for(
    events: DataFrame, batch_id: str, table: LakeTable | None = None
) -> tuple[list[dict], list[int] | None]:
    """Per-input-partition lineage: offset (event_seq) range + op counts —
    plus, when ``table`` is given, the set of target buckets this batch
    touches (collect_set of the bucket hash), fused into the SAME pass.

    One small aggregate collected to the driver (≤ #partitions rows) and
    embedded in the same manifest commit as the data (FIXTURES.md §3).

    Runs on the RAW events with only (op, event_seq, key cols) selected —
    parquet column pruning keeps this pass cheap; normalization/hashing must
    not be recomputed here (it halved replay throughput when it was).
    """
    aggs = [
        F.min("event_seq").alias("offset_min"),
        F.max("event_seq").alias("offset_max"),
        F.count("*").alias("rows_in"),
        F.sum(F.when(F.col("op").isin("insert", "update"), 1).otherwise(0)).alias(
            "rows_upserted"
        ),
        F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("rows_deleted"),
        F.sum(F.when(F.col("op") == "revoke", 1).otherwise(0)).alias("rows_revoked"),
    ]
    if table is not None:
        bucket = F.pmod(
            F.xxhash64(*[F.col(c) for c in table.key_cols]), F.lit(table.n_buckets)
        ).cast("int")
        proj = events.select("op", "event_seq", bucket.alias("__b"))
        aggs.append(F.collect_set("__b").alias("__buckets"))
    else:
        proj = events.select("op", "event_seq")

    rows = proj.groupBy(F.spark_partition_id().alias("partition_id")).agg(*aggs).collect()
    touched = (
        sorted({b for r in rows for b in r["__buckets"]}) if table is not None else None
    )
    now = datetime.now(timezone.utc).replace(tzinfo=None).isoformat()
    return touched, [
        {
            "batch_id": batch_id,
            "partition_id": int(r["partition_id"]),
            "offset_min": int(r["offset_min"]) if r["offset_min"] is not None else None,
            "offset_max": int(r["offset_max"]) if r["offset_max"] is not None else None,
            "rows_in": int(r["rows_in"]),
            "rows_upserted": int(r["rows_upserted"]),
            "rows_deleted": int(r["rows_deleted"]),
            "rows_revoked": int(r["rows_revoked"]),
            "applied_at": now,
        }
        for r in rows
    ]


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    batch_id: str,
    use_pandas_udf: bool = False,
    with_lineage: bool = True,
) -> dict:
    """Normalize + hash + merge one micro-batch (idempotent on batch_id)."""
    if batch_id in table.applied_batches():
        return {"skipped": True, "batch_id": batch_id, "version": table.current_version()}
    touched, lineage = (
        lineage_for(events, batch_id, table) if with_lineage else (None, [])
    )
    prepared = prepare_events(events, use_pandas_udf=use_pandas_udf)
    return table.merge(prepared, batch_id, lineage_rows=lineage, touched=touched)


def replay_feed(
    spark: SparkSession,
    feed_root: str,
    table: LakeTable,
    limit: int | None = None,
    use_pandas_udf: bool = False,
    with_lineage: bool = True,
) -> list[dict]:
    """Batch-mode replay of all ready, not-yet-applied batch directories in
    commit order (reference: checkpointed prefix consumption loop,
    checkpoint/utils.py:154-190, with checkpoint-limit)."""
    results = []
    applied = table.applied_batches()
    for batch_id, d in list_ready_batches(feed_root, limit=limit):
        if batch_id in applied:
            results.append({"skipped": True, "batch_id": batch_id})
            continue
        events = read_batch(spark, d)
        results.append(
            apply_batch(table, events, batch_id,
                        use_pandas_udf=use_pandas_udf, with_lineage=with_lineage)
        )
    return results


def stream_feed(
    spark: SparkSession,
    feed_root: str,
    table: LakeTable,
    checkpoint_dir: str,
    schema,
    use_pandas_udf: bool = False,
):
    """Structured Streaming variant: file source -> foreachBatch(apply).

    The file source's offset log (checkpointLocation) provides restart
    positioning; the table's batch-id marker provides exactly-once should the
    same epoch be redelivered after a crash between sink commit and offset
    commit. Returns the started StreamingQuery (caller awaits/stops).
    """
    stream = read_feed_stream(spark, feed_root, schema)

    def _apply(df: DataFrame, epoch_id: int) -> None:
        apply_batch(table, df, batch_id=f"epoch-{epoch_id:08d}",
                    use_pandas_udf=use_pandas_udf)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
