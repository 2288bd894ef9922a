"""gamechanger_data_spark — a brand-new PySpark-native CDC / incremental-ingest
analytics engine with the query and data-processing capabilities of
dod-advana/gamechanger-data, re-expressed Spark-first.

The reference (read-only at /root/reference) is an imperative Python batch ETL
system; this engine replays the same change semantics — a binlog-like feed of
insert / update / delete / revoke events per (conv_id, turn_idx) transcript
turn — through Structured Streaming ``foreachBatch`` into a versioned,
bucket-partitioned lake table with last-writer-wins dedup, exactly-once
batch-id commit markers, schema evolution, snapshots/time travel, and
per-partition lineage.

Layout:
    schema.py            transcript / change-event / manifest StructTypes
    session.py           SparkSession factory (AQE, Arrow, UTC)
    datagen.py           deterministic synthetic CDC feed generator
    functions/           vectorized scalar functions (text, hash, dates, analysis)
    operators/           LWW dedup, CDC merge planning, dedup/similarity suites
    sources/             change-feed source (ready-marker gating, checkpoint)
    sinks/               TableSink: versioned parquet MERGE sink (Iceberg-style)
    streaming/           foreachBatch CDC driver with lineage + exactly-once
    plans/               query catalog used by __spark_entry__ / bench
"""

__version__ = "0.1.0"
