"""Canonical schemas for the CDC transcript engine.

The transcript target table shape is fixed by BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.  The change-event shape is modeled on the reference's crawler
metadata record (reference: dev_tools/universal_test_harness/data/
crawler_output/us_code_data/Title 1.pdf.metadata:1; fields consumed at
common/document_parser/parsers/policy_analytics/init_doc.py:37-66 and
dataPipelines/gc_crawler_status_tracker/gc_crawler_status_tracker.py:24-37),
restated at transcript-turn grain:

    doc_name          -> conv_id
    page/par index    -> turn_idx
    access_timestamp  -> ts           (event time; LWW major key)
    crawler_used      -> producer     (source shard; filter + absence-rule scope)
    version_hash      -> version_hash (dedup anti-join key, J4)
    is_revoked/absence-> op='revoke'
    manifest Process  -> op ('insert'|'update'|'delete'|'revoke')

``event_seq`` is a monotone tiebreaker within equal ``ts`` — the reference
relies on MAX(batch_timestamp) alone (dataPipelines/gc_db_utils/orch/sql/
create_views.sql:24-31) which admits ties; we tighten the total order to
(ts, event_seq).
"""

from __future__ import annotations

from pyspark.sql import types as T

OPS = ("insert", "update", "delete", "revoke")

# Target state table (BASELINE.json input_hint) + engine-managed columns.
TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

# Engine-managed columns kept alongside the parity columns (FIXTURES.md §1).
TRANSCRIPT_FULL_SCHEMA = T.StructType(
    TRANSCRIPT_FIELDS
    + [
        T.StructField("event_seq", T.LongType(), True),
        T.StructField("is_revoked", T.BooleanType(), True),
        T.StructField("dedup_hash", T.StringType(), True),
    ]
)

# Change-event feed (FIXTURES.md §2).
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("producer", T.StringType(), True),
        T.StructField("version_hash", T.StringType(), True),
    ]
)

# Lineage / commit-marker table (FIXTURES.md §3). One row per
# (batch_id, partition); the presence of any row for a batch_id is the
# idempotent replay guard (north-rule "batch-id commit markers"),
# superseding the reference's non-atomic checkpoint-file advance
# (dataPipelines/gc_ingest/tools/checkpoint/utils.py:189-191).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("offset_min", T.LongType(), True),
        T.StructField("offset_max", T.LongType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_upserted", T.LongType(), True),
        T.StructField("rows_deleted", T.LongType(), True),
        T.StructField("rows_revoked", T.LongType(), True),
        T.StructField("applied_at", T.TimestampType(), True),
    ]
)
