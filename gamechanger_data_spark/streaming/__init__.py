"""Streaming CDC driver: foreachBatch apply with exactly-once + lineage."""
