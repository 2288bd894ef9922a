"""Table sinks. ``LakeTable`` is the offline-friendly versioned parquet
implementation of the MERGE/commit contract; an Iceberg implementation drops
in behind the same interface when the runtime jar is on the classpath."""

from gamechanger_data_spark.sinks.table import CommitConflictError, LakeTable  # noqa: F401
