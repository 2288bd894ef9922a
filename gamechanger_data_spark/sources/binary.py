"""Binary-file directory scan with extension filtering.

Reference: glob `**/*` keeping .pdf/.html/.txt plus MIME sniffing
(common/document_parser/process.py:166-168; gc_ingest/tools/load/
utils.py:212-221). Spark-first: the built-in ``binaryFile`` source with
``pathGlobFilter`` — file listing is distributed, payloads arrive as a
binary column with (path, modificationTime, length) metadata, and the
filter happens at the source (no post-hoc scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_binary_dir(
    spark: SparkSession,
    path: str,
    # .metadata is included by default so the module's two functions
    # compose: pair_by_stem matches X.pdf with X.pdf.metadata, which must
    # therefore survive the source filter
    glob: str = "*.{pdf,html,txt,metadata}",
    recursive: bool = True,
) -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )


def pair_by_stem(files: DataFrame, sidecar_suffix: str = ".metadata") -> DataFrame:
    """J7 file-pair join: match `X.pdf` with `X.pdf.metadata` by derived key
    (reference: gc_ingest/tools/load/utils.py:157-221). One equi-join on the
    computed stem; both sides come from the same listing."""
    stem = F.regexp_replace(F.col("path"), sidecar_suffix.replace(".", r"\.") + "$", "")
    with_kind = files.select(
        F.col("path"),
        F.col("length"),
        stem.alias("stem"),
        F.col("path").endswith(sidecar_suffix).alias("is_sidecar"),
    )
    main = with_kind.filter(~F.col("is_sidecar")).select(
        F.col("stem"), F.col("path").alias("raw_path"), F.col("length").alias("raw_len")
    )
    side = with_kind.filter(F.col("is_sidecar")).select(
        F.col("stem"), F.col("path").alias("sidecar_path")
    )
    return main.join(side, "stem", "left")
