"""Training-data shard export — the terminal sink of the corpus pipeline.

A 100 TB training run consumes the corpus as FIXED, NUMBERED shards:
data-loader workers each own shard ranges, resumption needs shard
membership to be reproducible, and dataset audits need per-shard
checksums. ``DataFrame.write`` alone gives none of that — output file
count/boundaries depend on partitioning and AQE. Here shard membership
is a pure function of the key (the repo's portable md5-60-bit hash, the
same construction the DuckDB oracles reproduce bit-exactly), so a
re-export of the same data — on any cluster size, any partition layout —
produces byte-identical shard membership and matching manifest
checksums.

Reference analog: the bulk-index publisher walks the corpus and ships
deterministic-id batches to ES (gc_elasticsearch_publisher.py:84-100);
this is the same idempotent-publish discipline with files as the target.

Scale shape: one hash projection + one repartition ON THE SHARD ID
(each shard's rows hash to exactly one partition, so every shard is
exactly one file) writes the data; the manifest checksums then come from
a column-pruned audit read of the WRITTEN files (map-side-combined XOR
aggregate over the key column only) — so the manifest always describes
what is on disk, even for non-deterministic or since-changed inputs.
The driver only ever sees the n_shards-row checksum table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gamechanger_data_spark.operators.sampling import hash_bucket60

SHARD_COL = "__shard"
# underscore prefix: Spark file sources skip "_"/"." files, so the
# manifest can live inside the shard dir without confusing readers.
MANIFEST_NAME = "_manifest.json"


def shard_expr(key_col: Column | str, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard id in [0, n_shards): portable-hash(key) mod n.
    Stable across runs, engines, partitionings, and appends."""
    return F.pmod(hash_bucket60(key_col, salt), F.lit(n_shards)).cast("int")


def shard_checksums(
    df: DataFrame, key_col: str, n_shards: int, salt: str = ""
) -> DataFrame:
    """(shard, rows, checksum): per-shard row count and order-independent
    content checksum (XOR of each key's 60-bit hash — commutative, so the
    value is partitioning-independent). The audit half of the export; the
    DuckDB oracle reproduces it bit-exactly."""
    h = hash_bucket60(key_col, salt)
    return (
        df.select(shard_expr(key_col, n_shards, salt).alias("shard"), h.alias("h"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.expr("bit_xor(h)").alias("checksum"),
        )
    )


def _write_manifest(path: str, manifest: dict) -> None:
    """Fsync'd atomic manifest publish, written AFTER the data files
    (ready-marker discipline: readers treat its presence as commit)."""
    tmp = os.path.join(path, "._manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "",
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` as ``n_shards`` hash-assigned shards plus a
    ``_manifest.json`` recording per-shard row counts and checksums.
    ``fmt`` picks the file format — parquet (default), orc, or json
    (newline-delimited records, the common loader-facing layout).

    Layout: ``path/__shard=<k>/part-*`` (exactly one data file per
    non-empty shard — a shard's rows all hash-land in one partition)
    and ``path/_manifest.json``. The manifest is written AFTER the data
    (ready-marker discipline: readers treat its presence as commit).

    Returns the manifest dict: ``{"n_shards": n, "total_rows": r,
    "shards": {"<k>": {"rows": n_k, "checksum": c_k}}}``.
    """
    if fmt not in ("parquet", "orc", "json"):
        raise ValueError(f"unsupported export format {fmt!r}")
    out = df.withColumn(SHARD_COL, shard_expr(key_col, n_shards, salt))
    (
        out.repartition(n_shards, SHARD_COL)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .format(fmt)
        .save(path)
    )
    # Checksums come from the files ACTUALLY WRITTEN (column-pruned key
    # read), not from re-running df's plan — a non-deterministic or
    # since-changed source would otherwise produce a manifest describing
    # data that is not on disk, and verify_shards would flag a fresh
    # export.
    reader = df.sparkSession.read
    if fmt == "json":
        # json shards carry no embedded schema: bind the writer's (minus
        # the shard partition column, which the directory layout restores)
        reader = reader.schema(out.drop(SHARD_COL).schema)
    written = reader.format(fmt).load(path)
    sums = shard_checksums(written, key_col, n_shards, salt).collect()
    shards = {
        str(r["shard"]): {"rows": r["rows"], "checksum": r["checksum"]}
        for r in sums
    }
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        # the key's Spark type travels with the manifest so the audit can
        # re-read json shards TYPED — hashing the raw json lexeme instead
        # (e.g. a timestamp's ISO form vs Spark's cast-to-string form)
        # would flag an intact export as corrupt
        "key_type": df.schema[key_col].dataType.simpleString(),
        "salt": salt,
        "format": fmt,
        "total_rows": sum(s["rows"] for s in shards.values()),
        "shards": shards,
    }
    _write_manifest(path, manifest)
    return manifest


def verify_shards(spark, path: str, key_col: str | None = None) -> DataFrame:
    """Audit an export: recompute per-shard rows/checksums from the files
    on disk and join against the manifest. Returns one row per shard with
    ``ok`` false where either number drifted (bit-rot, partial rewrite,
    wrong engine re-export)."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    key_col = key_col or manifest["key_col"]
    n = int(manifest["n_shards"])
    fmt = manifest.get("format", "parquet")
    reader = spark.read
    if fmt == "json":
        # key column suffices for the audit, bound at the WRITER's type
        key_type = manifest.get("key_type", "string")
        reader = reader.schema(f"{key_col} {key_type}")
    got = shard_checksums(
        reader.format(fmt).load(path), key_col, n, manifest.get("salt", "")
    )
    want = spark.createDataFrame(
        [
            (int(k), v["rows"], v["checksum"])
            for k, v in manifest["shards"].items()
        ],
        "shard int, m_rows long, m_checksum long",
    )
    return (
        got.join(want, "shard", "full_outer")
        .select(
            "shard",
            "rows",
            "checksum",
            "m_rows",
            "m_checksum",
            (
                F.col("rows").eqNullSafe(F.col("m_rows"))
                & F.col("checksum").eqNullSafe(F.col("m_checksum"))
            ).alias("ok"),
        )
    )


def publish_bulk_jsonl(
    df: DataFrame,
    path: str,
    id_col: str = "es_id",
    n_shards: int = 8,
) -> dict:
    """Bulk-index file sink: every row becomes an action line
    ``{"index":{"_id":<id>}}`` followed by its source-document JSON line —
    the newline-delimited ``_bulk`` wire format, written as files. This is
    the file form of the reference's idempotent bulk indexer
    (gc_elasticsearch_publisher.py:84-100): DETERMINISTIC ids mean a
    re-publish upserts the same documents, so the sink stays idempotent
    end-to-end no matter how often the corpus is re-exported.

    Files are hash-sharded on the id (same portable hash as
    ``export_shards`` — one file per non-empty shard, stable membership),
    and a ``_manifest.json`` with per-shard doc counts + XOR checksums is
    written last (ready-marker discipline). All JSON rendering happens
    JVM-side (``to_json`` over structs) — no Python in the row path.
    """
    doc_cols = [c for c in df.columns if c != id_col]
    action = F.to_json(
        F.struct(F.struct(F.col(id_col).alias("_id")).alias("index"))
    )
    line = F.concat(action, F.lit("\n"), F.to_json(F.struct(*doc_cols)))
    out = df.select(
        line.alias("value"), shard_expr(id_col, n_shards).alias(SHARD_COL)
    )
    (
        out.repartition(n_shards, SHARD_COL)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .text(path)
    )
    # Audit what landed on disk: re-read the written action lines and
    # recompute the id checksums from them (same rationale as
    # export_shards — the manifest must describe the files, not the plan).
    actions = (
        df.sparkSession.read.text(path)
        .select(F.get_json_object("value", "$.index._id").alias(id_col))
        .filter(F.col(id_col).isNotNull())
    )
    sums = shard_checksums(actions, id_col, n_shards).collect()
    shards = {
        str(r["shard"]): {"rows": r["rows"], "checksum": r["checksum"]}
        for r in sums
    }
    manifest = {
        "format": "bulk-jsonl",
        "n_shards": n_shards,
        "key_col": id_col,
        "salt": "",
        "total_rows": sum(s["rows"] for s in shards.values()),
        "shards": shards,
    }
    _write_manifest(path, manifest)
    return manifest


def pack_offsets(
    df: DataFrame,
    seq_budget: int,
    n_shards: int = 8,
    key_col: str = "doc_id",
    len_col: str = "n_tokens",
) -> DataFrame:
    """GPT-style sequence packing assignment: documents are concatenated
    in deterministic order and chunked at fixed ``seq_budget`` token
    boundaries (docs may span chunks — the standard pretraining packing,
    not bin-packing). Returns per-doc placement:

        (key, shard, tok_offset, chunk_first, chunk_last, spans_chunks)

    Scale shape: a GLOBAL prefix sum would serialize on one window
    partition, so packing is per-shard — the same deterministic hash-mod
    shards ``export_shards`` writes, which is also how loaders consume
    the data (each worker owns shards). Within a shard the order is
    (key asc): one window per shard partition, all shards in parallel.
    Every number is reproducible from the key column alone, so an
    external engine can re-derive the entire layout (the DuckDB oracle
    does).
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(
        F.col(key_col),
        shard_expr(key_col, n_shards).alias("shard"),
        F.col(len_col).cast("long").alias("n"),
    )
    cum = out.withColumn("cum", F.sum("n").over(w))
    # INTEGER division throughout (`div`, == DuckDB's `//` for these
    # non-negative operands): float floor(cum/budget) loses exactness past
    # 2^53 cumulative tokens and would disagree with the oracle at chunk
    # boundaries. A zero-token doc's "last token" is its offset itself —
    # without the n=0 guard an empty doc sitting exactly on a boundary
    # would claim chunk_last = chunk_first - 1 and spans_chunks = true.
    first = F.expr(f"(cum - n) div {int(seq_budget)}")
    last_tok = F.when(F.col("n") > 0, F.col("cum") - 1).otherwise(F.col("cum") - F.col("n"))
    last = F.expr(f"__last_tok div {int(seq_budget)}")
    return (
        cum.withColumn("__last_tok", last_tok)
        .select(
            key_col,
            "shard",
            (F.col("cum") - F.col("n")).alias("tok_offset"),
            first.cast("long").alias("chunk_first"),
            last.cast("long").alias("chunk_last"),
            (first != last).alias("spans_chunks"),
        )
    )
