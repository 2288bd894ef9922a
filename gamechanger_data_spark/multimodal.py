"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas operators.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``try: import ...`` with a deterministic fallback feature extractor
(clearly marked). Everything Spark-side is real and tested: schema,
partition sizing, UDF signatures, Arrow batch shapes.

Reference analog: the reference treats PDFs/thumbnails as opaque binary
files moved between stores and derives per-file metadata
(dataPipelines/gc_ingest/tools/load/utils.py:280-326 archive sink,
common/document_parser/lib/pages.py extraction); here the same pattern is a
binary COLUMN instead of a file, so it shuffles/prunes/spills like any
other column.

Scale notes: binary payloads ride in the same parquet row groups; set
``maxRecordsPerFile`` / partition sizing by BYTES not rows when payloads
are large, and keep feature extraction in mapInPandas so payload bytes
never round-trip through Python row objects (Arrow transfers the buffer
wholesale).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),      # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("declared_w", T.IntegerType(), True),
                    T.StructField("declared_h", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "payload_sha256 string, width int, height int, decoded boolean"
)


def _media_rows(n: int, seed: int) -> list[tuple]:
    """Deterministic fake media rows: payload bytes derived from the id
    (no external data). Single source of truth for synthesize_media and
    the published oracle corpus."""
    import hashlib

    rows = []
    for i in range(n):
        blob = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (8 + i % 17)
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(blob),
                (f"src{i % 5}", 64 + (i % 64), 64 + (i % 48), 16000 if kind == "audio" else None),
            )
        )
    return rows


def synthesize_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus as a DataFrame (tests + catalog)."""
    return spark.createDataFrame(_media_rows(n, seed), MEDIA_SCHEMA)


def publish_media_corpus(root: str, n: int = 200, seed: int = 42) -> str:
    """Write the synthetic media corpus to parquet once per host (atomic
    rename publish), so a DuckDB oracle can read the SAME input the Spark
    query reads. Alongside the binary payload, ``first_byte``/``last_byte``
    ride as plain int columns computed here in the PUBLISHER (pure python,
    not the operator under test): DuckDB cannot index into a BLOB, so the
    oracle recomputes the fallback dims from these, while the Spark side
    must derive them from the binary column through the real mapInPandas
    path. Returns the parquet file path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(root, "media.parquet")
    if os.path.exists(out):
        return out
    rows = _media_rows(n, seed)
    tbl = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "media_type": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([bytes(r[2]) for r in rows], pa.binary()),
            "first_byte": pa.array([r[2][0] for r in rows], pa.int32()),
            "last_byte": pa.array([r[2][-1] for r in rows], pa.int32()),
        }
    )
    tmp_dir = f"{root}-build-{uuid.uuid4().hex}"
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(tmp_dir, "media.parquet"))
    try:
        os.rename(tmp_dir, root)
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        # Only a lost publish race is benign; anything else (EACCES,
        # ENOSPC, root existing without the file) must surface, or every
        # later read fails with a misleading missing-path error.
        if not os.path.exists(out):
            raise
    return out


def _decode_image(payload: bytes) -> tuple[int, int, bool]:
    """Decode stub: real decode needs PIL/cv2 (absent in this container).

    Falls back to a DETERMINISTIC FAKE: dimensions derived from payload
    bytes. The fallback is marked by decoded=False so downstream can route
    real decodes when codecs exist.
    """
    try:  # pragma: no cover - codec not present in the sandbox
        from PIL import Image  # type: ignore
        import io

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, True
    except Exception:
        if not payload:
            return 0, 0, False
        return 32 + payload[0] % 224, 32 + payload[-1] % 224, False


def extract_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Feature extraction over binary payloads — native where possible.

    Byte-level metadata (n_bytes, payload_sha256) is computed JVM-side with
    ``F.length`` / ``F.sha2`` directly on the binary column (codegen, no
    Python in that path). Only the DECODE step — the part that genuinely
    needs a codec — goes through mapInPandas, where Arrow keeps payload
    bytes in columnar buffers; a real deployment swaps ``_decode_image``
    for a vectorized codec (pillow-simd / torchvision.io) with the same
    signature.
    """
    with_meta = df.select(
        "media_id",
        "media_type",
        "payload",
        F.coalesce(F.length("payload"), F.lit(0)).cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.coalesce(F.col("payload"), F.lit(b"")), 256)).alias(
            "payload_sha256"
        ),
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _decode_image(p if p is not None else b"") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "payload_sha256": pdf["payload_sha256"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "decoded": [d[2] for d in dims],
                }
            )

    return with_meta.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: emits (media_id, frame_idx) rows for the
    frames a decoder would extract — the Spark-side partitioning/explode
    is real; the decode itself is the stubbed step."""
    n_frames = (F.length("payload") / F.lit(1024)).cast("int") + 1  # fake frame count
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
