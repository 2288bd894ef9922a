"""Deterministic hashing — surrogate keys, version hashes, dedup hashes.

Reference contracts reproduced (citations into /root/reference/):
  - str_to_sha256_hex_digest: sha256 hex of the utf-8 string
    (dataPipelines/gc_manual_metadata/gc_manual_metadata.py:9-14, duplicated at
    dataPipelines/gc_ingest/tools/metadata/metadata.py:9-14)
  - dict_to_sha256_hex_digest: sort (k, v) pairs by str(key), then reduce
    with ``"".join(map(str, (acc, pair)))`` — i.e. concatenate the *tuple
    reprs* ``str((k, v))`` of each sorted pair (``"('event_id', 7)"
    "('event_type', 'click')"``), sha256 the result — the version /
    change-detection hash (gc_manual_metadata.py:16-28)
  - ES document id: sha256(filename stripped of a trailing '.json')
    (dataPipelines/gc_elasticsearch_publisher/gc_elasticsearch_publisher.py:81-94)

All Spark-side hashes are native ``F.sha2`` (JVM, codegen) — Python hashlib
appears only in the pandas oracle mirror used by tests.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_expr(col: Column | str) -> Column:
    """str_to_sha256_hex_digest as a native expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def dict_hash_expr(
    pairs: dict[str, Column | str],
    string_cols: frozenset[str] | set[str] = frozenset(),
    bool_cols: frozenset[str] | set[str] = frozenset(),
) -> Column:
    """dict_to_sha256_hex_digest for a fixed field set.

    Reproduces the reference contract: pairs sorted by str(key), each pair
    rendered as its Python tuple repr ``str((k, v))`` and concatenated with
    NO separator, sha256 hex. String-typed values (named in ``string_cols``)
    render inside single quotes like Python repr; booleans (``bool_cols``)
    render as ``True``/``False`` (Spark's string cast would give
    ``true``/``false``); NULL values render as ``None`` — without this the
    whole concat would null-propagate and every row with one NULL field
    would get a NULL version hash, silently breaking change detection.

    Parity caveat (documented, not hidden): the single-quote rendering
    matches Python ``repr`` only for strings free of backslashes, single
    quotes, and control characters — the shape of the reference's metadata
    fields. Values whose repr escapes characters (or floats, whose repr is
    shortest-round-trip) need the Python mirror ``dict_hash_python``.
    """
    parts: list[Column] = []
    for k in sorted(pairs, key=str):
        v = pairs[k]
        c = F.col(v) if isinstance(v, str) else v
        parts.append(F.lit(f"({k!r}, "))
        if k in bool_cols:
            rendered = F.when(c, F.lit("True")).otherwise(F.lit("False"))
        elif k in string_cols:
            rendered = F.concat(F.lit("'"), c.cast("string"), F.lit("'"))
        else:
            rendered = c.cast("string")
        parts.append(F.when(c.isNull(), F.lit("None")).otherwise(rendered))
        parts.append(F.lit(")"))
    return F.sha2(F.concat(*parts), 256)


def es_id_expr(filename: Column | str) -> Column:
    """Deterministic sink id: sha256(filename minus trailing '.json')."""
    c = F.col(filename) if isinstance(filename, str) else filename
    return F.sha2(F.regexp_replace(c, r"\.json$", ""), 256)


def dedup_hash_expr(text: Column | str) -> Column:
    """Content hash of normalized text — the transcript-grain version hash."""
    c = F.col(text) if isinstance(text, str) else text
    return F.sha2(c, 256)


# ---- pandas mirrors (test oracle only — NOT used in the Spark pipeline) ----

def sha256_pandas(s: pd.Series) -> pd.Series:
    return s.map(lambda x: hashlib.sha256(str(x).encode("utf-8")).hexdigest())


def dict_hash_python(d: dict) -> str:
    """Bit-exact mirror of the reference dict_to_sha256_hex_digest.

    The reference's ``reduce(lambda t1, t2: "".join(map(str, (t1, t2))),
    sorted(d.items(), key=lambda t: str(t[0])), "")`` folds the accumulator
    string with each (k, v) tuple, which is exactly the concatenation of the
    tuple reprs ``str((k, v))`` in sorted-key order. Numpy scalar values are
    unboxed first (their repr differs from the Python scalars the reference
    feeds in).
    """
    def _unbox(v):
        return v.item() if hasattr(v, "item") else v

    sorted_pairs = sorted(d.items(), key=lambda kv: str(kv[0]))
    concat = "".join(str((k, _unbox(v))) for k, v in sorted_pairs)
    return hashlib.sha256(concat.encode("utf-8")).hexdigest()
