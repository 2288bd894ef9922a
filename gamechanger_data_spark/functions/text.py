"""Text normalization — the transcript-grain restatement of the reference's
string pipeline.

Reference semantics reproduced (citations into /root/reference/):
  - translate_to_ascii_string / fix_utf8_string / squash_whitespace_to_spaces
    (common/utils/text_utils.py:5-72, composed via str_chain_apply)
  - unicode-dash + parenthetical + whitespace preprocessing
    (common/document_parser/ref_utils.py:8-28, preprocess_text)
  - quote translation (common/utils/text_utils.py quote table)

Two implementations with IDENTICAL semantics (unit-tested for equality):

  * ``normalize_text_expr``  — pure Spark Column expression chain
    (regexp_replace / translate / trim): JVM-side, whole-stage-codegen'd.
    This is the hot path used in the CDC pipeline.
  * ``normalize_text_pandas`` — vectorized pandas implementation, used by the
    Arrow pandas UDF variant and by the independent test oracle.

The north rule requires all text normalization via vectorized pandas/Arrow
UDFs or better — never per-row Python. The native-expression chain is
"better" (no Python at all); the pandas UDF is provided for parity with the
rule and for composition inside mapInPandas operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Unicode punctuation canonicalization table: fancy quotes -> ascii quotes,
# unicode dashes -> '-', NBSP -> space. Kept as parallel strings so the same
# table drives both str.translate (pandas) and F.translate (Spark).
_SRC = "\u2018\u2019\u201a\u201b\u201c\u201d\u201e\u201f\u2013\u2014\u2015\u2212\u00a0"
_DST = "'" * 4 + '"' * 4 + "-" * 4 + " "
assert len(_SRC) == len(_DST)

_PANDAS_TRANS = str.maketrans(_SRC, _DST)

# Control characters stripped outright (translate-with-delete is ~3x cheaper
# than a character-class regex in the hot path).
_CTRL = "".join(
    chr(c) for c in [*range(0x00, 0x09), 0x0B, 0x0C, *range(0x0E, 0x20), 0x7F]
)
_PANDAS_CTRL = {ord(c): None for c in _CTRL}


def normalize_text_expr(col: Column | str) -> Column:
    """Native Spark normalization chain (JVM-side, codegen).

    Steps: unicode punctuation translate -> strip control chars -> squash all
    whitespace runs to single spaces -> trim.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, _SRC, _DST)
    c = F.translate(c, _CTRL, "")  # delete control chars (no regex cost)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_text_pandas(s: pd.Series) -> pd.Series:
    """Vectorized pandas implementation of exactly the same transform."""
    out = s.str.translate(_PANDAS_TRANS)
    out = out.str.translate(_PANDAS_CTRL)
    out = out.str.replace(r"\s+", " ", regex=True)
    return out.str.strip()


@F.pandas_udf(T.StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched UDF wrapper (north-rule compliant slow path)."""
    return normalize_text_pandas(s)


def squash_whitespace_expr(col: Column | str) -> Column:
    """squash_whitespace_to_spaces (text_utils.py:29-33) as a native expr."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_dod_expr(col: Column | str) -> Column:
    """normalize_dod (common/document_parser/lib/document/utils/dod_text.py:5-69):
    canonicalize 'DoD M 5200.01' -> 'DoDM 5200.01' style spacing, 4 patterns."""
    c = F.col(col) if isinstance(col, str) else col
    for suffix in ("M", "D", "I", "S"):
        c = F.regexp_replace(c, rf"\bDoD\s+{suffix}\b", f"DoD{suffix}")
    return c


def filename_safe_expr(col: Column | str, max_len: int = 200) -> Column:
    """Archive-safe name: bad chars -> underscore, squash underscore runs,
    trim to length (common/utils/text_utils.py:36-72 translate_bad_characters
    + squash chains, and the title truncation at orch/models.py:37)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[^A-Za-z0-9.\-]", "_")
    c = F.regexp_replace(c, r"_+", "_")
    return F.substring(c, 1, max_len)


def format_size_expr(n_bytes: Column | str) -> Column:
    """Human-readable byte size (common/utils/text_utils.py:74-80) — metrics
    rendering only, never in a data path."""
    c = F.col(n_bytes) if isinstance(n_bytes, str) else n_bytes
    return (
        F.when(c >= 1024**3, F.concat(F.round(c / 1024**3, 1).cast("string"), F.lit(" GiB")))
        .when(c >= 1024**2, F.concat(F.round(c / 1024**2, 1).cast("string"), F.lit(" MiB")))
        .when(c >= 1024, F.concat(F.round(c / 1024, 1).cast("string"), F.lit(" KiB")))
        .otherwise(F.concat(c.cast("string"), F.lit(" B")))
    )


# ES dynamic-template suffix typing (SURVEY §1.3): field-name suffix -> type.
# configuration/elasticsearch-config/prod.json dynamic_templates in the
# reference; here: a schema-driven rename builder.
_SUFFIX_BY_TYPE = {
    "string": "_s", "int": "_i", "bigint": "_l", "boolean": "_b",
    "double": "_d", "float": "_f", "timestamp": "_dt", "timestamp_ntz": "_dt",
}


def suffix_rename_map(schema, keep: tuple[str, ...] = ()) -> dict[str, str]:
    """Build the suffix-typing rename map for a DataFrame schema
    (parse.py:154-169 did this by hand for 7 fields; this derives it from
    the schema so it stays correct under schema evolution)."""
    out = {}
    for f in schema.fields:
        if f.name in keep:
            continue
        suffix = _SUFFIX_BY_TYPE.get(f.dataType.simpleString())
        if suffix and not f.name.endswith(suffix):
            out[f.name] = f.name + suffix
    return out
