"""PII scrubbing for training corpora: detect/redact emails, US phone
numbers, and SSNs with portable (Java <-> RE2) regexes — the standard
pre-training redaction pass. No lookaround/backrefs, so the DuckDB
oracle runs the IDENTICAL pattern strings.

Everything is native ``regexp_replace`` / ``regexp_extract_all`` — one
codegen projection per doc, embarrassingly parallel at 100 TB. Redaction
order matters and is fixed: emails first (their local parts may contain
digit runs), then SSNs (3-2-4), then phones (3-3-4) — the groupings are
disjoint so later passes never see earlier placeholders."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, regex, replacement) — applied in order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # No leading \b: "(555) ..." would never match one (paren and the
    # char before it are both non-word, so there is no boundary there).
    (
        "phone",
        r"(?:\+?1[ .-])?(?:\([0-9]{3}\)|[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\b",
        "<PHONE>",
    ),
)


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count_expr(col: Column | str, name: str) -> Column:
    """Occurrence count of one PII class (before redaction)."""
    rx = {n: r for n, r, _ in PII_PATTERNS}[name]
    return F.size(F.regexp_extract_all(_col(col), F.lit(rx), 0)).cast("int")


def scrub_pii_expr(col: Column | str) -> Column:
    """Text with every PII class redacted to its placeholder."""
    c = _col(col)
    for _, rx, repl in PII_PATTERNS:
        c = F.regexp_replace(c, rx, repl)
    return c


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, clean_text, n_email, n_ssn, n_phone) — redacted text plus
    per-class counts (the audit trail a redaction pass must emit)."""
    return df.select(
        F.col(id_col),
        scrub_pii_expr(text_col).alias("clean_text"),
        *[
            pii_count_expr(text_col, name).alias(f"n_{name}")
            for name, _, _ in PII_PATTERNS
        ],
    )


def pii_oracle_sql(source: str = "documents", text_expr: str = "text") -> str:
    """DuckDB twin of :func:`scrub_pii` over the same pattern table."""
    clean = text_expr
    counts = []
    for name, rx, repl in PII_PATTERNS:
        rxq = rx.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({text_expr}, '{rxq}')) AS INT) AS n_{name}"
        )
    for _, rx, repl in PII_PATTERNS:
        rxq = rx.replace("'", "''")
        clean = f"regexp_replace({clean}, '{rxq}', '{repl}', 'g')"
    return (
        f"SELECT doc_id, {clean} AS clean_text, {', '.join(counts)} FROM {source}"
    )
