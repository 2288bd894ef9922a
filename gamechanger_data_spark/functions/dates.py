"""Date/timestamp handling — lenient parsing and canonical formatting.

Reference semantics reproduced:
  - lenient any-format timestamp parse, unparseable -> NULL
    (common/utils/parsers.py:6-28, pandas.to_datetime with NaT->None)
  - canonical second-floored format %Y-%m-%dT%H:%M:%S used everywhere
    (dataPipelines/gc_ingest/config.py:13; common/document_parser/lib/
    datetime_utils.py:5-18)
  - free-text date extraction via a small set of regex shapes
    (common/document_parser/lib/dates.py:9-151: '%d %B %Y', '%B %d, %Y'
    and short-month variants)

All native expressions (try_to_timestamp chains) — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CANONICAL_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss"

# try-chain of accepted layouts, most specific first (the Spark-native
# restatement of "pandas will figure it out"; extend as formats appear)
_LAYOUTS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy",
    # unpadded US dates ('1/2/2024') — the reference's pandas.to_datetime
    # accepts them; zero-padded-only layouts silently NULLed every one
    "M/d/yyyy H:mm:ss",
    "M/d/yyyy",
    "d MMMM yyyy",
    "MMMM d, yyyy",
    "d MMM yyyy",
    "MMM d, yyyy",
]


def lenient_to_timestamp(col: Column | str) -> Column:
    """First layout that parses wins; NULL if none do (never raises —
    the reference's NaT->None contract)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.try_to_timestamp(c, F.lit(_LAYOUTS[0]))
    for fmt in _LAYOUTS[1:]:
        out = F.coalesce(out, F.try_to_timestamp(c, F.lit(fmt)))
    return out


def canonical_ts(col: Column | str) -> Column:
    """Second-floored canonical rendering (gc_ingest/config.py:13)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, CANONICAL_TS_FMT)


# Date shapes in free text (lib/dates.py): "12 January 2024", "January 12, 2024",
# short-month variants. Single capture contract like ref_utils.
_MONTH = "(?:January|February|March|April|May|June|July|August|September|October|November|December)"
_MON = "(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
DATE_PATTERNS = [
    rf"\b\d{{1,2}} {_MONTH} \d{{4}}\b",
    rf"\b{_MONTH} \d{{1,2}}, \d{{4}}\b",
    rf"\b\d{{1,2}} {_MON} \d{{4}}\b",
    rf"\b{_MON} \d{{1,2}}, \d{{4}}\b",
]


def extract_dates(col: Column | str) -> Column:
    """All date-shaped substrings (array<string>), parseable downstream by
    lenient_to_timestamp. One combined regex, one pass."""
    c = F.col(col) if isinstance(col, str) else col
    combined = "|".join(DATE_PATTERNS)
    return F.regexp_extract_all(c, F.lit(combined), 0)
