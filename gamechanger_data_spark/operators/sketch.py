"""Portable approximate-distinct sketch (KMV / k-minimum-values).

``approx_count_distinct`` (HyperLogLog++) is the right tool at scale but
its estimates are engine-specific — no external system can reproduce
them, so the catalog can only rows-only-check it. KMV is the
*auditable* sketch: keep the k smallest values of a uniform hash; with
``m`` distinct keys the kth-smallest hash sits near ``k/m`` of the hash
space, so ``m ≈ (k-1) * SPACE / kth_min``. Built on the repo's portable
md5-60-bit hash, the whole estimate — k rows kept, kth hash, final
number — is bit-reproducible in DuckDB (Beyer et al., "On Synopses for
Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007).

Scale shape (honest): ``distinct -> orderBy(h) -> limit(k)`` compiles to
partial-hash-aggregate (map-side duplicate collapse) -> exchange of the
per-partition-distinct hashes -> TakeOrderedAndProject. Duplicates never
shuffle, but the distinct hash set itself does — KMV here is the
AUDITABLE sketch (external engines reproduce it bit-exactly), not the
cheapest one; at extreme cardinality where shuffling the distinct set is
the bottleneck, ``approx_count_distinct`` (HLL) is the right tool and
this is its cross-engine cross-check on samples. Standard error
~ 1/sqrt(k-2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gamechanger_data_spark.operators.sampling import _HASH_SPACE, hash_bucket60


def kmv_distinct(
    df: DataFrame, key_col: str, k: int = 64, salt: str = ""
) -> DataFrame:
    """One-row DataFrame (k_used, kth_hash, estimate): the KMV estimate
    of ``count(distinct key_col)``. When fewer than ``k`` distinct hashes
    exist the sketch IS the distinct set and the exact count is returned
    (the standard small-cardinality rule)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = hash_bucket60(key_col, salt)
    mins = df.select(h.alias("h")).distinct().orderBy("h").limit(k)
    est = (
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise(
            (F.lit(float(k - 1)) * F.lit(float(_HASH_SPACE)))
            / F.col("kth_hash").cast("double")
        )
    )
    return (
        mins.agg(
            F.count(F.lit(1)).cast("int").alias("k_used"),
            F.max("h").alias("kth_hash"),
        )
        .select("k_used", "kth_hash", F.round(est, 4).alias("estimate"))
    )


def kmv_distinct_sql(
    table: str, key_expr: str, k: int = 64, salt: str = ""
) -> str:
    """DuckDB twin of :func:`kmv_distinct` — bit-identical output."""
    from gamechanger_data_spark.operators.sampling import hash_bucket60_sql

    h = hash_bucket60_sql(key_expr, salt)
    return f"""
WITH mins AS (
  SELECT DISTINCT {h} AS h FROM {table} ORDER BY h LIMIT {k}
),
agg AS (
  SELECT CAST(count(*) AS INT) AS k_used, max(h) AS kth_hash FROM mins
)
SELECT k_used, CAST(kth_hash AS BIGINT) AS kth_hash,
       round(CASE WHEN k_used < {k} THEN k_used::DOUBLE
             ELSE ({float(k - 1)!r} * {float(_HASH_SPACE)!r}) / kth_hash::DOUBLE
             END, 4) AS estimate
FROM agg
"""
