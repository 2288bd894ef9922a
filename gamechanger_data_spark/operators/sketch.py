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


def cms_token_counts(
    df: DataFrame,
    text_col: str = "text",
    probes: tuple[str, ...] = (),
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-min-sketch token-frequency estimates (Cormode & Muthukrishnan,
    J. Algorithms 55(1), 2005) for a fixed probe vocabulary, next to the
    exact counts.

    The sketch is d x w counters: each token increments one cell per hash
    row (md5 salted by the row index — the portable hash, so an external
    engine rebuilds the SKETCH ITSELF bit-exactly and the estimates are
    hash-comparable, not tolerance-checked). Estimate = min over the d
    cells; the CMS guarantee (estimate >= exact, overshoot bounded by
    collisions ~ N/w per row) is directly visible in the output.

    Scale shape — the reason to sketch at all: token frequency at 100 TB
    via groupBy(token) shuffles the full vocabulary; the sketch is a
    bounded d x w aggregate with map-side combine (the per-partition
    partial sketch is d x w integers regardless of input size), and probe
    estimation joins the d*|probes| probe cells against it broadcast. The
    exact counts computed here alongside are the small-scale
    verification twin, not part of the scale path.

    Returns (tok, exact_count, cms_count) per probe token.
    """
    if not probes:
        raise ValueError("probes must be a non-empty tuple of tokens")
    spark = df.sparkSession

    def _cell(tok_col, i: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(tok_col, F.lit(salt), F.lit(str(i)))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % w
        )

    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _cell(F.col("tok"), i).alias("cell")
                    )
                    for i in range(d)
                ]
            )
        ).alias("c")
    ).select("c.i", "c.cell")
    sketch = cells.groupBy("i", "cell").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )

    probe_df = spark.createDataFrame([(t,) for t in probes], "tok string")
    probe_cells = probe_df.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _cell(F.col("tok"), i).alias("cell")
                    )
                    for i in range(d)
                ]
            )
        ).alias("c"),
    ).select("tok", "c.i", "c.cell")

    # the SKETCH is the broadcast side: it is bounded at d x w rows by
    # construction, regardless of corpus size — the whole point of
    # sketching (probe_cells is the preserved side of the left join, so
    # it cannot be the build side)
    est = (
        probe_cells.join(F.broadcast(sketch), ["i", "cell"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_count"))
    )
    exact = (
        toks.filter(F.col("tok").isin(*probes))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return (
        est.join(exact, "tok", "left")
        .select(
            "tok",
            F.coalesce("exact_count", F.lit(0).cast("long")).alias("exact_count"),
            "cms_count",
        )
    )


def cms_token_counts_sql(
    table: str,
    text_expr: str = "text",
    probes: tuple[str, ...] = (),
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> str:
    """DuckDB twin of :func:`cms_token_counts` — rebuilds the identical
    sketch and estimates, bit-exact."""
    if not probes:
        raise ValueError("probes must be a non-empty tuple of tokens")
    quoted = ", ".join("('" + p.replace("'", "''") + "')" for p in probes)
    in_list = ", ".join("'" + p.replace("'", "''") + "'" for p in probes)
    cell = (
        f"('0x' || substr(md5(tok || '{salt}' || CAST(i AS VARCHAR)), 1, 15))"
        f"::UBIGINT % {w}"
    )
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split({text_expr}, ' '), x -> x <> '')) AS tok
  FROM {table}
),
cells AS (
  SELECT t.i, {cell} AS cell FROM toks, range({d}) t(i)
),
sketch AS (
  SELECT i, cell, CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY i, cell
),
probes(tok) AS (VALUES {quoted}),
pc AS (
  SELECT tok, t.i, {cell} AS cell FROM probes, range({d}) t(i)
),
est AS (
  SELECT tok, min(coalesce(n, 0)) AS cms_count
  FROM pc LEFT JOIN sketch USING (i, cell) GROUP BY tok
),
ex AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
  FROM toks WHERE tok IN ({in_list}) GROUP BY tok
)
SELECT p.tok, coalesce(ex.exact_count, 0) AS exact_count,
       CAST(est.cms_count AS BIGINT) AS cms_count
FROM probes p JOIN est USING (tok) LEFT JOIN ex USING (tok)
"""
