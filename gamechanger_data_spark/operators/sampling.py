"""Deterministic sampling / split assignment for training-data pipelines.

A 100 TB corpus pipeline needs REPRODUCIBLE subsets: holdout splits that
survive re-runs and cluster-size changes, sample rates that don't depend
on partition layout (``df.sample`` is seed+partition dependent), and
decontamination-style audits over the same frozen subsets. The standard
trick is hash-threshold sampling: a row is in the sample iff
``uniform_hash(key || salt) < rate``, so membership is a pure function of
the key — stable across runs, engines, partitionings, and appends.

The hash here is the repo's portable md5-60-bit integer (same
construction the dedup/ANN oracles use): Spark
``conv(substr(md5(x),1,15),16,10)`` == DuckDB
``('0x' || substr(md5(x),1,15))::UBIGINT``, so an external SQL engine
reproduces every sample bit-exactly. Comparisons stay in the INTEGER
domain (thresholds are ``floor(rate * 2^60)``) — no float rounding at
the boundary.

Everything is a native filter/CASE over one md5 per row: embarrassingly
parallel, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 60  # 15 hex chars of md5


def hash_bucket60(col: Column | str, salt: str = "") -> Column:
    """Uniform 60-bit integer from md5(key || salt) — the portable hash
    shared with the DuckDB oracles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 15), 16, 10
    ).cast("long")


def hash_bucket60_sql(expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket60`."""
    return (
        f"('0x' || substr(md5(CAST({expr} AS VARCHAR) || '{salt}'), 1, 15))::UBIGINT"
    )


def threshold(rate: float) -> int:
    """Integer threshold for a [0,1] rate in the 60-bit hash space."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * _HASH_SPACE)


def sample_by_hash(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Deterministic ``rate`` sample keyed on ``key_col``: membership is a
    pure function of the key, independent of partitioning, run, or engine
    (unlike ``DataFrame.sample``). Change ``salt`` to draw an independent
    sample."""
    return df.filter(hash_bucket60(key_col, salt) < F.lit(threshold(rate)))


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/val/test ``split`` column from cumulative
    hash thresholds. A key keeps its split forever (append-stable), and
    disjointness/coverage are structural (CASE over one hash)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {weights}")
    h = hash_bucket60(key_col, salt)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = h < F.lit(threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def split_assign_sql(
    key_expr: str, weights: dict[str, float] | None = None, salt: str = ""
) -> str:
    """DuckDB CASE expression mirroring :func:`split_assign`."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = hash_bucket60_sql(key_expr, salt)
    parts, acc = [], 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        parts.append(f"WHEN {h} < {threshold(acc)} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def stratified_sample_by_hash(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-group deterministic sampling — the mixture-balancing primitive
    (down-weight an over-represented source/cluster/language to target
    proportions while keeping membership a pure function of the key).

    Each group gets its own integer threshold; a key's hash is computed
    ONCE, so the whole filter is a single codegen CASE over one md5 —
    zero shuffle, partition/run/append-stable, and raising a group's rate
    later only ADDS rows (the kept set is monotone in the rate: the same
    property that makes single-rate hash sampling resumable). Groups
    absent from ``rates`` fall back to ``default_rate`` (0.0 = drop)."""
    h = hash_bucket60(key_col, salt)
    expr = None
    for g, r in sorted(rates.items()):
        cond = F.col(group_col) == F.lit(g)
        expr = F.when(cond, F.lit(threshold(r))) if expr is None else expr.when(
            cond, F.lit(threshold(r))
        )
    thresh = (
        F.lit(threshold(default_rate))
        if expr is None
        else expr.otherwise(F.lit(threshold(default_rate)))
    )
    return df.filter(h < thresh)


def stratified_sample_sql(
    rates: dict[str, float],
    group_expr: str,
    key_expr: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> str:
    """DuckDB WHERE-clause twin of :func:`stratified_sample_by_hash` —
    handles the empty-rates degenerate case (plain default threshold, a
    bare ``CASE ELSE`` is a syntax error) and quotes group names (they
    are data-derived strings)."""
    h = hash_bucket60_sql(key_expr, salt)
    if not rates:
        return f"{h} < {threshold(default_rate)}"
    cases = " ".join(
        f"WHEN {group_expr} = '{g.replace(chr(39), chr(39) * 2)}' "
        f"THEN {threshold(r)}"
        for g, r in sorted(rates.items())
    )
    return f"{h} < (CASE {cases} ELSE {threshold(default_rate)} END)"


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int = 64, salt: str = "ws"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, top-``k`` by the
    Efraimidis-Spirakis order key (Inf. Proc. Letters 97(5), 2006): each
    row draws u = uniform(key) and ranks by u^(1/weight) — the top-k by
    that key IS an exact weight-proportional sample. The uniform comes
    from the repo's portable md5-60-bit hash, so the draw (and therefore
    the SAMPLE ITSELF) is a pure function of the key: reproducible across
    runs, partitionings, engines, and appends — df.sample(weights) can't
    promise any of that.

    Ranking uses the log form ln(u)/weight (monotone in u^(1/w), avoids
    the near-1.0 clustering of the pow form for large weights).

    Scale shape: one md5 + one log per row, then global top-k — compiles
    to TakeOrderedAndProject (k rows kept per partition, k returned), no
    shuffle of the data itself. Weights are clamped to >= 1.

    PRECONDITION: ``key_col`` values must be DISTINCT. Duplicate keys draw
    identical rank keys, and the top-k cut then breaks ties at the
    k-boundary arbitrarily (differently across engines/partitionings), so
    reproducible membership holds only for distinct keys — pre-aggregate
    to one row per key (e.g. sum the weights) before sampling.

    Returns (key_col, weight, es_logkey) with the rank key rounded to
    6dp for cross-engine comparison.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = hash_bucket60(key_col, salt)
    # +1 keeps u in (0, 1] so ln(u) is finite (h == 0 is 2^-60 unlikely
    # but the guard costs nothing and the oracle mirrors it)
    u = (h + F.lit(1)).cast("double") / F.lit(float(_HASH_SPACE))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    es = F.log(u) / w
    return (
        df.select(
            F.col(key_col),
            w.cast("long").alias("weight"),
            es.alias("__es"),
        )
        .orderBy(F.desc("__es"))
        .limit(k)
        .select(key_col, "weight", F.round("__es", 6).alias("es_logkey"))
    )


def weighted_sample_sql(
    table: str,
    key_expr: str,
    weight_expr: str,
    k: int = 64,
    salt: str = "ws",
    key_alias: str | None = None,
) -> str:
    """DuckDB twin of :func:`weighted_sample` — bit-identical sample
    membership (the rank key is rounded to 6dp on both sides). The
    weight column floors before the BIGINT cast: Spark's
    ``cast(double as long)`` truncates while DuckDB's rounds, so a bare
    cast would diverge on fractional weights. ``key_alias`` names the
    output key column when ``key_expr`` is an expression rather than a
    bare column (an expression is not a valid alias)."""
    alias = key_alias or key_expr
    if not alias.isidentifier():
        raise ValueError(
            f"key_expr {key_expr!r} is not a bare column; pass key_alias"
        )
    h = hash_bucket60_sql(key_expr, salt)
    return f"""
WITH ranked AS (
  SELECT {key_expr} AS k,
         CAST(floor(greatest(CAST({weight_expr} AS DOUBLE), 1.0)) AS BIGINT)
           AS weight,
         ln(({h} + 1)::DOUBLE / {float(_HASH_SPACE)!r})
           / greatest(CAST({weight_expr} AS DOUBLE), 1.0) AS es
  FROM {table}
)
SELECT k AS {alias}, weight, round(es, 6) AS es_logkey
FROM ranked ORDER BY es DESC LIMIT {k}
"""
