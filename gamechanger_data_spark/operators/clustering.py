"""Distributed k-means over embedding columns — Lloyd's algorithm in the
canonical Spark iterative shape: the CORPUS never leaves the cluster; only
the k x dim centroid table passes through the driver between iterations
(collected, rounded, re-broadcast), so each round is one broadcast
cross-join + two map-side-combining aggregates over the data.

Used as the data-curation clustering stage (topic buckets for mixture
balancing, stratified sampling, near-dup triage above the pair level) —
the reference's ML topic enrichment (F18-F20) is out of engine scope, but
its relational skeleton is exactly this operator.

Determinism contract (what makes the DuckDB oracle bit-reproducible):
  * init = the k vectors with the SMALLEST portable md5 hash of their id
    (k-th-minimum seeding — engine-independent, no RNG);
  * assignment ties break on the lower cluster id (min over (dist, cl));
  * centroids are rounded to 6 dp after every update, absorbing the
    ~1e-13 summation-order noise between engines (and between Spark
    runs) before it can move an assignment boundary;
  * a cluster that loses every member drops out (both engines derive the
    next centroid set purely from the assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gamechanger_data_spark.operators.sampling import hash_bucket60, hash_bucket60_sql


def _sqdist(vec, cent):
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _points(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("pid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )


def _assign(pts: DataFrame, centroids: list) -> DataFrame:
    """(pid, cl, v): nearest centroid per point, ties to the lower cluster
    id — centroids broadcast as a literal table, argmin is one map-side-
    combining min(struct) aggregate."""
    cent = pts.sparkSession.createDataFrame(centroids, "cl int, c array<double>")
    scored = pts.crossJoin(F.broadcast(cent)).select(
        "pid", "v", "cl", _sqdist(F.col("v"), F.col("c")).alias("d")
    )
    return scored.groupBy("pid").agg(
        F.min(F.struct("d", "cl")).getField("cl").alias("cl"),
        F.first("v").alias("v"),
    )


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    iters: int = 3,
) -> list:
    """Final ``[(cl, [dim floats]), ...]`` after ``iters`` Lloyd rounds
    from deterministic k-minimum-hash seeds; centroid means rounded to
    6 dp each round (the engine-reproducibility contract)."""
    pts = _points(df, vec_col, id_col)
    seed = (
        pts.select("pid", "v", hash_bucket60("pid").alias("h"))
        .orderBy("h", "pid")
        .limit(k)
        .collect()
    )
    centroids = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seed)]
    for _ in range(iters):
        means = (
            _assign(pts, centroids)
            .select("cl", F.posexplode("v").alias("pos", "x"))
            .groupBy("cl", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
        )
        new = (
            means.groupBy("cl")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .collect()
        )
        centroids = sorted((r["cl"], [float(x) for x in r["c"]]) for r in new)
    return centroids


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    iters: int = 3,
) -> DataFrame:
    """(id_col, cluster) after ``iters`` Lloyd rounds from deterministic
    k-minimum-hash seeds. Each round: broadcast the centroid literals,
    assign by squared L2 (argmin, ties to the lower cluster id), update
    centroids as per-dimension means rounded to 6 dp. Centroid state is
    k x dim floats on the driver — the corpus itself only ever streams
    through one crossJoin + two aggregates per round."""
    pts = _points(df, vec_col, id_col)
    centroids = kmeans_centroids(df, vec_col, id_col, k, iters)
    return _assign(pts, centroids).select(
        F.col("pid").alias(id_col), F.col("cl").alias("cluster")
    )


def sqdist_sql(pt_alias: str = "p", cent_alias: str = "c") -> str:
    """DuckDB squared-L2 between ``<pt>.v`` and ``<cent>.c`` (sequential
    list_sum matches the Spark fold order)."""
    p, c = pt_alias, cent_alias
    return (
        f"list_sum(list_transform(range(len({p}.v)), "
        f"i -> ({p}.v[i+1] - {c}.c[i+1]) * ({p}.v[i+1] - {c}.c[i+1])))"
    )


def kmeans_chain_sql(
    table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    iters: int = 3,
) -> tuple[str, str]:
    """The shared CTE chain (pts + seeds + ``iters`` Lloyd rounds) and the
    name of the final-centroid CTE — composed by both :func:`kmeans_sql`
    and the IVF oracle. The fragment starts after ``WITH``."""
    h = hash_bucket60_sql("pid")  # pts renames id_col -> pid
    sq = sqdist_sql()
    sql = f"""pts AS (
  SELECT {id_col} AS pid, list_transform({vec_col}, x -> x::DOUBLE) AS v
  FROM {table}
),
seed AS (SELECT pid, v, {h} AS h FROM pts ORDER BY h, pid LIMIT {k}),
c0 AS (
  SELECT row_number() OVER (ORDER BY h, pid) - 1 AS cl, v AS c FROM seed
),
"""
    prev = "c0"
    for t in range(1, iters + 1):
        sql += f"""a{t} AS (
  SELECT pid, v, cl FROM (
    SELECT p.pid, p.v, c.cl,
           row_number() OVER (PARTITION BY p.pid ORDER BY {sq}, c.cl) AS rn
    FROM pts p CROSS JOIN {prev} c
  ) WHERE rn = 1
),
c{t} AS (
  SELECT cl, list(m ORDER BY i) AS c FROM (
    SELECT cl, i, round(avg(x), 6) AS m FROM (
      SELECT cl, unnest(v) AS x, unnest(range(len(v))) AS i FROM a{t}
    ) GROUP BY cl, i
  ) GROUP BY cl
),
"""
        prev = f"c{t}"
    return sql, prev


def kmeans_sql(
    table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    iters: int = 3,
) -> str:
    """DuckDB twin of :func:`kmeans_assign` as one unrolled CTE chain —
    same seeds, same tie rule, same 6 dp centroid rounding."""
    chain, final = kmeans_chain_sql(table, vec_col, id_col, k, iters)
    sq = sqdist_sql()
    return f"""
WITH {chain}fin AS (
  SELECT p.pid, c.cl,
         row_number() OVER (PARTITION BY p.pid ORDER BY {sq}, c.cl) AS rn
  FROM pts p CROSS JOIN {final} c
)
SELECT pid AS {id_col}, CAST(cl AS INT) AS cluster FROM fin WHERE rn = 1
"""
