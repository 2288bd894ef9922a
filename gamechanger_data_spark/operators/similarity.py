"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; the scale path is
LSH bucketing by deterministic random hyperplanes (signs of dot products
against seeded planes), which turns all-pairs search into per-bucket
search — the embedding analog of MinHash banding.

All arithmetic is double-precision (elements cast before accumulation) so
results match an external float64 oracle; no engine-private hash or RNG in
any comparison path (hyperplanes are generated driver-side from a fixed
seed and inlined as literals — the oracle SQL embeds the same numbers).

Scale notes: dot products are narrow per-row folds (codegen); brute-force
top-k against Q query vectors broadcasts the queries (no shuffle on the
corpus side) then takes a per-query top-k window over Q x N scored rows —
at 100 TB use the LSH variant which prunes N to the colliding buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Double-precision dot product fold over two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries is small -> broadcast cross join (corpus never shuffles for
    scoring); ranking window partitions by query id. Output:
    (q_id, vec_id, cos_sim rounded 6dp, rank)."""
    scored = vectors.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col(q_vec_col)).alias("cos"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, F.round("cos", 6).alias("cos_sim"), "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic seeded hyperplanes, rounded so they can be inlined as
    SQL literals bit-identically."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    return [[round(float(x), 6) for x in row] for row in planes]


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bucket id: bit p set iff vec . plane_p > 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in plane])
        bucket = bucket + F.when(dot_expr(vec, arr) > 0, F.lit(1 << p)).otherwise(0)
    return bucket.cast("int")


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Same output shape as brute_force_topk (rank within bucket).

    The bucket equi-join replaces the cross join — at 10^10 vectors each
    query touches ~N/2^n_planes rows; recall is tuned by n_planes and by
    multi-probe (querying neighboring buckets), which composes as a union.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    v = vectors.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), planes))
    qb = queries.withColumn("bucket", lsh_bucket_expr(F.col(q_vec_col), planes))
    scored = v.join(F.broadcast(qb), "bucket").select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col(q_vec_col)).alias("cos"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, F.round("cos", 6).alias("cos_sim"), "rank")
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.5,
    max_id: int | None = 500,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.

    The exact all-pairs form (optionally id-capped for the test corpus);
    the scale path blocks by LSH bucket first (see lsh_bucketed_topk) so
    the self-join degree drops from N to bucket size."""
    v = vectors.select(id_col, vec_col)
    if max_id is not None:
        v = v.filter(F.col(id_col) < max_id)
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                cosine_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
