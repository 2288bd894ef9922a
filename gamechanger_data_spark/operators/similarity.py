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


def probe_masks(n_planes: int, probe_hamming: int) -> list[int]:
    """XOR masks for multi-probe: every bucket within Hamming distance
    <= probe_hamming of the query's bucket (0 -> just the home bucket)."""
    from itertools import combinations

    masks = [0]
    for d in range(1, probe_hamming + 1):
        for bits in combinations(range(n_planes), d):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    probe_hamming: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket(s). Same output shape as brute_force_topk (rank within probed
    candidates).

    The bucket equi-join replaces the cross join — at 10^10 vectors each
    query touches ~(probes / 2^n_planes) * N rows. Recall tunes on two
    axes: ``n_planes`` (smaller buckets, lower recall per bucket) and
    ``probe_hamming`` MULTI-PROBE (each query also scores buckets whose
    code differs in <= that many bits — the standard recall recovery that
    costs probes-many broadcast rows, not a bigger shuffle). Recall@10 vs
    the exact baseline is measured in tests/test_ann_recall.py.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    v = vectors.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), planes))
    qb = queries.withColumn("bucket", lsh_bucket_expr(F.col(q_vec_col), planes))
    masks = probe_masks(n_planes, probe_hamming)
    if len(masks) > 1:
        qb = qb.withColumn(
            "bucket",
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
            ),
        )
    scored = v.join(F.broadcast(qb), "bucket").select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_expr(F.col(vec_col), F.col(q_vec_col)).alias("cos"),
    )
    if len(masks) > 1:
        # a (query, vector) pair can collide through several probes; dedup
        # before ranking so row_number ranks distinct candidates
        scored = scored.distinct()
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, F.round("cos", 6).alias("cos_sim"), "rank")
    )


def lsh_multitable_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Multi-TABLE LSH ANN: L independent plane sets; a candidate is any
    vector sharing a bucket with the query in ANY table (standard LSH
    amplification: per-neighbor recall 1-(1-c^P)^L for per-plane collision
    probability c = 1 - theta/pi).

    Physical plan: corpus rows explode into L (table, bucket) postings —
    an L-x write-side fanout of ids+vectors (the classic LSH space/recall
    trade) — joined against the broadcast query postings, candidates
    dedup'd, then scored once per distinct candidate. Candidate volume per
    query ~ L * N / 2^P instead of N.

    Recall regimes (measured, tests/test_ann_recall.py): near-duplicate
    neighbors (cos >= ~0.9) are recovered at >= 0.9 recall with small L;
    for quasi-random corpora whose true top-k sit near theta ~ 70
    degrees, NO sign-LSH configuration prunes meaningfully (c ~ 0.6 =>
    c^P vanishes) — use brute_force_topk there; this is geometry, not an
    implementation limit."""
    tb = []
    qtb = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed=seed + 7919 * t)
        tb.append(F.struct(
            F.lit(t).alias("t"),
            lsh_bucket_expr(F.col(vec_col), planes).alias("b"),
        ))
        qtb.append(F.struct(
            F.lit(t).alias("t"),
            lsh_bucket_expr(F.col(q_vec_col), planes).alias("b"),
        ))
    v = vectors.select(
        id_col, vec_col, F.explode(F.array(*tb)).alias("tb")
    ).select(id_col, vec_col, "tb.t", "tb.b")
    qx = queries.select(
        q_id_col, q_vec_col, F.explode(F.array(*qtb)).alias("tb")
    ).select(q_id_col, q_vec_col, "tb.t", "tb.b")
    cand = (
        v.join(F.broadcast(qx), ["t", "b"])
        .select(q_id_col, id_col, vec_col, q_vec_col)
        .dropDuplicates([q_id_col, id_col])
    )
    scored = cand.select(
        q_id_col, id_col,
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
    max_id: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exact: bool = False,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.

    DEFAULT is the LSH-BLOCKED form: candidate pairs come from shared
    hyperplane-sign buckets (with Hamming<=probe_hamming probe expansion to
    recover boundary-crossing pairs), so the self-join degree is bucket
    size, never N — safe to call on a 10^10-vector corpus. ``exact=True``
    is the explicit all-pairs escape hatch (O(n^2) cross join — exactness
    baseline for small/capped corpora only; round-1 shipped this as the
    default and the cap was the only guard)."""
    v = vectors.select(id_col, vec_col)
    if max_id is not None:
        v = v.filter(F.col(id_col) < max_id)
    if exact:
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
    planes = random_hyperplanes(dim, n_planes, seed)
    vb = v.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), planes))
    masks = probe_masks(n_planes, probe_hamming)
    expanded = vb.withColumn(
        "pb",
        F.explode(F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])),
    ).select(F.col(id_col).alias("id_a"), F.col("pb"))
    cand = (
        expanded.join(
            vb.select(F.col(id_col).alias("id_b"), F.col("bucket")),
            (F.col("pb") == F.col("bucket")) & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    x = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    y = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .select(
            "id_a", "id_b",
            F.round(cosine_expr(F.col("__va"), F.col("__vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 3,
    train_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF (inverted-file) ANN: the learned-partition counterpart of the
    sign-plane LSH variants. A coarse k-means quantizer (deterministic
    k-minimum-hash seeding, operators/clustering.py) splits the corpus
    into ``n_cells`` Voronoi cells; each query probes only its ``n_probe``
    nearest cells and scores exact cosine inside them.

    Scale shape: cell assignment is one broadcast crossJoin + min(struct)
    over the corpus (cells = a materializable column — at 10^10 vectors
    you'd persist it alongside the table, the FAISS IVF file layout);
    scoring cost per query = the probed cells' population (~n_probe/
    n_cells of the corpus), never N. Against quasi-random sandbox vectors
    IVF prunes without the recall cliff sign-LSH hits (data-adapted cells
    vs data-oblivious planes); tests/test_ann_recall.py pins both.
    """
    from gamechanger_data_spark.operators.clustering import (
        _assign,
        _points,
        _sqdist,
        kmeans_centroids,
    )

    cents = kmeans_centroids(vectors, vec_col, id_col, k=n_cells,
                             iters=train_iters)
    cells = _assign(_points(vectors, vec_col, id_col), cents).select(
        F.col("pid").alias(id_col), "cl"
    )
    corpus = vectors.select(id_col, vec_col).join(cells, id_col)

    cent = vectors.sparkSession.createDataFrame(cents, "cl int, c array<double>")
    qpts = queries.select(
        F.col(q_id_col),
        F.col(q_vec_col),
        F.transform(F.col(q_vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    wq = Window.partitionBy(q_id_col).orderBy("d", "cl")
    probes = (
        qpts.crossJoin(F.broadcast(cent))
        .select(q_id_col, q_vec_col, "cl",
                _sqdist(F.col("qv"), F.col("c")).alias("d"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(q_id_col, q_vec_col, "cl")
    )
    scored = corpus.join(F.broadcast(probes), "cl").select(
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
