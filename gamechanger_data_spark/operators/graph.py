"""Connected components over candidate-pair graphs — the clustering stage
that turns near-dup PAIRS (minhash/simhash/embedding LSH output) into
dedup CLUSTERS with a canonical representative per cluster.

Spark has no native graph operator; this is iterative min-label
propagation composed purely of DataFrame joins/aggregates (the
hash-to-min family: Rastogi et al., "Finding Connected Components in
MapReduce and Beyond", and the label-propagation step GraphX/GraphFrames
use). Each round does

  1. neighbor-min: label(v) <- min(label(v), min over neighbors u of
     label(u)) — one shuffle join edges x labels + one map-side-combined
     min aggregate;
  2. pointer jumping: label(v) <- min(label(v), label(label(v))) — one
     self-join, which collapses chains and gives O(log diameter)
     convergence instead of O(diameter).

Labels are always vertex ids within the same component and only ever
decrease, so the fixpoint labels every vertex with its component's min id.

Scale shape (the 100 TB lens): per round, two key-hashed shuffle joins +
one partial-agg min — no broadcast of anything O(V), no collect; the
driver only sees a 1-row convergence probe per round. ``localCheckpoint``
truncates the iterative lineage each round (the standard Spark idiom for
iterative algorithms — without it the plan doubles every round). Dedup
graphs are sparse with tiny components, so rounds ~ log(max cluster
diameter), typically 2-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster_id) for every vertex appearing in ``pairs``;
    cluster_id is the component's minimum vertex id. Raises if the graph
    has not converged after ``max_iter`` rounds (pointer jumping makes
    that ~2**25-diameter — unreachable for real dedup graphs)."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().persist()

    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lab"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter):
            nmin = (
                edges.join(
                    labels.select(F.col("id").alias("u"), "lab"), "u"
                )
                .groupBy(F.col("v").alias("id"))
                .agg(F.min("lab").alias("nlab"))
            )
            m = labels.join(nmin, "id", "left").select(
                "id", F.least("lab", "nlab").alias("lab")
            )
            jump = m.select(F.col("id").alias("jid"), F.col("lab").alias("jlab"))
            new = (
                m.join(jump, m["lab"] == jump["jid"], "left")
                .select("id", F.least(m["lab"], jump["jlab"]).alias("lab"))
                .localCheckpoint()
            )
            changed = (
                new.withColumnRenamed("lab", "new_lab")
                .join(labels, "id")
                .where(F.col("new_lab") != F.col("lab"))
                .limit(1)
                .count()
            )
            labels = new
            if changed == 0:
                return labels.withColumnRenamed("lab", "cluster_id")
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        edges.unpersist()


def dedup_cluster_assignments(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(doc_id, cluster_id, keep) for EVERY document: near-dup components
    share a cluster_id (their min member id), singletons are their own
    cluster, and ``keep`` marks the canonical representative (min id) —
    the keep-one-per-cluster policy a training-data dedup pass applies."""
    cc = connected_components(pairs, src=src, dst=dst)
    out = docs.select(F.col(id_col)).join(
        cc.select(F.col("id").alias(id_col), "cluster_id"), id_col, "left"
    )
    cluster = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("keep"),
    )
