"""ANN recall evidence vs the exact brute-force baseline (driver testdata).

Two regimes, measured at sf0.001/sf0.01-scale corpora:

* NEAR-DUP retrieval (the regime LSH is for): queries are corpus vectors
  with small deterministic perturbations (cos ~ 0.99 to their source).
  Sign-LSH with Hamming<=2 multi-probe recovers the planted neighbor with
  recall >= 0.9 (measured 1.00 at sf0.01, planes 6/8).

* Quasi-random corpora: the true top-10 of this synthetic embedding table
  sit near theta ~ 70 deg (cos 0.27-0.40), where the per-plane collision
  probability c = 1 - theta/pi ~ 0.6 makes c^P vanish — no sign-LSH
  configuration prunes meaningfully (measured recall@10: 1 table P=8
  hd=2 -> 0.42; 8 tables P=6 -> 0.46). The engine's guidance is
  brute_force_topk for that regime; these tests pin the measured floors
  so a regression in the candidate generation is caught.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gamechanger_data_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
    lsh_multitable_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _recall(truth: dict, got_pdf) -> float:
    g: dict = {}
    for r in got_pdf.itertuples():
        g.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(g.get(k, set()) & v) for k, v in truth.items())
    return hits / sum(len(v) for v in truth.values())


def _truth(exact_pdf) -> dict:
    t: dict = {}
    for r in exact_pdf.itertuples():
        t.setdefault(r.q_id, set()).add(r.vec_id)
    return t


def test_neardup_recall_at_least_0_9(spark, emb):
    """Planted near-dup queries (corpus vector + small noise): the LSH
    path must find the planted neighbor with recall >= 0.9."""
    pdf = emb.filter(F.col("vec_id") < 20).toPandas()
    rng = np.random.default_rng(7)
    qrows = []
    for r in pdf.itertuples():
        v = np.array(r.embedding, dtype=np.float64)
        p = v + 0.15 * np.linalg.norm(v) / 8.0 * rng.standard_normal(len(v))
        qrows.append((int(r.vec_id), [float(x) for x in p]))
    q = spark.createDataFrame(qrows, "q_id long, q_vec array<double>")

    got = lsh_bucketed_topk(
        emb, q, k=10, n_planes=8, probe_hamming=2
    ).select("q_id", "vec_id").toPandas()
    g: dict = {}
    for r in got.itertuples():
        g.setdefault(r.q_id, set()).add(r.vec_id)
    planted_recall = sum(1 for k in g if k in g[k]) / len(qrows)
    assert planted_recall >= 0.9, planted_recall


def test_multiprobe_recovers_recall(spark, emb):
    """Hamming<=2 probing must strictly improve recall@10 over the bare
    single-bucket lookup, and stay above the measured floor."""
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = _truth(brute_force_topk(emb, q, k=10).toPandas())
    r0 = _recall(truth, lsh_bucketed_topk(
        emb, q, k=10, n_planes=8, probe_hamming=0).toPandas())
    r2 = _recall(truth, lsh_bucketed_topk(
        emb, q, k=10, n_planes=8, probe_hamming=2).toPandas())
    assert r2 > r0
    assert r2 >= 0.25  # measured ~0.4 at sf0.01 on this quasi-random corpus


def test_multitable_beats_single_table(spark, emb):
    """8 independent tables must beat one table at equal plane count
    (LSH amplification), above the measured floor."""
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = _truth(brute_force_topk(emb, q, k=10).toPandas())
    r1 = _recall(truth, lsh_bucketed_topk(
        emb, q, k=10, n_planes=6, probe_hamming=0).toPandas())
    r8 = _recall(truth, lsh_multitable_topk(
        emb, q, k=10, n_tables=8, n_planes=6).toPandas())
    assert r8 > r1
    assert r8 >= 0.3  # measured ~0.46 at sf0.01


def test_blocked_neardup_pairs_match_exact_above_threshold(spark, emb):
    """The LSH-blocked near-dup pair operator must return a SUBSET of the
    exact pairs, and at a high threshold (true near-dups) find them all."""
    from gamechanger_data_spark.operators.similarity import cosine_neardup_pairs

    exact = cosine_neardup_pairs(emb, threshold=0.5, exact=True).toPandas()
    blocked = cosine_neardup_pairs(
        emb, threshold=0.5, n_planes=4, probe_hamming=2
    ).toPandas()
    e = set(zip(exact.id_a, exact.id_b))
    b = set(zip(blocked.id_a, blocked.id_b))
    assert b <= e  # no false pairs
    if e:
        assert len(b) / len(e) >= 0.8, (len(b), len(e))


def test_ivf_recall_beats_sign_lsh_on_quasi_random(spark, emb):
    """IVF (data-adapted Voronoi cells) on the quasi-random corpus: with
    3 of 8 cells probed (~3/8 of the corpus scored) recall@10 must beat
    the measured sign-LSH floor (~0.42-0.46) decisively — the regime
    argument for offering a learned partition next to the planes."""
    from gamechanger_data_spark.operators.similarity import ann_ivf_topk

    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = _truth(brute_force_topk(emb, queries, k=10).toPandas())
    got = ann_ivf_topk(
        emb, queries, k=10, n_cells=8, n_probe=3, train_iters=2
    ).toPandas()
    r = _recall(truth, got)
    assert r >= 0.6, r


def test_ivf_neardup_recall(spark, emb):
    """Planted near-dups land in the SAME cell as their source almost
    surely (cos ~0.99 >> cell diameter) -> IVF recall ~1 on that regime."""
    import numpy as np

    from gamechanger_data_spark.operators.similarity import ann_ivf_topk

    pdf = emb.filter(F.col("vec_id") < 20).toPandas()
    rng = np.random.default_rng(11)
    qrows = []
    for r in pdf.itertuples():
        v = np.array(r.embedding, dtype=np.float64)
        p = v + 0.02 * np.linalg.norm(v) * rng.standard_normal(len(v)) / np.sqrt(len(v))
        qrows.append((int(r.vec_id), [float(x) for x in p]))
    queries = spark.createDataFrame(qrows, "q_id long, q_vec array<double>")
    got = ann_ivf_topk(emb, queries, k=1, n_cells=8, n_probe=2,
                       train_iters=2).toPandas()
    planted = (got[got["rank"] == 1].set_index("q_id").vec_id)
    hit = sum(planted.get(q, -1) == q for q, _ in qrows) / len(qrows)
    assert hit >= 0.9, hit
