"""Unit tests for dedup/similarity/multimodal operators against small
independent (pandas/numpy) oracles."""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gamechanger_data_spark.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from gamechanger_data_spark.operators.dedup import (
    exact_dedup,
    minhash_signature,
    portable_hash64,
    shingles_expr,
)
from gamechanger_data_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the  quick   brown fox jumps over the lazy dog"),  # dup after normalize
    (3, "pack my box with five dozen liquor jugs"),
    (4, "sphinx of black quartz judge my vow"),
]


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = exact_dedup(df).orderBy("canonical_id").toPandas()
    # docs 0,1,2 collapse to one group (whitespace squash), canonical 0
    assert len(out) == 3
    assert out.iloc[0].canonical_id == 0 and out.iloc[0].n_dupes == 3


def test_shingles_and_portable_hash(spark):
    df = spark.createDataFrame([(0, "a b c d")], ["doc_id", "text"])
    sh = df.select(shingles_expr("text", 3).alias("s")).collect()[0]["s"]
    assert sh == ["a b c", "b c d"]
    got = df.select(portable_hash64(F.lit("tok"), 7).alias("h")).collect()[0]["h"]
    want = int(hashlib.md5(b"7#tok").hexdigest()[:15], 16)
    assert got == want


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    sig = minhash_signature(df, n_hashes=6).toPandas().set_index("doc_id")
    for i in range(6):
        assert sig.loc[0, f"minhash_{i}"] == sig.loc[1, f"minhash_{i}"]
    # different docs should differ in at least one hash
    assert any(
        sig.loc[0, f"minhash_{i}"] != sig.loc[3, f"minhash_{i}"] for i in range(6)
    )


def _np_topk(vecs: dict[int, np.ndarray], q: np.ndarray, k: int):
    sims = {
        i: float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in vecs.items()
    }
    return sorted(sims, key=lambda i: (-sims[i], i))[:k]


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = {i: rng.standard_normal(16) for i in range(50)}
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    q = vecs[0]
    qdf = spark.createDataFrame([(0, [float(x) for x in q])], ["q_id", "q_vec"])
    got = (
        brute_force_topk(vdf, qdf, k=5)
        .orderBy("rank")
        .toPandas()["vec_id"]
        .tolist()
    )
    assert got == _np_topk(vecs, q, 5)


def test_lsh_topk_subset_of_bucket(spark):
    rng = np.random.default_rng(11)
    vecs = {i: rng.standard_normal(16) for i in range(80)}
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]])], ["q_id", "q_vec"]
    )
    got = lsh_bucketed_topk(vdf, qdf, k=5, n_planes=2, dim=16).toPandas()
    # query vector is its own bucket-mate and nearest neighbor
    assert got.iloc[0].vec_id == 0 and abs(got.iloc[0].cos_sim - 1.0) < 1e-9


def test_multimodal_features_deterministic(spark):
    media = synthesize_media(spark, n=30, seed=42)
    out = extract_features(media).orderBy("media_id").toPandas()
    assert len(out) == 30
    assert (~out.decoded).all()  # no codecs in container -> stub path
    # sha256 must match payload bytes recomputed independently
    blob0 = hashlib.sha256(b"42:0").digest() * 8
    assert out.iloc[0].payload_sha256 == hashlib.sha256(blob0).hexdigest()
    assert out.iloc[0].n_bytes == len(blob0)


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=30, seed=42)
    plan = frame_sample_plan(media, every_n=10).toPandas()
    assert (plan.frame_idx % 10 == 0).all()
    vids = media.filter("media_type = 'video'").count()
    assert plan.media_id.nunique() == vids


def test_minhash_verified_confirms_and_caps(spark):
    """minhash_lsh_verified must (a) confirm genuine near-dups with exact
    Jaccard, (b) reject band-collision false positives below threshold, and
    (c) survive a degenerate corpus: 200 identical repeated-token docs form
    one giant LSH bucket that the bucket cap drops instead of exploding
    into ~20k pairs on one reducer."""
    from gamechanger_data_spark.operators.dedup import minhash_lsh_verified

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")
    rows = [(1, base), (2, near), (3, "completely different words about spark engines")]
    rows += [(100 + i, "spam " * 50) for i in range(200)]  # degenerate
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = minhash_lsh_verified(df, threshold=0.4, max_bucket=64).toPandas()
    pairs = set(zip(got.id_a, got.id_b))
    assert (1, 2) in pairs  # confirmed near-dup
    # no degenerate-bucket pair survived (they'd be ~20k rows)
    assert not any(a >= 100 and b >= 100 for a, b in pairs)
    assert (got.jaccard >= 0.4).all()


def test_minhash_lsh_pairs_default_caps_survive_degenerate_corpus(spark):
    """The DEFAULT minhash_lsh_pairs API must carry the skew caps: 200
    identical repeated-token docs form one giant LSH bucket that the
    default bucket cap drops instead of emitting ~20k pairs on one reducer
    (round-2 shipped unsafe None defaults for catalog compatibility)."""
    from gamechanger_data_spark.operators.dedup import minhash_lsh_pairs

    rows = [(1, "the quick brown fox jumps over the lazy dog by the river"),
            (2, "the quick brown fox jumps over the lazy dog by the creek")]
    rows += [(100 + i, "spam " * 50) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = minhash_lsh_pairs(df).toPandas()  # defaults: 512/64 caps ON
    assert not any((got.id_a >= 100) & (got.id_b >= 100))
