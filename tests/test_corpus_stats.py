"""Corpus-statistics operators (functions/analysis.py): TF-IDF top-k and
add-one unigram surprise."""

import math

from gamechanger_data_spark.functions.analysis import tfidf_topk, unigram_surprise


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", "apple apple apple banana common common"),
            ("d2", "banana cherry common common"),
            ("d3", "common common common"),
        ],
        "doc_id string, text string",
    )


def test_tfidf_rare_term_outranks_common(spark):
    out = {
        (r.doc_id, r.rank): (r.term, r.tf, r.score)
        for r in tfidf_topk(_docs(spark), k=2).collect()
    }
    # d1: 'apple' (tf=3, df=1) must beat 'common' (tf=2, df=3)
    assert out[("d1", 1)][0] == "apple"
    idf = lambda df: math.log(4.0 / (df + 1)) + 1.0
    assert abs(out[("d1", 1)][2] - round(3 * idf(1), 6)) < 1e-9
    # d3 has one distinct term only -> single row, rank 1 = 'common'
    assert out[("d3", 1)][0] == "common" and ("d3", 2) not in out


def test_tfidf_tie_breaks_on_term_asc(spark):
    docs = _docs(spark).union(
        _docs(spark).sparkSession.createDataFrame(
            [("d4", "zed axe")], "doc_id string, text string"
        )
    )
    rows = {r.rank: r.term for r in tfidf_topk(docs, k=2).where("doc_id='d4'").collect()}
    assert rows == {1: "axe", 2: "zed"}  # equal tf & df -> lexicographic


def test_unigram_surprise_matches_hand_formula_and_ranks_rarity(spark):
    got = {r.doc_id: r.surprise for r in unigram_surprise(_docs(spark)).collect()}
    # corpus: apple×3 banana×2 cherry×1 common×7 -> T=13, V=4
    nlp = lambda c: -math.log((c + 1.0) / 17.0)
    want_d3 = round(nlp(7), 6)
    assert abs(got["d3"] - want_d3) < 1e-6
    want_d2 = round((nlp(2) + nlp(1) + 2 * nlp(7)) / 4.0, 6)
    assert abs(got["d2"] - want_d2) < 1e-6
    # rarity ranking: all-common d3 is least surprising
    assert got["d3"] < got["d1"] < got["d2"]


def test_no_term_docs_absent(spark):
    docs = spark.createDataFrame(
        [("d1", "hello world"), ("d2", "1234 !!!")], "doc_id string, text string"
    )
    assert unigram_surprise(docs).count() == 1
    assert tfidf_topk(docs).where("doc_id='d2'").count() == 0


def test_remove_boilerplate_scrubs_shared_paragraphs(spark):
    from gamechanger_data_spark.functions.segment import remove_boilerplate

    footer = "(c) 2026 Example Corp. All rights reserved."
    docs = spark.createDataFrame(
        [
            ("d1", f"unique one\n\n{footer}"),
            ("d2", f"{footer}\n\nunique two\n\nunique three"),
            ("d3", f"unique   four\n\n{footer}"),
            ("d4", footer),  # nothing survives -> absent from output
        ],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in remove_boilerplate(docs, min_docs=3).collect()}
    assert set(out) == {"d1", "d2", "d3"}
    assert out["d1"].text == "unique one" and out["d1"].n_dropped == 1
    assert out["d2"].text == "unique two\n\nunique three"  # order preserved
    assert out["d3"].text == "unique four"  # whitespace-normalized compare
    # below the df threshold nothing is dropped
    assert remove_boilerplate(docs, min_docs=5).count() == 4


def test_kmv_estimate_accuracy_and_exact_smallcard(spark):
    from pyspark.sql import functions as F2

    from gamechanger_data_spark.operators.sketch import kmv_distinct

    # 5000 rows over 1000 distinct keys, k=128 -> stderr ~ 1/sqrt(126) ≈ 9%
    df = spark.range(5000).select(F2.pmod("id", F2.lit(1000)).alias("k"))
    row = kmv_distinct(df, "k", k=128).collect()[0]
    assert row.k_used == 128
    assert abs(row.estimate - 1000) / 1000 < 0.3
    # below-k cardinality: the sketch returns the EXACT count
    small = spark.range(40).select(F2.col("id").alias("k"))
    r2 = kmv_distinct(small, "k", k=128).collect()[0]
    assert r2.k_used == 40 and r2.estimate == 40.0
    # determinism: same input, any partitioning -> identical sketch
    r3 = kmv_distinct(df.repartition(17), "k", k=128).collect()[0]
    assert (r3.kth_hash, r3.estimate) == (row.kth_hash, row.estimate)


def test_kmeans_separable_blobs_and_determinism(spark):
    import numpy as np

    from gamechanger_data_spark.operators.clustering import kmeans_assign

    rng = np.random.default_rng(7)
    corners = np.eye(3) * 10.0
    rows = [
        (int(i), (corners[i % 3] + rng.normal(0, 0.1, 3)).tolist())
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign(df, k=3, iters=4).toPandas()
    assert len(out) == 90
    # perfectly separable blobs -> cluster assignment == blob membership
    blob = out.vec_id % 3
    table = out.groupby([blob, "cluster"]).size().unstack(fill_value=0)
    assert (table.gt(0).sum(axis=1) == 1).all()  # each blob in ONE cluster
    assert table.to_numpy().max(axis=1).sum() == 90
    # partitioning-independent
    out2 = kmeans_assign(df.repartition(13), k=3, iters=4).toPandas()
    assert out.sort_values("vec_id").cluster.tolist() == \
        out2.sort_values("vec_id").cluster.tolist()


def test_content_chunks_resynchronize_after_prefix_edit(spark):
    """The CDC property: the same tail text chunked identically no matter
    what prefix precedes it — downstream boundaries re-synchronize, which
    fixed-size chunking structurally cannot do."""
    from gamechanger_data_spark.functions.segment import content_chunks

    tail = " ".join(f"w{i % 53}x{i % 7}" for i in range(400))
    docs = spark.createDataFrame(
        [("a", tail), ("b", "PREFIX ALPHA " + tail),
         ("c", "completely different longer prefix here " + tail)],
        "doc_id string, text string",
    )
    out = content_chunks(docs, modulus=16).toPandas()
    chunks = {
        d: set(g.chunk_text) for d, g in out.groupby("doc_id")
    }
    # all tail chunks (everything after the first re-sync point) shared
    common = chunks["a"] & chunks["b"] & chunks["c"]
    assert len(common) >= 0.8 * len(chunks["a"])
    # token conservation: chunks partition each doc's token stream
    n = out.groupby("doc_id").n_tokens.sum()
    assert n["a"] == 400 and n["b"] == 402
    # deterministic under repartitioning
    out2 = content_chunks(docs.repartition(7), modulus=16).toPandas()
    a = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert a.equals(b)
