"""Deterministic sampling / split assignment (operators/sampling.py) and
n-gram decontamination (operators/dedup.py)."""

import pytest
from pyspark.sql import functions as F

from gamechanger_data_spark.operators.dedup import ngram_contamination
from gamechanger_data_spark.operators.sampling import (
    sample_by_hash,
    split_assign,
    threshold,
)


def _ids(spark, n=500):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_threshold_bounds():
    assert threshold(0.0) == 0
    assert threshold(1.0) == 1 << 60
    with pytest.raises(ValueError):
        threshold(1.5)


def test_sample_by_hash_deterministic_and_partition_independent(spark):
    df = _ids(spark)
    a = {r.doc_id for r in sample_by_hash(df, 0.2, "doc_id").collect()}
    b = {r.doc_id for r in
         sample_by_hash(df.repartition(13), 0.2, "doc_id").collect()}
    assert a == b  # membership is a pure function of the key
    assert 0.1 * 500 < len(a) < 0.3 * 500
    salted = {r.doc_id for r in
              sample_by_hash(df, 0.2, "doc_id", salt="v2").collect()}
    assert salted != a  # independent draw


def test_sample_by_hash_append_stable(spark):
    # the sample over a PREFIX of the data is a subset of the sample over
    # the grown table — appends never reshuffle membership
    small = {r.doc_id for r in sample_by_hash(_ids(spark, 200), 0.2, "doc_id").collect()}
    big = {r.doc_id for r in sample_by_hash(_ids(spark, 500), 0.2, "doc_id").collect()}
    assert small == {x for x in big if x < 200}


def test_split_assign_cover_disjoint_proportions(spark):
    rows = split_assign(_ids(spark, 2000), "doc_id").collect()
    by = {}
    for r in rows:
        by.setdefault(r.split, set()).add(r.doc_id)
    assert set(by) == {"train", "val", "test"}
    assert sum(len(v) for v in by.values()) == 2000  # cover, disjoint
    assert 0.7 < len(by["train"]) / 2000 < 0.9
    assert 0.05 < len(by["val"]) / 2000 < 0.15
    with pytest.raises(ValueError):
        split_assign(_ids(spark, 10), "doc_id", weights={"a": 0.5, "b": 0.2})


def test_ngram_contamination_flags_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "a quick brown fox jumps over fences daily"),  # shares >=2
            (2, "completely different words in this text body"),  # 0 hits
            (3, "the quick brown cat sleeps all day long"),  # exactly 1 hit
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in ngram_contamination(
            docs, docs.filter(F.col("doc_id") == 0)
        ).collect()
    }
    assert got[0][1]  # the probe itself is trivially contaminated
    assert got[1] == (3, True)
    assert got[2] == (0, False)
    assert got[3] == (1, False)  # one shared shingle is below min_hits=2


def test_repetition_metrics_flags_repetitive_doc(spark):
    from gamechanger_data_spark.functions.analysis import repetition_metrics

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),  # everything duplicated
            (2, "each word here appears exactly once only"),
            (3, ""),  # empty doc: all fractions 0, not flagged
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert got[1].dup_token_frac == 1.0 and got[1].flagged
    assert got[2].dup_token_frac == 0.0 and not got[2].flagged
    assert got[2].dup_2gram_frac == 0.0 and got[2].dup_3gram_frac == 0.0
    assert got[3].dup_token_frac == 0.0 and not got[3].flagged


def test_scrub_pii_redacts_and_counts(spark):
    from gamechanger_data_spark.functions.pii import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io or (212) 555-0187, ssn 078-05-1120"),
            (2, "call 1-212-555-0187 and +1 415 555 0000 today"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert got[1].clean_text == "mail <EMAIL> or <PHONE>, ssn <SSN>"
    assert (got[1].n_email, got[1].n_ssn, got[1].n_phone) == (1, 1, 1)
    assert got[2].clean_text == "call <PHONE> and <PHONE> today"
    assert got[2].n_phone == 2
    assert got[3].clean_text == "nothing sensitive here"
    assert (got[3].n_email, got[3].n_ssn, got[3].n_phone) == (0, 0, 0)


def test_stratified_sample_rates_and_monotonicity(spark):
    from pyspark.sql import functions as F2

    from gamechanger_data_spark.operators.sampling import (
        stratified_sample_by_hash,
    )

    df = spark.range(8000).select(
        F2.col("id").alias("k"),
        F2.concat(F2.lit("g"), F2.pmod("id", F2.lit(4)).cast("string")).alias("g"),
    )
    rates = {"g0": 1.0, "g1": 0.5, "g2": 0.05}
    got = (
        stratified_sample_by_hash(df, rates, "g", "k", default_rate=0.0)
        .groupBy("g").count().toPandas().set_index("g")["count"]
    )
    assert got.get("g0") == 2000            # rate 1.0 keeps everything
    assert abs(got.get("g1") - 1000) < 150  # ~0.5 of 2000
    assert abs(got.get("g2") - 100) < 50    # ~0.05 of 2000
    assert "g3" not in got                  # default_rate 0 drops the rest
    # monotone in the rate: raising g2's rate only ADDS keys
    low = set(r.k for r in stratified_sample_by_hash(
        df, rates, "g", "k").filter("g = 'g2'").collect())
    high = set(r.k for r in stratified_sample_by_hash(
        df, {**rates, "g2": 0.2}, "g", "k").filter("g = 'g2'").collect())
    assert low <= high and len(high) > len(low)
    # partitioning-independent membership
    again = set(r.k for r in stratified_sample_by_hash(
        df.repartition(13), rates, "g", "k").filter("g = 'g2'").collect())
    assert again == low
