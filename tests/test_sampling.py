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
