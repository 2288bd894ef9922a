"""Native-expression vs pandas normalization equivalence, and hash contracts."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from gamechanger_data_spark.functions.hashing import (
    dict_hash_expr,
    dict_hash_python,
    sha256_expr,
)
from gamechanger_data_spark.functions.text import (
    normalize_text_expr,
    normalize_text_pandas,
    normalize_text_udf,
)

MESSY = [
    "  “Héllo” – world’s\ttabs  ",
    "a\x00b\x07c   d",
    "‘single’ “double” —dash−  nbsp",
    "plain",
    "",
    "   ",
    "line1\nline2\r\nline3",
    "ünïcödé — ‘mixed’ “stuff”  ",
]


def test_expr_matches_pandas(spark):
    df = spark.createDataFrame([(s,) for s in MESSY], ["text"])
    got = [r[0] for r in df.select(normalize_text_expr("text")).collect()]
    want = list(normalize_text_pandas(pd.Series(MESSY)))
    assert got == want


def test_udf_matches_expr(spark):
    df = spark.createDataFrame([(s,) for s in MESSY], ["text"])
    both = df.select(
        normalize_text_expr("text").alias("a"),
        normalize_text_udf(F.col("text")).alias("b"),
    ).collect()
    for r in both:
        assert r["a"] == r["b"]


def test_sha256_matches_hashlib(spark):
    df = spark.createDataFrame([("abc",), ("",), ("ünïcödé",)], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", sha256_expr("s").alias("h")).collect()}
    for s, h in got.items():
        assert h == hashlib.sha256(s.encode("utf-8")).hexdigest()


def test_dict_hash_contract(spark):
    """Spark dict_hash_expr must reproduce the reference's
    dict_to_sha256_hex_digest (sorted-by-str(key) tuple-repr concat, no
    separator) — verified against the bit-exact python mirror."""
    d = {"conv_id": "c1", "turn_idx": 7, "text": "hello world"}
    df = spark.createDataFrame([("c1", 7, "hello world")], ["conv_id", "turn_idx", "text"])
    got = df.select(
        dict_hash_expr(
            {"conv_id": "conv_id", "turn_idx": "turn_idx", "text": "text"},
            string_cols={"conv_id", "text"},
        ).alias("h")
    ).collect()[0]["h"]
    assert got == dict_hash_python(d)


def test_dict_hash_python_matches_reference_reduce():
    """dict_hash_python must equal the reference's literal reduce fold
    (ref_utils-era contract: gc_manual_metadata.py:16-28) — including numpy
    scalar unboxing, which the reference never sees but our datagen feeds."""
    import hashlib as _hl
    from functools import reduce

    import numpy as np

    d = {"event_id": 7, "event_type": "click", "z": "a b"}
    value_string = reduce(
        lambda t1, t2: "".join(map(str, (t1, t2))),
        sorted(d.items(), key=lambda t: str(t[0])),
        "",
    )
    want = _hl.sha256(value_string.encode("utf-8")).hexdigest()
    assert dict_hash_python(d) == want
    assert dict_hash_python({**d, "event_id": np.int32(7)}) == want


def test_filename_safe(spark):
    from gamechanger_data_spark.functions.text import filename_safe_expr

    df = spark.createDataFrame([("DoD Dir 5000.01 (Change 2)!.pdf",)], ["s"])
    got = df.select(filename_safe_expr("s").alias("f")).collect()[0]["f"]
    assert got == "DoD_Dir_5000.01_Change_2_.pdf"


def test_format_size(spark):
    from gamechanger_data_spark.functions.text import format_size_expr

    df = spark.createDataFrame([(512,), (2048,), (5 * 1024**2,)], ["n"])
    got = [r[0] for r in df.select(format_size_expr("n")).collect()]
    assert got == ["512 B", "2.0 KiB", "5.0 MiB"]


def test_suffix_rename_map(spark):
    from gamechanger_data_spark.functions.text import suffix_rename_map

    df = spark.createDataFrame([(1, "x", 2.5, True)], ["n", "s", "d", "b"])
    m = suffix_rename_map(df.schema, keep=("n",))
    assert m == {"s": "s_s", "d": "d_d", "b": "b_b"}
    renamed = df.withColumnsRenamed(m)
    assert set(renamed.columns) == {"n", "s_s", "d_d", "b_b"}


def test_dict_hash_null_and_bool_parity(spark):
    """NULL fields must hash as 'None' (not null-propagate the whole hash)
    and booleans must render True/False like Python repr."""
    d_none = {"flag": True, "note": None}
    d_false = {"flag": False, "note": "x"}
    df = spark.createDataFrame(
        [(True, None), (False, "x")], "flag boolean, note string"
    )
    got = [
        r["h"]
        for r in df.select(
            dict_hash_expr(
                {"flag": "flag", "note": "note"},
                string_cols={"note"}, bool_cols={"flag"},
            ).alias("h")
        ).collect()
    ]
    assert got[0] == dict_hash_python(d_none)
    assert got[1] == dict_hash_python(d_false)
    assert got[0] is not None


def test_segment_paragraphs_contract(spark):
    """F17 par_dict contract (document.py:104-130,149-166): blank-line
    paragraph boundaries, whitespace-only paragraphs dropped with DENSE
    renumbering, tokens re-joined whitespace-normalized, par id
    '<doc>_<count>'."""
    from gamechanger_data_spark.functions.segment import segment_paragraphs

    text = (
        "First  para\nstill first.\n\n   \n\nSecond para! Two sentences here.\n\n"
        "Third without terminator"
    )
    df = spark.createDataFrame([("d1", text), ("d2", "   ")], ["doc_id", "text"])
    rows = segment_paragraphs(df).orderBy("doc_id", "par_inc_count").collect()
    assert [(r.par_id, r.par_inc_count, r.par_text, r.n_sentences) for r in rows] == [
        ("d1_0", 0, "First para still first.", 1),
        ("d1_1", 1, "Second para! Two sentences here.", 2),
        ("d1_2", 2, "Third without terminator", 1),
    ]  # d2 (whitespace-only) emits nothing; the empty middle para is skipped


def test_sentences_expr(spark):
    from pyspark.sql import functions as F

    from gamechanger_data_spark.functions.segment import sentences_expr

    df = spark.createDataFrame(
        [("One. Two!! Three? trailing fragment",), ("...",)], ["t"]
    )
    got = [r.s for r in df.select(sentences_expr("t").alias("s")).collect()]
    assert got[0] == ["One.", "Two!!", "Three?", "trailing fragment"]
    assert got[1] == []  # punctuation-only: no sentence content
