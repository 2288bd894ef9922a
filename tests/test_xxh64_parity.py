"""Bit-parity of the pure-Python XXH64 twin against Spark's xxhash64
expression — the invariant the laketable streaming sink's executor-side
bucket assignment rests on (a single mismatched row would land a key in
a bucket the engine never reads for it)."""

import random
import string

from pyspark.sql import functions as F

from gamechanger_data_spark.functions.xxh64 import (
    bucket_of,
    spark_xxhash64,
    xxh64,
)


def test_known_vector():
    # XXH64 reference vector: empty input, seed 0
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999


def test_parity_randomized(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(250):
        s = "".join(
            rng.choice(string.printable) for _ in range(rng.randint(0, 80))
        )
        rows.append((s, rng.randint(-2**31, 2**31 - 1)))
    # edges: empty, unicode, >32-byte stripes, extremes
    rows += [("", 0), ("é≈漢字🙂", -1), ("x" * 200, 2**31 - 1),
             ("y" * 31, -2**31), ("z" * 33, 1)]
    df = spark.createDataFrame(rows, "s string, i int")
    got = df.select(
        F.xxhash64(F.col("s"), F.col("i").cast("long")).alias("h"),
        F.pmod(F.xxhash64(F.col("s"), F.col("i").cast("long")),
               F.lit(32)).alias("b"),
        "s", "i",
    ).collect()
    for r in got:
        assert spark_xxhash64([r["s"], r["i"]], ["string", "long"]) == r["h"]
        assert bucket_of([r["s"], r["i"]], ["string", "long"], 32) == r["b"]


def test_parity_nulls_and_doubles(spark):
    rows = [(None, 5.5), ("a", -0.0), ("b", 0.0), (None, None),
            ("c", 1e308), ("d", -1e-308)]
    df = spark.createDataFrame(rows, "s string, d double")
    got = df.select(F.xxhash64("s", "d").alias("h"), "s", "d").collect()
    for r in got:
        assert spark_xxhash64([r["s"], r["d"]], ["string", "double"]) == r["h"]
