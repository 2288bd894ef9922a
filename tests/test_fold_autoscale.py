"""CoW fold write-parallelism autoscaling (_fold_repartition): when the
touched buckets' resident bytes exceed the per-task target, the rewrite
splits buckets across (bucket, key)-hashed shuffle partitions — more
tasks, several key-sorted files per bucket — without changing the table
state. Trickle merges and MOR delta appends keep the one-file-per-bucket
layout."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import gamechanger_data_spark.sinks.table as table_mod
from gamechanger_data_spark.sinks.table import LakeTable

SCH = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("ts", T.LongType()),
    T.StructField("payload", T.StringType()),
    T.StructField("op", T.StringType()),
])


def _rows(spark, lo, hi, ts):
    return spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        F.lit(ts).cast("long").alias("ts"),
        F.repeat(F.lit("x"), 200).alias("payload"),
        F.lit("upsert").alias("op"),
    )


def _files_per_bucket(t):
    m = t._load_manifest()
    return {int(b): len(fl) for b, fl in m["files"].items() if fl}


def test_big_fold_splits_buckets_small_merge_does_not(spark, tmp_path, monkeypatch):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2, merge_mode="cow")
    t.merge(_rows(spark, 0, 5000, 1), "b0")
    assert all(n == 1 for n in _files_per_bucket(t).values())

    # resident bytes now dwarf a tiny per-task target: the next CoW fold
    # must fan out past one-task-per-bucket and write split files
    monkeypatch.setattr(table_mod, "FOLD_TARGET_PARTITION_BYTES", 4096)
    t.merge(_rows(spark, 0, 5000, 2), "b1")
    fpb = _files_per_bucket(t)
    assert all(n > 1 for n in fpb.values()), fpb

    got = t.read()
    assert got.count() == 5000
    assert got.agg(F.min("ts"), F.max("ts")).collect()[0] == (2, 2)
    assert got.select("k").distinct().count() == 5000

    # point lookups still resolve through multi-file buckets
    assert t.lookup_key(k="k17").collect()[0]["ts"] == 2

    # back at a sane target, a small merge keeps one new file per bucket
    monkeypatch.setattr(table_mod, "FOLD_TARGET_PARTITION_BYTES", 128 << 20)
    t.merge(_rows(spark, 0, 10, 3), "b2")
    assert all(n == 1 for n in _files_per_bucket(t).values())


def test_mor_delta_append_never_splits(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(table_mod, "FOLD_TARGET_PARTITION_BYTES", 4096)
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2, merge_mode="cow")
    t.merge(_rows(spark, 0, 5000, 1), "b0")
    t.merge(_rows(spark, 0, 50, 2), "b1", mode="mor")
    m = t._load_manifest()
    assert all(len(fl) == 1 for fl in m["deltas"].values() if fl)


def test_compact_autoscales_and_preserves_state(spark, tmp_path, monkeypatch):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2, merge_mode="cow")
    t.merge(_rows(spark, 0, 5000, 1), "b0")
    t.merge(_rows(spark, 0, 200, 2), "b1", mode="mor")
    monkeypatch.setattr(table_mod, "FOLD_TARGET_PARTITION_BYTES", 4096)
    t.compact()
    m = t._load_manifest()
    assert not any(fl for fl in m.get("deltas", {}).values())
    fpb = _files_per_bucket(t)
    assert all(n > 1 for n in fpb.values()), fpb
    got = t.read()
    assert got.count() == 5000
    assert got.filter(F.col("ts") == 2).count() == 200


def test_split_files_hold_disjoint_key_ranges(spark, tmp_path, monkeypatch):
    """Fold splits are RANGE partitioned on (bucket, key): files inside a
    split bucket hold non-overlapping key ranges, so parquet file-level
    min/max stats prune a point lookup back to ~one file per bucket."""
    import pyarrow.parquet as pq
    import os as _os

    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2, merge_mode="cow")
    t.merge(_rows(spark, 0, 5000, 1), "b0")
    monkeypatch.setattr(table_mod, "FOLD_TARGET_PARTITION_BYTES", 4096)
    t.merge(_rows(spark, 0, 5000, 2), "b1")

    m = t._load_manifest()
    for b, fl in m["files"].items():
        assert len(fl) > 1, (b, fl)
        ranges = []
        for p in fl:
            md = pq.ParquetFile(_os.path.join(t.root, p)).metadata
            ki = next(i for i in range(md.num_columns)
                      if md.row_group(0).column(i).path_in_schema == "k")
            lo = min(md.row_group(i).column(ki).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(ki).statistics.max
                     for i in range(md.num_row_groups))
            ranges.append((lo, hi))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, (b, ranges)  # disjoint (boundary touch ok)
