"""Schema evolution beyond additive: type widening (int->long,
float->double — resolve wider, rewrite nothing, parquet widens at read)
and column rename (metadata-only alias map, old files resolved by
coalesce). Reference analog: the permissive per-field handling in
common/document_parser/parsers/policy_analytics/parse.py:132-150, made
transactional.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gamechanger_data_spark.sinks.table import LakeTable


def _ev(spark, rows, turn_dtype="int32", extra=None):
    """rows: (conv_id, turn_idx, ts_epoch_sec, event_seq, op, text)."""
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "ts", "event_seq", "op", "text"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    pdf["turn_idx"] = pdf["turn_idx"].astype(turn_dtype)
    pdf["event_seq"] = pdf["event_seq"].astype("int64")
    if extra:
        for k, v in extra.items():
            pdf[k] = v
    return spark.createDataFrame(pdf)


def test_widen_key_column_int_to_long(spark, tmp_path):
    """Batch N+1 delivers turn_idx as LONG against a table stored as INT:
    the schema widens in place, the old narrow files read back under the
    widened schema, and — because keys hash under canonical types — the
    widened rows keep landing in the buckets the old layout used (the
    old row is genuinely REPLACED, not duplicated into a sibling
    bucket)."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_ev(spark, [("c1", 7, 100, 1, "insert", "old"),
                        ("c2", 3, 100, 2, "insert", "keep")]), "b0")
    assert dict(t.read().dtypes)["turn_idx"] == "int"

    t.merge(
        _ev(spark, [("c1", 7, 200, 10, "update", "new")], turn_dtype="int64"),
        "b1",
    )
    got = t.read().orderBy("conv_id").toPandas()
    # widened schema, no duplicate key, updated winner
    assert dict(t.read().dtypes)["turn_idx"] == "bigint"
    assert len(got) == 2
    assert got.set_index("conv_id").loc["c1", "text"] == "new"
    assert got.set_index("conv_id").loc["c2", "text"] == "keep"
    # point lookup still prunes to the right bucket after widening
    hit = t.lookup_key(conv_id="c1", turn_idx=7).toPandas()
    assert list(hit["text"]) == ["new"]


def test_widen_value_column_float_to_double(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(
        _ev(spark, [("c1", 0, 100, 1, "insert", "a")],
            extra={"score": pd.Series([1.5], dtype="float32")}),
        "b0",
    )
    assert dict(t.read().dtypes)["score"] == "float"
    t.merge(
        _ev(spark, [("c2", 0, 100, 2, "insert", "b")],
            extra={"score": pd.Series([2.5], dtype="float64")}),
        "b1",
    )
    got = t.read().orderBy("conv_id").toPandas()
    assert dict(t.read().dtypes)["score"] == "double"
    assert list(got["score"]) == [1.5, 2.5]


def test_incompatible_type_change_is_refused(spark, tmp_path):
    """A non-widening type change (string vs long) must fail loudly —
    the old behavior silently cast the source down to the stored type."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(
        _ev(spark, [("c1", 0, 100, 1, "insert", "a")],
            extra={"meta": ["x"]}),
        "b0",
    )
    bad = _ev(spark, [("c2", 0, 100, 2, "insert", "b")]).withColumn(
        "meta", F.lit(5).cast("long")
    )
    with pytest.raises(ValueError, match="incompatible type change"):
        t.merge(bad, "b1")


def test_rename_column_reads_old_files_without_rewrite(spark, tmp_path):
    """rename_column is metadata-only: files written before the rename
    keep the old column name on disk but read back under the new name;
    post-rename merges write the new name; a source still emitting the
    retired name is mapped to the new one."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(
        _ev(spark, [("c1", 0, 100, 1, "insert", "a")],
            extra={"tool": ["search"]}),
        "b0",
    )
    n_files_before = t.files().count()
    r = t.rename_column("tool", "tool_name")
    assert r["renamed"] == {"tool": "tool_name"}
    assert t.files().count() == n_files_before  # no data rewritten
    got = t.read().toPandas()
    assert "tool_name" in got.columns and "tool" not in got.columns
    assert list(got["tool_name"]) == ["search"]

    # post-rename merge under the NEW name
    t.merge(
        _ev(spark, [("c2", 0, 100, 2, "insert", "b")],
            extra={"tool_name": ["calc"]}),
        "b1",
    )
    # a LAGGING producer still emitting the retired name: mapped
    t.merge(
        _ev(spark, [("c3", 0, 100, 3, "insert", "c")],
            extra={"tool": ["code"]}),
        "b2",
    )
    got = t.read().orderBy("conv_id").toPandas()
    assert list(got["tool_name"]) == ["search", "calc", "code"]

    # chained rename inherits the alias list
    t.rename_column("tool_name", "tool_kind")
    got = t.read().orderBy("conv_id").toPandas()
    assert list(got["tool_kind"]) == ["search", "calc", "code"]
    m = t._load_manifest()
    assert m["renames"] == {"tool_kind": ["tool_name", "tool"]}


def test_rename_guards(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(
        _ev(spark, [("c1", 0, 100, 1, "insert", "a")],
            extra={"tool": ["x"], "role": ["user"]}),
        "b0",
    )
    with pytest.raises(ValueError, match="key/order"):
        t.rename_column("conv_id", "cid")
    with pytest.raises(ValueError, match="key/order"):
        t.rename_column("ts", "t2")
    with pytest.raises(ValueError, match="already in use"):
        t.rename_column("tool", "role")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    t.rename_column("tool", "tool_name")
    # retired alias cannot come back as a fresh column
    with pytest.raises(ValueError, match="retired"):
        t.merge(
            _ev(spark, [("c2", 0, 100, 2, "insert", "b")],
                extra={"tool": ["y"], "tool_name": ["z"]}),
            "b1",
        )


def test_rename_then_compact_and_full_rewrite_clears_aliases(spark, tmp_path):
    """compact() carries the alias map (partial rewrite); a full rewrite
    (rebucket) rewrites every file under current names and clears it."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2, merge_mode="mor")
    t.merge(
        _ev(spark, [("c1", 0, 100, 1, "insert", "a")],
            extra={"tool": ["x"]}),
        "b0",
        mode="cow",
    )
    t.rename_column("tool", "tool_name")
    # MOR delta lands under the new name; base file still has the old
    t.merge(
        _ev(spark, [("c1", 1, 100, 2, "insert", "b")],
            extra={"tool_name": ["y"]}),
        "b1",
    )
    assert list(
        t.read().orderBy("turn_idx").toPandas()["tool_name"]
    ) == ["x", "y"]
    t.compact()
    assert t._load_manifest()["renames"] == {"tool_name": ["tool"]}
    assert list(
        t.read().orderBy("turn_idx").toPandas()["tool_name"]
    ) == ["x", "y"]
    t.rebucket(4)
    assert t._load_manifest()["renames"] == {}
    assert list(
        t.read().orderBy("turn_idx").toPandas()["tool_name"]
    ) == ["x", "y"]


def test_replay_with_widening_and_rename_mid_stream(spark, tmp_path):
    """The VERDICT-specified integration: a replay where a later batch
    widens turn_idx and a metadata column is renamed mid-stream still
    converges to the correct final state with exactly-once intact."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(
        _ev(spark, [("c1", 1, 100, 1, "insert", "t1"),
                    ("c2", 1, 100, 2, "insert", "t2")],
            extra={"tool": ["a", "b"]}),
        "b0",
    )
    t.rename_column("tool", "tool_name")
    # widening batch under the new schema name
    t.merge(
        _ev(spark, [("c1", 1, 200, 10, "update", "t1v2"),
                    ("c3", 1, 100, 11, "insert", "t3")],
            turn_dtype="int64", extra={"tool_name": ["a2", "c"]}),
        "b1",
    )
    # replaying both batches is a no-op (exactly-once across evolution)
    r0 = t.merge(_ev(spark, [("c1", 1, 999, 99, "update", "XXX")]), "b0")
    r1 = t.merge(_ev(spark, [("c1", 1, 999, 99, "update", "XXX")]), "b1")
    assert r0["skipped"] and r1["skipped"]
    got = t.read().orderBy("conv_id").toPandas()
    assert dict(t.read().dtypes)["turn_idx"] == "bigint"
    assert list(got["text"]) == ["t1v2", "t2", "t3"]
    assert list(got["tool_name"]) == ["a2", "b", "c"]


def test_timestamp_flavor_and_void_are_compatible(spark, tmp_path):
    """TIMESTAMP vs TIMESTAMP_NTZ (parquet-born vs createDataFrame-born)
    and VOID (an all-null source column) must NOT trip the incompatible-
    type guard: ts keeps the stored flavor; void resolves to the non-void
    side in either direction."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2)
    # batch 0 via parquet round-trip -> ts lands as TIMESTAMP_NTZ
    p = str(tmp_path / "seed.parquet")
    _ev(spark, [("c1", 0, 100, 1, "insert", "a")],
        extra={"meta": ["x"], "later": [None]}).write.parquet(p)
    t.merge(spark.read.parquet(p), "b0")
    stored_ts = dict(t.read().dtypes)["ts"]
    # batch 1 via createDataFrame -> LTZ timestamp + all-null meta (void)
    b1 = _ev(spark, [("c2", 0, 100, 2, "insert", "b")]).withColumn(
        "meta", F.lit(None)
    ).withColumn("later", F.lit("now-real"))
    t.merge(b1, "b1")
    dts = dict(t.read().dtypes)
    assert dts["ts"] == stored_ts          # flavor kept, no error
    assert dts["meta"] == "string"         # void never narrows
    assert dts["later"] == "string"        # stored void widened to real type
    got = t.read().orderBy("conv_id").toPandas()
    assert list(got["meta"]) == ["x", None]
    assert list(got["later"]) == [None, "now-real"]
