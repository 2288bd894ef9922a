"""Round-7 table fixes: verify-and-stamp layout migration, snapshot-diff
completeness (from-only buckets, same-commit column additions), and the
verbatim-SQL fast path for the DML sync spec."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gamechanger_data_spark.sinks.table import LAYOUT_VERSION, META_DIR, LakeTable

SCH = T.StructType([
    T.StructField("k", T.IntegerType()),
    T.StructField("ts", T.LongType()),
    T.StructField("op", T.StringType()),
])


def _strip_stamps(root):
    mp = os.path.join(root, META_DIR)
    for name in os.listdir(mp):
        if name.endswith(".json"):
            p = os.path.join(mp, name)
            with open(p) as f:
                m = json.load(f)
            m.pop("layout", None)
            with open(p, "w") as f:
                json.dump(m, f)


# ---------------- verify_layout -------------------------------------


def test_verify_layout_stamps_false_positive_without_rewrite(spark, tmp_path):
    """A table WRITTEN under canonical hashing but missing the stamp
    (the guard's known false positive) passes verification and gets a
    stamp-only metadata commit — no O(table) rebucket, hash-dependent
    ops come back immediately."""
    root = str(tmp_path / "t")
    t = LakeTable(spark, root, key_cols=("k",), order_cols=("ts",),
                  n_buckets=4)
    df = spark.createDataFrame([(i, i * 10, "upsert") for i in range(50)], SCH)
    t.merge(df, "b0")
    files_before = t._load_manifest()["files"]
    _strip_stamps(root)

    with pytest.raises(ValueError, match="verify_layout"):
        LakeTable(spark, root, n_buckets=4)
    legacy = LakeTable(spark, root, n_buckets=4, allow_legacy_layout=True)
    with pytest.raises(ValueError, match="refused"):
        legacy.merge(df, "b1")

    rep = legacy.verify_layout()
    assert rep["verified"] and rep["checked_rows"] == 50
    assert rep["misplaced_rows"] == 0
    m = legacy._load_manifest()
    assert m["layout"] >= LAYOUT_VERSION
    assert m["files"] == files_before  # zero data movement
    # refusal lifted on this instance AND on a fresh open
    r = legacy.merge(spark.createDataFrame([(1, 999, "upsert")], SCH), "b1")
    assert not r.get("skipped")
    t2 = LakeTable(spark, root, n_buckets=4)
    assert t2.read().filter("k = 1").collect()[0]["ts"] == 999


def test_verify_layout_fails_on_genuinely_misplaced_rows(spark, tmp_path):
    """Rows physically resident in a bucket they don't hash to (a truly
    pre-canonical table) must FAIL verification — no stamp, rebucket
    stays the only way out."""
    root = str(tmp_path / "t")
    t = LakeTable(spark, root, key_cols=("k",), order_cols=("ts",),
                  n_buckets=4)
    t.merge(spark.createDataFrame(
        [(i, i * 10, "upsert") for i in range(50)], SCH), "b0")
    # graft one bucket's file into ANOTHER bucket's directory and point
    # the manifest at it — those rows now reside where they don't hash
    m = t._load_manifest()
    files = {b: list(fl) for b, fl in m["files"].items()}
    src_b = next(b for b, fl in files.items() if fl)
    dst_b = next(b for b in files if b != src_b)
    src_rel = files[src_b][0]
    # fresh basename: partitionBy reuses task file names across bucket
    # dirs, so keeping the original name would overwrite a resident file
    # (and break its .crc sidecar)
    dst_rel = os.path.join(
        os.path.dirname(src_rel).replace(
            f"__bucket={src_b}", f"__bucket={dst_b}"
        ),
        "part-99999-misplaced.c000.snappy.parquet",
    )
    os.makedirs(os.path.dirname(os.path.join(root, dst_rel)), exist_ok=True)
    shutil.copy(os.path.join(root, src_rel), os.path.join(root, dst_rel))
    src_crc = os.path.join(
        os.path.dirname(os.path.join(root, src_rel)),
        "." + os.path.basename(src_rel) + ".crc",
    )
    if os.path.exists(src_crc):  # hadoop LocalFS checksum sidecar
        shutil.copy(src_crc, os.path.join(
            os.path.dirname(os.path.join(root, dst_rel)),
            "." + os.path.basename(dst_rel) + ".crc",
        ))
    files[src_b] = files[src_b][1:]
    files[dst_b] = files[dst_b] + [dst_rel]
    mp = os.path.join(root, META_DIR, f"v{m['version']:08d}.json")
    with open(mp) as f:
        raw = json.load(f)
    raw["files"] = files
    raw.pop("layout", None)
    with open(mp, "w") as f:
        json.dump(raw, f)
    _strip_stamps(root)

    legacy = LakeTable(spark, root, key_cols=("k",), order_cols=("ts",),
                       n_buckets=4, allow_legacy_layout=True)
    with pytest.raises(ValueError, match="rebucket"):
        legacy.verify_layout()
    assert legacy._legacy_layout  # refusal NOT lifted


# ---------------- snapshot-diff completeness -------------------------


def test_diff_reversed_span_reports_deletes(spark, tmp_path):
    """diff(from=later, to=earlier): a key added after `earlier` lives
    in a bucket that may have NO files at `earlier` — the changed-bucket
    set must union BOTH manifests' buckets or the delete is silently
    missing."""
    sch = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("op", T.StringType()),
    ])
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=8)
    t.merge(spark.createDataFrame([("a", 1, "upsert")], sch), "b0")
    v1 = t.current_version()
    # find a key in a DIFFERENT bucket than 'a' (so its bucket has no
    # files at v1 and only appears in the later manifest)
    b_a = t.buckets_for_keys([{"k": "a"}])[0]
    other = next(
        f"x{i}" for i in range(64)
        if t.buckets_for_keys([{"k": f"x{i}"}])[0] != b_a
    )
    t.merge(spark.createDataFrame([(other, 2, "upsert")], sch), "b1")
    v2 = t.current_version()

    fwd = {(r["k"], r["change_op"]) for r in t.diff(v1, v2).collect()}
    assert fwd == {(other, "upsert")}
    rev = {(r["k"], r["change_op"]) for r in t.diff(v2, v1).collect()}
    assert rev == {(other, "delete")}  # was silently empty pre-fix


def test_diff_sees_same_commit_column_addition(spark, tmp_path):
    """A row whose ONLY change is a value in a column ADDED by the very
    commit being diffed must appear (the hash covers the to-schema's
    columns, with absent from-columns as typed nulls)."""
    sch = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(spark.createDataFrame(
        [("a", 1, "upsert", "aa"), ("b", 1, "upsert", "bb")], sch), "b0")
    v1 = t.current_version()
    # overwrite with identical rows + a NEW column, non-null for 'a' only
    snap = t.read()  # k, ts, text, is_revoked
    t.overwrite(
        snap.withColumn(
            "extra", F.when(F.col("k") == "a", F.lit("NEW"))
        ).withColumn("op", F.lit("upsert")),
        batch_id="ow-newcol",
    )
    d = {r["k"]: r for r in t.diff(v1).collect()}
    assert "a" in d and d["a"]["extra"] == "NEW"  # was missing pre-fix
    assert "b" not in d  # unchanged row (new column null) stays absent


def test_diff_still_rename_invariant(spark, tmp_path):
    """A metadata-only rename between the two pins must NOT make every
    row look changed: prev columns map through the rename aliases."""
    sch = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("tool", T.StringType()),
    ])
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(spark.createDataFrame(
        [("a", 1, "upsert", "u1"), ("b", 1, "upsert", "u2")], sch), "b0")
    v1 = t.current_version()
    t.rename_column("tool", "tool_name")
    sch2 = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("tool_name", T.StringType()),
    ])
    t.merge(spark.createDataFrame([("c", 2, "upsert", "u3")], sch2), "b1")
    d = {r["k"] for r in t.diff(v1).collect()}
    assert d == {"c"}  # a/b payloads unchanged through the rename


# ---------------- verbatim SQL-string DML spec ----------------------


def test_sql_string_dml_spec_recorded_verbatim(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    sch = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    t.merge(spark.createDataFrame(
        [("a", 1, "upsert", "aa"), ("b", 1, "upsert", "bb")], sch), "b0")
    t.update_where("k = 'a'", {"text": "concat(text, '!')"}, batch_id="u1")
    spec = t._load_manifest()["dml"]
    assert spec["condition"] == "k = 'a'"  # verbatim, not Catalyst-printed
    assert spec["assignments"]["text"] == "concat(text, '!')"
    # nondeterministic string: refused (JVM walk catches it)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        t.delete_where("rand() < 2.0", batch_id="d-rand")
    assert t._load_manifest().get("dml") is None


def test_sql_text_hazard_screen():
    haz = LakeTable._sql_text_hazard
    assert haz("rand() < 0.5")
    assert haz("ts < unix_timestamp()")
    assert haz("id = monotonically_increasing_id()")
    assert haz("ts < current_timestamp()")
    assert not haz("k = 'a' AND ts < unix_timestamp('2026-01-01', 'yyyy-MM-dd')")
    assert not haz("text LIKE '%random%'")  # column/literal text, not a call
    assert not haz("concat(text, '!') = 'x!'")
