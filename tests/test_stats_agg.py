"""Metadata-answered aggregates (LakeTable.stats_agg): exact
count/count(col)/min/max folded out of commit-time per-file stats for
clean buckets, with scan fallback for anything that can't prove
exactness (MOR deltas, tombstones under min/max, string min/max, files
without recorded counts).

Reference analog: the reference answers corpus-size questions by
re-walking exported prefixes and counting rows
(dataPipelines/gc_ingest's manifest walks); here the commit protocol
already recorded exact counts, so the answer is driver arithmetic.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gamechanger_data_spark.sinks.table import LakeTable

SCH = T.StructType([
    T.StructField("k", T.IntegerType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("val", T.StringType()),
    T.StructField("op", T.StringType()),
])

BASE_TS = datetime(2024, 1, 1)


def _rows(spark, lo, hi, op="upsert", val=lambda i: f"v{i}", bump=0):
    # bump: seconds added to ts so a later batch out-orders the first
    # under LWW (equal order columns keep the incumbent)
    return spark.createDataFrame(
        [(i, BASE_TS + timedelta(seconds=i + bump), val(i), op)
         for i in range(lo, hi)],
        SCH,
    )


@pytest.fixture
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(_rows(spark, 0, 100, val=lambda i: None if i % 5 == 0 else f"v{i}"),
            "b0")
    return t


def _truth(t, *cols):
    exprs = [F.count(F.lit(1)).alias("count_star")]
    for c in cols:
        exprs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return t.read().agg(*exprs).collect()[0].asDict()


def test_clean_table_fully_metadata_served(table):
    out, rep = table.stats_agg(
        [("count", "*"), ("count", "val"), ("min", "ts"), ("max", "ts"),
         ("min", "k"), ("max", "k")],
        return_report=True,
    )
    row = out.collect()[0].asDict()
    assert rep["buckets_scanned"] == 0 and rep["buckets_meta"] == 4
    truth = _truth(table, "ts", "k")
    assert row["count_star"] == truth["count_star"] == 100
    assert row["count_val"] == 80  # every 5th val is null
    assert row["min_ts"] == truth["min_ts"]
    assert row["max_ts"] == truth["max_ts"]
    assert row["min_k"] == truth["min_k"] == 0
    assert row["max_k"] == truth["max_k"] == 99
    # result typing: count is long, min/max carry the column's type
    sch = dict((f.name, f.dataType) for f in out.schema.fields)
    assert isinstance(sch["count_star"], T.LongType)
    assert isinstance(sch["min_ts"], T.TimestampType)
    assert isinstance(sch["max_k"], T.IntegerType)


def test_tombstones_keep_count_meta_but_force_minmax_scan(table):
    table.merge(_rows(spark=table.spark, lo=90, hi=100, op="delete",
                      bump=1000), "b1")
    c, rep = table.stats_agg([("count", "*")], return_report=True)
    assert rep["buckets_scanned"] == 0
    assert c.collect()[0][0] == 90 == table.read().count()
    mx, repm = table.stats_agg([("max", "k")], return_report=True)
    # a tombstoned row's value may have been the max: every bucket that
    # holds a tombstone must scan (buckets the deletes missed may not)
    assert repm["buckets_scanned"] >= 1
    assert mx.collect()[0][0] == 89
    # count(col) is likewise unknowable from stats once tombstones exist
    cv, repc = table.stats_agg([("count", "val")], return_report=True)
    assert repc["buckets_scanned"] >= 1
    assert cv.collect()[0][0] == table.read().filter(
        F.col("val").isNotNull()).count()


def test_mor_deltas_scan_only_dirty_buckets(table):
    table.merge(_rows(spark=table.spark, lo=0, hi=3,
                      val=lambda i: f"w{i}", bump=1000), "b1", mode="mor")
    dirty = sum(
        1 for fl in (table._load_manifest().get("deltas") or {}).values()
        if fl
    )
    assert 1 <= dirty < 4
    out, rep = table.stats_agg(
        [("count", "*"), ("max", "ts")], return_report=True)
    assert rep["buckets_scanned"] == dirty
    assert rep["buckets_meta"] == 4 - dirty
    row = out.collect()[0].asDict()
    truth = _truth(table, "ts")
    assert row["count_star"] == truth["count_star"] == 100
    assert row["max_ts"] == truth["max_ts"]


def test_string_minmax_always_scans(table):
    out, rep = table.stats_agg([("min", "val"), ("max", "val")],
                               return_report=True)
    assert rep["buckets_meta"] == 0 and rep["buckets_scanned"] == 4
    row = out.collect()[0].asDict()
    truth = table.read().agg(F.min("val").alias("mn"),
                             F.max("val").alias("mx")).collect()[0]
    assert row["min_val"] == truth["mn"] and row["max_val"] == truth["mx"]


def test_time_travel_pins_the_snapshot(table):
    v1 = table.current_version()
    table.merge(_rows(spark=table.spark, lo=100, hi=150), "b1")
    old = table.stats_agg([("count", "*"), ("max", "k")], version=v1)
    new = table.stats_agg([("count", "*"), ("max", "k")])
    assert old.collect()[0][:] == (100, 99)
    assert new.collect()[0][:] == (150, 149)


def test_empty_and_validation(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "e"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    out = t.stats_agg([("count", "*")])
    assert out.collect()[0][0] == 0
    with pytest.raises(ValueError, match="count/min/max"):
        t.stats_agg([("avg", "k")])
    with pytest.raises(ValueError, match="not an aggregate"):
        t.stats_agg([("min", "*")])
    t2 = LakeTable(spark, str(tmp_path / "f"), key_cols=("k",),
                   order_cols=("ts",), n_buckets=2)
    t2.merge(_rows(spark, 0, 5), "b0")
    with pytest.raises(ValueError, match="unknown column"):
        t2.stats_agg([("min", "nope")])


def test_stats_disabled_table_falls_back_to_lazy_footers(spark, tmp_path):
    # stats_cols=() -> manifest carries no stats map; stats_agg still
    # answers exactly via memoized per-file footer reads (counts) and
    # scans for min/max (no zone maps recorded)
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2, stats_cols=())
    t.merge(_rows(spark, 0, 30), "b0")
    assert "stats" not in t._load_manifest()
    c, rep = t.stats_agg([("count", "*")], return_report=True)
    assert c.collect()[0][0] == 30
    assert rep["buckets_scanned"] == 0  # footer counts suffice
    mn, repm = t.stats_agg([("min", "k")], return_report=True)
    assert repm["buckets_meta"] == 0  # no zone maps -> scan
    assert mn.collect()[0][0] == 0


def test_rename_aliases_resolve_old_file_stats(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2,
                  stats_cols=("k", "ts", "val"))
    t.merge(_rows(spark, 0, 40), "b0")
    t.rename_column("val", "payload")
    # files on disk still carry stats under 'val'; the alias map must
    # serve count(payload) without a scan
    c, rep = t.stats_agg([("count", "payload"), ("count", "*")],
                         return_report=True)
    assert rep["buckets_scanned"] == 0
    assert c.collect()[0][:] == (40, 40)


def test_count_col_beyond_stats_cols_is_meta_served(table):
    # 'val' is not in default stats_cols (key+order) but null counts are
    # recorded for every column
    c, rep = table.stats_agg([("count", "val")], return_report=True)
    assert rep["buckets_scanned"] == 0
    assert c.collect()[0][0] == 80


# ---------------- SQL front-end routing --------------------------------


@pytest.fixture
def sql_lake(spark, table):
    from gamechanger_data_spark.plans.sqlfront import SqlLake
    return SqlLake(spark).register("tr", table)


def test_sql_global_agg_routes_to_stats(sql_lake, table):
    out = sql_lake.sql(
        "SELECT COUNT(*) AS n, COUNT(val) AS nv, MIN(ts) AS mn, "
        "MAX(K) AS mx FROM tr"
    )
    assert sql_lake.last_fast_agg == {
        "buckets_meta": 4, "buckets_scanned": 0, "files_meta": 4}
    truth = table.read().agg(
        F.count(F.lit(1)).alias("n"), F.count("val").alias("nv"),
        F.min("ts").alias("mn"), F.max("k").alias("mx")).collect()[0]
    assert out.collect()[0][:] == truth[:]


def test_sql_agg_travel_pin_and_generic_fallbacks(sql_lake, table):
    v1 = table.current_version()
    table.merge(_rows(spark=table.spark, lo=100, hi=150), "b1")
    old = sql_lake.sql(f"SELECT count(*) AS n FROM tr VERSION AS OF {v1}")
    assert old.collect()[0][0] == 100
    # un-aliased items keep the generic path (Spark's own column names)
    sql_lake.last_fast_agg = None
    g = sql_lake.sql("SELECT count(*) FROM tr")
    assert sql_lake.last_fast_agg is None
    assert g.columns == ["count(1)"] and g.collect()[0][0] == 150
    # OR-WHERE / GROUP BY / avg / DISTINCT / unknown column: generic path
    for q_ in (
        "SELECT count(*) AS n FROM tr WHERE k < 5 OR k > 120",
        "SELECT max(k) AS m FROM tr GROUP BY val",
        "SELECT avg(k) AS a FROM tr",
        "SELECT count(DISTINCT val) AS d FROM tr",
    ):
        sql_lake.sql(q_).collect()
        assert sql_lake.last_fast_agg is None
    import py4j.protocol
    from pyspark.errors import AnalysisException
    with pytest.raises((AnalysisException, py4j.protocol.Py4JJavaError)):
        sql_lake.sql("SELECT min(nope) AS m FROM tr").collect()


# ---------------- predicate counts (where=) -----------------------------


def test_predicate_count_file_granular(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(_rows(spark, 0, 12000), "b0")
    t.cluster_by("ts", target_file_bytes=8 << 10)
    cut = BASE_TS + timedelta(seconds=3000)
    out, rep = t.stats_agg([("count", "*", "n")], where=[("ts", ">=", cut)],
                           return_report=True)
    truth = t.read(where=[("ts", ">=", cut)]).count()
    assert out.collect()[0][0] == truth == 9000
    # clustered layout: most files answer from metadata or are skipped;
    # only the boundary file per bucket scans
    assert rep["files_meta"] > 0 and rep["files_skipped"] > 0
    assert rep["files_boundary"] <= 4 and rep["buckets_scanned"] == 0


def test_predicate_count_with_tombstones_and_deltas(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(_rows(spark, 0, 300), "b0")
    t.merge(_rows(spark, 0, 30, op="delete", bump=5000), "b1")
    t.merge(_rows(spark, 100, 110, bump=9000, val=lambda i: "vv"), "b2",
            mode="mor")
    cut = BASE_TS + timedelta(seconds=150)
    for preds in ([("ts", "<", cut)], [("k", ">=", 150)],
                  [("k", ">=", 50), ("k", "<", 250)]):
        out = t.stats_agg([("count", "*", "n")], where=preds)
        assert out.collect()[0][0] == t.read(where=preds).count(), preds


def test_predicate_count_null_column_forces_residual(spark, tmp_path):
    # val is null every 5th row; a predicate on val can never be proven
    # fully-included (nulls fail comparisons), so files scan residually
    # — and the count must still be exact
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2,
                  stats_cols=("k", "ts", "val"))
    t.merge(_rows(spark, 0, 100, val=lambda i: None if i % 5 == 0 else f"v{i:03d}"),
            "b0")
    out, rep = t.stats_agg([("count", "*", "n")],
                           where=[("val", ">=", "v000")], return_report=True)
    assert out.collect()[0][0] == 80
    assert rep["files_meta"] == 0  # nulls disqualify full-inclusion proof


def test_sql_predicate_count_routes(spark, tmp_path):
    from gamechanger_data_spark.plans.sqlfront import SqlLake
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4)
    t.merge(_rows(spark, 0, 2000), "b0")
    t.cluster_by("ts", target_file_bytes=16 << 10)
    lake = SqlLake(spark).register("tr", t)
    out = lake.sql(
        "SELECT count(*) AS n FROM tr "
        "WHERE ts >= '2024-01-01 00:10:00' AND k < 1800"
    )
    assert lake.last_fast_agg is not None
    assert lake.last_fast_agg["buckets_scanned"] == 0
    truth = lake.spark.sql  # silence linters; truth via generic path:
    gen = t.read().filter(
        (F.col("ts") >= "2024-01-01 00:10:00") & (F.col("k") < 1800)
    ).count()
    assert out.collect()[0][0] == gen
    # string-literal escaping survives the conjunct slice
    t2 = LakeTable(spark, str(tmp_path / "s"), key_cols=("k",),
                   order_cols=("ts",), n_buckets=2,
                   stats_cols=("k", "ts", "val"))
    t2.merge(_rows(spark, 0, 10, val=lambda i: "a'b" if i == 3 else f"v{i}"),
             "b0")
    lake.register("ts2", t2)
    n = lake.sql("SELECT count(*) AS n FROM ts2 WHERE val = 'a''b'")
    assert n.collect()[0][0] == 1


def test_sql_routing_parity_battery(spark, tmp_path, monkeypatch):
    """Adversarial SQL strings: whatever the router decides (route or
    fall through), the result must equal the generic resolver's. The
    generic side is obtained by disabling _fast_agg wholesale."""
    from gamechanger_data_spark.plans import sqlfront as sf

    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4,
                  stats_cols=("k", "ts", "val"))
    t.merge(_rows(spark, 0, 200,
                  val=lambda i: "it's" if i == 7 else ("x AND k < 5" if i == 8 else f"v{i}")),
            "b0")
    v1 = t.current_version()
    t.merge(_rows(spark, 200, 260), "b1")
    lake = sf.SqlLake(spark).register("tr", t)
    queries = [
        "SELECT COUNT(*) AS n FROM tr WHERE val = 'x AND k < 5'",
        "select count(*) as n from tr where K >= 10 and TS <= "
        "'2024-01-01 00:02:00'",
        "SELECT count( * ) AS n FROM tr;",
        "SELECT count(*) AS n FROM tr WHERE k = 3 AND k = 3",
        "SELECT count(*) AS n FROM tr WHERE val = 'it''s'",
        "SELECT count(*) AS n FROM tr WHERE k BETWEEN 1 AND 5",
        "SELECT count(*) AS n FROM tr -- trailing comment WHERE k < 0",
        f"SELECT min(k) AS a, max(k) AS b FROM tr VERSION AS OF {v1}",
        "SELECT count(*) AS n FROM tr WHERE k in (1, 2)",
        "SELECT count(val) AS nv, max(ts) AS mx FROM tr",
    ]
    for q_ in queries:
        routed = [r[:] for r in lake.sql(q_).collect()]
        monkeypatch.setattr(sf.SqlLake, "_fast_agg", lambda self, q: None)
        generic = [r[:] for r in lake.sql(q_).collect()]
        monkeypatch.undo()
        assert routed == generic, q_


def test_stats_agg_across_schema_evolution(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_rows(spark, 0, 60), "b0")
    # metadata-only ADD: old files lack the column entirely -> count(c)
    # cannot be metadata-proven there, must scan, and must come back 0
    t.add_columns({"score": "double"})
    c, rep = t.stats_agg([("count", "score")], return_report=True)
    assert c.collect()[0][0] == 0
    # rows arriving WITH the column: count reflects the mix exactly
    newer = spark.createDataFrame(
        [(100 + i, BASE_TS + timedelta(seconds=5000 + i), f"n{i}",
          "upsert", float(i)) for i in range(10)],
        T.StructType(SCH.fields + [T.StructField("score", T.DoubleType())]),
    )
    t.merge(newer, "b1")
    assert t.stats_agg([("count", "score")]).collect()[0][0] == 10
    assert t.stats_agg([("max", "score")]).collect()[0][0] == 9.0
    # DROP: the aggregate surface follows the schema
    t.drop_column("score")
    with pytest.raises(ValueError, match="unknown column"):
        t.stats_agg([("count", "score")])
    assert t.stats_agg([("count", "*")]).collect()[0][0] == 70


def test_expired_snapshot_counts_survive_retention(spark, tmp_path):
    # manifests outlive data files: a fully metadata-servable aggregate
    # of an EXPIRED snapshot still answers (historically exact), while
    # read() of that version fails loudly on the missing files
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=2)
    t.merge(_rows(spark, 0, 50), "b0")
    v1 = t.current_version()
    t.merge(_rows(spark, 0, 80, bump=1000), "b1")  # rewrites every bucket
    t.expire_snapshots(keep_last=1, grace_sec=0)
    c = t.stats_agg([("count", "*")], version=v1)
    assert c.collect()[0][0] == 50
    with pytest.raises(Exception):
        t.read(version=v1).count()


def test_predicate_count_col_hybrid(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), key_cols=("k",),
                  order_cols=("ts",), n_buckets=4,
                  stats_cols=("k", "ts", "val"))
    t.merge(_rows(spark, 0, 8000,
                  val=lambda i: None if i % 4 == 0 else f"v{i:05d}"), "b0")
    t.cluster_by("ts", target_file_bytes=8 << 10)
    cut = BASE_TS + timedelta(seconds=2000)
    out, rep = t.stats_agg(
        [("count", "*", "n"), ("count", "val", "nv")],
        where=[("ts", ">=", cut)], return_report=True)
    row = out.collect()[0]
    truth = t.read(where=[("ts", ">=", cut)]).agg(
        F.count(F.lit(1)).alias("n"), F.count("val").alias("nv")
    ).collect()[0]
    assert row[:] == truth[:] == (6000, 4500)
    assert rep["files_meta"] > 0 and rep["buckets_scanned"] == 0
    # with tombstones, count(col) files fall to the boundary channel but
    # the answer stays exact
    t.merge(_rows(spark, 0, 200, op="delete", bump=99000), "b1")
    out2 = t.stats_agg([("count", "val", "nv")], where=[("ts", ">=", cut)])
    truth2 = t.read(where=[("ts", ">=", cut)]).agg(
        F.count("val").alias("nv")).collect()[0]["nv"]
    assert out2.collect()[0][0] == truth2
