"""Physical-plan assertions: pushdown, pruning, broadcast, codegen — the
properties that keep the catalog queries viable at 100 TB."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1995-01-01")
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    plan = _plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_dim_join_is_broadcast(spark):
    from gamechanger_data_spark.plans.catalog import CATALOG

    plan = _plan(CATALOG["dim_lookup_join"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lww_max_by_is_partial_hash_aggregate(spark):
    """The scale-path LWW must run as a hash aggregate with a partial
    (map-side) phase before the exchange — the skew defense."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    plan = _plan(CATALOG["lww_latest_max_by"].fn(spark, SF))
    assert "partial_max" in plan
    assert "Exchange" in plan


def test_whole_stage_codegen_covers_normalization(spark):
    from gamechanger_data_spark.functions.text import normalize_text_expr

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        normalize_text_expr("text").alias("t"), F.sha2(F.col("text"), 256)
    )
    # formatted mode marks codegen spans with '[codegen id : N]' (the '*'
    # operator prefix); the whole normalize+hash projection must be inside one
    assert "codegen id" in _plan(df)


def test_lineage_pass_prunes_text_column(spark, tmp_path):
    """The fused lineage+touched pass reads only (op, event_seq, keys) —
    parquet ReadSchema must not include the text payload."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gamechanger_data_spark.datagen import FeedSpec, generate_batch

    pdf = generate_batch(FeedSpec(n_convs=10, events_per_batch=100), 0)
    p = str(tmp_path / "ev.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
    df = spark.read.parquet(p)

    bucket = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(8)).cast("int")
    proj = df.select("op", "event_seq", bucket.alias("__b"))
    plan = _plan(proj)
    read_schema = plan.split("ReadSchema:")[-1].splitlines()[0]
    assert "text" not in read_schema
    assert "op" in read_schema and "event_seq" in read_schema


def test_decontaminate_probe_side_broadcasts(spark):
    """The probe (eval-set) shingles must broadcast — the corpus side of
    the decontamination join never shuffles."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    plan = _plan(CATALOG["decontaminate_ngram"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_deterministic_sample_is_scan_plus_filter(spark):
    """Hash-threshold sampling is one scan + codegen filter: no exchange,
    no UDF — the whole plan stays map-side."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    plan = _plan(CATALOG["deterministic_sample"].fn(spark, SF))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_paragraph_segment_no_shuffle(spark):
    """Segmentation is split/filter/posexplode — a pure map plan; the
    dense counter must NOT come from a window (no exchange)."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    plan = _plan(CATALOG["paragraph_segment"].fn(spark, SF))
    assert "Exchange" not in plan
    assert "Window" not in plan


def test_lww_window_keeps_partial_group_limit(spark):
    """The rn=1 window must carry Spark's partial WindowGroupLimit (each
    map task pre-reduces to its local top-1 per key before the shuffle) —
    the property that makes the default merge strategy hot-key-tolerant
    (measured 3-5x in tools/bench_skew.py; BENCH/BASELINE.md)."""
    from gamechanger_data_spark.operators.lww import lww_window

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(lww_window(ev, keys=("user_id",), order=("ts", "event_id")))
    assert plan.count("WindowGroupLimit") >= 2, plan  # partial + final


def test_weighted_sample_is_top_k_no_data_shuffle(spark):
    """The ES weighted sample must compile to TakeOrderedAndProject (k
    rows kept per partition) — a global sort would shuffle the corpus."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    plan = _plan(CATALOG["weighted_sample"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_weighted_sample_weight_proportional_and_deterministic(spark):
    """A key with overwhelming weight is always drawn; the draw is a pure
    function of (key, salt) — identical across invocations."""
    from gamechanger_data_spark.operators.sampling import weighted_sample

    rows = [(f"k{i}", 1) for i in range(200)] + [("whale", 1_000_000)]
    df = spark.createDataFrame(rows, "k string, w long")
    for salt in ("a", "b", "c"):
        got = weighted_sample(df, "k", "w", k=10, salt=salt).toPandas()
        assert "whale" in set(got["k"]), salt
        again = weighted_sample(df, "k", "w", k=10, salt=salt).toPandas()
        assert sorted(got["k"]) == sorted(again["k"])


def test_cms_sketch_is_broadcast_and_overestimates(spark):
    """The probe join must broadcast the bounded d x w sketch, and every
    CMS estimate must respect the one-sided error guarantee."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    df = CATALOG["cms_heavy_hitters"].fn(spark, SF)
    assert "BroadcastHashJoin" in _plan(df)
    pdf = df.toPandas()
    assert len(pdf) == 12
    assert (pdf["cms_count"] >= pdf["exact_count"]).all()


def test_interval_join_is_bucketed_equi_join_not_nested_loop(spark):
    """The point-in-interval join must compile to a broadcast HASH join on
    the time bucket (plus a post-filter) — a raw theta join would be a
    BroadcastNestedLoopJoin over the full event table."""
    from gamechanger_data_spark.plans.catalog import CATALOG

    plan = _plan(CATALOG["interval_bucket_join"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
