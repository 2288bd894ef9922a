"""Training-shard export (sinks/export.py): deterministic assignment,
one file per shard, manifest checksums, audit round-trip."""

import glob
import os

from pyspark.sql import functions as F

from gamechanger_data_spark.sinks.export import (
    MANIFEST_NAME,
    export_shards,
    shard_expr,
    verify_shards,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_export_layout_manifest_and_determinism(spark, tmp_path):
    df = _docs(spark)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_shards(df, p1, n_shards=8)
    assert m1["total_rows"] == 200 and set(m1["shards"])
    # exactly one data file per non-empty shard
    for k in m1["shards"]:
        files = glob.glob(os.path.join(p1, f"__shard={k}", "*.parquet"))
        assert len(files) == 1, (k, files)
    # manifest written last, underscore-prefixed (invisible to Spark scans)
    assert os.path.exists(os.path.join(p1, MANIFEST_NAME))
    # the manifest does not break Spark's directory scan
    assert spark.read.parquet(p1).count() == 200
    # re-export elsewhere: identical manifest (run/partitioning independent)
    m2 = export_shards(df.repartition(13), p2, n_shards=8)
    assert m1["shards"] == m2["shards"]


def test_shard_membership_matches_assignment_expr(spark, tmp_path):
    df = _docs(spark, 120)
    p = str(tmp_path / "x")
    export_shards(df, p, n_shards=4)
    back = spark.read.parquet(p).withColumn(
        "want", shard_expr("doc_id", 4)
    )
    assert back.filter(F.col("__shard") != F.col("want")).count() == 0
    assert back.count() == 120


def test_verify_shards_detects_loss(spark, tmp_path):
    df = _docs(spark, 150)
    p = str(tmp_path / "x")
    m = export_shards(df, p, n_shards=4)
    ok = verify_shards(spark, p).toPandas()
    assert ok.ok.all() and len(ok) == len(m["shards"])
    # lose one shard's file -> that shard flags, others stay ok
    victim = sorted(m["shards"])[0]
    for f in glob.glob(os.path.join(p, f"__shard={victim}", "*.parquet")):
        os.remove(f)
    after = verify_shards(spark, p).toPandas().set_index("shard")
    assert not after.loc[int(victim)].ok
    assert after.drop(index=int(victim)).ok.all()


def test_publish_bulk_jsonl_format_and_idempotence(spark, tmp_path):
    import json

    from pyspark.sql import functions as F2

    from gamechanger_data_spark.functions.hashing import es_id_expr
    from gamechanger_data_spark.sinks.export import publish_bulk_jsonl

    docs = _docs(spark, 50).withColumn(
        "es_id",
        es_id_expr(F2.concat(F2.lit("doc_"), F2.col("doc_id"), F2.lit(".json"))),
    )
    p = str(tmp_path / "bulk")
    m = publish_bulk_jsonl(docs, p, n_shards=4)
    assert m["total_rows"] == 50 and m["format"] == "bulk-jsonl"

    def read_lines(path):
        out = []
        for f in sorted(glob.glob(os.path.join(path, "__shard=*", "part-*"))):
            with open(f) as fh:
                out += [ln for ln in fh.read().splitlines() if ln]
        return out

    lines = read_lines(p)
    assert len(lines) == 100  # action + doc per row
    ids = set()
    for i in range(0, len(lines), 2):
        act, doc = json.loads(lines[i]), json.loads(lines[i + 1])
        assert set(act) == {"index"} and len(act["index"]["_id"]) == 64
        assert "es_id" not in doc and doc["text"].startswith("text-")
        ids.add(act["index"]["_id"])
    assert len(ids) == 50  # deterministic unique ids

    # idempotent re-publish: identical content, identical manifest
    m2 = publish_bulk_jsonl(docs, p, n_shards=4)
    assert m2 == m and sorted(read_lines(p)) == sorted(lines)


def test_pack_offsets_layout_invariants(spark):
    from pyspark.sql import functions as F2

    from gamechanger_data_spark.sinks.export import pack_offsets

    docs = spark.range(300).select(
        F2.col("id").alias("doc_id"),
        (F2.pmod("id", F2.lit(97)) + 1).cast("long").alias("n_tokens"),
    )
    out = pack_offsets(docs, seq_budget=128, n_shards=4).toPandas()
    assert len(out) == 300
    for _, g in out.merge(
        docs.toPandas(), on="doc_id"
    ).sort_values(["shard", "doc_id"]).groupby("shard"):
        # offsets are contiguous: each doc starts where the previous ended
        ends = (g.tok_offset + g.n_tokens).tolist()
        assert g.tok_offset.tolist() == [0] + ends[:-1]
        # chunk bookkeeping is consistent with the offsets
        assert (g.chunk_first == g.tok_offset // 128).all()
        assert (g.chunk_last == (g.tok_offset + g.n_tokens - 1) // 128).all()
        assert (g.spans_chunks == (g.chunk_first != g.chunk_last)).all()
    # partitioning-independent layout
    out2 = pack_offsets(docs.repartition(11), 128, 4).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_pack_offsets_zero_token_doc_on_boundary(spark):
    from pyspark.sql import functions as F2

    from gamechanger_data_spark.sinks.export import pack_offsets

    # craft: doc A fills chunk 0 exactly; doc B is EMPTY and lands on the
    # boundary; doc C starts chunk 1 — ids chosen so one shard holds all
    docs = spark.createDataFrame(
        [(1, 128), (2, 0), (3, 10)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r for r in pack_offsets(docs, 128, n_shards=1).collect()}
    b = out[2]
    assert b.tok_offset == 128
    assert b.chunk_first == b.chunk_last == 1  # no negative chunk_last
    assert not b.spans_chunks                  # spans nothing
    assert out[1].chunk_last == 0 and out[3].chunk_first == 1


def test_export_formats_orc_and_json(spark, tmp_path):
    from gamechanger_data_spark.sinks.export import export_shards

    df = _docs(spark, 80)
    base = export_shards(df, str(tmp_path / "pq"), n_shards=4)
    for fmt in ("orc", "json"):
        p = str(tmp_path / fmt)
        m = export_shards(df, p, n_shards=4, fmt=fmt)
        # identical shard membership & checksums across formats
        assert m["shards"] == base["shards"] and m["format"] == fmt
        ok = verify_shards(spark, p).toPandas()
        assert ok.ok.all()
        back = spark.read.format(fmt)
        if fmt == "json":
            back = back.schema("doc_id long, text string")
        assert back.load(p).count() == 80
