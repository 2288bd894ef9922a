"""Predicate DML: delete_where / update_where as first-class exactly-once
commits compiling to touched-bucket CoW rewrites, with bucket pruning via
buckets_for_keys. Reference analog: the id-list delete pipeline
(dataPipelines/gc_ingest/pipelines/core/cli.py:267-284).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gamechanger_data_spark.sinks.table import LakeTable


def _ev(spark, rows):
    """rows: (conv_id, turn_idx, ts_epoch_sec, event_seq, op, text, role)."""
    pdf = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "ts", "event_seq", "op", "text", "role"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int64")
    pdf["event_seq"] = pdf["event_seq"].astype("int64")
    return spark.createDataFrame(pdf)


def _seed(spark, tmp_path, nb=4):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=nb)
    t.merge(
        _ev(spark, [
            ("c1", 0, 100, 1, "insert", "hello", "user"),
            ("c1", 1, 100, 2, "insert", "hi there", "assistant"),
            ("c2", 0, 100, 3, "insert", "calc(2+2)", "tool"),
            ("c3", 0, 100, 4, "insert", "sys prompt", "system"),
            ("c3", 1, 100, 5, "insert", "question", "user"),
        ]),
        "seed",
    )
    return t


def test_delete_where_tombstones_and_exactly_once(spark, tmp_path):
    t = _seed(spark, tmp_path)
    r = t.delete_where(F.col("role") == "tool", "dml-1")
    assert not r["skipped"] and r["rows_hit"] == 1
    got = t.read().toPandas()
    assert "tool" not in set(got["role"]) and len(got) == 4
    # physically a tombstone, not a vanished row
    raw = t.read_buckets(range(4), include_tombstones=True).toPandas()
    dead = raw[raw["__deleted"] == True]  # noqa: E712
    assert len(dead) == 1 and dead.iloc[0]["conv_id"] == "c2"
    # replay is a no-op
    r2 = t.delete_where(F.col("role") == "tool", "dml-1")
    assert r2["skipped"]


def test_delete_where_tombstone_defends_key(spark, tmp_path):
    """The DML tombstone carries the row's own order columns: an OLDER
    late event for the key stays dead; a NEWER event resurrects it —
    the same semantics as merge deletes."""
    t = _seed(spark, tmp_path)
    t.delete_where((F.col("conv_id") == "c1") & (F.col("turn_idx") == 0), "dml-1")
    # older event (ts 50 < 100): must lose to the tombstone
    t.merge(_ev(spark, [("c1", 0, 50, 9, "update", "stale", "user")]), "late")
    assert ("c1", 0) not in {
        (r.conv_id, r.turn_idx) for r in t.read().collect()
    }
    # newer event resurrects
    t.merge(_ev(spark, [("c1", 0, 200, 10, "update", "fresh", "user")]), "b2")
    got = t.read().filter("conv_id = 'c1' and turn_idx = 0").toPandas()
    assert list(got["text"]) == ["fresh"]


def test_delete_where_bucket_pruning(spark, tmp_path):
    """A point delete with buckets_for_keys rewrites EXACTLY the key's
    bucket: every other bucket's file list is untouched in the manifest."""
    t = _seed(spark, tmp_path)
    before = t._load_manifest()
    bl = t.buckets_for_keys([{"conv_id": "c2", "turn_idx": 0}])
    assert len(bl) == 1
    r = t.delete_where(
        (F.col("conv_id") == "c2") & (F.col("turn_idx") == 0),
        "dml-1",
        buckets=bl,
    )
    assert r["touched_buckets"] == 1
    after = t._load_manifest()
    changed = [
        b for b in after["files"]
        if after["files"][b] != before["files"].get(b)
    ]
    assert changed == [str(bl[0])]
    assert after["touched_buckets"] == bl


def test_update_where_assignments(spark, tmp_path):
    t = _seed(spark, tmp_path)
    r = t.update_where(
        F.col("role") == "system",
        {"text": F.concat(F.lit("[sys] "), F.col("text"))},
        "dml-up-1",
    )
    assert not r["skipped"] and r["rows_hit"] == 1
    got = t.read().orderBy("conv_id", "turn_idx").toPandas()
    by_key = got.set_index(["conv_id", "turn_idx"])["text"].to_dict()
    assert by_key[("c3", 0)] == "[sys] sys prompt"
    assert by_key[("c1", 0)] == "hello"  # non-matching untouched
    # SQL-string condition + assignment form
    t.update_where("role = 'user'", {"text": "upper(text)"}, "dml-up-2")
    got = t.read().orderBy("conv_id", "turn_idx").toPandas()
    by_key = got.set_index(["conv_id", "turn_idx"])["text"].to_dict()
    assert by_key[("c1", 0)] == "HELLO" and by_key[("c3", 1)] == "QUESTION"
    # replay no-op
    assert t.update_where("role = 'user'", {"text": "'x'"}, "dml-up-2")["skipped"]


def test_update_where_guards(spark, tmp_path):
    t = _seed(spark, tmp_path)
    with pytest.raises(ValueError, match="key/internal"):
        t.update_where("true", {"conv_id": "'x'"}, "g1")
    with pytest.raises(ValueError, match="unknown column"):
        t.update_where("true", {"nope": "'x'"}, "g2")
    with pytest.raises(ValueError, match="at least one"):
        t.update_where("true", {}, "g3")
    # assignment casts to the stored type: schema cannot mutate
    t.update_where("role = 'user'", {"text": F.lit(123)}, "g4")
    assert dict(t.read().dtypes)["text"] == "string"


def test_empty_match_still_commits_marker(spark, tmp_path):
    t = _seed(spark, tmp_path)
    v0 = t.current_version()
    files0 = t._load_manifest()["files"]
    r = t.delete_where("role = 'nonexistent'", "dml-empty")
    assert not r["skipped"] and r["touched_buckets"] == 0
    assert t.current_version() == v0 + 1
    assert t._load_manifest()["files"] == files0  # no data rewritten
    assert t.delete_where("role = 'user'", "dml-empty")["skipped"]  # marker held


def test_dml_conflict_retries_against_fresh_state(spark, tmp_path):
    """A delete_where racing a merge commit: the DML loses the CAS,
    re-runs against fresh state, and its predicate applies to the NEW
    rows the winning merge introduced."""
    t = _seed(spark, tmp_path)
    w = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    src = _ev(spark, [("c9", 0, 300, 50, "insert", "race", "tool")])
    t._test_pre_commit = lambda: w.merge(src, "race-batch")
    r = t.delete_where(F.col("role") == "tool", "dml-1")
    assert not r["skipped"]
    # both the seeded tool row AND the racing merge's tool row are gone
    assert r["rows_hit"] == 2
    got = t.read().toPandas()
    assert "tool" not in set(got["role"])
    assert "c9" not in set(got["conv_id"])


def test_final_state_invariant_under_batching_around_dml(spark, tmp_path):
    """The batching-invariance property extended across a DML point: with
    the event stream split at a fixed boundary and a delete_where applied
    between the halves, the final state must not depend on how either
    half is internally batched (or on the CoW/MOR path)."""
    import numpy as np

    from gamechanger_data_spark.datagen import FeedSpec, all_events
    from gamechanger_data_spark.streaming.driver import apply_batch

    spec = FeedSpec(n_convs=25, max_turns=5, n_batches=3,
                    events_per_batch=300, seed=41, evolve_batch=None)
    events = all_events(spec)
    cut = len(events) // 2
    e1, e2 = events.iloc[:cut], events.iloc[cut:]
    cond = "role = 'tool'"
    cols = ["conv_id", "turn_idx", "role", "text", "ts", "event_seq"]

    def run(name, seed, merge_mode):
        t = LakeTable(spark, str(tmp_path / name), n_buckets=4,
                      merge_mode=merge_mode)
        rng = np.random.default_rng(seed)
        for half_i, half in enumerate((e1, e2)):
            nb = int(rng.integers(1, 4))
            assign = rng.integers(0, nb, len(half))
            for bi in range(nb):
                idx = rng.permutation(np.flatnonzero(assign == bi))
                if len(idx) == 0:
                    continue
                apply_batch(t, spark.createDataFrame(half.iloc[idx]),
                            f"{name}-h{half_i}-b{bi}")
            if half_i == 0:
                t.delete_where(cond, f"{name}-dml")
        return (t.read().orderBy("conv_id", "turn_idx")
                .toPandas()[cols].reset_index(drop=True))

    want = run("ref", 0, "auto")
    for seed, mode in ((1, "auto"), (2, "mor"), (3, "auto")):
        got = run(f"v{seed}{mode}", seed, mode)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
