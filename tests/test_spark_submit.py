"""Deployment path: the engine must run under ``spark-submit --py-files``
from the packaged zip alone (the north rule's execution mode), with no
repo directory on sys.path."""

import os
import subprocess
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    import sys
    repo = {root!r}
    assert all(p.rstrip('/') != repo for p in sys.path), sys.path
    from pyspark.sql import SparkSession

    from gamechanger_data_spark.datagen import (
        FeedSpec, write_feed, all_events, pandas_oracle)
    from gamechanger_data_spark.functions.text import normalize_text_pandas
    from gamechanger_data_spark.sinks.table import LakeTable
    from gamechanger_data_spark.streaming.driver import replay_feed

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import shutil, os
    work = sys.argv[1]
    spec = FeedSpec(n_convs=40, n_batches=2, events_per_batch=400, seed=42)
    write_feed(os.path.join(work, "feed"), spec)
    table = LakeTable(spark, os.path.join(work, "table"), n_buckets=4)
    replay_feed(spark, os.path.join(work, "feed"), table)
    got = (table.read().orderBy("conv_id", "turn_idx").toPandas()
           .reset_index(drop=True))
    want = pandas_oracle(all_events(spec), normalize=normalize_text_pandas)
    import pandas as pd
    cols = ["conv_id", "turn_idx", "text"]
    pd.testing.assert_frame_equal(
        got[cols], want[cols].reset_index(drop=True), check_dtype=False)
    print("SUBMIT-OK", len(got))
    """
)


def test_spark_submit_py_files_parity(tmp_path):
    sys.path.insert(0, ROOT)
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "gamechanger_data_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB.format(root=ROOT))
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            str(job), str(tmp_path / "work"),
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
    )
    assert "SUBMIT-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
