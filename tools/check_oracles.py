"""Local mirror of the driver's correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted, floats rounded).

Usage: python tools/check_oracles.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        errs.append(f"columns spark={sc} duck={dc}")
        return errs
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if np.issubdtype(np.asarray(a[c]).dtype, np.floating):
                ok = np.allclose(
                    a[c].astype(float), b[c].astype(float), rtol=1e-9, atol=1e-9,
                    equal_nan=True,
                )
            else:
                ok = (a[c].astype(str) == b[c].astype(str)).all()
            if not ok:
                bad = (a[c].astype(str) != b[c].astype(str)).to_numpy().nonzero()[0][:3]
                errs.append(
                    f"values differ in '{c}' at rows {list(bad)}: "
                    f"spark={[a[c].iloc[i] for i in bad]} duck={[b[c].iloc[i] for i in bad]}"
                )
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    from gamechanger_data_spark.plans.catalog import CATALOG
    from gamechanger_data_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duck_con(sf_dir)

    passed, failed, rows_only = [], [], []
    for name, spec in CATALOG.items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if spec.sql is None:
            rows_only.append((name, len(sdf)))
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            ddf = con.sql(spec.sql).df()
        except Exception as e:
            failed.append((name, f"DUCK ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        errs = compare(name, sdf, ddf)
        if errs:
            failed.append((name, "; ".join(errs)))
            print(f"FAIL {name}: {'; '.join(errs)[:400]}")
        else:
            passed.append(name)
            print(f"PASS {name} ({len(sdf)} rows)")

    print(f"\n== {len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only ==")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
