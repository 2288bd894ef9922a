"""Every catalog query must match its DuckDB oracle on the driver testdata
(same compare the driver runs: row count + columns + order-insensitive
values). Runs at sf0.001 for speed; tools/check_oracles.py runs sf0.01."""

import os

import pytest

from tools.check_oracles import compare, duck_con

SF_DIR = os.environ.get("GCSPARK_TEST_SF", "/root/testdata/sf0.001")


def _catalog():
    from gamechanger_data_spark.plans.catalog import CATALOG

    return CATALOG


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", list(_catalog().keys()))
def test_query_matches_oracle(spark, con, name):
    spec = _catalog()[name]
    sdf = spec.fn(spark, SF_DIR).toPandas()
    if spec.sql is None:
        assert len(sdf) >= 0  # rows-only contract: must run and be stable
        return
    ddf = con.sql(spec.sql).df()
    errs = compare(name, sdf, ddf)
    assert not errs, f"{name}: {errs}"
