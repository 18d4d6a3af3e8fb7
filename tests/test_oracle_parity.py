"""Every registered query must hash-match its DuckDB oracle (driver's t2 gate)."""

from __future__ import annotations

import pytest

from futures_eos_cdc_spark.plans import ORACLES, QUERIES
from tests.oracle_utils import compare, duckdb_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    compare(df, con, ORACLES[name])


def test_all_queries_run(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
