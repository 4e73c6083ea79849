"""Staged r11 gate queries (q232-q237): run the driver's own DuckDB
comparison over every EXT7_QUERIES entry so the staging surface carries
hash-level correctness evidence before it ever enters the external
window — the same discipline every prior staged registry carried
through its staging rounds."""

from __future__ import annotations

import pytest

from oracle_harness import compare, duckdb_connection


def _ext7():
    from magi_etl_spark.queries.extensions_r10 import (
        EXT7_ORACLE,
        EXT7_QUERIES,
    )

    return EXT7_QUERIES, EXT7_ORACLE


def test_staging_registry_is_disjoint_from_the_gate_registry():
    from magi_etl_spark.queries import QUERIES

    ext_q, ext_o = _ext7()
    assert not set(ext_q) & set(QUERIES)
    # every staged entry carries a full hash oracle
    assert set(ext_q) == set(ext_o)


def test_staged_oracles_emit_no_hugeint(sf_dir):
    """The q89 lesson applies to staging too: no staged oracle may emit
    HUGEINT/UHUGEINT output columns."""
    _, ext_o = _ext7()
    con = duckdb_connection(sf_dir)
    offenders = {}
    for name, sql in ext_o.items():
        rel = con.sql(sql)
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() in ("HUGEINT", "UHUGEINT")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def _names():
    ext_q, _ = _ext7()
    return sorted(ext_q)


@pytest.mark.parametrize("name", _names())
def test_staged_query_matches_oracle(spark, sf_dir, con, name):
    ext_q, ext_o = _ext7()
    ok, msg = compare(ext_q[name](spark, sf_dir), con, ext_o[name])
    assert ok, f"{name}: {msg}"


def test_staged_queries_are_lint_clean(spark, sf_dir):
    """The staged-lint discipline: every r10 staged entry passes the
    plan linter BEFORE it enters the gate.  q233 is exempt from the
    single-partition rule the same way maxcover/coreset are not even
    lintable as single frames — its selection rounds are separate
    bounded jobs; the returned trace frame is a ≤3-row createDataFrame."""
    from magi_etl_spark.plans import lint

    ext_q, _ = _ext7()
    errors = {}
    for name, fn in ext_q.items():
        errs = [f for f in lint(fn(spark, sf_dir)) if f.severity == "error"]
        if errs:
            errors[name] = [f.rule for f in errs]
    assert not errors, errors
