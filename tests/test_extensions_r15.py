"""Staged-registry discipline for the round-15 wave (EXT12, q262-q267):
per-entry DuckDB hash comparison (the driver's own check, run locally
every suite run), the no-HUGEINT output lint, the complex-type output
lint, and the plan lint — the same gauntlet every prior staged wave
carried before its rotation merge.  Operator SEMANTICS are pinned in
tests/test_r15_wave.py on hand fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from oracle_harness import compare, duckdb_connection


def _ext12():
    from magi_etl_spark.queries.extensions_r15 import (
        EXT12_ORACLE,
        EXT12_QUERIES,
    )

    return EXT12_QUERIES, EXT12_ORACLE


def test_staging_registry_is_disjoint_from_the_gate_registry():
    from magi_etl_spark.queries import QUERIES

    ext_q, ext_o = _ext12()
    assert not set(ext_q) & set(QUERIES)
    # every staged entry carries a full hash oracle
    assert set(ext_q) == set(ext_o)
    assert len(ext_q) == 6  # the wave stays at or under six


def test_staged_oracles_emit_no_hugeint(sf_dir):
    _, ext_o = _ext12()
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


def test_staged_queries_emit_no_complex_types(spark, sf_dir):
    ext_q, _ = _ext12()
    offenders = {}
    for name, fn in ext_q.items():
        bad = [
            f.name
            for f in fn(spark, sf_dir).schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
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
    ext_q, _ = _ext12()
    return sorted(ext_q)


@pytest.mark.parametrize("name", _names())
def test_staged_query_matches_oracle(spark, sf_dir, con, name):
    ext_q, ext_o = _ext12()
    ok, msg = compare(ext_q[name](spark, sf_dir), con, ext_o[name])
    assert ok, f"{name}: {msg}"


def test_staged_queries_are_lint_clean(spark, sf_dir):
    """Every r15 staged entry passes the plan linter BEFORE it enters
    the gate.  The blocked-rank pair (q262/q263) and the two-sample
    trio (q265/q266) materialize bounded cell frames at build time via
    the chkpt barrier (the q250 IPF pattern); everything else compiles
    to keyed joins, keyed aggregations, and per-key windows over
    distinct values only."""
    from magi_etl_spark.plans import lint

    ext_q, _ = _ext12()
    errors = {}
    for name, fn in ext_q.items():
        errs = [f for f in lint(fn(spark, sf_dir)) if f.severity == "error"]
        if errs:
            errors[name] = [f.rule for f in errs]
    assert not errors, errors
