"""Staged-registry discipline for the round-12 wave (EXT9, q244-q249):
per-entry DuckDB hash comparison (the driver's own check, run locally
every suite run), the no-HUGEINT output lint, the complex-type output
lint, and the plan lint — the same gauntlet every prior staged wave
carried before its rotation merge.  Operator SEMANTICS are pinned in
tests/test_r12_wave.py on hand fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from oracle_harness import compare, duckdb_connection


def _ext9():
    from magi_etl_spark.queries.extensions_r12 import (
        EXT9_ORACLE,
        EXT9_QUERIES,
    )

    return EXT9_QUERIES, EXT9_ORACLE


def test_r12_extension_registry_is_fully_merged():
    """r13 rotation rule 1: every EXT9 entry is registered (same function
    object — merged, not shadowed) and its oracle rode along; the
    all-query oracle sweep therefore covers them every run.  (Until the
    r13 merge this test asserted the OPPOSITE — staged disjointness.)"""
    from magi_etl_spark.queries import ORACLE, QUERIES

    ext_q, ext_o = _ext9()
    assert len(ext_q) == 6 and set(ext_q) == set(ext_o)
    for name, fn in ext_q.items():
        assert QUERIES.get(name) is fn, f"{name} not merged into QUERIES"
        assert ORACLE.get(name) == ext_o[name], f"{name} oracle not merged"


def test_staged_oracles_emit_no_hugeint(sf_dir):
    _, ext_o = _ext9()
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
    ext_q, _ = _ext9()
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
    ext_q, _ = _ext9()
    return sorted(ext_q)


@pytest.mark.parametrize("name", _names())
def test_staged_query_matches_oracle(spark, sf_dir, con, name):
    ext_q, ext_o = _ext9()
    ok, msg = compare(ext_q[name](spark, sf_dir), con, ext_o[name])
    assert ok, f"{name}: {msg}"


def test_staged_queries_are_lint_clean(spark, sf_dir):
    """Every r12 staged entry passes the plan linter BEFORE it enters
    the gate.  q244's component stage localCheckpoints bounded
    intermediates at build time (the q59/q116 pattern); the returned
    plan is keyed joins and aggregates only."""
    from magi_etl_spark.plans import lint

    ext_q, _ = _ext9()
    errors = {}
    for name, fn in ext_q.items():
        errs = [f for f in lint(fn(spark, sf_dir)) if f.severity == "error"]
        if errs:
            errors[name] = [f.rule for f in errs]
    assert not errors, errors
