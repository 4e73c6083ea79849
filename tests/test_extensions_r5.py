"""Staged r6 gate queries (q117-q121): run the driver's own DuckDB
comparison over every EXT2_QUERIES entry so the staging surface carries
hash-level correctness evidence before it ever enters the external
window — the same discipline queries/extensions.py (q95-q113) carried
through r4."""

from __future__ import annotations

import pytest

from oracle_harness import compare, duckdb_connection


def _ext2():
    from magi_etl_spark.queries.extensions_r5 import EXT2_ORACLE, EXT2_QUERIES

    return EXT2_QUERIES, EXT2_ORACLE


def test_staging_registry_is_disjoint_from_the_gate_registry():
    from magi_etl_spark.queries import QUERIES

    ext_q, ext_o = _ext2()
    assert not set(ext_q) & set(QUERIES)
    # every staged entry carries a full hash oracle
    assert set(ext_q) == set(ext_o)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def _names():
    ext_q, _ = _ext2()
    return sorted(ext_q)


@pytest.mark.parametrize("name", _names())
def test_staged_query_matches_oracle(spark, sf_dir, con, name):
    ext_q, ext_o = _ext2()
    ok, msg = compare(ext_q[name](spark, sf_dir), con, ext_o[name])
    assert ok, f"{name}: {msg}"


def test_staged_queries_are_lint_clean(spark, sf_dir):
    """The r4 VERDICT's staged-lint discipline: q117-q121 pass the plan
    linter BEFORE they enter the gate (q117/q118 return driver-built
    merge tables — their per-iteration plans are asserted separately in
    tests/test_bpe.py::test_bpe_iteration_plan_shape)."""
    from magi_etl_spark.plans import lint

    ext_q, _ = _ext2()
    errors = {}
    for name, fn in ext_q.items():
        errs = [f for f in lint(fn(spark, sf_dir)) if f.severity == "error"]
        if errs:
            errors[name] = [f.rule for f in errs]
    assert not errors, errors
