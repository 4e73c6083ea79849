"""The r6 staged registry (q133-q183) at the r8 rotation: the first 49
entries (q133-q181) merged into the main registry (COVERAGE.md "Planned
r8 window", scenario 1 — the q122 failure re-entry takes the 50th slot),
so their per-entry DuckDB-oracle sweep now happens through the
main-registry sweep (tests/test_queries_oracle.py), the plan lint
through tests/test_plan_lint.py, and the no-HUGEINT lint through
tests/test_oracle_types.py.  What remains here is the merge invariant
plus the full staging discipline for the two-entry residue (q182/q183 =
R9_QUEUE), which leads the r9 window."""

from __future__ import annotations

import pytest

from oracle_harness import compare, duckdb_connection


def _ext3():
    from magi_etl_spark.queries.extensions_r6 import EXT3_ORACLE, EXT3_QUERIES

    return EXT3_QUERIES, EXT3_ORACLE


def _residue() -> list[str]:
    from magi_etl_spark.queries import R9_QUEUE

    ext_q, _ = _ext3()
    return [n for n in ext_q if n in R9_QUEUE]


def test_r6_extension_registry_is_partially_merged():
    """r8 rotation: every EXT3 entry except the R9_QUEUE residue is
    registered (same function object — merged, not shadowed) with its
    oracle; the residue stays out until the r9 rotation."""
    from magi_etl_spark.queries import ORACLE, QUERIES, R9_QUEUE

    ext_q, ext_o = _ext3()
    assert len(ext_q) == 51 and set(ext_q) == set(ext_o)
    assert R9_QUEUE <= set(ext_q) and len(R9_QUEUE) == 2
    for name, fn in ext_q.items():
        if name in R9_QUEUE:
            assert name not in QUERIES, f"{name} merged early (r9 queue)"
        else:
            assert QUERIES.get(name) is fn, f"{name} not merged into QUERIES"
            assert ORACLE.get(name) == ext_o[name], f"{name} oracle not merged"


def test_staged_residue_oracles_emit_no_hugeint(sf_dir):
    """The q89 lesson applies to staging too: no staged oracle may emit
    HUGEINT/UHUGEINT output columns."""
    _, ext_o = _ext3()
    con = duckdb_connection(sf_dir)
    offenders = {}
    for name in _residue():
        rel = con.sql(ext_o[name])
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


@pytest.mark.parametrize("name", sorted({"q182_multi_touch", "q183_markov_attribution"}))
def test_staged_residue_matches_oracle(spark, sf_dir, con, name):
    ext_q, ext_o = _ext3()
    ok, msg = compare(ext_q[name](spark, sf_dir), con, ext_o[name])
    assert ok, f"{name}: {msg}"


def test_staged_residue_is_lint_clean(spark, sf_dir):
    from magi_etl_spark.plans import lint

    ext_q, _ = _ext3()
    errors = {}
    for name in _residue():
        errs = [f for f in lint(ext_q[name](spark, sf_dir)) if f.severity == "error"]
        if errs:
            errors[name] = [f.rule for f in errs]
    assert not errors, errors
