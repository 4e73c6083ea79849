"""The r9 staged registry (EXT6, q226-q231) merged into the main
registry at the r10 rotation (COVERAGE.md "Planned r10 window").  The
per-entry DuckDB-oracle sweep these tests used to run now happens
through the main-registry sweep (tests/test_queries_oracle.py), the
plan lint through tests/test_plan_lint.py, and the no-HUGEINT lint
through tests/test_oracle_types.py.  What remains here is the merge
invariant."""

from __future__ import annotations


def _ext6():
    from magi_etl_spark.queries.extensions_r9 import EXT6_ORACLE, EXT6_QUERIES

    return EXT6_QUERIES, EXT6_ORACLE


def test_r9_extension_registry_is_fully_merged():
    """r10 rotation rule 1: every EXT6 entry is registered (same function
    object — merged, not shadowed) and its oracle rode along; the
    all-query oracle sweep therefore covers them every run."""
    from magi_etl_spark.queries import ORACLE, QUERIES

    ext_q, ext_o = _ext6()
    assert len(ext_q) == 6 and set(ext_q) == set(ext_o)
    for name, fn in ext_q.items():
        assert QUERIES.get(name) is fn, f"{name} not merged into QUERIES"
        assert ORACLE.get(name) == ext_o[name], f"{name} oracle not merged"
