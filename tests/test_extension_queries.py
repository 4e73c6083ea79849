"""Staged r5 gate queries: run the driver's own DuckDB comparison over
every EXT_QUERIES entry so the staging surface carries hash-level
correctness evidence before it ever enters the external window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_harness import compare, duckdb_connection


def _ext():
    from magi_etl_spark.queries.extensions import EXT_ORACLE, EXT_QUERIES

    return EXT_QUERIES, EXT_ORACLE


def test_staging_registry_is_disjoint_from_the_gate_registry():
    from magi_etl_spark.queries import QUERIES

    ext_q, _ = _ext()
    assert not set(ext_q) & set(QUERIES)
    # rows-only entries stay a deliberate, short list (driver contract)
    _, ext_o = _ext()
    assert len(set(ext_q) - set(ext_o)) <= 2


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def _oracle_names():
    _, ext_o = _ext()
    return sorted(ext_o)


@pytest.mark.parametrize("name", _oracle_names())
def test_extension_query_matches_oracle(spark, sf_dir, con, name):
    ext_q, ext_o = _ext()
    ok, msg = compare(ext_q[name](spark, sf_dir), con, ext_o[name])
    assert ok, f"{name}: {msg}"


def test_semantic_dedup_rows_only_invariants(spark, sf_dir):
    ext_q, _ = _ext()
    rows = ext_q["q104_semantic_dedup"](spark, sf_dir).collect()
    from magi_etl_spark.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    reps = {r["vec_id"] for r in rows if r["kept"]}
    assert reps  # at least one representative
    for r in rows:
        assert r["rep_id"] in reps and r["rep_id"] <= r["vec_id"]


def test_pq_refine_rows_only_invariants(spark, sf_dir):
    ext_q, _ = _ext()
    out = ext_q["q106_pq_refine_topk"](spark, sf_dir)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) == 10
        assert sorted(r["rn"] for r in rs) == list(range(1, 11))
        ds = [r["d2"] for r in sorted(rs, key=lambda r: r["rn"])]
        assert ds == sorted(ds)  # ascending exact distance
        assert all(r["vec_id"] != q for r in rs)
