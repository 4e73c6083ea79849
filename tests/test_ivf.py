"""IVF approximate-nearest-neighbor tests: recall against the exact
brute-force baseline, scan-fraction sanity, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.similarity import cosine_topk, ivf_index, ivf_topk
from magi_etl_spark.tables import load_table


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_ivf_recall_vs_exact(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") < 5)
    exact = cosine_topk(embeddings, queries, k=10)
    assigned, centroids = ivf_index(embeddings, n_lists=8, seed=42)
    approx = ivf_topk(assigned, centroids, queries, k=10, n_probe=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall@10 too low: {recall}"
    # full probing == exact
    full = ivf_topk(assigned, centroids, queries, k=10, n_probe=8)
    f = {(r.query_id, r.vec_id) for r in full.collect()}
    assert f == e


def test_ivf_deterministic(embeddings):
    a1, c1 = ivf_index(embeddings, n_lists=8, seed=42)
    a2, c2 = ivf_index(embeddings, n_lists=8, seed=42)
    assert c1 == c2
    assert {(r.vec_id, r.list_id) for r in a1.collect()} == {
        (r.vec_id, r.list_id) for r in a2.collect()
    }
