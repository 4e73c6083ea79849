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


def test_ivf_spread_init_recall_at_8x(spark, embeddings):
    """r3 VERDICT item 8: the k-means||-style ``init="spread"`` sampled
    quantizer must hold recall when the corpus grows 8x.  Replicated
    copies get a tiny deterministic per-element jitter (geometry
    preserved, exact duplication broken — cosine is scale-invariant per
    vector, so the jitter must vary by element, not by vector)."""
    from magi_etl_spark.operators.similarity import ivf_index_sampled

    n = 8
    jitter = F.transform(
        "embedding",
        lambda x, i: x
        * (
            F.lit(1.0)
            + ((F.col("_k") * 37 + i) % 11 - 5).cast("double") * F.lit(1e-3)
        ),
    )
    emb8 = (
        embeddings.select(
            "*", F.explode(F.array(*[F.lit(k) for k in range(n)])).alias("_k")
        )
        .withColumn("embedding", jitter)
        .withColumn(
            "vec_id", F.col("vec_id") + F.col("_k").cast("long") * 10_000_000
        )
        .drop("_k")
        .persist()
    )
    queries = emb8.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb8, queries, k=10).collect()
    }
    assigned, cents = ivf_index_sampled(emb8, n_lists=16, init="spread", seed=7)
    approx = ivf_topk(assigned, cents, queries, k=10, n_probe=6)
    got = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact & got) / len(exact)
    # no "init=first is worse" control here: the synthetic corpus draws
    # vec_ids uniformly, so the first-ids init is NOT degenerate on it
    # (id-clustered corpora are where "spread" earns its keep) — the
    # absolute bar at 8x is the scale evidence
    assert recall >= 0.7, f"spread-init recall@10 at 8x too low: {recall}"
    emb8.unpersist()
