"""Product quantization: determinism, encode geometry, ADC agreement
with the exact table sum, and recall against the exact L2 scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _load(spark, sf_dir):
    from magi_etl_spark.tables import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_pq_train_is_deterministic_and_shaped(spark, sf_dir):
    from magi_etl_spark.operators.pq import pq_train

    em = _load(spark, sf_dir)
    b1 = pq_train(em, m=4, k=8, seed=7)
    b2 = pq_train(em, m=4, k=8, seed=7)
    assert b1 == b2  # same corpus + seed => byte-identical codebooks
    assert len(b1) == 4 and all(len(book) == 8 for book in b1)
    dim = len(em.select("embedding").first()[0])
    assert all(len(c) == dim // 4 for book in b1 for c in book)
    # a different seed draws different candidates
    assert pq_train(em, m=4, k=8, seed=8) != b1


def test_pq_train_rejects_indivisible_dim(spark, sf_dir):
    from magi_etl_spark.operators.pq import pq_train

    with pytest.raises(ValueError):
        pq_train(_load(spark, sf_dir), m=7, k=4)


def test_pq_encode_assigns_nearest_code(spark):
    from magi_etl_spark.operators.pq import pq_encode

    # hand-built codebooks: subspace 0 codes at x=0 / x=10,
    # subspace 1 codes at y=0 / y=10
    books = [[[0.0], [10.0]], [[0.0], [10.0]]]
    df = spark.createDataFrame(
        [(1, [0.2, 9.8]), (2, [9.9, 0.1]), (3, [4.9, 5.1])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["codes"] for r in pq_encode(df, books).collect()}
    assert out[1] == [0, 1]
    assert out[2] == [1, 0]
    assert out[3] == [0, 1]  # 4.9 -> code 0, 5.1 -> code 1


def test_pq_adc_matches_hand_table_sum(spark):
    from magi_etl_spark.operators.pq import pq_adc_topk, pq_encode

    books = [[[0.0], [10.0]], [[0.0], [10.0]]]
    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, [0.0, 10.0])],
        "vec_id long, embedding array<double>",
    )
    query = spark.createDataFrame(
        [(99, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    enc = pq_encode(corpus, books)
    out = {r["vec_id"]: r for r in pq_adc_topk(enc, books, query, k=3).collect()}
    # vec 1 -> codes [0,0]: d2 = (1-0)^2 + (2-0)^2 = 5
    # vec 2 -> codes [1,1]: d2 = 81 + 64 = 145
    # vec 3 -> codes [0,1]: d2 = 1 + 64 = 65
    assert out[1]["adc_d2"] == pytest.approx(5.0)
    assert out[2]["adc_d2"] == pytest.approx(145.0)
    assert out[3]["adc_d2"] == pytest.approx(65.0)
    assert out[1]["rn"] == 1 and out[3]["rn"] == 2 and out[2]["rn"] == 3


def test_pq_recall_against_exact_l2(spark, sf_dir):
    from magi_etl_spark.operators.pq import pq_adc_topk, pq_encode, pq_train

    em = _load(spark, sf_dir).select("vec_id", "embedding")
    queries = em.where(F.col("vec_id") < 3)
    k = 10
    # exact L2 top-k via an expression scan
    from magi_etl_spark.functions.vectors import as_double

    d2 = F.aggregate(
        F.zip_with(
            as_double(F.col("a")), as_double(F.col("b")), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        em.select(F.col("vec_id"), F.col("embedding").alias("a"))
        .crossJoin(
            F.broadcast(
                queries.select(
                    F.col("vec_id").alias("query_id"), F.col("embedding").alias("b")
                )
            )
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", d2.alias("d2"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    exact = {
        (r["query_id"], r["vec_id"])
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .collect()
    }
    books = pq_train(em, m=16, k=32, seed=7)
    enc = pq_encode(em, books)
    got = {
        (r["query_id"], r["vec_id"])
        for r in pq_adc_topk(enc, books, queries, k=k).collect()
    }
    recall = len(exact & got) / len(exact)
    # These embeddings are distance-concentrated (nearest d2 ~1.33 vs
    # median ~1.98), the hardest regime for raw ADC: measured 0.57 at
    # 16x32 codebooks; random would be ~k/n ≈ 0.03.  The production
    # answer to this regime is the refine stage below.
    assert recall >= 0.4, recall

    # PQ + exact re-rank (the FAISS refine pattern): near-exact recall
    # while the corpus-wide scan still reads only the code column
    from magi_etl_spark.operators.pq import pq_topk_rerank

    refined = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk_rerank(enc, books, queries, em, k=k, rerank=60).collect()
    }
    assert len(exact & refined) / len(exact) >= 0.9
