"""Embedding quantization (operators/quantize.py)."""

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.quantize import (
    dequantize_vec,
    quantize_embeddings,
    reconstruction_error,
)


@pytest.fixture()
def vecs(spark):
    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.001, 0.002, -0.003, 0.004]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # all-zero: scale 0, codes 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codes_and_scale(vecs):
    got = {r.vec_id: r for r in quantize_embeddings(vecs).collect()}
    assert got[1].scale == pytest.approx(1.0 / 127)
    assert got[1].codes == [127, -64, 32, 0]  # round(-0.5/  (1/127)) = -63.5 -> -64
    assert got[3].scale == 0.0 and got[3].codes == [0, 0, 0, 0]
    # small-magnitude vector still uses the full code range
    assert max(abs(c) for c in got[2].codes) == 127


def test_reconstruction_bound(spark):
    import random

    random.seed(7)
    rows = [
        (i, [random.uniform(-2, 2) for _ in range(64)]) for i in range(50)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = reconstruction_error(quantize_embeddings(vecs))
    stats = q.select(
        F.max(F.col("max_abs_err") / F.col("scale")).alias("worst_in_scales"),
        F.max("mse").alias("worst_mse"),
    ).collect()[0]
    # scalar quantization error is at most scale/2 per element
    assert stats.worst_in_scales <= 0.5 + 1e-9
    assert stats.worst_mse < (2.0 / 127) ** 2  # well under one code step squared


def test_dequantize_roundtrip(vecs):
    q = quantize_embeddings(vecs)
    back = q.select(
        "vec_id", dequantize_vec(F.col("codes"), F.col("scale")).alias("recon")
    )
    got = {r.vec_id: r.recon for r in back.collect()}
    assert got[1][0] == pytest.approx(1.0, abs=1e-9)  # max element is exact
    assert got[3] == [0.0, 0.0, 0.0, 0.0]


def test_no_shuffle_plan(vecs):
    plan = quantize_embeddings(vecs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
