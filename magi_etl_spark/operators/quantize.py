"""Embedding quantization: symmetric int8 scalar quantization with a
per-vector scale (LLM-data-pipeline extension; the reference is
tabular-only).

At corpus scale the embedding column dominates storage (a 1024-dim
float32 vector is 4 KB/row); int8 codes cut it 4x with ~0.4% max error,
which is why ANN systems (FAISS SQ8, ScaNN) default to it.  Everything
here is pure array Columns — transform/aggregate higher-order functions,
no UDFs, no shuffle: quantization composes into any scan at zero extra
stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.functions.vectors import as_double


def vector_scale(vec: Column, q_max: int = 127) -> Column:
    """Per-vector symmetric scale: max|x| / q_max (0.0 for all-zero
    vectors — their codes are all zero and dequantize exactly)."""
    return F.array_max(F.transform(as_double(vec), lambda x: F.abs(x))) / F.lit(
        float(q_max)
    )


def quantize_vec(vec: Column, scale: Column, q_max: int = 127) -> Column:
    """int codes: clamp(round(x / scale)) in [-q_max, q_max]."""
    lo, hi = F.lit(-float(q_max)), F.lit(float(q_max))
    return F.when(
        scale > 0,
        F.transform(
            as_double(vec),
            lambda x: F.greatest(lo, F.least(hi, F.round(x / scale))).cast("int"),
        ),
    ).otherwise(F.transform(as_double(vec), lambda x: F.lit(0)))


def dequantize_vec(codes: Column, scale: Column) -> Column:
    """Reconstruction: code * scale, back to array<double>."""
    return F.transform(codes, lambda q: q.cast("double") * scale)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    q_max: int = 127,
    codes_col: str = "codes",
    scale_col: str = "scale",
) -> DataFrame:
    """Add (codes array<int>, scale double) alongside the original
    columns; ``dequantize_vec(codes, scale)`` reconstructs within
    scale/2 per element."""
    scale = vector_scale(F.col(vec_col), q_max)
    out = df.withColumn(scale_col, scale)
    return out.withColumn(
        codes_col, quantize_vec(F.col(vec_col), F.col(scale_col), q_max)
    )


def reconstruction_error(
    df: DataFrame,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    scale_col: str = "scale",
) -> DataFrame:
    """Per-row max-abs and mean-squared reconstruction error columns."""
    v = as_double(F.col(vec_col))
    err = F.zip_with(
        v,
        dequantize_vec(F.col(codes_col), F.col(scale_col)),
        lambda a, b: F.abs(a - b),
    )
    sq = F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e)
    return df.withColumn("max_abs_err", F.array_max(err)).withColumn(
        "mse", sq / F.size(err)
    )
