"""Product quantization (PQ) for memory-bounded ANN over embedding
columns (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

At 100 TB an ``array<float>`` embedding column dominates storage and
shuffle width; PQ stores each vector as M small integer codes (one per
subspace) and scores queries against the codes with per-subspace lookup
tables — asymmetric distance computation (ADC).  A 768-dim float vector
(3 KB) becomes M=96 byte-codes: a 32× narrower scan, and the scoring
pass reads only the code column.

Spark-first shape:

- **train**: codebooks are selected per subspace from deterministic
  hash-ordered candidates with greedy farthest-point refinement — the
  same KMeans-free, fully order-deterministic strategy as
  ``ivf_index_sampled`` (reference FAISS accepts any coarse/sub
  quantizer).  Driver holds only M×K×(D/M) floats.
- **encode**: per-subspace argmin over the broadcast codebooks as an
  Arrow-batched pandas UDF (no crossJoin, no window, no shuffle) —
  the deliberate exception to the expressions-first rule, because the
  expression form needs m×k interpreted higher-order lambdas per row
  and measured ~1000× slower than the numpy broadcast at m=16,k=16.
- **adc_topk**: the query side is collected (bounded query set, the
  same contract as ``cosine_topk``), its per-subspace distance tables
  are baked in as literal arrays and broadcast into codegen; the score
  is ``zip_with(codes, tables) -> table[code]`` summed — one narrow
  scan of the codes column, then the standard per-query top-k window.

Everything is deterministic: same corpus + seed ⇒ same codebooks,
codes, and neighbors, so tests (and oracles) can pin exact outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.functions.vectors import as_double
from magi_etl_spark.operators.similarity import _farthest_point_select


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    oversample: int = 16,
    iterations: int = 10,
    init: str = "fps",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: ``m`` subspaces × ``k`` codes each.
    One distributed pass collects the ``oversample*k`` smallest
    ``md5(seed || id)`` draws as the training sample (the bounded-sample
    training contract FAISS uses); per subspace the codebook is Lloyd
    k-means over the sample's sub-vectors, initialized by greedy
    farthest-point selection.  Farthest-point alone picks OUTLIERS —
    fine for coverage, terrible for quantization error — so the Lloyd
    sweeps pull centroids into the density; both stages are pure
    functions of (corpus, seed), so training is exactly reproducible.
    Returns ``codebooks[m][k][d/m]``.

    ``init="hash"`` takes the first ``k`` hash-ordered sample rows as
    the codebook instead of farthest-point selection — combined with
    ``iterations=0`` this makes the ENTIRE train→encode→ADC→refine path
    SQL-expressible (the q106 DuckDB oracle reproduces it literally),
    the same trade ``ivf_index_sampled(init="hash")`` makes for its
    coarse quantizer; the Lloyd path keeps its recall bound in
    tests/test_pq.py."""
    dim = len(
        df.select(as_double(F.col(vec_col)).alias("_v")).first()["_v"]
    )
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    hash_key = F.md5(F.concat(F.lit(f"pq{seed}"), F.col(id_col).cast("string")))
    cands = (
        df.select(F.col(id_col), as_double(F.col(vec_col)).alias("_v"))
        .orderBy(hash_key.asc(), F.col(id_col).asc())
        .limit(oversample * k)
        .collect()
    )
    sample = np.array([[float(x) for x in r["_v"]] for r in cands])
    if init not in ("fps", "hash"):
        raise ValueError(f"unknown PQ init {init!r}")
    codebooks: list[list[list[float]]] = []
    for j in range(m):
        pts = sample[:, j * sub : (j + 1) * sub]
        if init == "hash":
            cent = pts[:k].copy()
        else:
            picked = _farthest_point_select(
                [{"_v": list(p)} for p in pts], k
            )
            cent = np.array([c["_v"] for c in picked])
        for _ in range(iterations):
            d2 = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = pts[assign == c]
                if len(members):  # empty cluster keeps its old centroid
                    cent[c] = members.mean(axis=0)
        codebooks.append([[float(x) for x in c] for c in cent])
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """``id_col, codes`` — per-subspace nearest-code ids as
    ``array<int>``.

    This is the one place in the PQ family where built-in expressions
    genuinely lose: the expression form needs m×k higher-order
    ``aggregate`` lambdas per row (interpreted, no codegen — measured
    ~3.6 ms/vector at m=16,k=16), while the Arrow-batched pandas UDF
    computes all subspace distances as one ``(batch, k, sub)`` numpy
    broadcast per subspace (~micro-seconds/vector).  Ties break to the
    LOWEST code id (numpy argmin takes the first minimum), matching the
    (d², code) struct-sort tie-break of the expression form.  The
    codebook rides into the executors as a closure constant — M×K×(D/M)
    floats, kilobytes."""
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        x = np.asarray(vecs.tolist(), dtype=np.float64)
        out = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            p = x[:, j * sub : (j + 1) * sub]
            d2 = ((p[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return df.select(
        F.col(id_col), encode(as_double(F.col(vec_col))).alias(code_col)
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Asymmetric-distance top-k: per query, per subspace, the distance
    from the query's sub-vector to every code centroid is precomputed
    into literal lookup tables; a corpus vector's approximate squared L2
    distance is the sum of its codes' table entries.  The query set is
    collected (bounded, same contract as ``cosine_topk``); the scan
    reads ONLY the code column.  Output: ``query_id, vec_id, adc_d2,
    rn`` ascending by distance with an id tie-break."""
    from pyspark.sql import Window as W

    m = len(codebooks)
    sub = len(codebooks[0][0])
    qrows = query.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_q")
    ).collect()
    if not qrows:
        raise ValueError("query set is empty")
    qtabs = []
    for r in qrows:
        qv = [float(x) for x in r["_q"]]
        tables = [
            [
                sum(
                    (qv[j * sub + t] - c[t]) * (qv[j * sub + t] - c[t])
                    for t in range(sub)
                )
                for c in book
            ]
            for j, book in enumerate(codebooks)
        ]
        qtabs.append((r["query_id"], tables))
    qdf = encoded.sparkSession.createDataFrame(
        qtabs, f"query_id {dict(query.dtypes)[id_col]}, _tables array<array<double>>"
    )
    score = F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.col("_tables"),
            lambda c, t: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        encoded.crossJoin(F.broadcast(qdf))
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, score.alias("adc_d2"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", id_col, F.round("adc_d2", 6).alias("adc_d2"), "rn")
    )


def pq_topk_rerank(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """PQ + refine (the production FAISS pattern): ADC over the codes
    column produces ``rerank`` candidates per query, the candidates —
    and ONLY the candidates — are joined back to the full-precision
    vectors for an exact L2 re-rank to top ``k``.  ADC's quantization
    error caps its exact-top-k recall on distance-concentrated corpora;
    as a candidate generator it is excellent, and the refine join
    touches ``Q*rerank`` rows, never the corpus.  Output: ``query_id,
    vec_id, d2, rn`` ascending exact distance."""
    from pyspark.sql import Window as W

    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    cands = pq_adc_topk(
        encoded, codebooks, query, k=rerank, id_col=id_col, code_col=code_col,
        vec_col=vec_col,
    ).select("query_id", id_col)
    qv = query.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_q")
    )
    full = vectors.select(F.col(id_col), as_double(F.col(vec_col)).alias("_v"))
    d2 = F.aggregate(
        F.zip_with(F.col("_v"), F.col("_q"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        cands.join(full, id_col)
        .join(F.broadcast(qv), "query_id")
        .select("query_id", id_col, d2.alias("d2"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("d2"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", id_col, F.round("d2", 6).alias("d2"), "rn")
    )
