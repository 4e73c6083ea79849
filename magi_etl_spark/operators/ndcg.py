"""NDCG@k — normalized discounted cumulative gain, the graded
ranking-quality metric that completes the retrieval-evaluation family
(top-k recall and candidate precision/recall in
operators/retrieval_eval.py are BINARY; NDCG credits putting the MOST
relevant results highest, with a log-position discount):

    DCG@k  = sum_{i<=k} (2^rel_i - 1) / log2(i + 1)
    NDCG@k = DCG@k / IDCG@k      (IDCG = DCG of the ideal ordering)

Determinism: gains ``2^rel - 1`` are exact doubles for integer grades
(power-of-two), position discounts are ``log2`` of small integers
(libm log rounded at the 6-dp grid — the hill/PSI precedent), and the
ideal ordering needs NO tie-break: IDCG depends only on the sorted
multiset of grades.  The CALLER's ranking order must be deterministic
(include a unique tie-break column) — rank ties would otherwise make
DCG ordering-dependent.

Scale shape: two windows per query group (rank and ideal rank), both
partitioned by the query columns — bounded by each query's candidate
count, never a global funnel — then one keyed aggregation.

Scope note: the reference app has no ranking-evaluation surface — this
extends the retrieval-eval family beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def ndcg_at_k(
    df: DataFrame,
    query_cols: list[str],
    order: list[Column],
    rel: Column,
    k: int,
) -> DataFrame:
    """``*query_cols, n_cands, dcg, idcg, ndcg`` per query group:
    NDCG@``k`` of the ranking induced by ``order`` (best first; must be
    deterministic — include a tie-break) against integer relevance
    grades ``rel`` (>= 0; null grades count as 0).  Queries whose TOP-k
    ideal gain is zero (no relevant candidate anywhere) emit NULL
    ndcg."""
    wq = W.partitionBy(*query_cols)
    graded = F.coalesce(rel, F.lit(0)).cast("int")
    # sort EXPRESSIONS (F.desc(...) etc.) go straight into the windows —
    # they reference df's own columns, so no pre-projection is needed
    ranked = df.select(
        *query_cols,
        graded.alias("_rel"),
        F.row_number().over(wq.orderBy(*order)).alias("_pos"),
        F.row_number().over(wq.orderBy(F.desc(graded))).alias("_ipos"),
    )
    gain = F.pow(F.lit(2.0), F.col("_rel").cast("double")) - F.lit(1.0)
    disc = lambda pos: F.log2(F.col(pos).cast("double") + F.lit(1.0))  # noqa: E731
    return (
        ranked.groupBy(*query_cols)
        .agg(
            F.count(F.lit(1)).alias("n_cands"),
            F.sum(
                F.when(F.col("_pos") <= k, gain / disc("_pos")).otherwise(
                    F.lit(0.0)
                )
            ).alias("_dcg"),
            F.sum(
                F.when(F.col("_ipos") <= k, gain / disc("_ipos")).otherwise(
                    F.lit(0.0)
                )
            ).alias("_idcg"),
        )
        .select(
            *query_cols,
            "n_cands",
            F.round("_dcg", 6).alias("dcg"),
            F.round("_idcg", 6).alias("idcg"),
            F.when(
                F.col("_idcg") > 0, F.round(F.col("_dcg") / F.col("_idcg"), 6)
            ).alias("ndcg"),
        )
    )
