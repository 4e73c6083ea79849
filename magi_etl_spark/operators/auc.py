"""Exact ROC-AUC / Mann-Whitney U per group — the rank-statistic every
score-quality readout needs: "does this score separate positives from
negatives", computed exactly from counts, never from a sampled curve.

AUC equals the Mann-Whitney U statistic normalized by the number of
(positive, negative) pairs, with ties counted half:

    2U = 2 * sum_v cp(v) * CN(<v)  +  sum_v cp(v) * cn(v)
    AUC = 2U / (2 * n_pos * n_neg)

where ``cp(v)/cn(v)`` are the positive/negative counts at distinct
score ``v`` and ``CN(<v)`` the negatives strictly below it.  Every term
is an exact integer — the cross-products run in decimal(38,0) (at
corpus scale ``cp * CN`` passes 2**63; the q227/q235 ssq lesson) so no
float can reorder anything; the one division happens once, at the end.

Scale shape: one (group, score) count aggregation collapses the corpus
(map-side combinable), the cumulative window runs over DISTINCT scores
per group (bounded by score cardinality, not row count) and is
partitioned by group — never a global funnel — and one final group
aggregation sums the pair terms.

Scope note: the reference app has no ranking-statistics surface — this
extends the experiment/eval family (CUPED q232, delta-method q237,
KS q235) with the exact rank-based separability metric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def group_auc(
    df: DataFrame,
    group_cols: list[str],
    score: Column,
    label: Column,
) -> DataFrame:
    """``*group_cols, n_pos, n_neg, u2, auc`` — the exact ROC-AUC of
    ``score`` (integer-comparable; cast to BIGINT) against binary
    ``label`` (1 = positive, else negative) per group.  ``u2`` is the
    exact integer ``2U`` numerator (ties counted once, i.e. half of 2U
    each); ``auc = u2 / (2 * n_pos * n_neg)`` rounded to 6 dp.  Groups
    missing either class drop out (AUC undefined); null scores are
    dropped (same rationale as ``kstest.ks_two_sample``: a null has no
    rank, and engines order nulls differently)."""
    base = df.select(
        *group_cols,
        score.cast("long").alias("_v"),
        F.when(label == 1, 1).otherwise(0).alias("_p"),
    ).where(F.col("_v").isNotNull())
    pv = base.groupBy(*group_cols, "_v").agg(
        F.sum("_p").alias("_cp"),
        F.sum(1 - F.col("_p")).alias("_cn"),
    )
    w = (
        W.partitionBy(*group_cols)
        .orderBy(F.asc("_v"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wt = W.partitionBy(*group_cols)
    cum = pv.select(
        *group_cols,
        "_cp",
        "_cn",
        F.coalesce(F.sum("_cn").over(w), F.lit(0)).alias("_cn_below"),
        F.sum("_cp").over(wt).alias("n_pos"),
        F.sum("_cn").over(wt).alias("n_neg"),
    )
    dec = "decimal(38,0)"
    return (
        cum.where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .groupBy(*group_cols, "n_pos", "n_neg")
        .agg(
            F.sum(
                F.lit(2).cast(dec)
                * F.col("_cp").cast(dec)
                * F.col("_cn_below").cast(dec)
                + F.col("_cp").cast(dec) * F.col("_cn").cast(dec)
            ).alias("_u2")
        )
        .select(
            *group_cols,
            "n_pos",
            "n_neg",
            # accumulation is decimal (exact); the emitted evidence column
            # is BIGINT for engine-parity of the typed frame (the q89
            # HUGEINT lesson) — 2U fits until n_pos*n_neg passes 2**62
            F.col("_u2").cast("long").alias("u2"),
            F.round(
                F.col("_u2").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_pos").cast("double")
                    * F.col("n_neg").cast("double")
                ),
                6,
            ).alias("auc"),
        )
    )
