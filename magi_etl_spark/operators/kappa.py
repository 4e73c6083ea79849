"""Cohen's kappa inter-rater agreement — the chance-corrected
agreement rate between two categorical labelers (Cohen 1960): the
eval-family complement to ROC-AUC (q238 ranks a SCORER against truth;
kappa scores two LABELERS against each other), and the standard
readout when calibrating an LLM judge or a heuristic classifier
against a second annotator.

From the confusion counts n_kl (rater1 = k, rater2 = l), with
n = sum n_kl, agree = sum_k n_kk, and pe_num = sum_k row_k * col_k:

    po = agree / n        pe = pe_num / n^2
    kappa = (po - pe) / (1 - pe) = (n * agree - pe_num) / (n^2 - pe_num)

The right-hand form is a ratio of two exact integers, so the operator
computes both in decimal(38,0) (row_k * col_k passes 2**63 at corpus
scale — the q227 ssq lesson) and divides ONCE per group at the end; no
float ever touches a count.  kappa is NULL when pe = 1 (both raters
constant — chance agreement is total and correction is undefined).

Scale shape: one keyed aggregation to (group, label1, label2) cells
(map-side combinable, bounded by group x label-alphabet cardinality,
never corpus size), two marginal rollups of those cells, one keyed
join cells->marginals, one final group aggregation.

Scope note: the reference app has no inter-rater surface — this
extends the eval family (AUC q238, NDCG q243, recall evals q202/q204)
with the agreement statistic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def cohens_kappa(
    items: DataFrame,
    group_cols: list[str],
    rater1: Column,
    rater2: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*group_cols, n_items, n_agree, kappa`` — Cohen's kappa between
    two categorical label columns per group, over one-row-per-item
    input.  Items where either label is NULL are dropped (an unrated
    item has no agreement evidence).  ``kappa`` is NULL when expected
    chance agreement is 1 (both raters emit a single label)."""
    hit = {"n_items", "n_agree", "kappa"} & set(group_cols)
    if hit:
        raise ValueError(
            f"group_cols collide with output columns: {sorted(hit)}"
        )
    base = items.where(rater1.isNotNull() & rater2.isNotNull()).select(
        *group_cols, rater1.alias("_r1"), rater2.alias("_r2")
    )
    cells = base.groupBy(*group_cols, "_r1", "_r2").agg(
        F.count(F.lit(1)).alias("_c")
    )
    rows = cells.groupBy(*group_cols, "_r1").agg(
        F.sum("_c").alias("_rowc")
    )
    colsm = cells.groupBy(*group_cols, "_r2").agg(
        F.sum("_c").alias("_colc")
    )
    # pe_num = sum over labels k of row_k * col_k: join the two marginal
    # frames on (group, label) — a label missing from one rater's output
    # contributes 0, which the inner join encodes by dropping it
    pe = (
        rows.join(
            colsm.withColumnRenamed("_r2", "_r1"), [*group_cols, "_r1"]
        )
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.col("_rowc").cast(_DEC) * F.col("_colc").cast(_DEC)
            ).alias("_pe_num")
        )
    )
    tot = cells.groupBy(*group_cols).agg(
        F.sum("_c").alias("n_items"),
        F.sum(F.when(F.col("_r1") == F.col("_r2"), F.col("_c"))).alias(
            "_agree"
        ),
    )
    n = F.col("n_items").cast(_DEC)
    # raters with fully DISJOINT label sets share no (group, label) row,
    # so the pe frame is empty for that group: left-join + coalesce keeps
    # the group with pe_num = 0 (chance agreement genuinely zero)
    penum = F.coalesce(F.col("_pe_num"), F.lit(0).cast(_DEC))
    num = n * F.coalesce(F.col("_agree"), F.lit(0)).cast(_DEC) - penum
    den = n * n - penum
    return (
        tot.join(pe, group_cols, "left")
        .select(
            *group_cols,
            "n_items",
            F.coalesce(F.col("_agree"), F.lit(0)).alias("n_agree"),
            F.when(
                den > 0,
                F.round(num.cast("double") / den.cast("double"), round_dp),
            ).alias("kappa"),
        )
    )
