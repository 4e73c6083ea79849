"""Cochran–Mantel–Haenszel stratified 2x2 association test + the
Mantel–Haenszel pooled odds ratio — "is the treatment associated with
the outcome, CONTROLLING for the stratifier": the confounder-adjusted
complement to the marginal chi-square (operators/contingency.py q208),
which Simpson's paradox can flip when strata differ in mix.

Per stratum i, the 2x2 cell counts (a=A&1, b=A&0, c=B&1, d=B&0,
n = a+b+c+d):

    E_i = (a+b)(a+c) / n                        (expected a under H0)
    V_i = (a+b)(c+d)(a+c)(b+d) / (n^2 (n-1))    (hypergeometric var)
    CMH = (sum a_i - sum E_i)^2 / sum V_i
    OR_MH = sum(a_i d_i / n_i) / sum(b_i c_i / n_i)

Cell counts are exact BIGINTs from ONE keyed aggregation (map-side
combinable — the corpus is touched exactly once); E/V/OR are
deterministic double expressions over them, computed once per STRATUM
(never per row) in one fixed operand order on both engines, rounded at
the 6-dp grid (the logrank q236 precedent).  Strata with n < 2 or a
zero margin contribute V_i = 0 and are excluded from all sums (no
information under the hypergeometric null).

Scale shape: keyed count aggregation -> per-stratum arithmetic ->
one scalar merge.  Nothing grows with the corpus but the first
aggregation's key set.

Scope note: the reference app has no stratified-test surface — this
extends the experiment family beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cmh_test(
    df: DataFrame,
    strata_cols: list[str],
    group: Column,
    outcome: Column,
    group_a,
    group_b,
) -> DataFrame:
    """One row: ``n_strata, sum_a, expected_a, chi2, or_mh`` — the CMH
    statistic (uncorrected) and MH pooled odds ratio for binary
    ``outcome`` (1/else) between ``group == group_a`` and
    ``group == group_b`` rows, stratified by ``strata_cols``.  Rows in
    neither group are ignored; ``or_mh`` is NULL when every stratum has
    a zero b*c cross term (no discordant evidence)."""
    base = df.select(
        *strata_cols,
        F.when(group == group_a, 1)
        .when(group == group_b, 0)
        .alias("_ga"),
        F.when(outcome == 1, 1).otherwise(0).alias("_y"),
    ).where(F.col("_ga").isNotNull())
    cells = base.groupBy(*strata_cols).agg(
        F.sum(F.col("_ga") * F.col("_y")).alias("_a"),
        F.sum(F.col("_ga") * (1 - F.col("_y"))).alias("_b"),
        F.sum((1 - F.col("_ga")) * F.col("_y")).alias("_c"),
        F.sum((1 - F.col("_ga")) * (1 - F.col("_y"))).alias("_d"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("_a") + d("_b") + d("_c") + d("_d")
    informative = (
        (n > 1)
        & (F.col("_a") + F.col("_b") > 0)
        & (F.col("_c") + F.col("_d") > 0)
        & (F.col("_a") + F.col("_c") > 0)
        & (F.col("_b") + F.col("_d") > 0)
    )
    per = cells.where(informative).select(
        F.col("_a").alias("_oa"),
        ((d("_a") + d("_b")) * (d("_a") + d("_c")) / n).alias("_e"),
        (
            (d("_a") + d("_b"))
            * (d("_c") + d("_d"))
            * (d("_a") + d("_c"))
            * (d("_b") + d("_d"))
            / (n * n * (n - F.lit(1.0)))
        ).alias("_v"),
        (d("_a") * d("_d") / n).alias("_orn"),
        (d("_b") * d("_c") / n).alias("_ord"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("_oa").alias("sum_a"),
        F.round(F.sum("_e"), 6).alias("expected_a"),
        F.round(
            F.when(
                F.sum("_v") > 0,
                (F.sum("_oa").cast("double") - F.sum("_e"))
                * (F.sum("_oa").cast("double") - F.sum("_e"))
                / F.sum("_v"),
            ),
            6,
        ).alias("chi2"),
        F.round(
            F.when(F.sum("_ord") > 0, F.sum("_orn") / F.sum("_ord")), 6
        ).alias("or_mh"),
    )
