"""McNemar's test for paired binary outcomes — the within-subject
complement to the stratified 2x2 family: CMH (q242) compares two
INDEPENDENT arms across strata; McNemar compares the SAME subjects
under two conditions (before/after a launch, control/variant exposure
of the same user), where the information lives entirely in the
DISCORDANT pairs (McNemar 1947).

With per-subject binaries (x1, x2):

    b = #{x1=1, x2=0}    c = #{x1=0, x2=1}
    chi2_cc = (|b - c| - 1)^2 / (b + c)     (continuity-corrected)

Concordant subjects cancel out of the null; the statistic is df=1
chi-square.  Every count is an exact integer from one keyed
aggregation; the single division happens once per group at the end.
The continuity correction clamps at zero (|b-c| <= 1 gives 0, not a
negative numerator); b + c = 0 yields NULL (no discordance, no test).

Scale shape: the input is one row per subject (the caller's per-user
collapse is the corpus-sized stage); this operator is one keyed
aggregation, map-side combinable, group cardinality caller-bounded.

Scope note: the reference app has no paired-test surface — this
completes the experiment family (chi-square q208, CMH q242, log-rank
q236) with the repeated-measures design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mcnemar_test(
    subjects: DataFrame,
    group_cols: list[str],
    x1: Column,
    x2: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*group_cols, n_subjects, n10, n01, chi2_cc`` — McNemar's
    continuity-corrected chi-square per group over one-row-per-subject
    input.  ``x1``/``x2`` are the paired binaries (1 = success, any
    other non-null value = failure); subjects where either is NULL are
    dropped (an unobserved condition has no pair).  ``n10`` counts
    (1, 0) subjects, ``n01`` counts (0, 1); ``chi2_cc`` is NULL when no
    subject is discordant."""
    hit = {"n_subjects", "n10", "n01", "chi2_cc"} & set(group_cols)
    if hit:
        raise ValueError(
            f"group_cols collide with output columns: {sorted(hit)}"
        )
    a = F.when(x1 == 1, 1).otherwise(0)
    b = F.when(x2 == 1, 1).otherwise(0)
    base = subjects.where(x1.isNotNull() & x2.isNotNull()).select(
        *group_cols, a.alias("_a"), b.alias("_b")
    )
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum(
            F.when((F.col("_a") == 1) & (F.col("_b") == 0), 1).otherwise(0)
        ).alias("n10"),
        F.sum(
            F.when((F.col("_a") == 0) & (F.col("_b") == 1), 1).otherwise(0)
        ).alias("n01"),
    )
    # |b - c| stays in BIGINT (counts are non-negative, the difference
    # of two counts each < 2**63 cannot leave the range); the squared
    # numerator rides double — it is a test STATISTIC, one value per
    # group, already past every exact-count comparison
    diff = F.abs(F.col("n10") - F.col("n01")).cast("double")
    disc = (F.col("n10") + F.col("n01")).cast("double")
    num = F.greatest(diff - F.lit(1.0), F.lit(0.0))
    return agg.select(
        *group_cols,
        "n_subjects",
        "n10",
        "n01",
        F.when(disc > 0, F.round(num * num / disc, round_dp)).alias(
            "chi2_cc"
        ),
    )
