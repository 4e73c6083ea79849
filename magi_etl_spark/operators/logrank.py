"""Stratified log-rank test: are two groups' survival curves the same?
``operators/survival.py`` ESTIMATES a Kaplan–Meier curve; the log-rank
statistic TESTS the difference between two of them — the standard
churn / time-to-event comparison (Mantel 1966; stratified form sums the
per-stratum moments, the Cochran–Mantel–Haenszel construction).

At each distinct event time t within a stratum, with ``d`` total events
(``da`` in group A), ``na``/``nb`` at risk and ``n = na + nb``:

    O - E  contribution:  da - d * na / n
    variance contribution: d * na * nb * (n - d) / (n^2 * (n - 1))

``chi2 = (Σ(O - E))² / ΣV`` over all strata and event times.

Construction is aggregation-only: per-(stratum, time, group) event and
censor counts, a time-DESCENDING cumulative window per stratum (the
at-risk count is "subjects with duration ≥ t", so the reversed cumsum
computes it without a self-join), the per-time moments in double
arithmetic over exact integers, and one global scalar merge (the
exempted partial/merge-aggregate funnel).  The window input is one row
per (stratum, distinct time) — bounded by the observation window, not
the subject count.

Scope note: the reference app has no survival surface — this extends
the q209 Kaplan–Meier family with the hypothesis test run alongside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def logrank_test(
    df: DataFrame,
    strata_cols: list[str],
    group_col: str,
    time_col: str,
    event_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One-row ``n_a, n_b, observed_a, expected_a, chi2`` — the
    stratified log-rank test of group A vs group B (rows in neither
    group are ignored; ``event_col`` is 1 for an observed event, 0 for
    censored).  Null durations are dropped — a subject with no duration
    has no place on the time axis, and a null would otherwise enter the
    time-ordered window where Spark and other engines disagree on null
    placement (the ``ks_two_sample`` null rationale).  ``expected_a``/
    ``chi2`` are 6-dp doubles; the moment sums they derive from are
    exact integers up to the final double expression, which both
    engines evaluate in the identical operand order."""
    base = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .select(
            *strata_cols,
            F.col(time_col).cast("long").alias("_t"),
            F.col(event_col).cast("int").alias("_e"),
            F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("_ga"),
        )
        .where(F.col("_t").isNotNull())
    )
    # per (stratum, time): subjects entering the risk set at t, events at t
    pt = base.groupBy(*strata_cols, "_t").agg(
        F.count(F.lit(1)).alias("_subj"),
        F.sum("_ga").alias("_subj_a"),
        F.sum(F.col("_e") * F.col("_ga")).alias("_da"),
        F.sum(F.col("_e") * (1 - F.col("_ga"))).alias("_db"),
    )
    # at-risk at t = subjects with duration >= t: reversed cumulative sum
    w = W.partitionBy(*strata_cols).orderBy(F.desc("_t")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = pt.select(
        *strata_cols,
        "_t",
        "_da",
        "_db",
        F.sum("_subj_a").over(w).alias("_na"),
        (F.sum("_subj").over(w) - F.sum("_subj_a").over(w)).alias("_nb"),
    )
    d = (F.col("_da") + F.col("_db")).cast("double")
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    n = na + nb
    contrib = risk.where(
        (F.col("_da") + F.col("_db") > 0) & (F.col("_na") + F.col("_nb") > 1)
    ).select(
        F.col("_da").cast("long").alias("_oa"),
        (d * na / n).alias("_ea"),
        (d * na * nb * (n - d) / (n * n * (n - 1.0))).alias("_v"),
    )
    totals = base.groupBy().agg(
        F.sum("_ga").alias("n_a"),
        F.sum(1 - F.col("_ga")).alias("n_b"),
    )
    agg = contrib.groupBy().agg(
        F.sum("_oa").alias("observed_a"),
        F.sum("_ea").alias("_sea"),
        F.sum("_v").alias("_sv"),
    )
    return (
        totals.join(F.broadcast(agg))
        .select(
            "n_a",
            "n_b",
            "observed_a",
            F.round(F.col("_sea"), 6).alias("expected_a"),
            F.round(
                F.when(
                    F.col("_sv") > 0.0,
                    (F.col("observed_a").cast("double") - F.col("_sea"))
                    * (F.col("observed_a").cast("double") - F.col("_sea"))
                    / F.col("_sv"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("chi2"),
        )
    )
