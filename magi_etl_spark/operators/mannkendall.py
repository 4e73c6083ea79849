"""Mann–Kendall trend test with tie-corrected variance (Mann 1945,
Kendall 1975) — the hypothesis test beside the Theil–Sen ESTIMATOR
(``robustfit.theil_sen_trend`` q205 answers "how steep is the trend";
Mann–Kendall answers "is there one at all"), distribution-free and
exact on integer series.

Over a time-ordered series x_1..x_n:

    S = sum_{i<j} sign(x_j - x_i)
    Var(S) * 18 = n(n-1)(2n+5) - sum_ties t(t-1)(2t+5)
    z = (S - 1) / sqrt(Var S)  if S > 0,  (S + 1)/sqrt  if S < 0,  0

S and 18*Var(S) are exact integers; the tie term sums over groups of
equal values (size t).  Signs come from COMPARISONS (never a
subtraction that could leave int64 — the selection.py span lesson) and
the cubic variance terms ride decimal(38,0).

Scale shape: the pairwise S uses a within-series self-join — work is
sum over series of len^2, the documented contract being
CALENDAR-BOUNDED series (daily/hourly aggregates per entity, exactly
``acf.autocorrelation``'s contract), partitioned by the series keys —
never a corpus-sized pair space.  The tie correction and n ride one
keyed aggregation each.

Emitted ``s`` and ``var_s18`` are BIGINT for engine-parity of the
typed frame (the q89 HUGEINT lesson); var_s18 ~ 2 n^3 stays exact
until n passes ~1.6M points per series, far beyond any calendar-
bounded series the contract admits (the internal arithmetic is
decimal and never wraps either way).

Scope note: the reference app has no trend-test surface — this
completes the robust-trend family the same way the log-rank test
completes the survival curves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def mann_kendall_trend(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*series_cols, n, s, var_s18, z`` — the Mann–Kendall S
    statistic, 18x its tie-corrected variance, and the
    continuity-corrected normal score per series.  ``order_col`` must
    be unique per series (it is the time axis); rows with a null value
    OR a null order are dropped (no observation, no pair — and a
    null-ordered row would otherwise count toward n and the tie terms
    while never joining any pair, making S inconsistent with its own
    n; engines also order nulls differently, the kstest lesson).
    Series with n < 2 or zero variance (all values tied) emit z NULL;
    an n = 1 series has no pair row, so the pair aggregate is
    LEFT-joined and its S coalesces to the empty-sum value 0 (the r12
    ADVICE fix — an inner join silently dropped such series while this
    docstring promised a z-NULL row)."""
    reserved = {"n", "s", "var_s18", "z"} & set(series_cols)
    if reserved:
        raise ValueError(
            f"series_cols collide with output columns: {sorted(reserved)}"
        )
    base = df.select(
        *series_cols,
        F.col(order_col).alias("_t"),
        value.cast("long").alias("_x"),
    ).where(F.col("_x").isNotNull() & F.col("_t").isNotNull())
    a = base.select(
        *series_cols, F.col("_t").alias("_ti"), F.col("_x").alias("_xi")
    )
    b = base.select(
        *series_cols, F.col("_t").alias("_tj"), F.col("_x").alias("_xj")
    )
    s = (
        a.join(b, series_cols)
        .where(F.col("_ti") < F.col("_tj"))
        .groupBy(*series_cols)
        .agg(
            F.sum(
                F.when(F.col("_xj") > F.col("_xi"), 1)
                .when(F.col("_xj") < F.col("_xi"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    ties = (
        base.groupBy(*series_cols, "_x")
        .agg(F.count(F.lit(1)).alias("_tc"))
        .groupBy(*series_cols)
        .agg(
            F.sum(F.col("_tc")).alias("n"),
            F.sum(
                F.col("_tc").cast(_DEC)
                * (F.col("_tc") - 1).cast(_DEC)
                * (F.lit(2) * F.col("_tc") + 5).cast(_DEC)
            ).alias("_tie18"),
        )
    )
    nn = F.col("n").cast(_DEC)
    var18 = nn * (nn - 1) * (F.lit(2).cast(_DEC) * nn + 5) - F.col("_tie18")
    var_d = F.col("var_s18").cast("double") / F.lit(18.0)
    z = (
        F.when(
            F.col("s") > 0,
            (F.col("s").cast("double") - F.lit(1.0)) / F.sqrt(var_d),
        )
        .when(
            F.col("s") < 0,
            (F.col("s").cast("double") + F.lit(1.0)) / F.sqrt(var_d),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        ties.join(s, series_cols, "left")
        .withColumn("s", F.coalesce(F.col("s"), F.lit(0)).cast("long"))
        .withColumn("var_s18", var18.cast("long"))
        .select(
            *series_cols,
            "n",
            "s",
            "var_s18",
            F.when(
                (F.col("n") >= 2) & (F.col("var_s18") > 0),
                F.round(z, round_dp),
            ).alias("z"),
        )
    )
