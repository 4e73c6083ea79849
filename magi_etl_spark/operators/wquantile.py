"""Weighted quantiles per group: the smallest value whose cumulative
weight reaches ``q`` of the group's total weight — the
volume-weighted median/percentile every pricing, latency-SLO, and
token-budget report actually wants (an unweighted median of order
prices answers a different question than the median DOLLAR's price).

Exact semantics (type-7-free, mass-based): for quantile q in (0, 1],

    wq(q) = min { v : cumw(v) >= q * W }

where ``cumw(v)`` is the total weight of rows with value <= v and W is
the group's total weight.  Equal values are COLLAPSED before the
cumulative sum (one row per distinct value with its summed weight), so
the running sum never depends on intra-value row order — the result is
deterministic without any tie-break key, and the per-group window runs
over distinct values, not raw rows.

Scale shape: one (group, value) aggregation, one window partitioned BY
GROUP (never a global sort), a broadcast of the requested quantile
list, and a final min-aggregate.  Weights stay BIGINT; the threshold
compare multiplies cumw by the quantile's exact rational (num/den
integers: ``cumw * den >= num * W``) so no floating-point boundary can
flip a row in or out.

Scope note: the reference app has no weighted-quantile surface — this
operator belongs to the analytics extension family the engine adds
beyond reference parity (Spark's own ``percentile`` /
``approx_percentile`` are unweighted).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def weighted_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    quantiles: list[float],
) -> DataFrame:
    """``*group_cols, q, wq`` — for each group and each requested
    quantile, the smallest value whose cumulative weight reaches
    ``q * total_weight``.  ``q`` is emitted as the caller's double;
    the threshold compare itself is exact integer arithmetic (each q
    is converted to an exact num/den pair) in decimal(38,0) — at corpus
    scale ``cum_weight * den`` passes 2**63, where a BIGINT product
    raises under ANSI Spark or wraps without it (the q227 ssq class).
    Null values are dropped: a quantile is undefined at a null point,
    and a null CDF row would sort NULLS FIRST on Spark but NULLS LAST
    on the DuckDB oracle, shifting every cumulative weight (the kstest
    null-ordering class)."""
    per_val = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.sum(weight_col).cast("long").alias("_w"))
    )
    # the cumulative and total weights accumulate in decimal(38,0) —
    # the per-value BIGINT weights are fine, but their running SUM is
    # what passes 2**63 first (the oracle's SUM(BIGINT) is HUGEINT
    # natively, so it never wraps either)
    w = W.partitionBy(*group_cols).orderBy(value_col)
    wdec = F.col("_w").cast("decimal(38,0)")
    cum = per_val.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        F.sum(wdec).over(w).alias("_cumw"),
        F.sum(wdec).over(W.partitionBy(*group_cols)).alias("_tot"),
    )
    qs = df.sparkSession.createDataFrame(
        [
            (float(q), Fraction(q).limit_denominator(10**6).numerator,
             Fraction(q).limit_denominator(10**6).denominator)
            for q in quantiles
        ],
        "q double, _num long, _den long",
    )
    # (19,0) rational parts keep each product inside decimal(38,0) —
    # the kstest cross-product idiom
    dec = "decimal(19,0)"
    return (
        cum.join(F.broadcast(qs))
        .where(
            F.col("_cumw") * F.col("_den").cast(dec)
            >= F.col("_num").cast(dec) * F.col("_tot")
        )
        .groupBy(*group_cols, "q")
        .agg(F.min("_v").alias("wq"))
    )
