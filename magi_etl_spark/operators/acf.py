"""Sample autocorrelation function (ACF) at lags 1..K per series — the
standard time-series memory diagnostic next to the trend/seasonality
family (Holt q191, day-of-week seasonal index, CUSUM changepoints): a
significant r_k says the series still carries structure a forecast or
anomaly monitor should model.

Convention: the ACF over the ORDERED observation sequence (row lags,
not calendar lags — the caller gap-fills first if calendar spacing
matters), with the full-series mean and variance in the denominator
(the standard biased estimator):

    r_k = sum_{t<=n-k} (x_t - m)(x_{t+k} - m)  /  sum_t (x_t - m)^2

Exactness: with integer x, every sufficient statistic is an exact
integer — S = sum x, SS = sum x^2 and the lagged cross-products
C_k = sum x_t * x_{t+k} accumulate in decimal(38,0) (a BIGINT sum of
squares wraps silently at corpus scale; the q227 ssq lesson) along with
the overlap sums H_k = sum_{t<=n-k} x_t and T_k = sum_{t>k} x_t.  The
numerator expands to ``C_k - m*(H_k + T_k) + (n-k)*m^2`` — assembled in
ONE fixed double operand order on both engines, rounded at the 6-dp
grid.

Scale shape: one ordered window per series computes all K lead columns
in a single sort (bounded by the series length — daily/hourly series,
not the raw corpus), one unpivot, one keyed aggregation.  The raw
corpus is collapsed to the per-series sequence BEFORE any window.

Scope note: the reference app computes no autocorrelations — this
extends the time-series family beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def autocorrelation(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value: Column,
    max_lag: int,
) -> DataFrame:
    """``*series_cols, k, n, r_k`` for k = 1..``max_lag``: the exact-
    sufficient-statistic sample ACF of integer ``value`` ordered by
    ``order_col`` (must be unique per series) within each series.
    Rows with a null value OR a null order are dropped: a null-ordered
    row sorts NULLS FIRST in Spark's window but NULLS LAST in other
    engines, silently shifting every lead pairing (the kstest /
    mannkendall null-placement class) — and an unordered observation
    has no position in the series anyway.  Constant series emit NULL
    ``r_k`` (zero variance); lags with no overlapping pairs (k >= n)
    are OMITTED from the output — no pair, no row (the q240 oracle
    encodes the same omission; stated explicitly after the r12
    mannkendall docstring/behavior-drift lesson)."""
    base = df.select(
        *series_cols,
        F.col(order_col).alias("_t"),
        value.cast("long").alias("_x"),
    ).where(F.col("_x").isNotNull() & F.col("_t").isNotNull())
    w = W.partitionBy(*series_cols).orderBy(F.asc("_t"))
    leads = base.select(
        *series_cols,
        "_x",
        *[F.lead("_x", k).over(w).alias(f"_x{k}") for k in range(1, max_lag + 1)],
    )
    stacked = leads.select(
        *series_cols,
        "_x",
        F.expr(
            "stack("
            + str(max_lag)
            + ", "
            + ", ".join(f"{k}, _x{k}" for k in range(1, max_lag + 1))
            + ") AS (_k, _xl)"
        ),
    )
    per_k = stacked.groupBy(*series_cols, "_k").agg(
        F.sum(
            F.when(
                F.col("_xl").isNotNull(),
                F.col("_x").cast(_DEC) * F.col("_xl").cast(_DEC),
            )
        ).alias("_c"),
        # the linear sums ride decimal too: a BIGINT sum of near-2**62
        # values raises under ANSI Spark (wraps otherwise) after two rows
        F.sum(
            F.when(F.col("_xl").isNotNull(), F.col("_x").cast(_DEC))
        ).alias("_h"),
        F.sum(F.col("_xl").cast(_DEC)).alias("_tl"),
        F.count(F.col("_xl")).alias("_pairs"),
    )
    totals = base.groupBy(*series_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x").cast(_DEC)).alias("_s"),
        F.sum(F.col("_x").cast(_DEC) * F.col("_x").cast(_DEC)).alias("_ss"),
    )
    m = F.col("_s").cast("double") / F.col("n").cast("double")
    num = (
        F.col("_c").cast("double")
        - m * (F.col("_h").cast("double") + F.col("_tl").cast("double"))
        + F.col("_pairs").cast("double") * m * m
    )
    den = F.col("_ss").cast("double") - F.col("n").cast("double") * m * m
    return (
        # one row per series, but series cardinality is CALLER-controlled
        # (per-user series at corpus scale = hundreds of millions of
        # rows) — no forced broadcast hint; AQE picks broadcast when the
        # totals side is genuinely small and a shuffle join when not
        per_k.join(totals, series_cols)
        .where(F.col("_pairs") > 0)
        .select(
            *series_cols,
            F.col("_k").alias("k"),
            "n",
            F.when(den > 0, F.round(num / den, 6)).alias("r_k"),
        )
    )
