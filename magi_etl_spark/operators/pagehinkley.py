"""Change-point LOCALIZATION by the CUSUM argmax (Page 1954, Hinkley
1971) — the "WHERE did the level shift" readout beside q191's
``changepoint.cusum_profile`` alarm stream ("DID it shift"): the
maximum-likelihood single change point of a mean-shift model is the
argmax over t of the centered cumulative sum |C_t - t * mean|.

Exact arithmetic (no float CUSUM): with per-series totals N = count
and S = sum, the centered statistic scaled by N is

    D_t = N * C_t - t * S        (an exact integer)

and argmax_t |D_t| over t in 1..N-1 is located by an exact
decimal(38,0) comparison with an earliest-t tie-break — floats appear
only in the reported deviation ``dmax = |D_t*| / N`` (one double
division, rounded).  A constant series has every D_t = 0 and reports
no change point (cp NULL, dmax 0); series with n < 2 emit the row
with both NULL (the mannkendall posture).

Scale shape: one ordered window per series computes C_t and the row
index (partitioned by the series keys — calendar-bounded series, the
acf.py contract, never a single-partition window); totals are one
keyed aggregation joined back (AQE picks broadcast when the series
key space is small); the argmax is a keyed max_by.  Nothing is
quadratic and nothing funnels through the driver.

Scope note: the reference app has no change-point surface — this
completes the q191 CUSUM family with the localization readout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def cusum_change_point(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*series_cols, n, cp, dmax`` — the change-point location (the
    ``order_col`` value at the CUSUM argmax, earliest on exact ties)
    and the maximum centered-cusum deviation per series.  ``order_col``
    must be unique per series; rows with a null value or null order
    are dropped (no observation, no cumulative position — and engines
    order nulls differently, the kstest lesson)."""
    if not series_cols:
        raise ValueError("series_cols must be non-empty (one row per series)")
    reserved = {
        "n", "cp", "dmax",
        "_t", "_x", "_c", "_i", "_s", "_ni", "_ad", "_admax", "_cpt",
    } & set(series_cols)
    if reserved:
        raise ValueError(
            f"series_cols collide with working columns: {sorted(reserved)}"
        )
    base = df.select(
        *series_cols,
        F.col(order_col).alias("_t"),
        value.cast("long").alias("_x"),
    ).where(F.col("_x").isNotNull() & F.col("_t").isNotNull())
    w = (
        W.partitionBy(*series_cols)
        .orderBy(F.asc("_t"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ordered = base.select(
        *series_cols,
        "_t",
        F.sum(F.col("_x").cast(_DEC)).over(w).alias("_c"),
        F.row_number()
        .over(W.partitionBy(*series_cols).orderBy(F.asc("_t")))
        .alias("_i"),
    )
    totals = base.groupBy(*series_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x").cast(_DEC)).alias("_s"),
    )
    cand = (
        ordered.join(totals, series_cols)
        .where(F.col("_i") < F.col("n"))
        .select(
            *series_cols,
            "_t",
            "_i",
            F.abs(
                F.col("n").cast(_DEC) * F.col("_c")
                - F.col("_i").cast(_DEC) * F.col("_s")
            ).alias("_ad"),
        )
    )
    best = cand.groupBy(*series_cols).agg(
        F.max("_ad").alias("_admax"),
        # exact decimal ordering, earliest index on ties
        F.max_by(
            F.col("_t"), F.struct(F.col("_ad"), (-F.col("_i")).alias("_ni"))
        ).alias("_cpt"),
    )
    return totals.join(best, series_cols, "left").select(
        *series_cols,
        "n",
        F.when(F.col("_admax") > 0, F.col("_cpt")).alias("cp"),
        F.when(
            F.col("n") >= 2,
            F.round(
                F.col("_admax").cast("double") / F.col("n").cast("double"),
                round_dp,
            ),
        ).alias("dmax"),
    )
