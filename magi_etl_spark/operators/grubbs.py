"""Grubbs' outlier test (Grubbs 1950) — the max-studentized-residual
test: per key, is the single most extreme observation an outlier
relative to a roughly normal bulk?

    G = max_i |x_i - xbar| / s

The keyed single-outlier alarm that complements the robust families
already in the tree: MAD outliers (q144) flag EVERY point past a
robust fence, winsorize (q103) clips them, Grubbs SCORES the one most
extreme point against the classical normal-theory null — the metric
an anomaly review queue sorts by.

Engine parity: EXACT through the last division — with integer x and
the sufficient statistics n, S = sum x, Q = sum x^2, the scaled
deviation |n*x_i - S| is an exact decimal per row, its per-key max M
an exact decimal, and

    G = M * sqrt(n - 1) / sqrt(n * (n Q - S^2))

(from G = (M/n) / s, s^2 = (n Q - S^2) / (n (n-1))) is two sqrts of
exact decimals and one division in a fixed operand order the oracle
mirrors; output rounds at the 6-dp grid.  The extreme VALUE itself is
reported exactly (``x_out``) with a deterministic tie-break (largest
x among equal deviations — max_by on the (deviation, x) struct, the
same struct-ordering idiom both engines share via a join-back +
max in the oracle).

Scale shape: ONE keyed aggregation over the corpus for the sufficient
statistics, one broadcast join-back to score deviations, one keyed
max readout — no windows, no sorts, no cells^2 terms; the heaviest
key costs two shuffled aggregations of its own rows.  Keys with
n < 3 or zero variance emit NULL g (the mannkendall posture; Grubbs
is undefined below 3 points).

Scope note: the reference app's anomaly surface is the daily
z-score monitor (q74); Grubbs is its exact-arithmetic, keyed,
single-point counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.chkpt import materialize

_DEC = "decimal(38,0)"


def grubbs_test(
    df: DataFrame,
    key_cols: list[str],
    value: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*key_cols, n, x_out, g`` — Grubbs' statistic per key of
    integer ``value``: the count, the most extreme observation
    (largest |deviation|, ties broken toward the larger x), and
    G = max|x - xbar| / s.  Rows with a null value are dropped (a
    null has no deviation)."""
    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (the deviation join-back keys "
            "on them); for a global test, add a constant key column "
            "upstream"
        )
    reserved = {
        "n", "x_out", "g",
        "_x", "_c", "_s", "_q", "_nd", "_m",
    } & set(key_cols)
    if reserved:
        raise ValueError(
            f"key_cols collide with working columns: {sorted(reserved)}"
        )
    # distinct-value cells: the deviation is a function of x alone, so
    # the join-back rides cells, not raw rows (materialized ONCE — the
    # frame feeds the stats aggregate AND the scoring join)
    cells = materialize(
        df.select(*key_cols, value.cast("long").alias("_x"))
        .where(F.col("_x").isNotNull())
        .groupBy(*key_cols, "_x")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    c = F.col("_c").cast(_DEC)
    x = F.col("_x").cast(_DEC)
    stats = cells.groupBy(*key_cols).agg(
        F.sum(c).cast("long").alias("n"),
        F.sum(c * x).alias("_s"),
        F.sum(c * x * x).alias("_q"),
    )
    n = F.col("n").cast(_DEC)
    scored = cells.join(F.broadcast(stats), key_cols).select(
        *key_cols,
        "_x",
        "n",
        "_s",
        "_q",
        F.abs(n * x - F.col("_s")).alias("_nd"),
    )
    top = scored.groupBy(*key_cols).agg(
        F.max("_nd").alias("_m"),
        F.max_by("_x", F.struct(F.col("_nd"), F.col("_x"))).alias("x_out"),
    )
    rad = n * (n * F.col("_q") - F.col("_s") * F.col("_s"))
    return stats.join(top, key_cols).select(
        *key_cols,
        "n",
        "x_out",
        F.when(
            (F.col("n") >= 3)
            & (n * F.col("_q") - F.col("_s") * F.col("_s") > 0),
            F.round(
                F.col("_m").cast("double")
                * F.sqrt((n - 1).cast("double"))
                / F.sqrt(rad.cast("double")),
                round_dp,
            ),
        ).alias("g"),
    )
