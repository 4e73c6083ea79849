"""Cucconi test (Cucconi 1968; Marozzi 2009) — the two-sample
LOCATION-SCALE test: "does this sample differ in center OR spread?",
in one statistic.  A pure rank-sum test (Mann–Whitney / q238) is blind
to variance changes and a pure scale test is blind to shifts; the
Cucconi statistic combines squared ranks and squared CONTRA-ranks and
catches both — the right drift alarm for metric distributions that
widen without moving.

For the sample-1 observations' pooled ranks R_i (n1 of them, pooled
size N = n1 + n2):

    U = (6 sum R_i^2 - n1(N+1)(2N+1)) / sqrt(n1 n2 (N+1)(2N+1)(8N+11)/5)
    V =  the same with contra-ranks  S_i = N + 1 - R_i
    rho = 2(N^2-4) / ((2N+1)(8N+11)) - 1
    C = (U^2 + V^2 - 2 rho U V) / (2 (1 - rho^2))

C ~ exp(-c) tail under the null; large C rejects.  Ties ride average
ranks (the standard practical choice; the null moments are the
continuous-case closed forms).

Engine parity: everything up to U and V is EXACT — the doubled rank
``a = 2*avgrank`` (rankcorr's ``_rank2`` machinery) makes sum R^2 =
sum a^2 / 4 an exact decimal, and the contra sum needs no second rank
pass: sum (2(N+1) - a)^2 = 4(N+1)^2 n1 - 4(N+1) sum a + sum a^2.  The
numerators are scaled by 2 (nu2 = 3 sum a^2 - 2 n1(N+1)(2N+1)) against
the doubled denominator sqrt(4K/5), K = n1 n2 (N+1)(2N+1)(8N+11) exact
decimal — so U and V are each ONE double division of an exact integer
by one sqrt of an exact-integer-over-5 ratio, combined in a fixed
operand order identical to the oracle's; the output rounds at the
6-dp grid.

Scale shape: one (key, sample, value) cell aggregation collapses the
corpus, the rank window rides DISTINCT values per key (never a
single-partition window), one keyed aggregation finishes.  Keys
missing either sample, or with pooled N < 3 (rho = -1 at N = 2, the
statistic is undefined), emit NULL (the mannkendall posture).

Scope note: the reference app has no two-sample scale surface — this
completes the drift family (PSI q143, KS q235, Mann–Whitney q238)
with its joint location-scale alarm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def cucconi_test(
    df: DataFrame,
    key_cols: list[str],
    in_first: Column,
    value: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*key_cols, n1, n2, u, v, c`` — the Cucconi location-scale
    statistic per key of integer ``value``, comparing the sample where
    ``in_first`` is true (sample 1, the one whose ranks are summed)
    against the rest.  Rows with a null value or null indicator are
    dropped (a null has no rank; engines order nulls differently — the
    kstest lesson)."""
    from magi_etl_spark.operators.rankcorr import _rank2

    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (the rank frame joins on them); "
            "for a global test, add a constant key column upstream"
        )
    reserved = {
        "n1", "n2", "u", "v", "c",
        "_s", "_x", "_a", "_c", "_cnt", "_s1", "_s2",
    } & set(key_cols)
    if reserved:
        raise ValueError(
            f"key_cols collide with working columns: {sorted(reserved)}"
        )
    base = df.select(
        *key_cols,
        # .when/.when with no otherwise: a NULL indicator stays NULL so
        # the isNotNull filter below genuinely drops the row (an
        # .otherwise(0) would silently assign null-indicator rows to
        # sample 2, contradicting the drop contract above — r14 ADVICE)
        F.when(in_first, 1).when(~in_first, 0).alias("_s"),
        value.cast("long").alias("_x"),
    ).where(F.col("_x").isNotNull() & F.col("_s").isNotNull())
    cells = base.groupBy(*key_cols, "_s", "_x").agg(
        F.count(F.lit(1)).alias("_c")
    )
    ranked = cells.join(_rank2(base, list(key_cols), "_x", "_a"), [*key_cols, "_x"])
    c_dec = F.col("_c").cast(_DEC)
    a_dec = F.col("_a").cast(_DEC)
    s = F.col("_s").cast(_DEC)
    stats = ranked.groupBy(*key_cols).agg(
        F.sum(s * c_dec).cast("long").alias("n1"),
        F.sum((1 - s) * c_dec).cast("long").alias("n2"),
        F.sum(s * c_dec * a_dec).alias("_s1"),
        F.sum(s * c_dec * a_dec * a_dec).alias("_s2"),
    )
    n1 = F.col("n1").cast(_DEC)
    n2 = F.col("n2").cast(_DEC)
    nn = n1 + n2  # pooled N, decimal
    # contra doubled-rank square sum: 4(N+1)^2 n1 - 4(N+1) s1 + s2
    s2c = (
        F.lit(4).cast(_DEC) * (nn + 1) * (nn + 1) * n1
        - F.lit(4).cast(_DEC) * (nn + 1) * F.col("_s1")
        + F.col("_s2")
    )
    e2 = F.lit(2).cast(_DEC) * n1 * (nn + 1) * (2 * nn + 1)
    nu2 = F.lit(3).cast(_DEC) * F.col("_s2") - e2
    nv2 = F.lit(3).cast(_DEC) * s2c - e2
    # the sqrt radicand n1*n2*(N+1)(2N+1)(8N+11) passes decimal(38,0)
    # once keys hold ~1e9 rows — it only ever feeds the sqrt, so it is
    # folded as a FIXED-ORDER double product (each factor is an exact
    # long-ranged integer; IEEE left-to-right association is identical
    # on both engines, mirrored verbatim in the oracle)
    den = F.sqrt(
        F.lit(4.0)
        * n1.cast("double")
        * n2.cast("double")
        * (nn + 1).cast("double")
        * (2 * nn + 1).cast("double")
        * (8 * nn + 11).cast("double")
        / F.lit(5.0)
    )
    u = nu2.cast("double") / den
    v = nv2.cast("double") / den
    rho = (
        F.lit(2.0)
        * (nn * nn - 4).cast("double")
        / ((2 * nn + 1) * (8 * nn + 11)).cast("double")
        - F.lit(1.0)
    )
    c_stat = (u * u + v * v - F.lit(2.0) * rho * u * v) / (
        F.lit(2.0) * (F.lit(1.0) - rho * rho)
    )
    defined = (F.col("n1") >= 1) & (F.col("n2") >= 1) & (
        F.col("n1") + F.col("n2") >= 3
    )
    return stats.select(
        *key_cols,
        "n1",
        "n2",
        F.when(defined, F.round(u, round_dp)).alias("u"),
        F.when(defined, F.round(v, round_dp)).alias("v"),
        F.when(defined, F.round(c_stat, round_dp)).alias("c"),
    )
