"""Kruskal–Wallis H (Kruskal & Wallis 1952) — the k-group rank test:
"do these k samples come from the same distribution?", the one-way
ANOVA of the rank world and the k-group generalization of the
Mann–Whitney pair test (``auc.py`` q238).  Distribution-free, robust
to monotone transforms and heavy tails — the right omnibus test for
skewed engagement metrics across >2 cohorts.

With pooled average ranks R_g summed per group:

    H = 12 / (N(N+1)) * sum_g R_g^2 / n_g  -  3(N+1)
    H_tie = H / (1 - sum_t (t^3 - t) / (N^3 - N))

Everything rides the DOUBLED rank ``2*avgrank`` (an exact integer —
rankcorr's machinery, imported here): R2_g = 2*R_g, so
sum R_g^2/n_g = sum R2_g^2 / (4 n_g) and the 12/4 collapses to 3.

Engine parity: the per-group term R2_g^2 / n_g is ONE double division
of exact integers, scaled to a fixed micro grid and rounded —
``t6_g = round((R2_g^2 / n_g) * 1e6)`` — so the cross-group sum is an
exact decimal both engines add identically (never an order-dependent
float sum; the quantization error is identical on both engines by
construction and is ~1e-7 of a rank unit, far inside the 6-dp output
grid).  The tie term sum_t t(t-1)(t+1) is exact decimal(38,0).

Scale shape: ranks ride DISTINCT values per key (one count agg + one
cumulative window partitioned by the key — never a single-partition
window), joined back by (key, value); the rest is two keyed
aggregations.  Groups-per-key and the key cardinality bound the final
stage, the corpus bounds only the first scan.

Scope note: the reference app has no k-group test surface — this
completes the rank family (Spearman/Kendall q245, Mann–Whitney q238)
with its omnibus test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def kruskal_wallis(
    df: DataFrame,
    key_cols: list[str],
    group_col: str,
    value: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*key_cols, k_groups, n, h`` — the tie-corrected Kruskal–Wallis
    H statistic per key, testing the integer ``value`` distribution
    across the ``group_col`` samples pooled within that key.  Rows
    with a null value or null group are dropped (a null has no rank;
    engines order nulls differently — the kstest lesson); keys with
    n < 2, fewer than 2 groups, or all values tied emit h NULL (the
    mannkendall posture: the row is present, the statistic is
    undefined)."""
    from magi_etl_spark.operators.rankcorr import _rank2

    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (terms/ties join on them); for a "
            "global test, add a constant key column upstream"
        )
    reserved = {
        "k_groups", "n", "h",
        "_g", "_x", "_a", "_ng", "_r2", "_t6", "_t", "_tie3",
    } & (set(key_cols) | {group_col})
    if reserved:
        raise ValueError(
            f"key/group columns collide with working columns: {sorted(reserved)}"
        )
    base = df.select(
        *key_cols,
        F.col(group_col).alias("_g"),
        value.cast("long").alias("_x"),
    ).where(F.col("_x").isNotNull() & F.col("_g").isNotNull())
    ranked = base.join(
        _rank2(base, list(key_cols), "_x", "_a"), [*key_cols, "_x"]
    )
    per_group = ranked.groupBy(*key_cols, "_g").agg(
        F.count(F.lit(1)).alias("_ng"),
        F.sum(F.col("_a").cast(_DEC)).alias("_r2"),
    )
    # fixed-order micro quantization: (R2^2 / n_g) as ONE double
    # division, then *1e6 and round — both engines produce the same
    # integer, so the cross-group sum below is exact decimal
    t6 = F.round(
        (F.col("_r2").cast("double") * F.col("_r2").cast("double"))
        / F.col("_ng").cast("double")
        * F.lit(1_000_000.0)
    ).cast(_DEC)
    terms = per_group.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("k_groups"),
        F.sum("_ng").alias("n"),
        F.sum(t6).alias("_t6"),
    )
    ties = (
        base.groupBy(*key_cols, "_x")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(*key_cols)
        .agg(
            F.sum(
                F.col("_t").cast(_DEC)
                * (F.col("_t") - 1).cast(_DEC)
                * (F.col("_t") + 1).cast(_DEC)
            ).alias("_tie3")
        )
    )
    n = F.col("n").cast(_DEC)
    nd = F.col("n").cast("double")
    h_raw = (
        F.lit(3.0)
        * F.col("_t6").cast("double")
        / F.lit(1_000_000.0)
        / (nd * (nd + F.lit(1.0)))
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    # tie correction denominator: 1 - sum(t^3 - t)/(n^3 - n), exact
    # decimals until the one double division
    corr = F.lit(1.0) - F.col("_tie3").cast("double") / (
        (n * n * n - n).cast("double")
    )
    return terms.join(ties, key_cols).select(
        *key_cols,
        "k_groups",
        "n",
        F.when(
            (F.col("n") >= 2) & (F.col("k_groups") >= 2) & (corr > 0),
            F.round(h_raw / corr, round_dp),
        ).alias("h"),
    )
