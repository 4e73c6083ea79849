"""Kendall's W coefficient of concordance (Kendall & Babington Smith
1939) — m-rater agreement over k items: do the raters (blocks) rank
the items (treatments) the SAME way?  W = 1 is perfect concordance,
W = 0 is no agreement; the effect-size companion to Friedman's
significance test on the identical blocked-rank frame (W =
chi2_Friedman / (m (k-1)) when ties are absent).  The second
composition gate on the within-block doubled-rank machinery (q256
friedman, q262 Page's L ride the same frame).

With tie correction (ranks averaged within a rater's ties):

    W = 12 S / (m^2 (k^3 - k) - m T)

where S = sum_j (R_j - mean R)^2 over the item rank-sums R_j and
T = sum over raters of sum_ties (t^3 - t).

Engine parity: EXACT to the last division — with doubled ranks
``a = 2*avgrank`` the doubled rank-sums R2_j = sum_blocks a have exact
integer mean m (k+1), so S4 = sum_j (R2_j - m (k+1))^2 = 4 S is an
exact decimal; the tie term T rides the rank machinery's own per-cell
counts (t = cell count per (rater, value)); and 12 S = 3 S4 makes

    w = 3 * S4 / (m^2 (k^3 - k) - m T)

one double division of two exact decimals in fixed operand order; the
output rounds at the 6-dp grid.

Scale shape: identical to friedman — one cell aggregation collapses
the corpus (materialized ONCE via the chkpt barrier), the rank window
rides DISTINCT values per (key, block), the tie term is one extra
aggregation over the same cell counts, one keyed aggregation
finishes.  Keys with k < 2 items, no complete blocks, or every rater
tying every item (denominator 0) emit NULL w (the mannkendall
posture).

Scope note: the reference app has no inter-rater surface beyond
pairwise Cohen/Fleiss kappa (q248) — W completes the agreement family
for ORDINAL m-rater panels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.chkpt import materialize

_DEC = "decimal(38,0)"


def kendalls_w(
    df: DataFrame,
    key_cols: list[str],
    rater_col: str,
    item_col: str,
    value: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*key_cols, k_items, m_raters, w`` — Kendall's coefficient of
    concordance per key over integer ``value``: each rater (block)
    ranks the items by value, ties averaged; raters covering fewer
    than all k items are dropped (the friedman complete-block
    contract — pre-aggregate so the input holds at most ONE row per
    (key, rater, item)).  Rows with a null value, rater, or item are
    dropped (a null has no rank).

    Eager: the cell frame is materialized at call time (the chkpt
    barrier; construction runs one bounded job under mode=local)."""
    from magi_etl_spark.operators.rankcorr import _rank2

    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (the rater/item frames join on "
            "them); for a global coefficient, add a constant key column "
            "upstream"
        )
    reserved = {
        "k_items", "m_raters", "w",
        "_b", "_g", "_x", "_a", "_cnt", "_nb", "_r2", "_s4", "_t",
    } & (set(key_cols) | {rater_col, item_col})
    if reserved:
        raise ValueError(
            f"key/rater/item columns collide with working columns: "
            f"{sorted(reserved)}"
        )
    base = materialize(
        df.select(
            *key_cols,
            F.col(rater_col).alias("_b"),
            F.col(item_col).alias("_g"),
            value.cast("long").alias("_x"),
        ).where(
            F.col("_x").isNotNull()
            & F.col("_b").isNotNull()
            & F.col("_g").isNotNull()
        )
    )
    kt = base.groupBy(*key_cols).agg(F.countDistinct("_g").alias("k_items"))
    blocks = (
        base.groupBy(*key_cols, "_b")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.countDistinct("_g").alias("_nb"),
        )
        .join(kt, key_cols)
        .where(
            (F.col("_cnt") == F.col("k_items"))
            & (F.col("_nb") == F.col("k_items"))
        )
        .select(*key_cols, "_b")
    )
    cc = materialize(base.join(blocks, [*key_cols, "_b"]))
    ranked = cc.join(
        _rank2(cc, [*key_cols, "_b"], "_x", "_a"), [*key_cols, "_b", "_x"]
    )
    # doubled per-item rank sums; m and the tie term ride one grouped
    # pass each over the SAME complete-cell frame
    per_item = ranked.groupBy(*key_cols, "_g").agg(
        F.sum(F.col("_a").cast(_DEC)).alias("_r2")
    )
    m_frame = cc.groupBy(*key_cols).agg(
        F.countDistinct("_b").alias("m_raters")
    )
    # T = sum over (rater, tied-value cell) of t^3 - t, t = cell count
    tcnt = F.count(F.lit(1)).cast(_DEC)
    ties = (
        cc.groupBy(*key_cols, "_b", "_x")
        .agg((tcnt * tcnt * tcnt - tcnt).alias("_t"))
        .groupBy(*key_cols)
        .agg(F.sum("_t").alias("_t"))
    )
    m = F.col("m_raters").cast(_DEC)
    k = F.col("k_items").cast(_DEC)
    # S4 = sum_j (R2_j - m (k+1))^2  — 4S, exact
    s4 = (
        per_item.join(m_frame, key_cols)
        .join(kt, key_cols)
        .groupBy(*key_cols)
        .agg(
            F.sum(
                (F.col("_r2") - m * (k + 1)) * (F.col("_r2") - m * (k + 1))
            ).alias("_s4")
        )
    )
    den = m * m * (k * k * k - k) - m * F.col("_t")
    return (
        kt.join(m_frame, key_cols, "left")
        .join(s4, key_cols, "left")
        .join(ties, key_cols, "left")
        .select(
            *key_cols,
            "k_items",
            F.coalesce(F.col("m_raters"), F.lit(0)).alias("m_raters"),
            F.when(
                (F.col("k_items") >= 2)
                & (F.col("m_raters") >= 1)
                & (den > 0),
                F.round(
                    F.lit(3.0)
                    * F.col("_s4").cast("double")
                    / den.cast("double"),
                    round_dp,
                ),
            ).alias("w"),
        )
    )
