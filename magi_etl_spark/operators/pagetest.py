"""Page's L trend test (Page 1963) — the ORDERED alternative for
randomized blocks: where Friedman (q256) asks "do the k treatments
differ at all?", Page's L asks "do they increase in a HYPOTHESIZED
order?" — the right test when the treatment axis is ordinal (dose,
day-of-week position, cohort age) and the alternative is monotone.
The third composition gate on the within-block doubled-rank machinery
(friedman q256, kendall's W q263 ride the same frame).

    L = sum_j  j * R_j

where R_j is the rank-sum of the j-th treatment (in hypothesized
order, 1-based) across the complete blocks, ranks averaged within ties.
Continuous-case null moments (the cucconi posture — ties ride average
ranks, moments stay the closed forms):

    E[L]   = b k (k+1)^2 / 4
    Var[L] = b k^2 (k+1)^2 (k-1) / 144

Engine parity: everything through L is EXACT — the doubled within-
block rank ``a = 2*avgrank`` (rankcorr's ``_rank2``) makes the doubled
statistic L2 = sum j*a an exact decimal, and the QUADRUPLED centered
numerator 4(L - E[L]) = 2*L2 - b k (k+1)^2 is an exact integer (no
decimal division anywhere).  The standardization folds the doublings
into the radicand: 16 Var = b k^2 (k+1)^2 (k-1) / 9, so

    z = (2*L2 - b k (k+1)^2) * 3 / sqrt(b k^2 (k+1)^2 (k-1))

is ONE double multiply of an exact-decimal difference against one
sqrt of an exact-decimal radicand, in a fixed operand order the
oracle mirrors; the output rounds at the 6-dp grid.

Scale shape: identical to friedman — one cell aggregation collapses
the corpus (materialized ONCE via the chkpt barrier; five downstream
references), the rank window rides DISTINCT values per (key, block),
the treatment order index is a dense rank over the per-key treatment
list (k values), one keyed aggregation finishes.  Keys with k < 2
treatments or no complete blocks emit NULL z (the mannkendall
posture); L2 is reported whenever at least one complete block exists.

Scope note: the reference app has no blocked-trend surface — this
completes the blocked-rank family (friedman q256) with its
directional member, exactly as jonckheere (q257) is the directional
complement of Kruskal-Wallis (q251).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from magi_etl_spark.chkpt import materialize

_DEC = "decimal(38,0)"


def page_trend_test(
    df: DataFrame,
    key_cols: list[str],
    block_col: str,
    treatment_col: str,
    value: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*key_cols, k_treat, n_blocks, l2, z`` — Page's L per key over
    integer ``value``, ranking treatments within each block and
    weighting by the treatment's 1-based position in its key's ORDERED
    treatment list (ascending ``treatment_col`` — encode the
    hypothesized order into that column upstream).  ``l2`` is the
    exact doubled statistic (2L, BIGINT); ``z`` the standardized value
    under the continuous-case null moments.  Rows with a null value,
    block, or treatment are dropped (a null has no rank); the input
    must hold at most ONE row per (key, block, treatment) —
    pre-aggregate upstream (a block with duplicates fails the
    completeness count and is dropped, the friedman contract).

    Eager: the cell frame is materialized at call time (the chkpt
    barrier; construction runs one bounded job under mode=local)."""
    from magi_etl_spark.operators.rankcorr import _rank2

    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (the treatment/order frames "
            "join on them); for a global test, add a constant key "
            "column upstream"
        )
    reserved = {
        "k_treat", "n_blocks", "l2", "z",
        "_b", "_g", "_x", "_a", "_j", "_cnt", "_nb", "_l2",
    } & (set(key_cols) | {block_col, treatment_col})
    if reserved:
        raise ValueError(
            f"key/block/treatment columns collide with working columns: "
            f"{sorted(reserved)}"
        )
    # cell frame: referenced by the k-count, the completeness filter,
    # the order index, and the rank join — the friedman fan-out shape,
    # materialized ONCE (left lazy it compiles the corpus per reference)
    base = materialize(
        df.select(
            *key_cols,
            F.col(block_col).alias("_b"),
            F.col(treatment_col).alias("_g"),
            value.cast("long").alias("_x"),
        ).where(
            F.col("_x").isNotNull()
            & F.col("_b").isNotNull()
            & F.col("_g").isNotNull()
        )
    )
    kt = base.groupBy(*key_cols).agg(F.countDistinct("_g").alias("k_treat"))
    # complete blocks: exactly one row per treatment, every treatment
    blocks = (
        base.groupBy(*key_cols, "_b")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.countDistinct("_g").alias("_nb"),
        )
        .join(kt, key_cols)
        .where(
            (F.col("_cnt") == F.col("k_treat"))
            & (F.col("_nb") == F.col("k_treat"))
        )
        .select(*key_cols, "_b")
    )
    cc = materialize(base.join(blocks, [*key_cols, "_b"]))
    # 1-based hypothesized-order index per key: dense rank over the
    # key's DISTINCT treatment values ascending (k rows per key — a
    # bounded window, never over raw cells)
    order = cc.select(*key_cols, "_g").distinct().select(
        *key_cols,
        "_g",
        F.dense_rank()
        .over(W.partitionBy(*key_cols).orderBy(F.asc("_g")))
        .alias("_j"),
    )
    ranked = (
        cc.join(_rank2(cc, [*key_cols, "_b"], "_x", "_a"), [*key_cols, "_b", "_x"])
        .join(order, [*key_cols, "_g"])
    )
    per_key = ranked.groupBy(*key_cols).agg(
        F.countDistinct("_b").alias("n_blocks"),
        F.sum(F.col("_j").cast(_DEC) * F.col("_a").cast(_DEC)).alias("_l2"),
    )
    n = F.col("n_blocks").cast(_DEC)
    k = F.col("k_treat").cast(_DEC)
    # quadrupled centered numerator 4(L - E[L]) = 2*L2 - b k (k+1)^2
    # stays INTEGER-exact (no decimal division anywhere); z folds the
    # doubling into the radicand: z = num4 * 3 / sqrt(16 Var * 9) with
    # 16*9*Var/144 = b k^2 (k+1)^2 (k-1) = rad
    num4 = 2 * F.col("_l2") - n * k * (k + 1) * (k + 1)
    rad = n * k * k * (k + 1) * (k + 1) * (k - 1)
    return (
        kt.join(per_key, key_cols, "left")
        .select(
            *key_cols,
            "k_treat",
            F.coalesce(F.col("n_blocks"), F.lit(0)).alias("n_blocks"),
            F.col("_l2").cast("long").alias("l2"),
            F.when(
                (F.col("k_treat") >= 2) & (F.col("n_blocks") >= 1),
                F.round(
                    num4.cast("double")
                    * F.lit(3.0)
                    / F.sqrt(rad.cast("double")),
                    round_dp,
                ),
            ).alias("z"),
        )
    )
