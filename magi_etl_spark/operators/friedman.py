"""Friedman test (Friedman 1937) — the k-treatment rank test for
RANDOMIZED BLOCKS: "do the k treatments differ, once every block
(user, day, site) serves as its own control?".  The repeated-measures
complement to Kruskal–Wallis (``kruskal.py`` q251): ranks are computed
WITHIN each block, so between-block level differences — the thing that
drowns a pooled rank test on heterogeneous panels — cancel by
construction.

Tie-corrected form (Conover 1999 §5.8), with per-block average ranks
r_bj, treatment rank sums R_j = sum_b r_bj over n complete blocks:

    T = (k-1) * sum_j (R_j - n(k+1)/2)^2  /  (A2 - C2)
    A2 = sum_bj r_bj^2          C2 = n k (k+1)^2 / 4

which reduces to the classic 12/(nk(k+1)) * sum R_j^2 - 3n(k+1) when
no ties exist.  Everything rides the DOUBLED within-block rank
``a = 2*avgrank`` (an exact integer — rankcorr's ``_rank2`` machinery,
imported here, partitioned by (key, block)):

    (R_j - n(k+1)/2)^2 = (R2_j - n(k+1))^2 / 4
    A2 - C2 = (sum a^2 - n k (k+1)^2) / 4

so the 4s cancel and T = (k-1) * NUM / DEN with NUM and DEN both
exact decimal(38,0) integers both engines sum identically — ONE double
division at the end, rounded at the 6-dp grid.

Block completeness: the test is defined on complete blocks; blocks
that do not contain exactly one observation of every treatment seen
under the key are DROPPED (listwise deletion, the textbook default) —
n counts the complete blocks only, while k_treat counts treatments
over ALL of the key's rows, so a treatment that only ever appears in
ragged blocks strictly shrinks n rather than silently shrinking k.

Scale shape: one (key, block, treatment) cell scan collapses the
corpus into an eagerly localCheckpointed cell frame (the input is
referenced by five downstream frames — lazy, the compiled plan
re-derived it per reference; the q250 IPF lesson), so the corpus is
scanned exactly ONCE regardless of plan fan-out; the rank window is
partitioned by (key, block) — millions of tiny partitions, never a
funnel; the rest is keyed aggregations.  Keys-with-no-complete-blocks
still emit their row (n_blocks 0, t NULL — the mannkendall posture).

Scope note: the reference app has no blocked-design surface — this
completes the rank family (Mann–Whitney q238, Spearman/Kendall q245,
Kruskal–Wallis q251) with its repeated-measures omnibus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.chkpt import materialize

_DEC = "decimal(38,0)"


def friedman_test(
    df: DataFrame,
    key_cols: list[str],
    block_col: str,
    treatment_col: str,
    value: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*key_cols, k_treat, n_blocks, t`` — the tie-corrected Friedman
    statistic per key over integer ``value``, ranking the
    ``treatment_col`` samples within each ``block_col`` block.  Rows
    with a null value, block, or treatment are dropped (a null has no
    rank; engines order nulls differently — the kstest lesson); the
    input must hold at most ONE row per (key, block, treatment) —
    pre-aggregate upstream (a block with duplicates fails the
    completeness count and is dropped).  Keys with fewer than 2
    treatments, no complete blocks, or every block internally tied
    emit t NULL (the mannkendall posture: the row is present, the
    statistic is undefined).

    Eager: the cell frame is localCheckpointed at call time (the q250
    posture), so construction runs one bounded job."""
    from magi_etl_spark.operators.rankcorr import _rank2

    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (the treatment/tie frames join "
            "on them); for a global test, add a constant key column "
            "upstream"
        )
    reserved = {
        "k_treat", "n_blocks", "t",
        "_b", "_g", "_x", "_a", "_cnt", "_nb", "_r2", "_a2", "_num",
    } & (set(key_cols) | {block_col, treatment_col})
    if reserved:
        raise ValueError(
            f"key/block/treatment columns collide with working columns: "
            f"{sorted(reserved)}"
        )
    # the cell frame is referenced by FIVE downstream frames (k-count,
    # completeness filter, ranks, both aggregates) — left lazy, the
    # compiled plan re-derives the input per reference (20 corpus scans
    # at audit; the q250 IPF lesson), so it is materialized ONCE via
    # chkpt.materialize (eager localCheckpoint in the sandbox; the
    # chkpt module picks the cluster-safe barrier — never a bare
    # persist(), the dbscan cache-manager lesson).  Bounded by keys x
    # blocks x treatments under the
    # one-row-per-cell contract.
    base = (
        df.select(
            *key_cols,
            F.col(block_col).alias("_b"),
            F.col(treatment_col).alias("_g"),
            value.cast("long").alias("_x"),
        )
        .where(
            F.col("_x").isNotNull()
            & F.col("_b").isNotNull()
            & F.col("_g").isNotNull()
        )
        .transform(materialize)
    )
    # k over ALL the key's rows (see module docstring)
    kt = base.groupBy(*key_cols).agg(
        F.countDistinct("_g").alias("k_treat")
    )
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
    # the complete-block cell frame feeds the rank join and both final
    # aggregates — checkpointed for the same reason as base (a strict
    # subset of it, so the same bound)
    cc = base.join(blocks, [*key_cols, "_b"]).transform(materialize)
    ranked = cc.join(
        _rank2(cc, [*key_cols, "_b"], "_x", "_a"), [*key_cols, "_b", "_x"]
    )
    per_treat = ranked.groupBy(*key_cols, "_g").agg(
        F.sum(F.col("_a").cast(_DEC)).alias("_r2")
    )
    per_key = ranked.groupBy(*key_cols).agg(
        F.countDistinct("_b").alias("n_blocks"),
        F.sum(F.col("_a").cast(_DEC) * F.col("_a").cast(_DEC)).alias("_a2"),
    )
    n = F.col("n_blocks").cast(_DEC)
    k = F.col("k_treat").cast(_DEC)
    num = (
        per_treat.join(per_key.select(*key_cols, "n_blocks"), key_cols)
        .join(kt, key_cols)
        .groupBy(*key_cols)
        .agg(
            F.sum(
                (F.col("_r2") - n * (k + 1)) * (F.col("_r2") - n * (k + 1))
            ).alias("_num")
        )
    )
    den = F.col("_a2") - n * k * (k + 1) * (k + 1)
    return (
        kt.join(per_key, key_cols, "left")
        .join(num, key_cols, "left")
        .select(
            *key_cols,
            "k_treat",
            F.coalesce(F.col("n_blocks"), F.lit(0)).alias("n_blocks"),
            F.when(
                (F.col("k_treat") >= 2)
                & (F.col("n_blocks") >= 1)
                & (den > 0),
                F.round(
                    (F.col("k_treat") - 1).cast("double")
                    * F.col("_num").cast("double")
                    / den.cast("double"),
                    round_dp,
                ),
            ).alias("t"),
        )
    )
