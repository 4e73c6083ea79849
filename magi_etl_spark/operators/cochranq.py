"""Cochran's Q test (Cochran 1950) — k matched BINARY treatments over
b blocks: did the success rate differ across the k conditions, with
every block (user, entity) acting as its own control?  The k-treatment
generalization of McNemar (q247 — Q over k = 2 reduces to the McNemar
chi-square without continuity correction), and the binary counterpart
of Friedman (q256) on the same blocked frame.

    Q = (k-1) * (k * sum_j C_j^2 - N^2) / (k N - sum_i R_i^2)

where C_j are treatment (column) success totals, R_i block (row)
success totals, N the grand success total — the standard identity
form: every term is a pure INTEGER, so Spark and the oracle agree to
the last digit and one double division finishes (rounded at the 6-dp
grid).

Grid completion contract: the input holds at most one row per
(key, block, treatment) with a 0/1 response; (block, treatment) pairs
ABSENT from the input — a block that never saw a condition — count as
response 0.  The operator completes the grid itself (distinct blocks
x distinct treatments per key, a keyed join against two bounded
frames, never a cross join over raw rows) because dropping absent
cells would silently shrink k for that block and bias the row totals
(exactly the null-indicator lesson from cucconi's r14 ADVICE, applied
at the cell level).

Scale shape: one cell aggregation collapses the corpus (materialized
ONCE via the chkpt barrier), grid completion joins the per-key block
list with the per-key treatment list (both bounded), and TWO keyed
aggregations (per-block totals, then the key readout) finish — zero
windows, zero cells^2 terms.  Keys with k < 2 treatments or a zero
denominator (every block all-0 or all-1 — no discordance) emit NULL q
(the mannkendall posture).

Scope note: the reference app stops at McNemar's 2x2 switch table;
Cochran's Q is its k-condition panel generalization (same
drift-of-binary-outcomes family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magi_etl_spark.chkpt import materialize

_DEC = "decimal(38,0)"


def cochran_q(
    df: DataFrame,
    key_cols: list[str],
    block_col: str,
    treatment_col: str,
    response: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*key_cols, k_treat, n_blocks, q`` — Cochran's Q per key over
    boolean ``response`` (cast to 0/1; a NULL response is dropped
    BEFORE grid completion, so the cell re-enters as an absent-cell 0
    only if no other row fills it).  The input must hold at most ONE
    row per (key, block, treatment) — pre-aggregate upstream (an
    any/max reduction is the usual choice; duplicate cells would
    double-count the block totals, the friedman pre-aggregation
    posture).

    Eager: the cell frame is materialized at call time (the chkpt
    barrier; construction runs one bounded job under mode=local)."""
    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (the block/treatment frames "
            "join on them); for a global test, add a constant key "
            "column upstream"
        )
    reserved = {
        "k_treat", "n_blocks", "q",
        "_b", "_g", "_x", "_r", "_c2", "_r2", "_n",
    } & (set(key_cols) | {block_col, treatment_col})
    if reserved:
        raise ValueError(
            f"key/block/treatment columns collide with working columns: "
            f"{sorted(reserved)}"
        )
    cells = materialize(
        df.select(
            *key_cols,
            F.col(block_col).alias("_b"),
            F.col(treatment_col).alias("_g"),
            response.cast("boolean").cast("int").alias("_x"),
        ).where(
            F.col("_x").isNotNull()
            & F.col("_b").isNotNull()
            & F.col("_g").isNotNull()
        )
    )
    # grid completion: per-key block list x per-key treatment list,
    # absent cells filled with 0 (both side frames are bounded — blocks
    # and treatments — so the join is keyed, never a raw cross product)
    blocks = cells.select(*key_cols, "_b").distinct()
    treats = cells.select(*key_cols, "_g").distinct()
    grid = blocks.join(treats, key_cols).join(
        cells, [*key_cols, "_b", "_g"], "left"
    ).select(*key_cols, "_b", "_g", F.coalesce(F.col("_x"), F.lit(0)).alias("_x"))
    # row (block) totals, then one key readout carrying all the sums
    per_block = grid.groupBy(*key_cols, "_b").agg(
        F.sum("_x").cast(_DEC).alias("_r")
    )
    row_stats = per_block.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("_r").alias("_n"),
        F.sum(F.col("_r") * F.col("_r")).alias("_r2"),
    )
    col_stats = (
        grid.groupBy(*key_cols, "_g")
        .agg(F.sum("_x").cast(_DEC).alias("_c"))
        .groupBy(*key_cols)
        .agg(
            F.countDistinct("_g").alias("k_treat"),
            F.sum(F.col("_c") * F.col("_c")).alias("_c2"),
        )
    )
    k = F.col("k_treat").cast(_DEC)
    num = (k - 1) * (k * F.col("_c2") - F.col("_n") * F.col("_n"))
    den = k * F.col("_n") - F.col("_r2")
    return col_stats.join(row_stats, key_cols, "left").select(
        *key_cols,
        "k_treat",
        F.coalesce(F.col("n_blocks"), F.lit(0)).alias("n_blocks"),
        F.when(
            (F.col("k_treat") >= 2) & (den > 0),
            F.round(num.cast("double") / den.cast("double"), round_dp),
        ).alias("q"),
    )
