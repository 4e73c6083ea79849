"""Hodges–Lehmann shift estimator (Hodges & Lehmann 1963) — the
MEDIAN OF PAIRWISE DIFFERENCES between two samples: the robust answer
to "by HOW MUCH did the metric shift?" where the rank tests
(Mann–Whitney q238, Brunner–Munzel q265, Cucconi q259) only answer
"did it?".  30% breakdown point, no symmetry assumption on either
sample, and it estimates the pseudo-median of the difference — the
standard robust effect-size companion to every two-sample rank test.

    HL = median { x_i - y_j : x_i in sample 1, y_j in sample 2 }

Engine shape: the n1*n2 pairs are NEVER enumerated — both samples
collapse to distinct-value cells (the jonckheere cells^2 contract,
ENFORCED the same way via ``max_cells``), the difference distribution
is the cell cross join with weight c1*c2 (bounded by cells1*cells2
per key, not n1*n2), and the median is the weighted-quantile
selection over the collapsed difference cells (the q228/q260
machinery): smallest d with 2*cum >= T for the LOW median, smallest d
with 2*cum >= T+1 for the HIGH median, T = n1*n2 — pure integer
threshold inequalities in decimal(38,0) (cum and T pass 2**63 long
before the corpus does; the wquantile overflow posture).

Output is EXACT: ``hl2 = lo + hi`` is the doubled estimator as a
BIGINT (the true HL is hl2/2 — reported as ``hl`` too, an exact
double since integer halves are representable); no float comparison
anywhere, so Spark and the oracle agree bit-for-bit.

Scale shape: one (key, sample, value) cell aggregation collapses the
corpus (materialized ONCE via the chkpt barrier), one keyed
cells-by-cells join builds the difference cells, one window over
DISTINCT differences per key selects both medians.  Keys missing
either sample emit NULL (the mannkendall posture).

Scope note: the reference app has no two-sample surface; HL is the
effect-size member of the drift family (see brunnermunzel.py's
family map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from magi_etl_spark.chkpt import materialize

_DEC = "decimal(38,0)"


def hodges_lehmann_shift(
    df: DataFrame,
    key_cols: list[str],
    in_first: Column,
    value: Column,
    max_cells: int | None = 10_000,
) -> DataFrame:
    """``*key_cols, n1, n2, hl2, hl`` — the Hodges–Lehmann estimate of
    how much sample 1 (where ``in_first`` is true) exceeds sample 2
    (the rest) per key, over integer ``value``.  ``hl2`` is the exact
    doubled estimator (low + high median of the pairwise differences);
    ``hl = hl2 / 2``.  Rows with a null value or null indicator are
    dropped (the cucconi posture).  ``max_cells`` bounds the worst
    per-key distinct (sample, value) cell count with one eager guard
    aggregate (1-row collect; pass ``None`` when the input is bounded
    by construction and the guard pass must stay out of a timed
    region — the q245 lesson)."""
    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (the difference cells join on "
            "them); for a global estimate, add a constant key column "
            "upstream"
        )
    reserved = {
        "n1", "n2", "hl2", "hl",
        "_s", "_x", "_c", "_x1", "_x2", "_c1", "_c2",
        "_d", "_w", "_t", "_cum", "_lo", "_hi",
    } & set(key_cols)
    if reserved:
        raise ValueError(
            f"key_cols collide with working columns: {sorted(reserved)}"
        )
    cells = materialize(
        df.select(
            *key_cols,
            F.when(in_first, 1).when(~in_first, 0).alias("_s"),
            value.cast("long").alias("_x"),
        )
        .where(F.col("_x").isNotNull() & F.col("_s").isNotNull())
        .groupBy(*key_cols, "_s", "_x")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    if max_cells is not None:
        worst = (
            cells.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("_nc"))
            .agg(F.max("_nc").alias("_mx"))
            .collect()[0]["_mx"]
        )
        if worst is not None and worst > int(max_cells):
            raise ValueError(
                f"hodges_lehmann_shift: a key has {worst} distinct "
                f"(sample, value) cells, over the max_cells={max_cells} "
                "contract — the difference stage is cells1*cells2 per "
                "key, so bin or bucket the values first (or raise "
                "max_cells / pass None if the cell join is genuinely "
                "intended)"
            )
    one = cells.where(F.col("_s") == 1).select(
        *key_cols, F.col("_x").alias("_x1"), F.col("_c").alias("_c1")
    )
    two = cells.where(F.col("_s") == 0).select(
        *key_cols, F.col("_x").alias("_x2"), F.col("_c").alias("_c2")
    )
    # difference cells: weight c1*c2 per distinct (x1, x2), collapsed
    # by the difference value before the selection window
    diffs = (
        one.join(two, key_cols)
        .select(
            *key_cols,
            (F.col("_x1") - F.col("_x2")).alias("_d"),
            (F.col("_c1").cast(_DEC) * F.col("_c2").cast(_DEC)).alias("_w"),
        )
        .groupBy(*key_cols, "_d")
        .agg(F.sum("_w").alias("_w"))
    )
    totals = cells.groupBy(*key_cols).agg(
        F.sum(F.when(F.col("_s") == 1, F.col("_c")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("_s") == 0, F.col("_c")).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.asc("_d"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = diffs.select(
        *key_cols, "_d", F.sum("_w").over(w).alias("_cum")
    ).join(
        F.broadcast(
            totals.select(
                *key_cols,
                (F.col("n1").cast(_DEC) * F.col("n2").cast(_DEC)).alias("_t"),
            )
        ),
        key_cols,
    )
    lo = (
        cum.where(2 * F.col("_cum") >= F.col("_t"))
        .groupBy(*key_cols)
        .agg(F.min("_d").alias("_lo"))
    )
    hi = (
        cum.where(2 * F.col("_cum") >= F.col("_t") + 1)
        .groupBy(*key_cols)
        .agg(F.min("_d").alias("_hi"))
    )
    return (
        totals.join(lo, key_cols, "left")
        .join(hi, key_cols, "left")
        .select(
            *key_cols,
            "n1",
            "n2",
            F.when(
                (F.col("n1") >= 1) & (F.col("n2") >= 1),
                # odd T: both thresholds select position (T+1)/2, so
                # hl2 = 2*median; even T: positions T/2 and T/2+1 (the
                # classic average-of-middles); the coalesce is a
                # defensive no-op (cum = T always clears T+1)
                F.col("_lo") + F.coalesce(F.col("_hi"), F.col("_lo")),
            )
            .cast("long")
            .alias("hl2"),
            F.when(
                (F.col("n1") >= 1) & (F.col("n2") >= 1),
                (F.col("_lo") + F.coalesce(F.col("_hi"), F.col("_lo")))
                .cast("double")
                / 2,
            ).alias("hl"),
        )
    )
