"""Rank correlation — Spearman's rho and Kendall's tau-b per group —
the monotone-association completion of the correlation family
(``stats.correlation_matrix`` q159 is Pearson-only: linear, outlier-
sensitive; ranks make the readout robust to monotone transforms and
heavy tails, the standard choice for skewed engagement metrics).

Spearman = Pearson over average ranks.  Average ranks of tied values
are half-integers, so everything rides the DOUBLED rank ``2 * avgrank
= 2 * cum - cnt + 1`` (an exact integer, from the cumulative count
``cum`` over distinct values ascending) and the Pearson sufficient
statistics over doubled ranks are exact integers in decimal(38,0):

    rho = (n*Sab - Sa*Sb) / (sqrt(n*Saa - Sa^2) * sqrt(n*Sbb - Sb^2))

computed as integers end-to-end with ONE double expression per group
in a fixed operand order (the repo-wide sufficient-statistics
posture).  The factor 2 cancels in the correlation, so no adjustment
is needed.

Kendall tau-b comes from distinct-value CELL counts: pairs of cells
(x1 < x2) contribute +-(c1*c2) by the y ordering, and the tie terms
n0/n1/n2 come from the marginal tie groups — exact integers again:

    tau_b = (C - D) / sqrt((n0 - n1) * (n0 - n2))

Scale shape: ranks ride DISTINCT values, not rows — one (group, value)
count aggregation, then a cumulative window partitioned by group (or,
for the GLOBAL df case, the range-partitioned two-pass prefix rank of
operators/prefix.py — never a single-partition window), joined back by
key.  The tau cell-pair join is bounded by the distinct-CELL
cardinality per group (binned or categorical data — the documented
contract, like setjoin.py's pair bound), never by row count; the
contract is enforced by ``kendall_tau_b``'s ``max_cells`` guard, so
misuse on continuous data fails loudly before the join compiles.

Scope note: the reference app computes correlations in pandas; this
extends the exact-stats family (q159 Pearson, q156 MI) with the rank
variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _guard_names(group_cols: list[str], reserved: set[str]) -> None:
    # the mannkendall.py collision rule applied family-wide: a group
    # column named like an output statistic would make the final select
    # ambiguous — fail loudly instead
    hit = reserved & set(group_cols)
    if hit:
        raise ValueError(
            f"group_cols collide with output columns: {sorted(hit)}"
        )


def _shuffle_partitions(df: DataFrame) -> int:
    # same degrade-not-crash parse as operators/fdr.py: the conf can
    # hold a non-integer sentinel on some platforms
    try:
        return int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except (TypeError, ValueError):
        return 200


def _rank2(
    base: DataFrame, group_cols: list[str], col: str, out: str
) -> DataFrame:
    """Per (group, distinct ``col`` value): the exact integer doubled
    average rank ``2*cum - cnt + 1`` of that value within its group."""
    cnt = base.groupBy(*group_cols, col).agg(F.count(F.lit(1)).alias("_cnt"))
    if group_cols:
        w = (
            W.partitionBy(*group_cols)
            .orderBy(F.asc(col))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        cum = F.sum("_cnt").over(w)
        ranked = cnt.select(*group_cols, col, "_cnt", cum.alias("_cum"))
    else:
        from magi_etl_spark.operators.prefix import ranked_prefix_sum

        ranked = ranked_prefix_sum(
            cnt,
            [F.asc(col)],
            "_cnt",
            num_partitions=_shuffle_partitions(base),
        ).withColumnRenamed("cum", "_cum")
    return ranked.select(
        *group_cols,
        col,
        (F.lit(2) * F.col("_cum") - F.col("_cnt") + 1).alias(out),
    )


def spearman_rho(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    round_dp: int = 6,
) -> DataFrame:
    """``*group_cols, n, rho`` — Spearman's rank correlation of integer
    ``x`` vs ``y`` per group (empty ``group_cols`` = one global row,
    ranked via the range-partitioned prefix rank).  Rows where either
    value is NULL are dropped (a null has no rank, and engines order
    nulls differently — the kstest.py lesson); groups where either
    column is constant emit NULL (zero rank variance)."""
    _guard_names(group_cols, {"n", "rho"})
    base = df.select(
        *group_cols, x.cast("long").alias("_x"), y.cast("long").alias("_y")
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    rx = _rank2(base, group_cols, "_x", "_a")
    ry = _rank2(base, group_cols, "_y", "_b")
    joined = base.join(rx, [*group_cols, "_x"]).join(ry, [*group_cols, "_y"])
    stats = joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_a").cast(_DEC)).alias("_sa"),
        F.sum(F.col("_b").cast(_DEC)).alias("_sb"),
        F.sum(F.col("_a").cast(_DEC) * F.col("_a").cast(_DEC)).alias("_saa"),
        F.sum(F.col("_b").cast(_DEC) * F.col("_b").cast(_DEC)).alias("_sbb"),
        F.sum(F.col("_a").cast(_DEC) * F.col("_b").cast(_DEC)).alias("_sab"),
    )
    n = F.col("n").cast(_DEC)
    cov = (n * F.col("_sab") - F.col("_sa") * F.col("_sb")).cast("double")
    vx = (n * F.col("_saa") - F.col("_sa") * F.col("_sa")).cast("double")
    vy = (n * F.col("_sbb") - F.col("_sb") * F.col("_sb")).cast("double")
    return stats.select(
        *group_cols,
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), round_dp),
        ).alias("rho"),
    )


def kendall_tau_b(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    round_dp: int = 6,
    max_cells: int | None = 10_000,
) -> DataFrame:
    """``*group_cols, n, tau_b`` — Kendall's tau-b of integer ``x`` vs
    ``y`` per group, from distinct-value cell counts (the documented
    contract: distinct (x, y) cells per group are bounded — categorical
    or binned data; the pair stage is cells^2, never rows^2).  Null
    rows are dropped; groups where either column is constant emit
    NULL.

    The cells^2 contract is ENFORCED, not just documented (the r12
    verdict nit): ``max_cells`` bounds the distinct (x, y) cells any
    single group may contribute, checked by one eager scalar
    aggregation (a 1-row bounded collect, the repo's histogram-
    narrowing class) before the pair join is built — a caller passing
    high-cardinality continuous values fails loudly instead of
    silently compiling a quadratic cell join.  Callers that have
    already validated their binning can pass ``max_cells=None`` to
    skip the extra aggregation pass."""
    _guard_names(group_cols, {"n", "tau_b"})
    base = df.select(
        *group_cols, x.cast("long").alias("_x"), y.cast("long").alias("_y")
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    cells = base.groupBy(*group_cols, "_x", "_y").agg(
        F.count(F.lit(1)).alias("_c")
    )
    if max_cells is not None:
        worst = (
            cells.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("_nc"))
            .agg(F.max("_nc").alias("_mx"))
            .collect()[0]["_mx"]
        )
        if worst is not None and worst > int(max_cells):
            raise ValueError(
                f"kendall_tau_b: a group has {worst} distinct (x, y) "
                f"cells, over the max_cells={max_cells} contract — the "
                "pair stage is cells^2 per group, so bin or bucket the "
                "inputs first (or raise max_cells / pass None if the "
                "cell join is genuinely intended)"
            )
    a = cells.select(
        *group_cols,
        F.col("_x").alias("_x1"),
        F.col("_y").alias("_y1"),
        F.col("_c").alias("_c1"),
    )
    b = cells.select(
        *group_cols,
        F.col("_x").alias("_x2"),
        F.col("_y").alias("_y2"),
        F.col("_c").alias("_c2"),
    )
    cd = (
        a.join(b, group_cols)
        .where(F.col("_x1") < F.col("_x2"))
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.when(F.col("_y1") < F.col("_y2"), 1)
                .when(F.col("_y1") > F.col("_y2"), -1)
                .otherwise(0)
                .cast(_DEC)
                * F.col("_c1").cast(_DEC)
                * F.col("_c2").cast(_DEC)
            ).alias("_cd")
        )
    )

    def _tie_half(col: str, out: str) -> DataFrame:
        return (
            base.groupBy(*group_cols, col)
            .agg(F.count(F.lit(1)).alias("_t"))
            .groupBy(*group_cols)
            .agg(
                F.sum(
                    F.col("_t").cast(_DEC) * (F.col("_t") - 1).cast(_DEC)
                ).alias(out)
            )
        )

    tx = _tie_half("_x", "_tx2")  # 2 * sum t(t-1)/2
    ty = _tie_half("_y", "_ty2")
    tot = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    n = F.col("n").cast(_DEC)
    # everything doubled: 2*n0 = n(n-1), 2*n1 = _tx2, 2*n2 = _ty2 —
    # the factor 2 cancels inside the square roots' product
    dx = (n * (n - 1) - F.col("_tx2")).cast("double")
    dy = (n * (n - 1) - F.col("_ty2")).cast("double")
    return (
        tot.join(cd, group_cols, "left")
        .join(tx, group_cols)
        .join(ty, group_cols)
        .select(
            *group_cols,
            "n",
            F.when(
                (dx > 0) & (dy > 0),
                F.round(
                    F.lit(2.0)
                    * F.coalesce(F.col("_cd"), F.lit(0).cast(_DEC)).cast(
                        "double"
                    )
                    / (F.sqrt(dx) * F.sqrt(dy)),
                    round_dp,
                ),
            ).alias("tau_b"),
        )
    )
