"""Jonckheere–Terpstra test (Jonckheere 1954) — the ORDERED-alternative
k-group trend test: "does the value distribution shift monotonically
with the group's position in a known ordering (dose level, cohort age,
quality tier)?".  Strictly more powerful than the omnibus
Kruskal–Wallis (``kruskal.py`` q251) when the ordering is real, because
it spends its power on the one alternative that matters.

J is the sum of pairwise Mann–Whitney counts over ordered group pairs
u < v; everything here rides the exact doubled statistic (ties counted
once, i.e. half of 2 each — the ``auc.py`` convention):

    2J = sum_{u<v} ( 2 * #{x_u < x_v}  +  #{x_u = x_v} )

computed from distinct-value CELL counts, never row pairs: the corpus
collapses to one (key, group, value) count aggregation, and the pair
stage crosses CELLS within a key (bounded by groups x distinct values
— categorical or binned data, the ``kendall_tau_b`` cells^2 contract,
ENFORCED the same way via ``max_cells``).  The normalized index

    jt = 2J / (2 * sum_{u<v} n_u n_v)

is the probability that a random observation from a later group
exceeds one from an earlier group (ties half) — the multi-group
analogue of AUC, 1/2 under the null; its denominator comes from the
per-group counts alone ((N^2 - sum n_g^2) / 2, exact decimal), no pair
enumeration.  2J accumulates in decimal(38,0) (cell cross-products
pass 2**63 at corpus scale — the q227 ssq lesson); ONE double division
at the end, rounded at the 6-dp grid.

Scale shape: one map-side-combinable cell aggregation, one keyed
cells-join (output bounded by the cells^2 contract), two keyed
aggregations.  Keys with fewer than 2 groups emit jt NULL (the
mannkendall posture).

Scope note: the reference app has no ordered-alternative surface —
this completes the rank family's trend axis (Mann–Kendall q246 tests
trend over TIME; this tests trend over an ordered FACTOR).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def jonckheere_terpstra(
    df: DataFrame,
    key_cols: list[str],
    group_col: str,
    value: Column,
    round_dp: int = 6,
    max_cells: int | None = 10_000,
) -> DataFrame:
    """``*key_cols, k_groups, n, j2, jt`` — the exact doubled
    Jonckheere–Terpstra statistic ``j2 = 2J`` and its normalized index
    per key, over integer ``value`` across the integer-ORDERED
    ``group_col`` samples (the column's natural ascending order is the
    tested ordering).  Rows with a null value or null group are dropped
    (a null has no rank; engines order nulls differently — the kstest
    lesson).  ``max_cells`` bounds the distinct (group, value) cells
    any single key may contribute, checked by one eager 1-row scalar
    aggregation before the cell join is built (the enforced
    ``kendall_tau_b`` contract; pass ``None`` to skip the validation
    pass when the binning is already validated — gate queries do, so
    the guard job never lands inside the bench's timed region)."""
    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty (the cell join and the count "
            "frames key on them); for a global test, add a constant key "
            "column upstream"
        )
    reserved = {
        "k_groups", "n", "j2", "jt",
        "_g", "_x", "_c", "_g1", "_x1", "_c1", "_g2", "_x2", "_c2",
        "_ng", "_j2", "_sq", "_pairs2",
    } & (set(key_cols) | {group_col})
    if reserved:
        raise ValueError(
            f"key/group columns collide with working columns: "
            f"{sorted(reserved)}"
        )
    base = df.select(
        *key_cols,
        F.col(group_col).cast("long").alias("_g"),
        value.cast("long").alias("_x"),
    ).where(F.col("_x").isNotNull() & F.col("_g").isNotNull())
    cells = base.groupBy(*key_cols, "_g", "_x").agg(
        F.count(F.lit(1)).alias("_c")
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
                f"jonckheere_terpstra: a key has {worst} distinct "
                f"(group, value) cells, over the max_cells={max_cells} "
                "contract — the pair stage is cells^2 per key, so bin "
                "or bucket the values first (or raise max_cells / pass "
                "None if the cell join is genuinely intended)"
            )
    a = cells.select(
        *key_cols,
        F.col("_g").alias("_g1"),
        F.col("_x").alias("_x1"),
        F.col("_c").alias("_c1"),
    )
    b = cells.select(
        *key_cols,
        F.col("_g").alias("_g2"),
        F.col("_x").alias("_x2"),
        F.col("_c").alias("_c2"),
    )
    j2 = (
        a.join(b, key_cols)
        .where(F.col("_g1") < F.col("_g2"))
        .groupBy(*key_cols)
        .agg(
            F.sum(
                F.col("_c1").cast(_DEC)
                * F.col("_c2").cast(_DEC)
                * F.when(F.col("_x1") < F.col("_x2"), F.lit(2))
                .when(F.col("_x1") == F.col("_x2"), F.lit(1))
                .otherwise(F.lit(0))
                .cast(_DEC)
            ).alias("_j2")
        )
    )
    per_group = base.groupBy(*key_cols, "_g").agg(
        F.count(F.lit(1)).alias("_ng")
    )
    tot = per_group.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("k_groups"),
        F.sum("_ng").alias("n"),
        F.sum(F.col("_ng").cast(_DEC) * F.col("_ng").cast(_DEC)).alias("_sq"),
    )
    # 2 * sum_{u<v} n_u n_v = N^2 - sum n_g^2, exact decimal
    pairs2 = F.col("n").cast(_DEC) * F.col("n").cast(_DEC) - F.col("_sq")
    return tot.join(j2, key_cols, "left").select(
        *key_cols,
        "k_groups",
        "n",
        F.coalesce(F.col("_j2"), F.lit(0).cast(_DEC))
        .cast("long")
        .alias("j2"),
        F.when(
            (F.col("k_groups") >= 2) & (pairs2 > 0),
            F.round(
                F.coalesce(F.col("_j2"), F.lit(0).cast(_DEC)).cast("double")
                / pairs2.cast("double"),
                round_dp,
            ),
        ).alias("jt"),
    )
