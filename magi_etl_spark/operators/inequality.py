"""Concentration-of-mass diagnostics: per-group Gini coefficient and
Lorenz-curve points.

Complements the revenue-concentration family (HHI / CR4,
``operators/stats.py`` consumers): where HHI summarizes squared shares,
the Gini/Lorenz pair describes the whole cumulative distribution — the
standard audit for "how skewed is revenue / token mass across
customers / domains", which is also exactly the skew signal a partition
planner cares about at 100 TB.

Scale shape: one keyed aggregation to per-entity mass, one window
PARTITIONED BY group (never a global window) for ranks and cumulative
mass, one group aggregate for the coefficient.  All mass is integer
(cents / token counts), so ranks and cumulative sums are exact; the
only float is the final ratio, computed once per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def gini_by_group(
    df: DataFrame,
    group_cols: list[str],
    entity_col: str,
    mass_col: Column,
    round_dp: int = 6,
) -> DataFrame:
    """Per group: entity count, total integer mass, and the Gini
    coefficient ``(2 * sum(i * x_i) / (n * sum(x))) - (n + 1) / n`` with
    entities ranked ascending by ``(mass, entity)`` — the unique
    tie-break makes the rank-weighted sum deterministic.

    ``mass_col`` must be an integer-valued Column (pre-scale monetary
    values to cents upstream); the rank-weighted sum stays exact and the
    single division per group is engine-portable.
    """
    per_entity = df.groupBy(
        *group_cols, F.col(entity_col).alias("_entity")
    ).agg(F.sum(mass_col).cast("long").alias("_mass"))
    w = W.partitionBy(*group_cols).orderBy("_mass", "_entity")
    ranked = per_entity.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_entities"),
            F.sum("_mass").alias("total_mass"),
            F.sum(F.col("_rk") * F.col("_mass")).alias("_rws"),
        )
        .select(
            *group_cols,
            "n_entities",
            "total_mass",
            F.round(
                (2.0 * F.col("_rws"))
                / (F.col("n_entities").cast("double") * F.col("total_mass"))
                - (F.col("n_entities") + 1).cast("double")
                / F.col("n_entities"),
                round_dp,
            ).alias("gini"),
        )
    )


def lorenz_points(
    df: DataFrame,
    group_cols: list[str],
    entity_col: str,
    mass_col: Column,
    n_points: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """Per group: ``n_points`` Lorenz-curve samples — at each decile of
    the entity count (entities ascending by mass), the cumulative share
    of total mass.  Integer cumulative sums; one rounded division per
    emitted point."""
    per_entity = df.groupBy(
        *group_cols, F.col(entity_col).alias("_entity")
    ).agg(F.sum(mass_col).cast("long").alias("_mass"))
    w = W.partitionBy(*group_cols).orderBy("_mass", "_entity")
    ranked = per_entity.select(
        *group_cols,
        "_mass",
        F.row_number().over(w).alias("_rk"),
        F.sum("_mass").over(w.rowsBetween(W.unboundedPreceding, 0)).alias(
            "_cum"
        ),
    )
    totals = per_entity.groupBy(*group_cols).agg(
        F.count("*").alias("_n"), F.sum("_mass").alias("_tot")
    )
    j = ranked.join(totals, group_cols)
    # entity _rk is the p-th sample point iff rk == floor(p * n / n_points)
    pt = (F.col("_rk") * n_points) / F.col("_n")
    is_sample = (F.col("_rk") * n_points) % F.col("_n") == 0
    return (
        j.where(is_sample)
        .select(
            *group_cols,
            (pt).cast("int").alias("decile"),
            F.round(
                F.col("_cum").cast("double") / F.col("_tot"), round_dp
            ).alias("mass_share"),
        )
        .distinct()
    )
