"""Contingency-table association tests: chi-square statistic and
Cramér's V.

Completes the categorical-association toolbox next to mutual
information (q156) and co-purchase lift (q142): the chi-square
independence statistic over an r x c contingency table, with Cramér's V
as its normalized effect size — the standard "are these two categorical
columns related, and how strongly" audit.

Scale shape: one keyed count aggregate to the cell table (bounded by
r * c), two marginal aggregates, a broadcast join back — the corpus is
touched exactly once.  Observed counts are exact integers; expected
counts and the statistic are deterministic double expressions over
them, computed once per CELL (never per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chi_square(
    df: DataFrame,
    row_col: Column,
    col_col: Column,
    row_name: str = "row_cat",
    col_name: str = "col_cat",
    round_dp: int = 6,
) -> DataFrame:
    """One row: ``n, n_rows, n_cols, dof, chi2, cramers_v`` for the
    association between two categorical expressions.

    ``chi2 = sum over observed cells (o - e)^2 / e`` with
    ``e = row_total * col_total / n``, PLUS the structural-zero cells'
    contribution ``sum(e)`` over absent combinations — accounted
    without materializing them: for absent cells (o - e)^2 / e = e,
    and ``sum(e over absent) = n - sum(e over present)``.  Cramér's V
    = sqrt(chi2 / (n * (min(r, c) - 1))); emitted NULL for 1 x c or
    r x 1 tables (V undefined)."""
    cells = df.groupBy(
        row_col.alias(row_name), col_col.alias(col_name)
    ).agg(F.count("*").alias("_o"))
    row_tot = cells.groupBy(row_name).agg(F.sum("_o").alias("_rt"))
    col_tot = cells.groupBy(col_name).agg(F.sum("_o").alias("_ct"))
    j = cells.join(F.broadcast(row_tot), row_name).join(
        F.broadcast(col_tot), col_name
    )
    tot = cells.agg(
        F.sum("_o").alias("_n"),
        F.count_distinct(row_name).alias("n_rows"),
        F.count_distinct(col_name).alias("n_cols"),
    )
    e = (F.col("_rt") * F.col("_ct")).cast("double") / F.col("_n")
    per_cell = j.join(F.broadcast(tot)).select(
        ((F.col("_o") - e) * (F.col("_o") - e) / e).alias("_term"),
        e.alias("_e"),
        "_n",
        "n_rows",
        "n_cols",
    )
    agg = per_cell.groupBy("_n", "n_rows", "n_cols").agg(
        F.sum("_term").alias("_present"),
        F.sum("_e").alias("_e_present"),
    )
    chi2 = F.col("_present") + (F.col("_n") - F.col("_e_present"))
    min_dim = F.least(F.col("n_rows"), F.col("n_cols"))
    return agg.select(
        F.col("_n").cast("long").alias("n"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_cols").cast("long").alias("n_cols"),
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
        .cast("long")
        .alias("dof"),
        F.round(chi2, round_dp).alias("chi2"),
        F.when(
            min_dim > 1,
            F.round(
                F.sqrt(chi2 / (F.col("_n") * (min_dim - 1))), round_dp
            ),
        ).alias("cramers_v"),
    )
