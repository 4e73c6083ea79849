"""Relationship discovery — the data-catalog profiling pass that
proposes foreign-key candidates between tables: for each candidate
(child column -> parent column) pair, how much of the child's distinct
value set the parent contains, and whether the parent side is unique
(a real key).  Containment ~1.0 against a unique parent is the
classic FK signal (the inclusion-dependency literature) — the
discovery input schema-inference and join-planning services consume.

Scale shape: per pair, the child's DISTINCT value set left-joins a
marker on the parent's distinct values (shuffles carry distinct values
only, never row counts) and everything folds into one 1-row aggregate
per pair; the pairs union into ONE lazy report plan — no driver-side
counts, a single job for the whole report.  Exact distinct is the
correctness mode; ``operators/sketches.py``'s KMV overlap is the
approximate path at extreme cardinalities.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_containment(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """One-row frame: distinct child values, how many the parent
    contains, the containment ratio (6 decimals), and whether the
    parent column is unique over its non-null values.  Fully lazy —
    one aggregate plan, nothing collected."""
    c_vals = (
        child.select(F.col(child_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .distinct()
    )
    p_marked = (
        parent.select(F.col(parent_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .distinct()
        .withColumn("_p", F.lit(True))
    )
    cont = c_vals.join(p_marked, "_v", "left").agg(
        F.count(F.lit(1)).cast("long").alias("n_child_distinct"),
        F.count("_p").cast("long").alias("n_contained"),
    )
    uniq = parent.select(F.col(parent_col).alias("_v")).where(
        F.col("_v").isNotNull()
    ).agg(
        (F.count(F.lit(1)) == F.count_distinct(F.col("_v"))).alias(
            "parent_unique"
        )
    )
    return cont.crossJoin(F.broadcast(uniq)).select(
        "n_child_distinct",
        "n_contained",
        F.round(
            F.col("n_contained") / F.col("n_child_distinct").cast("double"),
            6,
        ).alias("containment"),
        "parent_unique",
    )


def discover_fk_candidates(
    pairs: Sequence[tuple[str, DataFrame, str, str, DataFrame, str]],
) -> DataFrame:
    """Profile a list of candidate relationships: each entry is
    ``(child_name, child_df, child_col, parent_name, parent_df,
    parent_col)``; output one labeled row per candidate with the
    ``fk_containment`` measures.  The unioned plan's branches are
    independent — Spark schedules them concurrently inside one job."""
    out = None
    for c_name, c_df, c_col, p_name, p_df, p_col in pairs:
        row = fk_containment(c_df, c_col, p_df, p_col).select(
            F.lit(f"{c_name}.{c_col}").alias("child"),
            F.lit(f"{p_name}.{p_col}").alias("parent"),
            "n_child_distinct",
            "n_contained",
            "containment",
            "parent_unique",
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("no candidate pairs supplied")
    return out
