"""Table profiling: per-column completeness/cardinality/range stats.

The reference eyeballs frames with ``df.head()``/``df.info()`` between
pipeline stages (pandas, driver-side); at warehouse scale profiling must
be a distributed aggregate whose result — one row per column — never
routes data through the driver.

Two plan shapes, chosen by the exactness requirement:

- ``approx=True`` (the 100 TB default posture): ONE pass over the full
  width with ``approx_count_distinct`` — HLL sketches merge map-side,
  so there is no Expand and the shuffle is k sketch rows.
- exact (the oracle/audit mode): one single-column aggregate PER
  column, unioned.  Multi-column exact distincts in one aggregate plan
  an Expand — a (k+1)× input multiplier before the partial aggregate —
  whereas per-column passes each scan ONE parquet column (column
  pruning makes total I/O ≈ the one full-width scan) and shuffle only
  per-column partials.  Measured at sf0.1: the union shape is ~3×
  faster than the Expand shape, and the gap widens with width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stat_aggs(c: str, distinct) -> list:
    return [
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
        distinct(c).cast("long").alias("n_distinct"),
        F.min(c).cast("string").alias("min_s"),
        F.max(c).cast("string").alias("max_s"),
    ]


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per column: ``col, n_rows, n_nulls, n_distinct, min_s,
    max_s`` (min/max rendered as strings so heterogeneous column types
    coexist in one frame).  Output order follows ``cols``; no collect."""
    from magi_etl_spark.functions import fan_out

    cols = cols or df.columns
    if approx:
        # single full-width pass: HLL merges map-side, no Expand
        wide = fan_out(df)
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            aggs += [
                F.count(c).alias(f"_nn_{c}"),
                F.approx_count_distinct(c).alias(f"_nd_{c}"),
                F.min(c).cast("string").alias(f"_min_{c}"),
                F.max(c).cast("string").alias(f"_max_{c}"),
            ]
        row = wide.agg(*aggs)
        per_col = F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.col("_n").alias("n_rows"),
                    (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                    F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                    F.col(f"_min_{c}").alias("min_s"),
                    F.col(f"_max_{c}").alias("max_s"),
                )
                for c in cols
            ]
        )
        return row.select(F.inline(per_col))
    # exact: one column-pruned pass per column, unioned — each branch's
    # single-distinct aggregate is the ordinary two-phase partial
    # (no Expand), and the branch scan reads one parquet column
    parts = []
    for c in cols:
        branch = fan_out(df.select(c))
        parts.append(
            branch.agg(F.lit(c).alias("col"), *_stat_aggs(c, F.countDistinct))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
