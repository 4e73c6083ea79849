"""Table profiling: per-column completeness/cardinality/range stats.

The reference eyeballs frames with ``df.head()``/``df.info()`` between
pipeline stages (pandas, driver-side); at warehouse scale profiling must
be a single distributed pass.  ``profile_table`` computes every column's
stats in ONE aggregate job and reshapes the 1-row result to long form
with an ``inline`` of a literal struct array (driver never sees data,
only the final per-column rows).

Scale note: exact ``COUNT(DISTINCT)`` over k columns plans an Expand
(k+1 input multiplier before partial aggregation) — the standard price
of multi-column exact distincts in one pass.  For wide tables at 100 TB
pass ``approx=True`` to swap in ``approx_count_distinct`` (HLL, no
Expand, merges map-side) — the same trade the rollup/HLL family makes
(``operators/rollup_refresh.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per column: ``col, n_rows, n_nulls, n_distinct, min_s,
    max_s`` (min/max rendered as strings so heterogeneous column types
    coexist in one frame).  Single aggregate pass; no collect."""
    from magi_etl_spark.functions import fan_out

    cols = cols or df.columns
    # the Expand behind exact distincts multiplies rows BEFORE the
    # partial aggregate — spread a narrow scan first so that work is
    # not pinned to the file's split count
    df = fan_out(df)
    distinct = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            distinct(c).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
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
