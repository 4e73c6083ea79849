"""Exact distributed order statistics WITHOUT a global sort: the
iterative histogram-narrowing selection algorithm (the classic
distributed k-th-smallest — Blum et al.'s selection problem in its
aggregation-friendly form).  ``grid_quantiles`` (operators/sketches.py)
answers the same question APPROXIMATELY in one pass; this operator is
the exact complement for when the answer must be the true order
statistic (SLA percentiles, exact medians for robust scaling) and the
column is too large to sort.

Round r: one map-side-combinable aggregation buckets the in-range
values into ``n_bins`` equal-width integer bins and counts each; the
driver walks the ≤``n_bins`` counts to find the bin containing the
k-th value, rebases k, and narrows [lo, hi] to that bin.  The integer
range shrinks ≥``n_bins``× per round, so a 64-bit key needs at most
``ceil(64 / log2(n_bins))`` rounds (8 at the default 256) — each a
single scan-side aggregate with ≤``n_bins`` rows crossing the driver
(the bounded-collect idiom of ``coreset.kcenter_select``).  No shuffle
of the data itself, ever: the only exchange is the ≤256-row partial-
aggregate merge.

Determinism: pure integer arithmetic end to end — bin ids are floor
divisions, k-th is the standard 1-indexed order statistic over the
multiset (duplicates counted), so a SQL oracle replays it as
``ORDER BY v LIMIT 1 OFFSET k-1``.

Scope note: the reference app computes percentiles with pandas
``quantile`` driver-side (dash_app/analytics.py); here the exact
answer is produced by bounded aggregation rounds that never hold the
column anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int,
    n_bins: int = 256,
) -> int:
    """The exact k-th smallest (1-indexed, duplicates counted) of an
    integer column, via histogram-narrowing rounds.  Raises on an empty
    frame or out-of-range ``k``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vals = df.select(F.col(col).cast("long").alias("_v")).where(
        F.col("_v").isNotNull()
    )
    row = vals.agg(
        F.min("_v").alias("lo"), F.max("_v").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if row["n"] == 0 or k > row["n"]:
        raise ValueError(f"k={k} out of range for n={row['n']}")
    lo, hi = int(row["lo"]), int(row["hi"])
    while lo < hi:
        width = (hi - lo) // n_bins + 1
        # one aggregation: counts per equal-width bin inside [lo, hi].
        # Bin id is BIGINT floor division (`DIV` on named columns — the
        # epochs idiom, no value splicing): a double `/` would lose
        # precision past 2**53 and misroute boundary values.
        hist = dict(
            vals.where((F.col("_v") >= lo) & (F.col("_v") <= hi))
            .select(
                "_v",
                F.lit(lo).alias("_lo"),
                F.lit(width).alias("_w"),
            )
            .groupBy(F.expr("(_v - _lo) DIV _w").alias("_b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        acc = 0
        for b in range(n_bins + 1):
            c = hist.get(b, 0)
            if acc + c >= k:
                k -= acc
                lo, hi = lo + b * width, min(hi, lo + b * width + width - 1)
                break
            acc += c
    return lo


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[tuple[int, int]],
    n_bins: int = 256,
) -> DataFrame:
    """Exact quantiles at ratios ``num/den`` (e.g. ``(1, 2)`` = median,
    ``(9, 10)`` = p90) as ``q_num, q_den, k, value`` — the lower
    empirical quantile convention ``k = ceil(q * n)`` (exact integer
    arithmetic, no float boundary).  One bounded selection per ratio;
    exactly ``len(qs)`` scalar results cross the driver."""
    spark: SparkSession = df.sparkSession
    n = df.where(F.col(col).isNotNull()).count()
    rows = []
    for num, den in qs:
        k = max(1, -((-num * n) // den))  # ceil(num*n/den), integers only
        rows.append((num, den, k, kth_smallest(df, col, k, n_bins)))
    return spark.createDataFrame(
        rows, "q_num int, q_den int, k long, value long"
    )
