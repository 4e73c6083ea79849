"""Distribution-drift and robust-outlier monitoring operators.

A 100 TB pipeline that re-ingests daily needs cheap answers to "did
this feed change shape" (drift between a baseline window and the
current window) and "which points are wild" (outliers robust to the
outliers themselves).  The reference's monitoring posture is schema/
row-count checks at its task layer; these operators extend that to
distributional checks, following the same deterministic-arithmetic
discipline as the rest of the repo so DuckDB oracles can replay them.

- ``psi_drift``: Population Stability Index over fixed-width bins with
  add-one (Laplace) smoothing, per group.  PSI = sum over bins of
  (p - q) * ln(p / q); the industry rule of thumb flags > 0.2.  Fixed
  bin edges (not quantile bins) keep the operator one pass + one
  bounded aggregation and make the arithmetic engine-portable.
- ``mad_outliers``: robust z-score via median / MAD (median absolute
  deviation), scaled by the 1.4826 normal-consistency constant.  Both
  medians are exact ``percentile`` scalar aggregates broadcast back —
  two 1-row frames, never a global sort.

Scale shapes: ``psi_drift`` is one conditional-count aggregation over
(group, bin) — bounded by |groups| * n_bins — plus broadcast joins of
per-group totals; ``mad_outliers`` is two scalar aggregate passes and
a map-side flag, state O(1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(value: Column, lo: float, width: float, n_bins: int) -> Column:
    """Fixed-width bin index clamped to [0, n_bins-1]."""
    raw = F.floor((value - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def bin_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-width bin histogram per group: ``<group_col>, _bin, n``.
    One conditional-count aggregation bounded by |groups| * n_bins —
    the snapshot a drift monitor persists as its baseline."""
    width = (hi - lo) / n_bins
    return (
        df.select(
            F.col(group_col),
            _bin(F.col(value_col), lo, width, n_bins).alias("_bin"),
        )
        .groupBy(group_col, "_bin")
        .agg(F.count("*").cast("long").alias("n"))
    )


def psi_between(
    base_counts: DataFrame,
    cur_counts: DataFrame,
    group_col: str,
    n_bins: int,
) -> DataFrame:
    """PSI per group between two ``bin_counts`` histograms.

    Returns ``<group_col>, n_base, n_cur, psi`` (PSI rounded to 4).
    Smoothed proportions ``(n_bin + 1) / (n_total + n_bins)`` keep
    empty bins finite; every (group, bin) cell of either side's group
    set participates, present in the data or not.
    """
    cells = (
        base_counts.select(group_col, "_bin", F.col("n").alias("_nb"))
        .join(
            cur_counts.select(group_col, "_bin", F.col("n").alias("_nc")),
            [group_col, "_bin"],
            "full",
        )
    )
    groups = (
        base_counts.select(group_col)
        .unionByName(cur_counts.select(group_col))
        .distinct()
    )
    # densify: every (group, bin) pair, so empty bins still contribute
    # their smoothed mass.  |groups| x n_bins rows — broadcast-sized.
    grid = groups.select(
        group_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("_bin"),
    )
    dense = grid.join(cells, [group_col, "_bin"], "left").fillna(
        0, subset=["_nb", "_nc"]
    )
    totals = dense.groupBy(group_col).agg(
        F.sum("_nb").cast("long").alias("n_base"),
        F.sum("_nc").cast("long").alias("n_cur"),
    )
    with_tot = dense.join(F.broadcast(totals), group_col)
    p = (F.col("_nb") + 1) / (F.col("n_base") + n_bins)
    q = (F.col("_nc") + 1) / (F.col("n_cur") + n_bins)
    return (
        with_tot.withColumn("_term", (p - q) * F.log(p / q))
        .groupBy(group_col, "n_base", "n_cur")
        .agg(F.round(F.sum("_term"), 4).alias("psi"))
        .select(group_col, "n_base", "n_cur", "psi")
    )


def psi_drift(
    df: DataFrame,
    split_ts: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 350.0,
    n_bins: int = 10,
) -> DataFrame:
    """PSI between the baseline window (``ts < split_ts``) and the
    current window (``ts >= split_ts``), per group — the one-shot
    composition of ``bin_counts`` + ``psi_between`` (the streaming
    monitor persists the baseline histogram and replays the same
    comparison per micro-batch)."""
    split = F.lit(split_ts).cast("timestamp")
    base = bin_counts(
        df.filter(F.col(ts_col) < split), group_col, value_col, lo, hi, n_bins
    )
    cur = bin_counts(
        df.filter(F.col(ts_col) >= split), group_col, value_col, lo, hi, n_bins
    )
    return psi_between(base, cur, group_col, n_bins)


def mad_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Robust outlier flags: ``key_cols..., <value_col>, robust_z,
    is_outlier`` where ``robust_z = (x - median) / (1.4826 * MAD)``
    (rounded to 4) and ``is_outlier = |robust_z| > threshold``.

    Exact medians via two scalar ``percentile`` aggregates (the second
    over |x - median|), each broadcast back as a 1-row frame.  A MAD of
    zero (over half the values identical) yields robust_z = 0 and no
    flags rather than a division blow-up.
    """
    med = df.agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    with_med = df.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.expr(f"percentile(abs({value_col} - _med), 0.5)").alias("_mad")
    )
    scale = F.lit(1.4826) * F.col("_mad")
    z = F.when(F.col("_mad") == 0, F.lit(0.0)).otherwise(
        (F.col(value_col) - F.col("_med")) / scale
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .withColumn("robust_z", F.round(z, 4))
        .withColumn("is_outlier", F.abs(F.col("robust_z")) > threshold)
        .select(*key_cols, value_col, "robust_z", "is_outlier")
    )


def benford_deviation(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    decimals: int = 4,
) -> DataFrame:
    """Benford's-law first-digit audit per group: ``group_cols..., n,
    chi2, max_dev`` where ``chi2`` is Pearson's statistic against the
    Benford expectation p(d) = log10(1 + 1/d) over digits 1-9 and
    ``max_dev`` is the largest absolute proportion deviation (both
    rounded).  Fabricated or systematically generated amounts jump out;
    uniform synthetic data scores loudly too — the statistic is the
    audit signal, not a verdict.

    Rows whose value is NULL or < 1 in absolute terms are excluded
    (they have no stable first digit).  One conditional-count aggregate
    bounded by |groups| x 9 — the same shape as ``psi_drift``.
    """
    import math

    # floor-then-stringify: a decimal cast would ROUND (9.7 -> "10" ->
    # first digit 1), floor truncates (9.7 -> "9")
    first = F.substring(
        F.floor(F.abs(F.col(value_col))).cast("string"), 1, 1
    ).cast("int")
    digits = df.where(
        F.col(value_col).isNotNull() & (F.abs(F.col(value_col)) >= 1)
    ).select(*group_cols, first.alias("_d"))
    cells = digits.groupBy(*group_cols, "_d").agg(
        F.count("*").cast("double").alias("_c")
    )
    totals = cells.groupBy(*group_cols).agg(
        F.sum("_c").alias("_n")
    )
    grid = totals.select(
        *group_cols, "_n", F.explode(F.array(*[F.lit(d) for d in range(1, 10)])).alias("_d")
    )
    dense = grid.join(cells, [*group_cols, "_d"], "left").fillna(
        0.0, subset=["_c"]
    )
    expected = F.element_at(
        F.array(*[F.lit(math.log10(1 + 1 / d)) for d in range(1, 10)]),
        F.col("_d"),
    )
    e = F.col("_n") * expected
    term = (F.col("_c") - e) * (F.col("_c") - e) / e
    dev = F.abs(F.col("_c") / F.col("_n") - expected)
    return (
        dense.groupBy(*group_cols, "_n")
        .agg(
            F.round(F.sum(term), decimals).alias("chi2"),
            F.round(F.max(dev), decimals).alias("max_dev"),
        )
        .select(
            *group_cols,
            F.col("_n").cast("long").alias("n"),
            "chi2",
            "max_dev",
        )
    )
