"""Two-sample Kolmogorov–Smirnov statistic, exact and stratified: the
maximum vertical distance between two samples' empirical CDFs — the
classic distribution-shift test a pipeline runs next to PSI
(``operators/drift.py``), which bins and therefore has a resolution
floor; KS is bin-free and sensitive to ANY distributional difference.

Exact rational form: per stratum, the two samples collapse to per-value
counts, a value-ordered cumulative window gives the step CDFs, and the
statistic is

    D = max over observed v of |ca(v) * nb - cb(v) * na| / (na * nb)

where ``ca/cb`` are cumulative counts ≤ v.  The numerator comparison is
exact integer arithmetic (decimal(38,0) cross-products — at corpus
scale ``ca * nb`` can pass 2**63) so no float can reorder the argmax,
and the division happens once, on the final maxima.

Scale shape: one (stratum, value) aggregation collapses the corpus
(map-side combinable), the window runs over DISTINCT values per
stratum (bounded by value cardinality, not row count) and is
partitioned by stratum — never a global single-partition funnel — and
one final stratum aggregation takes the max.

Scope note: the reference app has no distribution-testing surface —
this extends the drift family (PSI q78, MAD outliers, CUSUM) with the
exact nonparametric two-sample test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def ks_two_sample(
    df: DataFrame,
    strata_cols: list[str],
    sample_col: str,
    value_col: str,
    sample_a: str,
    sample_b: str,
) -> DataFrame:
    """``*strata_cols, n_a, n_b, d_stat`` — the exact two-sample KS
    statistic per stratum between rows where ``sample_col`` equals
    ``sample_a`` vs ``sample_b`` (other rows ignored).  ``value_col``
    must be integer-comparable (cast to BIGINT); ``d_stat`` is a 6-dp
    double.  A stratum missing either sample drops out (no CDF to
    compare).  Null values (or values the BIGINT cast nulls) are
    dropped — the KS statistic is undefined at a null point, and
    keeping them would make the CDF ordering engine-dependent (Spark's
    ascending window sorts NULLS FIRST, DuckDB's NULLS LAST — the r10
    ADVICE parity trap); the same null-dropping projection
    ``selection.py`` uses."""
    base = df.where(
        F.col(sample_col).isin([sample_a, sample_b])
    ).select(
        *strata_cols,
        F.col(value_col).cast("long").alias("_v"),
        F.when(F.col(sample_col) == sample_a, 1).otherwise(0).alias("_ia"),
        F.when(F.col(sample_col) == sample_b, 1).otherwise(0).alias("_ib"),
    ).where(F.col("_v").isNotNull())
    pv = base.groupBy(*strata_cols, "_v").agg(
        F.sum("_ia").alias("_da"),
        F.sum("_ib").alias("_db"),
    )
    w = W.partitionBy(*strata_cols).orderBy(F.asc("_v")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wt = W.partitionBy(*strata_cols)
    cum = pv.select(
        *strata_cols,
        F.sum("_da").over(w).alias("_ca"),
        F.sum("_db").over(w).alias("_cb"),
        F.sum("_da").over(wt).alias("n_a"),
        F.sum("_db").over(wt).alias("n_b"),
    )
    return (
        cum.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .groupBy(*strata_cols, "n_a", "n_b")
        .agg(
            # decimal(38,0) cross-products: at corpus scale ca*nb can
            # pass 2**63 (the q227 ssq lesson) — decimal is exact and
            # order-free; the oracle mirrors with HUGEINT
            F.max(
                F.abs(
                    F.col("_ca").cast("decimal(19,0)")
                    * F.col("n_b").cast("decimal(19,0)")
                    - F.col("_cb").cast("decimal(19,0)")
                    * F.col("n_a").cast("decimal(19,0)")
                )
            ).alias("_dnum")
        )
        .select(
            *strata_cols,
            "n_a",
            "n_b",
            F.round(
                F.col("_dnum").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("d_stat"),
        )
    )
