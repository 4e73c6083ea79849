"""k-anonymity suppression — the data-governance gate a training-data
platform runs before releasing event-level or user-level extracts: a
row is releasable only when its quasi-identifier combination (the
attribute tuple an adversary could link on) is shared by at least
``k`` rows.  Groups below ``k`` are suppressed wholesale (Sweeney's
original suppression model; generalization — coarsening a column until
groups merge past ``k`` — is the complementary lever, provided here as
bucketing helpers).

This composes with ``operators/text.py``'s PII redaction: redaction
removes direct identifiers from free text, k-anonymity bounds the
re-identification risk of the structured columns that remain.

Scale shape: one keyed aggregate over the quasi-identifier tuple, and
(for row-level filtering) one join back on the same key — the shuffle
partitioning is reused between the two, and the profile frame is
group-cardinality-sized.  No collects, no windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, width: float) -> Column:
    """Generalization helper: floor-bucket a numeric column into
    ``width``-sized bins (emitted as the bin's ordinal, a long)."""
    return F.floor(col / F.lit(width)).cast("long")


def k_anonymity_profile(
    df: DataFrame, quasi_cols: Sequence[str | Column], k: int
) -> DataFrame:
    """Group sizes over the quasi-identifier tuple plus the suppression
    verdict: ``(*quasi, n_rows, suppressed)`` — ``suppressed`` is true
    for groups smaller than ``k``."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    ).withColumn("suppressed", F.col("n_rows") < k)


def k_anonymize(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Suppression filter: keep only rows whose quasi-identifier group
    has at least ``k`` members.  Implemented as a semi-join against the
    surviving groups so the row payload never rides the aggregate."""
    keep = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= k)
        .select(*quasi_cols)
    )
    return df.join(keep, list(quasi_cols), "semi")
