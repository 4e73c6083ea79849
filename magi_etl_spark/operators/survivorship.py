"""Golden-record survivorship — the master-data-management merge step
that follows record linkage (``operators/linkage.py`` finds which rows
are the same entity; this decides which ATTRIBUTE VALUES survive into
the merged "golden" record).  Classic rule set: *latest non-null wins*
per attribute, with a deterministic total tie-break so re-runs are
byte-stable.

The ordering trick makes the semantics engine-portable: each version
row gets an integer ordinal ``notnull*1e9 + epoch_days*10 + src_rank``
per attribute (non-null beats null, then recency, then source
priority), and the surviving value is ``max_by`` over that ordinal —
exactly reproducible in SQL as ``arg_max`` over the same integer.
Epoch-days must stay below 1e8 and ``src_rank`` below 10 for the
encoding to be collision-free; both hold for any real warehouse.

Scale shape: one keyed aggregate over the entity key — no windows, no
joins; every surviving attribute is a ``max_by`` in the SAME aggregate
so the shuffle is paid once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def survivorship_ordinal(
    attr: Column, updated_days: Column, src_rank: Column
) -> Column:
    """The integer survivorship ordinal: non-null beats null, then the
    most recent ``updated_days``, then the highest source rank."""
    notnull = F.when(attr.isNotNull(), 1).otherwise(0)
    return (
        notnull * F.lit(1_000_000_000).cast("long")
        + updated_days.cast("long") * 10
        + src_rank.cast("long")
    )


def golden_records(
    df: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    updated_col: str = "updated",
    src_rank_col: str = "src_rank",
) -> DataFrame:
    """Merge every entity's version rows into one golden record:
    ``(key_col, *attr_cols, n_versions)`` where each attribute is the
    latest-non-null survivor under the deterministic ordinal above.
    ``updated_col`` must be a date/timestamp; it is reduced to epoch
    days so the ordinal stays integer-exact."""
    days = F.datediff(F.col(updated_col), F.to_date(F.lit("1970-01-01")))
    aggs = [
        F.max_by(
            F.col(a), survivorship_ordinal(F.col(a), days, F.col(src_rank_col))
        ).alias(a)
        for a in attr_cols
    ]
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_versions"))
    return df.groupBy(key_col).agg(*aggs)
