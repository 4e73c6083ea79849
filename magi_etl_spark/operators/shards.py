"""Deterministic size-based output-shard planning.

Lives in its own module (rather than ``operators/packing.py``, its
conceptual sibling) so the gate-verified packing surface stays
byte-identical — the same isolation rule ``operators/linkage.py``
followed for ``joins.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def shard_by_size(
    df: DataFrame,
    part_cols: list[str],
    size_col: str,
    order_col: str,
    target_size: int,
) -> DataFrame:
    """Deterministic size-based shard assignment: within each
    ``part_cols`` group, order rows by ``order_col``, accumulate
    ``size_col``, and assign ``shard_id = floor(exclusive_cumsum /
    target_size)`` — the declarative cousin of the next-fit packer in
    ``operators/packing.py`` used to plan BALANCED OUTPUT FILES (every
    shard's total lands within one max-row-size of ``target_size``,
    and the assignment is a pure function of the sort order,
    replayable by any engine).

    Scale: one shuffle on ``part_cols`` + an ordered within-group
    running sum.  This is meant for file/manifest METADATA frames
    (row counts ~ file counts, orders of magnitude below data scale),
    where a per-group ordered window is the honest cost — planning the
    layout is cheap, the data rewrite it drives is the expensive part.
    """
    w = W.partitionBy(*part_cols).orderBy(order_col)
    cum_excl = F.sum(size_col).over(w) - F.col(size_col)
    return df.withColumn(
        "shard_id",
        F.floor(cum_excl / F.lit(float(target_size))).cast("long"),
    )
