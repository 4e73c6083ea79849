"""Slowly-changing-dimension (type 2) builders.

The reference maintains lookup dimensions by whole-table CRUD against the
Amplitude LUT API (reference ``connectors.py`` LUT upload/replace family,
the S10 sink) — history is overwritten.  Warehouse practice keeps the
history instead: one row per (key, attribute-version) with a validity
interval.  These operators derive that shape distributedly:

- :func:`scd2_intervals` — collapse an append-only change log into
  versioned rows ``[valid_from, valid_to)`` (``valid_to`` NULL for the
  current version).  One shuffle on the key, two windows over the same
  partitioning (Catalyst reuses the sort), no driver materialization.
- :func:`scd2_apply` — merge a batch of updates into an existing SCD2
  dimension.  Only affected keys are rebuilt (semi/anti join split), so
  the cost scales with the update set, not the dimension: the untouched
  partition ships through unchanged.

At 100 TB the change log shuffles once on the natural key — the same
partitioning every incremental ``scd2_apply`` run reuses; the updates
side is typically small enough to broadcast the affected-key semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def scd2_intervals(
    log: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Versioned rows from an append-only change log.

    Consecutive rows with an unchanged attribute are collapsed (null-safe
    comparison, so NULL->NULL is "no change"); each surviving change
    opens a version valid until the next change of the same key.
    Output: key columns + ``attr`` + ``valid_from`` / ``valid_to``
    (``ts_col``'s type; ``valid_to`` NULL on the open version) +
    ``version`` (1-based per key).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(attr_col).over(w)
    first = F.row_number().over(w) == 1
    changed = first | ~prev.eqNullSafe(F.col(attr_col))
    changes = log.withColumn("_chg", changed).where("_chg").drop("_chg")
    # same partitioning + ordering as the first window: one sort serves both
    w2 = W.partitionBy(*key_cols).orderBy(*order)
    return changes.select(
        *key_cols,
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_col: str = "attr",
    ts_col: str = "ts",
) -> DataFrame:
    """Merge ``updates`` (key cols + ``attr_col`` + ``ts_col``) into an
    SCD2 ``dim`` produced by :func:`scd2_intervals`.

    Affected keys are re-derived from their full history (existing
    versions re-expand to change events at ``valid_from``), so the merge
    is idempotent and order-insensitive within a batch; unaffected keys
    pass through untouched.  Join strategy is left to Catalyst/AQE:
    the affected-key set is usually broadcast-sized, but a backfill-scale
    update batch must be allowed to fall back to a shuffled join.
    """
    affected = updates.select(*key_cols).distinct()
    untouched = dim.join(affected, key_cols, "left_anti")
    history = (
        dim.join(affected, key_cols, "semi")
        .select(*key_cols, F.col("attr"), F.col("valid_from").alias(ts_col))
    )
    events = history.unionByName(
        updates.select(*key_cols, F.col(attr_col).alias("attr"), F.col(ts_col))
    )
    rebuilt = scd2_intervals(events, key_cols, "attr", ts_col)
    return untouched.unionByName(rebuilt)
