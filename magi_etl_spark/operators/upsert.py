"""Upsert as a batch set-operation (reference U1: new records + anti-
filtered old records, ``dash_app/tasks.py:971-972``).  On Delta-capable
storage this becomes MERGE; the unionByName/left_anti form is
storage-agnostic and shuffle-minimal (one hash join on the key)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert(new: DataFrame, old: DataFrame, keys: list[str]) -> DataFrame:
    """All rows of ``new`` + rows of ``old`` whose key is absent from
    ``new``.  Column sets must match by name."""
    survivors = old.join(new.select(*keys).distinct(), keys, "left_anti")
    return new.unionByName(survivors)


def apply_cdc(
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a CDC change stream (upserts + delete tombstones) to the
    final table state: the latest change per key wins; keys whose latest
    change is a delete are absent from the output.

    The standard log-compaction shape: one shuffle on the key, a
    row_number window to pick the latest version, a filter for
    tombstones.  Idempotent and replay-safe — re-applying any prefix or
    suffix of the log converges to the same state, which is what makes
    it usable as the batch leg of a streaming foreachBatch merge."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) != F.lit(delete_op)))
        .drop("_rn")
    )
