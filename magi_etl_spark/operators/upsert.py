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


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """The winning (latest by ``ts`` + tiebreaks) change per key,
    TOMBSTONES INCLUDED — the compacted-log state an incremental CDC
    merge must store, because dropping a delete record would let a
    later-arriving but OLDER upsert resurrect the key.  One shuffle on
    the key; the rn==1 filter plans as WindowGroupLimit (top-1 per key
    computed before the full sort)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


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

    The standard log-compaction shape (:func:`latest_changes` + a
    tombstone filter).  Idempotent and replay-safe — re-applying any
    prefix or suffix of the log converges to the same state, which is
    what makes it usable as the batch leg of a streaming foreachBatch
    merge (``streaming/events_stream.run_foreach_batch_cdc``, which
    stores the tombstone-inclusive form between batches)."""
    from pyspark.sql import functions as F

    return latest_changes(changes, keys, ts_col, tiebreak_cols).where(
        F.col(op_col) != F.lit(delete_op)
    )
